"""Wall-time + memory snapshot logger.

TPU-native counterpart of the reference memory_logger
(util/memory_logger.py:4-150): records wall time, host tracemalloc, and
per-device HBM usage (via jax device memory stats) per labelled phase;
stores to HDF5 (one table per phase, the reference's
``df.to_hdf(filename, phase, format='table')`` layout of
util/memory_logger.py:86-96 without the pandas/pytables dependency) or
npz (the reference's ImportError fallback).
"""
from __future__ import annotations

import time
import tracemalloc

import numpy as np

#: column names of each snapshot row (memory_logger.py:119)
FIELDS = ('time', 'cpu_mem_used', 'cpu_mem_peak',
          'gpu_mem_used', 'gpu_mem_free')


class MemoryLogger:
    def __init__(self, disabled: bool = False):
        self.disabled = disabled
        self.log: list[tuple] = []
        self.archive_log: dict[str, list] = {}
        self._t0 = None

    def start(self):
        if self.disabled:
            return
        if not tracemalloc.is_tracing():
            tracemalloc.start()
        self._t0 = time.time()

    @staticmethod
    def _device_memory() -> tuple[int, int]:
        """(bytes in use, bytes free) on device 0; (0, 0) when the backend
        exposes no memory stats (CPU)."""
        try:
            import jax
            stats = jax.local_devices()[0].memory_stats()
            if not stats:
                return 0, 0
            used = int(stats.get('bytes_in_use', 0))
            limit = int(stats.get('bytes_limit', 0))
            return used, max(limit - used, 0)
        except Exception:
            return 0, 0

    def take_snapshot(self):
        if self.disabled:
            return
        cpu_now, cpu_peak = (tracemalloc.get_traced_memory()
                             if tracemalloc.is_tracing() else (0, 0))
        hbm_used, hbm_free = self._device_memory()
        self.log.append((time.time() - (self._t0 or 0.0),
                         cpu_now, cpu_peak, hbm_used, hbm_free))

    def archive(self, phase: str):
        if self.disabled:
            return
        self.archive_log[phase] = list(self.log)
        self.log = []

    def store(self, filename: str | None):
        if self.disabled or not filename:
            return
        if filename.endswith(('.h5', '.hdf5')):
            self._store_hdf5(filename)
        else:
            out = {phase: np.array(entries)
                   for phase, entries in self.archive_log.items()}
            np.savez_compressed(filename, **out)

    def _store_hdf5(self, filename: str):
        import h5py
        dtype = np.dtype([(f, 'f8') for f in FIELDS])
        with h5py.File(filename, 'a') as f:
            for phase, entries in self.archive_log.items():
                arr = np.array(entries, np.float64).reshape(-1, len(FIELDS))
                rec = np.zeros(len(arr), dtype)
                for i, name in enumerate(FIELDS):
                    rec[name] = arr[:, i]
                if phase in f:
                    del f[phase]
                f.create_dataset(phase, data=rec)
