"""Wall-time + memory snapshot logger.

TPU-native counterpart of the reference memory_logger
(util/memory_logger.py:4-150): records wall time, host tracemalloc, and
per-device HBM usage (via jax device memory stats) per labelled phase.

Storage layout: one *plain* HDF5 compound dataset per phase with the
reference's field names (or npz, the reference's ImportError fallback).
This is NOT the pytables ``format='table'`` layout the reference's
``df.to_hdf`` produces (util/memory_logger.py:86-96) — reading it with
``pandas.read_hdf`` will fail.  Use :func:`read_memlog` instead, which
returns the same per-phase tables (as DataFrames when pandas is
importable) from the plain layout with h5py alone.
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


def read_memlog(filename: str) -> dict:
    """Per-phase memory tables from a ``--save_memory`` HDF5/npz file.

    The consumer-side counterpart of the reference's
    ``pandas.read_hdf(filename, phase)``: returns ``{phase: table}``
    where each table is a pandas DataFrame when pandas is importable,
    else a numpy record array with the same ``FIELDS`` columns."""
    try:
        import pandas as pd
    except ImportError:
        pd = None
    if filename.endswith(('.h5', '.hdf5')):
        import h5py
        with h5py.File(filename, 'r') as f:
            raw = {phase: f[phase][()] for phase in f}
    else:
        with np.load(filename) as z:
            dtype = np.dtype([(name, 'f8') for name in FIELDS])
            raw = {}
            for phase in z.files:
                arr = z[phase].reshape(-1, len(FIELDS))
                rec = np.zeros(len(arr), dtype)
                for i, name in enumerate(FIELDS):
                    rec[name] = arr[:, i]
                raw[phase] = rec
    if pd is None:
        return raw
    return {phase: pd.DataFrame.from_records(rec)
            for phase, rec in raw.items()}
