"""Wall-time + memory snapshot logger.

TPU-native counterpart of the reference memory_logger
(util/memory_logger.py:4-150): records wall time, host tracemalloc, and
per-device HBM usage (via jax device memory stats) per labelled phase;
stores to npz.
"""
from __future__ import annotations

import time
import tracemalloc

import numpy as np


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
    def _device_memory() -> int:
        try:
            import jax
            stats = jax.local_devices()[0].memory_stats()
            return int(stats.get('bytes_in_use', 0)) if stats else 0
        except Exception:
            return 0

    def take_snapshot(self):
        if self.disabled:
            return
        cpu_now, cpu_peak = (tracemalloc.get_traced_memory()
                             if tracemalloc.is_tracing() else (0, 0))
        self.log.append((time.time(), cpu_now, cpu_peak,
                         self._device_memory()))

    def archive(self, phase: str):
        if self.disabled:
            return
        self.archive_log[phase] = list(self.log)
        self.log = []

    def store(self, filename: str | None):
        if self.disabled or not filename:
            return
        out = {}
        for phase, entries in self.archive_log.items():
            out[phase] = np.array(entries)
        np.savez_compressed(filename, **out)
