"""Device->host link bandwidth probe (one-shot, cached per process).

Round-2 truth-transfer choices were tuned to the axon tunnel's measured
~12 MB/s pull bandwidth (BENCHMARKS.md "Device-side truth pack rejected
by measurement").  A production TPU host pulls orders of magnitude
faster, flipping the optimum from host-recompute to device-pack — so the
link is measured once per process and the policy reads the number
instead of hardcoding the tunnel (VERDICT r2 next-step #6).

``LARNDSIM_PULL_MBPS`` overrides the measurement (tests, known hosts).
"""
from __future__ import annotations

import os
import time

_CACHE: list = []


def pull_mbps(size_mb: float = 8.0) -> float:
    """Measured device->host pull bandwidth in MB/s (best of 2 pulls of a
    ``size_mb`` device buffer; ~1 s once per process on a slow tunnel)."""
    if _CACHE:
        return _CACHE[0]
    env = os.environ.get('LARNDSIM_PULL_MBPS')
    if env:
        _CACHE.append(float(env))
        return _CACHE[0]
    import jax.numpy as jnp
    import numpy as np
    n = int(size_mb * 2 ** 20 // 4)
    arr = (jnp.arange(n, dtype=jnp.int32) & 0xffff).astype(jnp.float32)
    arr.block_until_ready()
    best = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(arr)
        best = min(best, time.perf_counter() - t0)
    _CACHE.append(size_mb / max(best, 1e-9))
    return _CACHE[0]


def reset_for_tests() -> None:
    _CACHE.clear()
