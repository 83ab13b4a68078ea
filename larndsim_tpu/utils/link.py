"""Device->host link bandwidth probe (one-shot, cached per process).

Round-2 truth-transfer choices were tuned to the axon tunnel's measured
~12 MB/s pull bandwidth (BENCHMARKS.md "Device-side truth pack rejected
by measurement").  A production TPU host pulls orders of magnitude
faster, flipping the optimum from host-recompute to device-pack — so the
link is measured once per process and the policy reads the number
instead of hardcoding the tunnel (VERDICT r2 next-step #6).

Two hard-won measurement rules (VERDICT r3 weak #1/#7):

* ``jax.Array`` caches its host value after the first materialization,
  so timing two pulls of the *same* array measures a host memcpy the
  second time.  Every timed pull here uses a **fresh device buffer**
  (produced by a device-side computation, so no host copy exists).
* Pull bandwidth on the tunnel degrades with transfer size, so the
  probe must run at a size representative of the real device-route
  pulls (tens of MB).  A small probe runs first and skips the large one
  when the link is obviously slow (a 2 MB pull at tunnel speed already
  costs ~0.2 s; two 32 MB pulls would cost ~5 s for no information).

``LARNDSIM_PULL_MBPS`` overrides the measurement (tests, known hosts).
"""
from __future__ import annotations

import os
import time

_CACHE: list = []

#: bandwidth below which the small probe's answer is final (no sane
#: device-pack threshold sits under this, and a large probe would cost
#: seconds on such a link)
_SLOW_LINK_MBPS = 50.0


def _measure(size_mb: float, trials: int = 2) -> tuple:
    """(MB/s best-of-trials, per-trial seconds) pulling ``trials``
    DISTINCT freshly-computed ``size_mb`` device buffers to host."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    n = int(size_mb * 2 ** 20 // 4)
    base = jax.device_put(np.zeros(n, dtype=np.float32))
    fresh = jax.jit(lambda x, c: x + c)
    # warm the jit cache so trial 0 doesn't pay the compile
    fresh(base, jnp.float32(0.0)).block_until_ready()
    times = []
    for i in range(trials):
        arr = fresh(base, jnp.float32(i + 1.0))
        arr.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(arr)
        times.append(time.perf_counter() - t0)
        del arr
    return size_mb / max(min(times), 1e-9), times


def pull_mbps(size_mb: float = 32.0) -> float:
    """Measured device->host pull bandwidth in MB/s.

    A 2 MB probe runs first; if it already shows a slow link
    (< ``_SLOW_LINK_MBPS``) its answer is returned, else the bandwidth
    is re-measured at ``size_mb`` (representative of real device-route
    truth pulls, whose bandwidth is size-dependent on the tunnel).
    """
    if _CACHE:
        return _CACHE[0]
    env = os.environ.get('LARNDSIM_PULL_MBPS')
    if env:
        _CACHE.append(float(env))
        return _CACHE[0]
    mbps, _ = _measure(2.0)
    if mbps >= _SLOW_LINK_MBPS:
        mbps, _ = _measure(size_mb)
    _CACHE.append(mbps)
    return _CACHE[0]


def reset_for_tests() -> None:
    _CACHE.clear()
