"""Phase tracing: wall-clock accumulation + profiler annotations.

TPU-native counterpart of the reference's NVTX ranges + phase prints
(cupy.cuda.nvtx RangePush/RangePop, cli/simulate_pixels.py:391 etc.):
`phase(...)` wraps a block in a jax.profiler TraceAnnotation (visible in
XLA/perfetto traces) and accumulates wall time per label; `start_trace` /
`stop_trace` capture a full device profile.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

_TIMES: dict[str, float] = defaultdict(float)
_COUNTS: dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def phase(label: str):
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(label):
        yield
    _TIMES[label] += time.perf_counter() - t0
    _COUNTS[label] += 1


def summary() -> dict[str, tuple[float, int]]:
    return {k: (_TIMES[k], _COUNTS[k]) for k in _TIMES}


def reset():
    _TIMES.clear()
    _COUNTS.clear()


def report() -> str:
    lines = [f'{k:32s} {t:8.2f} s  ({n} calls)'
             for k, (t, n) in sorted(summary().items(),
                                     key=lambda kv: -kv[1][0])]
    return '\n'.join(lines)


def start_trace(logdir: str):
    jax.profiler.start_trace(logdir)


def stop_trace():
    jax.profiler.stop_trace()
