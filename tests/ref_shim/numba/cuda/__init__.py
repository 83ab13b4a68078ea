"""CUDASIM-style executor: `@cuda.jit` kernels run as python loops.

Mirrors the subset of `numba.cuda` the reference kernels touch:
`jit`, `grid`, `gridsize`, `atomic.{add,max,compare_and_swap}`,
`local.array`, `syncthreads` (see SURVEY.md §4: the reference's own CPU
path is numba's CUDA simulator, which does exactly this).
"""
import numpy as np

from . import random  # noqa: F401

_grid_idx = (0, 0, 0)
_grid_dim = (1, 1, 1)


def grid(ndim):
    if ndim == 1:
        return _grid_idx[0]
    return _grid_idx[:ndim]


def gridsize(ndim):
    if ndim == 1:
        return _grid_dim[0]
    return _grid_dim[:ndim]


class _Atomic:
    @staticmethod
    def add(ary, idx, val):
        old = ary[idx]
        ary[idx] = old + val
        return old

    @staticmethod
    def max(ary, idx, val):
        old = ary[idx]
        if val > old:
            ary[idx] = val
        return old

    @staticmethod
    def compare_and_swap(ary, old, val):
        cur = ary[0]
        if cur == old:
            ary[0] = val
        return cur


atomic = _Atomic()


class _Local:
    @staticmethod
    def array(shape, dtype=np.float64):
        return np.zeros(shape, dtype)


local = _Local()


def syncthreads():
    pass


def _as3(x):
    if isinstance(x, tuple):
        return tuple(x) + (1,) * (3 - len(x))
    return (int(x), 1, 1)


class _FakeKernel:
    """Supports the `kernel[blocks, threads](*args)` launch syntax."""

    def __init__(self, fn):
        self.py_func = fn

    def __getitem__(self, launch):
        bpg, tpb = launch
        dims = tuple(b * t for b, t in zip(_as3(bpg), _as3(tpb)))

        def launcher(*args):
            global _grid_idx, _grid_dim
            prev_idx, prev_dim = _grid_idx, _grid_dim
            _grid_dim = dims
            try:
                for ix in range(dims[0]):
                    for iy in range(dims[1]):
                        for iz in range(dims[2]):
                            _grid_idx = (ix, iy, iz)
                            self.py_func(*args)
            finally:
                _grid_idx, _grid_dim = prev_idx, prev_dim

        return launcher


def jit(func=None, device=False, **kwargs):
    if device:
        if callable(func):
            return func

        def deco(f):
            return f

        return deco
    if callable(func):
        return _FakeKernel(func)

    def deco(f):
        return _FakeKernel(f)

    return deco
