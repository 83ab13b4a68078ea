"""Test-only pure-python stand-in for the numba API surface the reference
uses (`@nb.njit`, `numba.cuda`).

The real reference CI runs its kernels in pure python via
`NUMBA_ENABLE_CUDASIM=1` (/root/reference/.github/workflows/test.yml); numba
is not installed in this image, so this shim provides the same capability:
`@cuda.jit` kernels execute as sequential python loops over the launch grid.
Used ONLY by the golden-parity tests to run the reference's own kernels as
oracles — never imported by production code.
"""
from . import cuda  # noqa: F401


def njit(func=None, **kwargs):
    """`@nb.njit` — run the python function as-is."""
    if callable(func):
        return func

    def deco(f):
        return f

    return deco
