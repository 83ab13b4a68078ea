"""Test-only cupy stand-in: numpy with the few cupy-specific entry points
the reference touches (`get_array_module`, `asnumpy`).  Device arrays are
host arrays; kernels run via the numba shim's python executor."""
from numpy import *  # noqa: F401,F403
from numpy import random  # noqa: F401

import numpy as _np


def get_array_module(*args):
    return _np


def asnumpy(a):
    return _np.asarray(a)
