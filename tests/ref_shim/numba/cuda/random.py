"""RNG stand-in for `numba.cuda.random`.

Default is NULL mode: every normal draw returns 0.0, which makes the
reference kernels *deterministic* (their noise terms are all
`draw * scale`, e.g. /root/reference/larndsim/detsim.py:333,
fee.py:563-565) — exactly what golden byte-comparison needs.  Set
`generator` to a `numpy.random.Generator` to get real gaussians for
statistical comparisons.
"""
import numpy as np

generator = None


def create_xoroshiro128p_states(n, seed=0):
    return np.zeros(int(n), np.uint64)


def xoroshiro128p_normal_float32(states, index):
    if generator is None:
        return 0.0
    return float(generator.standard_normal(dtype=np.float32))


def xoroshiro128p_normal_float64(states, index):
    if generator is None:
        return 0.0
    return float(generator.standard_normal())
