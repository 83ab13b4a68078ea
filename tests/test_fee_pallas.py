"""FEE FSM Pallas kernel vs the lax.scan reference implementation.

The kernel (ops/fee_pallas.py) consumes the identical hoisted noise
tensor with the scan body's f32 op order, so its control flow — and
hence every integer output (hit count, reset/latch window ticks) — must
match `get_adc_values` exactly; float outputs may differ by compiler
fusion only (~1 f32 ULP).  Runs in interpreter mode on CPU; the
hardware A/B lives in tools/ab_fee.py.
"""
from __future__ import annotations

import os

import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

REF = os.environ.get('LARNDSIM_ASSETS', '/root/reference/larndsim')


@pytest.fixture(scope='module')
def det():
    from larndsim_tpu.params import load_detector
    dm = load_detector(
        f'{REF}/detector_properties/2x2_no_modvar.yaml',
        f'{REF}/pixel_layouts/multi_tile_layout-2.4.16.yaml')
    return dm.params


def _run_pair(det, U, T, max_adc, n_scan, seed=42):
    from larndsim_tpu.ops import fee
    from larndsim_tpu.ops.fee_pallas import fee_fsm_pallas
    key = jax.random.PRNGKey(seed)
    ksig, kfee = jax.random.split(key)
    sig = jax.random.uniform(ksig, (U, T)) * 30000.0
    sig = jnp.where(
        jax.random.uniform(jax.random.PRNGKey(7), (U, T)) > 0.97, sig, 0.0)
    tick_times = jnp.linspace(0., 190., T + 1).astype(jnp.float32)
    thr = jnp.full((U,), det.discrimination_threshold, jnp.float32)
    kw = dict(max_adc=max_adc, n_scan=n_scan, time_padding=10.0)
    scan = fee.get_adc_values(sig, tick_times, thr, det, kfee, **kw)
    pal = fee_fsm_pallas(sig, tick_times, thr, det, kfee,
                         interpret=True, **kw)
    return scan, pal


@pytest.mark.parametrize('shape', [
    # (U, T, max_adc, n_scan): unpadded U, n_scan both off and on the
    # kernel's CHUNK grid, small max_adc
    (600, 500, 10, 520),
    (1100, 300, 5, 512),
    (2048, 700, 3, 777),
    (600, 150, 1, 180),     # n_scan < CHUNK, single hit slot
    (700, 240, 2, 256),     # n_scan == CHUNK exactly (no tail guard)
])
def test_matches_scan(det, shape):
    scan, pal = _run_pair(det, *shape)
    names = ('integrals', 'ticks', 'n_adc', 'reset_start', 'latch_end')
    assert int(np.asarray(scan.n_adc).sum()) > 0, 'fixture drew no hits'
    for name, a, b in zip(names, scan, pal):
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.integer):
            np.testing.assert_array_equal(b, a, err_msg=name)
        else:
            # float values may differ by compiler fusion only; scale
            # the tolerance to the magnitudes involved (~30k e-)
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-2,
                                       err_msg=name)


def test_hit_pattern_nontrivial(det):
    scan, pal = _run_pair(det, 600, 500, 10, 520)
    n = np.asarray(scan.n_adc)
    # the FSM must exercise multi-hit pixels and the latch/reset cycle
    assert n.max() >= 2
    assert (np.asarray(scan.reset_start) >= -1).all()
