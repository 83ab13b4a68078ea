"""Hardware A/B of the FEE FSM: Pallas kernel vs the lax.scan path.

Times both implementations of ops.fee.get_adc_values at bench shapes
(U=16384, T=2048, n_scan=3805, max_adc=30) on the live TPU and checks
that control flow matches exactly (all integer outputs) with float
outputs equal to ~1 f32 ULP.

Run: python tools/ab_fee.py
"""
from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, 'tools'))
os.environ.setdefault('LARNDSIM_ASSETS', '/root/reference/larndsim')
os.environ['LARNDSIM_FEE_PALLAS'] = '0'   # keep get_adc_values on scan

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from perf_guard import timed
    from larndsim_tpu.ops import fee
    from larndsim_tpu.ops.fee_pallas import fee_fsm_pallas
    from larndsim_tpu.params import load_detector

    ref = os.environ['LARNDSIM_ASSETS']
    dm = load_detector(
        f'{ref}/detector_properties/2x2_no_modvar.yaml',
        f'{ref}/pixel_layouts/multi_tile_layout-2.4.16.yaml')
    det = dm.params
    U, T, max_adc, n_scan = 16384, 2048, 30, 3805
    key = jax.random.PRNGKey(3)
    ksig, _ = jax.random.split(key)
    sig = jax.random.uniform(ksig, (U, T)) * 30000.0
    sig = jnp.where(
        jax.random.uniform(jax.random.PRNGKey(7), (U, T)) > 0.999,
        sig, 0.0)
    tick_times = jnp.linspace(0., 190., T + 1).astype(jnp.float32)
    thr = jnp.full((U,), det.discrimination_threshold, jnp.float32)
    kw = dict(max_adc=max_adc, n_scan=n_scan, time_padding=10.0)
    kfee = jax.random.PRNGKey(11)

    scan = fee.get_adc_values(sig, tick_times, thr, det, kfee, **kw)
    pal = fee_fsm_pallas(sig, tick_times, thr, det, kfee, **kw)
    names = ('integrals', 'ticks', 'n_adc', 'reset_start', 'latch_end')
    worst = 0.0
    for name, a, b in zip(names, scan, pal):
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.integer):
            assert np.array_equal(a, b), f'{name}: control flow differs'
        else:
            d = np.abs(a.astype(np.float64) - b.astype(np.float64)).max()
            worst = max(worst, d)
    print(f'control flow identical; float maxdiff {worst:.2e} '
          f'({int(np.asarray(scan.n_adc).sum())} hits)')
    ms_scan = timed(fee.get_adc_values, sig, tick_times, thr, det, kfee,
                    **kw)
    ms_pal = timed(fee_fsm_pallas, sig, tick_times, thr, det, kfee, **kw)
    print(f'scan:   {ms_scan:7.1f} ms')
    print(f'pallas: {ms_pal:7.1f} ms   ({ms_scan / ms_pal:.2f}x)')


if __name__ == '__main__':
    main()
