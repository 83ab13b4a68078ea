"""On-hardware exactness check of the phase-split (ratio > 1) kernel path.

The 2x2/module0 bench configs have response_sampling == time_sampling
(ratio 1), so bench/kernel_lab never exercise the phase-split row layout
(ndlar-style 50 ns response sampling, ratio 2) on a real TPU.  This tool
builds a ratio-2 workload, runs rows + folded compiled on the TPU, and
compares both against the interpreter (always available) bit-for-bit.

Usage: LARNDSIM_ASSETS=/root/reference/larndsim python tools/check_ratio2_tpu.py
"""
from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, 'tests'))
os.environ.setdefault('LARNDSIM_ASSETS', '/root/reference/larndsim')


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from larndsim_tpu.params import load_detector, physics
    from larndsim_tpu.assets.response import make_response
    from larndsim_tpu.ops import current_pallas, pixelize
    from larndsim_tpu.ops.drift import drift
    from larndsim_tpu.ops.quench import quench
    from larndsim_tpu import segments as seg_mod
    from larndsim_tpu.models import charge as cm
    from test_charge_chain import make_test_tracks, DETPROP, PIXEL

    det_model = load_detector(DETPROP, PIXEL)
    det = det_model.params
    # ndlar-style: response sampled 2x finer than the readout tick
    det = det.replace(response_sampling=jnp.float32(
        float(det.time_sampling) / 2))
    n_t = 1024
    w = n_t * float(det.response_sampling)
    det = det.replace(time_window=jnp.float32(w),
                      time_padding=jnp.float32(w + 1.0))
    response = make_response(n_xy=45, n_t=n_t,
                             bin_size=float(det.response_bin_size),
                             sampling=float(det.response_sampling),
                             pixel_pitch=float(det.pixel_pitch))
    tr = make_test_tracks(det, n=6)
    rng = np.random.default_rng(9)
    borders = np.asarray(det.tpc_borders)
    z_anode = borders[0, 2, 0]
    drift_sign = np.sign(borders[0, 2, 1] - borders[0, 2, 0])
    tr['z_start'] = z_anode + drift_sign * rng.uniform(0.1, 2.0, 6)
    tr['z_end'] = z_anode + drift_sign * rng.uniform(0.1, 2.0, 6)
    tr['z'] = 0.5 * (tr['z_start'] + tr['z_end'])
    segs = seg_mod.from_structured(tr, pad_to=8)
    segs = quench(segs, det, physics.BOX)
    segs = drift(segs, det)
    pixels, dists, npix = pixelize.get_pixels(
        segs, det, max_active=32, radius=1, max_neighboring=128)
    px, py = cm.pixel_centers(jnp.maximum(pixels, 0), det)
    pv = pixels >= 0

    key = jax.random.PRNGKey(7)
    kw = dict(n_steps=64, t_sig=2048, mc_smear=True, s_blk=8)
    oracle = np.asarray(current_pallas.current_pallas(
        segs, px, py, pv, response, det, key, variant='rows',
        interpret=True, **kw))
    assert np.abs(oracle).max() > 0, 'workload produced an empty signal'
    print(f'backend: {jax.default_backend()}  ratio=2  '
          f'|oracle|max={np.abs(oracle).max():.4g}')
    for variant in ('rows', 'folded'):
        out = np.asarray(current_pallas.current_pallas(
            segs, px, py, pv, response, det, key, variant=variant, **kw))
        same = np.array_equal(out, oracle)
        print(f'  {variant:8s}: bit-identical to interpret -> {same}')
        if not same:
            raise SystemExit(1)
    print('OK')


if __name__ == '__main__':
    main()
