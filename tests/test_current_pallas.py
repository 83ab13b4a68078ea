"""Pallas induced-current kernel vs the XLA reference implementation.

Runs the kernel in interpreter mode on CPU; on real TPU the compiled kernel
is exercised by bench.py.  Both backends consume identical precomputed
sample points, so they must agree to float addition-order tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from larndsim_tpu.params import load_detector, physics
from larndsim_tpu.assets.response import make_response
from larndsim_tpu.ops import current, current_pallas, pixelize
from larndsim_tpu.ops.drift import drift
from larndsim_tpu.ops.quench import quench
from larndsim_tpu import segments as seg_mod
from larndsim_tpu.models import charge as cm

from test_charge_chain import make_test_tracks, DETPROP, PIXEL


@pytest.fixture(scope='module')
def setup():
    det_model = load_detector(DETPROP, PIXEL)
    det = det_model.params
    n_t = 512  # shortened response for test speed; the induction window
    # must shrink with it (the LUT time extent defines TIME_WINDOW)
    w = n_t * float(det.response_sampling)
    det = det.replace(time_window=jnp.float32(w),
                      time_padding=jnp.float32(w + 1.0))
    response = make_response(n_xy=45, n_t=n_t,
                             bin_size=float(det.response_bin_size),
                             sampling=float(det.response_sampling),
                             pixel_pitch=float(det.pixel_pitch))
    tr = make_test_tracks(det, n=6)
    # confine drift to ~2 cm *inside* the TPC (drift direction may be
    # negative) so the shortened response window covers the collection bins
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

    radius = 1
    pixels, dists, npix = pixelize.get_pixels(
        segs, det, max_active=32, radius=radius, max_neighboring=128)
    px, py = cm.pixel_centers(jnp.maximum(pixels, 0), det)
    return det, segs, response, px, py, pixels >= 0


def _compare(det, segs, response, px, py, pv, *, mc_smear, key,
             n_steps=64, t_sig=1024):
    ref = current.current(segs, px, py, pv, jnp.asarray(response), det,
                          key, n_steps=n_steps, t_sig=t_sig,
                          mc_smear=mc_smear)
    got = current_pallas.current_pallas(
        segs, px, py, pv, response, det, key, n_steps=n_steps,
        t_sig=t_sig, mc_smear=mc_smear, s_blk=4, t_blk=256, interpret=True)
    ref, got = np.asarray(ref), np.asarray(got)
    assert got.shape == ref.shape
    # identical index math; tolerance covers accumulation-order roundoff
    # plus the documented k-rounding edge sliver (see module docstring)
    scale = np.abs(ref).max() + 1e-30
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-5)
    return ref, got


class TestCurrentPallas:
    def test_deterministic_match(self, setup):
        det, segs, response, px, py, pv = setup
        ref, got = _compare(det, segs, response, px, py, pv,
                            mc_smear=False, key=jax.random.PRNGKey(0))
        assert np.abs(ref).max() > 0, 'test must exercise nonzero current'

    def test_mc_match(self, setup):
        det, segs, response, px, py, pv = setup
        ref, got = _compare(det, segs, response, px, py, pv,
                            mc_smear=True, key=jax.random.PRNGKey(3))
        assert np.abs(ref).max() > 0

    def test_host_shift_band_path(self, setup):
        """Conservative host-computed band == device-synced band output."""
        det, segs, response, px, py, pv = setup
        key = jax.random.PRNGKey(2)
        synced = current_pallas.current_pallas(
            segs, px, py, pv, response, det, key, n_steps=64, t_sig=1024,
            mc_smear=True, s_blk=4, t_blk=256, interpret=True)
        vmask = np.asarray(segs.valid)
        band = current_pallas.host_shift_band(
            {k: np.asarray(getattr(segs, k))[vmask] for k in
             ('z_start', 'z_end', 'pixel_plane', 'long_diff',
              't_start', 't0_start')}, det, mc_smear=True)
        banded = current_pallas.current_pallas(
            segs, px, py, pv, response, det, key, n_steps=64, t_sig=1024,
            mc_smear=True, s_blk=4, t_blk=256, interpret=True,
            shift_band=band)
        np.testing.assert_array_equal(np.asarray(synced), np.asarray(banded))

    def test_charge_conservation(self, setup):
        det, segs, response, px, py, pv = setup
        out = current_pallas.current_pallas(
            segs, px, py, pv, response, det, jax.random.PRNGKey(1),
            n_steps=128, t_sig=2048, mc_smear=True, s_blk=4, t_blk=256,
            interpret=True)
        # shortened response: renormalize expectation by the truncated
        # collection pulse fraction
        total = float(np.asarray(out).sum()) * float(det.time_sampling)
        expected = float(np.asarray(segs.n_electrons).sum())
        assert total == pytest.approx(expected, rel=0.05)

    def test_folded_variant_exact(self, setup):
        """The folded-lane kernel is bit-identical to the rows kernel:
        both accumulate the same per-step values in the same order."""
        det, segs, response, px, py, pv = setup
        key = jax.random.PRNGKey(5)
        kw = dict(n_steps=64, t_sig=1024, mc_smear=True, s_blk=4,
                  t_blk=256, interpret=True)
        rows = current_pallas.current_pallas(
            segs, px, py, pv, response, det, key, variant='rows', **kw)
        for variant in ('folded', 'foldedT'):
            for grp in (4, 8):
                folded = current_pallas.current_pallas(
                    segs, px, py, pv, response, det, key, variant=variant,
                    pix_grp=grp, **kw)
                np.testing.assert_array_equal(np.asarray(rows),
                                              np.asarray(folded))

