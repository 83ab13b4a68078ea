"""End-to-end charge-chain batch: segments in -> ADC hits + backtracking out."""
import jax
import numpy as np
import pytest

from larndsim_tpu.params import load_detector, load_sim
from larndsim_tpu.assets.response import make_response
from larndsim_tpu.models.charge import simulate_charge_batch
from larndsim_tpu import segments as seg_mod

from test_charge_chain import make_test_tracks, DETPROP, PIXEL, SIMPROP


@pytest.fixture(scope='module')
def setup():
    det_model = load_detector(DETPROP, PIXEL)
    sim = load_sim(SIMPROP)
    det = det_model.params
    n_t = int(round(float(det.time_window) / float(det.response_sampling)))
    response = make_response(n_xy=45, n_t=n_t,
                             bin_size=float(det.response_bin_size),
                             sampling=float(det.response_sampling),
                             pixel_pitch=float(det.pixel_pitch))
    return det_model, sim, response


class TestChargeBatch:
    def test_end_to_end(self, setup):
        det_model, sim, response = setup
        tr = make_test_tracks(det_model.params, n=10)
        tr['dEdx'] = 20.0  # enough charge to fire the discriminator
        tr['dE'] = tr['dEdx'] * tr['dx']
        segs = seg_mod.from_structured(tr, pad_to=16)

        res = simulate_charge_batch(segs, det_model, sim,
                                    jax.random.PRNGKey(1), response, step_scale=16.0)
        assert res.n_unique > 0
        hits = res.adc[res.adc > 0]
        assert hits.size > 0, 'expected self-trigger hits'
        assert not res.overflow

        # backtracking: every recorded ADC's fractions sum to ~1
        has_adc = res.integrals > 0
        frac_sums = res.current_fractions.sum(axis=2)[has_adc]
        np.testing.assert_allclose(frac_sums, 1.0, atol=1e-4)

        # track_pixel_map entries reference valid batch-local segments
        tmap = res.track_pixel_map
        assert tmap.max() < 16
        assert (tmap[tmap >= 0] >= 0).all()

        # total digitized charge correlates with deposited charge
        assert res.integrals[has_adc].sum() > 0

    def test_deterministic_given_key(self, setup):
        det_model, sim, response = setup
        tr = make_test_tracks(det_model.params, n=4)
        tr['dEdx'] = 20.0
        tr['dE'] = tr['dEdx'] * tr['dx']
        segs = seg_mod.from_structured(tr, pad_to=8)
        r1 = simulate_charge_batch(segs, det_model, sim,
                                   jax.random.PRNGKey(7), response, step_scale=16.0)
        r2 = simulate_charge_batch(segs, det_model, sim,
                                   jax.random.PRNGKey(7), response, step_scale=16.0)
        np.testing.assert_array_equal(r1.adc, r2.adc)
        np.testing.assert_array_equal(r1.unique_pix, r2.unique_pix)
        np.testing.assert_allclose(r1.current_fractions, r2.current_fractions)
