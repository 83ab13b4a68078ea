"""ND-LAr scale: 35-module geometry parity + a charge batch on the full
70-TPC detector (BASELINE config #5 smoke)."""
import sys

import jax
import numpy as np
import pytest

from larndsim_tpu.params import load_detector, load_light, load_sim, physics
from larndsim_tpu.assets.response import make_response
from larndsim_tpu.models.charge import simulate_charge_batch
from larndsim_tpu.ops.quench import quench
from larndsim_tpu.ops.drift import drift
from larndsim_tpu import segments as seg_mod

REF = '/root/reference'
DETPROP = f'{REF}/larndsim/detector_properties/ndlar-module.yaml'
PIXEL = f'{REF}/larndsim/pixel_layouts/multi_tile_layout-3.0.40.yaml'
SIMPROP = f'{REF}/larndsim/simulation_properties/NDLAr_LBNF_sim.yaml'


@pytest.fixture(scope='module')
def det_model():
    return load_detector(DETPROP, PIXEL)


@pytest.mark.slow
class TestNdlar:
    def test_geometry_parity(self, det_model):
        sys.path.insert(0, REF)
        import yaml
        if hasattr(yaml, 'CFullLoader'):
            yaml.FullLoader = yaml.CFullLoader
        import importlib
        import larndsim.consts.detector as ref_det
        importlib.reload(ref_det)
        ref_det.set_detector_properties(DETPROP, PIXEL)
        np.testing.assert_allclose(det_model.tpc_borders,
                                   ref_det.TPC_BORDERS, rtol=1e-12,
                                   atol=1e-9)
        assert det_model.params.n_pixels == tuple(ref_det.N_PIXELS)
        assert det_model.params.n_tpcs == 70
        assert len(det_model.mod_ids) == 35
        # light falls back to disabled (ndlar yaml has no light section)
        light = load_light(DETPROP)
        assert not light.light_simulated

    def test_charge_batch(self, det_model):
        det = det_model.params
        sim = load_sim(SIMPROP)
        rng = np.random.default_rng(2)
        borders = det_model.tpc_borders
        n = 16
        dtype = np.dtype([(f, 'f8') for f in seg_mod.FLOAT_FIELDS]
                         + [(f, 'i8') for f in seg_mod.INT_FIELDS])
        tr = np.zeros(n, dtype=dtype)
        # spread tracks over several modules
        tpcs = rng.integers(0, 70, n)
        for i in range(n):
            b = np.sort(borders[tpcs[i]], axis=-1)
            start = b[:, 0] + rng.uniform(0.2, 0.8, 3) * (b[:, 1] - b[:, 0])
            end = start + 0.4
            for a, name in enumerate('xyz'):
                tr[f'{name}_start'][i] = start[a]
                tr[f'{name}_end'][i] = min(end[a], b[a, 1] - 0.01)
                tr[name][i] = 0.5 * (tr[f'{name}_start'][i]
                                     + tr[f'{name}_end'][i])
        tr['dx'] = 0.5
        tr['dEdx'] = 15.0
        tr['dE'] = tr['dEdx'] * tr['dx']
        tr['segment_id'] = np.arange(n)

        n_t = int(round(float(det.time_window)
                        / float(det.response_sampling)))
        response = make_response(n_xy=45, n_t=n_t,
                                 bin_size=float(det.response_bin_size),
                                 sampling=float(det.response_sampling),
                                 pixel_pitch=float(det.pixel_pitch))
        segs = seg_mod.from_structured(tr)
        segs = quench(segs, det, physics.BIRKS)
        segs = drift(segs, det)
        planes = np.asarray(segs.pixel_plane)
        assert (planes < 70).all(), 'all tracks assigned to real TPCs'
        res = simulate_charge_batch(segs, det_model, sim,
                                    jax.random.PRNGKey(0), response,
                                    already_drifted=True, step_scale=32.0)
        assert res.n_unique > 0
        assert (res.integrals > 0).any()
