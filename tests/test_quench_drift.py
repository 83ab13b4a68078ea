"""Physics-closure tests for quenching and drifting.

Same analytic closures as the reference tests (tests/testQuenching.py,
tests/testDrifting.py): kernel outputs must equal the Birks/Box formulas and
the exp(-t/tau) lifetime attenuation.
"""
import numpy as np
import pytest

from larndsim_tpu.params import load_detector, physics
from larndsim_tpu.ops.quench import quench
from larndsim_tpu.ops.drift import drift, select_active_volume
from larndsim_tpu import segments as seg_mod

REF = '/root/reference/larndsim'
DETPROP = f'{REF}/detector_properties/module0.yaml'
PIXEL = f'{REF}/pixel_layouts/multi_tile_layout-2.3.16.yaml'

E_FIELD = 0.50
LAR_DENSITY = 1.38


@pytest.fixture(scope='module')
def det():
    return load_detector(DETPROP, PIXEL).params


def make_segments(n, **overrides):
    dtype = np.dtype([(f, 'f8') for f in seg_mod.FLOAT_FIELDS]
                     + [(f, 'i8') for f in seg_mod.INT_FIELDS])
    tracks = np.zeros(n, dtype=dtype)
    for key, val in overrides.items():
        tracks[key] = val
    return seg_mod.from_structured(tracks)


class TestQuenching:
    def test_birks(self, det):
        rng = np.random.default_rng(1)
        dE = rng.uniform(0.1, 100, 100)
        dEdx = rng.uniform(1, 100, 100)
        segs = quench(make_segments(100, dE=dE, dEdx=dEdx), det, physics.BIRKS)
        recomb = physics.BIRKS_Ab / (1 + physics.BIRKS_kb * dEdx / (E_FIELD * LAR_DENSITY))
        np.testing.assert_allclose(segs.n_electrons,
                                   recomb * dE / physics.W_ION, rtol=1e-3)

    def test_box(self, det):
        rng = np.random.default_rng(2)
        dE = rng.uniform(0.1, 100, 100)
        dEdx = rng.uniform(1, 100, 100)
        segs = quench(make_segments(100, dE=dE, dEdx=dEdx), det, physics.BOX)
        csi = physics.BOX_BETA * dEdx / (E_FIELD * LAR_DENSITY)
        recomb = np.log(physics.BOX_ALPHA + csi) / csi
        # engine computes in float32 -> tolerance reflects f32 log/div
        np.testing.assert_allclose(segs.n_electrons,
                                   recomb * dE / physics.W_ION, rtol=1e-3)

    def test_birks_zero_dedx(self, det):
        segs = quench(make_segments(1, dE=1.0), det, physics.BIRKS)
        assert float(segs.n_electrons[0]) == pytest.approx(
            physics.BIRKS_Ab / physics.W_ION, rel=1e-5)

    def test_box_zero_dedx(self, det):
        segs = quench(make_segments(1, dE=1.0), det, physics.BOX)
        assert float(segs.n_electrons[0]) == 0.0

    def test_extreme_dedx(self, det):
        for mode in (physics.BOX, physics.BIRKS):
            segs = quench(make_segments(1, dE=1e10, dEdx=1e10), det, mode)
            recomb = float(segs.n_electrons[0]) / (1e10 / physics.W_ION)
            assert 0 < recomb < 1e-6

    def test_photons(self, det):
        segs = quench(make_segments(1, dE=10.0, dEdx=2.0), det, physics.BIRKS)
        w_ph = 19.5e-6
        expected = 10.0 / w_ph - float(segs.n_electrons[0])
        assert float(segs.n_photons[0]) == pytest.approx(expected, rel=1e-4)


class TestDrifting:
    def test_lifetime(self, det):
        rng = np.random.default_rng(3)
        borders = np.asarray(det.tpc_borders)
        n = 10
        z = rng.uniform(borders[0, 2, 0], borders[0, 2, 1], n)
        x = rng.uniform(borders[0, 0, 0], borders[0, 0, 1], n)
        y = rng.uniform(borders[0, 1, 0], borders[0, 1, 1], n)
        n_e = rng.uniform(1e6, 1e7, n)
        segs = make_segments(n, x=x, y=y, z=z, z_start=z, z_end=z, n_electrons=n_e)
        out = drift(segs, det)

        z_anode = borders[0, 2, 0]
        drift_time = np.abs(z - z_anode) / float(det.v_drift)
        expected = n_e * np.exp(-drift_time / float(det.electron_lifetime))
        np.testing.assert_allclose(out.n_electrons, expected, rtol=1e-4)
        np.testing.assert_allclose(
            out.long_diff, np.sqrt(drift_time * 2 * float(det.long_diff)), rtol=1e-4)
        np.testing.assert_allclose(
            out.t, drift_time, rtol=1e-4)
        assert (np.asarray(out.pixel_plane) == 0).all()

    def test_outside_tpc(self, det):
        segs = make_segments(1, x=1e4, y=1e4, z=1e4, n_electrons=1000.0)
        out = drift(segs, det)
        assert int(out.pixel_plane[0]) == 0x0000BEEF
        assert float(out.n_electrons[0]) == 1000.0

    def test_active_volume_mask(self, det):
        borders = np.asarray(det.tpc_borders)
        dtype = np.dtype([(f, 'f8') for f in seg_mod.FLOAT_FIELDS])
        tracks = np.zeros(2, dtype=dtype)
        center = borders[0].mean(axis=1)
        for i, sfx in enumerate(('_start', '_end')):
            tracks[0]['x' + sfx] = center[0]
            tracks[0]['y' + sfx] = center[1]
            tracks[0]['z' + sfx] = center[2]
        tracks[1]['x_start'] = tracks[1]['x_end'] = 1e5
        mask = select_active_volume(tracks, borders)
        assert mask.tolist() == [True, False]
