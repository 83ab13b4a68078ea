"""Geometry parity: our YAML->TPC-borders derivation vs the reference loader.

The reference constants loader (larndsim/consts/detector.py) is pure
python+numpy+yaml, so it runs directly as the oracle.
"""
import os
import sys

import numpy as np
import pytest

REF = '/root/reference'
DETPROP = f'{REF}/larndsim/detector_properties/module0.yaml'
PIXEL = f'{REF}/larndsim/pixel_layouts/multi_tile_layout-2.3.16.yaml'

from larndsim_tpu.params import load_detector


@pytest.fixture(scope='module')
def ref_detector():
    sys.path.insert(0, REF)
    import yaml
    if hasattr(yaml, 'CFullLoader'):  # speed up the oracle's YAML parse
        yaml.FullLoader = yaml.CFullLoader
    import larndsim.consts.detector as ref_det
    ref_det.set_detector_properties(DETPROP, PIXEL)
    return ref_det


@pytest.fixture(scope='module')
def model():
    return load_detector(DETPROP, PIXEL)


class TestGeometryParity:
    def test_tpc_borders(self, ref_detector, model):
        np.testing.assert_allclose(model.tpc_borders,
                                   ref_detector.TPC_BORDERS, rtol=1e-12)

    def test_pixel_counts(self, ref_detector, model):
        assert model.params.n_pixels == tuple(ref_detector.N_PIXELS)
        assert model.params.n_pixels_per_tile == tuple(ref_detector.N_PIXELS_PER_TILE)
        assert model.params.pixel_pitch == pytest.approx(ref_detector.PIXEL_PITCH)

    def test_drift_params(self, ref_detector, model):
        p = model.params
        assert float(p.v_drift) == pytest.approx(ref_detector.V_DRIFT, rel=1e-6)
        assert float(p.electron_lifetime) == pytest.approx(ref_detector.ELECTRON_LIFETIME)
        assert float(p.long_diff) == pytest.approx(ref_detector.LONG_DIFF)
        assert float(p.tran_diff) == pytest.approx(ref_detector.TRAN_DIFF)
        assert p.time_ticks == len(ref_detector.TIME_TICKS)

    def test_fee_params(self, ref_detector, model):
        p = model.params
        assert float(p.gain) == pytest.approx(ref_detector.GAIN)
        assert float(p.v_ref) == pytest.approx(ref_detector.V_REF)
        assert p.adc_counts == ref_detector.ADC_COUNTS
        assert p.clock_reset_period == ref_detector.CLOCK_RESET_PERIOD

    def test_readout_maps(self, ref_detector, model):
        """Dense chip/channel maps agree with per-pixel dict lookups."""
        layout = model.layout
        conn = ref_detector.PIXEL_CONNECTION_DICT
        rng = np.random.default_rng(0)
        nppt = layout.n_pixels_per_tile
        for tile_id in list(layout.tile_indeces)[:4]:
            tid = int(tile_id)
            orientation = layout.tile_orientations[tile_id]
            for _ in range(50):
                px = int(rng.integers(nppt[0]))
                py = int(rng.integers(nppt[1]))
                rx = nppt[0] - px - 1 if orientation[2] < 0 else px
                ry = nppt[1] - py - 1 if orientation[1] < 0 else py
                expected = conn.get((rx, ry))
                got = (int(layout.chip_id_map[tid, px, py]),
                       int(layout.channel_id_map[tid, px, py]))
                if expected is None:
                    assert got == (-1, -1)
                else:
                    assert got == expected
                    io = ref_detector.TILE_CHIP_TO_IO[tile_id].get(expected[0])
                    if io is not None:
                        assert int(layout.io_group_map[tid, px, py]) == io // 1000
                        assert int(layout.io_channel_map[tid, px, py]) == io % 1000
