"""Full-run determinism: identical seeds -> identical output files."""
import h5py
import numpy as np
import pytest

from larndsim_tpu.cli.simulate_pixels import run_simulation
from larndsim_tpu.params import load_detector
from larndsim_tpu.assets.make_input import write_input

from test_end_to_end import DETPROP, PIXEL, SIMPROP


@pytest.mark.slow
def test_same_seed_same_packets(tmp_path):
    det_model = load_detector(DETPROP, PIXEL)
    in_file = str(tmp_path / 'in.h5')
    write_input(in_file, det_model.tpc_borders, n_events=1,
                tracks_per_event=2, segments_per_track=8, dEdx=15.0)
    outs = []
    for tag in ('a', 'b'):
        out = str(tmp_path / f'out_{tag}.h5')
        run_simulation(in_file, out, config='module0',
                       detector_properties=DETPROP, pixel_layout=PIXEL,
                       simulation_properties=SIMPROP,
                       response_file='__missing__.npy',
                       light_lut_filename='__missing__.npz',
                       light_det_noise_filename='__missing__.npy',
                       rand_seed=2024, step_scale=16.0)
        outs.append(out)
    with h5py.File(outs[0]) as fa, h5py.File(outs[1]) as fb:
        pa, pb = np.array(fa['packets']), np.array(fb['packets'])
        assert pa.shape == pb.shape
        for col in pa.dtype.names:
            np.testing.assert_array_equal(pa[col], pb[col])
        np.testing.assert_array_equal(np.array(fa['light_wvfm']),
                                      np.array(fb['light_wvfm']))
