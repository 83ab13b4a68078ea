"""Parallel truth assembly: `--truth_workers N` must not change output.

Assembly runs on a small thread pool; a single writer thread chains on
each assembly future in accumulate order, so the light_wvfm_mc_assn
dataset must be byte-identical for any N (cli/simulate_pixels.py truth
executor split).
"""
import h5py
import numpy as np
import pytest

from larndsim_tpu.cli.simulate_pixels import run_simulation
from larndsim_tpu.params import load_detector
from larndsim_tpu.assets.make_input import write_input

REF = '/root/reference/larndsim'
DETPROP = f'{REF}/detector_properties/2x2_no_modvar.yaml'
PIXEL = f'{REF}/pixel_layouts/multi_tile_layout-2.4.16.yaml'
SIMPROP = f'{REF}/simulation_properties/2x2_NuMI_sim_no_modvar.yaml'


@pytest.mark.slow
def test_truth_workers_byte_identical(tmp_path):
    geo = load_detector(DETPROP, PIXEL)
    in_file = str(tmp_path / 'in.h5')
    write_input(in_file, geo.tpc_borders, n_events=2,
                tracks_per_event=6, segments_per_track=8, dEdx=10.0,
                seed=21)
    outs = {}
    for workers in (1, 2):
        out = str(tmp_path / f'out_w{workers}.h5')
        run_simulation(
            in_file, out, config='2x2_no_modvar',
            detector_properties=DETPROP, pixel_layout=PIXEL,
            simulation_properties=SIMPROP,
            response_file='__missing__.npy',
            light_lut_filename='__missing__.npz',
            light_det_noise_filename='__missing__.npy',
            rand_seed=17, step_scale=16.0, event_group_size=2,
            truth_workers=workers)
        outs[workers] = out

    with h5py.File(outs[1]) as f1, h5py.File(outs[2]) as f2:
        assert 'light_wvfm_mc_assn' in f1
        t1 = np.array(f1['light_wvfm_mc_assn'])
        t2 = np.array(f2['light_wvfm_mc_assn'])
        assert t1.shape == t2.shape and len(t1) > 0
        np.testing.assert_array_equal(t1, t2)
        p1 = np.array(f1['packets'])
        p2 = np.array(f2['packets'])
        np.testing.assert_array_equal(p1, p2)
