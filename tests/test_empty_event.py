"""Regression: an empty event (no active-volume tracks) between real events
must not drop the buffered charge hits of the preceding group.

The empty-event branch flushes accumulated results after process_group();
a light-only flush there silently discarded the charge packets of events
still in the accumulator (cli/simulate_pixels.py empty-batch branch vs
reference cli:894-901)."""
import h5py
import numpy as np
import pytest

from larndsim_tpu.cli.simulate_pixels import run_simulation
from larndsim_tpu.params import load_detector
from larndsim_tpu.assets.make_input import write_input

REF = '/root/reference/larndsim'
DETPROP = f'{REF}/detector_properties/module0.yaml'
PIXEL = f'{REF}/pixel_layouts/multi_tile_layout-2.3.16.yaml'
SIMPROP = f'{REF}/simulation_properties/singles_sim.yaml'


@pytest.fixture()
def simprop_batched(tmp_path):
    """singles_sim with write_batch_size > 1: the empty-event flush only
    has buffered charge hits to lose when flushes are not per-batch."""
    import yaml
    with open(SIMPROP) as f:
        cfg = yaml.safe_load(f)
    cfg['write_batch_size'] = 4
    # one TPC per batch group: an event with tracks in only one TPC then
    # yields an empty batch for the other group (the branch under test)
    cfg['event_batch_size'] = 1
    out = tmp_path / 'sim_batched.yaml'
    out.write_text(yaml.dump(cfg))
    return str(out)


@pytest.mark.parametrize('make_empty', [True, False])
def test_empty_event_keeps_prior_charge(tmp_path, make_empty,
                                        simprop_batched):
    det_model = load_detector(DETPROP, PIXEL)
    in_file = str(tmp_path / 'input.h5')
    out_file = str(tmp_path / 'output.h5')
    write_input(in_file, det_model.tpc_borders, n_events=3,
                tracks_per_event=1, segments_per_track=8, dEdx=15.0,
                seed=7)
    with h5py.File(in_file, 'r+') as f:
        seg = np.array(f['segments'])
        # write_input staggers t0 by the spill period; singles_sim is not
        # a spill sim (no t0 reset), so bring every event into its own
        # readout window
        ev = seg['event_id'] - seg['event_id'].min()
        for fld in ('t0', 't0_start', 't0_end'):
            seg[fld] = seg[fld] - ev * 1.2e6
        if make_empty:
            # push event 1 (the middle one) outside every TPC: its batch
            # is empty
            mask = ev == 1
            assert mask.any()
            for fld in ('x_start', 'x_end', 'x'):
                seg[fld] = np.where(mask, seg[fld] + 1e4, seg[fld])
        del f['segments']
        f.create_dataset('segments', data=seg)

    run_simulation(in_file, out_file,
                   config='module0',
                   detector_properties=DETPROP,
                   pixel_layout=PIXEL,
                   simulation_properties=simprop_batched,
                   response_file='__missing__.npy',
                   light_lut_filename='__missing__.npz',
                   light_det_noise_filename='__missing__.npy',
                   rand_seed=123, step_scale=16.0)

    with h5py.File(out_file) as f:
        packets = np.array(f['packets'])
        assn = np.array(f['mc_packets_assn'])
        data = packets['packet_type'] == 0
        assert data.any(), 'no data packets at all'
        ev_of_packets = set(
            int(e) for e in assn['event_ids'][:, 0][data] if e >= 0)
        expected = {0, 2} if make_empty else {0, 1, 2}
        assert ev_of_packets == expected, ev_of_packets
