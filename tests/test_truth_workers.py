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
        # beam mode: one light trigger per event, so each record's
        # trigger_id is its event's rank in the light-trigger stream
        # (pins the worker-side stamping via TrigBox — fee.py-independent)
        ev_rank = {ev: i for i, ev in enumerate(np.unique(t1['event_id']))}
        np.testing.assert_array_equal(
            t1['trigger_id'],
            np.vectorize(ev_rank.get)(t1['event_id']))
        p1 = np.array(f1['packets'])
        p2 = np.array(f2['packets'])
        np.testing.assert_array_equal(p1, p2)


@pytest.mark.slow
def test_fused_chain_worker_failure_surfaces(tmp_path, monkeypatch):
    """Kill an assembly worker mid-chain (truth_workers > 1, fused chunks
    on): the ledger must poison so successor workers fail fast instead of
    waiting out the chain timeout, the writer must surface the error to
    the caller, and the output file must be left readable (VERDICT r2 #7).
    """
    from larndsim_tpu.models import light as light_model
    if light_model._truth_chunks_lib() is None:
        pytest.skip('native truth_chunks unavailable')
    geo = load_detector(DETPROP, PIXEL)
    in_file = str(tmp_path / 'in.h5')
    write_input(in_file, geo.tpc_borders, n_events=3,
                tracks_per_event=6, segments_per_track=8, dEdx=10.0,
                seed=21)
    monkeypatch.setenv('LARNDSIM_FUSED_TRUTH', '1')
    # fail fast if poisoning ever regresses to a chain-timeout wait
    monkeypatch.setenv('LARNDSIM_TRUTH_TIMEOUT', '60')

    real = light_model._host_smeared_truth_sparse
    state = dict(calls=0, ledger=None)

    def dying(*args, **kw):
        state['calls'] += 1
        if kw.get('ledger') is not None:
            state['ledger'] = kw['ledger']
        if state['calls'] == 2:
            raise RuntimeError('injected worker death')
        return real(*args, **kw)

    monkeypatch.setattr(light_model, '_host_smeared_truth_sparse', dying)

    out = str(tmp_path / 'out.h5')
    with pytest.raises(RuntimeError,
                       match='injected worker death|poisoned'):
        run_simulation(
            in_file, out, config='2x2_no_modvar',
            detector_properties=DETPROP, pixel_layout=PIXEL,
            simulation_properties=SIMPROP,
            response_file='__missing__.npy',
            light_lut_filename='__missing__.npz',
            light_det_noise_filename='__missing__.npy',
            rand_seed=17, step_scale=16.0, event_group_size=1,
            truth_workers=2)

    assert state['calls'] >= 2
    assert state['ledger'] is not None and state['ledger']._poisoned
    # whatever was written before the failure must stay readable with
    # plain h5py (fused chunks land under the standard filter pipeline)
    with h5py.File(out) as f:
        if 'light_wvfm_mc_assn' in f:
            ds = f['light_wvfm_mc_assn']
            assert ds.compression == 'lzf' and ds.shuffle
            _ = np.array(ds)    # decodes without error


@pytest.mark.slow
def test_fused_truth_chunks_byte_identical(tmp_path, monkeypatch):
    """The fused path (workers emit+shuffle+LZF whole HDF5 chunks,
    writer stores them via write_direct_chunk) must produce a truth
    dataset byte-identical to the unfused path (workers emit records,
    writer compresses on append)."""
    from larndsim_tpu.models import light as light_model
    if light_model._truth_chunks_lib() is None:
        pytest.skip('native truth_chunks unavailable')
    geo = load_detector(DETPROP, PIXEL)
    in_file = str(tmp_path / 'in.h5')
    write_input(in_file, geo.tpc_borders, n_events=2,
                tracks_per_event=6, segments_per_track=8, dEdx=10.0,
                seed=21)
    outs = {}
    for fused in ('0', '1'):
        monkeypatch.setenv('LARNDSIM_FUSED_TRUTH', fused)
        out = str(tmp_path / f'out_f{fused}.h5')
        run_simulation(
            in_file, out, config='2x2_no_modvar',
            detector_properties=DETPROP, pixel_layout=PIXEL,
            simulation_properties=SIMPROP,
            response_file='__missing__.npy',
            light_lut_filename='__missing__.npz',
            light_det_noise_filename='__missing__.npy',
            rand_seed=17, step_scale=16.0, event_group_size=2,
            truth_workers=1)
        outs[fused] = out

    with h5py.File(outs['0']) as f0, h5py.File(outs['1']) as f1:
        t0 = np.array(f0['light_wvfm_mc_assn'])
        t1 = np.array(f1['light_wvfm_mc_assn'])
        assert len(t1) > 0
        np.testing.assert_array_equal(t0, t1)
        # the fused dataset must keep the standard filter pipeline so
        # plain h5py (no native lib) reads it
        ds = f1['light_wvfm_mc_assn']
        assert ds.compression == 'lzf' and ds.shuffle
        np.testing.assert_array_equal(np.array(f0['packets']),
                                      np.array(f1['packets']))
