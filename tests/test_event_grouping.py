"""Event grouping: independent events share one pipeline invocation via
per-event pixel-key offsets, with exact per-event separation."""
import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from larndsim_tpu.params import load_detector, load_sim, physics
from larndsim_tpu.assets.response import make_response
from larndsim_tpu.assets.make_input import write_input
from larndsim_tpu.models.charge import simulate_charge_batch
from larndsim_tpu.ops.quench import quench
from larndsim_tpu.ops.drift import drift
from larndsim_tpu.cli.simulate_pixels import run_simulation
from larndsim_tpu import segments as seg_mod

from test_charge_chain import make_test_tracks, DETPROP, PIXEL, SIMPROP


@pytest.fixture(scope='module')
def setup():
    det_model = load_detector(DETPROP, PIXEL)
    det = det_model.params
    sim = load_sim(SIMPROP)
    n_t = int(round(float(det.time_window) / float(det.response_sampling)))
    response = make_response(n_xy=45, n_t=n_t,
                             bin_size=float(det.response_bin_size),
                             sampling=float(det.response_sampling),
                             pixel_pitch=float(det.pixel_pitch))
    return det_model, sim, response


class TestEventGrouping:
    def test_grouped_events_separate_exactly(self, setup):
        """Two identical events grouped -> identical per-event pixel sets,
        matching a solo run's set."""
        det_model, sim, response = setup
        det = det_model.params
        tr = make_test_tracks(det, n=5)
        tr['dEdx'] = 20.0
        tr['dE'] = tr['dEdx'] * tr['dx']

        # solo
        segs1 = seg_mod.from_structured(tr, pad_to=8)
        r1 = simulate_charge_batch(segs1, det_model, sim,
                                   jax.random.PRNGKey(3), response,
                                   step_scale=16.0)
        solo_pix = set(r1.unique_pix[r1.unique_pix >= 0].tolist())

        # grouped: the same event twice, slots 0 and 1
        tr2 = np.concatenate([tr, tr])
        segs2 = seg_mod.from_structured(tr2, pad_to=16)
        slot = np.zeros(16, np.int32)
        slot[5:10] = 1
        r2 = simulate_charge_batch(segs2, det_model, sim,
                                   jax.random.PRNGKey(3), response,
                                   step_scale=16.0, event_slot=slot)
        uniq = r2.unique_pix
        valid = uniq >= 0
        nx, ny = det.n_pixels
        n_pix_total = nx * ny * det.n_tpcs
        ev = uniq[valid] // n_pix_total
        pid = uniq[valid] % n_pix_total
        assert set(ev.tolist()) == {0, 1}
        set0 = set(pid[ev == 0].tolist())
        set1 = set(pid[ev == 1].tolist())
        assert set0 == set1 == solo_pix
        assert r2.n_unique == 2 * r1.n_unique

    def test_run_simulation_grouped_matches_structure(self, setup, tmp_path):
        """Grouped orchestration produces the same hit multiset as ungrouped
        (identical seeds; the RNG grouping differs only in noise draws, so
        compare pixel sets and per-event packet counts within tolerance)."""
        det_model, _, _ = setup
        in_file = str(tmp_path / 'in.h5')
        write_input(in_file, det_model.tpc_borders, n_events=3,
                    tracks_per_event=2, segments_per_track=8, dEdx=15.0)
        outs = {}
        for g in (1, 3):
            out = str(tmp_path / f'out_g{g}.h5')
            run_simulation(in_file, out, config='module0',
                           detector_properties=DETPROP, pixel_layout=PIXEL,
                           simulation_properties=SIMPROP,
                           response_file='__missing__.npy',
                           light_lut_filename='__missing__.npz',
                           light_det_noise_filename='__missing__.npy',
                           rand_seed=31, step_scale=16.0,
                           event_group_size=g)
            outs[g] = out
        with h5py.File(outs[1]) as f1, h5py.File(outs[3]) as f3:
            p1 = np.array(f1['packets'])
            p3 = np.array(f3['packets'])
            d1 = p1[p1['packet_type'] == 0]
            d3 = p3[p3['packet_type'] == 0]
            # same channels fire (noise draws differ -> ADC values may
            # wobble by a few counts; hit sets should agree)
            k1 = set(zip(d1['io_group'].tolist(), d1['chip_id'].tolist(),
                         d1['channel_id'].tolist()))
            k3 = set(zip(d3['io_group'].tolist(), d3['chip_id'].tolist(),
                         d3['channel_id'].tolist()))
            overlap = len(k1 & k3) / max(len(k1 | k3), 1)
            # different noise streams wobble marginal channels: two
            # *ungrouped* runs with different seeds overlap ~0.86 on this
            # workload, so grouped-vs-ungrouped must be in the same range
            assert overlap > 0.7, f'hit-set overlap {overlap}'
            assert abs(len(d1) - len(d3)) <= 0.25 * max(len(d1), len(d3))


class TestLightGrouping:
    def test_grouped_light_matches_solo_exactly(self, setup):
        """simulate_light_group (beam mode) is bit-identical to per-event
        simulate_light_batch calls with the same key derivation."""
        import dataclasses
        from larndsim_tpu.params import load_light
        from larndsim_tpu.assets.light_lut import (make_light_lut,
                                                   make_light_noise)
        from larndsim_tpu.ops import light as light_ops
        from larndsim_tpu.models.light import (simulate_light_batch,
                                               simulate_light_group)
        from larndsim_tpu.segments import from_structured_group

        det_model, sim, _ = setup
        det = det_model.params
        light = dataclasses.replace(
            load_light(DETPROP, asset_root='/root/reference'),
            light_trig_mode=1)
        sim = dataclasses.replace(sim, max_mc_truth_ids=4)
        lut = light_ops.LightLUT.from_structured(
            make_light_lut(vox_div=(14, 26, 8), n_det_tpc=48))
        noise = make_light_noise(light.n_op_channel)
        op_channel = np.asarray(light.tpc_to_op_channel).ravel()

        from larndsim_tpu.ops.quench import quench
        from larndsim_tpu.ops.drift import drift
        from larndsim_tpu.params import physics

        key_mod = jax.random.PRNGKey(77)
        evs, segs_list, incs, voxs = [7, 13], [], [], []
        pad = 32
        for ev in evs:
            tr = make_test_tracks(det, n=4 + ev % 3)
            tr['dEdx'] = 12.0
            tr['dE'] = tr['dEdx'] * tr['dx']
            segs = seg_mod.from_structured(tr, pad_to=pad)
            segs = drift(quench(segs, det, physics.BIRKS), det)
            n_det, t0_det, vox = light_ops.calculate_light_incidence(
                segs, det, light, lut.vis, lut.t0,
                n_channels=light.n_op_channel)
            segs_list.append(segs)
            incs.append(np.asarray(n_det))
            voxs.append(np.asarray(vox))

        # solo reference results
        solos = []
        for ev, segs, inc, vox in zip(evs, segs_list, incs, voxs):
            key_l = jax.random.fold_in(key_mod, ev)
            solos.append(simulate_light_batch(
                segs, det_model, light, sim, inc, vox, lut, noise,
                key_l, i_subbatch=0, op_channel=op_channel))

        # grouped: same events in one dispatch.  Rebuild the stacked
        # segments from the raw tracks (drift/quench re-applied) to ensure
        # the group path sees identical physics inputs.
        segs_g = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *segs_list)
        groups = simulate_light_group(
            segs_g, det_model, light, sim,
            np.stack(incs), np.stack(voxs), lut, noise,
            key_mod, np.array(evs), op_channel)

        assert len(groups) == 2
        for solo, grp in zip(solos, groups):
            np.testing.assert_array_equal(solo.waveforms, grp.waveforms)
            assert grp.trigger_idx.tolist() == [0]
            assert grp.trigger_type.tolist() == [1]
            if solo.truth_sparse is not None:
                assert grp.truth_sparse is not None
                for k in solo.truth_sparse:
                    np.testing.assert_array_equal(
                        solo.truth_sparse[k], grp.truth_sparse[k])

    def test_grouped_device_route_matches_solo(self, setup):
        """The grouped device truth route (one vmapped smear dispatch +
        one packed group pull, VERDICT r3 #6) produces the same records
        as per-event simulate_light_batch(truth_path='device') calls —
        same (trig, channel, tick, segment) sets, values equal to the
        last-ulp tolerance the vmapped contraction allows."""
        import dataclasses
        from larndsim_tpu.params import load_light
        from larndsim_tpu.params import light as light_params_mod
        from larndsim_tpu.assets.light_lut import (make_light_lut,
                                                   make_light_noise)
        from larndsim_tpu.ops import light as light_ops
        from larndsim_tpu.models.light import (simulate_light_batch,
                                               simulate_light_group)

        det_model, sim, _ = setup
        det = det_model.params
        light0 = load_light(DETPROP, asset_root='/root/reference')
        light = dataclasses.replace(light0, light_trig_mode=1,
                                    enable_lut_smearing=True)
        light_params_mod.adopt_host_scalars(light, light0)
        sim = dataclasses.replace(sim, max_mc_truth_ids=4)
        lut = light_ops.LightLUT.from_structured(
            make_light_lut(vox_div=(14, 26, 8), n_det_tpc=48))
        noise = make_light_noise(light.n_op_channel)
        op_channel = np.asarray(light.tpc_to_op_channel).ravel()

        from larndsim_tpu.ops.quench import quench
        from larndsim_tpu.ops.drift import drift
        from larndsim_tpu.params import physics

        key_mod = jax.random.PRNGKey(31)
        evs, segs_list, incs, voxs = [2, 5], [], [], []
        for ev in evs:
            tr = make_test_tracks(det, n=4 + ev % 3)
            tr['dEdx'] = 12.0
            tr['dE'] = tr['dEdx'] * tr['dx']
            segs = seg_mod.from_structured(tr, pad_to=32)
            segs = drift(quench(segs, det, physics.BIRKS), det)
            n_det, t0_det, vox = light_ops.calculate_light_incidence(
                segs, det, light, lut.vis, lut.t0,
                n_channels=light.n_op_channel)
            segs_list.append(segs)
            incs.append(np.asarray(n_det))
            voxs.append(np.asarray(vox))

        solos = []
        for ev, segs, inc, vox in zip(evs, segs_list, incs, voxs):
            key_l = jax.random.fold_in(key_mod, ev)
            solos.append(simulate_light_batch(
                segs, det_model, light, sim, inc, vox, lut, noise,
                key_l, i_subbatch=0, op_channel=op_channel,
                truth_path='device'))

        segs_g = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *segs_list)
        groups = simulate_light_group(
            segs_g, det_model, light, sim, np.stack(incs), np.stack(voxs),
            lut, noise, key_mod, np.array(evs), op_channel,
            truth_path='device')

        n_records = 0
        for solo, grp in zip(solos, groups):
            np.testing.assert_array_equal(solo.waveforms, grp.waveforms)
            s, g = solo.truth_sparse, grp.truth_sparse
            assert s is not None and g is not None
            for k in ('trig', 'op_channel', 'tick', 'segment_id'):
                np.testing.assert_array_equal(s[k], g[k], err_msg=k)
            np.testing.assert_allclose(g['pe_current'], s['pe_current'],
                                       rtol=2e-6)
            n_records += len(g['pe_current'])
        assert n_records > 0

    @pytest.mark.parametrize('smear', [False, True])
    @pytest.mark.parametrize('grouped_tail', ['0', '1'])
    def test_grouped_mode0_light_matches_solo_exactly(self, setup, smear,
                                                      grouped_tail,
                                                      monkeypatch):
        """simulate_light_group_mode0 (threshold self-trigger) is
        bit-identical to per-event simulate_light_batch calls — with the
        per-event tails (default) AND the bucketed grouped-tail dispatch
        (LARNDSIM_MODE0_TAIL=1): same
        responses, same trigger walks, same digitized waveforms and truth
        (the tail IS the solo code via _precomputed)."""
        import dataclasses
        from larndsim_tpu.params import load_light
        from larndsim_tpu.assets.light_lut import (make_light_lut,
                                                   make_light_noise)
        from larndsim_tpu.ops import light as light_ops
        from larndsim_tpu.models.light import (simulate_light_batch,
                                               simulate_light_group_mode0,
                                               mode0_window)

        det_model, sim, _ = setup
        det = det_model.params
        light = load_light(DETPROP, asset_root='/root/reference')
        thr = np.full_like(np.asarray(light.light_trig_threshold), -1e-3)
        light = dataclasses.replace(
            light, light_trig_mode=0, enable_lut_smearing=smear,
            light_trig_threshold=jnp.asarray(thr))
        sim = dataclasses.replace(sim, max_mc_truth_ids=4,
                                  mc_truth_threshold=0.0)
        lut = light_ops.LightLUT.from_structured(
            make_light_lut(vox_div=(14, 26, 8), n_det_tpc=48))
        noise = make_light_noise(light.n_op_channel)
        op_channel = np.asarray(light.tpc_to_op_channel).ravel()

        from larndsim_tpu.ops.quench import quench
        from larndsim_tpu.ops.drift import drift
        from larndsim_tpu.params import physics

        key_mod = jax.random.PRNGKey(31)
        evs, segs_list, incs, t0s, voxs = [3, 8, 11], [], [], [], []
        pad = 32
        for ev in evs:
            tr = make_test_tracks(det, n=4 + ev % 3)
            tr['dEdx'] = 12.0
            tr['dE'] = tr['dEdx'] * tr['dx']
            segs = seg_mod.from_structured(tr, pad_to=pad)
            segs = drift(quench(segs, det, physics.BIRKS), det)
            n_det, t0_det, vox = light_ops.calculate_light_incidence(
                segs, det, light, lut.vis, lut.t0,
                n_channels=light.n_op_channel)
            segs_list.append(segs)
            incs.append(np.asarray(n_det))
            t0s.append(np.asarray(t0_det))
            voxs.append(np.asarray(vox))

        # all events must land in one n_ticks bucket (the CLI partitions
        # by this; here the group call requires it)
        wins = [mode0_window(i, t, light) for i, t in zip(incs, t0s)]
        assert len({w[0] for w in wins}) == 1, wins

        solos = []
        for ev, segs, inc, t0, vox in zip(evs, segs_list, incs, t0s, voxs):
            key_l = jax.random.fold_in(key_mod, ev)
            solos.append(simulate_light_batch(
                segs, det_model, light, sim, inc, vox, lut, noise,
                key_l, i_subbatch=0, op_channel=op_channel, t0_det=t0))
        # the scenario must actually exercise the threshold walk
        assert any(len(s.trigger_idx) > 0 for s in solos)

        monkeypatch.setenv('LARNDSIM_MODE0_TAIL', grouped_tail)
        segs_g = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *segs_list)
        groups = simulate_light_group_mode0(
            segs_g, det_model, light, sim, np.stack(incs), np.stack(voxs),
            np.stack(t0s), lut, noise, key_mod, np.array(evs), op_channel)

        assert len(groups) == len(evs)
        for solo, grp in zip(solos, groups):
            np.testing.assert_array_equal(solo.trigger_idx,
                                          grp.trigger_idx)
            np.testing.assert_array_equal(solo.trigger_type,
                                          grp.trigger_type)
            np.testing.assert_array_equal(solo.op_channel_idx,
                                          grp.op_channel_idx)
            assert solo.start_time == grp.start_time
            assert solo.n_ticks == grp.n_ticks
            np.testing.assert_array_equal(np.asarray(solo.waveforms),
                                          np.asarray(grp.waveforms))
            s_sparse = (solo.truth_future.result()
                        if solo.truth_future is not None
                        else solo.truth_sparse)
            g_sparse = (grp.truth_future.result()
                        if grp.truth_future is not None
                        else grp.truth_sparse)
            if s_sparse is not None:
                assert g_sparse is not None
                for k in s_sparse:
                    np.testing.assert_array_equal(s_sparse[k], g_sparse[k])

    def test_grouped_smeared_truth_matches_solo(self, setup):
        """LUT-smearing truth (dense-series FFT path) in the grouped call
        matches per-event solo calls exactly."""
        import dataclasses
        from larndsim_tpu.params import load_light
        from larndsim_tpu.assets.light_lut import (make_light_lut,
                                                   make_light_noise)
        from larndsim_tpu.ops import light as light_ops
        from larndsim_tpu.models.light import (simulate_light_batch,
                                               simulate_light_group)

        det_model, sim, _ = setup
        det = det_model.params
        light = dataclasses.replace(
            load_light(DETPROP, asset_root='/root/reference'),
            light_trig_mode=1, enable_lut_smearing=True)
        sim = dataclasses.replace(sim, max_mc_truth_ids=4)
        lut = light_ops.LightLUT.from_structured(
            make_light_lut(vox_div=(14, 26, 8), n_det_tpc=48))
        noise = make_light_noise(light.n_op_channel)
        op_channel = np.asarray(light.tpc_to_op_channel).ravel()

        from larndsim_tpu.ops.quench import quench
        from larndsim_tpu.ops.drift import drift
        from larndsim_tpu.params import physics

        key_mod = jax.random.PRNGKey(5)
        evs, segs_list, incs, voxs = [2, 9], [], [], []
        for ev in evs:
            tr = make_test_tracks(det, n=3 + ev % 2)
            tr['dEdx'] = 14.0
            tr['dE'] = tr['dEdx'] * tr['dx']
            segs = seg_mod.from_structured(tr, pad_to=16)
            segs = drift(quench(segs, det, physics.BIRKS), det)
            n_det, _, vox = light_ops.calculate_light_incidence(
                segs, det, light, lut.vis, lut.t0,
                n_channels=light.n_op_channel)
            segs_list.append(segs)
            incs.append(np.asarray(n_det))
            voxs.append(np.asarray(vox))

        solos = [simulate_light_batch(
            segs, det_model, light, sim, inc, vox, lut, noise,
            jax.random.fold_in(key_mod, ev), i_subbatch=0,
            op_channel=op_channel)
            for ev, segs, inc, vox in zip(evs, segs_list, incs, voxs)]

        segs_g = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *segs_list)
        groups = simulate_light_group(
            segs_g, det_model, light, sim, np.stack(incs), np.stack(voxs),
            lut, noise, key_mod, np.array(evs), op_channel)

        for solo, grp in zip(solos, groups):
            np.testing.assert_array_equal(solo.waveforms, grp.waveforms)
            assert solo.truth_sparse is not None
            assert grp.truth_sparse is not None
            for k in solo.truth_sparse:
                np.testing.assert_array_equal(
                    solo.truth_sparse[k], grp.truth_sparse[k])
            assert len(grp.truth_sparse['tick']) > 0
