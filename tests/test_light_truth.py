"""Light MC-truth backtracking: top-K contributor propagation + export."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from larndsim_tpu.params import load_detector, load_light, load_sim
from larndsim_tpu.assets.light_lut import make_light_lut, make_light_noise
from larndsim_tpu.ops import light as light_ops
from larndsim_tpu.models.light import simulate_light_batch
from larndsim_tpu.io import export

from test_charge_chain import DETPROP, PIXEL, SIMPROP
from test_light import drifted_segments


@pytest.fixture(scope='module')
def setup():
    det_model = load_detector(DETPROP, PIXEL)
    light = load_light(DETPROP, asset_root='/root/reference')
    light = dataclasses.replace(light, light_trig_mode=1)
    sim = load_sim(SIMPROP)
    sim = dataclasses.replace(sim, max_mc_truth_ids=4)
    lut = light_ops.LightLUT.from_structured(
        make_light_lut(vox_div=(14, 26, 8), n_det_tpc=48))
    return det_model, light, sim, lut


class TestLightTruth:
    def test_truth_series_conserves(self, setup):
        det_model, light, sim, lut = setup
        segs = drifted_segments(det_model.params, n=3)  # K >= n: all tracked
        op_channel = np.arange(light.n_op_channel)
        n_det, t0_det, vox = light_ops.calculate_light_incidence(
            segs, det_model.params, light, lut.vis, lut.t0,
            n_channels=light.n_op_channel)
        ids, series = light_ops.light_truth_series(
            segs, vox, n_det, jnp.asarray(op_channel), lut.time_dist,
            lut.t0_avg, jnp.float32(0.0), light, n_ticks=4096,
            k_truth=8, lut_smearing=False)
        ids, series = np.asarray(ids), np.asarray(series)
        # summed truth series equals the total photon series per channel
        tick = light.light_tick_size
        total_truth = series.sum(axis=1).sum(axis=1) * tick      # (C,)
        total_inc = np.asarray(n_det).sum(axis=0)
        np.testing.assert_allclose(total_truth, total_inc, rtol=1e-3)
        # ids reference real segments
        valid_ids = ids[ids >= 0]
        assert set(valid_ids.tolist()) <= set(
            np.asarray(segs.segment_id)[np.asarray(segs.valid)].tolist())

    def test_delta_path_matches_fft_path(self, setup):
        """Closed-form kernel interpolation == series->FFT->interp."""
        import jax.numpy as jnp
        det_model, light, sim, lut = setup
        segs = drifted_segments(det_model.params, n=4)
        op_channel = jnp.arange(light.n_op_channel)
        n_det, t0_det, vox = light_ops.calculate_light_incidence(
            segs, det_model.params, light, lut.vis, lut.t0,
            n_channels=light.n_op_channel)
        n_ticks, conv_ticks, samples = 4096, 2048, 128
        scint_k = jnp.pad(
            light_ops.scintillation_kernel(light, conv_ticks),
            (0, conv_ticks))
        combined = light_ops.causal_convolve(
            scint_k[None, :], light_ops.sipm_kernel(light, conv_ticks))[0]

        trigger_idx = jnp.asarray([64])
        ids1, amp, itick = light_ops.light_truth_points(
            segs, vox, n_det, op_channel, lut.t0_avg, jnp.float32(0.0),
            light, k_truth=4)
        direct = np.asarray(light_ops.light_truth_sample(
            amp, itick, combined, trigger_idx, light,
            digit_samples=samples))

        ids2, series = light_ops.light_truth_series(
            segs, vox, n_det, op_channel, lut.time_dist, lut.t0_avg,
            jnp.float32(0.0), light, n_ticks=n_ticks, k_truth=4,
            lut_smearing=False)
        C, K = ids2.shape
        flat = light_ops.causal_convolve(
            series.reshape(C * K, n_ticks), combined)
        pre = int(np.ceil(light.light_trig_window[0]
                          / light.light_tick_size))
        flat = jnp.pad(flat, ((0, 0), (pre, 2048)))
        fft_path = np.asarray(light_ops.digitize_signal(
            flat, trigger_idx + pre, light, digit_samples=samples,
            quantize=False)).reshape(1, C, K, samples).transpose(0, 1, 3, 2)

        np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))
        scale = np.abs(fft_path).max() + 1e-30
        np.testing.assert_allclose(direct / scale, fft_path / scale,
                                   atol=2e-5)

    def test_transfer_table_matches_fft_path(self, setup):
        """series @ truth_transfer_table == conv -> pad -> digitize,
        for smeared (profile) series and a non-trivial trigger set."""
        det_model, light, sim, lut = setup
        segs = drifted_segments(det_model.params, n=4)
        op_channel = jnp.arange(light.n_op_channel)
        n_det, t0_det, vox = light_ops.calculate_light_incidence(
            segs, det_model.params, light, lut.vis, lut.t0,
            n_channels=light.n_op_channel)
        n_ticks, conv_ticks, samples = 4096, 2048, 128
        scint_k = jnp.pad(
            light_ops.scintillation_kernel(light, conv_ticks),
            (0, conv_ticks))
        combined = light_ops.causal_convolve(
            scint_k[None, :], light_ops.sipm_kernel(light, conv_ticks))[0]

        ids, series = light_ops.light_truth_series(
            segs, vox, n_det, op_channel, lut.time_dist, lut.t0_avg,
            jnp.float32(0.0), light, n_ticks=n_ticks, k_truth=4,
            lut_smearing=True)
        C, K = ids.shape
        flat = series.reshape(C * K, n_ticks)

        pad_front, pad_back = 37, 512
        trigger_idx = jnp.asarray([0, 129]) + pad_front  # padded coords

        conv = light_ops.causal_convolve(flat, combined)
        padded = jnp.pad(conv, ((0, 0), (pad_front, pad_back)))
        fft_path = np.asarray(light_ops.digitize_signal(
            padded, trigger_idx, light, digit_samples=samples,
            quantize=False))                             # (ntrig, C*K, S)

        T = light_ops.truth_transfer_table(
            combined, trigger_idx - pad_front, light,
            n_ticks=n_ticks, digit_samples=samples, pad_front=pad_front,
            n_padded=n_ticks + pad_front + pad_back)
        mm = np.asarray(jnp.dot(flat, T,
                                precision=jax.lax.Precision.HIGHEST))
        mm = mm.reshape(C * K, 2, samples).transpose(1, 0, 2)

        scale = np.abs(fft_path).max() + 1e-30
        np.testing.assert_allclose(mm / scale, fft_path / scale, atol=2e-5)

    def test_host_smeared_truth_matches_device_path(self, setup):
        """Host metadata recompute == device dense series -> transfer
        matmul -> packed pull, record for record."""
        from larndsim_tpu.models import light as light_model
        det_model, light, sim, lut = setup
        segs = drifted_segments(det_model.params, n=5)
        op_channel = np.arange(light.n_op_channel)
        n_det, t0_det, vox = light_ops.calculate_light_incidence(
            segs, det_model.params, light, lut.vis, lut.t0,
            n_channels=light.n_op_channel)
        n_ticks, conv_ticks, samples = 4096, 2048, 128
        pad_front, pad_back = 64, 512
        threshold = 1e-3
        k = 4

        ids, con, t0s, voxs = light_ops.light_truth_select(
            segs, jnp.asarray(vox), n_det, k_truth=k)
        host = light_model._host_smeared_truth_sparse(
            ids, con, t0s, voxs, lut.time_dist_host, op_channel, light,
            threshold, conv_ticks, n_ticks, samples, pad_front, pad_back,
            0.0)

        ids2, tw = light_model._smeared_truth_stage(
            segs, jnp.asarray(vox), n_det, jnp.asarray(op_channel),
            lut.time_dist, lut.t0_avg, jnp.float32(0.0),
            jnp.asarray([pad_front]), light, n_ticks=n_ticks,
            conv_ticks=conv_ticks, k_truth=k, digit_samples=samples,
            pad_front=pad_front, pad_back=pad_back)
        dev = light_model._pull_dense_truth_sparse(
            ids2, tw, op_channel, threshold)

        assert len(host['tick']) > 0
        # identical keep-sets (values are far from the tiny threshold)
        h_key = np.stack([host['op_channel'], host['tick'],
                          host['segment_id']])
        d_key = np.stack([dev['op_channel'], dev['tick'],
                          dev['segment_id']])
        np.testing.assert_array_equal(h_key, d_key)
        np.testing.assert_allclose(host['pe_current'], dev['pe_current'],
                                   rtol=1e-4, atol=1e-6)

    def test_host_truth_fast_path_matches_slow(self, setup):
        """Per-voxel convolution fast path == per-row transfer-table matmul
        (same inputs, same records)."""
        from larndsim_tpu.models import light as light_model
        det_model, light, sim, lut = setup
        segs = drifted_segments(det_model.params, n=6)
        op_channel = np.arange(light.n_op_channel)
        n_det, t0_det, vox = light_ops.calculate_light_incidence(
            segs, det_model.params, light, lut.vis, lut.t0,
            n_channels=light.n_op_channel)
        n_ticks, conv_ticks, samples = 4096, 2048, 128
        args = ()
        ids, con, t0s, voxs = light_ops.light_truth_select(
            segs, jnp.asarray(vox), n_det, k_truth=4)
        common = (ids, con, t0s, voxs, lut.time_dist_host, op_channel,
                  light, 1e-3, conv_ticks, n_ticks, samples, 64, 512, 0.0)
        fast = light_model._host_smeared_truth_sparse(*common)
        slow = light_model._host_smeared_truth_sparse(*common,
                                                      _force_slow=True)
        assert len(fast['tick']) > 0
        for k in ('trig', 'op_channel', 'tick', 'segment_id'):
            np.testing.assert_array_equal(fast[k], slow[k])
        np.testing.assert_allclose(fast['pe_current'], slow['pe_current'],
                                   rtol=1e-4, atol=1e-6)

    def test_host_truth_records_match_dict_path(self, setup):
        """as_records per-channel assembly == dict path + records helper."""
        from larndsim_tpu.models import light as light_model
        det_model, light, sim, lut = setup
        segs = drifted_segments(det_model.params, n=6)
        op_channel = np.arange(light.n_op_channel)
        n_det, t0_det, vox = light_ops.calculate_light_incidence(
            segs, det_model.params, light, lut.vis, lut.t0,
            n_channels=light.n_op_channel)
        ids, con, t0s, voxs = light_ops.light_truth_select(
            segs, jnp.asarray(vox), n_det, k_truth=4)
        common = (ids, con, t0s, voxs, lut.time_dist_host, op_channel,
                  light, 1e-3, 2048, 4096, 128, 64, 512, 0.0)
        rec = light_model._host_smeared_truth_sparse(*common,
                                                     as_records=True)
        rec['event_id'] = 3
        rec['trigger_id'] += 7
        ref = export.truth_sparse_to_records(
            light_model._host_smeared_truth_sparse(*common), 3, 7)
        assert rec.shape == ref.shape and rec.shape[0] > 0
        for name in rec.dtype.names:
            np.testing.assert_array_equal(rec[name], ref[name], err_msg=name)

    def test_batch_produces_truth(self, setup):
        det_model, light, sim, lut = setup
        segs = drifted_segments(det_model.params, n=6)
        op_channel = np.arange(light.n_op_channel)
        n_det, t0_det, vox = light_ops.calculate_light_incidence(
            segs, det_model.params, light, lut.vis, lut.t0,
            n_channels=light.n_op_channel)
        res = simulate_light_batch(
            segs, det_model, light, sim, n_det, vox, lut,
            make_light_noise(light.n_op_channel), jax.random.PRNGKey(5),
            t0_det=t0_det)
        assert res.truth_sparse is not None
        truth = export.truth_sparse_to_records(res.truth_sparse,
                                               event_id=3, i_trig=0)
        assert truth.shape[0] > 0
        assert (np.abs(truth['pe_current']) > sim.mc_truth_threshold).all()
        assert (truth['event_id'] == 3).all()
        assert (truth['segment_id'] >= 0).all()
        assert truth['op_channel_id'].max() < light.n_op_channel


class TestTruthExportCompression:
    def test_lzf_roundtrip_and_append(self, tmp_path):
        """light_wvfm_mc_assn: shuffle+lzf storage is transparent to
        readers and append-compatible; 'none' stores unfiltered (byte
        layout parity with the reference)."""
        from larndsim_tpu.io import export
        import h5py
        rng = np.random.default_rng(1)
        n = 5000
        rec = np.zeros(n, export.TRUTH_DTYPE)
        rec['op_channel_id'] = rng.integers(0, 384, n)
        rec['tick'] = rng.integers(0, 1000, n)
        rec['segment_id'] = rng.integers(0, 9000, n)
        rec['pe_current'] = rng.random(n) * 5 - 1

        fz = str(tmp_path / 'z.h5')
        export.export_light_truth_to_hdf5(fz, rec[:3000])
        export.export_light_truth_to_hdf5(fz, rec[3000:])
        with h5py.File(fz) as f:
            d = f['light_wvfm_mc_assn']
            assert d.compression == 'lzf' and d.shuffle
            np.testing.assert_array_equal(np.asarray(d), rec)

        fp = str(tmp_path / 'p.h5')
        export.export_light_truth_to_hdf5(fp, rec, compression='none')
        with h5py.File(fp) as f:
            d = f['light_wvfm_mc_assn']
            assert d.compression is None
            np.testing.assert_array_equal(np.asarray(d), rec)


class TestKernelCacheKeys:
    def test_transfer_table_distinguishes_kernel_scalars(self):
        """Two configs with identical geometry but different tau_s must not
        alias in the transfer-table/kernel caches (review finding r2)."""
        import dataclasses
        from larndsim_tpu.models import light as lm
        from larndsim_tpu.params import load_light

        ref = '/root/reference/larndsim'
        l1 = load_light(f'{ref}/detector_properties/module0.yaml')
        l2 = dataclasses.replace(l1, tau_s=np.float32(0.002))
        args = (80, 2048, 500, 4, 2048 + 4 + 16)
        t1 = lm._transfer_table_host(l1, *args)
        t1b = lm._transfer_table_host(l1, *args)
        t2 = lm._transfer_table_host(l2, *args)
        assert t1 is t1b                      # cache hit for same config
        assert not np.array_equal(t1, t2)     # no aliasing across configs

    def test_adopt_host_scalars_after_replace(self):
        """dataclasses.replace copies share the loader-seeded host scalars
        via adopt (no device pull on the replaced object)."""
        import dataclasses
        from larndsim_tpu.params import light as light_params
        from larndsim_tpu.params import load_light

        ref = '/root/reference/larndsim'
        l1 = load_light(f'{ref}/detector_properties/module0.yaml')
        base = light_params.host_scalars(l1)
        l2 = dataclasses.replace(l1, light_simulated=False)
        light_params.adopt_host_scalars(l2, l1)
        assert light_params.host_scalars(l2) is base

    def test_seed_survives_cache_churn(self):
        """Regression for VERDICT r3 weak #2: the host-scalar cache used a
        wholesale clear() when over its bound, so a LIVE params object
        could lose its f64 loader seed mid-run and silently fall back to
        the f32-rounded device pull — shifting the transfer table by
        ~5e-7 and breaking byte-identity across n_devices.  Seeds must
        survive arbitrarily many later params objects."""
        from larndsim_tpu.params import light as light_params
        from larndsim_tpu.params import load_light

        ref = '/root/reference/larndsim'
        l1 = load_light(f'{ref}/detector_properties/module0.yaml')
        base = light_params.host_scalars(l1)
        # the loader seed is the raw YAML f64 value, not the f32-rounded
        # device leaf (the two differ in the low bits — losing the seed
        # is a silent physics shift, not just a perf regression)
        assert base['tau_t'] != float(np.float32(base['tau_t']))
        churn = [load_light(f'{ref}/detector_properties/module0.yaml')
                 for _ in range(80)]
        for c in churn:
            light_params.host_scalars(c)
        assert light_params.host_scalars(l1) is base
        del churn   # dead entries are the ones weakref pruning may drop
        for _ in range(70):
            light_params.host_scalars(
                load_light(f'{ref}/detector_properties/module0.yaml'))
        assert light_params.host_scalars(l1) is base


class TestNativeEmit:
    """native/truth_emit.cpp vs the numpy emission path: identical records."""

    def _emit_both(self, threshold, event_id=11, seed=7):
        from larndsim_tpu.models import light as lm
        if lm._truth_emit_lib() is None:
            pytest.skip('no native toolchain')
        rng = np.random.default_rng(seed)
        C, K, S = 5, 7, 64
        rows = np.sort(rng.choice(C * K, size=17, replace=False))
        res = rng.normal(0, 1, (rows.size, S)).astype(np.float32)
        res[np.abs(res) < 0.3] *= 1e-3          # sub-threshold mix
        res[0, :4] = np.float32(threshold)       # exact-boundary values
        ids = rng.integers(0, 10 ** 6, (C, K)).astype(np.int64)
        op = (np.arange(C) * 3).astype(np.int64)
        args = (res, rows, ids, op, C, K, threshold, True, S,
                lambda n: None, None)
        nat = lm._emit_truth(*args, event_id=event_id)
        orig = lm._TRUTH_EMIT_LIB
        lm._TRUTH_EMIT_LIB = (None,)            # force the numpy path
        try:
            ref = lm._emit_truth(*args, event_id=event_id)
        finally:
            lm._TRUTH_EMIT_LIB = orig
        return nat, ref

    def test_records_identical(self):
        nat, ref = self._emit_both(threshold=0.5)
        assert len(nat) == len(ref) > 0
        for f in nat.dtype.names:
            np.testing.assert_array_equal(nat[f], ref[f], err_msg=f)

    def test_all_suppressed(self):
        nat, ref = self._emit_both(threshold=1e9)
        assert len(nat) == len(ref) == 0


class TestFusedChunks:
    """native/truth_chunks.cpp fused emit+compress vs the record path.

    Drives multiple events through the ledger so the second event starts
    mid-chunk (head stitching), with enough records to cross several full
    1 MiB chunk boundaries, and validates the stored dataset byte-for-byte
    against plain-record appends read back by stock h5py."""

    def _make_event(self, seed, n_rows=96, S=1024, C=8, K=16):
        rng = np.random.default_rng(seed)
        rows = np.sort(rng.choice(C * K, size=n_rows, replace=False))
        res = rng.normal(0, 1, (rows.size, S)).astype(np.float32)
        ids = rng.integers(0, 10 ** 6, (C, K)).astype(np.int64)
        op = (np.arange(C) * 3).astype(np.int64)
        return res, rows, ids, op, C, K, S

    def test_fused_dataset_identical(self, tmp_path):
        from larndsim_tpu.io import export
        from larndsim_tpu.models import light as lm
        if lm._truth_chunks_lib() is None:
            pytest.skip('no native toolchain')
        threshold = 0.05            # keeps ~96% -> ~94k records/event
        f_fused = str(tmp_path / 'fused.h5')
        f_plain = str(tmp_path / 'plain.h5')
        ledger = lm.TruthLedger(0)
        for ev, seed in enumerate((3, 4, 5)):
            res, rows, ids, op, C, K, S = self._make_event(seed)
            args = (res, rows, ids, op, C, K, threshold, True, S,
                    lambda n: None, None)
            seq = ledger.claim()
            fused = lm._emit_truth(*args, event_id=ev, trigger_id=ev + 7,
                                   ledger=ledger, seq=seq)
            assert isinstance(fused, lm.FusedTruthChunks)
            if ev > 0:
                # the running offset is never chunk-aligned here, so head
                # stitching is exercised
                assert fused.start_offset % export._TRUTH_CHUNK != 0
            assert fused.n_chunks >= 2      # full-chunk compress covered
            export.export_light_truth_chunks(f_fused, fused)
            recs = lm._emit_truth(*args, event_id=ev, trigger_id=ev + 7)
            assert len(recs) == fused.total
            export.export_light_truth_to_hdf5(f_plain, recs,
                                              compression='lzf')
        import h5py
        with h5py.File(f_fused) as ff, h5py.File(f_plain) as fp:
            a = np.array(ff['light_wvfm_mc_assn'])
            b = np.array(fp['light_wvfm_mc_assn'])
            assert len(a) == len(b) > 2 * export._TRUTH_CHUNK
            np.testing.assert_array_equal(a, b)

    def test_ledger_desync_raises(self, tmp_path):
        from larndsim_tpu.io import export
        from larndsim_tpu.models import light as lm
        if lm._truth_chunks_lib() is None:
            pytest.skip('no native toolchain')
        res, rows, ids, op, C, K, S = self._make_event(9, n_rows=8, S=64)
        ledger = lm.TruthLedger(500)    # wrong: file starts empty
        fused = lm._emit_truth(res, rows, ids, op, C, K, 0.05, True, S,
                               lambda n: None, None, event_id=0,
                               ledger=ledger, seq=ledger.claim())
        with pytest.raises(RuntimeError, match='desync'):
            export.export_light_truth_chunks(str(tmp_path / 'x.h5'), fused)


class TestMultiTriggerHostTruth:
    """Mode-0 / multi-trigger truth through the host contributor-metadata
    path: one transfer table per trigger offset, records trigger-major —
    golden against the device dense path (_smeared_truth_stage ->
    _pull_dense_truth_sparse), which round 2 pinned against the
    reference's own light chain (light_sim.py:621-661 record order)."""

    def _inputs(self, setup, n=5, k=4):
        det_model, light, sim, lut = setup
        segs = drifted_segments(det_model.params, n=n)
        op_channel = np.arange(light.n_op_channel)
        n_det, t0_det, vox = light_ops.calculate_light_incidence(
            segs, det_model.params, light, lut.vis, lut.t0,
            n_channels=light.n_op_channel)
        return det_model, light, sim, lut, segs, op_channel, n_det, vox

    def test_multi_trigger_matches_device_dense(self, setup):
        from larndsim_tpu.models import light as light_model
        (det_model, light, sim, lut, segs, op_channel, n_det,
         vox) = self._inputs(setup)
        n_ticks, conv_ticks, samples = 4096, 2048, 128
        pad_front, pad_back = 64, 512
        threshold = 1e-3
        k = 4
        trig = np.array([0, 129, 1500])

        ids, con, t0s, voxs = light_ops.light_truth_select(
            segs, jnp.asarray(vox), n_det, k_truth=k)
        host = light_model._host_smeared_truth_sparse(
            ids, con, t0s, voxs, lut.time_dist_host, op_channel, light,
            threshold, conv_ticks, n_ticks, samples, pad_front, pad_back,
            0.0, trigger_idx=trig)

        ids2, tw = light_model._smeared_truth_stage(
            segs, jnp.asarray(vox), n_det, jnp.asarray(op_channel),
            lut.time_dist, lut.t0_avg, jnp.float32(0.0),
            jnp.asarray(trig + pad_front), light, n_ticks=n_ticks,
            conv_ticks=conv_ticks, k_truth=k, digit_samples=samples,
            pad_front=pad_front, pad_back=pad_back)
        dev = light_model._pull_dense_truth_sparse(
            ids2, tw, op_channel, threshold)

        assert len(host['tick']) > 0
        assert set(np.unique(host['trig']).tolist()) == {0, 1, 2}
        h_key = np.stack([host['trig'], host['op_channel'], host['tick'],
                          host['segment_id']])
        d_key = np.stack([dev['trig'], dev['op_channel'], dev['tick'],
                          dev['segment_id']])
        np.testing.assert_array_equal(h_key, d_key)
        np.testing.assert_allclose(host['pe_current'], dev['pe_current'],
                                   rtol=1e-4, atol=1e-6)

    def test_multi_trigger_records_match_dict(self, setup):
        from larndsim_tpu.models import light as light_model
        (det_model, light, sim, lut, segs, op_channel, n_det,
         vox) = self._inputs(setup, n=6)
        trig = np.array([10, 700])
        ids, con, t0s, voxs = light_ops.light_truth_select(
            segs, jnp.asarray(vox), n_det, k_truth=4)
        common = (ids, con, t0s, voxs, lut.time_dist_host, op_channel,
                  light, 1e-3, 2048, 4096, 128, 64, 512, 0.0)
        rec = light_model._host_smeared_truth_sparse(
            *common, as_records=True, trigger_idx=trig, event_id=3,
            trig_get=lambda: 7)
        ref = export.truth_sparse_to_records(
            light_model._host_smeared_truth_sparse(*common,
                                                   trigger_idx=trig),
            3, 7)
        assert rec.shape == ref.shape and rec.shape[0] > 0
        assert set(np.unique(rec['trigger_id']).tolist()) == {7, 8}
        for name in rec.dtype.names:
            np.testing.assert_array_equal(rec[name], ref[name],
                                          err_msg=name)

    def test_mode0_batch_no_dense_tensor(self, setup):
        """simulate_light_batch in trig mode 0 with smearing truth routes
        through the worker path (truth_future), not a dense device pull."""
        import dataclasses as dc
        from concurrent.futures import ThreadPoolExecutor
        from larndsim_tpu.models.light import simulate_light_batch
        from larndsim_tpu.assets.light_lut import make_light_noise
        det_model, light, sim, lut = setup
        light0 = dc.replace(light, light_trig_mode=0,
                            enable_lut_smearing=True)
        from larndsim_tpu.params import light as light_params_mod
        light_params_mod.adopt_host_scalars(light0, light)
        segs = drifted_segments(det_model.params, n=6)
        op_channel = np.arange(light0.n_op_channel)
        n_det, t0_det, vox = light_ops.calculate_light_incidence(
            segs, det_model.params, light0, lut.vis, lut.t0,
            n_channels=light0.n_op_channel)
        # force triggers with a generous threshold
        light0 = dc.replace(light0, light_trig_threshold=jnp.full_like(
            jnp.asarray(light0.light_trig_threshold), 1e30))
        light_params_mod.adopt_host_scalars(light0, light)
        pool = ThreadPoolExecutor(max_workers=1)
        try:
            res = simulate_light_batch(
                segs, det_model, light0, sim, n_det, vox, lut,
                make_light_noise(light0.n_op_channel),
                jax.random.PRNGKey(5), t0_det=t0_det, truth_executor=pool,
                event_id=2)
            assert res.trigger_idx.shape[0] >= 1
            assert res.truth_future is not None     # worker path engaged
            assert res.truth_sparse is None
            res.trig_box.set(0)
            truth = res.truth_future.result()
            assert isinstance(truth, np.ndarray) and truth.shape[0] > 0
            assert (truth['event_id'] == 2).all()
            n_trig = res.trigger_idx.shape[0]
            # records span several triggers (late triggers can fall below
            # threshold — the scintillation tail dies off)
            assert 1 <= truth['trigger_id'].max() <= n_trig - 1
        finally:
            pool.shutdown(wait=True)

class TestTruthPathResolver:
    """resolve_truth_path: link-adaptive host-recompute vs device-pack
    choice (VERDICT r2 #6 — the 12 MB/s tunnel assumption out of the
    code path, both branches tested)."""

    @pytest.fixture(autouse=True)
    def _reset(self, monkeypatch):
        from larndsim_tpu.models import light as light_model
        from larndsim_tpu.utils import link
        monkeypatch.delenv('LARNDSIM_TRUTH_PATH', raising=False)
        monkeypatch.delenv('LARNDSIM_PULL_MBPS', raising=False)
        light_model._TRUTH_PATH_CACHE.clear()
        link.reset_for_tests()
        yield
        light_model._TRUTH_PATH_CACHE.clear()
        link.reset_for_tests()

    def test_env_override_and_cache(self, monkeypatch):
        from larndsim_tpu.models import light as light_model
        monkeypatch.setenv('LARNDSIM_TRUTH_PATH', 'device')
        assert light_model.resolve_truth_path() == 'device'
        # resolved once per process: later env changes don't flip it
        monkeypatch.setenv('LARNDSIM_TRUTH_PATH', 'host')
        assert light_model.resolve_truth_path() == 'device'

    def test_invalid_value_raises(self, monkeypatch):
        from larndsim_tpu.models import light as light_model
        monkeypatch.setenv('LARNDSIM_TRUTH_PATH', 'gpu')
        with pytest.raises(ValueError, match='LARNDSIM_TRUTH_PATH'):
            light_model.resolve_truth_path()

    def test_auto_non_tpu_is_host(self):
        # tests run on the CPU backend: the pull is a memcpy, auto must
        # not read it as a fast link
        from larndsim_tpu.models import light as light_model
        assert light_model.resolve_truth_path() == 'host'

    def test_auto_tpu_reads_link(self, monkeypatch):
        from larndsim_tpu.models import light as light_model
        from larndsim_tpu.utils import link
        monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
        monkeypatch.setenv('LARNDSIM_PULL_MBPS', '1000')
        assert light_model.resolve_truth_path() == 'device'
        light_model._TRUTH_PATH_CACHE.clear()
        link.reset_for_tests()
        monkeypatch.setenv('LARNDSIM_PULL_MBPS', '12')  # the axon tunnel
        assert light_model.resolve_truth_path() == 'host'

    def test_pull_mbps_measures(self):
        from larndsim_tpu.utils import link
        mbps = link.pull_mbps(size_mb=2.0)
        assert mbps > 0
        assert link.pull_mbps() == mbps     # cached

    def test_measure_pulls_distinct_fresh_buffers(self, monkeypatch):
        """Regression for VERDICT r3 weak #1: jax.Array caches its host
        value after the first materialization, so timing the SAME array
        twice measures a memcpy the second time and reports an
        astronomically fast link on any real TPU tunnel.  The probe must
        pull a distinct, never-materialized device buffer per trial."""
        import numpy as np
        from larndsim_tpu.utils import link
        seen = []
        real_asarray = np.asarray

        def spy(a, *args, **kw):
            seen.append(a)
            return real_asarray(a, *args, **kw)

        monkeypatch.setattr(np, 'asarray', spy)
        mbps, times = link._measure(1.0, trials=2)
        pulled = [a for a in seen if getattr(a, 'nbytes', 0) >= 2 ** 20
                  and not isinstance(a, np.ndarray)]   # jax Arrays only
        assert len(pulled) == 2
        assert pulled[0] is not pulled[1]
        # distinct buffers too, not two handles to one donated buffer
        assert not np.shares_memory(real_asarray(pulled[0]),
                                    real_asarray(pulled[1]))
        # a cached second pull is ~1000x faster than a tunnel pull; fresh
        # buffers keep the trials within the same order of magnitude
        assert max(times) / max(min(times), 1e-9) < 50

    def test_batch_device_route_matches_host(self, setup):
        """simulate_light_batch(truth_path='device') == 'host', record for
        record, on a beam-mode smearing-truth batch."""
        import dataclasses as dc
        from larndsim_tpu.params import light as light_params_mod
        from larndsim_tpu.assets.light_lut import make_light_noise
        det_model, light, sim, lut = setup
        light1 = dc.replace(light, enable_lut_smearing=True)
        light_params_mod.adopt_host_scalars(light1, light)
        segs = drifted_segments(det_model.params, n=6)
        n_det, t0_det, vox = light_ops.calculate_light_incidence(
            segs, det_model.params, light1, lut.vis, lut.t0,
            n_channels=light1.n_op_channel)
        noise = make_light_noise(light1.n_op_channel)
        out = {}
        for route in ('host', 'device'):
            res = simulate_light_batch(
                segs, det_model, light1, sim, n_det, vox, lut, noise,
                jax.random.PRNGKey(5), t0_det=t0_det, truth_path=route)
            assert res.truth_sparse is not None
            out[route] = res.truth_sparse
        h, d = out['host'], out['device']
        assert len(h['tick']) > 0
        for k in ('op_channel', 'tick', 'segment_id'):
            np.testing.assert_array_equal(h[k], d[k], err_msg=k)
        np.testing.assert_allclose(h['pe_current'], d['pe_current'],
                                   rtol=1e-4, atol=1e-6)
