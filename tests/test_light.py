"""Light-chain closures: visibility lookup, photon bookkeeping through the
scintillation/SiPM convolutions, Poisson statistics, trigger logic, and the
end-to-end light batch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from larndsim_tpu.params import load_detector, load_light, load_sim, physics
from larndsim_tpu.assets.light_lut import make_light_lut, make_light_noise
from larndsim_tpu.ops import light as light_ops
from larndsim_tpu.ops.drift import drift
from larndsim_tpu.ops.quench import quench
from larndsim_tpu.models.light import simulate_light_batch
from larndsim_tpu import segments as seg_mod

from test_charge_chain import make_test_tracks, DETPROP, PIXEL, SIMPROP


@pytest.fixture(scope='module')
def setup():
    det_model = load_detector(DETPROP, PIXEL)
    light = load_light(DETPROP, asset_root='/root/reference')
    sim = load_sim(SIMPROP)
    lut_arr = make_light_lut(vox_div=(14, 26, 8), n_det_tpc=48)
    lut = light_ops.LightLUT.from_structured(lut_arr)
    return det_model, light, sim, lut


def drifted_segments(det, n=8):
    tr = make_test_tracks(det, n=n)
    tr['dEdx'] = 10.0
    tr['dE'] = tr['dEdx'] * tr['dx']
    segs = seg_mod.from_structured(tr)
    segs = quench(segs, det, physics.BIRKS)
    return drift(segs, det)


class TestIncidence:
    def test_channels_gated_by_tpc(self, setup):
        det_model, light, sim, lut = setup
        segs = drifted_segments(det_model.params)
        n_det, t0_det, vox = light_ops.calculate_light_incidence(
            segs, det_model.params, light, lut.vis, lut.t0,
            n_channels=light.n_op_channel)
        n_det = np.asarray(n_det)
        planes = np.asarray(segs.pixel_plane)
        op_to_tpc = np.asarray(light.op_channel_to_tpc)
        valid = np.asarray(segs.valid)
        # photons only land on channels of the segment's TPC
        for s in np.nonzero(valid)[0]:
            other = n_det[s][op_to_tpc != planes[s]]
            assert (other == 0).all()
        assert (n_det >= 0).all() and n_det.sum() > 0

    def test_visibility_scaling(self, setup):
        det_model, light, sim, lut = setup
        segs = drifted_segments(det_model.params, n=2)
        n_det, _, vox = light_ops.calculate_light_incidence(
            segs, det_model.params, light, lut.vis, lut.t0,
            n_channels=light.n_op_channel)
        # doubling n_photons doubles the detected photons
        segs2 = segs.replace(n_photons=segs.n_photons * 2)
        n_det2, _, _ = light_ops.calculate_light_incidence(
            segs2, det_model.params, light, lut.vis, lut.t0,
            n_channels=light.n_op_channel)
        np.testing.assert_allclose(np.asarray(n_det2),
                                   2 * np.asarray(n_det), rtol=1e-6)


class TestWaveformSynthesis:
    def test_sum_conserves_photons(self, setup):
        det_model, light, sim, lut = setup
        segs = drifted_segments(det_model.params)
        op_channel = np.arange(light.n_op_channel)
        n_det, t0_det, vox = light_ops.calculate_light_incidence(
            segs, det_model.params, light, lut.vis, lut.t0,
            n_channels=light.n_op_channel)
        inc = light_ops.sum_light_signals(
            segs, vox, n_det, jnp.asarray(op_channel), lut.time_dist,
            lut.t0_avg, jnp.float32(0.0), light, n_ticks=4096,
            lut_smearing=False)
        tick = light.light_tick_size
        total_in = float(np.asarray(n_det).sum())
        total_out = float(np.asarray(inc).sum()) * tick
        # all arrival times must fall in the window for this geometry
        assert total_out == pytest.approx(total_in, rel=1e-3)

    def test_scintillation_kernel_normalized(self, setup):
        _, light, _, _ = setup
        k = np.asarray(light_ops.scintillation_kernel(light, 50_000))
        assert k.sum() == pytest.approx(1.0, rel=1e-3)
        assert (k >= 0).all()

    def test_scintillation_conserves(self, setup):
        _, light, _, _ = setup
        sig = jnp.zeros((2, 4096)).at[:, 100].set(1000.0)
        out = light_ops.calc_scintillation_effect(sig, light, conv_ticks=4096)
        # kernel integrates to ~1 within the window (tau_t=0.752us << window)
        assert float(out[0].sum()) == pytest.approx(1000.0, rel=5e-3)
        # causal up to FFT roundoff (~1e-11 relative)
        assert abs(float(out[0, 99])) < 1e-5 * 1000.0

    def test_poisson_statistics(self, setup):
        _, light, _, _ = setup
        lam_small = 5.0 / light.light_tick_size   # mean 5 per tick
        lam_big = 100.0 / light.light_tick_size
        sig = jnp.full((2, 2000), lam_small).at[1].set(lam_big)
        out = np.asarray(light_ops.calc_stat_fluctuations(
            sig, jax.random.PRNGKey(3), light)) * light.light_tick_size
        assert out[0].mean() == pytest.approx(5.0, rel=0.05)
        assert out[0].var() == pytest.approx(5.0, rel=0.2)
        assert out[1].mean() == pytest.approx(100.0, rel=0.02)

    def test_sipm_kernel_measured_model(self, setup):
        _, light, _, _ = setup
        if light.sipm_response_model == 1:
            k = np.asarray(light_ops.sipm_kernel(light, 20_000))
            # normalized impulse: sums to ~ sum(model)
            expected = float(np.asarray(light.impulse_model).sum())
            assert k.sum() == pytest.approx(expected, rel=0.05)


class TestTriggers:
    def test_beam_mode_forces_one_trigger(self, setup):
        det_model, light, sim, lut = setup
        sig = np.zeros((96, 1000))
        lp = light.replace()
        object.__setattr__  # keep lint quiet
        # beam mode
        import dataclasses
        lp = dataclasses.replace(light, light_trig_mode=1)
        idx, ops_, types = light_ops.get_triggers(
            sig, np.full(16, -1500.0), np.arange(96), 0, lp,
            det_model.module_to_tpcs, det_model.tpc_to_module,
            np.asarray(light.tpc_to_op_channel))
        assert list(idx) == [0] and list(types) == [1]
        # sub-batches don't retrigger
        idx2, _, _ = light_ops.get_triggers(
            sig, np.full(16, -1500.0), np.arange(96), 1, lp,
            det_model.module_to_tpcs, det_model.tpc_to_module,
            np.asarray(light.tpc_to_op_channel))
        assert len(idx2) == 0

    def test_threshold_mode(self, setup):
        det_model, light, sim, lut = setup
        import dataclasses
        lp = dataclasses.replace(light, light_trig_mode=0)
        sig = np.zeros((96, 4000))
        sig[0:6, 1000:1100] = -400.0  # negative-going pulse on group 0
        thr = np.full(16, -1500.0)
        idx, ops_, types = light_ops.get_triggers(
            sig, thr, np.arange(96), 0, lp,
            det_model.module_to_tpcs, det_model.tpc_to_module,
            np.asarray(light.tpc_to_op_channel))
        # group sum = 6 * -400 = -2400 < -1500 -> trigger near tick 1000
        assert len(idx) == 1
        assert 900 <= idx[0] <= 1100

    def test_device_scan_matches_host_walk(self, setup):
        """The blocked lax.scan dead-time walk (device) reproduces the
        sequential host walk on multi-trigger waveforms, including pulses
        falling inside and just past the dead-time window."""
        det_model, light, sim, lut = setup
        import dataclasses
        lp = dataclasses.replace(light, light_trig_mode=0)
        rng = np.random.default_rng(9)
        digit_ticks = int(np.ceil((lp.light_trig_window[1]
                                   + lp.light_trig_window[0])
                                  / lp.light_tick_size))
        T = 4 * digit_ticks + 500
        for trial in range(4):
            sig = np.zeros((96, T))
            # scatter pulses on several groups, incl. within dead time
            for _ in range(10):
                g = int(rng.integers(0, 16))
                t = int(rng.integers(0, T - 120))
                sig[g * 6:(g + 1) * 6, t:t + 100] = -400.0
            thr = np.full(16, -1500.0)
            args = (sig, thr, np.arange(96), 0, lp,
                    det_model.module_to_tpcs, det_model.tpc_to_module,
                    np.asarray(light.tpc_to_op_channel))
            idx_d, ops_d, typ_d = light_ops.get_triggers(
                *args, device_scan=True)
            idx_h, ops_h, typ_h = light_ops.get_triggers(
                *args, device_scan=False)
            np.testing.assert_array_equal(idx_d, idx_h, err_msg=f'trial {trial}')
            np.testing.assert_array_equal(typ_d, typ_h)
            np.testing.assert_array_equal(ops_d, ops_h)

    def test_ref_exact_digitize_toggle(self, setup):
        """ref_exact=True reproduces the reference's active code line
        (light_sim.py:498: trigger_idx ignored — every trigger samples
        from padded tick 0); default mode applies per-trigger windows."""
        import jax.numpy as jnp
        det_model, light, sim, lut = setup
        pre = int(np.ceil(light.light_trig_window[0]
                          / light.light_tick_size))
        digit_samples = int(np.ceil((light.light_trig_window[0]
                                     + light.light_trig_window[1])
                                    / light.light_digit_sample_spacing))
        T = 4000 + pre
        sig = np.zeros((4, T))
        sig[:, pre + 2000: pre + 2100] = -700.0  # pulse at trigger 2
        trig = jnp.asarray([pre + 0, pre + 2000])
        kw = dict(digit_samples=digit_samples, quantize=False)
        w_int = np.asarray(light_ops.digitize_signal(
            jnp.asarray(sig), trig, light, **kw))
        w_ref = np.asarray(light_ops.digitize_signal(
            jnp.asarray(sig), trig, light, ref_exact=True, **kw))
        # intended: trigger 2 sees the pulse, trigger 1 does not
        assert np.abs(w_int[1]).max() > 100 > np.abs(w_int[0]).max()
        # reference-exact: both triggers digitize the same tick-0 window
        np.testing.assert_array_equal(w_ref[0], w_ref[1])
        assert not np.array_equal(w_ref[1], w_int[1])


class TestLightBatch:
    def test_end_to_end_beam(self, setup):
        det_model, light, sim, lut = setup
        import dataclasses
        lp = dataclasses.replace(light, light_trig_mode=1)
        segs = drifted_segments(det_model.params)
        n_det, t0_det, vox = light_ops.calculate_light_incidence(
            segs, det_model.params, lp, lut.vis, lut.t0,
            n_channels=lp.n_op_channel)
        noise = make_light_noise(lp.n_op_channel)
        res = simulate_light_batch(
            segs, det_model, lp, sim, n_det, vox, lut, noise,
            jax.random.PRNGKey(11), t0_det=t0_det)
        assert res.waveforms.shape[0] == 1  # one beam trigger
        assert res.waveforms.shape[1] == lp.n_op_channel
        digit_samples = int(np.ceil((lp.light_trig_window[1]
                                     + lp.light_trig_window[0])
                                    / lp.light_digit_sample_spacing))
        assert res.waveforms.shape[2] == digit_samples
        # quantization grid respected
        q = 2 ** (16 - lp.light_nbit)
        assert np.allclose(res.waveforms % q, 0)
        # some signal present
        assert np.abs(res.waveforms).max() > 0
