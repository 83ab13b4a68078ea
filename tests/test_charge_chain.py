"""Charge-chain physics closures + FEE parity against a python oracle.

- rho: 3D Riemann sum reproduces the total charge (reference
  tests/testTrackCharge.py closure).
- induced current + pixel accumulation conserve charge through the
  response LUT (reference tests/testTracksCurrent.py closure).
- the scan-based self-trigger FSM reproduces a direct python port of the
  reference algorithm (fee.py:517-656) tick-for-tick with noise disabled.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from larndsim_tpu.params import load_detector, load_sim, physics
from larndsim_tpu.assets.response import make_response
from larndsim_tpu.ops import accumulate, current, fee, pixelize
from larndsim_tpu.ops.drift import drift
from larndsim_tpu.ops.quench import quench
from larndsim_tpu import segments as seg_mod
from larndsim_tpu.models import charge as charge_model

REF = '/root/reference/larndsim'
DETPROP = f'{REF}/detector_properties/module0.yaml'
PIXEL = f'{REF}/pixel_layouts/multi_tile_layout-2.3.16.yaml'
SIMPROP = f'{REF}/simulation_properties/singles_sim.yaml'


@pytest.fixture(scope='module')
def det_model():
    return load_detector(DETPROP, PIXEL)


@pytest.fixture(scope='module')
def sim():
    return load_sim(SIMPROP)


@pytest.fixture(scope='module')
def response(det_model):
    det = det_model.params
    n_t = int(round(float(det.time_window) / float(det.response_sampling)))
    return make_response(n_xy=45, n_t=n_t,
                         bin_size=float(det.response_bin_size),
                         sampling=float(det.response_sampling),
                         pixel_pitch=float(det.pixel_pitch))


class TestRho:
    def test_riemann_sum(self):
        rng = np.random.default_rng(5)
        q = rng.integers(100, 1000)
        start = rng.uniform(-5, 5, 3)
        end = rng.uniform(-5, 5, 3)
        sigmas = rng.uniform(0.1, 0.5, 3)
        xx = np.linspace(-8, 8, 60)
        grid = np.stack(np.meshgrid(xx, xx, xx, indexing='ij'), axis=-1)
        vals = np.asarray(current.rho(grid.reshape(-1, 3), q, start, sigmas,
                                      end - start))
        total = vals.sum() * (xx[1] - xx[0]) ** 3
        assert total == pytest.approx(q, rel=0.05)


def make_test_tracks(det, n=10, seed=4):
    rng = np.random.default_rng(seed)
    borders = np.asarray(det.tpc_borders)
    dtype = np.dtype([(f, 'f8') for f in seg_mod.FLOAT_FIELDS]
                     + [(f, 'i8') for f in seg_mod.INT_FIELDS])
    tr = np.zeros(n, dtype=dtype)
    tr['z_start'] = rng.uniform(borders[0, 2, 0], borders[0, 2, 1], n)
    tr['z_end'] = rng.uniform(borders[0, 2, 0], borders[0, 2, 0] + 2, n)
    tr['y_start'] = rng.uniform(borders[0, 1, 0], borders[0, 1, 0] + 2, n)
    tr['y_end'] = rng.uniform(borders[0, 1, 0], borders[0, 1, 0] + 2, n)
    tr['x_start'] = rng.uniform(borders[0, 0, 0], borders[0, 0, 0] + 2, n)
    tr['x_end'] = rng.uniform(borders[0, 0, 0], borders[0, 0, 0] + 2, n)
    for ax in 'xyz':
        tr[ax] = 0.5 * (tr[f'{ax}_start'] + tr[f'{ax}_end'])
    tr['dx'] = np.sqrt((tr['x_end'] - tr['x_start']) ** 2
                       + (tr['y_end'] - tr['y_start']) ** 2
                       + (tr['z_end'] - tr['z_start']) ** 2)
    tr['dEdx'] = 2.0
    tr['dE'] = tr['dEdx'] * tr['dx']
    tr['segment_id'] = np.arange(n)
    return tr


class TestChargeConservation:
    def test_current_conserves_charge(self, det_model, sim, response):
        """Sum(I)*dt/e ~= sum(n_electrons) (testTracksCurrent.py:76)."""
        det = det_model.params
        tr = make_test_tracks(det)
        segs = seg_mod.from_structured(tr)
        segs = quench(segs, det, physics.BOX)
        segs = drift(segs, det)

        radius = 2
        max_active = charge_model.bucket(pixelize.max_active_pixels(
            {k: np.asarray(getattr(segs, k)) for k in
             ('x_start', 'y_start', 'x_end', 'y_end', 'pixel_plane')},
            det, np.asarray(det.tpc_borders)), lo=8)
        max_nb = charge_model.bucket((2 * radius + 1) * max_active
                                     + (1 + 2 * radius) * radius * 2)
        pixels, dists, npix = pixelize.get_pixels(
            segs, det, max_active=max_active, radius=radius,
            max_neighboring=max_nb)

        px, py = charge_model.pixel_centers(jnp.maximum(pixels, 0), det)
        dt = float(det.time_sampling)
        t_end_r = np.round((np.asarray(segs.t_end) + 1) / dt) * dt
        t_start_r = np.round((np.asarray(segs.t_start)
                              - float(det.time_padding)) / dt) * dt
        t_sig = charge_model.bucket(int(((t_end_r - t_start_r) / dt).max()))

        signals = current.current(
            segs, px, py, pixels >= 0, jnp.asarray(response), det,
            jax.random.PRNGKey(0), n_steps=256, t_sig=t_sig, mc_smear=True)
        # response is normalized to sum(R)*dt = 1 e-, so summed I*dt is in
        # electrons (see assets/response.py on the reference test's stale
        # /E_CHARGE)
        total = float(np.asarray(signals).sum()) * dt
        expected = float(np.asarray(segs.n_electrons).sum())
        assert total == pytest.approx(expected, rel=0.05)

        # and conservation survives the scatter into per-pixel waveforms
        n_unique_cap = charge_model.bucket(int(np.asarray(npix).sum()))
        uniq, _ = accumulate.unique_pixels(pixels, n_unique_cap)
        pix_idx = accumulate.pixel_index_map(pixels, uniq)
        track_starts, _ = pixelize.time_intervals(segs, det)
        waveforms = accumulate.sum_pixel_signals(
            signals, pix_idx, track_starts, n_unique_cap,
            n_ticks=det.time_ticks, time_sampling=dt)
        total_wf = float(np.asarray(waveforms).sum()) * dt
        assert total_wf == pytest.approx(expected, rel=0.05)


def oracle_get_adc_values(curre, threshold, det, max_adc):
    """Direct python port of the reference self-trigger loop
    (fee.py:517-656) with all noise terms set to zero -- the oracle."""
    dt = float(det.time_sampling)
    tau = float(det.buffer_risetime)
    interval = round((3 * det.clock_cycle + det.adc_hold_delay
                      * det.clock_cycle) / dt)
    T = len(curre)
    ic = 0
    iadc = 0
    adc_busy = 0
    last_reset = 0
    q_sum = 0.0
    adcs, ticks = [], []

    def q_at(ic, last_reset):
        q = 0.0
        if tau > 0:
            conv_start = max(last_reset, math.floor(ic - 10 * tau / dt))
            for jc in range(conv_start, min(ic + 1, T)):
                w = math.exp((jc - ic) * dt / tau) * (1 - math.exp(-dt / tau))
                q += curre[jc] * dt * w
        elif ic < T:
            q += curre[ic] * dt
        return q

    while ic < T or adc_busy > 0:
        if iadc >= max_adc:
            break
        q_sum += q_at(ic, last_reset)
        if adc_busy > 0:
            adc_busy -= 1
        if q_sum >= threshold and adc_busy == 0:
            integrate_end = ic + interval
            ic += 1
            while ic <= integrate_end:
                q_sum += q_at(ic, last_reset)
                ic += 1
            adc = q_sum
            if adc < threshold:
                ic += round(det.reset_cycles * det.clock_cycle / dt)
                q_sum = 0.0
                last_reset = ic
                continue
            adcs.append(adc)
            crossing = min(ic, T)  # len(time_ticks)-1 with T+1 tick times
            post = max(ic - crossing, 0)
            ticks.append((crossing, post))
            ic += round(det.reset_cycles * det.clock_cycle / dt)
            last_reset = ic
            adc_busy = round(det.adc_busy_delay * det.clock_cycle / dt)
            q_sum = 0.0
            iadc += 1
            continue
        ic += 1
    return adcs, ticks


class TestFeeFsm:
    def _run_both(self, det_model, waveform, threshold):
        det = det_model.params
        # zero all noise so the FSM is deterministic
        det0 = det.replace(reset_noise_charge=jnp.float32(0),
                           uncorrelated_noise_charge=jnp.float32(0),
                           discriminator_noise=jnp.float32(0))
        T = len(waveform)
        tick_times = jnp.linspace(0, det.time_interval[1], T + 1)
        res = fee.get_adc_values(
            jnp.asarray(waveform, jnp.float32)[None, :], tick_times,
            jnp.array([threshold], jnp.float32), det0, jax.random.PRNGKey(0),
            max_adc=10, n_scan=T + det.integrate_ticks + det.busy_ticks + 4)
        oracle_adcs, oracle_ticks = oracle_get_adc_values(
            waveform, threshold, det, max_adc=10)
        return res, oracle_adcs, oracle_ticks, np.asarray(tick_times)

    def test_single_pulse(self, det_model):
        T = 300
        wf = np.zeros(T)
        wf[100:120] = 5e-15  # ~constant current pulse
        res, o_adcs, o_ticks, tick_times = self._run_both(det_model, wf, 5e3)
        assert int(res.n_adc[0]) == len(o_adcs)
        got = np.asarray(res.integrals[0][:len(o_adcs)])
        np.testing.assert_allclose(got, o_adcs, rtol=1e-4)
        for i, (crossing, post) in enumerate(o_ticks):
            expected = tick_times[crossing] - 2 + post
            assert float(res.ticks[0][i]) == pytest.approx(expected, abs=1e-3)

    def test_multi_pulse_with_retrigger(self, det_model):
        T = 600
        wf = np.zeros(T)
        wf[50:70] = 4e-15
        wf[200:260] = 8e-15   # long pulse: multiple triggers + busy interplay
        wf[400:404] = 2e-15   # small pulse below threshold alone
        res, o_adcs, o_ticks, tick_times = self._run_both(det_model, wf, 4e3)
        assert int(res.n_adc[0]) == len(o_adcs)
        np.testing.assert_allclose(
            np.asarray(res.integrals[0][:len(o_adcs)]), o_adcs, rtol=1e-4)

    def test_no_trigger_below_threshold(self, det_model):
        wf = np.full(200, 1e-17)
        res, o_adcs, _, _ = self._run_both(det_model, wf, 1e5)
        assert int(res.n_adc[0]) == 0 == len(o_adcs)


class TestDigitize:
    def test_formula(self, det_model):
        det = det_model.params
        q = jnp.array([0.0, 1e4, 1e5, 1e9])
        adcs = np.asarray(fee.digitize(q, det))
        from larndsim_tpu import units
        gain = float(det.gain) * units.mV / units.e
        v = (np.asarray(q) * gain + float(det.v_pedestal) * units.mV
             - float(det.v_cm) * units.mV)
        expected = np.minimum(np.round(np.maximum(v, 0) * det.adc_counts
                                       / ((float(det.v_ref) - float(det.v_cm))
                                          * units.mV)),
                              det.adc_counts - 1)
        np.testing.assert_allclose(adcs, expected)
        assert adcs[-1] == det.adc_counts - 1
