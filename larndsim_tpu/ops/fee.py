"""LArPix front-end electronics: self-trigger FSM + ADC digitization.

Reference semantics: fee.get_adc_values (fee.py:517-656) and fee.digitize
(fee.py:499-515).

TPU-first redesign (SURVEY §7 hard parts 2 & 4):

* The per-pixel sequential tick loop becomes a `lax.scan` over ticks,
  vmapped over pixels, with an explicit phase state (idle / integrating /
  reset-skip) replicating the reference's data-dependent `ic` jumps.
* The reference recomputes an O(window) exponential convolution per tick
  (fee.py:566-571).  The kernel exp((jc-ic)*dt/tau)*(1-exp(-dt/tau)) is a
  geometric series, so the filtered charge is an exact O(1)/tick IIR:
  S(ic) = A*S(ic-1) + I(ic), q(ic) = S(ic)*dt*(1-A), A = exp(-dt/tau),
  with S reset to 0 at each discriminator reset (the reference's
  conv_start = last_reset).  The reference also truncates the window at
  10*tau (weight < 5e-5) — the IIR keeps the exact tail.
* Per-track current fractions: instead of materializing the
  (pixels, ticks, MAX_TRACKS) per-track waveform array
  (pixels_tracks_signals, detsim.py:488) and accumulating it tick-by-tick,
  we record each ADC's accumulation window [r, e] in the FSM and evaluate
  the closed form afterwards: the total weight of current I(j) in an ADC
  latched at e after reset r is dt*(1 - A^(e-j+1)) for r <= j <= e
  (geometric-series sum of the per-tick IIR weights).  Fractions are then
  masked weighted sums over the per-(segment,pixel) signal windows —
  no (U, T, 50) array is ever built.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import units
from ..params.detector import DetectorParams


class FeeResult(NamedTuple):
    integrals: jnp.ndarray   # (U, max_adc) integrated charge [e-]
    ticks: jnp.ndarray       # (U, max_adc) trigger times [us]
    n_adc: jnp.ndarray       # (U,) hits per pixel
    reset_start: jnp.ndarray # (U, max_adc) first accumulated global tick
    latch_end: jnp.ndarray   # (U, max_adc) last accumulated global tick


@functools.partial(jax.jit,
                   static_argnames=('max_adc', 'n_scan', 'time_padding',
                                    'unroll'))
def get_adc_values(pixels_signals: jnp.ndarray, tick_times: jnp.ndarray,
                   pixel_thresholds: jnp.ndarray, det: DetectorParams,
                   key: jax.Array, *, max_adc: int, n_scan: int,
                   time_padding: float = 0.0,
                   unroll: int | None = None) -> FeeResult:
    """Run the self-trigger cycle on per-pixel waveforms.

    Args:
        pixels_signals: (U, T) induced current per unique pixel.
        tick_times: (T+1,) tick -> time [us] map
            (cli/simulate_pixels.py:1072: linspace over the event window).
        pixel_thresholds: (U,) discriminator thresholds [e-].
        det: detector params.
        key: PRNG key for the electronics noises; use
            `jax.random.PRNGKey` per batch (reseeded per launch site in the
            reference, cli:1079).
        max_adc: hits per pixel (sim.max_adc_values).
        n_scan: static scan length; must cover T plus one integration +
            busy window (the reference keeps looping while adc_busy > 0,
            fee.py:559).
        unroll: scan unroll factor (static jit arg, so changing it
            recompiles correctly mid-process); None reads
            $LARNDSIM_FEE_UNROLL once per distinct call signature.
            Measured a wash on v5e (see the note at the scan below).
    """
    # TPU backend: run the identical FSM as a single Mosaic kernel with
    # the tick loop on-chip (ops/fee_pallas.py) — the lax.scan formulation
    # pays ~4k sequential while-loop steps of fixed overhead (~30x off
    # the HBM roofline at bench shapes).  Same key splits, same hoisted
    # noise tensor, same op order: control flow (hence all int outputs)
    # matches the scan exactly; floats to ~1 f32 ULP (tools/ab_fee.py,
    # tests/test_fee_pallas.py).  LARNDSIM_FEE_PALLAS=0 reverts.
    if (jax.default_backend() == 'tpu' and max_adc <= 64
            and os.environ.get('LARNDSIM_FEE_PALLAS', '1') != '0'):
        from .fee_pallas import fee_fsm_pallas
        return FeeResult(*fee_fsm_pallas(
            pixels_signals, tick_times, pixel_thresholds, det, key,
            max_adc=max_adc, n_scan=n_scan, time_padding=time_padding))

    U, T = pixels_signals.shape
    dt = det.time_sampling
    tau = det.buffer_risetime
    # tau -> 0 degenerates exactly to the no-filter path (A=0, C=1:
    # q = I(t)*dt), so no static branch is needed for BUFFER_RISETIME == 0.
    A = jnp.exp(-dt / tau)
    C = 1.0 - A
    e_unit = units.e

    interval = det.integrate_ticks
    reset_ticks = det.reset_ticks
    busy_ticks = det.busy_ticks
    sigma_reset = det.reset_noise_charge * e_unit
    sigma_uncorr = det.uncorrelated_noise_charge * e_unit
    sigma_disc = det.discriminator_noise * e_unit

    k_init, k_scan = jax.random.split(key)

    class State(NamedTuple):
        s_filt: jnp.ndarray
        q_sum: jnp.ndarray
        true_q: jnp.ndarray
        busy: jnp.ndarray
        integ_rem: jnp.ndarray
        skip_rem: jnp.ndarray
        iadc: jnp.ndarray
        last_reset: jnp.ndarray
        integrals: jnp.ndarray
        ticks_us: jnp.ndarray
        r_out: jnp.ndarray
        e_out: jnp.ndarray

    # hoist all noise draws out of the scan: per-tick threefry dominates
    # the scan step cost otherwise
    noise_all = jax.random.normal(k_scan, (n_scan, 5, U))

    # Feed the waveform through scan xs in (tick, pixel) layout: each step
    # then reads one contiguous (U,) row.  Slicing a *column* of the (U, T)
    # array per step would touch a full (8, 128) tile per 8 values —
    # ~128x the HBM traffic over the 3805-tick scan.
    sig_rows = jnp.zeros((n_scan, U), pixels_signals.dtype)
    sig_rows = jax.lax.dynamic_update_slice(
        sig_rows, pixels_signals.T[:min(n_scan, T)], (0, 0))

    def step(st: State, inp):
        t, noise, curre_t = inp
        n_q, n_disc, n_adc, n_disc2, n_reset = noise

        skipping = st.skip_rem > 0
        integrating = st.integ_rem > 0
        # IIR leaky integrator; frozen while skipping (those ticks are
        # jumped over by the reference and excluded from the filter window).
        s_filt = jnp.where(skipping, 0.0, A * st.s_filt + curre_t)
        q = jnp.where(skipping, 0.0, s_filt * dt * C)
        q_sum = st.q_sum + q
        true_q = st.true_q + q

        # --- integration phase ---
        integ_rem = jnp.where(integrating & ~skipping, st.integ_rem - 1,
                              st.integ_rem)
        latch = integrating & ~skipping & (integ_rem == 0)
        adc = q_sum + n_adc * sigma_uncorr
        success = latch & (adc >= pixel_thresholds + n_disc2 * sigma_disc)

        idx = jnp.minimum(st.iadc, max_adc - 1)
        crossing = jnp.minimum(t + 1, tick_times.shape[0] - 1)
        post = jnp.maximum(t + 1 - (tick_times.shape[0] - 1), 0)
        # "+2-tick PACMAN delay" (fee.py:639-643, applied as written)
        tick_val = tick_times[crossing] + time_padding - 2 + post

        # one-hot select instead of a per-step scatter: pure elementwise
        # (U, max_adc) ops keep the carry update on the VPU.  The four
        # (U, max_adc) carry writes are the scan's HBM pole (~8 MB
        # read+write per tick at bench shapes), and an ADC latches on only
        # a handful of the ~4k ticks — so the writes sit behind a scalar
        # lax.cond that XLA compiles to a real branch inside the while
        # loop; the no-latch branch aliases the carry straight through.
        def _latch_write(ops):
            integrals, ticks_us, r_out, e_out = ops
            sel = success[:, None] & (
                jnp.arange(max_adc)[None, :] == idx[:, None])
            return (jnp.where(sel, adc[:, None], integrals),
                    jnp.where(sel, tick_val, ticks_us),
                    jnp.where(sel, st.last_reset[:, None], r_out),
                    jnp.where(sel, t, e_out))

        integrals, ticks_us, r_out, e_out = jax.lax.cond(
            jnp.any(success), _latch_write, lambda ops: ops,
            (st.integrals, st.ticks_us, st.r_out, st.e_out))
        iadc = jnp.where(success, st.iadc + 1, st.iadc)

        # --- idle phase: busy countdown + discriminator ---
        idle = ~skipping & ~integrating
        busy = jnp.where(idle, jnp.maximum(st.busy - 1, 0), st.busy)
        fire = (idle & (busy == 0) & (iadc < max_adc)
                & (q_sum + n_q * sigma_uncorr
                   >= pixel_thresholds + n_disc * sigma_disc))
        integ_rem = jnp.where(fire, interval, integ_rem)

        # --- reset on latch (success or failure) ---
        skip_rem = jnp.where(st.skip_rem > 0, st.skip_rem - 1, 0)
        skip_rem = jnp.where(latch, reset_ticks, skip_rem)
        last_reset = jnp.where(latch, t + reset_ticks + 1, st.last_reset)
        busy = jnp.where(success, busy_ticks, busy)
        q_sum = jnp.where(latch, n_reset * sigma_reset, q_sum)
        true_q = jnp.where(latch, 0.0, true_q)
        s_filt = jnp.where(latch, 0.0, s_filt)

        return State(s_filt, q_sum, true_q, busy, integ_rem, skip_rem,
                     iadc, last_reset, integrals, ticks_us, r_out, e_out), None

    zero = jnp.zeros(U, jnp.float32)
    izero = jnp.zeros(U, jnp.int32)
    init = State(
        s_filt=zero,
        q_sum=jax.random.normal(k_init, (U,)) * sigma_reset,  # fee.py:557
        true_q=zero, busy=izero, integ_rem=izero, skip_rem=izero,
        iadc=izero, last_reset=izero,
        integrals=jnp.zeros((U, max_adc), jnp.float32),
        ticks_us=jnp.zeros((U, max_adc), jnp.float32),
        r_out=jnp.full((U, max_adc), -1, jnp.int32),
        e_out=jnp.full((U, max_adc), -1, jnp.int32),
    )
    # tuning knob.  Measured on v5e at bench shapes: unroll 1/4/8/16 ->
    # 195/192/185/194 ms — a wash, so the scan is genuine per-step work
    # (the xs stream + ~20 (U,)-vector ops), not loop overhead; default
    # stays 1.  The env fallback is read at trace time, but `unroll` is
    # part of the jit cache key, so pass it explicitly for A/B sweeps.
    if unroll is None:
        unroll = int(os.environ.get('LARNDSIM_FEE_UNROLL', '1'))
    final, _ = jax.lax.scan(step, init,
                            (jnp.arange(n_scan), noise_all, sig_rows),
                            unroll=unroll)
    return FeeResult(final.integrals, final.ticks_us, final.iadc,
                     final.r_out, final.e_out)


@functools.partial(jax.jit,
                   static_argnames=('max_adc', 'max_tracks', 'n_adc_scan'))
def current_fractions(signals: jnp.ndarray, pix_idx: jnp.ndarray,
                      slot: jnp.ndarray, track_starts: jnp.ndarray,
                      fee: FeeResult, det: DetectorParams, *,
                      max_adc: int, max_tracks: int,
                      n_adc_scan: int | None = None) -> jnp.ndarray:
    """Per-(pixel, adc, track-slot) current fractions, closed form.

    Equivalent to the reference's tick-by-tick per-track accumulation
    (fee.py:572-573, :604-605, :634-635): the weight of current I(j) in an
    ADC with accumulation window [r, e] is dt*(1 - A^(e-j+1)); fractions
    are normalized by the total accumulated (noise-free) charge.

    Args:
        signals: (S, P, T_sig) per-(segment, pixel) induced current.
        pix_idx: (S, P) unique-pixel indices.
        slot: (S, P) track slot per entry (-1 invalid).
        track_starts: (S,) window start times [us].
        fee: FSM outputs (reset_start / latch_end windows).
    """
    S, P, T = signals.shape
    U = fee.integrals.shape[0]
    dt = det.time_sampling
    A = jnp.exp(-dt / det.buffer_risetime)

    start_tick = jnp.round(track_starts / dt).astype(jnp.int32)
    j_global = start_tick[:, None] + jnp.arange(T)[None, :]       # (S, T)

    ok_entry = (pix_idx >= 0) & (slot >= 0)
    safe_u = jnp.where(ok_entry, pix_idx, 0)

    def one_adc(num_acc, a):
        r = fee.reset_start[:, a]                                  # (U,)
        e = fee.latch_end[:, a]
        r_sp = r[safe_u]                                           # (S, P)
        e_sp = e[safe_u]
        in_win = ((j_global[:, None, :] >= r_sp[:, :, None])
                  & (j_global[:, None, :] <= e_sp[:, :, None])
                  & (e_sp >= 0)[:, :, None])
        expo = (e_sp[:, :, None] - j_global[:, None, :] + 1).astype(jnp.float32)
        w = dt * (1.0 - jnp.power(A, jnp.maximum(expo, 0.0)))
        contrib = jnp.sum(jnp.where(in_win, signals * w, 0.0), axis=2)  # (S,P)
        num_acc = num_acc.at[
            jnp.where(ok_entry, safe_u, U),
            a,
            jnp.where(ok_entry, slot, 0)
        ].add(contrib, mode='drop')
        return num_acc, None

    # Only slots that actually latched carry a window: callers may bound
    # the scan by the batch's max hit count (host-read of fee.n_adc) —
    # typically 1-2 instead of the static 30.
    n_scan = max_adc if n_adc_scan is None else min(n_adc_scan, max_adc)
    num = jnp.zeros((U, max_adc, max_tracks), jnp.float32)
    num, _ = jax.lax.scan(one_adc, num, jnp.arange(n_scan))
    true_q = num.sum(axis=2, keepdims=True)
    return jnp.where(true_q > 0, num / true_q, 0.0)


def digitize(integral_list, det: DetectorParams, gain=None):
    """Charge -> ADC counts (fee.digitize, fee.py:499-515)."""
    if gain is None:
        gain = det.gain
    gain = gain * units.mV / units.e
    v = (integral_list * gain + det.v_pedestal * units.mV
         - det.v_cm * units.mV)
    adcs = jnp.minimum(
        jnp.round(jnp.maximum(v, 0) * det.adc_counts
                  / (det.v_ref * units.mV - det.v_cm * units.mV)),
        det.adc_counts - 1)
    return adcs
