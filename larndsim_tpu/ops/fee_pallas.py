"""Pallas TPU kernel for the FEE self-trigger FSM scan.

`ops.fee.get_adc_values` expresses the per-pixel ADC state machine
(reference fee.py:517-656) as a `lax.scan` over ticks.  Correct, but on
TPU each of the ~4k scan steps pays the XLA while-loop's fixed per-step
overhead, so the scan runs ~30x off the HBM roofline (~185 ms at bench
shapes for ~5 GB of traffic).

This kernel runs the identical FSM with the tick loop inside one Mosaic
kernel: grid = (pixel tiles, tick chunks) with the chunk axis fastest,
the signal and hoisted-noise streams block-pipelined, and the FSM state
resident in VMEM scratch across a tile's chunk steps.

Block-pipeline rules learned on hardware (tools/probe_fee.py):

* a block whose index map is CONSTANT across the fast grid axis gets
  synced by the pipeline on EVERY step (~0.37 ms x 240 steps at bench
  shapes — more than the whole kernel), so the only BlockSpec-pipelined
  operands are the signal/noise streams, whose blocks change every
  step.  Constants ride scalar-prefetch SMEM (scalars, tick_times);
  per-tile constants (thresholds, q0) are DMA'd once per tile from
  ANY-space inputs; hit buffers accumulate in scratch and are DMA'd to
  ANY-space outputs on each tile's last chunk.
* fori_loop-carried vectors spill at every iteration boundary
  (~100 ms/call) — state lives in scratch refs instead.
* strided small-piece manual DMAs run ~12 GB/s; the pipelined stream
  blocks avoid them.

The same hoisted `jax.random.normal` noise tensor as the scan path is
consumed with the same indexing, and every f32 op keeps the scan body's
order — control flow (hence every integer output: hit counts, window
bounds, tick choices) matches the scan exactly; float outputs agree to
~1 f32 ULP (compiler fusion differences only).  Asserted by
tests/test_fee_pallas.py (interpret mode) and tools/ab_fee.py
(hardware).  State-independent noise products are precomputed per chunk
as pipelined whole-block passes; ADC latches are rare, so the
(max_adc)-wide hit writes sit behind an `@pl.when(any(success))` guard,
mirroring the scan's `lax.cond`.

Hit buffers are staged (max_adc, U/128, 128) so latch writes are
per-slot whole-vreg selects (no relayout); the wrapper transposes back.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: pixel tile (multiple of 128) and tick chunk per grid step.
TILE = int(os.environ.get('LARNDSIM_FEE_TILE', '1024'))
CHUNK = int(os.environ.get('LARNDSIM_FEE_CHUNK', '256'))


def _fee_kernel(scal_ref, times_ref, stream_ref, noise_ref, out_ref,
                fstate, istate, prods, tilec, integ_s, ticks_s, r_s, e_s,
                iadc_s, *, n_scan, max_adc, interval, reset_ticks,
                busy_ticks, time_padding, n_times, spb, ablate=''):
    """One (pixel-tile, chunk) grid step; chunk axis fastest.

    THREE pipelined operands — more stalls the pipeline (~0.09 ms/step
    per extra operand block beyond a handful; tools/probe_fee2.py: 5
    separate outputs cost 117 ms where 1 costs 25 ms), and ANY-space or
    constant-index operands stall it on EVERY step:

    * stream_ref (CHUNK, spb, 128): the signal.  Grid chunk 0 is a
      HEADER chunk — rows 0/1 carry the tile's thresholds and initial
      q_sum; ticks run for c >= 1 at t = (c-1)*CHUNK + i.
    * noise_ref (CHUNK, 5, spb, 128): the hoisted noise rows in their
      native draw layout (transposing them in XLA cost 31 ms/call; the
      strided in-VMEM reads here are free).
    * out_ref (1, 4*max_adc+1, spb, 128) f32: planes [integrals, ticks,
      bitcast(r), bitcast(e), bitcast(iadc)], written from scratch on
      the tile's last chunk; earlier steps flush garbage blocks the
      wrapper never reads (per-step-unique index map).

    scal_ref/times_ref: scalar-prefetch SMEM.
    fstate: (2, spb, 128) f32 scratch [s_filt, q_sum] (the scan's
        `true_q` carry is dead state — never output — and is dropped).
    istate: (4, spb, 128) i32 scratch [busy, integ_rem, skip_rem,
        last_reset].
    prods: (5, CHUNK, spb, 128) f32 — per-chunk precomputed
        state-independent noise terms, exactly the scan body's
        subexpressions: [0] n_q*su, [1] thr + n_disc*sd, [2] n_adc*su,
        [3] thr + n_disc2*sd, [4] n_reset*sr.
    """
    c = pl.program_id(1)
    n_c = pl.num_programs(1)
    A = scal_ref[0, 0]
    dt = scal_ref[0, 1]
    C = scal_ref[0, 2]
    sigma_uncorr = scal_ref[0, 3]
    sigma_disc = scal_ref[0, 4]
    sigma_reset = scal_ref[0, 5]

    @pl.when(c == 0)
    def _init():
        tilec[0] = stream_ref[0]         # thresholds (header row 0)
        tilec[1] = stream_ref[1]         # q_init (header row 1)
        fstate[0] = jnp.zeros((spb, 128), jnp.float32)
        fstate[1] = stream_ref[1]
        istate[...] = jnp.zeros((4, spb, 128), jnp.int32)
        integ_s[...] = jnp.zeros((max_adc, spb, 128), jnp.float32)
        ticks_s[...] = jnp.zeros((max_adc, spb, 128), jnp.float32)
        r_s[...] = jnp.full((max_adc, spb, 128), -1, jnp.int32)
        e_s[...] = jnp.full((max_adc, spb, 128), -1, jnp.int32)
        iadc_s[0] = jnp.zeros((spb, 128), jnp.int32)

    thr = tilec[0]
    if 'noprods' not in ablate:
        @pl.when(c > 0)
        def _prods():
            prods[0] = noise_ref[:, 0] * sigma_uncorr
            prods[1] = thr[None] + noise_ref[:, 1] * sigma_disc
            prods[2] = noise_ref[:, 2] * sigma_uncorr
            prods[3] = thr[None] + noise_ref[:, 3] * sigma_disc
            prods[4] = noise_ref[:, 4] * sigma_reset

    def tick_body_for(guarded):
        def tick_body(i, _):
            t = (c - 1) * CHUNK + i
            if guarded:
                cond = pl.when(t < n_scan)
            else:
                cond = pl.when(t >= 0)

            @cond
            def _():
                if 'minbody' in ablate:   # probe-only
                    fstate[0] = A * fstate[0] + stream_ref[i]
                    return
                curre_t = stream_ref[i]
                sr0 = istate[2]
                ir0 = istate[1]
                skipping = sr0 > 0
                integrating = ir0 > 0
                # IIR leaky integrator; frozen while skipping — the
                # exact f32 op order of the scan body (ops/fee.py
                # step()) is preserved throughout, so control flow (and
                # hence every int output) matches the scan exactly
                s_filt = jnp.where(skipping, 0.0,
                                   A * fstate[0] + curre_t)
                q = jnp.where(skipping, 0.0, s_filt * dt * C)
                q_sum = fstate[1] + q

                integ_rem = jnp.where(integrating & ~skipping, ir0 - 1,
                                      ir0)
                latch = integrating & ~skipping & (integ_rem == 0)
                adc = q_sum + prods[2, i]
                success = latch & (adc >= prods[3, i])

                iadc0 = iadc_s[0]

                @pl.when(jnp.any(success))
                def _latch_write():
                    idx = jnp.minimum(iadc0, max_adc - 1)
                    crossing = jnp.minimum(t + 1, n_times - 1)
                    post = jnp.maximum(t + 1 - (n_times - 1), 0)
                    tick_val = (times_ref[0, crossing] + time_padding
                                - 2 + post.astype(jnp.float32))
                    for k in range(max_adc):
                        sel = success & (idx == k)
                        integ_s[k] = jnp.where(sel, adc, integ_s[k])
                        ticks_s[k] = jnp.where(sel, tick_val, ticks_s[k])
                        r_s[k] = jnp.where(sel, istate[3], r_s[k])
                        e_s[k] = jnp.where(sel, t, e_s[k])

                iadc = jnp.where(success, iadc0 + 1, iadc0)
                iadc_s[0] = iadc

                idle = ~skipping & ~integrating
                busy = jnp.where(idle, jnp.maximum(istate[0] - 1, 0),
                                 istate[0])
                fire = (idle & (busy == 0) & (iadc < max_adc)
                        & (q_sum + prods[0, i] >= prods[1, i]))
                integ_rem = jnp.where(fire, interval, integ_rem)

                skip_rem = jnp.where(sr0 > 0, sr0 - 1, 0)
                skip_rem = jnp.where(latch, reset_ticks, skip_rem)
                istate[3] = jnp.where(latch, t + reset_ticks + 1,
                                      istate[3])
                istate[0] = jnp.where(success, busy_ticks, busy)
                fstate[1] = jnp.where(latch, prods[4, i], q_sum)
                fstate[0] = jnp.where(latch, 0.0, s_filt)
                istate[1] = integ_rem
                istate[2] = skip_rem

            return 0

        return tick_body

    if n_scan % CHUNK:
        @pl.when((c > 0) & (c < n_c - 1))
        def _full():
            jax.lax.fori_loop(0, CHUNK, tick_body_for(False), 0)

        @pl.when(c == n_c - 1)
        def _tail():
            jax.lax.fori_loop(0, CHUNK, tick_body_for(True), 0)
    else:
        @pl.when(c > 0)
        def _all():
            jax.lax.fori_loop(0, CHUNK, tick_body_for(False), 0)

    @pl.when(c == n_c - 1)
    def _flush():
        m = max_adc
        out_ref[0, :m] = integ_s[...]
        out_ref[0, m:2 * m] = ticks_s[...]
        out_ref[0, 2 * m:3 * m] = pltpu.bitcast(r_s[...], jnp.float32)
        out_ref[0, 3 * m:4 * m] = pltpu.bitcast(e_s[...], jnp.float32)
        out_ref[0, 4 * m] = pltpu.bitcast(iadc_s[0], jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=('max_adc', 'n_scan', 'interval',
                                    'reset_ticks', 'busy_ticks',
                                    'time_padding', 'interpret'))
def _fee_pallas_call(sig_rows, noise_all, tick_times, thresholds, q_init,
                     scalars, *, max_adc, n_scan, interval, reset_ticks,
                     busy_ticks, time_padding, interpret=False):
    """Invoke the FSM kernel on padded inputs.

    sig_rows: (n_scan_p, U) — tick-major signal, zero-padded.
    noise_all: (n_scan_p, 5, U).
    thresholds/q_init: (U,); padded pixels carry huge thresholds so they
        never fire (their outputs are sliced away by the caller anyway).
    scalars: (6,) f32 [A, dt, C, sigma_uncorr, sigma_disc, sigma_reset].
    """
    n_scan_p, U = sig_rows.shape
    # largest power-of-two tile <= TILE that divides the padded U (the
    # wrapper pads U to a multiple of 1024)
    tile = TILE
    while U % tile:
        tile //= 2
    spb = tile // 128
    n_u = U // tile
    n_c = n_scan_p // CHUNK + 1          # +1: header chunk
    n_times = tick_times.shape[0]
    l128 = U // 128

    # signal stream with a prepended header chunk (rows 0/1 = the
    # per-pixel thresholds / initial q_sum); the noise tensor stays in
    # its native draw layout
    header = jnp.zeros((CHUNK, U), jnp.float32)
    header = header.at[0].set(thresholds.astype(jnp.float32))
    header = header.at[1].set(q_init.astype(jnp.float32))
    stream = (jnp.concatenate([header, sig_rows])
              .reshape(n_c * CHUNK, l128, 128))
    noise4 = noise_all.reshape(n_scan_p, 5, l128, 128)
    times2 = tick_times.reshape(1, -1).astype(jnp.float32)
    scal2 = scalars.reshape(1, -1).astype(jnp.float32)

    kernel = functools.partial(
        _fee_kernel, n_scan=n_scan, max_adc=max_adc,
        interval=interval, reset_ticks=reset_ticks,
        busy_ticks=busy_ticks, time_padding=time_padding,
        n_times=n_times, spb=spb,
        ablate=os.environ.get('LARNDSIM_FEE_ABLATE', ''))
    m = max_adc
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_u, n_c),
        in_specs=[
            pl.BlockSpec((CHUNK, spb, 128),
                         lambda u, c, *p: (c, u, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, 5, spb, 128),
                         lambda u, c, *p: (jnp.maximum(c - 1, 0), 0,
                                           u, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 4 * m + 1, spb, 128),
                         lambda u, c, *p: (c, 0, u, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, spb, 128), jnp.float32),
            pltpu.VMEM((4, spb, 128), jnp.int32),
            pltpu.VMEM((5, CHUNK, spb, 128), jnp.float32),
            pltpu.VMEM((2, spb, 128), jnp.float32),
            pltpu.VMEM((max_adc, spb, 128), jnp.float32),
            pltpu.VMEM((max_adc, spb, 128), jnp.float32),
            pltpu.VMEM((max_adc, spb, 128), jnp.int32),
            pltpu.VMEM((max_adc, spb, 128), jnp.int32),
            pltpu.VMEM((1, spb, 128), jnp.int32),
        ],
    )
    packed = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_c, 4 * m + 1, l128, 128),
                                 jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(scal2, times2, stream, noise4)[0][n_c - 1]
    asi = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    tp = lambda a: a.reshape(-1, U).T        # (U, planes)
    return (tp(packed[:m]), tp(packed[m:2 * m]),
            asi(packed[4 * m]).reshape(U),
            asi(tp(packed[2 * m:3 * m])), asi(tp(packed[3 * m:4 * m])))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def fee_fsm_pallas(pixels_signals, tick_times, pixel_thresholds, det, key,
                   *, max_adc: int, n_scan: int, time_padding: float = 0.0,
                   interpret: bool = False):
    """Drop-in FSM backend for `ops.fee.get_adc_values` (TPU path).

    Draws the identical hoisted noise tensor and initial q_sum as the
    scan path (same key splits, same shapes), pads pixels to the TILE
    grid (padded pixels carry unreachable thresholds so they never
    fire), and returns the scan's output tuple
    (integrals, ticks_us, iadc, r_out, e_out) at the original U.
    """
    from .. import units

    U, T = pixels_signals.shape
    dt = det.time_sampling
    tau = det.buffer_risetime
    A = jnp.exp(-dt / tau)
    C = 1.0 - A
    e_unit = units.e
    sigma_reset = det.reset_noise_charge * e_unit
    sigma_uncorr = det.uncorrelated_noise_charge * e_unit
    sigma_disc = det.discriminator_noise * e_unit

    k_init, k_scan = jax.random.split(key)
    noise_all = jax.random.normal(k_scan, (n_scan, 5, U))
    q_init = jax.random.normal(k_init, (U,)) * sigma_reset

    sig_rows = jnp.zeros((n_scan, U), pixels_signals.dtype)
    sig_rows = jax.lax.dynamic_update_slice(
        sig_rows, pixels_signals.T[:min(n_scan, T)], (0, 0))

    n_scan_p = _round_up(n_scan, CHUNK)
    u_pad = _round_up(U, min(TILE, 1024))
    if n_scan_p != n_scan or u_pad != U:
        sig_rows = jnp.pad(sig_rows, ((0, n_scan_p - n_scan),
                                      (0, u_pad - U)))
        noise_all = jnp.pad(noise_all, ((0, n_scan_p - n_scan), (0, 0),
                                        (0, u_pad - U)))
    thr = pixel_thresholds.astype(jnp.float32)
    if u_pad != U:
        # padded pixels must never fire: any latch they caused would
        # trip the (rare) latch-write guard on every tick
        thr = jnp.concatenate(
            [thr, jnp.full(u_pad - U, 3e38, jnp.float32)])
        q_init = jnp.pad(q_init, (0, u_pad - U))

    scalars = jnp.stack([A, jnp.float32(dt), C, sigma_uncorr,
                         sigma_disc, sigma_reset]).astype(jnp.float32)
    integ, ticks, iadc, r_out, e_out = _fee_pallas_call(
        sig_rows.astype(jnp.float32), noise_all, tick_times, thr,
        q_init.astype(jnp.float32), scalars, max_adc=max_adc,
        n_scan=n_scan, interval=det.integrate_ticks,
        reset_ticks=det.reset_ticks, busy_ticks=det.busy_ticks,
        time_padding=float(time_padding), interpret=interpret)
    return (integ[:U], ticks[:U], iadc[:U], r_out[:U], e_out[:U])
