"""Pallas TPU kernel for the FEE self-trigger FSM scan.

`ops.fee.get_adc_values` expresses the per-pixel ADC state machine
(reference fee.py:517-656) as a `lax.scan` over ticks.  Correct, but on
TPU each of the ~4k scan steps pays the XLA while-loop's fixed per-step
overhead, so the scan runs ~30x off the HBM roofline (~185 ms at bench
shapes for ~5 GB of traffic).

This kernel runs the identical FSM with the tick loop *inside* one
Mosaic kernel:

* grid = (pixel tiles,) ONLY.  The tick-chunk loop lives in-kernel with
  manual double-buffered DMA for the signal/noise streams.  A
  (tiles, chunks) grid with block-pipelined inputs was tried first and
  cost ~5x: Mosaic round-trips every block whose index map revisits the
  same block across grid steps (hit buffers, state), ~90 ms/call at
  bench shapes (tools/probe_fee.py).  With one grid step per tile,
  every block is visited exactly once.
* pixels are tiled TILE at a time, laid out (spb, 128) — every state
  update is whole-vreg VPU work.  FSM state lives in VMEM scratch (a
  fori_loop-carry formulation cost ~100 ms/call: Mosaic spills carried
  vectors at every iteration boundary).
* the same hoisted `jax.random.normal` noise tensor as the scan path is
  consumed with the same indexing, and every f32 op keeps the scan
  body's order — control flow (hence every integer output: hit counts,
  window bounds, tick choices) matches the scan exactly; float outputs
  agree to ~1 f32 ULP (compiler fusion differences only).  Asserted by
  tests/test_fee_pallas.py and the hardware A/B in tools/ab_fee.py.
* state-independent noise products are precomputed per chunk as
  pipelined whole-block passes, shortening the serial per-tick chain.
* ADC latches are rare, so the (max_adc)-wide hit-buffer writes sit
  behind an `@pl.when(any(success))` guard, mirroring the scan's
  `lax.cond`.

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

#: pixel tile (multiple of 128) and in-kernel tick chunk.  The chunk
#: bounds the double-buffered noise landing zone (2 x 5 x CHUNK x TILE
#: floats in VMEM).
TILE = int(os.environ.get('LARNDSIM_FEE_TILE', '1024'))
CHUNK = int(os.environ.get('LARNDSIM_FEE_CHUNK', '256'))


def _fee_kernel(scal_ref, times_ref, thr_ref, q0_ref, sig_hbm, noise_hbm,
                integ_ref, ticks_ref, r_ref, e_ref, iadc_ref,
                fstate, istate, prods, sig_buf, noise_buf, sems,
                *, n_scan, n_c, max_adc, interval, reset_ticks,
                busy_ticks, time_padding, n_times, spb, ablate=''):
    """One pixel-tile grid instance: the whole tick range, chunked.

    scal_ref: SMEM [A, dt, C, sigma_uncorr, sigma_disc, sigma_reset].
    sig_hbm/noise_hbm: full (n_scan_p, l128, 128) / (5, n_scan_p, l128,
        128) arrays left in HBM; chunks stream through the
        double-buffered sig_buf/noise_buf scratch.
    fstate: (2, spb, 128) f32 scratch [s_filt, q_sum] (the scan's
        `true_q` carry is dead state — never output — and is dropped).
    istate: (4, spb, 128) i32 scratch [busy, integ_rem, skip_rem,
        last_reset].
    prods: (5, CHUNK, spb, 128) f32 — per-chunk precomputed
        state-independent noise terms, exactly the scan body's
        subexpressions: [0] n_q*su, [1] thr + n_disc*sd, [2] n_adc*su,
        [3] thr + n_disc2*sd, [4] n_reset*sr.
    """
    u = pl.program_id(0)
    A = scal_ref[0, 0]
    dt = scal_ref[0, 1]
    C = scal_ref[0, 2]
    sigma_uncorr = scal_ref[0, 3]
    sigma_disc = scal_ref[0, 4]
    sigma_reset = scal_ref[0, 5]
    thr = thr_ref[0]

    fstate[0] = jnp.zeros((spb, 128), jnp.float32)
    fstate[1] = q0_ref[0]
    istate[...] = jnp.zeros((4, spb, 128), jnp.int32)
    integ_ref[...] = jnp.zeros((max_adc, spb, 128), jnp.float32)
    ticks_ref[...] = jnp.zeros((max_adc, spb, 128), jnp.float32)
    r_ref[...] = jnp.full((max_adc, spb, 128), -1, jnp.int32)
    e_ref[...] = jnp.full((max_adc, spb, 128), -1, jnp.int32)
    iadc_ref[0] = jnp.zeros((spb, 128), jnp.int32)

    def chunk_dma(slot, c):
        # tile-major HBM layout (see _fee_pallas_call): each copy is a
        # handful of ~MB contiguous runs, not thousands of 4 KB strided
        # pieces (the strided form ran the stream at ~12 GB/s)
        sig = pltpu.make_async_copy(
            sig_hbm.at[u, pl.ds(c * CHUNK, CHUNK)],
            sig_buf.at[slot], sems.at[slot, 0])
        noi = pltpu.make_async_copy(
            noise_hbm.at[u, :, pl.ds(c * CHUNK, CHUNK)],
            noise_buf.at[slot], sems.at[slot, 1])
        return sig, noi

    for dma in chunk_dma(0, 0):
        dma.start()

    def tick_body_for(c, guarded):
        def tick_body(i, _):
            t = c * CHUNK + i
            if guarded:
                cond = pl.when(t < n_scan)
            else:
                cond = pl.when(t >= 0)

            @cond
            def _():
                if 'minbody' in ablate:   # probe-only
                    fstate[0] = A * fstate[0] + sig_buf[c % 2, i]
                    return
                curre_t = sig_buf[c % 2, i]
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

                iadc0 = iadc_ref[0]

                @pl.when(jnp.any(success))
                def _latch_write():
                    idx = jnp.minimum(iadc0, max_adc - 1)
                    crossing = jnp.minimum(t + 1, n_times - 1)
                    post = jnp.maximum(t + 1 - (n_times - 1), 0)
                    tick_val = (times_ref[0, crossing] + time_padding
                                - 2 + post.astype(jnp.float32))
                    for k in range(max_adc):
                        sel = success & (idx == k)
                        integ_ref[k] = jnp.where(sel, adc, integ_ref[k])
                        ticks_ref[k] = jnp.where(sel, tick_val,
                                                 ticks_ref[k])
                        r_ref[k] = jnp.where(sel, istate[3], r_ref[k])
                        e_ref[k] = jnp.where(sel, t, e_ref[k])

                iadc = jnp.where(success, iadc0 + 1, iadc0)
                iadc_ref[0] = iadc

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

    # the chunk loop is a static python loop: n_c is small (~15) and the
    # per-chunk trace (DMA wait/start + prods + the fori tick loop) is
    # compact, while a traced chunk loop would force the DMA slot choice
    # and the tail-guard split through lax.switch
    for c in range(n_c):
        slot = c % 2
        for dma in chunk_dma(slot, c):
            dma.wait()
        if c + 1 < n_c:
            for dma in chunk_dma(1 - slot, c + 1):
                dma.start()
        if 'noprods' not in ablate:
            nb = noise_buf[slot]
            prods[0] = nb[0] * sigma_uncorr
            prods[1] = thr[None] + nb[1] * sigma_disc
            prods[2] = nb[2] * sigma_uncorr
            prods[3] = thr[None] + nb[3] * sigma_disc
            prods[4] = nb[4] * sigma_reset
        guarded = (c + 1) * CHUNK > n_scan
        jax.lax.fori_loop(0, CHUNK, tick_body_for(c, guarded), 0)


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
    n_c = n_scan_p // CHUNK
    n_times = tick_times.shape[0]
    l128 = U // 128

    # tile-major layouts: one XLA pass over each stream so the kernel's
    # chunk DMAs are contiguous (the (n_scan, 5, U) draw order itself is
    # unchanged — only the storage order moves)
    sig4 = (sig_rows.reshape(n_scan_p, n_u, spb, 128)
            .transpose(1, 0, 2, 3))                # (n_u, T, spb, 128)
    noise4 = (noise_all.reshape(n_scan_p, 5, n_u, spb, 128)
              .transpose(2, 1, 0, 3, 4))       # (n_u, 5, T, spb, 128)
    thr3 = thresholds.reshape(1, l128, 128)
    q03 = q_init.reshape(1, l128, 128)
    times2 = tick_times.reshape(1, -1).astype(jnp.float32)
    scal2 = scalars.reshape(1, -1)

    kernel = functools.partial(
        _fee_kernel, n_scan=n_scan, n_c=n_c, max_adc=max_adc,
        interval=interval, reset_ticks=reset_ticks,
        busy_ticks=busy_ticks, time_padding=time_padding,
        n_times=n_times, spb=spb,
        ablate=os.environ.get('LARNDSIM_FEE_ABLATE', ''))
    outs = pl.pallas_call(
        kernel,
        grid=(n_u,),
        in_specs=[
            pl.BlockSpec((1, scalars.shape[0]), lambda u: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_times), lambda u: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, spb, 128), lambda u: (0, u, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, spb, 128), lambda u: (0, u, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # signal (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # noise (HBM)
        ],
        out_specs=[
            pl.BlockSpec((max_adc, spb, 128), lambda u: (0, u, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max_adc, spb, 128), lambda u: (0, u, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max_adc, spb, 128), lambda u: (0, u, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max_adc, spb, 128), lambda u: (0, u, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, spb, 128), lambda u: (0, u, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((max_adc, l128, 128), jnp.float32),
            jax.ShapeDtypeStruct((max_adc, l128, 128), jnp.float32),
            jax.ShapeDtypeStruct((max_adc, l128, 128), jnp.int32),
            jax.ShapeDtypeStruct((max_adc, l128, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, l128, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, spb, 128), jnp.float32),
            pltpu.VMEM((4, spb, 128), jnp.int32),
            pltpu.VMEM((5, CHUNK, spb, 128), jnp.float32),
            pltpu.VMEM((2, CHUNK, spb, 128), jnp.float32),
            pltpu.VMEM((2, 5, CHUNK, spb, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(scal2, times2, thr3, q03, sig4, noise4)
    integ, ticks, r_out, e_out, iadc = outs
    tp = lambda a: a.reshape(max_adc, U).T   # (U, max_adc)
    return (tp(integ), tp(ticks), iadc.reshape(U),
            tp(r_out), tp(e_out))


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
