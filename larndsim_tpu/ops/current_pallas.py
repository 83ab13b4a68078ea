"""Pallas TPU kernel for the induced-current hot op.

The induced-current computation (detsim.tracks_current_mc semantics, see
ops/current.py) reads, for every (segment, pixel, sample-point, tick), one
element of the response LUT.  On the A100 the reference survives this
because the ~15 MB LUT lives in the 40 MB L2 cache; a TPU has no data cache,
so the naive XLA gather formulation re-reads the LUT from HBM per element —
tens of TB per batch.  This kernel restructures the access pattern around
VMEM:

* The LUT time index is affine in the output tick: k = it - shift(s, step),
  with shift depending only on the sample point's drifted arrival time.  So
  each (segment, pixel, step) contributes one *contiguous, shifted slice*
  of one response row.
* Grid = (segment blocks, tick blocks).  Each instance DMAs the response
  column slab covering its tick block (all rows x [k_lo, k_hi)) into VMEM
  once, then accumulates S_blk * P * n_steps shifted row-slices into the
  VMEM output block.  HBM traffic drops from O(S*P*steps*T) elements to
  O(n_blocks * slab) + O(S*P*T).
* Sample points, smearing draws, row indices and shifts are precomputed in
  XLA (see prepare_points): points are shared across pixels (one physical
  diffusion draw per charge point), invalid entries are routed to an
  appended all-zero response row, and out-of-window ticks read zero-padded
  LUT margins — the kernel body is branch-free.
* A response time-sampling finer than the readout sampling (2x2 uses 50 ns
  response bins vs 100 ns ticks) is handled by phase-splitting the LUT rows
  (R[(ij, parity), k'] = R[ij, r*k' + parity]) so the kernel always runs
  with unit stride.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params.detector import DetectorParams
from ..segments import Segments
from .current import signal_start_times, signal_window_start


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


#: sentinel coordinate for masked sample points / pixels: far enough that
#: every distance check fails
FAR = jnp.float32(1e9)

#: VMEM budget for the response slab + output block.  v5e VMEM is
#: 128 MiB/core; Mosaic's *default* scoped-vmem cap is 16 MiB, so the
#: pallas_call below raises its own limit (`_VMEM_LIMIT_BYTES`) and the
#: slab budget is tunable for A/B sweeps.  40 MiB admits t_blk=2048
#: (single tick block at bench shapes) — measured 1.6x over the old
#: 14 MiB / t_blk=1024 default (BENCHMARKS.md kernel matrix).
SLAB_BUDGET_BYTES = int(float(
    os.environ.get('LARNDSIM_PALLAS_VMEM_MB', '40')) * 2 ** 20)

#: Mosaic scoped-VMEM cap for this kernel: generous (the real footprint
#: is bounded by SLAB_BUDGET_BYTES + double-buffering overhead) but well
#: under the 128 MiB physical VMEM.
_VMEM_LIMIT_BYTES = 100 * 2 ** 20


@functools.partial(jax.jit,
                   static_argnames=('n_steps', 'mc_smear', 'ratio', 'cap',
                                    'min_step'))
def prepare_points(segs: Segments, det: DetectorParams, key, *,
                   n_steps: int, mc_smear: bool, ratio: int,
                   cap: int | None = None, min_step: float = 0.001):
    """Precompute per-(segment, step) sample points.

    Returns:
        xs, ys: (S, n_steps) float32 point coordinates (FAR when the step is
            masked: beyond the segment's dynamic nstep or invalid segment).
        shift: (S, n_steps) int32 tick shift (phase-folded).
        phase: (S, n_steps) int32 response-row phase (for ratio > 1).
        charge: (S,) float32 charge per sample point.
    """
    resp_dt = det.response_sampling

    swap = segs.z_start >= segs.z_end
    sx = jnp.where(swap, segs.x_end, segs.x_start)
    sy = jnp.where(swap, segs.y_end, segs.y_start)
    sz = jnp.where(swap, segs.z_end, segs.z_start)
    ex = jnp.where(swap, segs.x_start, segs.x_end)
    ey = jnp.where(swap, segs.y_start, segs.y_end)
    ez = jnp.where(swap, segs.z_start, segs.z_end)
    seg_vec = jnp.stack([ex - sx, ey - sy, ez - sz], axis=-1)
    length = jnp.sqrt(jnp.sum(seg_vec ** 2, axis=-1))
    safe_len = jnp.where(length > 0, length, 1.0)
    direction = seg_vec / safe_len[:, None]

    nstep = jnp.maximum(jnp.round(length / min_step), 1.0)
    nstep = jnp.minimum(nstep, cap if cap is not None else n_steps)
    nstep = nstep.astype(jnp.int32)
    step_len = length / nstep

    plane = jnp.clip(segs.pixel_plane, 0, det.n_tpcs - 1)
    z_anode = det.tpc_borders[plane, 2, 0]
    t_start = signal_start_times(segs, det)

    steps = jnp.arange(n_steps)
    arc = (steps[None, :] + 0.5) * step_len[:, None]           # (S, n)
    px = sx[:, None] + arc * direction[:, 0:1]
    py = sy[:, None] + arc * direction[:, 1:2]
    pz = sz[:, None] + arc * direction[:, 2:3]
    if mc_smear:
        # draw with the caller's logical step count so the stream matches
        # the XLA backend bit-for-bit, then zero-pad to the blocked count
        n_draw = cap if cap is not None else n_steps
        smear = jax.random.normal(key, (3, px.shape[0], n_draw))
        if n_draw < n_steps:
            smear = jnp.pad(smear, ((0, 0), (0, 0), (0, n_steps - n_draw)))
        pz = pz + smear[0] * segs.long_diff[:, None]
        px = px + smear[1] * segs.tran_diff[:, None]
        py = py + smear[2] * segs.tran_diff[:, None]

    t0 = jnp.abs(pz - z_anode[:, None]) / det.v_drift - det.time_window
    # k = round((t_start + it*dt - t0)/resp_dt) = ratio*it - shift
    shift_fine = jnp.round((t0 - t_start[:, None]) / resp_dt).astype(jnp.int32)
    phase = jnp.mod(-shift_fine, ratio)                         # (S, n)
    shift = (shift_fine + phase) // ratio                       # tick units

    seg_ok = segs.valid & (length > 0)
    ok = (steps[None, :] < nstep[:, None]) & seg_ok[:, None]
    px = jnp.where(ok, px, FAR)
    shift = jnp.where(ok, shift, 0)
    phase = jnp.where(ok, phase, 0)

    charge = jnp.where(seg_ok,
                       segs.n_electrons / nstep.astype(jnp.float32), 0.0)
    nstep_out = jnp.where(seg_ok, nstep, 0)
    # per-segment active local-tick window: ticks below ceil(-t_start/dt)
    # are pre-event (zero; detsim.py:299) and ticks at/after
    # max(shift) + response length read zero padding -- the kernel skips
    # whole tick blocks outside [lo, hi)
    dt = det.time_sampling
    tick_lo = jnp.maximum(jnp.ceil(-t_start / dt), 0.0).astype(jnp.int32)
    tick_hi = jnp.max(jnp.where(ok, shift, 0), axis=1)
    tick_lo = jnp.where(seg_ok, tick_lo, 0)
    return (px.astype(jnp.float32), py.astype(jnp.float32),
            shift, phase, charge.astype(jnp.float32), nstep_out,
            tick_lo, tick_hi)


def phase_split_response(response: np.ndarray, ratio: int) -> np.ndarray:
    """(nx, ny, nt) -> (nx*ny*ratio + 1, ceil(nt/ratio)) with interleaved
    phase rows and a trailing all-zero row for masked contributions."""
    nx, ny, nt = response.shape
    ntp = -(-nt // ratio)
    flat = response.reshape(nx * ny, nt)
    padded = np.zeros((nx * ny, ntp * ratio), response.dtype)
    padded[:, :nt] = flat
    # rows ordered [ij0/ph0, ij0/ph1, ..., ij1/ph0, ...]
    split = padded.reshape(nx * ny, ntp, ratio).transpose(0, 2, 1)
    split = split.reshape(nx * ny * ratio, ntp)
    return np.concatenate([split, np.zeros((1, ntp), response.dtype)])


def _make_row_of(xs_ref, ys_ref, phase_ref, bin_size, nx_r, ny_r, ratio):
    """Scalar response-row index for a (pixel center, sample point) pair.

    Branchless: out-of-LUT-range points route to the appended all-zero
    response row — the straight-line body pipelines better on the scalar
    core than a cond skip.  Shared by both kernel formulations so the
    physics-critical LUT index math has exactly one definition.
    """
    max_x = bin_size * nx_r
    max_y = bin_size * ny_r
    inv_bin = 1.0 / bin_size  # scalar-core divides are slow
    zero_row = nx_r * ny_r * ratio  # trailing all-zero response row

    def row_of(s, istep, pxv, pyv):
        x_dist = jnp.minimum(jnp.abs(pxv - xs_ref[s, istep]),
                             max_x + bin_size)
        y_dist = jnp.minimum(jnp.abs(pyv - ys_ref[s, istep]),
                             max_y + bin_size)
        i_idx = jnp.round(x_dist * inv_bin - 0.5).astype(jnp.int32)
        j_idx = jnp.round(y_dist * inv_bin - 0.5).astype(jnp.int32)
        ok = ((x_dist <= max_x) & (y_dist <= max_y)
              & (i_idx >= 0) & (i_idx < nx_r)
              & (j_idx >= 0) & (j_idx < ny_r))
        i_c = jnp.clip(i_idx, 0, nx_r - 1)
        j_c = jnp.clip(j_idx, 0, ny_r - 1)
        return jnp.where(ok, (i_c * ny_r + j_c) * ratio
                         + phase_ref[s, istep], zero_row)

    return row_of


def _current_kernel(*refs, t_blk, slab_w, k0, s_blk, bin_size, nx_r,
                    ny_r, ratio, ntp, pix_grp=4, row_table=False,
                    ablate=''):
    """One (segment-block, tick-block) grid instance.

    All per-point/per-pixel metadata lives in SMEM and the response-row
    index is computed with *scalar* arithmetic per (segment, pixel, step) —
    Mosaic restricts dynamic VMEM loads to 128-aligned lane offsets, so no
    index tensors are ever loaded from VMEM.  The vector unit only streams
    shifted response-row slices out of the VMEM slab into a register-carried
    accumulator.  Loop trip counts are the *dynamic* per-segment pixel and
    sample counts, so padding costs nothing.

    ``row_table``: the scalar row computation is ~73% of kernel time at
    bench shapes (tools/probe_bound.py, v5e 2026-08-19); in table mode the
    row indices arrive precomputed by XLA (bit-identical math, see
    _row_table) as an SMEM (s_blk, P, n_steps) block and the inner loop
    does one SMEM load in place of ~25 scalar ALU ops.
    """
    if row_table:
        (rows_ref, shift_ref, nstep_ref, npix_ref, lo_ref, hi_ref,
         resp_hbm, out_ref, slab, sem) = refs
    else:
        (xs_ref, ys_ref, shift_ref, phase_ref, px_ref, py_ref,
         nstep_ref, npix_ref, lo_ref, hi_ref, resp_hbm, out_ref,
         slab, sem) = refs
        row_of = _make_row_of(xs_ref, ys_ref, phase_ref, bin_size, nx_r,
                              ny_r, ratio)
    jt = pl.program_id(0)

    # the slab depends only on the tick block, and the grid iterates the
    # segment axis fastest (grid = (jt, s)), so load it once per jt row
    # and reuse it across every segment block — scratch persists across
    # the core's sequential grid steps.  Re-copying per (s, jt) instance
    # was 2x2: 512 x 24 MiB = 12 GiB, ndlar: 512 x 48 MiB = 24 GiB of
    # redundant HBM traffic per call.
    @pl.when(pl.program_id(1) == 0)
    def _load_slab():
        dma = pltpu.make_async_copy(
            resp_hbm.at[:, pl.ds(jt * t_blk, slab_w)], slab, sem)
        dma.start()
        dma.wait()

    out_ref[...] = jnp.zeros_like(out_ref)
    w_win = t_blk + 128

    def seg_body(s, _):
        ns = nstep_ref[s, 0]
        # skip tick blocks entirely outside this segment's active window
        blk_lo = jt * t_blk
        in_window = ((hi_ref[s, 0] + ntp > blk_lo)
                     & (lo_ref[s, 0] < blk_lo + t_blk))
        n_pix = jnp.where(in_window, npix_ref[s, 0], 0)
        n_quad = (n_pix + pix_grp - 1) // pix_grp

        def quad_body(pp, _):
            # pix_grp pixels per iteration: a step's tick shift is pixel-
            # independent, so the grouped shifted row-slices share one roll
            # and one accumulate on a (pix_grp, t_blk) tile (2.3x over the
            # one-pixel loop at 4); the tail group clamps to the last pixel
            # (duplicate writes of identical accumulators are benign)
            pmax = jnp.maximum(n_pix - 1, 0)
            p_ids = [jnp.minimum(pix_grp * pp + i, pmax)
                     for i in range(pix_grp)]
            if row_table:
                rows_for = lambda istep, i: rows_ref[s, p_ids[i], istep]
            else:
                centers = [(px_ref[s, pi], py_ref[s, pi]) for pi in p_ids]
                rows_for = lambda istep, i: row_of(s, istep, *centers[i])
            if 'noscalar' in ablate:   # probe-only: cheap fake row index
                rows_for = lambda istep, i: (s + istep) & 7

            def step_body(istep, acc):
                off = k0 - shift_ref[s, istep]
                # lane offsets of dynamic VMEM slices must be 128-aligned:
                # read aligned windows and rotate the remainder once
                off_base = (off // 128) * 128
                rem = off - off_base
                al = pl.multiple_of(off_base, 128)
                ws = [slab[pl.ds(rows_for(istep, i), 1),
                           pl.ds(al, w_win)]
                      for i in range(pix_grp)]
                window = jnp.concatenate(ws, axis=0)     # (pix_grp, w_win)
                rolled = pltpu.roll(window, w_win - rem, axis=1)
                return acc + rolled[:, :t_blk].astype(jnp.float32)

            acc = jax.lax.fori_loop(
                0, ns, step_body, jnp.zeros((pix_grp, t_blk), jnp.float32))
            for i in range(pix_grp):
                out_ref[s, p_ids[i], :] = acc[i, :]
            return 0

        jax.lax.fori_loop(0, n_quad, quad_body, 0)
        return 0

    jax.lax.fori_loop(0, s_blk, seg_body, 0)


def _current_kernel_folded(*refs, t_blk, slab_w,
                           k0, s_blk, bin_size, nx_r, ny_r, ratio, ntp,
                           pix_grp, transposed=False, row_table=False,
                           row_packed=False, ablate=''):
    """Folded-lane variant of :func:`_current_kernel`.

    The rows variant reads each response row as a (1, t_blk + 128) slice —
    ~9 vector registers of traffic occupying a single sublane each.  Here
    the slab is stored folded, (n_rows, slab_w // 128, 128), so one row
    window is a (n_q, 128) *sublane block* (2 packed vregs at t_blk=1024),
    and the shift becomes one lane-roll plus a static sublane blend
    (res[q] = l < 128-rem ? rolled[q] : rolled[q+1]).  Output stays folded
    as (s, p, t_blk//128, 128); the caller unfolds with a free XLA reshape.

    ``transposed`` stacks the group's windows as (n_q, grp, 128) — dense
    (8, 128) tiles per q-group — instead of (grp, n_q, 128), whose
    9-sublane middle axis pads to 16; which wins depends on Mosaic's
    relayout costs, hence the knob.

    ``row_table``: see :func:`_current_kernel` — SMEM row-index table in
    place of the scalar row computation (73% of kernel time at bench
    shapes).
    """
    if row_table:
        (rows_ref, shift_ref, nstep_ref, npix_ref, lo_ref, hi_ref,
         resp_hbm, out_ref, slab, sem) = refs
    else:
        (xs_ref, ys_ref, shift_ref, phase_ref, px_ref, py_ref,
         nstep_ref, npix_ref, lo_ref, hi_ref, resp_hbm, out_ref,
         slab, sem) = refs
        row_of = _make_row_of(xs_ref, ys_ref, phase_ref, bin_size, nx_r,
                              ny_r, ratio)
    jt = pl.program_id(0)
    n_q = t_blk // 128 + 1   # sublane blocks covering t_blk + misalignment

    # slab reuse across segment blocks — see _current_kernel: the grid is
    # (jt, s) with s fastest, so the jt slab loads once and serves every
    # segment block (the per-instance re-copy was 12-24 GiB/call of
    # redundant HBM traffic)
    @pl.when(pl.program_id(1) == 0)
    def _load_slab():
        dma = pltpu.make_async_copy(
            resp_hbm.at[:, pl.ds(jt * (t_blk // 128), slab_w // 128), :],
            slab, sem)
        dma.start()
        dma.wait()

    out_ref[...] = jnp.zeros_like(out_ref)
    lane_shape = ((n_q - 1, pix_grp, 128) if transposed
                  else (pix_grp, n_q - 1, 128))
    lane = jax.lax.broadcasted_iota(jnp.int32, lane_shape, 2)

    def seg_body(s, _):
        ns = nstep_ref[s, 0]
        blk_lo = jt * t_blk
        in_window = ((hi_ref[s, 0] + ntp > blk_lo)
                     & (lo_ref[s, 0] < blk_lo + t_blk))
        n_pix = jnp.where(in_window, npix_ref[s, 0], 0)
        n_grp = (n_pix + pix_grp - 1) // pix_grp

        def grp_body(pp, _):
            pmax = jnp.maximum(n_pix - 1, 0)
            p_ids = [jnp.minimum(pix_grp * pp + i, pmax)
                     for i in range(pix_grp)]
            if row_table:
                rows_for = lambda istep, i: rows_ref[s, p_ids[i], istep]
            else:
                centers = [(px_ref[s, pi], py_ref[s, pi]) for pi in p_ids]
                rows_for = lambda istep, i: row_of(s, istep, *centers[i])
            if 'noscalar' in ablate:   # probe-only: cheap fake row index
                rows_for = lambda istep, i: (s + istep) & 7

            def one_step(rows, off, acc):
                """Accumulate one sample point's shifted row windows for
                the whole pixel group (`rows`: per-pixel scalar row ids,
                `off`: flat response-column offset of local tick 0)."""
                q0 = off // 128
                rem = off - q0 * 128
                if 'fixedload' in ablate:      # probe-only: static offset
                    q0 = 0
                if 'noload' in ablate:         # probe-only: one shared row
                    ws = [slab[pl.ds(0, 1), pl.ds(0, n_q), :]] * pix_grp
                else:
                    ws = [slab[pl.ds(rows[i], 1), pl.ds(q0, n_q), :]
                          for i in range(pix_grp)]
                # flat col off + t at t = 128q + l reads (q0 + q + carry,
                # (rem + l) mod 128): one lane-roll + static sublane blend
                if transposed:
                    window = jnp.concatenate(
                        [w.reshape(n_q, 1, 128) for w in ws], axis=1)
                    if 'noroll' in ablate:
                        res = window[:n_q - 1]
                    else:
                        a = pltpu.roll(window, 128 - rem, axis=2)
                        if 'noblend' in ablate:
                            res = a[:n_q - 1]
                        else:
                            res = jnp.where(lane < 128 - rem,
                                            a[:n_q - 1], a[1:])
                else:
                    window = jnp.concatenate(ws, axis=0)  # (grp, n_q, 128)
                    if 'noroll' in ablate:
                        res = window[:, :n_q - 1, :]
                    else:
                        a = pltpu.roll(window, 128 - rem, axis=2)
                        if 'noblend' in ablate:
                            res = a[:, :n_q - 1, :]
                        else:
                            res = jnp.where(lane < 128 - rem,
                                            a[:, :n_q - 1, :], a[:, 1:, :])
                return acc + res.astype(jnp.float32)

            init = jnp.zeros(lane_shape, jnp.float32)
            if row_packed:
                # u16-packed row table: one SMEM word holds the rows of
                # two consecutive steps (lo = 2j, hi = 2j+1), halving the
                # per-step SMEM row loads — the scalar-core pole after
                # the round-4 ablation (BENCHMARKS.md: ~128 of 296 ms).
                # Accumulation order (step 2j then 2j+1) matches the
                # unpacked loop exactly, so output stays bit-identical.
                zero_row = nx_r * ny_r * ratio

                def pair_body(jp, acc):
                    words = [rows_ref[s, p_ids[i], jp]
                             for i in range(pix_grp)]
                    if 'noscalar' in ablate:
                        words = [(s + jp) & 7 for _ in range(pix_grp)]
                    rows0 = [w & 0xffff for w in words]
                    # rows fit 15 bits (guarded at the call site), so the
                    # sign bit is never set and >> 16 extracts exactly
                    odd_ok = 2 * jp + 1 < ns
                    rows1 = [jnp.where(odd_ok, w >> 16, zero_row)
                             for w in words]
                    acc = one_step(rows0, k0 - shift_ref[s, 2 * jp], acc)
                    return one_step(rows1, k0 - shift_ref[s, 2 * jp + 1],
                                    acc)

                acc = jax.lax.fori_loop(0, (ns + 1) // 2, pair_body, init)
            else:
                step_body = lambda istep, acc: one_step(
                    [rows_for(istep, i) for i in range(pix_grp)],
                    k0 - shift_ref[s, istep], acc)
                acc = jax.lax.fori_loop(0, ns, step_body, init)
            for i in range(pix_grp):
                out_ref[s, p_ids[i], :, :] = (acc[:, i, :] if transposed
                                              else acc[i])
            return 0

        jax.lax.fori_loop(0, n_grp, grp_body, 0)
        return 0

    jax.lax.fori_loop(0, s_blk, seg_body, 0)


@functools.partial(jax.jit,
                   static_argnames=('bin_size', 'nx_r', 'ny_r', 'ratio'))
def _row_table(xs, ys, phase, pxc, pyc, *, bin_size, nx_r, ny_r, ratio):
    """(S, P, n_steps) int32 response-row indices, precomputed by XLA.

    Bit-identical vectorization of :func:`_make_row_of` (same f32 ops in
    the same order), so table-mode kernels produce the same output as the
    scalar-core computation.  One 8-element VPU lane of this replaces ~25
    scalar-core ops in the kernel inner loop — the probe-measured scalar
    bound (tools/probe_bound.py: 523 of 718 ms at bench shapes).
    """
    max_x = bin_size * nx_r
    max_y = bin_size * ny_r
    inv_bin = 1.0 / bin_size
    zero_row = nx_r * ny_r * ratio
    # (S, P, n_steps): steps minor — Mosaic pads the SMEM window's minor
    # dimension to 128 elements, so the small pixel axis must not be last
    # (observed: a (8, 512, 15) window allocated as (8, 512, 128))
    x_dist = jnp.minimum(jnp.abs(pxc[:, :, None] - xs[:, None, :]),
                         max_x + bin_size)
    y_dist = jnp.minimum(jnp.abs(pyc[:, :, None] - ys[:, None, :]),
                         max_y + bin_size)
    i_idx = jnp.round(x_dist * inv_bin - 0.5).astype(jnp.int32)
    j_idx = jnp.round(y_dist * inv_bin - 0.5).astype(jnp.int32)
    ok = ((x_dist <= max_x) & (y_dist <= max_y)
          & (i_idx >= 0) & (i_idx < nx_r)
          & (j_idx >= 0) & (j_idx < ny_r))
    i_c = jnp.clip(i_idx, 0, nx_r - 1)
    j_c = jnp.clip(j_idx, 0, ny_r - 1)
    return jnp.where(ok, (i_c * ny_r + j_c) * ratio
                     + phase[:, None, :], zero_row)


@jax.jit
def _pack_rows(rows):
    """u16-pack a (S, P, n_steps) row table along even/odd step pairs:
    word[.., j] = row[2j] | row[2j+1] << 16.  Valid only while every row
    id (including the zero row) fits 15 bits — guarded at the call site —
    so the packed word is never negative and the kernel's arithmetic
    ``>> 16`` recovers the odd row exactly."""
    r = rows.reshape(rows.shape[0], rows.shape[1], -1, 2)
    return r[..., 0] | (r[..., 1] << 16)


#: padded phase-split response cache: (data_ptr, shape, ratio, K0, cols)
_RESP_CACHE: dict = {}


def _padded_response(response, ratio: int, K0: int, total_cols: int):
    """Padded response columns on device, cached per (LUT, layout)."""
    resp_np = np.asarray(response)
    key = (resp_np.__array_interface__['data'][0], resp_np.shape,
           ratio, K0, total_cols)
    hit = _RESP_CACHE.get(key)
    if hit is not None:
        # entries pin their source array (hit[0]) so its address can't be
        # reused by a different LUT while the entry is live; the identity
        # check guards the base-array case (asarray may return a view)
        src, dev = hit
        if src is resp_np or np.shares_memory(src, resp_np):
            return dev
    resp_phase = phase_split_response(resp_np, ratio)
    rows_pad = _round_up(resp_phase.shape[0], 8)
    if rows_pad != resp_phase.shape[0]:
        resp_phase = np.concatenate(
            [resp_phase, np.zeros((rows_pad - resp_phase.shape[0],
                                   resp_phase.shape[1]), resp_phase.dtype)])
    ntp = resp_phase.shape[1]
    padded = np.zeros((resp_phase.shape[0], total_cols), np.float32)
    lo = max(K0, 0)
    hi = min(K0 + ntp, total_cols)
    if hi > lo:
        padded[:, lo:hi] = resp_phase[:, lo - K0:hi - K0]
    dev = jnp.asarray(padded)
    if len(_RESP_CACHE) > 8:
        _RESP_CACHE.clear()
    _RESP_CACHE[key] = (resp_np, dev)
    return dev


@functools.lru_cache(maxsize=64)
def _kernel_fn(s_pad, P, t_sig_p, n_steps_p, s_blk, t_blk,
               slab_w, k0, bin_size, nx_r, ny_r, ratio, n_rows, ntp,
               interpret, variant='rows', pix_grp=4,
               row_table=False, row_packed=False, ablate=''):
    """Jitted pallas_call, cached on the static configuration.

    ``row_table`` swaps the xs/ys/phase/px/py SMEM inputs for one
    precomputed (s_blk, P, n_steps_p) int32 row-index block (see
    _row_table); ``row_packed`` (folded variants only) halves that block
    to u16 step pairs (see _pack_rows).  ``ablate`` (probe-only, $LARNDSIM_PALLAS_ABLATE) cuts
    pieces out of the inner loop to decompose kernel time — results are
    WRONG under any non-empty value; see tools/probe_bound.py."""
    # grid order (jt, s): the segment axis iterates fastest, so the
    # jt-dependent response slab loads once per jt row and is reused by
    # every segment block (the kernels guard the DMA on program_id(1)==0)
    grid = (t_sig_p // t_blk, s_pad // s_blk)
    folded = variant.startswith('folded')
    if folded:
        kernel = functools.partial(
            _current_kernel_folded, transposed=variant == 'foldedT',
            t_blk=t_blk, slab_w=slab_w, k0=k0, s_blk=s_blk,
            bin_size=bin_size, nx_r=nx_r, ny_r=ny_r, ratio=ratio,
            ntp=ntp, pix_grp=pix_grp, row_table=row_table,
            row_packed=row_packed, ablate=ablate)
    else:
        assert not row_packed, 'row_packed requires a folded variant'
        kernel = functools.partial(
            _current_kernel, t_blk=t_blk, slab_w=slab_w, k0=k0,
            s_blk=s_blk, bin_size=bin_size, nx_r=nx_r, ny_r=ny_r,
            ratio=ratio, ntp=ntp, pix_grp=pix_grp, row_table=row_table,
            ablate=ablate)

    smem2 = lambda: pl.BlockSpec((s_blk, n_steps_p), lambda j, i: (i, 0),
                                 memory_space=pltpu.SMEM)
    smem1 = lambda: pl.BlockSpec((s_blk, 1), lambda j, i: (i, 0),
                                 memory_space=pltpu.SMEM)
    tbl_steps = n_steps_p // 2 if row_packed else n_steps_p
    smem3 = lambda: pl.BlockSpec((s_blk, P, tbl_steps),
                                 lambda j, i: (i, 0, 0),
                                 memory_space=pltpu.SMEM)
    if folded:
        out_specs = pl.BlockSpec((s_blk, P, t_blk // 128, 128),
                                 lambda j, i: (i, 0, j, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(
            (s_pad, P, t_sig_p // 128, 128), jnp.float32)
        slab_shape = pltpu.VMEM((n_rows, slab_w // 128, 128),
                                jnp.float32)
    else:
        out_specs = pl.BlockSpec((s_blk, P, t_blk), lambda j, i: (i, 0, j),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((s_pad, P, t_sig_p), jnp.float32)
        slab_shape = pltpu.VMEM((n_rows, slab_w), jnp.float32)
    if row_table:
        in_specs = [
            smem3(),  # precomputed row indices
            smem2(),  # shift
            smem1(),  # nstep
            smem1(),  # npix
            smem1(),  # tick_lo
            smem1(),  # tick_hi
            pl.BlockSpec(memory_space=pl.ANY),  # padded response (HBM)
        ]
    else:
        in_specs = [
            smem2(),  # xs
            smem2(),  # ys
            smem2(),  # shift
            smem2(),  # phase
            pl.BlockSpec((s_blk, P), lambda j, i: (i, 0),
                         memory_space=pltpu.SMEM),  # pix_x
            pl.BlockSpec((s_blk, P), lambda j, i: (i, 0),
                         memory_space=pltpu.SMEM),  # pix_y
            smem1(),  # nstep
            smem1(),  # npix
            smem1(),  # tick_lo
            smem1(),  # tick_hi
            pl.BlockSpec(memory_space=pl.ANY),  # padded response (HBM)
        ]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            slab_shape,
            pltpu.SemaphoreType.DMA,
        ],
        # Mosaic's default scoped-VMEM cap is 16 MiB, which the slab +
        # double-buffered output block can exceed on some tunnels even
        # when the physical 128 MiB VMEM has ample room
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )
    return jax.jit(call)


def host_shift_band(segs_np: dict, det: DetectorParams,
                    mc_smear: bool = True) -> tuple[int, int]:
    """Conservative (shift_lo, shift_hi) from host-side segment fields —
    avoids the device sync of reading the realized shifts.

    shift = round((t0 - t_start)/resp_dt) with t0 = |z - z_anode|/v - W;
    bound z by the segment extent +- 6 sigma of the longitudinal smear.
    """
    from ..params.detector import host_scalars
    hc = host_scalars(det)
    dt = float(det.time_sampling)
    resp_dt = hc['response_sampling']
    ratio = int(round(dt / resp_dt))
    v = hc['v_drift']
    borders = hc['tpc_borders']
    plane = np.clip(np.asarray(segs_np['pixel_plane'], np.int64), 0,
                    borders.shape[0] - 1)
    z_anode = borders[plane, 2, 0]
    pad = 6.0 * segs_np['long_diff'] if mc_smear else 0.0
    z_lo = np.minimum(segs_np['z_start'], segs_np['z_end']) - pad
    z_hi = np.maximum(segs_np['z_start'], segs_np['z_end']) + pad
    d_lo = np.minimum(np.abs(z_lo - z_anode), np.abs(z_hi - z_anode))
    d_lo = np.where((z_lo - z_anode) * (z_hi - z_anode) < 0, 0.0, d_lo)
    d_hi = np.maximum(np.abs(z_lo - z_anode), np.abs(z_hi - z_anode))
    t_start = np.round((segs_np['t_start'] - segs_np['t0_start']
                        - hc['time_padding']) / dt) * dt
    w = hc['time_window']
    lo = np.floor((d_lo / v - w - t_start) / resp_dt).min() - 2
    hi = np.ceil((d_hi / v - w - t_start) / resp_dt).max() + 2
    # fine-shift -> phase-folded tick shift (see prepare_points)
    return int(np.floor(lo / ratio)), int(np.ceil(hi / ratio)) + 1


def current_pallas(segs: Segments, pix_x, pix_y, pix_valid, response,
                   det: DetectorParams, key, *, n_steps: int, t_sig: int,
                   mc_smear: bool = True, s_blk: int = 8,
                   t_blk: int | None = None,
                   step_blk: int = 128, interpret: bool = False,
                   shift_band: tuple[int, int] | None = None,
                   min_step: float = 0.001,
                   variant: str | None = None,
                   pix_grp: int | None = None) -> jnp.ndarray:
    """Induced current per (segment, pixel, tick) — Pallas TPU backend.

    Same contract as ops.current.current; `response` is the raw
    (nx, ny, nt) LUT (host numpy or device array).  Pass ``shift_band``
    (from :func:`host_shift_band`) to avoid the per-batch device sync.

    ``variant`` selects the kernel inner-loop formulation ('auto' |
    'rows' | 'folded' | 'foldedT', default from
    $LARNDSIM_PALLAS_VARIANT; 'auto' picks folded when its aligned slab
    fits VMEM, else rows) and
    ``pix_grp`` the pixel group width (default from
    $LARNDSIM_PALLAS_PIXGRP); all variants produce identical results —
    the knobs exist for per-platform tuning (see BENCHMARKS.md).

    (A bfloat16 slab variant was tried and removed: Mosaic requires
    dynamic second-minor slice offsets to be 16-sublane-aligned for
    16-bit types, and the aligned-load workaround widens the window
    reads by more than bf16 saves; the slab traffic it halved stopped
    being the bound after the slab-once grid anyway — BENCHMARKS.md.)
    """
    if variant is None:
        variant = os.environ.get('LARNDSIM_PALLAS_VARIANT', 'auto')
    if pix_grp is None:
        # folded:16 measured 1.30x over rows:16 (2.2x over the original
        # rows:4 @1024) on v5e at bench shapes, bit-identical output;
        # rows:32 spills registers (see BENCHMARKS.md kernel matrix)
        pix_grp = int(os.environ.get('LARNDSIM_PALLAS_PIXGRP', '16'))
    assert variant in ('auto', 'rows', 'folded', 'foldedT'), variant
    # Mosaic kernels only compile for TPU; on CPU (tests, tools' smoke
    # modes) fall through to the interpreter instead of erroring
    if not interpret and jax.default_backend() != 'tpu':
        interpret = True
    # the folded slab DMA slices the middle (sublane-tiled) axis of a 3D
    # HBM ref: Mosaic faults unless the offset and size are both multiples
    # of the 8-sublane tile (tools/probe_folded.py cases f/g, v5e
    # 2026-08-18) — so on real TPUs the tick block must cover whole
    # 8-q-block groups (1024 ticks) and the slab width is rounded likewise
    # below.  The interpreter has no tiling, so tests may use smaller
    # blocks there.  'auto' resolves to 'folded' once the slab geometry
    # is known (it needs the shift span), falling back to 'rows' when the
    # 1024-aligned folded slab would not fit the VMEM budget.
    folded_aligned = variant.startswith('folded') and not interpret
    if variant.startswith('folded') and t_blk is not None:
        quant = 1024 if folded_aligned else 128
        if t_blk % quant:
            raise ValueError(
                f'folded variants need t_blk % {quant} == 0, got {t_blk}')
    resp_np = np.asarray(response)
    nx_r, ny_r, nt_r = resp_np.shape
    dt = float(det.time_sampling)
    resp_dt = float(det.response_sampling)
    ratio = int(round(dt / resp_dt))
    assert ratio >= 1 and abs(ratio * resp_dt - dt) < 1e-6, \
        'response sampling must divide the readout sampling'

    S = segs.size
    P = pix_x.shape[1]
    s_pad = _round_up(S, s_blk)
    n_steps_p = _round_up(n_steps, step_blk)
    if s_pad != S:
        pad = lambda x: jnp.concatenate(
            [x, jnp.zeros((s_pad - S,) + x.shape[1:], x.dtype)])
        segs = jax.tree.map(pad, segs)
        pix_x = pad(pix_x)
        pix_y = pad(pix_y)
        pix_valid = jnp.concatenate(
            [pix_valid, jnp.zeros((s_pad - S, P), bool)])

    xs, ys, shift, phase, charge, nstep, tick_lo, tick_hi = prepare_points(
        segs, det, key, n_steps=n_steps_p, mc_smear=mc_smear, ratio=ratio,
        cap=n_steps, min_step=min_step)
    # fold pixel validity into the centers: FAR fails every distance check
    pxc = jnp.where(pix_valid, pix_x, FAR).astype(jnp.float32)
    pyc = jnp.where(pix_valid, pix_y, FAR).astype(jnp.float32)
    # dynamic loop bounds: valid pixels are compacted at the front by
    # get_pixels, so a per-segment count suffices
    npix = pix_valid.sum(axis=1).astype(jnp.int32)[:, None]
    nstep_c = nstep.astype(jnp.int32)[:, None]
    tick_lo_c = tick_lo[:, None]
    tick_hi_c = tick_hi[:, None]

    # shift band (bounds the slab width), bucketed so the padded response
    # + compiled kernel are reused across batches of the same module
    if shift_band is not None:
        shift_lo, shift_hi = shift_band
    else:
        sh = np.asarray(shift)
        valid_any = np.asarray(xs) < 1e8                        # (S, n)
        if valid_any.any():
            shift_lo = int(sh[valid_any].min())
            shift_hi = int(sh[valid_any].max())
        else:
            shift_lo = shift_hi = 0
    # coarse quantization: the band is a *static* kernel parameter, so a
    # fine granularity would recompile per batch (compiles through the
    # remote-TPU tunnel cost tens of seconds).  K0 granularity stays
    # moderate: its slack adds directly to the slab span.
    K0 = _round_up(shift_hi, 128)
    span = _round_up(max(K0 - shift_lo, 1), 128)
    shift = jnp.clip(shift, K0 - span, K0)

    n_rows = _round_up(resp_np.shape[0] * resp_np.shape[1] * ratio + 1, 8)
    budget = SLAB_BUDGET_BYTES + 2 * 2 ** 20

    def vmem_fit(t, quant):
        """Whole-kernel VMEM footprint check for a candidate tick block
        — the SAME math as the final guard below, so a (variant, t_blk)
        choice made here can never trip that guard afterwards."""
        w = _round_up(t + span + 1 + 256, quant)
        return n_rows * w * 4 + s_blk * P * t * 4 <= budget

    if variant == 'auto':
        # folded:16 is 1.30x rows:16 on v5e (bit-identical); it needs a
        # 1024-aligned tick block + slab, so fall back to rows when no
        # aligned tick block fits the VMEM budget (e.g. phase-split-heavy
        # responses) or when the caller pinned an unaligned t_blk.  The
        # fit is evaluated at the t_blk that folded would actually use:
        # the pinned one, else the smallest default candidate (1024).
        fq = 128 if interpret else 1024
        aligned_ok = t_blk is None or t_blk % fq == 0
        fits = vmem_fit(1024 if t_blk is None else t_blk, fq)
        variant = 'folded' if fits and aligned_ok else 'rows'
        folded_aligned = variant == 'folded' and not interpret
    slab_quant = 1024 if folded_aligned else 128
    if t_blk is None:
        # bigger tick blocks amortize the per-(segment, pixel, step) scalar
        # work across fewer grid passes; covering the whole tick range in
        # ONE block (t_blk = t_sig rounded up, capped at 2048) measured
        # 1.36x over 1024 at bench shapes.  Take the largest block whose
        # slab still fits the VMEM budget (256 is ~1.9x slower than 512
        # but still far faster than the XLA fallback — needed e.g. for
        # ndlar's 50 ns response sampling, whose phase split doubles the
        # slab rows)
        if folded_aligned:
            t_one = min(max(_round_up(t_sig, 1024), 1024), 2048)
            candidates = (t_one, 1024)
        else:
            t_one = min(max(_round_up(t_sig, 128), 256), 2048)
            candidates = (t_one, 1024, 512, 256)
        for t_blk in candidates:
            if vmem_fit(t_blk, slab_quant):
                break

    t_sig_p = _round_up(t_sig, t_blk)
    # +256: aligned-window read (t_blk + 128 wide) starting at the
    # 128-aligned floor of the largest offset must stay in bounds.
    # Folded variants round the slab to whole 8-q-block (1024-tick)
    # groups (slab_quant=1024): the slab DMA's middle-axis offset/size
    # must be 8-sublane aligned (see the alignment note above /
    # tools/probe_folded.py)
    slab_w = _round_up(t_blk + span + 1 + 256, slab_quant)

    # VMEM guard: the slab must fit on chip.  The shift band scales with
    # the *per-segment* drift extent (sub-cm for real edep-sim segments,
    # so ~100 ticks); pathological inputs fall back to the XLA backend.
    slab_bytes = n_rows * slab_w * 4
    vmem_bytes = slab_bytes + s_blk * P * t_blk * 4
    if vmem_bytes > SLAB_BUDGET_BYTES + 2 * 2 ** 20 and not interpret:
        import warnings
        from . import current as current_xla
        warnings.warn(
            f'current_pallas: response slab {slab_bytes / 2**20:.1f} MiB '
            'exceeds VMEM budget (very long segment drift span); falling '
            'back to the XLA backend')
        # chunk over segments: the XLA op's per-step (S, P, T) gather
        # intermediates OOM-crash the TPU worker at full batch size.
        # NOTE the RNG stream: the XLA op draws (3, S_chunk, n_steps)
        # normals per chunk, so per-chunk draws with the same key would
        # diverge from the one-shot stream; fold the chunk index in.
        resp_dev = jnp.asarray(resp_np)
        chunk = 512
        outs = []
        for i0 in range(0, S, chunk):
            sl = slice(i0, min(i0 + chunk, S))
            segs_c = jax.tree.map(lambda a: a[sl], segs)
            # chunk 0 keeps the unchunked stream (same-seed outputs are
            # unchanged for batches that fit one chunk)
            k_c = key if i0 == 0 else jax.random.fold_in(key, i0 // chunk)
            outs.append(current_xla.current(
                segs_c, pix_x[sl], pix_y[sl], pix_valid[sl], resp_dev,
                det, k_c, n_steps=n_steps, t_sig=t_sig, mc_smear=mc_smear,
                min_step=min_step))
        return jnp.concatenate(outs) if len(outs) > 1 else outs[0]

    total_cols = _round_up((t_sig_p - t_blk) + slab_w, slab_quant)
    padded_dev = _padded_response(response, ratio, K0, total_cols)
    if variant.startswith('folded'):
        padded_dev = padded_dev.reshape(padded_dev.shape[0], -1, 128)

    ntp = -(-nt_r // ratio)
    # row-table mode (default): precompute the response-row indices in XLA
    # and hand the kernel an SMEM table — the scalar-core row computation
    # was 73% of kernel time (tools/probe_bound.py).  The table is
    # (s_blk, n_steps_p, P) int32 per block; guard SMEM with a budget so
    # outsized shapes fall back to the in-kernel scalar path.
    row_table = os.environ.get('LARNDSIM_PALLAS_ROWTBL', '1') != '0'
    tbl_kb = s_blk * n_steps_p * P * 4 / 1024
    if tbl_kb > float(os.environ.get('LARNDSIM_PALLAS_SMEM_KB', '400')):
        row_table = False
    # u16 step-pair packing (folded variants): halves the per-step SMEM
    # row loads — the post-round-4 scalar-core pole (~128 of 296 ms,
    # BENCHMARKS.md ablation).  Needs every row id (max = the zero row,
    # nx*ny*ratio) to fit 15 bits so the packed int32 stays non-negative;
    # every shipped LUT qualifies (45x45x2+1 = 4051).
    row_packed = (row_table and variant.startswith('folded')
                  and n_steps_p % 2 == 0
                  and nx_r * ny_r * ratio < 2 ** 15
                  and os.environ.get('LARNDSIM_PALLAS_ROWPACK', '1') != '0')
    ablate = os.environ.get('LARNDSIM_PALLAS_ABLATE', '')
    if ablate and os.environ.get('LARNDSIM_DEBUG_PROBES') != '1':
        # the ablation branches produce wrong physics by construction
        # (probe-only: tools/probe_bound.py); refuse loudly instead of
        # silently corrupting a production run (VERDICT r3 weak #8)
        raise RuntimeError(
            'LARNDSIM_PALLAS_ABLATE is a probe-only knob; set '
            'LARNDSIM_DEBUG_PROBES=1 to acknowledge non-physical output')
    fn = _kernel_fn(s_pad, P, t_sig_p, n_steps_p, s_blk, t_blk,
                    slab_w, K0, float(det.response_bin_size),
                    resp_np.shape[0], resp_np.shape[1], ratio, n_rows, ntp,
                    interpret, variant, pix_grp, row_table, row_packed,
                    ablate)
    if row_table:
        rows_tbl = _row_table(xs, ys, phase, pxc, pyc,
                              bin_size=float(det.response_bin_size),
                              nx_r=resp_np.shape[0], ny_r=resp_np.shape[1],
                              ratio=ratio)
        if row_packed:
            rows_tbl = _pack_rows(rows_tbl)
        out = fn(rows_tbl, shift, nstep_c, npix, tick_lo_c, tick_hi_c,
                 padded_dev)
    else:
        out = fn(xs, ys, shift, phase, pxc, pyc, nstep_c, npix, tick_lo_c,
                 tick_hi_c, padded_dev)
    if variant.startswith('folded'):
        out = out.reshape(s_pad, P, t_sig_p)
    out = out[:S, :, :t_sig]
    # charge is constant per segment: fold it in outside the kernel, along
    # with the negative-time-tick mask (detsim.py:299: ticks before the
    # event window start contribute nothing)
    segs_S = jax.tree.map(lambda x: x[:S], segs)
    t_start = signal_start_times(segs_S, det)
    ticks = t_start[:, None] + jnp.arange(t_sig) * det.time_sampling
    mask = (ticks >= 0).astype(jnp.float32)
    return out * (charge[:S, None] * mask)[:, None, :]
