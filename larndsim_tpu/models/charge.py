"""Charge-readout chain: segments -> LArPix ADC hits.

Composes the jitted stages (quench -> drift -> pixelize -> induced current
-> per-pixel accumulation -> self-trigger FSM -> digitization) with
host-side static-shape selection.  This is the pipeline the reference
orchestrates per batch at cli/simulate_pixels.py:902-1117.

Shape policy: everything under jit has static shapes; per-batch dynamic
extents (max active pixels, signal length, unique-pixel count, sample
count) are measured on host and rounded up to power-of-two-ish buckets so
recompiles are rare and executables are reused across batches.
"""
from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..params.detector import DetectorModel, DetectorParams, host_scalars
from ..params.sim import SimParams
from ..params import physics
from ..segments import Segments
from ..ops import accumulate, current, fee, pixelize
from ..ops.drift import drift
from ..ops.quench import quench
from ..utils import trace


#: per-config speculation hint: id(sim) -> (sim, go_deep).  Keyed on the
#: SimParams identity (with the object pinned so ids can't alias) so two
#: interleaved simulations with different occupancy don't cross-contaminate
#: each other's fraction-scan depth.
_FRAC_DEEP_STICKY: dict = {}


def _frac_deep(sim) -> bool:
    ent = _FRAC_DEEP_STICKY.get(id(sim))
    return ent is not None and ent[0] is sim and ent[1]


def _set_frac_deep(sim) -> None:
    if len(_FRAC_DEEP_STICKY) > 8:
        _FRAC_DEEP_STICKY.clear()
    _FRAC_DEEP_STICKY[id(sim)] = (sim, True)


def bucket(n: int, lo: int = 16) -> int:
    """Round up to the next power of two (>= lo) to bound recompiles."""
    return max(lo, 1 << max(0, math.ceil(math.log2(max(n, 1)))))


@dataclasses.dataclass
class ChargeChainResult:
    """Charge-chain output: per-pixel rows + *compact* hit lists.

    Hits are stored as parallel arrays in (pixel-row, adc-slot) row-major
    order; the dense (U, max_adc[, K]) views the reference materializes
    (fee.py:1087-1117) are built lazily — the production export path never
    touches them (the dense fractions tensor alone is ~100 MB/group of
    mostly zeros on the host).
    """
    unique_pix: np.ndarray        # (U,) pixel ids (-1 padded)
    n_unique: int
    n_adc: np.ndarray             # (U,)
    track_pixel_map: np.ndarray   # (U, max_tracks) batch-local segment index
    overflow: bool
    segments: Segments            # quenched + drifted segments
    max_adc_slots: int
    hit_row: np.ndarray           # (H,) pixel-row index of each hit
    hit_slot: np.ndarray          # (H,) adc slot of each hit
    hit_adc: np.ndarray           # (H,) digitized ADC counts
    hit_ticks: np.ndarray         # (H,) [us]
    hit_integrals: np.ndarray     # (H,) [e-]
    hit_fractions: np.ndarray     # (H, max_tracks)

    def _dense(self, vals, fill=0.0):
        out = np.full((len(self.unique_pix), self.max_adc_slots)
                      + vals.shape[1:], fill, np.asarray(vals).dtype)
        out[self.hit_row, self.hit_slot] = vals
        return out

    @property
    def adc(self) -> np.ndarray:              # (U, max_adc)
        return self._dense(self.hit_adc)

    @property
    def adc_ticks(self) -> np.ndarray:        # (U, max_adc)
        return self._dense(self.hit_ticks)

    @property
    def integrals(self) -> np.ndarray:        # (U, max_adc)
        return self._dense(self.hit_integrals)

    @property
    def current_fractions(self) -> np.ndarray:  # (U, max_adc, max_tracks)
        return self._dense(self.hit_fractions)


@jax.jit
def pixel_centers(pixels: jnp.ndarray, det: DetectorParams):
    """Pixel-center coordinates from linear ids (detsim.py:180-191 + the
    +pitch/2 offset applied by the current kernel, detsim.py:286-288)."""
    nx, ny = det.n_pixels
    ix = pixels % nx
    iy = (pixels // nx) % ny
    plane = jnp.clip(pixels // (nx * ny), 0, det.n_tpcs - 1)
    x = ix * det.pixel_pitch + det.tpc_borders[plane, 0, 0] + det.pixel_pitch / 2
    y = iy * det.pixel_pitch + det.tpc_borders[plane, 1, 0] + det.pixel_pitch / 2
    return x.astype(jnp.float32), y.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=('max_active', 'radius', 'max_nb', 't_sig', 'n_steps',
                     'n_unique_cap', 'max_adc', 'max_tracks'))
def charge_step(segs: Segments, det: DetectorParams, response, key, *,
                thresholds=None, gains=None, max_active: int, radius: int,
                max_nb: int, t_sig: int, n_steps: int, n_unique_cap: int,
                max_adc: int, max_tracks: int):
    """Pure device-side charge chain on drifted segments (jit/shard_map-able).

    All shape knobs are static; everything else (params, response, noise
    key) is traced, so one executable serves every batch with the same
    bucket sizes — and shards over a device mesh (parallel/mesh.py).
    """
    pixels, distances, npix = pixelize.get_pixels(
        segs, det, max_active=max_active, radius=radius,
        max_neighboring=max_nb)

    uniq, n_unique = accumulate.unique_pixels(pixels, n_unique_cap)
    pix_idx = accumulate.pixel_index_map(pixels, uniq)
    track_map, slot, overflow = accumulate.track_pixel_map(
        pix_idx, distances, n_unique_cap, max_tracks=max_tracks)

    px, py = pixel_centers(jnp.maximum(pixels, 0), det)
    pix_valid = pixels >= 0
    k_cur, k_fee = jax.random.split(key)
    signals = current.current(
        segs, px, py, pix_valid, response, det, k_cur,
        n_steps=n_steps, t_sig=t_sig, mc_smear=True)

    track_starts, _ = pixelize.time_intervals(segs, det)
    pixels_signals = accumulate.sum_pixel_signals(
        signals, pix_idx, track_starts, n_unique_cap,
        n_ticks=det.time_ticks, time_sampling=float(det.time_sampling))

    # FEE (single event per batch: cli:1072 builds the tick->time map from
    # the batch's unique event ids, which the batcher guarantees is one)
    tick_times = jnp.linspace(0, det.time_interval[1], det.time_ticks + 1)
    if thresholds is None:
        thresholds = jnp.full((n_unique_cap,),
                              det.discrimination_threshold * 1.0)
    n_scan = det.time_ticks + det.integrate_ticks + det.busy_ticks + 4
    fee_res = fee.get_adc_values(
        pixels_signals, tick_times, thresholds, det, k_fee,
        max_adc=max_adc, n_scan=n_scan)

    fractions = fee.current_fractions(
        signals, pix_idx, slot, track_starts, fee_res, det,
        max_adc=max_adc, max_tracks=max_tracks)

    adc = fee.digitize(fee_res.integrals, det, gain=gains)
    return uniq, n_unique, adc, fee_res, fractions, track_map, overflow


@functools.partial(jax.jit,
                   static_argnames=('n_unique_cap', 'max_tracks'))
def _prep_stage(pixels, distances, segs: Segments, det: DetectorParams, *,
                n_unique_cap: int, max_tracks: int, centers_src=None):
    """Fused post-pixelization indexing stage (one dispatch/compile).

    ``pixels`` may carry event-offset keys (event grouping); pass the raw
    ids as ``centers_src`` for the geometry lookup in that case.
    """
    if centers_src is None:
        centers_src = pixels
    uniq, n_unique = accumulate.unique_pixels(pixels, n_unique_cap)
    pix_idx = accumulate.pixel_index_map(pixels, uniq)
    track_map, slot, overflow = accumulate.track_pixel_map(
        pix_idx, distances, n_unique_cap, max_tracks=max_tracks)
    px, py = pixel_centers(jnp.maximum(centers_src, 0), det)
    track_starts, _ = pixelize.time_intervals(segs, det)
    return (uniq, n_unique, pix_idx, track_map, slot, overflow, px, py,
            track_starts)


@functools.partial(jax.jit,
                   static_argnames=('n_unique_cap', 'max_adc', 'max_tracks',
                                    'n_adc_scan'))
def _fee_stage(signals, pix_idx, slot, track_starts, thresholds, gains,
               det: DetectorParams, key, *, n_unique_cap: int, max_adc: int,
               max_tracks: int, n_adc_scan: int):
    """Fused waveform-reduce + FEE + backtracking stage."""
    pixels_signals = accumulate.sum_pixel_signals(
        signals, pix_idx, track_starts, n_unique_cap,
        n_ticks=det.time_ticks, time_sampling=float(det.time_sampling))
    tick_times = jnp.linspace(0, det.time_interval[1], det.time_ticks + 1)
    if thresholds is None:
        thresholds = jnp.full((n_unique_cap,),
                              det.discrimination_threshold * 1.0)
    n_scan = det.time_ticks + det.integrate_ticks + det.busy_ticks + 4
    fee_res = fee.get_adc_values(
        pixels_signals, tick_times, thresholds, det, key,
        max_adc=max_adc, n_scan=n_scan)
    fractions = fee.current_fractions(
        signals, pix_idx, slot, track_starts, fee_res, det,
        max_adc=max_adc, max_tracks=max_tracks, n_adc_scan=n_adc_scan)
    adc = fee.digitize(fee_res.integrals, det, gain=gains)
    return fee_res, fractions, adc


@functools.partial(jax.jit, static_argnames=('h_cap', 'n_u', 'a_full'))
def _compact_hits(n_adc, adc, ticks, integrals, fractions, *,
                  h_cap: int, n_u: int, a_full: int):
    """Compact the (pixel, adc-slot) hit entries for a slim host pull.

    Most pixels latch 1-2 hits, so pulling dense (n_u, max_adc[, K])
    result tensors moves ~10x more bytes than the hits they contain; the
    host rebuilds the dense arrays from (u, a, values) triplets.
    """
    mask = jnp.arange(a_full)[None, :] < n_adc[:n_u, None]
    idx = jnp.nonzero(mask.reshape(-1), size=h_cap,
                      fill_value=n_u * a_full)[0]
    valid = idx < n_u * a_full
    u_h = jnp.where(valid, idx // a_full, 0).astype(jnp.int32)
    a_h = jnp.where(valid, idx % a_full, 0).astype(jnp.int32)

    def take(arr):
        return jnp.where(valid, arr[u_h, a_h], 0)

    frac_h = jnp.where(valid[:, None], fractions[u_h, a_h], 0.0)
    return (jnp.where(valid, u_h, -1), a_h, take(adc), take(ticks),
            take(integrals), frac_h)


def simulate_charge_batch(segs: Segments, det_model: DetectorModel,
                          sim: SimParams, key: jax.Array, response,
                          *, pixel_thresholds=None, pixel_gains=None,
                          mode: int = physics.BIRKS,
                          already_drifted: bool = False,
                          step_scale: float = 1.0,
                          backend: str = 'auto',
                          event_slot=None,
                          host_segs: np.ndarray | None = None
                          ) -> ChargeChainResult:
    """Run the full charge chain on one (padded) segment batch.

    Args:
        segs: segment batch (quench/drift applied here unless
            ``already_drifted``).
        response: (nx, ny, nt) response LUT (device array).
        pixel_thresholds: optional (U-aligned via lookup) — see
            utils.pixel_lut for npz-keyed thresholds; None uses the global
            discrimination threshold.
        step_scale: >1 coarsens MC sampling (perf/quality knob; 1.0 matches
            the reference's MIN_STEP_SIZE sampling density).
        backend: induced-current backend: 'pallas' (TPU kernel), 'xla', or
            'auto' (pallas on accelerators, xla on CPU).
        event_slot: optional (S,) int array grouping several *independent*
            events into one pipeline invocation: pixel ids are offset by
            slot * n_pixels_total so per-event waveforms/FEE never mix
            (events are statistically independent -- the data-parallel
            axis, SURVEY §2.6 P8).  Decode with unique_pix // n_pixels_total.
    """
    if backend == 'auto':
        backend = 'xla' if jax.default_backend() == 'cpu' else 'pallas'
    det = det_model.params
    if not already_drifted:
        segs = quench(segs, det, mode)
        segs = drift(segs, det)

    # --- host-side shape selection ---
    _host_fields = ('x_start', 'y_start', 'x_end', 'y_end', 'z_start',
                    'z_end', 'pixel_plane', 'tran_diff', 'long_diff', 'dx',
                    't_start', 't_end', 't0_start', 'valid')
    if host_segs is not None and already_drifted:
        # the orchestrator already holds the drifted fields host-side
        # (whole-file quench/drift is written back before batching) — no
        # device round trip at all
        pad_n = segs.size
        n_real = min(len(host_segs), pad_n)
        host = {}
        for k in _host_fields[:-1]:
            col = np.zeros(pad_n, np.float32)
            col[:n_real] = host_segs[k][:n_real]
            host[k] = col
        valid = np.zeros(pad_n, bool)
        valid[:n_real] = True
        host['valid'] = valid
    else:
        # one stacked device->host pull for every field the host logic
        # needs (per-field np.asarray costs a round trip each on remote
        # TPU hosts)
        stacked = np.asarray(jnp.stack(
            [jnp.asarray(getattr(segs, k), jnp.float32)
             for k in _host_fields]))
        host = {k: stacked[i] for i, k in enumerate(_host_fields)}
        valid = host['valid'] != 0
        host['valid'] = valid
    host['pixel_plane'] = host['pixel_plane'].astype(np.int32)
    seg_np = {k: v[valid] for k, v in host.items()}
    if valid.sum() == 0:
        raise ValueError('empty batch')

    hconst = host_scalars(det)
    max_radius = int(np.ceil(seg_np['tran_diff'].max() * 5
                             / hconst['pixel_pitch']))  # cli:918
    max_radius = max(max_radius, 1)
    max_active = bucket(pixelize.max_active_pixels(
        seg_np, det, np.asarray(det.tpc_borders)), lo=8)
    max_nb = bucket((2 * max_radius + 1) * max_active
                    + (1 + 2 * max_radius) * max_radius * 2, lo=16)

    # signal window length (time_intervals, detsim.py:18-40)
    dt = det.time_sampling
    t_end_r = np.round((seg_np['t_end'] + 1) / dt) * dt
    t_start_r = np.round((seg_np['t_start'] - hconst['time_padding']) / dt) * dt
    # NOTE: not capped at det.time_ticks — padding + drift can exceed the
    # event interval (module0: 190 us padding); the global-waveform scatter
    # crops out-of-window ticks exactly as the reference placement does
    # (detsim.py:516-517).
    t_sig = bucket(int(np.ceil((t_end_r - t_start_r).max() / dt)), lo=64)

    # Step size and sample-count cap: nstep = round(length/min_step) like
    # the reference (detsim.py:320 with sim.MIN_STEP_SIZE); step_scale > 1
    # coarsens the step grid directly (fewer, wider midpoint steps), which
    # conserves charge exactly.  The cap only guards pathological lengths.
    min_step = float(sim.min_step_size) * float(step_scale)
    n_steps = bucket(int(np.ceil(np.max(host['dx'][valid]) / min_step))
                     * sim.mc_sample_multiplier, lo=8)

    with trace.phase('charge/get_pixels'):
      pixels, distances, npix = pixelize.get_pixels(
        segs, det, max_active=max_active, radius=max_radius,
        max_neighboring=max_nb)

    if event_slot is not None:
        # separate per-event pixel-id spaces (events never share waveforms)
        nx, ny = det.n_pixels
        n_pix_total = nx * ny * det.n_tpcs
        assert n_pix_total * (int(np.asarray(event_slot).max()) + 1) \
            < 2 ** 31, 'event grouping would overflow int32 pixel keys'
        keyed = jnp.where(pixels >= 0,
                          pixels + jnp.asarray(event_slot)[:, None]
                          * n_pix_total, -1)
    else:
        keyed = pixels

    # size the static unique axis from the *exact* on-device unique count
    # (one stacked pull; ~4-7x tighter than the additive npix.sum() bound,
    # which shrinks sum_pixel_signals/FEE/fractions proportionally).  The
    # env opt-out restores the old additive sizing for on-hardware A/B.
    with trace.phase('charge/npix_sync'):
        counts = np.asarray(accumulate.batch_pixel_counts(keyed, npix))
        if os.environ.get('LARNDSIM_UNIQUE_CAP_SUM', '0') == '1':
            n_unique_cap = bucket(int(counts[0]), lo=32)
        else:
            n_unique_cap = bucket(int(counts[1]), lo=32)

    with trace.phase('charge/prep'):
      uniq, n_unique, pix_idx, track_map, slot, overflow, px, py, \
          track_starts = _prep_stage(keyed, distances, segs, det,
                                     n_unique_cap=n_unique_cap,
                                     max_tracks=sim.max_tracks_per_pixel,
                                     centers_src=pixels)

    thresholds = gains = None
    if pixel_thresholds is not None:
        thresholds = pixel_thresholds.lookup(jnp.maximum(uniq, 0))
    if pixel_gains is not None:
        gains = pixel_gains.lookup(jnp.maximum(uniq, 0))[:, None]

    pix_valid = pixels >= 0
    k_cur, k_fee = jax.random.split(key)
    if backend == 'pallas':
        from ..ops.current_pallas import current_pallas, host_shift_band
        band = host_shift_band(seg_np, det, mc_smear=True)
        with trace.phase('charge/current_pallas'):
            signals = current_pallas(
                segs, px, py, pix_valid, response, det, k_cur,
                n_steps=n_steps, t_sig=t_sig, mc_smear=True,
                shift_band=band, min_step=min_step)
    else:
        signals = current.current(
            segs, px, py, pix_valid, response, det, k_cur,
            n_steps=n_steps, t_sig=t_sig, mc_smear=True,
            min_step=min_step)

    # FEE: the FSM always runs at full ADC-slot depth (its cost is tiny);
    # current_fractions is speculative in the slot-scan depth (4 covers
    # sparse workloads) with a sticky fallback -- once a batch saturates,
    # later batches in the process go straight to the full depth instead
    # of paying shallow + deep every time (dense spills saturate always).
    a_full = sim.max_adc_values
    frac_scan = a_full if _frac_deep(sim) else min(4, a_full)
    n_u = n_unique_cap  # sliced below after the single sync
    with trace.phase('charge/fee_stage'):
      out = _fee_stage(
          signals, pix_idx, slot, track_starts, thresholds, gains, det,
          k_fee, n_unique_cap=n_unique_cap, max_adc=a_full,
          max_tracks=sim.max_tracks_per_pixel, n_adc_scan=frac_scan)
      fee_res, fractions, adc = out

    with trace.phase('charge/device_drain'):
        # drains the device queue: everything dispatched up to the FEE FSM
        # (pixelize, current kernel, scatter, FSM) completes before these
        # scalars land, so this row absorbs the WHOLE charge chain's async
        # device time, not FEE's (the old 'fee_sync' name sent VERDICT r3's
        # diagnosis the wrong way).  For exact per-stage attribution run
        # with LARNDSIM_SYNC_PHASES=1 (utils/trace drains at every phase
        # boundary).
        # The per-pixel track count rides the same pull: its max bounds the
        # track axis of the two (., max_tracks) pulls below (rows are
        # front-packed by construction, ops/accumulate.track_pixel_map), so
        # only the occupied prefix ever crosses the device->host link.
        n_unique_i = int(n_unique)
        n_u = min(bucket(max(n_unique_i, 1), lo=32), n_unique_cap)
        t_cnt = (track_map[:n_u] >= 0).sum(axis=1).max()
        sync_h = np.asarray(jnp.concatenate(
            [fee_res.n_adc[:n_u],
             t_cnt[None].astype(fee_res.n_adc.dtype)]))
        n_adc_host, t_max = sync_h[:-1], int(sync_h[-1])
    max_hits = int(n_adc_host.max()) if n_adc_host.size else 0
    n_slots = frac_scan
    if max_hits > frac_scan:
        _set_frac_deep(sim)
        n_slots = a_full
        with trace.phase('charge/fee_fractions_deep'):
            fractions = fee.current_fractions(
                signals, pix_idx, slot, track_starts, fee_res, det,
                max_adc=a_full, max_tracks=sim.max_tracks_per_pixel,
                n_adc_scan=a_full)

    # pull only the hit entries off device (the dense fractions tensor
    # alone is ~50 MB at cap size; the hits are ~2-4 MB) and rebuild the
    # dense per-pixel result arrays host-side.  The track axis is pulled
    # at its measured occupancy (t_cap <= max_tracks; typically 4-8 at
    # beam occupancy vs a cap of ~50) and re-padded host-side — the
    # (n_u, max_tracks) track map is otherwise the single largest pull.
    K_full = sim.max_tracks_per_pixel
    t_cap = min(bucket(max(t_max, 1), lo=4), K_full)
    with trace.phase('charge/pull'):
        n_hits = int(n_adc_host.sum())
        h_cap = bucket(max(n_hits, 1), lo=256)
        u_h, a_h, adc_h, ticks_h, integ_h, frac_h = _compact_hits(
            fee_res.n_adc, adc, fee_res.ticks, fee_res.integrals,
            fractions[:, :, :t_cap], h_cap=h_cap, n_u=n_u, a_full=a_full)
        u_h = np.asarray(u_h)
        ok_h = u_h >= 0
        u_np, a_np = u_h[ok_h], np.asarray(a_h)[ok_h]

        def _pad_tracks(arr_np, fill):
            if arr_np.shape[1] == K_full:
                return arr_np
            out = np.full((arr_np.shape[0], K_full), fill, arr_np.dtype)
            out[:, :arr_np.shape[1]] = arr_np
            return out

        return ChargeChainResult(
            unique_pix=np.asarray(uniq[:n_u]),
            n_unique=n_unique_i,
            n_adc=n_adc_host,
            track_pixel_map=_pad_tracks(
                np.asarray(track_map[:n_u, :t_cap]), -1),
            overflow=bool(np.asarray(overflow).any()),
            segments=segs,
            max_adc_slots=a_full,
            hit_row=u_np,
            hit_slot=a_np,
            hit_adc=np.asarray(adc_h)[ok_h],
            hit_ticks=np.asarray(ticks_h)[ok_h],
            hit_integrals=np.asarray(integ_h)[ok_h],
            hit_fractions=_pad_tracks(np.asarray(frac_h)[ok_h], 0.0),
        )
