"""Derive a justified A100 baseline for the reference (larnd-sim) on the
exact bench workload, by exact operation counting of its hot kernel.

The reference publishes no benchmark numbers (BASELINE.md), so the A100
sec/spill figure is *derived*: count the work its `tracks_current_mc`
kernel (detsim.py:258-348) performs for the bench input — every
(segment, pixel, tick) thread re-walks the segment's nstep MC samples —
and convert to time with A100 throughput under an optimistic efficiency
band.  Every constant is cited inline.  The optimistic end is published
as the baseline so `vs_baseline` is *conservative*.

Run: JAX_PLATFORMS=cpu python tools/derive_baseline.py [--nd]
Prints a JSON blob for BASELINE.json "published" + a human summary.
"""
from __future__ import annotations

import json
import math
import os
import sys
import tempfile

os.environ.setdefault('LARNDSIM_ASSETS', '/root/reference/larndsim')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def count_reference_work(det, segs_struct, *, verbose=False):
    """Count tracks_current_mc inner-loop work, reference-exactly.

    Returns dict of counters for one "file" of events (batched per event,
    the 2x2 EVENT_BATCH_SIZE=8-TPC grouping = one full 2x2 event/batch).
    """
    from larndsim_tpu.ops.pixelize import get_pixels, max_active_pixels
    from larndsim_tpu.segments import from_structured

    TIME_SAMPLING = float(det.time_sampling)            # 0.1 us
    TIME_PADDING = float(det.time_padding)              # 190 us (2x2 yaml)
    TIME_WINDOW = float(det.time_window)                # 189.1 us
    RESP_BIN = float(det.response_bin_size)             # 0.04434 cm
    N_RESP = 45                                         # response_44.npy bins
    MIN_STEP = 0.001                                    # sim.py:27
    pitch = float(det.pixel_pitch)

    ev_ids = np.unique(segs_struct['event_id'])
    tot = dict(n_threads=0, n_iter=0, n_pass=0, n_lut=0, n_seg=0,
               n_batches=0)
    impact = math.sqrt(2) * N_RESP * RESP_BIN           # detsim.py:309-310

    for ev in ev_ids:
        sel = segs_struct[segs_struct['event_id'] == ev]
        # active-volume / plane-assigned only (drift assigns pixel_plane)
        n_tpcs = np.asarray(det.tpc_borders).shape[0]
        sel = sel[(sel['dx'] > 0) & (sel['pixel_plane'] >= 0)
                  & (sel['pixel_plane'] < n_tpcs)]
        S = len(sel)
        if S == 0:
            continue
        # --- time_intervals (detsim.py:18-40) ---
        t_end_r = np.round((sel['t_end'] + 1) / TIME_SAMPLING) * TIME_SAMPLING
        t_start_r = (np.round((sel['t_start'] - TIME_PADDING) / TIME_SAMPLING)
                     * TIME_SAMPLING)
        T = int(np.ceil((t_end_r - t_start_r).max() / TIME_SAMPLING))

        # --- pixel counts (cli:918-933) ---
        segs = from_structured(sel)
        max_radius = math.ceil(float(sel['tran_diff'].max()) * 5 / pitch)
        max_act = max_active_pixels(sel, det, np.asarray(det.tpc_borders))
        P = ((2 * max_radius + 1) * max_act
             + (1 + 2 * max_radius) * max_radius * 2)
        pixels, _dist, npix = get_pixels(
            segs, det, max_active=max_act, radius=max_radius,
            max_neighboring=P)
        n_pix_real = np.asarray(npix)

        # --- per (segment, pixel): overlapping_segment clip + nstep ---
        # pixel centers of the real neighbor pixels
        nb = np.asarray(pixels)
        valid = nb >= 0
        n_pix_x = int(det.n_pixels[0])
        px_idx = nb % n_pix_x
        py_idx = (nb // n_pix_x) % int(det.n_pixels[1])
        plane = np.asarray(segs.pixel_plane).astype(int)
        borders = np.asarray(det.tpc_borders)[np.clip(plane, 0, None)]
        x_p = borders[:, 0, 0, None] + (px_idx + 0.5) * pitch
        y_p = borders[:, 1, 0, None] + (py_idx + 0.5) * pitch

        xs, ys = np.asarray(segs.x_start), np.asarray(segs.y_start)
        xe, ye = np.asarray(segs.x_end), np.asarray(segs.y_end)
        vx, vy = (xe - xs)[:, None], (ye - ys)[:, None]
        ll = np.sqrt(vx ** 2 + vy ** 2)
        ll = np.where(ll > 0, ll, 1e-12)
        ux, uy = vx / ll, vy / ll
        dxp, dyp = x_p - xs[:, None], y_p - ys[:, None]
        s = (dxp * ux + dyp * uy) / ll
        r = np.sqrt((dxp - ux * s * ll) ** 2 + (dyp - uy * s * ll) ** 2)
        half = np.sqrt(np.maximum(impact ** 2 - r ** 2, 0.0)) / ll
        s_plus = np.clip(s + half, 0.0, 1.0)
        s_minus = np.clip(s - half, 0.0, 1.0)
        seg_len3 = np.asarray(segs.dx)[:, None]          # 3D length
        sub_len = np.where(r <= impact, (s_plus - s_minus) * seg_len3, 0.0)
        nstep = np.where(valid & (sub_len > 0),
                         np.maximum(np.round(sub_len / MIN_STEP), 1), 0)

        # LUT-range pass fraction per (seg, pixel): fraction of midpoints
        # within the rectangular |x-x_p|,|y-y_p| < N*RESP_BIN check
        # (detsim.py:341-345), diffusion-free midpoints (diffusion sigma
        # ~0.05 cm << the 2 cm LUT range: boundary smearing is negligible)
        n_mid = 32
        tmid = (np.arange(n_mid) + 0.5) / n_mid
        mx = xs[:, None, None] + vx[:, :1, None] * tmid   # (S,1,n_mid)
        my = ys[:, None, None] + vy[:, :1, None] * tmid
        in_rect = ((np.abs(mx - x_p[..., None]) < N_RESP * RESP_BIN)
                   & (np.abs(my - y_p[..., None]) < N_RESP * RESP_BIN))
        lut_frac = in_rect.mean(axis=-1)

        # t0-window tick-pass fraction: the [t0, t0+TIME_WINDOW) window
        # covers min(WINDOW/SAMPLING, T) of the batch's T ticks
        pass_frac = min(TIME_WINDOW / TIME_SAMPLING, T) / T

        n_iter_b = float((nstep * T).sum())
        tot['n_threads'] += S * P * T
        tot['n_iter'] += n_iter_b
        tot['n_pass'] += n_iter_b * pass_frac
        tot['n_lut'] += float((nstep * lut_frac * T).sum()) * pass_frac
        tot['n_seg'] += S
        tot['n_batches'] += 1
        if verbose:
            print(f'event {ev}: S={S} P={P} T={T} '
                  f'iter={n_iter_b:.3g} real_pix={n_pix_real.mean():.1f}')
    return tot


def a100_time(tot):
    """Convert counters to an A100 wall-time band.

    Per-unit costs (FP32 ops incl. SFU transcendentals):
      thread setup  ~25 flops  (detsim.py:279-318: id2pixel, coords, t_start)
      per inner iteration ~12 flops + 1 xoroshiro normal (~25 flops with
        log/sqrt/sincos on SFU, numba cuda.random Box-Muller)  -> 37
      per t0-passing sample: 2 more normals + dist math  -> +65
      per LUT-range sample: index math + trilinear-free nearest fetch -> +20
        (the 45x45x~1900-bin f4 LUT is ~15 MB: resident in A100's 40 MB L2,
         so fetches are not HBM-bound)
    A100 SXM FP32 (non-tensor): 19.5 TFLOP/s.  Efficiency band 15-50%:
    the kernel is latency/SFU-bound with heavy warp divergence (continue
    paths) — 50% is generous, 15% matches divergent gather kernels.
    """
    flops = (tot['n_threads'] * 25 + tot['n_iter'] * 37
             + tot['n_pass'] * 65 + tot['n_lut'] * 20)
    peak = 19.5e12
    t_fast = flops / (peak * 0.50)
    t_slow = flops / (peak * 0.15)
    # secondary stages (sum_pixel_signals atomics, FEE scan, light chain,
    # host batching loop): +15% on the fast end (the reference's own phase
    # structure shows tracks_current dominating; cli:1005-1017)
    return flops, t_fast * 1.15, t_slow * 1.15


def main():
    from larndsim_tpu.params import load_detector, physics
    from larndsim_tpu.assets.make_input import write_input
    from larndsim_tpu.segments import from_structured, to_structured
    from larndsim_tpu.ops.quench import quench
    from larndsim_tpu.ops.drift import drift

    ref = os.environ['LARNDSIM_ASSETS']
    detprop = f'{ref}/detector_properties/2x2_no_modvar.yaml'
    pixel = f'{ref}/pixel_layouts/multi_tile_layout-2.4.16.yaml'
    det_model = load_detector(detprop, pixel)
    det = det_model.params

    nd_scale = '--nd' in sys.argv
    per_spill = dict(tracks_per_event=24, segments_per_track=42,
                     dEdx=8.0, segment_length=0.4)   # == bench.py workload
    n_events = 2
    if nd_scale:
        per_spill['tracks_per_event'] = 120          # ~5x occupancy
    tmp = tempfile.mkdtemp(prefix='baseline_derive_')
    in_file = os.path.join(tmp, 'in.h5')
    n_seg = write_input(in_file, det_model.tpc_borders, n_events=n_events,
                        seed=2, **per_spill)

    import h5py
    with h5py.File(in_file) as f:
        tracks = np.asarray(f['segments'])
    # quench+drift with this build's ops (same formulas as the reference,
    # golden-tested in tests/test_golden_parity.py) to get arrival times
    # and diffusion
    segs = drift(quench(from_structured(tracks), det, physics.BIRKS), det)
    tracks = to_structured(segs, tracks.dtype)

    tot = count_reference_work(det, tracks, verbose=True)
    flops, t_fast, t_slow = a100_time(tot)
    spills = n_events
    out = {
        'workload': ('2x2 beam spill, charge chain, '
                     f'{tot["n_seg"] / spills:.0f} segments/spill'),
        'method': 'operation-count derivation (tools/derive_baseline.py)',
        'a100_sec_per_spill_fast': round(t_fast / spills, 2),
        'a100_sec_per_spill_slow': round(t_slow / spills, 2),
        'a100_segments_per_sec_fast': round(tot['n_seg'] / t_fast, 1),
        'tracks_current_mc_flops_per_spill': f'{flops / spills:.3g}',
        'inner_iterations_per_spill': f'{tot["n_iter"] / spills:.3g}',
        'threads_per_spill': f'{tot["n_threads"] / spills:.3g}',
    }
    print(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()
