"""Per-op device-time regression guard for the charge-chain hot kernels.

Times each hot op at bench shapes by reducing its OUTPUT to scalars and
pulling those — the only honest timing method on this platform
(BENCHMARKS.md "Measurement methodology": `block_until_ready` does not
wait through the axon tunnel, and queue-drain tricks do not serialize
`pallas_call`s).  Appends one JSON line per run to PERF_LOG.jsonl
(git rev + per-op min-of-N milliseconds) and warns when an op regresses
>1.5x against the median of its last three recorded runs at the same
shapes — making kernel regressions visible through the +-30-100% host
wall-clock noise that bench.py's end-to-end number carries.

Usage:  LARNDSIM_ASSETS=/root/reference/larndsim python tools/perf_guard.py
Do not run while a benchmark is in flight — results share the TPU.
(On CPU the Pallas op falls back to interpret mode, which is far too slow
at these shapes — TPU only.)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ.setdefault('LARNDSIM_ASSETS', '/root/reference/larndsim')

import numpy as np

LOG_PATH = os.path.join(_HERE, 'PERF_LOG.jsonl')
REGRESSION_FACTOR = 1.5


def _pull_scalars(out):
    """Force completion of `out` by pulling a scalar reduce of every leaf."""
    import jax
    import jax.numpy as jnp
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(out):
        total += float(jnp.sum(jnp.abs(jnp.asarray(leaf).astype(jnp.float32))))
    return total


def timed(fn, *args, reps=3, **kw):
    """Min-of-reps wall ms for fn(*args), completion forced by scalar pull."""
    out = fn(*args, **kw)
    _pull_scalars(out)              # warm: compile + drain queue
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        _pull_scalars(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def build_workload():
    """Stage the bench's grouped charge workload (4 events, ~930 seg each)
    exactly like simulate_charge_batch; shared with tools/kernel_lab.py."""
    import jax
    import jax.numpy as jnp

    from larndsim_tpu.params import load_detector, load_sim, physics
    from larndsim_tpu.assets.make_input import write_input
    from larndsim_tpu.assets.response import make_response
    from larndsim_tpu.models import charge as mc
    from larndsim_tpu.ops import pixelize
    from larndsim_tpu.ops.current_pallas import host_shift_band
    from larndsim_tpu.ops.drift import drift
    from larndsim_tpu.ops.quench import quench
    from larndsim_tpu import segments as seg_mod
    from larndsim_tpu.io.edep import load_edep

    ref = os.environ['LARNDSIM_ASSETS']
    # LARNDSIM_GUARD_CONFIG=ndlar times the ops at the full-scale ND-LAr
    # shapes (3200 ticks, 50 ns response sampling, ~3400-segment coalesced
    # group); default stays the 2x2 bench workload
    guard_cfg = os.environ.get('LARNDSIM_GUARD_CONFIG', '2x2')
    if guard_cfg == 'ndlar':
        dm = load_detector(f'{ref}/detector_properties/ndlar-module.yaml',
                           f'{ref}/pixel_layouts/multi_tile_layout-3.0.40.yaml')
        sim = load_sim(f'{ref}/simulation_properties/NDLAr_LBNF_sim.yaml')
        workload = dict(n_events=1, tracks_per_event=82)
    else:
        dm = load_detector(f'{ref}/detector_properties/2x2_no_modvar.yaml',
                           f'{ref}/pixel_layouts/multi_tile_layout-2.4.16.yaml')
        sim = load_sim(f'{ref}/simulation_properties/2x2_NuMI_sim_no_modvar.yaml')
        workload = dict(n_events=4, tracks_per_event=24)
    det = dm.params

    n_t = int(round(float(det.time_window) / float(det.response_sampling)))
    response = jnp.asarray(make_response(
        n_xy=45, n_t=n_t, bin_size=float(det.response_bin_size),
        sampling=float(det.response_sampling),
        pixel_pitch=float(det.pixel_pitch)))

    # the bench's grouped workload (2x2: 4 events x ~930 segments;
    # ndlar: one ~3400-segment coalesced group)
    path = '/tmp/perf_guard_in.h5'
    write_input(path, dm.tpc_borders, segments_per_track=42, dEdx=8.0,
                segment_length=0.4, seed=2, **workload)
    tr = load_edep(path, is_spill_sim=sim.is_spill_sim,
                   spill_period=sim.spill_period,
                   max_events_per_file=sim.max_events_per_file).tracks
    ev = (tr['event_id'] - tr['event_id'].min()).astype(np.int64)
    pad_n = 4096
    slot_ev = np.zeros(pad_n, np.int32)
    slot_ev[:len(tr)] = ev
    segs = seg_mod.from_structured(tr, pad_to=pad_n)
    segs = drift(quench(segs, det, physics.BIRKS), det)
    seg_np = seg_mod.to_structured(segs)
    dx_pad = np.zeros(pad_n)
    dx_pad[:len(seg_np)] = seg_np['dx']
    tran_pad = np.zeros(pad_n)
    tran_pad[:len(seg_np)] = seg_np['tran_diff']

    # ---- stage the pipeline exactly like simulate_charge_batch ----
    valid = dx_pad > 0
    max_radius = int(np.ceil(tran_pad[valid].max()
                             * 5 / float(det.pixel_pitch)))
    max_active = pixelize.max_active_pixels(seg_np, det,
                                            np.asarray(det.tpc_borders))
    max_nb = ((2 * max_radius + 1) * max_active
              + (1 + 2 * max_radius) * max_radius * 2)
    dt = float(det.time_sampling)
    t_end_r = np.round((seg_np['t_end'] + 1) / dt) * dt
    t_start_r = np.round(
        (seg_np['t_start'] - float(det.time_padding)) / dt) * dt
    t_sig = mc.bucket(int(np.ceil((t_end_r - t_start_r).max() / dt)), lo=64)
    n_steps = mc.bucket(
        int(np.ceil(np.max(dx_pad[valid]) / float(sim.min_step_size)))
        * sim.mc_sample_multiplier, lo=8)

    pixels, distances, npix = pixelize.get_pixels(
        segs, det, max_active=max_active, radius=max_radius,
        max_neighboring=max_nb)
    nx, ny = det.n_pixels
    n_pix_total = nx * ny * det.n_tpcs
    keyed = jnp.where(pixels >= 0,
                      pixels + jnp.asarray(slot_ev)[:, None] * n_pix_total,
                      -1)
    # exact-unique cap, mirroring simulate_charge_batch (same env opt-out)
    from larndsim_tpu.ops import accumulate
    counts = np.asarray(accumulate.batch_pixel_counts(keyed, npix))
    cap_src = 0 if os.environ.get('LARNDSIM_UNIQUE_CAP_SUM', '0') == '1' \
        else 1
    n_unique_cap = mc.bucket(int(counts[cap_src]), lo=32)
    uniq, n_unique, pix_idx, track_map, slot, overflow, px, py, \
        track_starts = mc._prep_stage(
            keyed, distances, segs, det, n_unique_cap=n_unique_cap,
            max_tracks=sim.max_tracks_per_pixel, centers_src=pixels)
    pix_valid = pixels >= 0
    key = jax.random.PRNGKey(3)
    band = host_shift_band(seg_np, det, mc_smear=True)

    shapes = dict(pad_n=pad_n, n_steps=n_steps, t_sig=t_sig,
                  n_unique_cap=n_unique_cap, max_nb=max_nb,
                  max_adc=sim.max_adc_values,
                  max_tracks=sim.max_tracks_per_pixel)
    return dict(guard_cfg=guard_cfg,
                det=det, sim=sim, response=response, segs=segs,
                seg_np=seg_np, px=px, py=py, pix_valid=pix_valid, key=key,
                band=band, shapes=shapes, n_steps=n_steps, t_sig=t_sig,
                n_unique_cap=n_unique_cap, pix_idx=pix_idx, slot=slot,
                track_starts=track_starts)


def main():
    reps = 3
    if '--reps' in sys.argv:
        reps = int(sys.argv[sys.argv.index('--reps') + 1])

    import jax
    import jax.numpy as jnp

    from larndsim_tpu.ops import accumulate, fee
    from larndsim_tpu.ops.current_pallas import current_pallas

    w = build_workload()
    det, sim, response, segs = w['det'], w['sim'], w['response'], w['segs']
    px, py, pix_valid, key = w['px'], w['py'], w['pix_valid'], w['key']
    band, shapes = w['band'], w['shapes']
    n_steps, t_sig, n_unique_cap = (w['n_steps'], w['t_sig'],
                                    w['n_unique_cap'])
    pix_idx, slot, track_starts = w['pix_idx'], w['slot'], w['track_starts']
    ops = {}

    ops['current_pallas'] = timed(
        current_pallas, segs, px, py, pix_valid, response, det, key,
        n_steps=n_steps, t_sig=t_sig, mc_smear=True, shift_band=band,
        min_step=float(sim.min_step_size), reps=reps)
    signals = current_pallas(
        segs, px, py, pix_valid, response, det, key, n_steps=n_steps,
        t_sig=t_sig, mc_smear=True, shift_band=band,
        min_step=float(sim.min_step_size))

    ops['sum_pixel_signals'] = timed(
        accumulate.sum_pixel_signals, signals, pix_idx, track_starts,
        n_unique_cap, n_ticks=det.time_ticks,
        time_sampling=float(det.time_sampling), reps=reps)
    pixels_signals = accumulate.sum_pixel_signals(
        signals, pix_idx, track_starts, n_unique_cap,
        n_ticks=det.time_ticks, time_sampling=float(det.time_sampling))

    tick_times = jnp.linspace(0, det.time_interval[1], det.time_ticks + 1)
    thresholds = jnp.full((n_unique_cap,),
                          det.discrimination_threshold * 1.0)
    n_scan = det.time_ticks + det.integrate_ticks + det.busy_ticks + 4
    ops['fee_fsm'] = timed(
        fee.get_adc_values, pixels_signals, tick_times, thresholds, det,
        key, max_adc=sim.max_adc_values, n_scan=n_scan, reps=reps)
    fee_res = fee.get_adc_values(
        pixels_signals, tick_times, thresholds, det, key,
        max_adc=sim.max_adc_values, n_scan=n_scan)

    ops['current_fractions_4'] = timed(
        fee.current_fractions, signals, pix_idx, slot, track_starts,
        fee_res, det, max_adc=sim.max_adc_values,
        max_tracks=sim.max_tracks_per_pixel, n_adc_scan=4, reps=reps)
    ops['digitize'] = timed(
        fee.digitize, fee_res.integrals, det, reps=reps)

    # --- roofline ratios (VERDICT r4 #8): achieved vs v5e peaks, so the
    # perf claim is a number, not an adjective.  Peaks: HBM ~819 GB/s,
    # VPU ~ 8x128 f32 lanes * ~0.94 GHz ~ 0.96 Tflop/s (no MXU on these
    # elementwise paths).  Bytes counted as algorithmic minimum traffic.
    roofline = {}
    S_pad = ((segs.size + 7) // 8) * 8
    P = px.shape[1]
    # current_pallas: writes the (S, P, t_sig) f32 output once; reads the
    # slab once per tick block + SMEM tables (small).  The per-step
    # window reads come from VMEM, not HBM, so HBM-minimum = output +
    # slab.  scalar-op throughput: ~1 SMEM row lookup + ~12 VPU-vreg ops
    # per (seg, pix-group-step); report GB/s on the output write.
    out_gb = S_pad * P * t_sig * 4 / 1e9
    roofline['current_pallas'] = dict(
        hbm_gb=round(out_gb, 2),
        achieved_gbps=round(out_gb / (ops['current_pallas'] / 1e3), 1),
        hbm_frac=round(out_gb / (ops['current_pallas'] / 1e3) / 819, 3))
    # fee: streams signal rows + the hoisted (n_scan, 5, U) noise tensor
    # once (read) after generating it (write) — the algorithmic floor.
    fee_gb = (n_scan * 5 * n_unique_cap * 4 * 2
              + n_scan * n_unique_cap * 4 * 2) / 1e9
    roofline['fee_fsm'] = dict(
        hbm_gb=round(fee_gb, 2),
        achieved_gbps=round(fee_gb / (ops['fee_fsm'] / 1e3), 1),
        hbm_frac=round(fee_gb / (ops['fee_fsm'] / 1e3) / 819, 3))
    # sum_pixel_signals: reads (S, P, t_sig) signals, writes (U, T).
    sum_gb = (S_pad * P * t_sig * 4
              + n_unique_cap * det.time_ticks * 4) / 1e9
    roofline['sum_pixel_signals'] = dict(
        hbm_gb=round(sum_gb, 2),
        achieved_gbps=round(sum_gb / (ops['sum_pixel_signals'] / 1e3), 1),
        hbm_frac=round(
            sum_gb / (ops['sum_pixel_signals'] / 1e3) / 819, 3))

    try:
        rev = subprocess.run(['git', 'rev-parse', '--short', 'HEAD'],
                             capture_output=True, text=True,
                             cwd=_HERE).stdout.strip()
    except Exception:
        rev = 'unknown'
    entry = dict(ts=round(time.time(), 1), rev=rev,
                 backend=jax.devices()[0].platform,
                 config=w['guard_cfg'], shapes=shapes,
                 ops_ms={k: round(v, 1) for k, v in ops.items()},
                 roofline=roofline)

    # regression check vs the median of the last 3 same-shape runs
    prior: dict[str, list] = {}
    if os.path.exists(LOG_PATH):
        with open(LOG_PATH) as f:
            for line in f:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if (e.get('shapes') == shapes
                        and e.get('backend') == entry['backend']):
                    for k, v in e.get('ops_ms', {}).items():
                        prior.setdefault(k, []).append(v)
    status = 'ok'
    for k, v in ops.items():
        hist = prior.get(k, [])[-3:]
        if hist:
            ref_ms = sorted(hist)[len(hist) // 2]
            if v > ref_ms * REGRESSION_FACTOR:
                print(f'WARN: {k} regressed {v:.0f} ms vs median '
                      f'{ref_ms:.0f} ms of last {len(hist)} runs',
                      file=sys.stderr)
                status = 'regressed'
    entry['status'] = status
    with open(LOG_PATH, 'a') as f:
        f.write(json.dumps(entry) + '\n')
    print(json.dumps(entry, indent=2))


if __name__ == '__main__':
    main()
