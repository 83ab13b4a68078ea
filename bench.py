"""Benchmark: seconds per 2x2-style beam spill (charge + light), on-device.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no in-repo numbers (BASELINE.md): `vs_baseline` is
reported against the provisional target of 10 s/spill for larnd-sim on an
A100 (order-of-magnitude from the JINST 18 P04034 production context) until
a measured reference baseline lands in BASELINE.json "published".
vs_baseline > 1 means faster than that target.
"""
from __future__ import annotations

import json
import os
import sys
import time

NOMINAL_BASELINE_SEC_PER_SPILL = 10.0

_TMP_DIRS: list = []


def main():
    os.environ.setdefault('LARNDSIM_ASSETS', '/root/reference/larndsim')
    import numpy as np

    from larndsim_tpu.params import load_detector
    from larndsim_tpu.assets.make_input import write_input
    from larndsim_tpu.cli.simulate_pixels import run_simulation

    ref = os.environ['LARNDSIM_ASSETS']
    detprop = f'{ref}/detector_properties/2x2_no_modvar.yaml'
    pixel = f'{ref}/pixel_layouts/multi_tile_layout-2.4.16.yaml'
    simprop = f'{ref}/simulation_properties/2x2_NuMI_sim_no_modvar.yaml'

    det_model = load_detector(detprop, pixel)

    import tempfile
    tmp = tempfile.mkdtemp(prefix='larndsim_bench_')
    _TMP_DIRS.append(tmp)
    warm_in = os.path.join(tmp, 'warm.h5')
    bench_in = os.path.join(tmp, 'bench.h5')

    # warmup must cover the same shapes as the timed run INCLUDING the
    # file-level stages (whole-file quench/drift and light incidence pad to
    # bucket(total segments)); the timed run spans two event groups so the
    # async light-truth decode of group 1 overlaps group 2's device work
    n_warm_ev = 8
    n_bench_ev = 8
    # ~1000 segments/spill: representative beam-spill occupancy (the
    # overheads amortize; tiny spills only measure dispatch latency)
    per_spill_kwargs = dict(tracks_per_event=24, segments_per_track=42,
                            dEdx=8.0, segment_length=0.4)
    write_input(warm_in, det_model.tpc_borders, n_events=n_warm_ev,
                seed=1, **per_spill_kwargs)
    n_seg = write_input(bench_in, det_model.tpc_borders, n_events=n_bench_ev,
                        seed=2, **per_spill_kwargs)

    common = dict(
        config='2x2_no_modvar',
        detector_properties=detprop, pixel_layout=pixel,
        simulation_properties=simprop,
        response_file='__missing__.npy',      # synthetic LUT stand-ins
        light_lut_filename='__missing__.npz',
        light_det_noise_filename='__missing__.npy',
        rand_seed=7,
        # on-chip event data parallelism (env override for experiments)
        event_group_size=int(os.environ.get('LARNDSIM_BENCH_GROUP', '4')),
    )

    # warmup: trigger all jit compiles
    run_simulation(warm_in, os.path.join(tmp, 'warm_out.h5'), **common)

    # two timed runs, best-of: the single-core bench host sees heavy CPU
    # steal (identical runs measured 1-3x apart); the minimum is the
    # honest throughput measurement
    elapsed = float('inf')
    for rep in range(2):
        out = os.path.join(tmp, f'bench_out{rep}.h5')
        t0 = time.time()
        run_simulation(bench_in, out, **common)
        elapsed = min(elapsed, time.time() - t0)

    sec_per_spill = elapsed / n_bench_ev
    result = {
        'metric': 'sec/spill (2x2 charge+light, synthetic LUTs)',
        'value': round(sec_per_spill, 4),
        'unit': 's',
        'vs_baseline': round(NOMINAL_BASELINE_SEC_PER_SPILL
                             / sec_per_spill, 3),
        'detail': {
            'n_spills': n_bench_ev,
            'n_segments': int(n_seg),
            'segments_per_sec': round(n_seg / elapsed, 1),
            'elapsed_s': round(elapsed, 3),
        },
    }
    print(json.dumps(result))


if __name__ == '__main__':
    try:
        main()
    finally:
        import shutil
        for d in _TMP_DIRS:           # ~10 GB of outputs per run, even
            shutil.rmtree(d, ignore_errors=True)  # on failure/interrupt
