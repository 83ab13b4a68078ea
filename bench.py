"""Benchmark: seconds per 2x2-style beam spill (charge + light), on-device.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no in-repo numbers, so the baseline is
*established* (BASELINE.md "Derived baseline"): at the production 2x2
config (light truth on, `max_light_truth_ids: 50`) the reference's
end-to-end spill floor is its HOST python truth zero-suppression —
`light_sim.zero_suppress_waveform_truth` (light_sim.py:621-661), an
np.ndenumerate over 19.2M slots + ~9.6M list appends — measured via the
reference's own function at 24.8 s/spill (min of 3) on THIS host
(tools/measure_ref_host.py), plus 0.10 s/spill for its A100 GPU kernels
(operation-count derivation, tools/derive_baseline.py).  Host stages
compare host-to-host: this bench runs on the same machine.
vs_baseline > 1 means faster end-to-end than the reference at the same
production config on the same host.
"""
from __future__ import annotations

import json
import os
import sys
import time

#: reference end-to-end floor: 24.8 (measured host truth stage, min-of-3)
#: + 0.10 (derived A100 kernel time, fast end) — see BASELINE.md
NOMINAL_BASELINE_SEC_PER_SPILL = 24.9

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
    # overheads amortize; tiny spills only measure dispatch latency).
    # LARNDSIM_BENCH_OCC=N multiplies the track count (N=6 gives an
    # ndlar-scale ~5600 seg/spill) for the second-occupancy measurement
    # recorded in BENCHMARKS.md — the driver always runs the default.
    occ = int(os.environ.get('LARNDSIM_BENCH_OCC', '1'))
    per_spill_kwargs = dict(tracks_per_event=24 * occ,
                            segments_per_track=42,
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
    occ_tag = f', {occ}x occupancy' if occ != 1 else ''
    result = {
        'metric': f'sec/spill (2x2 charge+light, synthetic LUTs{occ_tag})',
        'value': round(sec_per_spill, 4),
        'unit': 's',
        # the 24.9 s/spill reference floor is established at 1x occupancy;
        # at other occupancies the ratio would compare different workloads
        'vs_baseline': (round(NOMINAL_BASELINE_SEC_PER_SPILL
                              / sec_per_spill, 3) if occ == 1 else None),
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
