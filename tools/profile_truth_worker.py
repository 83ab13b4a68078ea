"""Stage timing of the host smeared-truth worker at exact bench shapes.

Builds shape/density-matched inputs for one production 2x2 event
(C=384 channels, K=50 contributors, 100-bin LUT profiles, 16384 light
ticks, 1000 digitizer samples, first-arrival times spread over the beam
window) and times `_host_smeared_truth_sparse` with
LARNDSIM_TRUTH_PROF=1 stage markers.  The worker is the bench's
wall-clock pole (BENCHMARKS.md session 3) — this tool attributes it.

Run: JAX_PLATFORMS=cpu python tools/profile_truth_worker.py [reps]
"""
from __future__ import annotations

import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ.setdefault('LARNDSIM_ASSETS', '/root/reference/larndsim')
os.environ['LARNDSIM_TRUTH_PROF'] = '1'

import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from larndsim_tpu.params import load_light, load_sim
    from larndsim_tpu.assets.light_lut import make_light_lut
    from larndsim_tpu.models.light import _host_smeared_truth_sparse
    from larndsim_tpu.ops.light import LightLUT

    ref = os.environ['LARNDSIM_ASSETS']
    light = load_light(f'{ref}/detector_properties/2x2_no_modvar.yaml')
    sim = load_sim(f'{ref}/simulation_properties/2x2_NuMI_sim_no_modvar.yaml')
    lut = LightLUT.from_structured(make_light_lut())

    C, K = 384, sim.max_mc_truth_ids
    n_ticks = 16384
    conv_ticks = int(np.ceil((light.light_window[1] - light.light_window[0])
                             / light.light_tick_size))
    digit_samples = int(np.ceil((light.light_trig_window[1]
                                 + light.light_trig_window[0])
                                / light.light_digit_sample_spacing))
    pre = int(np.ceil(light.light_trig_window[0] / light.light_tick_size))

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 4000, (C, K)).astype(np.int64)
    contrib = rng.random((C, K)).astype(np.float32) * 50 + 1
    # first-arrival times over the beam window (µs): what spreads row_lo
    t0 = rng.random((C, K)).astype(np.float32) * 8.0
    vx = np.stack([rng.integers(0, 14, (C, K)),
                   rng.integers(0, 26, (C, K)),
                   rng.integers(0, 8, (C, K))], axis=-1).astype(np.int32)

    args = (ids, contrib, t0, vx, lut.time_dist_host,
            np.arange(C), light, sim.mc_truth_threshold, conv_ticks,
            n_ticks, digit_samples, pre, 0, 0.0)

    from larndsim_tpu.models.light import recycle_truth_records
    for rep in range(reps):
        t0w = time.perf_counter()
        out = _host_smeared_truth_sparse(*args, as_records=True)
        dt = time.perf_counter() - t0w
        print(f'rep {rep}: total {dt:.2f} s, {len(out)} records')
        # production cycle: write_truth recycles the buffer after the
        # HDF5 append, so steady state reuses warm pages
        recycle_truth_records(out)
        del out


if __name__ == '__main__':
    main()
