"""Measure the reference's HOST-side per-spill costs on this host.

The reference's end-to-end spill time is not its GPU kernels (see
tools/derive_baseline.py: tracks_current_mc is ~0.1-0.4 s/spill on an
A100 at bench occupancy) but its host python stages — above all light
truth zero-suppression (light_sim.py:621-661): an `np.ndenumerate` over
the full (ntrig, ndet, nsamples, K) truth tensor plus a python
list-append loop over every kept slot.  At the production 2x2 config
(384 channels x 1000 samples x K=50 with ~50% fill at
mc_truth_threshold=0.1) that is 19.2M python tuples + ~9.7M appends
per spill.

This tool times the reference's ACTUAL function (imported via
tests/ref_shim, the CUDASIM-style executor the reference's own CI uses)
on a 1/64 channel slice and scales linearly (the loop is strictly
per-element).  Host-side stages are fairly compared host-to-host: our
bench runs on this same host.

Run: JAX_PLATFORMS=cpu python tools/measure_ref_host.py
"""
from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, 'tests', 'ref_shim'))
sys.path.insert(0, '/root/reference')

import numpy as np

# production 2x2 shape (2x2_NuMI_sim_no_modvar.yaml: max_light_truth_ids
# 50; 384 op channels; light_trig_window -> 1000 digitized samples)
NDET, NSAMP, K = 384, 1000, 50
FILL = 0.5           # measured keep fraction at mc_truth_threshold=0.1
SLICE_DET = 6        # measure a 1/64 slice, scale linearly


def main():
    import yaml
    if hasattr(yaml, 'CFullLoader'):
        yaml.FullLoader = yaml.CFullLoader
    import larndsim.consts.light as light_consts
    ref = '/root/reference/larndsim'
    light_consts.set_light_properties(
        f'{ref}/detector_properties/2x2_no_modvar.yaml')
    import larndsim.light_sim as light_sim

    rng = np.random.default_rng(0)
    ids = np.full((1, SLICE_DET, NSAMP, K), -1, np.int64)
    keep = rng.random(ids.shape) < FILL
    ids[keep] = rng.integers(0, 10_000, int(keep.sum()))
    photons = np.where(keep, rng.random(ids.shape), 0.0)

    t0 = time.perf_counter()
    out = light_sim.zero_suppress_waveform_truth(ids, photons, 0, 0)
    dt = time.perf_counter() - t0
    scale = NDET / SLICE_DET
    print(json.dumps({
        'stage': 'light_sim.zero_suppress_waveform_truth '
                 '(light_sim.py:621-661)',
        'slice_shape': list(ids.shape),
        'slice_kept': int(keep.sum()),
        'slice_seconds': round(dt, 2),
        'per_spill_seconds_scaled': round(dt * scale, 1),
        'per_spill_slots': NDET * NSAMP * K,
        'per_spill_kept': int(NDET * NSAMP * K * FILL),
        'records_match': int(len(out)) == int(keep.sum()),
    }, indent=2))


if __name__ == '__main__':
    main()
