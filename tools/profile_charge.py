"""Stage-by-stage wall timing of the charge chain on the live device.

Usage: LARNDSIM_ASSETS=/root/reference/larndsim python - < tools/profile_charge.py
(Do not run while a benchmark is in flight - results share the TPU.)

Drives simulate_charge_batch exactly as the orchestrator does (drifted
host-side segments, event grouping, spill-normalized t0) with
LARNDSIM_SYNC_PHASES=1 so the phase table attributes device time honestly.
"""
import os
import time

import numpy as np

os.environ.setdefault('LARNDSIM_ASSETS', '/root/reference/larndsim')
os.environ['LARNDSIM_SYNC_PHASES'] = '1'


def main():
    import jax
    import h5py

    from larndsim_tpu.params import load_detector, load_sim, physics
    from larndsim_tpu.assets.make_input import write_input
    from larndsim_tpu.assets.response import make_response
    from larndsim_tpu.models import charge as mc
    from larndsim_tpu.ops.quench import quench
    from larndsim_tpu.ops.drift import drift
    from larndsim_tpu import segments as seg_mod
    from larndsim_tpu.utils import trace

    ref = os.environ['LARNDSIM_ASSETS']
    dm = load_detector(f'{ref}/detector_properties/2x2_no_modvar.yaml',
                       f'{ref}/pixel_layouts/multi_tile_layout-2.4.16.yaml')
    sim = load_sim(f'{ref}/simulation_properties/2x2_NuMI_sim_no_modvar.yaml')
    det = dm.params

    n_t = int(round(float(det.time_window) / float(det.response_sampling)))
    response = make_response(n_xy=45, n_t=n_t,
                             bin_size=float(det.response_bin_size),
                             sampling=float(det.response_sampling),
                             pixel_pitch=float(det.pixel_pitch))
    import jax.numpy as jnp
    response = jnp.asarray(response)

    # grouped-shape workload: 4 events x ~930 segments, spill t0 reset to
    # the in-spill window exactly as the orchestrator does (cli:574-582)
    path = '/tmp/profile_charge_in.h5'
    write_input(path, dm.tpc_borders, n_events=4, tracks_per_event=24,
                segments_per_track=42, dEdx=8.0, segment_length=0.4, seed=2)
    from larndsim_tpu.io.edep import load_edep
    tr = load_edep(path, is_spill_sim=sim.is_spill_sim,
                   spill_period=sim.spill_period,
                   max_events_per_file=sim.max_events_per_file).tracks
    ev = (tr['event_id'] - tr['event_id'].min()).astype(np.int64)
    pad_n = 4096
    slot = np.zeros(pad_n, np.int32)
    slot[:len(tr)] = ev
    segs = seg_mod.from_structured(tr, pad_to=pad_n)

    key = jax.random.PRNGKey(3)
    segs = drift(quench(segs, det, physics.BIRKS), det)
    # host copy of the drifted fields (the orchestrator holds these)
    names = ('x_start', 'y_start', 'x_end', 'y_end', 'z_start', 'z_end',
             'pixel_plane', 'tran_diff', 'long_diff', 'dx', 't_start',
             't_end', 't0_start')
    cols = {n: np.asarray(getattr(segs, n))[:len(tr)] for n in names}
    host_segs = np.rec.fromarrays(
        [cols[n] for n in names], names=','.join(names))

    def run():
        return mc.simulate_charge_batch(
            segs, dm, sim, key, response, already_drifted=True,
            event_slot=slot, host_segs=host_segs)

    res = run()
    print(f'warm done: n_unique={res.n_unique} hits={len(res.hit_adc)}')
    trace.reset()
    t = time.time()
    res = run()
    print(f'{"simulate_charge_batch":28s} {(time.time()-t)*1e3:9.1f} ms')
    print(trace.report())


if __name__ == '__main__':
    main()
