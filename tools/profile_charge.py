"""Stage-by-stage wall timing of the charge chain on the live device.

Usage: LARNDSIM_ASSETS=/root/reference/larndsim python tools/profile_charge.py
(Do not run while a benchmark is in flight - results share the TPU.)

Times each jitted stage with block_until_ready so the async-dispatch
attribution seen in the orchestrator phase breakdown (where a later pull
absorbs earlier compute) is resolved to the stage that actually burns
device time.
"""
import os
import time

import numpy as np

os.environ.setdefault('LARNDSIM_ASSETS', '/root/reference/larndsim')


def main():
    import jax
    import jax.numpy as jnp
    import h5py

    from larndsim_tpu.params import load_detector, load_sim, physics
    from larndsim_tpu.assets.make_input import write_input
    from larndsim_tpu.assets.response import make_response
    from larndsim_tpu.models import charge as mc
    from larndsim_tpu.ops import pixelize
    from larndsim_tpu.ops.current_pallas import current_pallas, \
        host_shift_band
    from larndsim_tpu.ops.quench import quench
    from larndsim_tpu.ops.drift import drift
    from larndsim_tpu import segments as seg_mod

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

    # grouped-shape workload: 4 events x ~930 segments
    path = '/tmp/profile_charge_in.h5'
    write_input(path, dm.tpc_borders, n_events=4, tracks_per_event=24,
                segments_per_track=42, dEdx=8.0, segment_length=0.4, seed=2)
    with h5py.File(path) as f:
        tr = np.array(f['segments'])
    slot = np.zeros(4096, np.int32)
    ev = tr['event_id'] - tr['event_id'].min()
    slot[:len(tr)] = ev
    segs = seg_mod.from_structured(tr, pad_to=4096)

    key = jax.random.PRNGKey(3)

    def timed(label, fn, *a, **k):
        out = None
        for i in range(3):
            t = time.time()
            out = fn(*a, **k)
            jax.block_until_ready(out)
            el = time.time() - t
        print(f'{label:28s} {el*1e3:9.1f} ms   (warm, 3rd rep)')
        return out

    segs = timed('quench+drift', lambda s: drift(quench(s, det,
                                                        physics.BIRKS), det),
                 segs)

    res = mc.simulate_charge_batch(segs, dm, sim, key, response,
                                   already_drifted=True,
                                   event_slot=slot)
    print('full batch warm...')
    t = time.time()
    res = mc.simulate_charge_batch(segs, dm, sim, key, response,
                                   already_drifted=True,
                                   event_slot=slot)
    print(f'{"simulate_charge_batch":28s} {(time.time()-t)*1e3:9.1f} ms '
          f'(n_unique={res.n_unique})')


if __name__ == '__main__':
    main()
