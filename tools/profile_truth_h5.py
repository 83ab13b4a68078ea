"""Decompose the truth/h5 phase at exact bench shapes.

Generates production-shaped light_wvfm_mc_assn records via the same
worker path the bench exercises (tools/profile_truth_worker.py inputs),
then times each stage of the append separately:

  * shuffle-only (native byte-plane transpose)
  * shuffle+lzf  (the full native chunk encoder)
  * write_direct_chunk into a fresh HDF5 file (end-to-end append)
  * plain h5py filter-pipeline append (the fallback path), for scale

Run: JAX_PLATFORMS=cpu python tools/profile_truth_h5.py [n_events]
"""
from __future__ import annotations

import ctypes
import os
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ.setdefault('LARNDSIM_ASSETS', '/root/reference/larndsim')

import numpy as np


def make_records(n_events: int) -> np.ndarray:
    from larndsim_tpu.params import load_light, load_sim
    from larndsim_tpu.assets.light_lut import make_light_lut
    from larndsim_tpu.models.light import _host_smeared_truth_sparse
    from larndsim_tpu.ops.light import LightLUT

    ref = os.environ['LARNDSIM_ASSETS']
    light = load_light(f'{ref}/detector_properties/2x2_no_modvar.yaml')
    sim = load_sim(
        f'{ref}/simulation_properties/2x2_NuMI_sim_no_modvar.yaml')
    lut = LightLUT.from_structured(make_light_lut())

    C, K = 384, sim.max_mc_truth_ids
    n_ticks = 16384
    conv_ticks = int(np.ceil(
        (light.light_window[1] - light.light_window[0])
        / light.light_tick_size))
    digit_samples = int(np.ceil(
        (light.light_trig_window[1] + light.light_trig_window[0])
        / light.light_digit_sample_spacing))
    pre = int(np.ceil(light.light_trig_window[0] / light.light_tick_size))

    parts = []
    for ev in range(n_events):
        rng = np.random.default_rng(ev)
        ids = rng.integers(0, 4000, (C, K)).astype(np.int64)
        contrib = rng.random((C, K)).astype(np.float32) * 50 + 1
        t0 = rng.random((C, K)).astype(np.float32) * 8.0
        vx = np.stack([rng.integers(0, 14, (C, K)),
                       rng.integers(0, 26, (C, K)),
                       rng.integers(0, 8, (C, K))], axis=-1).astype(np.int32)
        out = _host_smeared_truth_sparse(
            ids, contrib, t0, vx, lut.time_dist_host, np.arange(C), light,
            sim.mc_truth_threshold, conv_ticks, n_ticks, digit_samples,
            pre, 0, 0.0, as_records=True)
        parts.append(np.array(out))
    return np.concatenate(parts)


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from larndsim_tpu.io import export as ex

    t0 = time.perf_counter()
    rec = make_records(n_events)
    print(f'generated {len(rec) / 1e6:.1f} M records '
          f'({rec.nbytes / 2**20:.0f} MiB) in '
          f'{time.perf_counter() - t0:.1f} s')

    lib = ex._native_h5lzf()
    assert lib is not None
    chunk = ex._TRUTH_CHUNK
    recsz = rec.dtype.itemsize
    cb = chunk * recsz
    n_full = len(rec) // chunk
    body = np.ascontiguousarray(rec[:n_full * chunk])
    scratch = ctypes.create_string_buffer(cb)

    # shuffle-only (if the lib exports it)
    if hasattr(lib, 'shuffle_bench'):
        lib.shuffle_bench.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_void_p]
        lib.shuffle_bench.restype = None
        t0 = time.perf_counter()
        lib.shuffle_bench(body.ctypes.data, n_full, cb, recsz, scratch)
        dt = time.perf_counter() - t0
        print(f'shuffle only : {dt:.3f} s  '
              f'{body.nbytes / dt / 2**20:.0f} MB/s')

    # full shuffle+lzf, in 32-chunk slabs like production
    slab = 32
    sizes = (ctypes.c_int32 * slab)()
    flags = (ctypes.c_uint8 * slab)()
    outs = ctypes.create_string_buffer(slab * cb)
    t0 = time.perf_counter()
    comp = 0
    for s0 in range(0, n_full, slab):
        k = min(slab, n_full - s0)
        lib.shuffle_lzf_chunks(body.ctypes.data + s0 * cb, k, cb, recsz,
                               scratch, outs, sizes, flags)
        comp += sum(sizes[j] for j in range(k))
    dt = time.perf_counter() - t0
    print(f'shuffle+lzf  : {dt:.3f} s  '
          f'{body.nbytes / dt / 2**20:.0f} MB/s  ratio '
          f'{body.nbytes / max(comp, 1):.1f}')

    # end-to-end append with write_direct_chunk
    tmp = tempfile.mkdtemp(prefix='truth_h5_prof_')
    fn = os.path.join(tmp, 'direct.h5')
    t0 = time.perf_counter()
    ex.export_light_truth_to_hdf5(fn, rec, compression='lzf')
    dt = time.perf_counter() - t0
    print(f'direct append: {dt:.3f} s  '
          f'{rec.nbytes / dt / 2**20:.0f} MB/s  '
          f'(file {os.path.getsize(fn) / 2**20:.0f} MiB)')

    # h5py pipeline fallback, for scale
    fn2 = os.path.join(fn + '.pipe.h5')
    import h5py
    t0 = time.perf_counter()
    with h5py.File(fn2, 'a') as f:
        f.create_dataset('light_wvfm_mc_assn', data=rec,
                         maxshape=(None,), chunks=(chunk,),
                         compression='lzf', shuffle=True)
    dt = time.perf_counter() - t0
    print(f'h5py pipeline: {dt:.3f} s  '
          f'{rec.nbytes / dt / 2**20:.0f} MB/s')
    os.unlink(fn)
    os.unlink(fn2)
    os.rmdir(tmp)


if __name__ == '__main__':
    main()
