"""Native shuffle+LZF direct-chunk truth writer vs the h5py pipeline.

The native path (io/export._append_direct_lzf + native/h5lzf.cpp) must
produce a file any plain h5py reader decompresses to the identical record
stream the pure-h5py pipeline writes, across append patterns that
exercise tail re-stitching, full-slab bodies, and incompressible chunks.
"""
import os

import h5py
import numpy as np
import pytest

from larndsim_tpu.io import export


def _records(rng, n, seed_col=0):
    out = np.zeros(n, export.TRUTH_DTYPE)
    out['trigger_id'] = rng.integers(0, 8, n)
    out['op_channel_id'] = rng.integers(0, 384, n)
    out['tick'] = np.sort(rng.integers(0, 1000, n))
    out['event_id'] = seed_col
    out['segment_id'] = rng.integers(0, 7000, n)
    out['pe_current'] = rng.random(n).astype('f4').astype('f8') * 10
    return out


def _write_all(path, batches, native: bool):
    env = os.environ.get('LARNDSIM_NATIVE_H5LZF')
    os.environ['LARNDSIM_NATIVE_H5LZF'] = '1' if native else '0'
    export._H5LZF = None  # drop the cached loader so the env applies
    try:
        for b in batches:
            export.export_light_truth_to_hdf5(path, b)
    finally:
        if env is None:
            os.environ.pop('LARNDSIM_NATIVE_H5LZF')
        else:
            os.environ['LARNDSIM_NATIVE_H5LZF'] = env
        export._H5LZF = None


def _native_available():
    export._H5LZF = None
    lib = export._native_h5lzf()
    export._H5LZF = None
    return lib is not None


needs_native = pytest.mark.skipif(not _native_available(),
                                  reason='native h5lzf not built')


class TestDirectLZF:
    @needs_native
    @pytest.mark.parametrize('sizes', [
        [17],                                   # sub-chunk only
        [export._TRUTH_CHUNK],                  # exactly one chunk
        [export._TRUTH_CHUNK - 1, 1, 5],        # tail stitching at edges
        [100, export._TRUTH_CHUNK * 3 + 7],     # tail + slab body + tail
        [export._TRUTH_CHUNK * 2, 0, 33],       # empty append interleaved
    ])
    def test_matches_h5py_pipeline(self, tmp_path, sizes):
        rng = np.random.default_rng(7)
        batches = [_records(rng, n, i) for i, n in enumerate(sizes)]
        p_nat = str(tmp_path / 'nat.h5')
        p_ref = str(tmp_path / 'ref.h5')
        _write_all(p_nat, batches, native=True)
        _write_all(p_ref, [b.copy() for b in batches], native=False)
        with h5py.File(p_nat) as fn, h5py.File(p_ref) as fr:
            a, b = fn['light_wvfm_mc_assn'][:], fr['light_wvfm_mc_assn'][:]
            assert a.shape == b.shape
            assert np.array_equal(a, b)
            # the file must still declare the standard pipeline
            assert fn['light_wvfm_mc_assn'].compression == 'lzf'
            assert fn['light_wvfm_mc_assn'].shuffle

    @needs_native
    def test_incompressible_chunks_roundtrip(self, tmp_path):
        # pure random bytes defeat LZF even after shuffle -> the encoder
        # must fall back to shuffled-raw chunks with the lzf bit masked
        rng = np.random.default_rng(3)
        n = export._TRUTH_CHUNK + 123
        raw = rng.bytes(n * export.TRUTH_DTYPE.itemsize)
        rec = np.frombuffer(raw, dtype=export.TRUTH_DTYPE).copy()
        p = str(tmp_path / 'r.h5')
        _write_all(p, [rec], native=True)
        with h5py.File(p) as f:
            # byte compare: random pe_current bytes include NaNs, which
            # defeat array_equal even on identical data
            assert f['light_wvfm_mc_assn'][:].tobytes() == rec.tobytes()

    @needs_native
    def test_compression_ratio_holds(self, tmp_path):
        # guard: the native encoder must stay within 10% of the h5py
        # pipeline's compressed size on production-shaped records
        rng = np.random.default_rng(11)
        recs = _records(rng, export._TRUTH_CHUNK * 8, 2)
        p_nat, p_ref = str(tmp_path / 'n.h5'), str(tmp_path / 'r.h5')
        _write_all(p_nat, [recs], native=True)
        _write_all(p_ref, [recs.copy()], native=False)
        assert os.path.getsize(p_nat) < os.path.getsize(p_ref) * 1.10

    def test_fallback_path(self, tmp_path):
        # env kill-switch: pure h5py path still works
        rng = np.random.default_rng(5)
        p = str(tmp_path / 'f.h5')
        _write_all(p, [_records(rng, 1000, 0), _records(rng, 500, 1)],
                   native=False)
        with h5py.File(p) as f:
            assert f['light_wvfm_mc_assn'].shape == (1500,)

    def test_none_compression(self, tmp_path):
        rng = np.random.default_rng(5)
        p = str(tmp_path / 'u.h5')
        export.export_light_truth_to_hdf5(p, _records(rng, 100, 0),
                                          compression='none')
        export.export_light_truth_to_hdf5(p, _records(rng, 50, 1),
                                          compression='none')
        with h5py.File(p) as f:
            ds = f['light_wvfm_mc_assn']
            assert ds.shape == (150,) and ds.compression is None
