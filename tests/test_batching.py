"""Batching: FastTPCBatcher (native/numpy) vs the reference-semantics
TPCBatcher — identical (event, mask) sequences."""
import numpy as np
import pytest

from larndsim_tpu.params import load_detector
from batching_oracle import TPCBatcher
from larndsim_tpu.utils.batching_native import FastTPCBatcher, assign_groups
from larndsim_tpu.native import load_library
from larndsim_tpu import segments as seg_mod

from test_charge_chain import DETPROP, PIXEL


def random_tracks(borders, n, seed=0):
    rng = np.random.default_rng(seed)
    dtype = np.dtype([(f, 'f8') for f in seg_mod.FLOAT_FIELDS]
                     + [(f, 'i8') for f in seg_mod.INT_FIELDS])
    tr = np.zeros(n, dtype=dtype)
    lo = borders.min(axis=(0, 2)) - 5
    hi = borders.max(axis=(0, 2)) + 5
    for i, ax in enumerate('xyz'):
        tr[f'{ax}_start'] = rng.uniform(lo[i], hi[i], n)
        tr[f'{ax}_end'] = rng.uniform(lo[i], hi[i], n)
    tr['event_id'] = rng.integers(0, 5, n)
    return tr


class TestFastBatcher:
    @pytest.mark.parametrize('tpc_batch_size', [1, 2])
    def test_matches_reference_batcher(self, tpc_batch_size):
        det_model = load_detector(DETPROP, PIXEL)
        borders = det_model.tpc_borders
        tr = random_tracks(borders, 400)

        ref = TPCBatcher(tr, tr, 'event_id', tpc_batch_size=tpc_batch_size,
                         tpc_borders=borders)
        fast = FastTPCBatcher(tr, tr, 'event_id',
                              tpc_batch_size=tpc_batch_size,
                              tpc_borders=borders)
        ref_batches = list(ref)
        fast_batches = list(fast)
        assert len(ref_batches) == len(fast_batches)
        for (ev_r, m_r), (ev_f, m_f) in zip(ref_batches, fast_batches):
            assert ev_r == ev_f
            np.testing.assert_array_equal(m_r, m_f)

    def test_native_library_builds(self):
        lib = load_library('batcher')
        # toolchain is available in this environment; the numpy fallback
        # covers environments without one
        if lib is not None:
            det_model = load_detector(DETPROP, PIXEL)
            tr = random_tracks(det_model.tpc_borders, 100, seed=1)
            got = assign_groups(tr, det_model.tpc_borders, 1)
            from larndsim_tpu.utils.batching_native import \
                _assign_groups_numpy
            borders = np.sort(det_model.tpc_borders, axis=-1)
            gop = np.arange(borders.shape[0]).astype(np.int32)
            expected = _assign_groups_numpy(tr, borders, gop,
                                            borders.shape[0])
            np.testing.assert_array_equal(got, expected)
