"""Fast batch planner: one-pass segment -> (event, TPC-group) assignment.

Drop-in accelerated planner for the host batching loop.  The reference
batcher re-masks the whole segment array per (event, TPC-group) iteration
(util/batching.py:17-67: O(n_events * n_tpc_groups * n_segments) host
work); here every segment is assigned once — O(n_segments * n_tpc) in the
native path (larndsim_tpu/native/batcher.cpp), with a vectorized numpy
fallback — and batches are emitted from precomputed index lists.

Ordering semantics match TPCBatcher exactly: batches iterate events in
ascending order, TPC groups of `tpc_batch_size` TPCs within each event,
and each segment belongs to the *first* group whose sorted bounding box
contains its start or end point.
"""
from __future__ import annotations

import ctypes
from math import ceil

import numpy as np

from ..native import load_library


def _assign_groups_numpy(tracks, borders_sorted, group_of_tpc, n_groups):
    n = tracks.shape[0]
    best = np.full(n, np.iinfo(np.int32).max, np.int32)
    for t in range(borders_sorted.shape[0]):
        b = borders_sorted[t]
        inside = np.zeros(n, bool)
        for sfx in ('_start', '_end'):
            inside |= ((tracks['x' + sfx] > b[0, 0])
                       & (tracks['x' + sfx] < b[0, 1])
                       & (tracks['y' + sfx] > b[1, 0])
                       & (tracks['y' + sfx] < b[1, 1])
                       & (tracks['z' + sfx] > b[2, 0])
                       & (tracks['z' + sfx] < b[2, 1]))
        best[inside] = np.minimum(best[inside], group_of_tpc[t])
    return np.where(best == np.iinfo(np.int32).max, -1, best)


def assign_groups(tracks, tpc_borders, tpc_batch_size: int) -> np.ndarray:
    """First containing TPC-group index per segment (-1 if outside all)."""
    borders = np.sort(np.asarray(tpc_borders, np.float64), axis=-1)
    n_tpc = borders.shape[0]
    n_groups = ceil(n_tpc / tpc_batch_size)
    group_of_tpc = (np.arange(n_tpc) // tpc_batch_size).astype(np.int32)

    lib = load_library('batcher')
    if lib is None:
        return _assign_groups_numpy(tracks, borders, group_of_tpc, n_groups)

    n = tracks.shape[0]
    out = np.empty(n, np.int32)
    f32 = lambda name: np.ascontiguousarray(tracks[name], np.float32)
    arrs = [f32(c + s) for s in ('_start', '_end') for c in 'xyz']
    cptr = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    lib.assign_batches(
        ctypes.c_int64(n), ctypes.c_int64(n_tpc),
        cptr(arrs[0], ctypes.c_float), cptr(arrs[1], ctypes.c_float),
        cptr(arrs[2], ctypes.c_float), cptr(arrs[3], ctypes.c_float),
        cptr(arrs[4], ctypes.c_float), cptr(arrs[5], ctypes.c_float),
        cptr(np.ascontiguousarray(borders), ctypes.c_double),
        cptr(group_of_tpc, ctypes.c_int32),
        ctypes.c_int32(n_groups),
        cptr(out, ctypes.c_int32))
    return out


class FastTPCBatcher:
    """Precomputed-index batch iterator (TPCBatcher-compatible yields)."""

    def __init__(self, all_track_seg, track_seg, event_separator: str,
                 tpc_batch_size: int = 1,
                 tpc_borders=np.empty((0, 3, 2), dtype='f4')):
        self.track_seg = track_seg
        n_tpc = np.asarray(tpc_borders).shape[0]
        self.n_groups = max(ceil(n_tpc / tpc_batch_size), 1)
        self.events = np.unique(all_track_seg[event_separator])
        group = assign_groups(track_seg, tpc_borders, tpc_batch_size) \
            if n_tpc else np.full(track_seg.shape[0], -1, np.int32)
        ev_index = np.searchsorted(self.events,
                                   track_seg[event_separator])
        self.keys = np.where(group >= 0,
                             ev_index.astype(np.int64) * self.n_groups
                             + group, -1)
        self._order = [(ev, g) for ev in self.events
                       for g in range(self.n_groups)]
        self._i = 0

    def __len__(self):
        return len(self._order)

    def __iter__(self):
        return self

    def __next__(self):
        if self._i >= len(self._order):
            raise StopIteration
        ev, g = self._order[self._i]
        ev_idx = np.searchsorted(self.events, ev)
        key = ev_idx * self.n_groups + g
        self._i += 1
        return ev, self.keys == key
