"""Host-side batching: event x TPC-group iteration over track segments.

Same contract as the reference TPCBatcher (util/batching.py:17-67): yields
`(event_id, segment_mask)` per (event, EVENT_BATCH_SIZE TPC group), masking
out segments already simulated in a previous group.
"""
from __future__ import annotations

from math import ceil

import numpy as np

from larndsim_tpu.ops.drift import select_active_volume


class TPCBatcher:
    def __init__(self, all_track_seg, track_seg, event_separator: str,
                 tpc_batch_size: int = 1,
                 tpc_borders=np.empty((0, 3, 2), dtype='f4')):
        self.all_track_seg = all_track_seg
        self.track_seg = track_seg
        self.event_separator = event_separator
        self.tpc_batch_size = tpc_batch_size
        self.tpc_borders = np.sort(np.asarray(tpc_borders), axis=-1)
        self._simulated = np.zeros(track_seg.shape[0], dtype=bool)
        self._events = np.unique(all_track_seg[event_separator])
        self._curr_event = 0
        self._curr_tpc = 0

    def __len__(self):
        return len(self._events) * ceil(self.tpc_borders.shape[0]
                                        / self.tpc_batch_size)

    def __iter__(self):
        return self

    def __next__(self):
        if self._curr_tpc >= self.tpc_borders.shape[0]:
            self._curr_event += 1
            self._curr_tpc = 0
        if self._curr_event >= len(self._events):
            raise StopIteration

        mask = ~self._simulated.copy()
        mask &= (self.track_seg[self.event_separator]
                 == self._events[self._curr_event])
        lo = self._curr_tpc
        hi = min(lo + self.tpc_batch_size, self.tpc_borders.shape[0])
        in_tpc = np.zeros_like(mask)
        sub = select_active_volume(self.track_seg, self.tpc_borders[lo:hi])
        in_tpc |= sub
        self._curr_tpc += self.tpc_batch_size
        mask &= in_tpc
        self._simulated |= mask
        return self._events[self._curr_event], mask
