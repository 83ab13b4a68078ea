"""edep-sim ROOT -> HDF5 converter.

Counterpart of the reference converter (cli/dumpTree.py:171-474): reads
`EDepSimEvents` TTrees (+ optional event spill maps) and writes the
`segments` / `trajectories` / `vertices` HDF5 schema this framework (and
the reference) consume.  Pure host tooling — requires PyROOT and the
edep-sim event classes, which are upstream dependencies outside this
framework (the reference takes the same position, README.md:17).  The
output dtypes live in assets/make_input.py and are shared with the
synthetic input generator.

Unit conventions (cli/dumpTree.py:45-46): positions mm -> cm, times
ns -> us; spill time = spillCounter * spillPeriod * 1e6 us
(cli/dumpTree.py:228-237).
"""
from __future__ import annotations

import os

import numpy as np

from ..assets.make_input import (SEGMENTS_DTYPE, TRAJECTORIES_DTYPE,
                                 VERTICES_DTYPE)

EDEP2CM = 0.1
EDEP2US = 0.001


class SpillTimer:
    """Spill-time bookkeeping of the reference loop (dumpTree.py:198-237):
    without an `event_spill_map` every event is its own "spill" at t=0;
    with one, a counter increments whenever the event's global spill id
    changes and t_spill = counter * spillPeriod_s * 1e6 us."""

    def __init__(self, spill_period_s: float | None):
        self.spill_period_s = spill_period_s   # None = no event_spill_map
        self._counter = -1
        self._last = None

    def t_spill(self, spill_id) -> float:
        if self.spill_period_s is None:
            return 0.0
        if spill_id != self._last:
            self._counter += 1
            self._last = spill_id
        return self._counter * self.spill_period_s * 1e6


def passes_active_volume(container_names, keep_all_dets: bool) -> bool:
    """Event filter (dumpTree.py:255-262): with keep_all_dets, keep any
    event that has segment detectors at all; otherwise require a container
    named $ARCUBE_ACTIVE_VOLUME (default 'volTPCActive')."""
    names = list(container_names)
    if keep_all_dets:
        return len(names) > 0
    active = os.environ.get('ARCUBE_ACTIVE_VOLUME', 'volTPCActive')
    return any(name == active for name in names)


def dump(input_file: str, output_file: str,
         n_events: int | None = None, keep_all_dets: bool = False):
    """Convert an edep-sim ROOT file to the segments HDF5 schema.

    Args:
        input_file: edep-sim ROOT file with an EDepSimEvents tree (+
            optional `event_spill_map` TMap and `spillPeriod_s` TParameter,
            dumpTree.py:198-205).
        output_file: HDF5 output path.
        keep_all_dets: keep events with hits in any detector container
            instead of requiring $ARCUBE_ACTIVE_VOLUME (dumpTree.py:255).
    """
    try:
        from ROOT import TFile, TG4Event  # noqa: F401
    except ImportError as exc:  # pragma: no cover - needs ROOT
        raise ImportError(
            'dump_tree requires PyROOT with edep-sim event classes; '
            'install the upstream edep-sim toolchain, or produce inputs '
            'with any tool emitting the segments HDF5 schema '
            '(see larndsim_tpu.assets.make_input for the dtypes).') from exc

    import h5py

    root_file = TFile(input_file)
    tree = root_file.Get('EDepSimEvents')
    n = tree.GetEntries() if n_events is None else min(
        n_events, tree.GetEntries())

    # spill map: which global spill each (run, event) lives in
    # (dumpTree.py:198-205)
    event_spill_map = root_file.Get('event_spill_map')
    timer = SpillTimer(float(root_file.Get('spillPeriod_s').GetVal())
                       if event_spill_map else None)

    segments, trajectories, vertices = [], [], []
    segment_id = 0
    file_traj = 0
    for ientry in range(int(n)):
        tree.GetEntry(ientry)
        event = tree.Event
        ev_id = event.EventId
        if event_spill_map:
            spill_tobj = event_spill_map.GetValue(
                f'{event.RunId} {event.EventId}')
            t_spill = timer.t_spill(int(spill_tobj.GetName()))
        else:
            t_spill = timer.t_spill(None)

        if not passes_active_volume(
                (name for name, _hits in event.SegmentDetectors),
                keep_all_dets):
            continue

        for primaries in event.Primaries:
            vrow = np.zeros(1, VERTICES_DTYPE)
            vrow['event_id'] = ev_id
            vrow['vertex_id'] = primaries.GetInteractionNumber()
            pos = primaries.GetPosition()
            vrow['x_vert'] = pos.X() * EDEP2CM
            vrow['y_vert'] = pos.Y() * EDEP2CM
            vrow['z_vert'] = pos.Z() * EDEP2CM
            vrow['t_vert'] = pos.T() * EDEP2US
            vertices.append(vrow)

        for traj in event.Trajectories:
            trow = np.zeros(1, TRAJECTORIES_DTYPE)
            trow['event_id'] = ev_id
            trow['traj_id'] = traj.GetTrackId()
            trow['file_traj_id'] = file_traj
            trow['parent_id'] = traj.GetParentId()
            trow['pdg_id'] = traj.GetPDGCode()
            trajectories.append(trow)
            file_traj += 1

        for det_name, hits in event.SegmentDetectors:
            for hit in hits:
                row = np.zeros(1, SEGMENTS_DTYPE)
                row['event_id'] = ev_id
                row['segment_id'] = segment_id
                row['traj_id'] = hit.GetPrimaryId()
                start, stop = hit.GetStart(), hit.GetStop()
                row['x_start'] = start.X() * EDEP2CM
                row['y_start'] = start.Y() * EDEP2CM
                row['z_start'] = start.Z() * EDEP2CM
                row['x_end'] = stop.X() * EDEP2CM
                row['y_end'] = stop.Y() * EDEP2CM
                row['z_end'] = stop.Z() * EDEP2CM
                row['x'] = 0.5 * (row['x_start'] + row['x_end'])
                row['y'] = 0.5 * (row['y_start'] + row['y_end'])
                row['z'] = 0.5 * (row['z_start'] + row['z_end'])
                row['t0_start'] = start.T() * EDEP2US + t_spill
                row['t0_end'] = stop.T() * EDEP2US + t_spill
                row['t0'] = 0.5 * (row['t0_start'] + row['t0_end'])
                row['dE'] = hit.GetEnergyDeposit()
                dx = np.sqrt((row['x_end'] - row['x_start']) ** 2
                             + (row['y_end'] - row['y_start']) ** 2
                             + (row['z_end'] - row['z_start']) ** 2)
                row['dx'] = dx
                row['dEdx'] = row['dE'] / dx if dx > 0 else 0
                row['pdg_id'] = 13
                segments.append(row)
                segment_id += 1

    with h5py.File(output_file, 'w') as f:
        f.create_dataset('segments', data=np.concatenate(segments)
                         if segments else np.zeros(0, SEGMENTS_DTYPE))
        f.create_dataset('trajectories', data=np.concatenate(trajectories)
                         if trajectories else np.zeros(0, TRAJECTORIES_DTYPE))
        f.create_dataset('vertices', data=np.concatenate(vertices)
                         if vertices else np.zeros(0, VERTICES_DTYPE))
    print(f'wrote {segment_id} segments to {output_file}')


if __name__ == '__main__':
    import argparse
    ap = argparse.ArgumentParser(
        description='edep-sim ROOT -> segments HDF5 (reference '
                    'cli/dumpTree.py counterpart)')
    ap.add_argument('input_file')
    ap.add_argument('output_file')
    ap.add_argument('--n_events', type=int, default=None,
                    help='stop after this many events')
    ap.add_argument('--keep_all_dets', action='store_true',
                    help='keep events with hits in any detector container '
                         'instead of requiring $ARCUBE_ACTIVE_VOLUME '
                         '(dumpTree.py:255)')
    a = ap.parse_args()
    dump(a.input_file, a.output_file, n_events=a.n_events,
         keep_all_dets=a.keep_all_dets)
