"""Execute cli/dump_tree.py against a fake-ROOT shim.

The converter needs PyROOT + edep-sim event classes (absent here, as in
the reference's CI), so this test installs a minimal `ROOT` module into
sys.modules that mimics the TFile/TTree/TG4Event surface dump() touches
(reference: cli/dumpTree.py:171-474) and checks the full conversion:
unit scaling, spill timing into vertices.t_event, active-volume
filtering, contributor->primary ancestor resolution, and the
lazily-dumped trajectory lines.
"""
from __future__ import annotations

import sys
import types

import h5py
import numpy as np
import pytest

from larndsim_tpu.cli import dump_tree


# ---- fake-ROOT object model -------------------------------------------


class V4:
    def __init__(self, x, y, z, t=0.0):
        self._v = (float(x), float(y), float(z), float(t))

    def X(self):
        return self._v[0]

    def Y(self):
        return self._v[1]

    def Z(self):
        return self._v[2]

    def T(self):
        return self._v[3]

    def M(self):
        return 105.66   # fixed "mass" for E checks


class Point:
    def __init__(self, pos, mom, process=2, subprocess=12):
        self.pos, self.mom = pos, mom
        self.process, self.subprocess = process, subprocess

    def GetPosition(self):
        return self.pos

    def GetMomentum(self):
        return self.mom

    def GetProcess(self):
        return self.process

    def GetSubprocess(self):
        return self.subprocess


class Trajectory:
    def __init__(self, track_id, parent_id, pdg, points):
        self._id, self._parent, self._pdg = track_id, parent_id, pdg
        self.Points = points

    def GetTrackId(self):
        return self._id

    def GetParentId(self):
        return self._parent

    def GetPDGCode(self):
        return self._pdg

    def GetInitialMomentum(self):
        return self.Points[0].GetMomentum()


class PrimaryParticle:
    def __init__(self, track_id):
        self._id = track_id

    def GetTrackId(self):
        return self._id


class PrimaryVertex:
    def __init__(self, pos, track_ids):
        self._pos = pos
        self.Particles = [PrimaryParticle(t) for t in track_ids]

    def GetPosition(self):
        return self._pos


class Hit:
    def __init__(self, start, stop, dE, contrib):
        self._start, self._stop, self._dE = start, stop, dE
        self.Contrib = list(contrib)

    def GetStart(self):
        return self._start

    def GetStop(self):
        return self._stop

    def GetEnergyDeposit(self):
        return self._dE


class Event:
    def __init__(self, run_id, event_id, primaries, trajectories,
                 detectors):
        self.RunId, self.EventId = run_id, event_id
        self.Primaries = primaries
        self.Trajectories = trajectories
        self.SegmentDetectors = detectors   # list of (name, hits)


class FakeTree:
    def __init__(self, events):
        self._events = events
        self.Event = None

    def GetEntries(self):
        return len(self._events)

    def GetEntry(self, i):
        self.Event = self._events[i]
        return 1


class TNamed:
    def __init__(self, name):
        self._name = str(name)

    def GetName(self):
        return self._name


class FakeSpillMap:
    def __init__(self, mapping):
        self._m = {k: TNamed(v) for k, v in mapping.items()}

    def GetValue(self, key):
        return self._m[key]

    def __bool__(self):
        return True


class TParameter:
    def __init__(self, val):
        self._val = val

    def GetVal(self):
        return self._val


class FakeTFile:
    registry: dict = {}

    def __init__(self, path):
        self._objs = FakeTFile.registry[path]

    def Get(self, name):
        return self._objs.get(name)


def _install_fake_root(monkeypatch):
    mod = types.ModuleType('ROOT')
    mod.TFile = FakeTFile
    mod.TG4Event = object
    monkeypatch.setitem(sys.modules, 'ROOT', mod)


# ---- fixture geometry: two events -------------------------------------
#
# Event 7 (run 1): one primary vertex (track 0); trajectory chain
# 0 -> 1 -> 2; segments in volTPCActive contributed by track 2, plus a
# volCryostat container whose hits must be skipped in default mode.
# Event 8 (run 1): only volCryostat -> filtered out entirely by default.


def _mk_events():
    mom = V4(30.0, 40.0, 0.0)
    t0 = Trajectory(0, -1, 13, [
        Point(V4(0, 0, 0, 0), mom), Point(V4(100, 0, 0, 10), mom),
        Point(V4(100, 200, 0, 20), mom)])
    t1 = Trajectory(1, 0, 11, [
        Point(V4(100, 200, 0, 20), mom), Point(V4(100, 200, 50, 25), mom)])
    t2 = Trajectory(2, 1, 22, [
        Point(V4(100, 200, 50, 25), mom), Point(V4(110, 200, 50, 30), mom)])
    # a non-contributing relative IN the contributor's family: the
    # reference dumps the whole family on the first contributing hit
    t3 = Trajectory(3, 0, 2112, [
        Point(V4(0, 0, 0, 0), mom), Point(V4(0, 0, 1, 1), mom)])
    # a rootless family (parent -1 but not a registered primary particle)
    # with no segments: never dumped
    t4 = Trajectory(4, -1, 211, [
        Point(V4(0, 0, 0, 0), mom), Point(V4(0, 0, 2, 2), mom)])
    hit_act = Hit(V4(100, 200, 50, 1000), V4(110, 200, 50, 1200),
                  dE=2.5, contrib=[2])
    hit_cry = Hit(V4(0, 0, 0, 0), V4(10, 0, 0, 1), dE=9.0, contrib=[0])
    ev7 = Event(1, 7, [PrimaryVertex(V4(11, 22, 33, 44), [0])],
                [t0, t1, t2, t3, t4],
                [('volTPCActive', [hit_act]), ('volCryostat', [hit_cry])])
    ev8 = Event(1, 8, [PrimaryVertex(V4(0, 0, 0, 0), [0])],
                [Trajectory(0, -1, 13, [Point(V4(0, 0, 0, 0), mom),
                                        Point(V4(1, 0, 0, 1), mom)])],
                [('volCryostat', [hit_cry])])
    return [ev7, ev8]


def _register(path, events, spill_map=None, spill_period=None):
    objs = {'EDepSimEvents': FakeTree(events)}
    if spill_map is not None:
        objs['event_spill_map'] = FakeSpillMap(spill_map)
        objs['spillPeriod_s'] = TParameter(spill_period)
    FakeTFile.registry[path] = objs


class TestDumpTree:
    def test_full_conversion(self, monkeypatch, tmp_path):
        _install_fake_root(monkeypatch)
        _register('in.root', _mk_events(),
                  spill_map={'1 7': 4, '1 8': 5}, spill_period=1.2)
        out = tmp_path / 'out.h5'
        dump_tree.dump('in.root', str(out))

        with h5py.File(out) as f:
            segs = np.array(f['segments'])
            trajs = np.array(f['trajectories'])
            verts = np.array(f['vertices'])

        # event 8 has no active container: filtered; only the active
        # container's hit of event 7 is dumped (dumpTree.py:362-365)
        assert len(segs) == 1
        s = segs[0]
        assert s['event_id'] == 7
        assert s['segment_id'] == 0
        # mm -> cm on positions; ns -> us on times, and t_spill does NOT
        # enter t0 (dumpTree.py:441)
        assert s['x_start'] == pytest.approx(10.0)
        assert s['z_end'] == pytest.approx(5.0)
        assert s['t0_start'] == pytest.approx(1.0)
        assert s['t0'] == pytest.approx(1.1)
        assert s['dE'] == pytest.approx(2.5)
        assert s['dx'] == pytest.approx(1.0)
        assert s['dEdx'] == pytest.approx(2.5)
        # contributor resolution: traj 2, pdg from the trajectory table,
        # vertex through the primary ancestor 0
        assert s['traj_id'] == 2
        assert s['file_traj_id'] == 2
        assert s['pdg_id'] == 22
        assert s['vertex_id'] == 0
        assert s['file_vertex_id'] == 0

        # trajectories: primary 0 + the contributor's ENTIRE family
        # (1, 2, and the non-contributing relative 3 — dumpTree.py:388
        # dumps the merged family list on the first contributing hit);
        # the rootless non-contributing trajectory 4 is NOT dumped but
        # still consumed a file id; event 8 was filtered entirely
        assert sorted(trajs['traj_id'].tolist()) == [0, 1, 2, 3]
        byid = {int(r['traj_id']): r for r in trajs}
        assert bool(byid[0]['primary']) and not bool(byid[1]['primary'])
        assert byid[2]['file_traj_id'] == 2
        assert byid[1]['parent_id'] == 0
        assert byid[3]['vertex_id'] == 0   # family vertex, no segments
        # kinematics of the primary: positions mm->cm, E from |p| & mass
        np.testing.assert_allclose(byid[0]['xyz_start'], [0, 0, 0])
        np.testing.assert_allclose(byid[0]['xyz_end'], [10, 20, 0])
        assert byid[0]['E_start'] == pytest.approx(
            np.sqrt(30 ** 2 + 40 ** 2 + 105.66 ** 2))
        assert byid[0]['t_end'] == pytest.approx(0.02)
        # dist_travel sums the polyline in cm: 100mm + 200mm = 30cm
        assert byid[0]['dist_travel'] == pytest.approx(30.0)
        assert byid[0]['start_process'] == 2
        assert byid[0]['end_subprocess'] == 12

        # vertices: one per primary vertex of surviving events;
        # t_event = spillCounter * period * 1e6 (first new spill -> 0)
        assert len(verts) == 1
        assert verts[0]['x_vert'] == pytest.approx(1.1)
        assert verts[0]['t_vert'] == pytest.approx(0.044)
        assert verts[0]['t_event'] == pytest.approx(0.0)

    def test_spill_counter_progression(self, monkeypatch, tmp_path):
        _install_fake_root(monkeypatch)
        events = _mk_events()
        # make both events pass the filter and live in different spills
        events[1].SegmentDetectors = events[0].SegmentDetectors
        events[1].Trajectories = events[0].Trajectories
        events[1].Primaries = events[0].Primaries
        _register('in2.root', events,
                  spill_map={'1 7': 40, '1 8': 41}, spill_period=1.2)
        out = tmp_path / 'out2.h5'
        dump_tree.dump('in2.root', str(out))
        with h5py.File(out) as f:
            verts = np.array(f['vertices'])
        assert verts['t_event'].tolist() == pytest.approx([0.0, 1.2e6])

    def test_keep_all_dets(self, monkeypatch, tmp_path):
        _install_fake_root(monkeypatch)
        _register('in3.root', _mk_events())
        out = tmp_path / 'out3.h5'
        dump_tree.dump('in3.root', str(out), keep_all_dets=True)
        with h5py.File(out) as f:
            segs = np.array(f['segments'])
        # both containers of event 7 AND event 8's cryostat hit survive
        assert len(segs) == 3
        assert segs['event_id'].tolist() == [7, 7, 8]
        # without a spill map every t0 is raw and t_event is 0
        with h5py.File(out) as f:
            assert np.all(np.array(f['vertices'])['t_event'] == 0)

    def test_n_events_and_chunked_appends(self, monkeypatch, tmp_path):
        _install_fake_root(monkeypatch)
        _register('in4.root', _mk_events())
        out = tmp_path / 'out4.h5'
        # write_batch=1 forces the mid-loop append path
        dump_tree.dump('in4.root', str(out), n_events=1, write_batch=1)
        with h5py.File(out) as f:
            assert len(f['segments']) == 1
            assert len(f['trajectories']) == 4

    def test_missing_root_import_error(self, monkeypatch):
        monkeypatch.setitem(sys.modules, 'ROOT', None)
        with pytest.raises(ImportError, match='PyROOT'):
            dump_tree.dump('x.root', 'y.h5')
