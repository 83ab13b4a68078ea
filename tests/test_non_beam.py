"""Non-beam (``is_spill_sim: 0``) orchestration through the full CLI.

The reference draws sequential exponential event times instead of the
fixed spill grid (cli/simulate_pixels.py:609-613, fee.gen_event_times
fee.py:66-81) and broadcasts them into `vertices`/`mc_hdr` as
``t_event`` (cli:616-642).  This test drives the CLI branch
(larndsim_tpu/cli/simulate_pixels.py:271-295) end-to-end on synthetic
module0 input and checks:

* event times are strictly increasing and reproducible from the
  ``rand_seed`` (same `default_rng` consumption order);
* ``t_event`` lands in the output ``vertices`` rows of each event;
* every data packet's timestamp is consistent with its event's
  ``gen_event_times`` start (via the mc_packets_assn backtrack), modulo
  the PACMAN clock reset period.
"""
from __future__ import annotations

import os

import h5py
import numpy as np
import pytest

REF = os.environ.get('LARNDSIM_ASSETS', '/root/reference/larndsim')
DETPROP = f'{REF}/detector_properties/module0.yaml'
PIXEL = f'{REF}/pixel_layouts/multi_tile_layout-2.3.16.yaml'
SIMPROP = f'{REF}/simulation_properties/singles_sim_no_modvar.yaml'

SEED = 123
N_EVENTS = 4


@pytest.fixture(scope='module')
def files(tmp_path_factory):
    from larndsim_tpu.assets.make_input import write_input
    from larndsim_tpu.cli.simulate_pixels import run_simulation
    from larndsim_tpu.params import load_detector

    tmp = tmp_path_factory.mktemp('nonbeam')
    dm = load_detector(DETPROP, PIXEL)
    inp = str(tmp / 'in.h5')
    out = str(tmp / 'out.h5')
    write_input(inp, dm.tpc_borders, n_events=N_EVENTS, tracks_per_event=2,
                segments_per_track=8, dEdx=12.0, seed=7)
    run_simulation(inp, out, config='module0',
                   simulation_properties=SIMPROP,
                   response_file='__missing__.npy',
                   light_simulated=False,
                   rand_seed=SEED, step_scale=8.0)
    return dict(inp=inp, out=out)


def _expected_event_times():
    """Replicate the CLI's draw: default_rng(rand_seed) is consumed
    first (and only) by gen_event_times."""
    from larndsim_tpu.params import load_detector
    dm = load_detector(DETPROP, PIXEL)
    rate = float(dm.params.event_rate)
    gap = float(dm.params.non_beam_event_gap)
    rng = np.random.default_rng(SEED)
    return np.cumsum(rng.exponential(scale=rate, size=N_EVENTS)) + gap


def test_event_times_monotone_and_non_spill():
    times = _expected_event_times()
    assert np.all(np.diff(times) > 0)
    # and they are NOT the beam spill grid
    spill_grid = np.arange(N_EVENTS) * 1.2e6
    assert not np.allclose(times, spill_grid)


def test_t_event_broadcast_into_vertices(files):
    times = _expected_event_times()
    with h5py.File(files['out']) as f:
        vert = np.array(f['vertices'])
    assert 't_event' in vert.dtype.names
    ev_key = 'eventID' if 'eventID' in vert.dtype.names else 'event_id'
    for ev in np.unique(vert[ev_key]):
        rows = vert[vert[ev_key] == ev]
        np.testing.assert_allclose(rows['t_event'], times[int(ev)],
                                   rtol=1e-6)


def test_packet_timestamps_follow_event_times(files):
    from larndsim_tpu.params import load_detector
    dm = load_detector(DETPROP, PIXEL)
    det = dm.params
    clock = float(det.clock_cycle)
    period = int(det.clock_reset_period)
    times = _expected_event_times()
    with h5py.File(files['out']) as f:
        packets = np.array(f['packets'])
        assn = np.array(f['mc_packets_assn'])
        segs = np.array(f['segments'])
    data = packets['packet_type'] == 0
    assert data.sum() > 0
    # event window in ticks: t_event + [0, time_interval + drift slack]
    window_ticks = int((det.time_interval[1] + 400.0) / clock) + 64
    checked = 0
    for pk, an in zip(packets[data], assn[data]):
        ev = int(an['event_ids'][0])
        if ev < 0:
            continue
        t0_tick = int(times[ev] / clock)
        delta = (int(pk['timestamp']) - t0_tick) % period
        assert 0 <= delta <= window_ticks, (
            f'packet ts {pk["timestamp"]} outside event {ev} window '
            f'(t0_tick {t0_tick}, delta {delta})')
        checked += 1
    assert checked > 0
