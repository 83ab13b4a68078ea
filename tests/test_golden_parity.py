"""Golden full-chain parity against the ACTUAL reference source.

The reference's own kernels (/root/reference/larndsim/{quenching,drifting,
pixels_from_track,detsim,fee}.py) execute in pure python through
tests/ref_shim's CUDASIM-style executor — the same mechanism the reference
CI uses (`NUMBA_ENABLE_CUDASIM=1`, .github/workflows/test.yml) — and their
outputs are compared stage-by-stage against this framework on identical
inputs.  This is stronger than the oracle-port tests (test_charge_chain,
test_pixelize): a port can faithfully reproduce a misreading; these tests
run the reference's code.

Determinism: the shim's RNG returns 0.0 for every normal draw, which makes
the reference kernels exactly deterministic (all noise enters as
`draw * scale`: detsim.py:333-338, fee.py:557-649).  Our side zeroes the
matching noise scales.  MC step sampling coincides exactly because both
sides use midpoint stepping with nstep = round(length/MIN_STEP_SIZE)
(detsim.py:320-328 / ops/current.py) and the test segments are short
enough that the reference's per-pixel subsegment clipping
(detsim.py:220-256 overlapping_segment) never clips.
"""
import math
import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
for _p in (os.path.join(_HERE, 'ref_shim'), '/root/reference'):
    if _p not in sys.path:
        sys.path.insert(0, _p)

import jax
import jax.numpy as jnp

from larndsim_tpu import segments as seg_mod
from larndsim_tpu.assets.response import make_response
from larndsim_tpu.models import charge as charge_model
from larndsim_tpu.ops import accumulate, current, fee, pixelize
from larndsim_tpu.ops.drift import drift
from larndsim_tpu.ops.quench import quench
from larndsim_tpu.params import load_detector, load_sim, physics

REF_DIR = '/root/reference/larndsim'
DETPROP = f'{REF_DIR}/detector_properties/module0.yaml'
PIXEL = f'{REF_DIR}/pixel_layouts/multi_tile_layout-2.3.16.yaml'
SIMPROP = f'{REF_DIR}/simulation_properties/singles_sim.yaml'

# shrunken time window/padding: keeps the pure-python reference kernels
# O(seconds).  Patched identically on both sides.
T_PADDING = 2.0    # us
T_WINDOW = 10.0    # us


@pytest.fixture(scope='module')
def ref():
    """Reference modules with module0 constants loaded (and the golden
    window patch applied)."""
    import yaml
    if hasattr(yaml, 'CFullLoader'):
        yaml.FullLoader = yaml.CFullLoader
    import larndsim.consts.detector as det
    import larndsim.consts.physics as phys
    import larndsim.consts.sim as sim
    det.set_detector_properties(DETPROP, PIXEL)
    sim.set_simulation_properties(SIMPROP)
    det.TIME_PADDING = T_PADDING
    det.TIME_WINDOW = T_WINDOW
    import larndsim.detsim as detsim
    import larndsim.drifting as drifting
    import larndsim.fee as ref_fee
    import larndsim.pixels_from_track as pft
    import larndsim.quenching as quenching
    return SimpleNamespace(det=det, phys=phys, sim=sim, detsim=detsim,
                           drifting=drifting, fee=ref_fee, pft=pft,
                           quenching=quenching)


@pytest.fixture(scope='module')
def det_model():
    import dataclasses
    dm = load_detector(DETPROP, PIXEL)
    params = dm.params.replace(time_padding=jnp.float32(T_PADDING),
                               time_window=jnp.float32(T_WINDOW))
    return dataclasses.replace(dm, params=params)


@pytest.fixture(scope='module')
def sim_params():
    return load_sim(SIMPROP)


@pytest.fixture(scope='module')
def response(det_model):
    det = det_model.params
    n_t = int(round(T_WINDOW / float(det.response_sampling)))
    return np.asarray(make_response(
        n_xy=45, n_t=n_t, bin_size=float(det.response_bin_size),
        sampling=float(det.response_sampling),
        pixel_pitch=float(det.pixel_pitch)))


TRACK_DTYPE = np.dtype(
    [(f, 'f8') for f in seg_mod.FLOAT_FIELDS]
    + [(f, 'i8') for f in seg_mod.INT_FIELDS])


def make_tracks(borders, n=6, seed=11, length=0.3):
    """Short segments inside TPC 0 (short enough that the reference's
    per-pixel subsegment clipping never engages: endpoints stay within
    the sqrt(nx^2+ny^2)*bin impact radius of every neighboring pixel)."""
    rng = np.random.default_rng(seed)
    tr = np.zeros(n, TRACK_DTYPE)
    b = np.asarray(borders)
    x0 = rng.uniform(b[0, 0, 0] + 5, b[0, 0, 1] - 5, n)
    y0 = rng.uniform(b[0, 1, 0] + 5, b[0, 1, 1] - 5, n)
    zlo, zhi = sorted((b[0, 2, 0], b[0, 2, 1]))
    z0 = rng.uniform(zlo + 2, zhi - 2, n)
    theta = rng.uniform(0, 2 * np.pi, n)
    cosz = rng.uniform(-0.5, 0.5, n)
    sinz = np.sqrt(1 - cosz ** 2)
    dx = length * sinz * np.cos(theta)
    dy = length * sinz * np.sin(theta)
    dz = length * cosz
    tr['x_start'], tr['x_end'] = x0, x0 + dx
    tr['y_start'], tr['y_end'] = y0, y0 + dy
    tr['z_start'], tr['z_end'] = z0, z0 + dz
    for ax in 'xyz':
        tr[ax] = 0.5 * (tr[f'{ax}_start'] + tr[f'{ax}_end'])
    tr['dx'] = length
    tr['dEdx'] = rng.uniform(1.5, 20.0, n)
    tr['dE'] = tr['dEdx'] * tr['dx']
    tr['segment_id'] = np.arange(n)
    tr['traj_id'] = np.arange(n) // 2
    # t0 = event time (us); pre-drift segment times are 0
    tr['t0'] = tr['t0_start'] = tr['t0_end'] = 1.0
    return tr


def to_segments(tr):
    return seg_mod.from_structured(tr)


@pytest.fixture(scope='module')
def golden_tracks(ref):
    return make_tracks(ref.det.TPC_BORDERS)


# ---------------------------------------------------------------------------
# stage fixtures: run the reference chain once, share across tests
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def ref_drifted(ref, golden_tracks):
    """Reference quench+drift output (BOX mode)."""
    tr = golden_tracks.copy()
    n = len(tr)
    ref.quenching.quench[1, n](tr, ref.phys.BOX)
    ref.drifting.drift[1, n](tr)
    return tr


@pytest.fixture(scope='module')
def my_drifted(det_model, golden_tracks):
    segs = to_segments(golden_tracks)
    segs = quench(segs, det_model.params, physics.BOX)
    return drift(segs, det_model.params)


class TestQuenchGolden:
    @pytest.mark.parametrize('mode_name', ['BOX', 'BIRKS'])
    def test_quench(self, ref, det_model, golden_tracks, mode_name):
        tr = golden_tracks.copy()
        n = len(tr)
        ref.quenching.quench[1, n](tr, getattr(ref.phys, mode_name))
        segs = quench(to_segments(golden_tracks), det_model.params,
                      getattr(physics, mode_name))
        np.testing.assert_allclose(np.asarray(segs.n_electrons),
                                   tr['n_electrons'], rtol=2e-5)
        np.testing.assert_allclose(np.asarray(segs.n_photons),
                                   tr['n_photons'], rtol=2e-5)


class TestDriftGolden:
    def test_drift_fields(self, ref_drifted, my_drifted):
        mine = my_drifted
        for field, rtol in [('n_electrons', 2e-5), ('long_diff', 1e-5),
                            ('tran_diff', 1e-5), ('t', 1e-5),
                            ('t_start', 1e-5), ('t_end', 1e-5),
                            ('z', 1e-6)]:
            np.testing.assert_allclose(
                np.asarray(getattr(mine, field)), ref_drifted[field],
                rtol=rtol, err_msg=field)

    def test_plane_assignment(self, ref_drifted, my_drifted):
        np.testing.assert_array_equal(np.asarray(my_drifted.pixel_plane),
                                      ref_drifted['pixel_plane'])


# ---------------------------------------------------------------------------
# pixelization
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def ref_pixels(ref, ref_drifted):
    """Reference max_pixels + get_pixels (radius matches the CLI formula
    cli/simulate_pixels.py:918)."""
    tr = ref_drifted
    n = len(tr)
    n_max = np.zeros(1, np.int64)
    ref.pft.max_pixels[1, n](tr, n_max)
    max_radius = int(np.ceil(tr['tran_diff'].max() * 5
                             / ref.det.PIXEL_PITCH))
    max_radius = max(max_radius, 1)
    max_active = int(n_max[0])
    mnb = int((2 * max_radius + 1) * max_active
              + (1 + 2 * max_radius) * max_radius * 2)
    active = np.full((n, max_active), -1, np.int64)
    neigh = np.full((n, mnb), -1, np.int64)
    radius_code = np.full((n, mnb), -1, np.int64)
    n_pixels_list = np.zeros(n, np.int64)
    ref.pft.get_pixels[1, n](tr, active, neigh, radius_code,
                             n_pixels_list, max_radius)
    return SimpleNamespace(active=active, neigh=neigh,
                           radius_code=radius_code, n_pix=n_pixels_list,
                           max_radius=max_radius, max_active=max_active)


@pytest.fixture(scope='module')
def my_pixels(det_model, my_drifted, ref_pixels):
    det = det_model.params
    segs = my_drifted
    seg_np = {k: np.asarray(getattr(segs, k)) for k in
              ('x_start', 'y_start', 'x_end', 'y_end', 'pixel_plane',
               'tran_diff')}
    max_active = charge_model.bucket(pixelize.max_active_pixels(
        seg_np, det, np.asarray(det.tpc_borders)), lo=8)
    radius = ref_pixels.max_radius
    max_nb = charge_model.bucket((2 * radius + 1) * max_active
                                 + (1 + 2 * radius) * radius * 2)
    pixels, dists, npix = pixelize.get_pixels(
        segs, det, max_active=max_active, radius=radius,
        max_neighboring=max_nb)
    return SimpleNamespace(pixels=np.asarray(pixels),
                           dists=np.asarray(dists),
                           npix=np.asarray(npix))


class TestPixelsGolden:
    def test_pixel_sets(self, ref_pixels, my_pixels):
        n = len(ref_pixels.n_pix)
        for i in range(n):
            ref_set = set(ref_pixels.neigh[i][ref_pixels.neigh[i] >= 0])
            my_set = set(my_pixels.pixels[i][my_pixels.pixels[i] >= 0])
            assert my_set == ref_set, f'segment {i}'

    def test_counts(self, ref_pixels, my_pixels):
        np.testing.assert_array_equal(my_pixels.npix, ref_pixels.n_pix)

    def test_distance_codes(self, ref_pixels, my_pixels):
        """The quantized backtrack distance code per pixel
        (pixels_from_track.py:248-268) matches."""
        n = len(ref_pixels.n_pix)
        for i in range(n):
            ref_map = {p: c for p, c in
                       zip(ref_pixels.neigh[i], ref_pixels.radius_code[i])
                       if p >= 0}
            my_map = {p: c for p, c in
                      zip(my_pixels.pixels[i], my_pixels.dists[i])
                      if p >= 0}
            assert my_map == ref_map, f'segment {i}'


# ---------------------------------------------------------------------------
# induced current (the hot kernel): reference tracks_current_mc with the
# null RNG == deterministic midpoint sampling == our mc_smear=False path
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def ref_current(ref, ref_drifted, ref_pixels, response):
    tr = ref_drifted
    n = len(tr)
    track_starts = np.zeros(n)
    max_length = np.zeros(1, np.int64)
    ref.detsim.time_intervals[1, n](track_starts, max_length, tr)
    T = int(max_length[0])
    P = ref_pixels.neigh.shape[1]
    signals = np.zeros((n, P, T), np.float32)
    rng_states = np.zeros(n * P, np.uint64)
    ref.detsim.tracks_current_mc[(n, P, T), (1, 1, 1)](
        signals, ref_pixels.neigh, tr, response, rng_states)
    return SimpleNamespace(signals=signals, track_starts=track_starts, T=T)


@pytest.fixture(scope='module')
def my_current(det_model, my_drifted, ref_pixels, ref_current, response):
    """Our XLA current op on the REFERENCE's pixel lists (isolates the
    sampling/LUT math from pixelization)."""
    det = det_model.params
    pix = jnp.asarray(ref_pixels.neigh)
    px, py = charge_model.pixel_centers(jnp.maximum(pix, 0), det)
    valid = pix >= 0
    # the drifted t_start here exceeds padding, so the clamped window
    # starts exactly at the reference's t_start (no tick shift)
    shift = np.asarray(current.window_clamp_shift(my_drifted, det))
    np.testing.assert_array_equal(shift, 0.0)
    sig = current.current(
        my_drifted, px, py, valid, jnp.asarray(response), det,
        jax.random.PRNGKey(0), n_steps=512, t_sig=ref_current.T,
        mc_smear=False)
    return np.asarray(sig)


class TestCurrentGolden:
    def test_waveforms(self, ref_current, my_current):
        ref_sig = ref_current.signals
        scale = ref_sig.max()
        assert scale > 0
        np.testing.assert_allclose(my_current, ref_sig, rtol=2e-3,
                                   atol=scale * 2e-5)

    def test_per_pixel_charge(self, ref_current, my_current):
        # rtol bounded by f32 accumulation (ours) vs f64 (python ref)
        np.testing.assert_allclose(my_current.sum(axis=2),
                                   ref_current.signals.sum(axis=2),
                                   rtol=5e-3, atol=1e-6)


# ---------------------------------------------------------------------------
# scatter/accumulate: reference sum_pixel_signals + get_track_pixel_map2
# vs accumulate.{unique_pixels,pixel_index_map,track_pixel_map,
# sum_pixel_signals}, both on the REFERENCE's signals tensor
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def ref_summed(ref, ref_drifted, ref_pixels, ref_current):
    neigh = ref_pixels.neigh
    n, P = neigh.shape
    unique_pix = np.unique(neigh[neigh >= 0])
    U = len(unique_pix)
    # pixel_index_map: CLI host loop (cli/simulate_pixels.py:1019-1026)
    pixel_index_map = np.full((n, P), -1, np.int64)
    for i in range(n):
        compare = neigh[i][:, None] == unique_pix
        idx = np.where(compare)
        pixel_index_map[i, idx[0]] = idx[1]
    K = ref.sim.MAX_TRACKS_PER_PIXEL
    track_pixel_map = np.full((U, K), -1, np.int64)
    ref.detsim.get_track_pixel_map2[1, U](
        track_pixel_map, unique_pix, neigh, ref_pixels.radius_code,
        int(ref_pixels.radius_code.max()) + 1)
    T_full = len(ref.det.TIME_TICKS)
    pixels_signals = np.zeros((U, T_full))
    pixels_tracks_signals = np.zeros((U, T_full, K))
    overflow = np.zeros(U)
    ref.detsim.sum_pixel_signals[(n, P, ref_current.T), (1, 1, 1)](
        pixels_signals, ref_current.signals, ref_current.track_starts,
        pixel_index_map, track_pixel_map, pixels_tracks_signals, overflow)
    assert not overflow.any()
    return SimpleNamespace(unique_pix=unique_pix,
                           pixels_signals=pixels_signals,
                           pixels_tracks_signals=pixels_tracks_signals,
                           track_pixel_map=track_pixel_map, K=K,
                           T_full=T_full)


@pytest.fixture(scope='module')
def my_summed(det_model, my_drifted, ref_pixels, ref_current, ref_summed):
    det = det_model.params
    pix = jnp.asarray(ref_pixels.neigh)
    U = len(ref_summed.unique_pix)
    n_unique_cap = charge_model.bucket(U, lo=32)
    uniq, n_unique = accumulate.unique_pixels(pix, n_unique_cap)
    pix_idx = accumulate.pixel_index_map(pix, uniq)
    track_map, slot, overflow = accumulate.track_pixel_map(
        pix_idx, jnp.asarray(ref_pixels.radius_code), n_unique_cap,
        max_tracks=ref_summed.K)
    track_starts, _ = pixelize.time_intervals(my_drifted, det)
    waveforms = accumulate.sum_pixel_signals(
        jnp.asarray(ref_current.signals), pix_idx, track_starts,
        n_unique_cap, n_ticks=det.time_ticks,
        time_sampling=float(det.time_sampling))
    return SimpleNamespace(uniq=np.asarray(uniq),
                           n_unique=int(n_unique),
                           pix_idx=pix_idx, slot=slot,
                           track_map=np.asarray(track_map),
                           track_starts=track_starts,
                           waveforms=np.asarray(waveforms),
                           n_unique_cap=n_unique_cap)


class TestAccumulateGolden:
    def test_unique_pixels(self, ref_summed, my_summed):
        U = len(ref_summed.unique_pix)
        assert my_summed.n_unique == U
        np.testing.assert_array_equal(my_summed.uniq[:U],
                                      ref_summed.unique_pix)

    def test_track_starts(self, ref_current, my_summed):
        np.testing.assert_allclose(np.asarray(my_summed.track_starts),
                                   ref_current.track_starts, rtol=1e-6)

    def test_pixel_waveforms(self, ref_summed, my_summed):
        U = len(ref_summed.unique_pix)
        T = ref_summed.T_full
        assert my_summed.waveforms.shape[1] >= T
        scale = ref_summed.pixels_signals.max()
        np.testing.assert_allclose(my_summed.waveforms[:U, :T],
                                   ref_summed.pixels_signals,
                                   rtol=1e-4, atol=scale * 1e-6)

    def test_track_pixel_sets(self, ref_summed, my_summed):
        """Same set of contributing segments per pixel (slot order is an
        insertion artifact in the reference, rank order in ours)."""
        U = len(ref_summed.unique_pix)
        for u in range(U):
            ref_set = set(ref_summed.track_pixel_map[u]
                          [ref_summed.track_pixel_map[u] >= 0])
            my_set = set(my_summed.track_map[u][my_summed.track_map[u] >= 0])
            assert my_set == ref_set, f'pixel row {u}'


# ---------------------------------------------------------------------------
# FEE self-trigger: the reference kernel (null RNG) vs our scan FSM, both
# on the REFERENCE's per-pixel waveforms
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def ref_adc(ref, ref_summed):
    U = len(ref_summed.unique_pix)
    T_full = ref_summed.T_full
    time_ticks = np.linspace(0, ref.det.TIME_INTERVAL[1], T_full + 1)
    max_adc = ref.sim.MAX_ADC_VALUES
    integral_list = np.zeros((U, max_adc))
    adc_ticks_list = np.zeros((U, max_adc))
    fractions = np.zeros((U, max_adc, ref_summed.K))
    rng_states = np.zeros(U, np.uint64)
    thresholds = np.full(U, ref.det.DISCRIMINATION_THRESHOLD)
    ref.fee.get_adc_values[1, U](
        ref_summed.pixels_signals, ref_summed.pixels_tracks_signals,
        time_ticks, integral_list, adc_ticks_list, 0, rng_states,
        fractions, thresholds)
    adc = ref.fee.digitize(integral_list)
    return SimpleNamespace(integrals=integral_list, ticks=adc_ticks_list,
                           fractions=fractions, adc=np.asarray(adc),
                           time_ticks=time_ticks, max_adc=max_adc)


@pytest.fixture(scope='module')
def my_adc(det_model, ref_summed, my_summed, ref_current, ref_adc):
    det = det_model.params.replace(
        reset_noise_charge=jnp.float32(0),
        uncorrelated_noise_charge=jnp.float32(0),
        discriminator_noise=jnp.float32(0))
    U_cap = my_summed.waveforms.shape[0]
    T_full = ref_summed.T_full
    tick_times = jnp.linspace(0, det.time_interval[1], T_full + 1)
    thresholds = jnp.full((U_cap,), det.discrimination_threshold * 1.0)
    n_scan = T_full + det.integrate_ticks + det.busy_ticks + 4
    wf = jnp.asarray(my_summed.waveforms[:, :T_full], jnp.float32)
    res = fee.get_adc_values(
        wf, tick_times, thresholds, det, jax.random.PRNGKey(0),
        max_adc=ref_adc.max_adc, n_scan=n_scan)
    fractions = fee.current_fractions(
        jnp.asarray(ref_current.signals), my_summed.pix_idx,
        my_summed.slot, my_summed.track_starts, res, det,
        max_adc=ref_adc.max_adc, max_tracks=ref_summed.K)
    adc = fee.digitize(res.integrals, det)
    return SimpleNamespace(res=res, fractions=np.asarray(fractions),
                           adc=np.asarray(adc))


class TestFeeGolden:
    def test_hit_counts(self, ref_summed, ref_adc, my_adc):
        U = len(ref_summed.unique_pix)
        ref_counts = (ref_adc.integrals > 0).sum(axis=1)
        got = np.asarray(my_adc.res.n_adc)[:U]
        np.testing.assert_array_equal(got, ref_counts)
        assert ref_counts.sum() > 0, 'golden input produced no hits'

    def test_integrals(self, ref_summed, ref_adc, my_adc):
        U = len(ref_summed.unique_pix)
        np.testing.assert_allclose(
            np.asarray(my_adc.res.integrals)[:U],
            ref_adc.integrals, rtol=1e-4, atol=1e-2)

    def test_ticks(self, ref_summed, ref_adc, my_adc):
        U = len(ref_summed.unique_pix)
        np.testing.assert_allclose(np.asarray(my_adc.res.ticks)[:U],
                                   ref_adc.ticks, rtol=1e-6, atol=1e-3)

    def test_adc_counts(self, ref_summed, ref_adc, my_adc):
        U = len(ref_summed.unique_pix)
        np.testing.assert_array_equal(my_adc.adc[:U], ref_adc.adc)

    def test_fractions(self, ref_summed, my_summed, ref_adc, my_adc):
        """Per-(pixel, hit, segment) backtracking fractions agree.  Ours
        are slot-indexed by rank order; compare keyed by segment index."""
        U = len(ref_summed.unique_pix)
        slot_np = np.asarray(my_summed.slot)
        for u in range(U):
            for h in range((ref_adc.integrals[u] > 0).sum()):
                ref_by_seg = {}
                for k, seg in enumerate(ref_summed.track_pixel_map[u]):
                    if seg >= 0 and ref_adc.fractions[u, h, k] != 0:
                        ref_by_seg[int(seg)] = ref_adc.fractions[u, h, k]
                my_by_seg = {}
                for k, seg in enumerate(my_summed.track_map[u]):
                    if seg >= 0 and my_adc.fractions[u, h, k] != 0:
                        my_by_seg[int(seg)] = my_adc.fractions[u, h, k]
                assert set(my_by_seg) == set(ref_by_seg), f'pixel {u} hit {h}'
                for seg, frac in ref_by_seg.items():
                    assert my_by_seg[seg] == pytest.approx(frac, rel=1e-3), \
                        f'pixel {u} hit {h} segment {seg}'


# ---------------------------------------------------------------------------
# packet-stream export: reference fee.export_to_hdf5 (running through the
# larpix serialization shim) vs io/export.export_to_hdf5, field-by-field —
# including multi-PPS clock-rollover semantics (fee.py:163-183)
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def export_case(ref, ref_summed):
    """Synthetic 3-event hit set spanning several PPS seconds."""
    rng = np.random.default_rng(3)
    # the reference pads service rows to MAX_TRACKS_PER_PIXEL (fee.py:196),
    # so the fractions width must equal it
    K = ref.sim.MAX_TRACKS_PER_PIXEL
    max_adc = 5
    rows = 6
    unique_pix = ref_summed.unique_pix[:rows].copy()  # valid mapped pixels
    n_hits_per_row = [2, 1, 3, 1, 2, 1]
    adc = np.zeros((rows, max_adc))
    ticks = np.zeros((rows, max_adc))
    t = 10.0
    for r in range(rows):
        for h in range(n_hits_per_row[r]):
            adc[r, h] = int(rng.integers(100, 220))
            ticks[r, h] = t
            t += 13.7
    event_per_row = np.array([0, 0, 1, 1, 2, 2])
    event_id_list = np.repeat(event_per_row[:, None], max_adc, axis=1)
    track_ids = np.full((rows, K), -1, np.int64)
    traj_ids = np.full((rows, K), -1, np.int64)
    fractions = np.zeros((rows, max_adc, K))
    for r in range(rows):
        track_ids[r, :3] = [r * 3, r * 3 + 1, r * 3 + 2]
        traj_ids[r, :3] = [r, r, r + 1]
        for h in range(n_hits_per_row[r]):
            fractions[r, h, :3] = rng.dirichlet(np.ones(3))
    # event times spanning multiple PPS resets (module0 reset period is
    # 1 s of 0.1 us cycles): exercises the rollover loop
    event_start_times = np.array([0.45e6, 2.31e6, 2.34e6])  # us
    return SimpleNamespace(unique_pix=unique_pix, adc=adc, ticks=ticks,
                           event_id_list=event_id_list,
                           event_per_row=event_per_row,
                           track_ids=track_ids, traj_ids=traj_ids,
                           fractions=fractions,
                           event_start_times=event_start_times,
                           K=K, max_adc=max_adc,
                           n_hits_per_row=n_hits_per_row)


@pytest.fixture(scope='module')
def exported_files(ref, det_model, sim_params, export_case, tmp_path_factory):
    from larndsim_tpu.io import export as my_export
    from larndsim_tpu.params import load_light
    tmp = tmp_path_factory.mktemp('golden_export')
    file_ref = str(tmp / 'ref.h5')
    file_my = str(tmp / 'mine.h5')
    c = export_case

    ref.fee.export_to_hdf5(
        c.event_id_list, c.adc, c.ticks, c.unique_pix, c.fractions,
        c.track_ids, c.traj_ids, file_ref, c.event_start_times)

    # compact form of the same hits, (row, slot) row-major
    hit_row, hit_adc, hit_ticks, hit_frac = [], [], [], []
    for r in range(len(c.unique_pix)):
        for h in range(c.n_hits_per_row[r]):
            hit_row.append(r)
            hit_adc.append(c.adc[r, h])
            hit_ticks.append(c.ticks[r, h])
            hit_frac.append(c.fractions[r, h])
    light = load_light(DETPROP)
    my_export.export_to_hdf5(
        c.event_per_row, np.array(hit_row), np.array(hit_adc),
        np.array(hit_ticks), np.array(hit_frac), c.unique_pix,
        c.track_ids, c.traj_ids, file_my, c.event_start_times,
        det_model, light, sim_params)
    return file_ref, file_my


class TestExportGolden:
    def test_packet_stream(self, exported_files):
        import h5py
        file_ref, file_my = exported_files
        with h5py.File(file_ref) as fr, h5py.File(file_my) as fm:
            pr = np.asarray(fr['packets'])
            pm = np.asarray(fm['packets'])
        assert len(pr) == len(pm)
        assert len(pr) > 0
        for field in pr.dtype.names:
            np.testing.assert_array_equal(pm[field], pr[field],
                                          err_msg=f'packets[{field}]')

    def test_mc_packets_assn(self, exported_files):
        import h5py
        file_ref, file_my = exported_files
        with h5py.File(file_ref) as fr, h5py.File(file_my) as fm:
            ar = np.asarray(fr['mc_packets_assn'])
            am = np.asarray(fm['mc_packets_assn'])
        assert len(ar) == len(am)
        np.testing.assert_array_equal(am['event_ids'], ar['event_ids'])
        # fraction-sorted association slots: compare the real contributors
        # (zero-fraction tail slots tie under an unstable sort in both
        # implementations, so their id order is arbitrary)
        live_r = ar['fraction'] > 0
        live_m = am['fraction'] > 0
        np.testing.assert_array_equal(live_m, live_r)
        np.testing.assert_allclose(am['fraction'][live_m],
                                   ar['fraction'][live_r], rtol=1e-12)
        np.testing.assert_array_equal(am['segment_ids'][live_m],
                                      ar['segment_ids'][live_r])
        live_r = ar['fraction_traj'] > 0
        live_m = am['fraction_traj'] > 0
        np.testing.assert_array_equal(live_m, live_r)
        # the reference aggregates per-trajectory fractions in float32
        # (fee.py:322); ours keeps float64
        np.testing.assert_allclose(am['fraction_traj'][live_m],
                                   ar['fraction_traj'][live_r], rtol=1e-6)
        np.testing.assert_array_equal(am['file_traj_ids'][live_m],
                                      ar['file_traj_ids'][live_r])

    def test_bad_channels_masking(self, ref, det_model, sim_params,
                                  export_case, exported_files,
                                  tmp_path_factory):
        """Bad-channel masking (fee.py:250-254): disabling the channel of
        the first data packet drops exactly its hits from both streams, and
        the streams stay field-identical."""
        import h5py
        import yaml as yaml_mod
        from larndsim_tpu.io import export as my_export
        from larndsim_tpu.params import load_light
        c = export_case
        with h5py.File(exported_files[1]) as fm:
            p0 = np.asarray(fm['packets'])
        d0 = p0[p0['packet_type'] == 0]
        key = '%i-%i-%i' % (d0['io_group'][0], d0['io_channel'][0],
                            d0['chip_id'][0])
        tmp = tmp_path_factory.mktemp('golden_badchan')
        bad_file = str(tmp / 'bad.yaml')
        with open(bad_file, 'w') as f:
            yaml_mod.safe_dump({key: [int(d0['channel_id'][0])]}, f)

        file_ref = str(tmp / 'ref.h5')
        file_my = str(tmp / 'mine.h5')
        ref.fee.export_to_hdf5(
            c.event_id_list, c.adc, c.ticks, c.unique_pix, c.fractions,
            c.track_ids, c.traj_ids, file_ref, c.event_start_times,
            bad_channels=bad_file)
        hit_row, hit_adc, hit_ticks, hit_frac = [], [], [], []
        for r in range(len(c.unique_pix)):
            for h in range(c.n_hits_per_row[r]):
                hit_row.append(r)
                hit_adc.append(c.adc[r, h])
                hit_ticks.append(c.ticks[r, h])
                hit_frac.append(c.fractions[r, h])
        light = load_light(DETPROP)
        my_export.export_to_hdf5(
            c.event_per_row, np.array(hit_row), np.array(hit_adc),
            np.array(hit_ticks), np.array(hit_frac), c.unique_pix,
            c.track_ids, c.traj_ids, file_my, c.event_start_times,
            det_model, light, sim_params, bad_channels=bad_file)
        with h5py.File(file_ref) as fr, h5py.File(file_my) as fm:
            pr = np.asarray(fr['packets'])
            pm = np.asarray(fm['packets'])
        assert len(pr) == len(pm)
        n_data = (pm['packet_type'] == 0).sum()
        assert 0 < n_data < len(d0)
        for field in pr.dtype.names:
            np.testing.assert_array_equal(pm[field], pr[field],
                                          err_msg=f'packets[{field}]')

    def test_rollover_progression(self, exported_files):
        """Timestamp-packet payloads and sync cadence across PPS resets:
        data timestamps stay within one reset period and the event-boundary
        timestamp payloads carry the raw event times in seconds."""
        import h5py
        file_ref, file_my = exported_files
        with h5py.File(file_my) as fm:
            p = np.asarray(fm['packets'])
        data = p[p['packet_type'] == 0]
        assert (data['timestamp'] < 10_000_000).all()
        ts = p[p['packet_type'] == 4]
        # event-boundary packets (2 io groups x 3 events) carry floor(t0_s)
        # = {0, 2, 2}; tick-group packets carry the adjusted row-0 payload
        assert set(ts['timestamp']) <= {0, 2}


# ---------------------------------------------------------------------------
# light incidence golden (lightLUT.py:16-139)
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def ref_light(ref):
    import larndsim.consts.light as light
    light.set_light_properties(DETPROP)
    import larndsim.lightLUT as lightLUT
    return SimpleNamespace(light=light, lightLUT=lightLUT)


class TestLightIncidenceGolden:
    """Runs the reference's lightLUT.calculate_light_incidence (via the
    CUDASIM shim) against ops/light.calculate_light_incidence on the same
    drifted tracks and the same synthetic structured LUT."""

    def test_incidence(self, ref, ref_light, det_model, ref_drifted,
                       my_drifted):
        from larndsim_tpu.assets.light_lut import make_light_lut
        from larndsim_tpu.ops import light as light_ops
        from larndsim_tpu.params import load_light

        rl = ref_light.light
        n_op = int(rl.N_OP_CHANNEL)
        n_tpc = int(np.asarray(ref.det.TPC_BORDERS).shape[0])
        lut = make_light_lut(vox_div=(14, 26, 8), n_det_tpc=n_op // n_tpc)

        n = len(ref_drifted)
        inc = np.zeros((n, n_op), dtype=[('segment_id', 'u4'),
                                         ('n_photons_det', 'f4'),
                                         ('t0_det', 'f4')])
        voxel = np.zeros((n, 3), 'i4')
        ref_light.lightLUT.calculate_light_incidence[1, n](
            ref_drifted, lut, inc, voxel)

        my_light = load_light(DETPROP, asset_root='/root/reference')
        lutw = light_ops.LightLUT.from_structured(lut)
        n_ph, t0_det, vox = light_ops.calculate_light_incidence(
            my_drifted, det_model.params, my_light, lutw.vis, lutw.t0,
            n_channels=n_op)
        n_ph, t0_det, vox = (np.asarray(n_ph), np.asarray(t0_det),
                             np.asarray(vox))

        np.testing.assert_array_equal(vox, voxel)
        scale = np.abs(inc['n_photons_det']).max()
        assert scale > 0, 'test must land photons on channels'
        np.testing.assert_allclose(n_ph / scale,
                                   inc['n_photons_det'] / scale,
                                   atol=2e-6)
        if int(rl.LIGHT_TRIG_MODE) == 0:
            # earliest-arrival time, only meaningful on visible channels
            seen = inc['n_photons_det'] > 0
            np.testing.assert_allclose(t0_det[seen], inc['t0_det'][seen],
                                       rtol=2e-6, atol=1e-5)


class TestSumLightSignalsGolden:
    """light_sim.sum_light_signals (light_sim.py:59-129) vs
    ops/light.sum_light_signals: photon time series per channel, both LUT
    time-smearing modes.  (Truth slots are compared elsewhere: this
    framework backtracks light truth through the contributor path, not
    per-tick slot tensors.)"""

    @pytest.fixture(scope='class')
    def staged(self, ref, ref_light, det_model):
        # t0 away from tick-boundary multiples: the reference compares
        # profile arrival times against tick edges with strict < / > in
        # f64; a boundary-exact t0 would let f32-vs-f64 crumbs flip bins
        tr = make_tracks(ref.det.TPC_BORDERS, n=6, seed=23)
        tr['t0'] = tr['t0_start'] = tr['t0_end'] = 1.0037
        n = len(tr)
        ref.quenching.quench[1, n](tr, ref.phys.BOX)
        ref.drifting.drift[1, n](tr)

        segs = to_segments(tr)
        segs = quench(segs, det_model.params, physics.BOX)
        segs = drift(segs, det_model.params)

        from larndsim_tpu.assets.light_lut import make_light_lut
        rl = ref_light.light
        n_op = int(rl.N_OP_CHANNEL)
        n_tpc = int(np.asarray(ref.det.TPC_BORDERS).shape[0])
        lut = make_light_lut(vox_div=(14, 26, 8), n_det_tpc=n_op // n_tpc)

        inc = np.zeros((n, n_op), dtype=[('segment_id', 'u4'),
                                         ('n_photons_det', 'f4'),
                                         ('t0_det', 'f4')])
        voxel = np.zeros((n, 3), 'i4')
        ref_light.lightLUT.calculate_light_incidence[1, n](
            tr, lut, inc, voxel)
        # channels from both TPCs
        op_sel = np.concatenate([np.arange(4), n_op // 2 + np.arange(4)])
        return tr, segs, lut, inc, voxel, op_sel

    @pytest.mark.parametrize('smearing', [True, False])
    def test_series(self, ref, ref_light, staged, smearing):
        from larndsim_tpu.ops import light as light_ops
        from larndsim_tpu.params import load_light

        tr, segs, lut, inc, voxel, op_sel = staged
        rl = ref_light.light
        ndet = len(op_sel)
        n = len(tr)
        n_ticks = 256
        start_time = 1.0
        maxtracks = 5

        series = np.zeros((ndet, n_ticks), 'f4')
        true_ids = np.full((ndet, n_ticks, maxtracks), -1, 'i8')
        true_ph = np.zeros((ndet, n_ticks, maxtracks), 'f4')
        sorted_idx = np.tile(np.arange(n), (ndet, 1))
        old = rl.ENABLE_LUT_SMEARING
        rl.ENABLE_LUT_SMEARING = smearing
        try:
            import larndsim.light_sim as ref_ls
            ref_ls.sum_light_signals[(ndet, n_ticks), (1, 1)](
                tr, voxel, tr['segment_id'], inc, op_sel, lut,
                start_time, series, true_ids, true_ph, sorted_idx,
                lut['time_dist'].shape[-1])
        finally:
            rl.ENABLE_LUT_SMEARING = old

        my_light = load_light(DETPROP, asset_root='/root/reference')
        lutw = light_ops.LightLUT.from_structured(lut)
        mine = np.asarray(light_ops.sum_light_signals(
            segs, jnp.asarray(voxel),
            jnp.asarray(inc['n_photons_det'][:, op_sel]),
            jnp.asarray(op_sel), lutw.time_dist, lutw.t0_avg,
            jnp.float32(start_time), my_light, n_ticks=n_ticks,
            lut_smearing=smearing))

        scale = np.abs(series).max()
        assert scale > 0, 'test must produce a nonzero series'
        np.testing.assert_allclose(mine / scale, series / scale, atol=3e-6)


# ---------------------------------------------------------------------------
# light triggers golden (light_sim.get_triggers, :380-477)
# ---------------------------------------------------------------------------

class _DevView(np.ndarray):
    """numpy view exposing cupy's .get() for the shim-executed reference."""

    def get(self):
        return np.asarray(self)


@pytest.fixture(scope='module')
def ref_ls(ref, ref_light):
    import larndsim.light_sim as ls
    return ls


@pytest.fixture(scope='module')
def my_light(det_model):
    from larndsim_tpu.params import load_light
    return load_light(DETPROP, asset_root='/root/reference')


def _pulse_signal(n_op, n_ticks, pulse_ticks, width=10, amp=-100.0):
    """Negative-going pulses (SiPM convention) on every channel."""
    sig = np.zeros((n_op, n_ticks), np.float64)
    for t in pulse_ticks:
        sig[:, t:t + width] = amp
    return sig


def _my_triggers(sig, thr, op_idx, i_subbatch, my_light, det_model,
                 device_scan):
    from larndsim_tpu.ops import light as light_ops
    return light_ops.get_triggers(
        sig, thr, op_idx, i_subbatch, my_light,
        det_model.module_to_tpcs, det_model.tpc_to_module,
        np.asarray(my_light.tpc_to_op_channel), device_scan=device_scan)


class TestTriggersGolden:
    """Runs the reference's get_triggers (host python over the cupy shim)
    against ops/light.get_triggers on identical signals, both trigger
    modes.  Pulses are placed on ADC-sample-block boundaries with
    amplitudes far from threshold so f32-vs-f64 block means cannot flip
    a comparison."""

    def _dims(self, ref_light):
        rl = ref_light.light
        n_op = int(rl.N_OP_CHANNEL)
        ngrp = n_op // int(rl.OP_CHANNEL_PER_TRIG)
        sf = round(rl.LIGHT_DIGIT_SAMPLE_SPACING / rl.LIGHT_TICK_SIZE)
        dt = math.ceil((rl.LIGHT_TRIG_WINDOW[1] + rl.LIGHT_TRIG_WINDOW[0])
                       / rl.LIGHT_TICK_SIZE)
        return n_op, ngrp, sf, dt

    def test_mode0_two_triggers(self, ref_light, ref_ls, det_model,
                                my_light):
        rl = ref_light.light
        n_op, ngrp, sf, dt = self._dims(ref_light)
        p0 = 50 * sf
        p1 = -(-(p0 + dt + 100 * sf) // sf) * sf     # next block boundary
        n_ticks = p1 + dt // 2
        sig = _pulse_signal(n_op, n_ticks, [p0, p1], width=sf)
        thr = np.full(ngrp, -10.0)
        op_idx = np.arange(n_op)

        old = rl.LIGHT_TRIG_MODE
        rl.LIGHT_TRIG_MODE = 0
        try:
            r_idx, r_op, r_type = ref_ls.get_triggers(
                sig.copy(), thr, op_idx.view(_DevView), 0)
        finally:
            rl.LIGHT_TRIG_MODE = old
        assert list(np.asarray(r_idx)) == [p0, p1]   # hand-computed

        lt = my_light.replace(light_trig_mode=0)
        for dev in (True, False):
            m_idx, m_op, m_type = _my_triggers(sig, thr, op_idx, 0, lt,
                                               det_model, dev)
            np.testing.assert_array_equal(m_idx, np.asarray(r_idx))
            np.testing.assert_array_equal(m_op, np.asarray(r_op))
            np.testing.assert_array_equal(m_type, np.asarray(r_type))

    def test_mode0_third_trigger_reference_quirk(self, ref_light, ref_ls,
                                                 det_model, my_light):
        """DOCUMENTED DEVIATION (PARITY.md): the reference's dead-time walk
        (light_sim.py:430-443) slices the *already-sliced* boolean by the
        ABSOLUTE trigger index (`module_above_thresh[next_idx+digit_ticks:]`
        where `next_idx` includes `last_trigger`), so from the third
        trigger on it over-advances by the accumulated offset — dropping
        (or mislabeling) real triggers.  This build's walk keeps the
        intended semantics: a trigger at every above-threshold sample
        after `digit_ticks` of dead time.  This test pins BOTH behaviors
        so drift on either side is caught."""
        rl = ref_light.light
        n_op, ngrp, sf, dt = self._dims(ref_light)
        p0 = 50 * sf
        p1 = -(-(p0 + dt + 100 * sf) // sf) * sf
        p2 = -(-(p1 + dt + 100 * sf) // sf) * sf
        n_ticks = p2 + dt // 2
        sig = _pulse_signal(n_op, n_ticks, [p0, p1, p2], width=sf)
        thr = np.full(ngrp, -10.0)
        op_idx = np.arange(n_op)

        old = rl.LIGHT_TRIG_MODE
        rl.LIGHT_TRIG_MODE = 0
        try:
            r_idx, _, _ = ref_ls.get_triggers(
                sig.copy(), thr, op_idx.view(_DevView), 0)
        finally:
            rl.LIGHT_TRIG_MODE = old
        # reference: p2 falls before the over-advanced slice offset
        # (p0 + p1 + 2*dt) and is silently dropped
        assert list(np.asarray(r_idx)) == [p0, p1]

        lt = my_light.replace(light_trig_mode=0)
        for dev in (True, False):
            m_idx, _, _ = _my_triggers(sig, thr, op_idx, 0, lt,
                                       det_model, dev)
            assert list(np.asarray(m_idx)) == [p0, p1, p2]

    def test_mode1_beam(self, ref_light, ref_ls, det_model, my_light):
        rl = ref_light.light
        n_op, ngrp, sf, dt = self._dims(ref_light)
        sig = _pulse_signal(n_op, 4 * sf, [sf], width=sf)
        thr = np.full(ngrp, -10.0)
        op_idx = np.arange(n_op)

        old = rl.LIGHT_TRIG_MODE
        rl.LIGHT_TRIG_MODE = 1
        try:
            r0 = ref_ls.get_triggers(sig.copy(), thr,
                                     op_idx.view(_DevView), 0)
            r1 = ref_ls.get_triggers(sig.copy(), thr,
                                     op_idx.view(_DevView), 1)
        finally:
            rl.LIGHT_TRIG_MODE = old

        lt = my_light.replace(light_trig_mode=1)
        for i_sub, r in ((0, r0), (1, r1)):
            m_idx, m_op, m_type = _my_triggers(sig, thr, op_idx, i_sub,
                                               lt, det_model, True)
            np.testing.assert_array_equal(m_idx, np.asarray(r[0]))
            np.testing.assert_array_equal(
                np.atleast_2d(m_op) if m_op.size else m_op.reshape(0, n_op),
                np.asarray(r[1]))
            np.testing.assert_array_equal(m_type, np.asarray(r[2]))


# ---------------------------------------------------------------------------
# light export golden (light_sim.py:621-781): same inputs through the
# reference's host export functions and this build's, datasets compared
# field-exactly
# ---------------------------------------------------------------------------

class TestLightExportGolden:

    def test_light_trig_dataset(self, tmp_path, ref_light, ref_ls,
                                det_model, my_light):
        import h5py
        from larndsim_tpu.io import export as my_export

        n_op = int(ref_light.light.N_OP_CHANNEL)
        event_id = np.array([0, 0, 1])
        start_times = np.array([3.5, 3.5, 17.25])
        trigger_idx = np.array([5, 2700, 12])
        op_ch = np.tile(np.arange(n_op), (3, 1))
        event_times = np.array([1.2e6, 2.4e6])

        f_ref = str(tmp_path / 'ref.h5')
        f_my = str(tmp_path / 'my.h5')
        ref_ls.export_light_trig_to_hdf5(event_id, start_times, trigger_idx,
                                         op_ch, f_ref, event_times)
        my_export.export_light_trig_to_hdf5(event_id, start_times,
                                            trigger_idx, op_ch, f_my,
                                            event_times, det_model, my_light)
        with h5py.File(f_ref) as fr, h5py.File(f_my) as fm:
            r, m = fr['light_trig'][:], fm['light_trig'][:]
        assert r.dtype == m.dtype
        np.testing.assert_array_equal(m['op_channel'], r['op_channel'])
        np.testing.assert_array_equal(m['ts_sync'], r['ts_sync'])
        np.testing.assert_allclose(m['ts_s'], r['ts_s'], rtol=1e-12)

    def test_light_wvfm_mod2mod_merge(self, tmp_path, ref, ref_light,
                                      ref_ls, det_model, my_light):
        """mod2mod per-module wvfm datasets + channel-axis merge
        (light_sim.py:683-693, :766-781), exercised with two synthetic
        modules on both sides."""
        import h5py
        from larndsim_tpu.io import export as my_export

        rng = np.random.default_rng(3)
        wv = {1: rng.normal(size=(2, 4, 8)), 2: rng.normal(size=(2, 4, 8))}
        event_id = np.array([0, 1])
        no_ids = np.full((2, 4, 8, 1), -1)
        no_ph = np.zeros((2, 4, 8, 1))

        f_ref = str(tmp_path / 'ref_wvfm.h5')
        f_my = str(tmp_path / 'my_wvfm.h5')

        rsim, rl, rdet = ref.sim, ref_light.light, ref.det
        # MOD2MOD_VARIATION has no consts default: the reference CLI
        # assigns it directly (cli/simulate_pixels.py:456)
        old = (getattr(rsim, 'MOD2MOD_VARIATION', None), rl.LIGHT_TRIG_MODE,
               rsim.MAX_MC_TRUTH_IDS, rdet.MOD_IDS)
        rsim.MOD2MOD_VARIATION, rl.LIGHT_TRIG_MODE = True, 1
        rsim.MAX_MC_TRUTH_IDS = 0
        rdet.MOD_IDS = [1, 2]
        try:
            for i_mod in (1, 2):
                ref_ls.export_light_wvfm_to_hdf5(
                    event_id, wv[i_mod], f_ref, no_ids, no_ph, 0,
                    i_mod=i_mod)
            ref_ls.merge_module_light_wvfm_same_trigger(f_ref)
        finally:
            (rsim.MOD2MOD_VARIATION, rl.LIGHT_TRIG_MODE,
             rsim.MAX_MC_TRUTH_IDS, rdet.MOD_IDS) = old

        import dataclasses
        my_sim = dataclasses.replace(load_sim(SIMPROP),
                                     mod2mod_variation=True)
        lt = my_light.replace(light_trig_mode=1)
        for i_mod in (1, 2):
            my_export.export_light_wvfm_to_hdf5(event_id, wv[i_mod], f_my,
                                                my_sim, lt, i_mod=i_mod)
        my_export.merge_module_light_wvfm_same_trigger(
            f_my, SimpleNamespace(mod_ids=[1, 2]))

        with h5py.File(f_ref) as fr, h5py.File(f_my) as fm:
            np.testing.assert_array_equal(fm['light_wvfm'][:],
                                          fr['light_wvfm'][:])

    def test_zero_suppress_records(self, ref_light, ref_ls):
        """Truth-record emission order + field semantics vs the reference's
        zero_suppress_waveform_truth (light_sim.py:621-661) on inputs
        expressible in both truth layouts (this build backtracks through
        per-channel contributor slots; the reference through dense
        per-tick id tensors).  Threshold staging itself is compared in
        test_truth_staging; here the reference's kept set is mirrored
        exactly so emission must match record-for-record."""
        from larndsim_tpu.io import export as my_export

        rl = ref_light.light
        op_channel = np.asarray(rl.TPC_TO_OP_CHANNEL)[:].ravel()
        C, S, K = len(op_channel), 5, 3
        rng = np.random.default_rng(11)
        thr = 0.1

        ids_ck = np.full((C, K), -1, np.int64)
        tw = np.zeros((1, C, S, K))
        filled = rng.choice(C * K, size=24, replace=False)
        for f in filled:
            c, k = divmod(int(f), K)
            ids_ck[c, k] = rng.integers(0, 10)
            ticks = rng.choice(S, size=rng.integers(1, S), replace=False)
            tw[0, c, ticks, k] = rng.uniform(0.5, 3.0, size=len(ticks)) \
                * rng.choice([-1.0, 1.0])

        keep = np.abs(tw) > thr
        ref_ids = np.where(keep, np.broadcast_to(
            ids_ck[None, :, None, :], tw.shape), -1)
        ref_out = ref_ls.zero_suppress_waveform_truth(
            ref_ids, np.where(keep, tw, 0.0), 7, 3, i_mod=-1)

        my_out = my_export.zero_suppress_waveform_truth(
            ids_ck, tw, 7, 3, op_channel, thr)

        assert my_out.dtype == ref_out.dtype
        assert len(my_out) == len(ref_out) > 0
        for field in ref_out.dtype.names:
            np.testing.assert_array_equal(my_out[field], ref_out[field],
                                          err_msg=field)


class TestServicePacketsGolden:
    """fee.export_sync_to_hdf5 / export_timestamp_trigger_to_hdf5
    (fee.py:361-497) vs io/export on identical inputs: packet words and
    the null mc_packets_assn rows, field-exact."""

    def _compare(self, f_ref, f_my):
        import h5py
        with h5py.File(f_ref) as fr, h5py.File(f_my) as fm:
            pr, pm = np.asarray(fr['packets']), np.asarray(fm['packets'])
            ar = np.asarray(fr['mc_packets_assn'])
            am = np.asarray(fm['mc_packets_assn'])
        assert len(pr) == len(pm) > 0
        for field in pr.dtype.names:
            np.testing.assert_array_equal(pm[field], pr[field],
                                          err_msg=f'packets[{field}]')
        assert len(ar) == len(am)
        for field in ar.dtype.names:
            np.testing.assert_array_equal(am[field], ar[field],
                                          err_msg=f'assn[{field}]')

    def test_sync_packets(self, tmp_path, ref, det_model, sim_params):
        from larndsim_tpu.io import export as my_export
        # module0 reset period = 1 s of 0.1 us ticks; three PPS edges
        sync_times = np.array([0.0, 1.0e6, 2.0e6])
        f_ref, f_my = str(tmp_path / 'ref.h5'), str(tmp_path / 'my.h5')
        ref.fee.export_sync_to_hdf5(f_ref, sync_times)
        my_export.export_sync_to_hdf5(f_my, sync_times, det_model,
                                      sim_params)
        self._compare(f_ref, f_my)

    def test_timestamp_trigger_packets(self, tmp_path, ref, det_model,
                                       sim_params, my_light):
        from larndsim_tpu.io import export as my_export
        event_start_times = np.array([0.45e6, 2.31e6, 2.34e6])
        f_ref, f_my = str(tmp_path / 'ref.h5'), str(tmp_path / 'my.h5')
        ref.fee.export_timestamp_trigger_to_hdf5(f_ref, event_start_times)
        my_export.export_timestamp_trigger_to_hdf5(
            f_my, event_start_times, det_model, my_light, sim_params)
        self._compare(f_ref, f_my)
