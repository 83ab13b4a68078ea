"""HDF5 export: LArPix packet stream + MC-truth backtracking + light data.

Vectorized reimplementation of the reference exporters
(fee.export_to_hdf5 fee.py:84-359, export_sync/timestamp_trigger
fee.py:361-497, light_sim.export_* light_sim.py:663-781).  The reference
builds one Python object per packet and resolves chip/channel/io-group via
dict lookups per hit; here the whole stream is assembled from dense index
tensors in a handful of numpy ops, preserving the reference's packet
ordering (event-boundary service packets -> per-timestamp-group timestamp
packet -> data packet).
"""
from __future__ import annotations

import logging
import os
import warnings

import h5py
import numpy as np
import yaml

from .. import units
from ..params.detector import DetectorModel
from ..params.light import LightParams
from ..params.sim import SimParams
from . import larpix_packets as lp

logger = logging.getLogger('export')


def get_trig_io(light: LightParams) -> int:
    """io_group receiving forwarded triggers (fee.get_trig_io, fee.py:30-38)."""
    return 2 if light.light_trig_mode == 0 else 1


# Host copies of scalar device leaves (cached, one pull per params object):
# per-leaf float() — and eager jnp math like fee.digitize — costs a device
# round trip each, which dominated the export phase on remote TPU hosts.
from ..params.detector import host_scalars as _host_consts


def _digitize_zero(det) -> float:
    """ADC count for zero integrated charge (fee.digitize on host floats)."""
    hc = _host_consts(det)
    v = hc['v_pedestal'] * units.mV - hc['v_cm'] * units.mV
    return min(round(max(v, 0.0) * det.adc_counts
                     / (hc['v_ref'] * units.mV - hc['v_cm'] * units.mV)),
               det.adc_counts - 1)


# --------------------------------------------------------------------------
# pixel id -> readout coordinates (dense)
# --------------------------------------------------------------------------

def pixel_readout_coords(pixel_ids: np.ndarray, det_model: DetectorModel):
    """Vectorized pixel id -> (io_group, io_channel, chip, channel, ok).

    Replaces the per-packet dict lookups at fee.py:147-157 and :227-247.
    """
    layout = det_model.layout
    nx, ny = layout.n_pixels
    nppt = layout.n_pixels_per_tile
    pix_x = pixel_ids % nx
    pix_y = (pixel_ids // nx) % ny
    plane = pixel_ids // (nx * ny)
    module_id = plane // 2 + 1

    tile_x = pix_x // nppt[0]
    tile_y = pix_y // nppt[1]
    anode_id = plane % 2
    tile_map = np.asarray(det_model.tile_map)  # (n_anode, ntx, nty)
    ok = ((anode_id >= 0) & (anode_id < tile_map.shape[0])
          & (tile_x < tile_map.shape[1]) & (tile_y < tile_map.shape[2]))
    tile_id = tile_map[np.clip(anode_id, 0, tile_map.shape[0] - 1),
                       np.clip(tile_x, 0, tile_map.shape[1] - 1),
                       np.clip(tile_y, 0, tile_map.shape[2] - 1)]

    in_x = pix_x % nppt[0]
    in_y = pix_y % nppt[1]
    chip = layout.chip_id_map[tile_id, in_x, in_y]
    channel = layout.channel_id_map[tile_id, in_x, in_y]
    io_group_local = layout.io_group_map[tile_id, in_x, in_y]
    io_channel = layout.io_channel_map[tile_id, in_x, in_y]

    # module io-group remap (fee.py:247)
    mod_keys = sorted(det_model.module_to_io_groups)
    io_lut = np.full((max(mod_keys) + 2,
                      max(len(v) for v in det_model.module_to_io_groups.values()) + 1),
                     -1, np.int32)
    for m, groups in det_model.module_to_io_groups.items():
        for i, g in enumerate(groups):
            io_lut[m, i + 1] = g
    mod_ok = (module_id >= 1) & (module_id <= max(mod_keys))
    ok &= mod_ok & (chip >= 0) & (io_group_local >= 1)
    safe_mod = np.clip(module_id, 1, max(mod_keys))
    safe_local = np.clip(io_group_local, 0, io_lut.shape[1] - 1)
    io_group = io_lut[safe_mod, safe_local]
    ok &= io_group >= 0
    return io_group, io_channel, chip, channel, ok


# --------------------------------------------------------------------------
# MC association helpers
# --------------------------------------------------------------------------

def _aggregate_traj_fractions(traj_ids: np.ndarray, fracs: np.ndarray):
    """Per-row: unique trajectory ids with summed fractions (fee.py:322-328).

    Args:
        traj_ids: (N, K) int, -1 padding.
        fracs: (N, K) float.

    Returns:
        (N, K) unique ids (-1 padded, ascending per row) and summed fractions.
    """
    N, K = traj_ids.shape
    if N == 0:
        return traj_ids.copy(), np.zeros_like(fracs)
    mask = traj_ids > -1
    big = np.int64(1) << 40
    keys = (np.arange(N)[:, None] * big
            + np.where(mask, traj_ids.astype(np.int64), big - 1))
    order = np.argsort(keys, axis=1, kind='stable')
    sk = np.take_along_axis(keys, order, axis=1)
    sf = np.take_along_axis(np.where(mask, fracs, 0.0), order, axis=1)
    st = np.take_along_axis(np.where(mask, traj_ids, -1), order, axis=1)

    flat_k = sk.reshape(-1)
    first = np.concatenate([[True], flat_k[1:] != flat_k[:-1]])
    group = np.cumsum(first) - 1
    sums = np.bincount(group, weights=sf.reshape(-1))
    # rank of each unique group within its row
    first2d = first.reshape(N, K)
    rank = np.cumsum(first2d, axis=1) - 1
    out_ids = np.full((N, K), -1, np.int64)
    out_fr = np.zeros((N, K))
    rows = np.repeat(np.arange(N), K).reshape(N, K)
    sel = first2d & (st >= 0)
    out_ids[rows[sel], rank[sel]] = st[sel]
    out_fr[rows[sel], rank[sel]] = sums[group.reshape(N, K)[sel]]
    return out_ids, out_fr


def _assn_dtype(store: int) -> np.dtype:
    return np.dtype([('event_ids', '(1,)i8'),
                     ('segment_ids', f'({store},)i8'),
                     ('fraction', f'({store},)f8'),
                     ('file_traj_ids', f'({store},)i8'),
                     ('fraction_traj', f'({store},)f8')])


def _pad_to(arr: np.ndarray, width: int, fill):
    if arr.shape[1] >= width:
        return arr[:, :width]
    return np.pad(arr, ((0, 0), (0, width - arr.shape[1])),
                  constant_values=fill)


def _append_dataset(f: h5py.File, name: str, data: np.ndarray):
    if data.shape[0] == 0:
        return
    if name not in f:
        maxshape = (None,) + data.shape[1:]
        f.create_dataset(name, data=data, maxshape=maxshape)
    else:
        n0 = f[name].shape[0]
        f[name].resize(n0 + data.shape[0], axis=0)
        f[name][n0:] = data


_BAD_CHANNELS_CACHE: dict = {}


def _packed_bad_channels(path, bad_channels_list: dict) -> np.ndarray:
    """Flatten the bad-channels YAML ('{io_group}-{io_channel}-{chip}' ->
    [channels], fee.py:250-254) into sorted packed int64 keys, cached per
    (file path, mtime, size) so a rewritten file is repacked."""
    try:
        st = os.stat(path)
        cache_key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        cache_key = path
    hit = _BAD_CHANNELS_CACHE.get(cache_key)
    if hit is not None:
        return hit
    keys = []
    for key, channels in bad_channels_list.items():
        g, c, ch = (int(x) for x in str(key).split('-'))
        for chan in channels or ():
            keys.append((((g << 16 | c) << 16 | ch) << 16) | int(chan))
    packed = np.sort(np.asarray(keys, np.int64))
    if len(_BAD_CHANNELS_CACHE) > 8:
        _BAD_CHANNELS_CACHE.clear()
    _BAD_CHANNELS_CACHE[cache_key] = packed
    return packed


# --------------------------------------------------------------------------
# charge export
# --------------------------------------------------------------------------

def export_to_hdf5(event_pix, hit_row, hit_adc, hit_ticks, hit_fractions,
                   unique_pix, track_ids, traj_ids, filename,
                   event_start_times, det_model: DetectorModel,
                   light: LightParams, sim: SimParams,
                   light_trigger_times=None, light_trigger_event_id=None,
                   light_trigger_modules=None, bad_channels=None,
                   i_mod: int = -1):
    """Write the LArPix packet stream + mc_packets_assn for one write batch.

    Semantics match fee.export_to_hdf5 (fee.py:84-359) with hits in
    *compact* form: ``event_pix``/``unique_pix``/``track_ids``/``traj_ids``
    are per pixel row; ``hit_row``/``hit_adc``/``hit_ticks``/
    ``hit_fractions`` are per latched hit, in (pixel-row, adc-slot)
    row-major order — the order the reference's dense np.nonzero flatten
    produced.  `track_ids`/`traj_ids` carry *global* segment / trajectory
    ids per (pixel, track-slot).
    """
    det = det_model.params
    clock = det.clock_cycle
    reset_period = det.clock_reset_period
    store = sim.association_count_to_store
    K = track_ids.shape[1]

    event_pix = np.asarray(event_pix)
    hit_row = np.asarray(hit_row)
    hit_adc = np.asarray(hit_adc)
    hit_ticks = np.asarray(hit_ticks)
    hit_fractions = np.asarray(hit_fractions)
    unique_pix = np.asarray(unique_pix)
    track_ids = np.asarray(track_ids)
    traj_ids = np.asarray(traj_ids)

    io_groups_all = np.unique(
        np.array(list(det_model.module_to_io_groups.values())))
    if i_mod >= 1:
        io_groups_all = io_groups_all[(i_mod - 1) * 2: i_mod * 2]

    bad_channels_list = None
    if bad_channels:
        with open(bad_channels) as bcf:
            bad_channels_list = yaml.safe_load(bcf)

    # --- per-pixel event times ---
    unique_events, unique_events_inv = np.unique(event_pix,
                                                 return_inverse=True)
    event_t0_ticks = (event_start_times[unique_events_inv]
                      / clock).astype(np.int64)

    light_trigger_times = (np.empty(0) if light_trigger_times is None
                           else np.asarray(light_trigger_times))
    light_trigger_event_id = (np.empty(0, int) if light_trigger_event_id is
                              None else np.asarray(light_trigger_event_id))
    light_trigger_modules = (np.empty(0) if light_trigger_modules is None
                             else np.asarray(light_trigger_modules))

    # --- filter hits above the digitized zero (order is already
    # (pixel-row, adc-slot) row-major) ---
    dig0 = _digitize_zero(det)
    above = hit_adc > dig0
    pix_row = hit_row[above]
    n_hits = pix_row.size

    if n_hits == 0:
        return

    pix_ids = unique_pix[pix_row]
    io_group, io_channel, chip, channel, ok = pixel_readout_coords(
        pix_ids, det_model)
    event = event_pix[pix_row]
    ev_t0 = event_t0_ticks[pix_row]
    t_us = hit_ticks[above]
    # Clock rollover (fee.py:163-183): per hit, the reference subtracts
    # CLOCK_RESET_PERIOD from `event_start_time_list[itick:]` until the
    # hit tick fits; with event times nondecreasing along the stream the
    # resulting data/sync/trigger timestamps equal a plain modulo, and the
    # only *observable* state is the cumulative rollover count (which
    # drives the tick-group timestamp payload below).  tt_raw // period
    # is the per-hit rollover demand; its running max is the reference's
    # sequential counter, vectorized.
    tt_raw = np.floor(t_us / clock + ev_t0).astype(np.int64)
    rollovers = np.maximum.accumulate(
        np.maximum(tt_raw // reset_period, 0))
    time_tick = tt_raw % reset_period
    ev_t0_mod = ev_t0 % reset_period

    if not ok.all():
        n_bad = int((~ok).sum())
        logger.warning('%d hits on unmapped pixels dropped', n_bad)

    # bad-channel masking (fee.py:250-254), vectorized: the YAML's
    # '{io_group}-{io_channel}-{chip}' -> [channels] map is flattened once
    # into packed (io_group, io_channel, chip, channel) int64 keys and the
    # per-hit test becomes one np.isin against the sorted pack
    if bad_channels_list:
        packed_bad = _packed_bad_channels(bad_channels, bad_channels_list)
        hit_keys = (((io_group.astype(np.int64) << 16 | io_channel) << 16
                     | chip) << 16) | channel
        ok &= ~np.isin(hit_keys, packed_bad)

    # --- service-packet schedule (per hit, in stream order) ---
    # event boundary: first hit of each event above the digitized zero —
    # NOT gated on channel mapping: the reference emits the event's
    # timestamp/sync/trigger packets before the chip lookup can `continue`
    # (fee.py:186-225 precede the KeyError/bad-channel drops :229-254)
    new_event = np.concatenate([[True], event[1:] != event[:-1]])
    # timestamp-group boundary: time_tick change *among surviving hits*
    # (last_time_tick only updates after the drop checks, fee.py:262)
    surv = np.nonzero(ok)[0]
    tick_surv = time_tick[surv]
    new_tick_surv = np.concatenate([[True],
                                    tick_surv[1:] != tick_surv[:-1]])

    assn_dtype = _assn_dtype(store)

    def service_assn(n, event_vals=-1):
        a = np.zeros(n, dtype=assn_dtype)
        a['event_ids'] = np.full((n, 1), event_vals)
        a['segment_ids'] = -1
        a['file_traj_ids'] = -1
        return a

    # the stream is assembled from vectorized blocks + (hit, priority)
    # sort keys; a final stable argsort interleaves them in the reference's
    # order: event-boundary service packets, timestamp-group packet, data
    parts, part_assn, part_keys = [], [], []

    def add(pkts, assn, hits, prio):
        parts.append(pkts)
        part_assn.append(assn)
        part_keys.append(np.stack([np.broadcast_to(hits, (len(pkts),)),
                                   np.full(len(pkts), prio)], axis=1)
                         if np.ndim(hits) == 0 else
                         np.stack([hits, np.full(len(pkts), prio)], axis=1))

    if light.light_trig_mode != 1:
        for h in np.nonzero(new_event)[0]:
            ev = event[h]
            pk = []
            for g in io_groups_all:
                tp = lp.make_timestamp_packets(
                    [event_start_times[unique_events_inv[pix_row[h]]]
                     * units.mus / units.s], io_group=g)
                sp = lp.make_sync_packets([time_tick[h]], g)
                pk += [tp, sp]
            trig_mask = light_trigger_event_id == ev
            if trig_mask.any():
                for t_trig, module_trig in zip(
                        light_trigger_times[trig_mask],
                        light_trigger_modules[trig_mask]):
                    t_trig_tick = int(np.floor(
                        t_trig / clock + ev_t0_mod[h])) % reset_period
                    if light.light_trig_mode == 0:
                        for g in det_model.module_to_io_groups[
                                int(module_trig)]:
                            pk.append(lp.make_trigger_packets(
                                [t_trig_tick], g))
            pkts = np.concatenate(pk)
            add(pkts, service_assn(len(pkts)), int(h), 0)

    # per-timestamp-group timestamp packet (fee.py:267): payload tracks
    # `event_start_time_list[0]` — the raw t0 of pixel row 0, decremented
    # by one reset period per rollover triggered while processing row 0's
    # hits (adjustments at later rows touch only slices [itick:], so [0]
    # freezes once the stream moves past row 0).
    tick_hits = surv[new_tick_surv]
    if len(tick_hits):
        if pix_row[0] == 0:
            row0_hits = np.nonzero(pix_row == 0)[0]
            last_row0 = row0_hits[-1]
            adj = rollovers[np.minimum(tick_hits, last_row0)]
        else:
            adj = np.zeros(len(tick_hits), np.int64)
        ts_payload = np.floor(
            (event_t0_ticks[0] - adj * reset_period).astype(np.float64)
            * clock * units.mus / units.s)
        tp = lp.make_timestamp_packets(ts_payload)
        tp['io_group'] = io_group[tick_hits]
        add(tp, service_assn(len(tick_hits)), tick_hits, 1)

    # --- data packets (vectorized) ---
    sel = np.nonzero(ok)[0]
    adc_above = hit_adc[above]
    data_pkts = lp.make_data_packets(
        io_group[sel], io_channel[sel], chip[sel], channel[sel],
        time_tick[sel], adc_above[sel])

    # --- data-packet associations ---
    fr = hit_fractions[above][sel]                            # (n, K)
    tid = track_ids[pix_row[sel]]                             # (n, K)
    trj = traj_ids[pix_row[sel]]
    order = np.flip(np.argsort(fr, axis=1), axis=1)
    fr_s = np.take_along_axis(fr, order, axis=1)
    tid_s = np.take_along_axis(tid, order, axis=1)
    trj_s = np.take_along_axis(trj, order, axis=1)
    uniq_trj, uniq_fr = _aggregate_traj_fractions(trj_s, fr_s)

    data_assn = np.zeros(len(sel), dtype=assn_dtype)
    data_assn['event_ids'] = event[sel][:, None]
    data_assn['segment_ids'] = _pad_to(tid_s, store, -1)
    data_assn['fraction'] = _pad_to(fr_s, store, 0.0)
    data_assn['file_traj_ids'] = _pad_to(uniq_trj, store, -1)
    data_assn['fraction_traj'] = _pad_to(uniq_fr, store, 0.0)
    add(data_pkts, data_assn, sel, 2)

    # --- assemble in stream order (one concat + one stable lexsort) ---
    keys = np.concatenate(part_keys)
    stream_order = np.lexsort((keys[:, 1], keys[:, 0]))
    packets = np.concatenate(parts)[stream_order]
    assn = np.concatenate(part_assn)[stream_order]

    lp.to_file(filename, packets)
    with h5py.File(filename, 'a') as f:
        _append_dataset(f, 'mc_packets_assn', assn)
        hc = _host_consts(det)
        f['configs'].attrs['vdrift'] = hc['v_drift']
        f['configs'].attrs['long_diff'] = hc['long_diff']
        f['configs'].attrs['tran_diff'] = hc['tran_diff']
        f['configs'].attrs['lifetime'] = hc['electron_lifetime']
        f['configs'].attrs['drift_length'] = det.drift_length


def export_sync_to_hdf5(filename, sync_times, det_model: DetectorModel,
                        sim: SimParams, i_mod: int = -1):
    """PPS sync packets (fee.export_sync_to_hdf5, fee.py:361-424)."""
    det = det_model.params
    io_groups = (det_model.module_to_io_groups[i_mod] if i_mod > 0 else
                 np.unique(np.array(
                     list(det_model.module_to_io_groups.values()))))
    sync_ticks = np.asarray(sync_times) / det.clock_cycle
    rounded = (sync_ticks // det.clock_reset_period
               * det.clock_reset_period)
    off = sync_ticks % det.clock_reset_period != 0
    if off.any():
        warnings.warn('The provided sync time is not a multiple of the '
                      'reset period!')
    sync_ticks = np.where(off, rounded, sync_ticks)
    pk = [lp.make_sync_packets([t], g) for t in sync_ticks for g in io_groups]
    if not pk:
        return
    packets = np.concatenate(pk)
    lp.to_file(filename, packets)
    a = np.zeros(len(packets), dtype=_assn_dtype(sim.association_count_to_store))
    a['event_ids'] = -1
    a['segment_ids'] = -1
    a['file_traj_ids'] = -1
    with h5py.File(filename, 'a') as f:
        _append_dataset(f, 'mc_packets_assn', a)


def export_timestamp_trigger_to_hdf5(filename, event_start_times,
                                     det_model: DetectorModel,
                                     light: LightParams, sim: SimParams,
                                     i_mod: int = -1):
    """Beam timestamp+trigger packets (fee.py:426-497)."""
    det = det_model.params
    io_group = get_trig_io(light)
    pk = []
    for evt_time in np.asarray(event_start_times):
        t_trig = int(np.floor(evt_time / det.clock_cycle)) \
            % det.clock_reset_period
        pk.append(lp.make_timestamp_packets(
            [evt_time * units.mus / units.s], io_group=io_group))
        pk.append(lp.make_trigger_packets([t_trig], io_group))
    if not pk:
        return
    packets = np.concatenate(pk)
    lp.to_file(filename, packets)
    a = np.zeros(len(packets), dtype=_assn_dtype(sim.association_count_to_store))
    a['event_ids'] = -1
    a['segment_ids'] = -1
    a['file_traj_ids'] = -1
    with h5py.File(filename, 'a') as f:
        _append_dataset(f, 'mc_packets_assn', a)


# --------------------------------------------------------------------------
# light export
# --------------------------------------------------------------------------

def export_light_trig_to_hdf5(event_id, start_times, trigger_idx,
                              op_channel_idx, filename, event_times,
                              det_model: DetectorModel, light: LightParams):
    """light_trig dataset (light_sim.export_light_trig_to_hdf5, :715-745)."""
    event_id = np.asarray(event_id)
    if event_id.shape[0] == 0:
        return
    det = det_model.params
    uniq, inv = np.unique(event_id, return_inverse=True)
    ev_start = np.asarray(event_times)[inv]
    ev_sync = (ev_start / det.clock_cycle).astype(np.int64) \
        % det.clock_reset_period

    op_channel_idx = np.atleast_2d(np.asarray(op_channel_idx))
    trig = np.empty(len(event_id), dtype=np.dtype(
        [('op_channel', 'i4', (op_channel_idx.shape[-1],)),
         ('ts_s', 'f8'), ('ts_sync', 'u8')]))
    trig['op_channel'] = op_channel_idx
    trig['ts_s'] = ((np.asarray(start_times) + np.asarray(trigger_idx)
                     * light.light_tick_size + ev_start)
                    * units.mus / units.s)
    trig['ts_sync'] = (((np.asarray(start_times) + np.asarray(trigger_idx)
                         * light.light_tick_size) / det.clock_cycle
                        + ev_sync).astype(np.int64) % det.clock_reset_period)
    with h5py.File(filename, 'a') as f:
        _append_dataset(f, 'light_trig', trig)


TRUTH_DTYPE = np.dtype([('trigger_id', 'i4'), ('op_channel_id', 'i4'),
                        ('tick', 'i4'), ('event_id', 'i4'),
                        ('segment_id', 'i8'), ('pe_current', 'f8')])


def zero_suppress_waveform_truth(truth_ids, truth_waveforms, event_id,
                                 i_trig, op_channel, threshold: float):
    """Flatten nonzero light-truth samples into the association records
    (light_sim.zero_suppress_waveform_truth, :621-661).

    Args:
        truth_ids: (C, K) segment ids per channel contributor.
        truth_waveforms: (ntrig, C, samples, K) true photocurrents.
        op_channel: (C,) absolute channel ids.
        threshold: minimum |pe_current| to store (sim.mc_truth_threshold).
    """
    ntrig, C, samples, K = truth_waveforms.shape
    ids = np.broadcast_to(truth_ids[None, :, None, :],
                          truth_waveforms.shape)
    keep = (ids >= 0) & (np.abs(truth_waveforms) > threshold)
    trig, chan, tick, k = np.nonzero(keep)
    out = np.empty(len(trig), dtype=TRUTH_DTYPE)
    out['trigger_id'] = i_trig + trig
    out['op_channel_id'] = np.asarray(op_channel)[chan]
    out['tick'] = tick
    out['event_id'] = event_id
    out['segment_id'] = ids[trig, chan, tick, k]
    out['pe_current'] = truth_waveforms[trig, chan, tick, k]
    return out


def truth_sparse_to_records(sparse: dict, event_id: int,
                            i_trig: int) -> np.ndarray:
    """Assemble light_wvfm_mc_assn records from device-sparsified truth."""
    n = len(sparse['trig'])
    out = np.empty(n, dtype=TRUTH_DTYPE)
    out['trigger_id'] = i_trig + sparse['trig']
    out['op_channel_id'] = sparse['op_channel']
    out['tick'] = sparse['tick']
    out['event_id'] = event_id
    out['segment_id'] = sparse['segment_id']
    out['pe_current'] = sparse['pe_current']
    return out


_TRUTH_CHUNK = 1 << 15          # records per chunk (1 MiB of TRUTH_DTYPE)
_H5LZF = None                   # lazily-loaded native compressor, or False


def _native_h5lzf():
    """ctypes handle to native/h5lzf.cpp, or None (pure-h5py fallback)."""
    global _H5LZF
    if _H5LZF is None:
        lib = None
        if os.environ.get('LARNDSIM_NATIVE_H5LZF', '1') != '0':
            import ctypes
            from ..native.build import load_library
            lib = load_library('h5lzf')
            if lib is not None:
                lib.shuffle_lzf_chunks.argtypes = [
                    ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
                    ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_void_p, ctypes.c_void_p]
                lib.shuffle_lzf_chunks.restype = None
        _H5LZF = lib if lib is not None else False
    return _H5LZF or None


def _append_direct_lzf(ds, new: np.ndarray, lib):
    """Append records to a shuffle+lzf chunked dataset by compressing the
    chunks natively and storing them with ``write_direct_chunk``.

    The file stays a perfectly ordinary HDF5 file: the dataset declares
    the standard shuffle (H5Z 2) + lzf (H5Z 32000) pipeline and every
    chunk holds a conformant LZF stream, so any h5py reader decompresses
    it transparently.  What changes is who runs the filters on *write*:
    the native one-pass encoder (~2.3x the h5py pipeline's MB/s on the
    bench host).  A trailing partial chunk is stored zero-padded to the
    full chunk size (extent covers only the real rows) and is re-stitched
    on the next append.
    """
    import ctypes
    chunk = ds.chunks[0]
    rec = ds.dtype.itemsize
    cb = chunk * rec
    n0 = ds.shape[0]
    ds.resize(n0 + len(new), axis=0)
    scratch = ctypes.create_string_buffer(cb)
    out = ctypes.create_string_buffer(cb)
    size1 = (ctypes.c_int32 * 1)()
    flag1 = (ctypes.c_uint8 * 1)()
    # shuffle filter is pipeline index 0, lzf index 1; a set bit skips
    # that filter for the chunk (we always shuffle, skip lzf when the
    # chunk is incompressible — same policy as the HDF5 pipeline)
    out_mv = memoryview(out)

    def _write_one(buf_ptr, chunk_idx):
        lib.shuffle_lzf_chunks(buf_ptr, 1, cb, rec, scratch, out,
                               size1, flag1)
        ds.id.write_direct_chunk((chunk_idx * chunk,),
                                 out_mv[:size1[0]],
                                 filter_mask=2 if flag1[0] else 0)

    pos = 0                      # consumed rows of `new`
    tail_n = n0 % chunk
    i_chunk = n0 // chunk
    if tail_n:
        # re-stitch the existing partial chunk with the head of `new`
        take = min(chunk - tail_n, len(new))
        stitched = np.zeros(chunk, ds.dtype)
        stitched[:tail_n] = ds[i_chunk * chunk: n0]
        stitched[tail_n:tail_n + take] = new[:take]
        _write_one(stitched.ctypes.data, i_chunk)
        pos = take
        i_chunk += 1
        if tail_n + take < chunk:        # new fit entirely in the tail
            return
    body = np.ascontiguousarray(new[pos:])
    n_full = len(body) // chunk
    if n_full:
        # compress full chunks in bounded slabs (keeps the scratch output
        # ~32 MiB regardless of append size)
        slab = 32
        sizes = (ctypes.c_int32 * slab)()
        flags = (ctypes.c_uint8 * slab)()
        outs = ctypes.create_string_buffer(slab * cb)
        for s0 in range(0, n_full, slab):
            k = min(slab, n_full - s0)
            lib.shuffle_lzf_chunks(body.ctypes.data + s0 * cb, k, cb, rec,
                                   scratch, outs, sizes, flags)
            mv = memoryview(outs)
            for j in range(k):
                data = mv[j * cb: j * cb + sizes[j]]
                mask = 2 if flags[j] else 0
                ds.id.write_direct_chunk(((i_chunk + s0 + j) * chunk,),
                                         data, filter_mask=mask)
    rest = len(body) - n_full * chunk
    if rest:
        padded = np.zeros(chunk, ds.dtype)
        padded[:rest] = body[n_full * chunk:]
        _write_one(padded.ctypes.data, i_chunk + n_full)


def export_light_truth_to_hdf5(filename, truth_data: np.ndarray,
                               compression: str = 'lzf'):
    """Append light_wvfm_mc_assn records.

    compression: 'lzf' (default) or 'none' (the reference creates
    light_wvfm_mc_assn with no filter, light_sim.py:710).  The truth
    dataset is the output's dominant volume (~300 MB/spill at production
    thresholds) and shuffle+lzf shrinks it >3x (small-int columns + f8
    pe_current with f32-zero mantissa tails) at ~0.7 s CPU per 128 MB.
    Measured end-to-end A/B on the bench host (4 interleaved reps each,
    2026-08): lzf 16-23 s/8 spills vs uncompressed 21-31 s — writing 3x
    the bytes costs MORE wall-clock than the compression CPU here (page
    cache absorbs the appends, but virtio writeback of the extra ~1.7 GB
    steals the single core), so lzf is also the performance default.
    h5py reads either transparently; the dtype/schema is unchanged."""
    if truth_data.shape[0] == 0:
        return
    lib = _native_h5lzf() if compression == 'lzf' else None
    with h5py.File(filename, 'a') as f:
        if 'light_wvfm_mc_assn' not in f:
            # production volume is ~10M rows/spill: h5py's auto-chunks are
            # KB-sized, which makes the append IO chunk-op bound.  32K
            # records = 1 MiB chunks: L2-resident for shuffle+lzf, ~20%
            # faster than 8 MiB chunks on the bench host (sweep 256K-32M,
            # 2026-08) with the same 5x ratio on production-shaped records
            kw = {} if compression in (None, 'none') \
                else dict(compression=compression, shuffle=True)
            f.create_dataset('light_wvfm_mc_assn',
                             shape=(0,), dtype=truth_data.dtype,
                             maxshape=(None,), chunks=(_TRUTH_CHUNK,), **kw)
        ds = f['light_wvfm_mc_assn']
        if lib is not None and ds.compression == 'lzf' and ds.shuffle:
            _append_direct_lzf(ds, truth_data, lib)
        else:
            _append_dataset(f, 'light_wvfm_mc_assn', truth_data)


def export_light_truth_chunks(filename, fused) -> None:
    """Store worker-precompressed truth chunks (models.light
    FusedTruthChunks): raw head records stitch the dataset's current
    partial chunk, the LZF'd full chunks go down via write_direct_chunk
    untouched, and raw tail records form the new partial.  The dataset is
    identical byte-for-byte to the unfused append path (same chunking,
    same filters, plain-h5py readable)."""
    if fused.total == 0:
        return
    lib = _native_h5lzf()
    if lib is None:
        raise RuntimeError('fused truth chunks require the native '
                           'compressor (enable gate should prevent this)')
    with h5py.File(filename, 'a') as f:
        if 'light_wvfm_mc_assn' not in f:
            f.create_dataset('light_wvfm_mc_assn',
                             shape=(0,), dtype=fused.head.dtype,
                             maxshape=(None,), chunks=(_TRUTH_CHUNK,),
                             compression='lzf', shuffle=True)
        ds = f['light_wvfm_mc_assn']
        # the worker compressed against this exact chunk grid + filter
        # pipeline; a pre-existing dataset from an older run (different
        # --truth_compression or chunk size) would silently store LZF
        # streams under the wrong filters and decode garbage on read
        if ds.chunks != (_TRUTH_CHUNK,) or ds.compression != 'lzf' \
                or not ds.shuffle:
            raise RuntimeError(
                'light_wvfm_mc_assn exists with an incompatible layout '
                f'(chunks={ds.chunks}, compression={ds.compression}, '
                f'shuffle={ds.shuffle}); fused truth chunks require '
                f'chunks=({_TRUTH_CHUNK},) shuffle+lzf')
        if ds.shape[0] != fused.start_offset:
            raise RuntimeError(
                f'truth ledger desync: dataset has {ds.shape[0]} rows, '
                f'worker compressed for offset {fused.start_offset}')
        if len(fused.head):
            _append_direct_lzf(ds, fused.head, lib)
        if fused.n_chunks:
            n0 = ds.shape[0]
            assert n0 % _TRUTH_CHUNK == 0, 'head did not align the chunk'
            ds.resize(n0 + fused.n_chunks * _TRUTH_CHUNK, axis=0)
            mv = memoryview(np.ascontiguousarray(fused.comp))
            stride = fused.comp_stride
            for j in range(fused.n_chunks):
                o = j * stride
                ds.id.write_direct_chunk(
                    (n0 + j * _TRUTH_CHUNK,),
                    mv[o:o + int(fused.sizes[j])],
                    filter_mask=2 if fused.flags[j] else 0)
        if len(fused.tail):
            _append_direct_lzf(ds, fused.tail, lib)


def export_light_wvfm_to_hdf5(event_id, waveforms, filename,
                              sim: SimParams, light: LightParams,
                              i_mod: int = -1):
    """light_wvfm dataset (light_sim.export_light_wvfm_to_hdf5, :663-713)."""
    event_id = np.asarray(event_id)
    if event_id.shape[0] == 0:
        return
    with h5py.File(filename, 'a') as f:
        if sim.mod2mod_variation and light.light_trig_mode == 1:
            if i_mod < 1:
                raise ValueError('mod2mod variation active but module id '
                                 'not provided')
            name = f'light_wvfm/light_wvfm_mod{i_mod - 1}'
        else:
            name = 'light_wvfm'
        if name not in f:
            f.create_dataset(name, data=waveforms,
                             maxshape=(None, None, None))
        else:
            n0 = f[name].shape[0]
            f[name].resize(n0 + waveforms.shape[0], axis=0)
            f[name][n0:] = waveforms


def merge_module_light_wvfm_same_trigger(filename, det_model: DetectorModel):
    """Concatenate per-module waveform datasets along the channel axis
    (light_sim.merge_module_light_wvfm_same_trigger, :766-781)."""
    with h5py.File(filename, 'a') as f:
        parts = []
        for i_mod in det_model.mod_ids:
            ds = f[f'light_wvfm/light_wvfm_mod{i_mod - 1}']
            if parts and ds.shape[0] != parts[0].shape[0]:
                raise ValueError('The number of triggers should be the same '
                                 'in each module with light trigger mode 1')
            parts.append(np.array(ds))
        merged = np.concatenate(parts, axis=1)
        del f['light_wvfm']
        f.create_dataset('light_wvfm', data=merged,
                         maxshape=(None, None, None))
