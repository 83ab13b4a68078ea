"""Per-pixel signal accumulation and track<->pixel association.

Replaces the reference's atomic scatter-adds and O(S*P) linear-search
association kernels (detsim.sum_pixel_signals detsim.py:468-527,
detsim.get_track_pixel_map2 detsim.py:564-607, and the host-side
pixel_index_map loop cli/simulate_pixels.py:1019-1026) with sort/searchsorted
primitives and XLA scatter-adds, which are deterministic by construction
(SURVEY §2.6 P3/P6/P7).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INT_MAX = jnp.iinfo(jnp.int32).max


@functools.partial(jax.jit, static_argnames=('max_unique',))
def unique_pixels(pixels: jnp.ndarray, max_unique: int):
    """Sorted unique pixel ids across the batch.

    Args:
        pixels: (S, P) int32 ids, -1 padding.
        max_unique: static output size.

    Returns:
        (unique, n_unique): (max_unique,) ids padded with -1, and the count.
    """
    flat = pixels.reshape(-1)
    flat = jnp.where(flat < 0, _INT_MAX, flat)
    s = jnp.sort(flat)
    first = jnp.concatenate([jnp.array([True]), s[1:] != s[:-1]])
    first &= s != _INT_MAX
    # compact first-occurrences to the front without a second sort
    dst = jnp.cumsum(first) - 1
    uniq = jnp.full((max_unique,), -1, jnp.int32).at[
        jnp.where(first, dst, max_unique)].set(
        s.astype(jnp.int32), mode='drop')
    return uniq, first.sum().astype(jnp.int32)


@jax.jit
def batch_pixel_counts(pixels: jnp.ndarray, npix: jnp.ndarray):
    """Fused host-sync payload: [total active entries, exact unique count].

    The exact unique count sizes the static unique-pixel axis far tighter
    than the reference's additive bound (cli/simulate_pixels.py:1012 sizes
    by the per-segment sum; shared pixels make the true count ~4-7x
    smaller), shrinking every downstream (U, ...) op.  Stacked into one
    int32 pair so the host pays a single device round trip.

    Args:
        pixels: (S, P) int32 pixel keys (event-offset ok), -1 padding.
        npix: (S,) per-segment active-pixel counts (pixelize.get_pixels).

    Returns:
        (2,) int32: [npix.sum(), n_unique(pixels)].
    """
    flat = pixels.reshape(-1)
    flat = jnp.where(flat < 0, _INT_MAX, flat)
    s = jnp.sort(flat)
    first = jnp.concatenate([jnp.array([True]), s[1:] != s[:-1]])
    first &= s != _INT_MAX
    return jnp.stack([npix.sum().astype(jnp.int32),
                      first.sum().astype(jnp.int32)])


@jax.jit
def pixel_index_map(pixels: jnp.ndarray, uniq: jnp.ndarray):
    """Index of each (segment, pixel) entry in the unique array.

    Equivalent to the reference's broadcast-compare loop
    (cli/simulate_pixels.py:1019-1026) via searchsorted on the sorted
    unique array.  Returns (S, P) int32, -1 where the pixel is padding.
    """
    key = jnp.where(uniq < 0, _INT_MAX, uniq)
    idx = jnp.searchsorted(key, jnp.where(pixels < 0, _INT_MAX, pixels))
    return jnp.where(pixels < 0, -1, idx).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=('max_tracks', 'n_unique_cap'))
def track_pixel_map(pix_idx: jnp.ndarray, distances: jnp.ndarray,
                    n_unique_cap: int, *, max_tracks: int):
    """Per-unique-pixel list of contributing segment indices.

    Segments are slotted in ascending backtrack-distance order, ties broken
    by segment index — the ordering produced by the reference's
    distance-prioritized fill (detsim.get_track_pixel_map2).

    Args:
        pix_idx: (S, P) index into the unique-pixel array, -1 padding.
        distances: (S, P) distance codes (-1 means "outside backtrack
            range" and sorts *after* real codes, matching the reference's
            `range(max_distance)` sweep which still stores them last).
        n_unique_cap: static size of the unique-pixel axis.
        max_tracks: slots per pixel (sim.max_tracks_per_pixel).

    Returns:
        track_map: (n_unique_cap, max_tracks) int32 segment indices, -1 pad.
        slot: (S, P) int32 slot of each (segment, pixel) entry
            (-1 if overflowed or padding).
        overflow: (n_unique_cap,) bool overflow flags.
    """
    S, P = pix_idx.shape
    seg_idx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[:, None], (S, P))
    flat_pix = pix_idx.reshape(-1)
    flat_seg = seg_idx.reshape(-1)
    flat_dist = jnp.where(distances < 0, 15, distances).reshape(-1)
    flat_pix_key = jnp.where(flat_pix < 0, n_unique_cap, flat_pix)

    # one stable argsort on a combined (pixel, dist) key: the flatten order
    # is segment-major, so stability supplies the segment-index tie-break
    # (replaces a 3-key lexsort; TPU sorts are expensive)
    combined = flat_pix_key * 16 + flat_dist
    order = jnp.argsort(combined, stable=True)
    sp = flat_pix_key[order]
    sp = jnp.where(sp >= n_unique_cap, _INT_MAX, sp)
    ss = flat_seg[order]
    # rank within each pixel group
    group_start = jnp.concatenate([jnp.array([True]), sp[1:] != sp[:-1]])
    pos = jnp.arange(sp.shape[0])
    start_pos = jnp.where(group_start, pos, 0)
    start_pos = jax.lax.associative_scan(jnp.maximum, start_pos)
    rank = (pos - start_pos).astype(jnp.int32)

    # Entries beyond the backtrack range (code -1 -> sentinel 15) are never
    # stored by the reference (its target_dist sweep covers only codes >= 0,
    # detsim.py:582-591) and raise the overflow flag downstream.
    sd = flat_dist[order]
    present = sp != _INT_MAX
    valid = present & (rank < max_tracks) & (sd < 15)
    track_map = jnp.full((n_unique_cap, max_tracks), -1, jnp.int32)
    track_map = track_map.at[
        jnp.where(valid, sp, n_unique_cap),  # OOB row -> dropped
        jnp.where(valid, rank, 0)
    ].set(ss, mode='drop')

    overflow = jnp.zeros((n_unique_cap,), bool).at[
        jnp.where(present & ~valid, sp, n_unique_cap)
    ].set(True, mode='drop')

    # scatter ranks back to (S, P)
    slot_flat = jnp.full(S * P, -1, jnp.int32)
    slot_flat = slot_flat.at[order].set(
        jnp.where(valid, rank, -1), mode='drop')
    return track_map, slot_flat.reshape(S, P), overflow


@functools.partial(jax.jit,
                   static_argnames=('n_ticks', 'n_unique_cap', 'time_sampling'))
def sum_pixel_signals(signals: jnp.ndarray, pix_idx: jnp.ndarray,
                      track_starts: jnp.ndarray, n_unique_cap: int,
                      *, n_ticks: int, time_sampling: float):
    """Sum per-(segment, pixel) signal windows into per-pixel waveforms.

    (reference detsim.sum_pixel_signals, atomics -> TPU-native reduction)

    The reduction is formulated for the MXU instead of a scatter-add: each
    (segment, pixel) row is first aligned to global ticks (a contiguous
    dynamic slice per row), then summed per unique pixel with a one-hot
    matmul — orders of magnitude faster than XLA scatter on TPU.

    Args:
        signals: (S, P, T_sig) induced current.
        pix_idx: (S, P) unique-pixel indices, -1 padding.
        track_starts: (S,) window start times [us] (time_intervals output,
            *with* the event-time offset, detsim.py:36-39).
        n_unique_cap: static unique-pixel axis size.
        n_ticks: global waveform tick count (det.time_ticks).

    Returns:
        (n_unique_cap, n_ticks) float32 summed waveforms.
    """
    S, P, T = signals.shape
    start_tick = jnp.round(track_starts / time_sampling).astype(jnp.int32)

    # Static front padding: the most negative start_tick is
    # -time_padding/dt (t_start >= 0 after drift, detsim.py:36-39), and the
    # window length T always covers the padding, so pad_front = T bounds
    # it; windows starting past n_ticks clamp to an offset whose content
    # the final crop discards entirely.
    pad_front = T
    width = pad_front + n_ticks + T
    offset = jnp.clip(start_tick + pad_front, 0, width - T)

    # chunk the align+matmul over segments to bound the aligned buffer
    # (~64 MB per chunk)
    chunk = max(int(64e6) // max(P * width * 4, 1), 1)
    chunk = min(1 << (chunk.bit_length() - 1), max(S, 1))
    n_chunks = -(-S // chunk)
    S_pad = n_chunks * chunk
    if S_pad != S:
        signals = jnp.pad(signals, ((0, S_pad - S), (0, 0), (0, 0)))
        offset = jnp.pad(offset, (0, S_pad - S))
        pix_idx = jnp.pad(pix_idx, ((0, S_pad - S), (0, 0)),
                          constant_values=-1)

    sig_c = signals.reshape(n_chunks, chunk, P, T)
    off_c = offset.reshape(n_chunks, chunk)
    idx_c = pix_idx.reshape(n_chunks, chunk, P)
    uvals = jnp.arange(n_unique_cap)

    def body(acc, inp):
        sig, off, idx = inp
        aligned = jax.vmap(
            lambda row, o: jax.lax.dynamic_update_slice(
                jnp.zeros((P, width), jnp.float32), row, (0, o))
        )(sig, off)                                    # (chunk, P, width)
        flat = aligned.reshape(chunk * P, width)
        onehot = (idx.reshape(chunk * P)[:, None] == uvals[None, :]) \
            .astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            onehot, flat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, None

    acc = jnp.zeros((n_unique_cap, width), jnp.float32)
    acc, _ = jax.lax.scan(body, acc, (sig_c, off_c, idx_c))
    return jax.lax.dynamic_slice(acc, (0, pad_front),
                                 (n_unique_cap, n_ticks))
