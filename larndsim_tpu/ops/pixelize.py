"""Segment -> pixel association (rasterization + neighbor dilation).

Reference semantics: pixels_from_track.py:43-272.  The anode projection of
each segment is rasterized with the no-diagonal Bresenham variant (same cell
set as the reference walk, pixels_from_track.py:157-199), then dilated by
``radius`` pixels.  The reference dedups neighbors with an O(n^2) linear
search per segment and assigns each pixel the quantized backtrack-distance
code of its *first* generator; here we dedup with a lexsort and assign the
*minimum* distance code over generators (distance to the nearest active
pixel), which is the quantity the downstream association priority actually
wants (detsim.get_track_pixel_map2 iterates distances ascending).

Shapes are static: callers size ``max_active`` from the batch's
max(|dx|+|dy|)+1 (exact for this walk) and ``max_neighboring`` from the
reference bound (2r+1)*max_active + (2r+1)*2r (cli/simulate_pixels.py:928).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params.detector import DetectorParams
from ..segments import Segments

#: neighbor dilation codes: dsum/dmax quantization table
#: (pixels_from_track.py:248-268)
MAX_NEIGHBOR_BACKTRACK_DISTANCE = 4


def distance_code_table(radius: int) -> np.ndarray:
    """Static (2r+1, 2r+1) table of backtrack distance codes."""
    codes = np.full((2 * radius + 1, 2 * radius + 1), -1, np.int32)
    for x_r in range(-radius, radius + 1):
        for y_r in range(-radius, radius + 1):
            dx, dy = abs(x_r), abs(y_r)
            dmax, dmin = max(dx, dy), min(dx, dy)
            dsum = dmax + dmin
            if dsum > MAX_NEIGHBOR_BACKTRACK_DISTANCE:
                dist = -1
            elif dsum <= 1:
                dist = dsum
            elif dsum == 2:
                dist = 2 if dmax == 1 else 3
            elif dsum == 3:
                dist = 4 if dmax == 2 else 5
            elif dsum == 4:
                dist = {2: 6, 3: 7, 4: 8}[dmax]
            else:
                dist = -1
            codes[x_r + radius, y_r + radius] = dist
    return codes


def segment_pixel_endpoints(segs: Segments, det: DetectorParams):
    """Anode-plane pixel indices of each segment's endpoints.

    (pixels_from_track.py:94-102: floor((x - border)/pitch))
    """
    plane = segs.pixel_plane
    valid = (plane >= 0) & (plane < det.n_tpcs) & segs.valid
    safe_plane = jnp.where(valid, plane, 0)
    bx = det.tpc_borders[safe_plane, 0, 0]
    by = det.tpc_borders[safe_plane, 1, 0]
    to_idx = lambda v, b: jnp.floor((v - b) / det.pixel_pitch).astype(jnp.int32)
    return (to_idx(segs.x_start, bx), to_idx(segs.y_start, by),
            to_idx(segs.x_end, bx), to_idx(segs.y_end, by), safe_plane, valid)


def max_active_pixels(segs_np, det, tpc_borders_np) -> int:
    """Host-side bound on active pixels/segment: |dx|+|dy|+1.

    Exact for the no-diagonal Bresenham walk; replaces the reference's
    device-side atomic-max kernel (pixels_from_track.py:43-65).
    """
    plane = np.clip(segs_np['pixel_plane'], 0, tpc_borders_np.shape[0] - 1)
    bx = tpc_borders_np[plane, 0, 0]
    by = tpc_borders_np[plane, 1, 0]
    pitch = float(det.pixel_pitch)
    x0 = np.floor((segs_np['x_start'] - bx) / pitch)
    y0 = np.floor((segs_np['y_start'] - by) / pitch)
    x1 = np.floor((segs_np['x_end'] - bx) / pitch)
    y1 = np.floor((segs_np['y_end'] - by) / pitch)
    n = np.abs(x1 - x0) + np.abs(y1 - y0) + 1
    return int(n.max()) if n.size else 1


@functools.partial(jax.jit, static_argnames=('max_active',))
def rasterize(segs: Segments, det: DetectorParams, max_active: int):
    """Active pixels under each segment's projection.

    Returns (pix_x, pix_y, valid) of shape (S, max_active); same walk as the
    reference Bresenham (pixels_from_track.py:157-199), expressed as a
    fixed-length scan with masking.
    """
    x0, y0, x1, y1, plane, seg_valid = segment_pixel_endpoints(segs, det)

    dx = jnp.abs(x1 - x0)
    dy = -jnp.abs(y1 - y0)
    sx = jnp.where(x0 < x1, 1, -1).astype(jnp.int32)
    sy = jnp.where(y0 < y1, 1, -1).astype(jnp.int32)
    n_steps = dx - dy  # |dx| + |dy|

    def step(carry, i):
        x, y, err = carry
        done = i > n_steps  # emitted start cell at i=0
        e2 = 2 * err
        move_x = e2 - dy > dx - e2
        nx = jnp.where(move_x, x + sx, x)
        ny = jnp.where(move_x, y, y + sy)
        nerr = err + jnp.where(move_x, dy, dx)
        x = jnp.where(done, x, jnp.where(i == 0, x, nx))
        y = jnp.where(done, y, jnp.where(i == 0, y, ny))
        err = jnp.where(done | (i == 0), err, nerr)
        return (x, y, err), (x, y, ~done)

    init = (x0, y0, dx + dy)
    _, (xs, ys, emit) = jax.lax.scan(step, init, jnp.arange(max_active))
    xs, ys, emit = xs.T, ys.T, emit.T  # (S, max_active)

    in_bounds = ((xs >= 0) & (xs < det.n_pixels[0])
                 & (ys >= 0) & (ys < det.n_pixels[1]))
    valid = emit & in_bounds & seg_valid[:, None]
    return xs, ys, valid


@functools.partial(jax.jit,
                   static_argnames=('max_active', 'radius', 'max_neighboring'))
def get_pixels(segs: Segments, det: DetectorParams, *, max_active: int,
               radius: int, max_neighboring: int):
    """Active + neighboring pixels per segment.

    Returns:
        pixels: (S, max_neighboring) int32 linear pixel ids, -1 padded,
            unique per segment, sorted ascending.
        distances: (S, max_neighboring) int32 backtrack distance codes
            (min over generators), -1 padded / beyond max distance.
        npix: (S,) int32 count of valid entries.
    """
    nx, ny = det.n_pixels
    xs, ys, valid = rasterize(segs, det, max_active)
    plane = jnp.where((segs.pixel_plane >= 0) & (segs.pixel_plane < det.n_tpcs),
                      segs.pixel_plane, 0)

    codes = jnp.asarray(distance_code_table(radius))
    offs = jnp.arange(-radius, radius + 1)
    off_x = jnp.repeat(offs, 2 * radius + 1)        # ((2r+1)^2,)
    off_y = jnp.tile(offs, 2 * radius + 1)
    off_code = codes.reshape(-1)

    cand_x = xs[:, :, None] + off_x[None, None, :]  # (S, A, K)
    cand_y = ys[:, :, None] + off_y[None, None, :]
    cand_ok = (valid[:, :, None]
               & (cand_x >= 0) & (cand_x < nx)
               & (cand_y >= 0) & (cand_y < ny))
    cand_id = cand_x + nx * (cand_y + ny * plane[:, None, None])
    cand_id = jnp.where(cand_ok, cand_id, jnp.iinfo(jnp.int32).max)
    cand_dist = jnp.broadcast_to(off_code[None, None, :], cand_id.shape)

    S = cand_id.shape[0]
    flat_id = cand_id.reshape(S, -1)
    flat_dist = jnp.where(cand_dist < 0, 127,
                          cand_dist).reshape(S, -1).astype(jnp.int32)

    def dedup(ids, dists):
        # one *stable* argsort: the candidate flatten order matches the
        # reference's generation order (active-pixel walk x (x_r, y_r)
        # offsets), so the first duplicate keeps the reference's distance
        # code exactly (pixels_from_track.py:239-269); compaction is a
        # cumsum scatter, not a second sort.
        order = jnp.argsort(ids, stable=True)
        ids, dists = ids[order], dists[order]
        first = jnp.concatenate([jnp.array([True]), ids[1:] != ids[:-1]])
        first &= ids != jnp.iinfo(jnp.int32).max
        dst = jnp.where(first, jnp.cumsum(first) - 1, ids.shape[0])
        out_ids = jnp.full(ids.shape[0], -1, jnp.int32).at[dst].set(
            ids, mode='drop')
        out_dists = jnp.full(ids.shape[0], 127, jnp.int32).at[dst].set(
            dists, mode='drop')
        return out_ids, out_dists

    ids, dists = jax.vmap(dedup)(flat_id, flat_dist)
    pixels = ids[:, :max_neighboring]
    dists = dists[:, :max_neighboring]
    keep = pixels >= 0
    distances = jnp.where(keep & (dists < 127), dists, -1)
    npix = keep.sum(axis=1).astype(jnp.int32)
    return pixels, distances, npix


def time_intervals(segs: Segments, det: DetectorParams):
    """Per-segment signal start time and max signal length in ticks.

    (detsim.time_intervals, detsim.py:18-40)
    """
    dt = det.time_sampling
    t_end = jnp.round((segs.t_end + 1) / dt) * dt
    t_start = jnp.round((segs.t_start - det.time_padding) / dt) * dt
    ticks = jnp.ceil((t_end - t_start) / dt)
    ticks = jnp.where(segs.valid, ticks, 0)
    return t_start, jnp.max(ticks).astype(jnp.int32)
