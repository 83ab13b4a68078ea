"""Pixelization parity vs a direct numpy port of the reference walk.

Checks that the scan-based rasterizer visits exactly the reference
Bresenham cell set (pixels_from_track.py:157-199) and that the dilated
neighbor set matches the reference dedup result as a *set*, with min-distance
codes.
"""
import numpy as np
import pytest

from larndsim_tpu.params import load_detector
from larndsim_tpu.ops import pixelize
from larndsim_tpu.ops.drift import drift
from larndsim_tpu import segments as seg_mod

REF = '/root/reference/larndsim'
DETPROP = f'{REF}/detector_properties/module0.yaml'
PIXEL = f'{REF}/pixel_layouts/multi_tile_layout-2.3.16.yaml'


@pytest.fixture(scope='module')
def det():
    return load_detector(DETPROP, PIXEL).params


def ref_bresenham(x0, y0, x1, y1, n_pix):
    """Reference no-diagonal Bresenham (oracle)."""
    cells = []
    dx, sx = abs(x1 - x0), 1 if x0 < x1 else -1
    dy, sy = -abs(y1 - y0), 1 if y0 < y1 else -1
    err = dx + dy
    if 0 <= x0 < n_pix[0] and 0 <= y0 < n_pix[1]:
        cells.append((x0, y0))
    while x0 != x1 or y0 != y1:
        e2 = 2 * err
        if e2 - dy > dx - e2:
            err += dy
            x0 += sx
        else:
            err += dx
            y0 += sy
        if 0 <= x0 < n_pix[0] and 0 <= y0 < n_pix[1]:
            cells.append((x0, y0))
    return cells


def make_drifted_segments(det, n, rng):
    borders = np.asarray(det.tpc_borders)
    dtype = np.dtype([(f, 'f8') for f in seg_mod.FLOAT_FIELDS]
                     + [(f, 'i8') for f in seg_mod.INT_FIELDS])
    tracks = np.zeros(n, dtype=dtype)
    for axis, name in enumerate('xyz'):
        lo, hi = borders[0, axis].min(), borders[0, axis].max()
        span = 0.1 * (hi - lo)
        start = rng.uniform(lo, hi, n)
        end = np.clip(start + rng.uniform(-span, span, n), lo, hi)
        tracks[f'{name}_start'] = start
        tracks[f'{name}_end'] = end
        tracks[name] = 0.5 * (start + end)
    tracks['n_electrons'] = 1e5
    return drift(seg_mod.from_structured(tracks), det)


class TestRasterize:
    def test_matches_reference_walk(self, det):
        rng = np.random.default_rng(7)
        segs = make_drifted_segments(det, 32, rng)
        segs_np = {k: np.asarray(getattr(segs, k)) for k in
                   ('x_start', 'y_start', 'x_end', 'y_end', 'pixel_plane')}
        borders = np.asarray(det.tpc_borders)
        pitch = float(det.pixel_pitch)

        max_active = 64
        xs, ys, valid = pixelize.rasterize(segs, det, max_active)
        xs, ys, valid = map(np.asarray, (xs, ys, valid))

        for i in range(32):
            plane = segs_np['pixel_plane'][i]
            bx, by = borders[plane, 0, 0], borders[plane, 1, 0]
            x0 = int(np.floor((segs_np['x_start'][i] - bx) / pitch))
            y0 = int(np.floor((segs_np['y_start'][i] - by) / pitch))
            x1 = int(np.floor((segs_np['x_end'][i] - bx) / pitch))
            y1 = int(np.floor((segs_np['y_end'][i] - by) / pitch))
            expected = ref_bresenham(x0, y0, x1, y1, det.n_pixels)
            got = list(zip(xs[i][valid[i]], ys[i][valid[i]]))
            assert got == expected, f'segment {i}'

    def test_neighbors(self, det):
        rng = np.random.default_rng(11)
        segs = make_drifted_segments(det, 16, rng)
        radius = 2
        max_active = 64
        max_nb = (2 * radius + 1) * max_active + (1 + 2 * radius) * radius * 2
        pixels, distances, npix = pixelize.get_pixels(
            segs, det, max_active=max_active, radius=radius,
            max_neighboring=max_nb)
        pixels, distances, npix = map(np.asarray, (pixels, distances, npix))

        xs, ys, valid = map(np.asarray, pixelize.rasterize(segs, det, max_active))
        codes = pixelize.distance_code_table(radius)
        nx, ny = det.n_pixels
        planes = np.asarray(segs.pixel_plane)

        for i in range(16):
            # pixel id -> distance code of the FIRST generator in the
            # reference's iteration order (walk order x (dx, dy) offsets):
            # matches the reference dedup exactly
            # (pixels_from_track.py:239-269)
            expected = {}
            for x, y in zip(xs[i][valid[i]], ys[i][valid[i]]):
                for dx in range(-radius, radius + 1):
                    for dy in range(-radius, radius + 1):
                        px, py = x + dx, y + dy
                        if 0 <= px < nx and 0 <= py < ny:
                            pid = px + nx * (py + ny * planes[i])
                            code = codes[dx + radius, dy + radius]
                            key = 127 if code < 0 else code
                            expected.setdefault(pid, key)
            got_ids = pixels[i][pixels[i] >= 0]
            assert npix[i] == len(expected)
            assert set(got_ids.tolist()) == set(expected)
            assert np.all(np.diff(got_ids) > 0)  # sorted, unique
            for pid, dist in zip(got_ids, distances[i][pixels[i] >= 0]):
                exp = expected[pid]
                assert dist == (-1 if exp == 127 else exp)
