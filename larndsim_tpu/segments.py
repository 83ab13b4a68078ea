"""Track-segment batch as a structure-of-arrays pytree.

The reference passes numpy/cupy *structured arrays* through its kernels
(dtype from cli/dumpTree.py:17-29).  On TPU we keep one dense array per
field (static shapes, f32/i32) plus an explicit validity mask so batches can
be padded to bucketed sizes without branching.
"""
from __future__ import annotations

from typing import Any

import numpy as np
from flax import struct

# Fields carried on device.  Names match the edep-sim HDF5 `segments` dtype
# (cli/dumpTree.py:17-29) plus the synthesized back-compat fields
# (cli/simulate_pixels.py:482-568).
FLOAT_FIELDS = (
    'x_start', 'y_start', 'z_start', 'x_end', 'y_end', 'z_end',
    'x', 'y', 'z', 'dx', 'dE', 'dEdx',
    't0', 't0_start', 't0_end', 't', 't_start', 't_end',
    'n_electrons', 'n_photons', 'long_diff', 'tran_diff',
)
INT_FIELDS = ('event_id', 'segment_id', 'traj_id', 'pixel_plane')


@struct.dataclass
class Segments:
    x_start: Any; y_start: Any; z_start: Any
    x_end: Any; y_end: Any; z_end: Any
    x: Any; y: Any; z: Any
    dx: Any; dE: Any; dEdx: Any
    t0: Any; t0_start: Any; t0_end: Any
    t: Any; t_start: Any; t_end: Any
    n_electrons: Any; n_photons: Any
    long_diff: Any; tran_diff: Any
    event_id: Any; segment_id: Any; traj_id: Any
    pixel_plane: Any
    valid: Any  # bool mask: False on padding rows

    @property
    def size(self) -> int:
        return self.x_start.shape[0]


def from_structured(tracks: np.ndarray, pad_to: int | None = None) -> Segments:
    """Convert an edep-sim structured array to a :class:`Segments` pytree.

    Args:
        tracks: structured array with (a superset of) the segment fields.
        pad_to: optional static row count; extra rows are zero/invalid.
    """
    import jax.numpy as jnp

    n = tracks.shape[0]
    m = pad_to if pad_to is not None else n
    if m < n:
        raise ValueError(f'pad_to={m} < batch size {n}')

    names = tracks.dtype.names or ()

    def field(name, dtype):
        if name == 'traj_id' and 'traj_id' not in names and 'file_traj_id' in names:
            src = tracks['file_traj_id']
        elif name in names:
            src = tracks[name]
        else:
            src = np.zeros(n)
        out = np.zeros(m, dtype=dtype)
        out[:n] = src.astype(dtype)
        return jnp.asarray(out)

    kwargs = {name: field(name, np.float32) for name in FLOAT_FIELDS}
    kwargs.update({name: field(name, np.int32) for name in INT_FIELDS})
    valid = np.zeros(m, bool)
    valid[:n] = True
    return Segments(valid=jnp.asarray(valid), **kwargs)


def from_structured_group(tracks_list: list, pad_to: int) -> Segments:
    """Stack G event batches into a (G, pad_to)-shaped :class:`Segments`.

    Used by grouped per-event pipelines (vmap over the leading axis); each
    field becomes one (G, pad_to) device array — same transfer count as a
    single event.
    """
    import jax.numpy as jnp

    G = len(tracks_list)

    def field(name, dtype):
        out = np.zeros((G, pad_to), dtype=dtype)
        for g, tracks in enumerate(tracks_list):
            names = tracks.dtype.names or ()
            if name == 'traj_id' and 'traj_id' not in names \
                    and 'file_traj_id' in names:
                src = tracks['file_traj_id']
            elif name in names:
                src = tracks[name]
            else:
                src = np.zeros(tracks.shape[0])
            out[g, :tracks.shape[0]] = src.astype(dtype)
        return jnp.asarray(out)

    kwargs = {name: field(name, np.float32) for name in FLOAT_FIELDS}
    kwargs.update({name: field(name, np.int32) for name in INT_FIELDS})
    valid = np.zeros((G, pad_to), bool)
    for g, tracks in enumerate(tracks_list):
        valid[g, :tracks.shape[0]] = True
    return Segments(valid=jnp.asarray(valid), **kwargs)


def to_structured(segs: Segments, dtype: np.dtype | None = None) -> np.ndarray:
    """Materialize the valid rows back into a structured array."""
    valid = np.asarray(segs.valid)
    n = int(valid.sum())
    if dtype is None:
        dtype = np.dtype(
            [(name, 'f4') for name in FLOAT_FIELDS]
            + [(name, 'i4') for name in INT_FIELDS])
    out = np.zeros(n, dtype=dtype)
    for name in dtype.names:
        if hasattr(segs, name):
            out[name] = np.asarray(getattr(segs, name))[valid].astype(out[name].dtype)
    return out
