"""Per-pixel threshold/gain lookup.

Replaces the reference's GPU open-addressing hash table
(util/cuda_dict.py:7-215, atomic CAS + linear probing) with a sorted
key array + `searchsorted` gather — the idiomatic TPU formulation of a
static integer-keyed map (SURVEY §2.6 P7).  Loads the same npz format
(`keys`, `values`, `default`).
"""
from __future__ import annotations

import numpy as np


class PixelLUT:
    """Static int-key -> float-value map with a default."""

    def __init__(self, keys: np.ndarray, values: np.ndarray, default: float):
        order = np.argsort(keys)
        self.keys = np.asarray(keys)[order]
        self.values = np.asarray(values)[order]
        self.default = float(np.asarray(default).ravel()[0])

    @classmethod
    def load(cls, filename: str) -> 'PixelLUT':
        data = np.load(filename)
        return cls(data['keys'], data['values'], data['default'])

    def save(self, filename: str) -> None:
        np.savez_compressed(filename, keys=self.keys, values=self.values,
                            default=self.default)

    def lookup(self, query):
        """Gather values for query keys (missing -> default).  Works with
        numpy or jax arrays."""
        import jax.numpy as jnp
        keys = jnp.asarray(self.keys)
        values = jnp.asarray(self.values)
        q = jnp.asarray(query)
        idx = jnp.searchsorted(keys, q)
        idx_c = jnp.clip(idx, 0, len(self.keys) - 1)
        hit = keys[idx_c] == q
        return jnp.where(hit, values[idx_c], self.default)

    def __getitem__(self, query):
        return self.lookup(query)

    def __contains__(self, key) -> bool:
        i = int(np.searchsorted(self.keys, key))
        return i < len(self.keys) and self.keys[i] == key
