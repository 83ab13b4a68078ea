"""Geometry: tile layouts, TPC borders, pixel-id codecs."""
from .tiles import (TileLayout, derive_tpc_borders, electron_mobility,
                    load_tile_layout)
from .pixels import id2pixel, pixel2id

__all__ = ['TileLayout', 'derive_tpc_borders', 'electron_mobility',
           'load_tile_layout', 'id2pixel', 'pixel2id']
