"""Immutable configuration pytrees for the TPU-native larnd-sim engine."""
from . import physics
from .detector import (DEFAULT_PLANE_INDEX, DetectorModel, DetectorParams,
                       get_module_ids, load_detector)
from .light import LightParams, load_light
from .sim import SimParams, load_sim

__all__ = [
    'physics', 'DEFAULT_PLANE_INDEX', 'DetectorModel', 'DetectorParams',
    'get_module_ids', 'load_detector', 'LightParams', 'load_light',
    'SimParams', 'load_sim',
]
