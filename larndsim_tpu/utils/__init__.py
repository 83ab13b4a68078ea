from .pixel_lut import PixelLUT
from .batching import TPCBatcher
from .memlog import MemoryLogger

__all__ = ['PixelLUT', 'TPCBatcher', 'MemoryLogger']
