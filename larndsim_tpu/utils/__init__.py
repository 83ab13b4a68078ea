from .pixel_lut import PixelLUT
from .memlog import MemoryLogger

__all__ = ['PixelLUT', 'MemoryLogger']
