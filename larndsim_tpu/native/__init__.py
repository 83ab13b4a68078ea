"""Native (C++) runtime components, loaded via ctypes.

Compiled lazily with g++ on first use and cached under build/; every entry
point has a vectorized numpy fallback so the framework runs without a
toolchain.
"""
from .build import load_library

__all__ = ['load_library']
