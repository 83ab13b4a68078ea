"""Lazy g++ build + ctypes loader for the native components."""
from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import re
import subprocess

_DIR = pathlib.Path(__file__).parent
_CACHE: dict[str, ctypes.CDLL | None] = {}


def load_library(name: str) -> ctypes.CDLL | None:
    """Compile (if needed) and load native/<name>.cpp; None on failure."""
    if name in _CACHE:
        return _CACHE[name]
    src = _DIR / f'{name}.cpp'
    code = src.read_bytes()
    # the cache tag must cover local headers too, or edits to a shared
    # #include "x.h" would silently keep serving the stale .so
    h = hashlib.sha1(code)
    for inc in sorted(set(
            m.decode() for m in
            re.findall(rb'#include\s+"([^"]+)"', code))):
        inc_path = _DIR / inc
        if inc_path.exists():
            h.update(inc_path.read_bytes())
    tag = h.hexdigest()[:12]
    build_dir = _DIR / 'build'
    so_path = build_dir / f'{name}-{tag}.so'
    lib = None
    try:
        if not so_path.exists():
            build_dir.mkdir(exist_ok=True)
            subprocess.run(
                ['g++', '-O3', '-march=native', '-shared', '-fPIC',
                 '-o', str(so_path), str(src)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(so_path))
    except (OSError, subprocess.CalledProcessError):
        lib = None
    _CACHE[name] = lib
    return lib
