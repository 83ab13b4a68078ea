"""Lazy g++ build + ctypes loader for the native components."""
from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess

_DIR = pathlib.Path(__file__).parent
_CACHE: dict[str, ctypes.CDLL | None] = {}


def load_library(name: str) -> ctypes.CDLL | None:
    """Compile (if needed) and load native/<name>.cpp; None on failure."""
    if name in _CACHE:
        return _CACHE[name]
    src = _DIR / f'{name}.cpp'
    code = src.read_bytes()
    tag = hashlib.sha1(code).hexdigest()[:12]
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
