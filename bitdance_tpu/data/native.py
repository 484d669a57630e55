"""Native (C++) data-path components, loaded via ctypes.

The tar indexer (csrc/tar_index.cpp) replaces Python tarfile header walking
for the one-time ImageNet index build; falls back to the pure-Python path
when the shared library can't be built (no compiler).
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess

_LIB = None
_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "tar_index.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libbd_tar_index.so")


def _load() -> ctypes.CDLL | None:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            return None
    lib = ctypes.CDLL(_SO)
    lib.bd_build_tar_index.restype = ctypes.c_int64
    lib.bd_build_tar_index.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def build_tar_index_native(tar_path: str, idx_path: str):
    """Build the flat (offset, size, label) index with the C++ scanner.

    Returns the list[(offset, size, class_idx)] like
    bitdance_tpu.data.imagenet.build_flat_index, or None if unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    bin_path = idx_path + ".bdix"
    n = lib.bd_build_tar_index(tar_path.encode(), bin_path.encode())
    if n < 0:
        return None
    return read_bdix(bin_path)


def read_bdix(path: str):
    """Parse the BDIX1 binary index into (entries, class_names)."""
    with open(path, "rb") as f:
        magic = f.read(8)
        assert magic[:5] == b"BDIX1", "bad index magic"
        n, nc = struct.unpack("<qq", f.read(16))
        raw = f.read(n * 24)
        entries = [struct.unpack_from("<qqq", raw, i * 24) for i in range(n)]
        classes = []
        for _ in range(nc):
            (ln,) = struct.unpack("<h", f.read(2))
            classes.append(f.read(ln).decode())
    return entries, classes
