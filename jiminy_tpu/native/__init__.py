"""Native (C++) runtime components, loaded via ctypes.

The compute path of this framework is XLA-compiled JAX/Pallas (the native
tier on TPU); host-side runtime pieces that the reference implements in
C++ — the telemetry binary log codec here — are C++ too, compiled once on
first use and cached next to the source (SURVEY.md §2.1 "Telemetry"/"io").
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

_DIR = Path(__file__).parent
_LOCK = threading.Lock()
_LIB = None
_LIB_FAILED = False


def _build(src: Path, out: Path) -> None:
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", str(src), "-o", str(out)],
        check=True,
        capture_output=True,
    )


def load_codec():
    """Load (building if needed) the telemetry codec shared library.
    Returns None when no C++ toolchain is available — callers fall back to
    the pure-Python encoder, which produces byte-identical files."""
    global _LIB, _LIB_FAILED
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        src = _DIR / "telemetry_codec.cpp"
        so = _DIR / "_telemetry_codec.so"
        try:
            if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
                _build(src, so)
            lib = ctypes.CDLL(str(so))
            lib.jtpu_write_log.restype = ctypes.c_int
            lib.jtpu_write_log.argtypes = [
                ctypes.c_char_p,
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_uint64,
                ctypes.c_uint64,
            ]
            lib.jtpu_append_rows.restype = ctypes.c_int
            lib.jtpu_append_rows.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_uint64,
                ctypes.c_uint64,
            ]
            lib.jtpu_read_header.restype = ctypes.c_int64
            lib.jtpu_read_header.argtypes = [
                ctypes.c_char_p,
                ctypes.c_char_p,
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint64),
            ]
            lib.jtpu_read_data.restype = ctypes.c_int64
            lib.jtpu_read_data.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_uint64,
            ]
            _LIB = lib
        except Exception:
            _LIB_FAILED = True
        return _LIB
