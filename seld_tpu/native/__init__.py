"""Native (C++) runtime components, bound via ctypes.

The reference's audio decode rides torchaudio's C++ backend
(ref dataset.py:18-25); seldio.cpp is this framework's native equivalent
(RIFF/WAVE parser: PCM 8/16/24/32, IEEE float32/64, EXTENSIBLE). The
library is compiled on first use with g++ (no pybind11 in this image —
plain C ABI + ctypes) and cached next to the source; every entry point
falls back to the pure-Python decoder on any failure, so the framework
never hard-requires a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "seldio.cpp"
_LIB = _HERE / "libseldio.so"

_lib = None
_lib_error: str | None = None


def _compile() -> None:
    """Build libseldio.so (atomic rename so concurrent builds are safe)."""
    with tempfile.NamedTemporaryFile(
        suffix=".so", dir=str(_HERE), delete=False
    ) as tmp:
        tmp_path = tmp.name
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", tmp_path],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp_path, _LIB)
    finally:
        if os.path.exists(tmp_path):
            os.unlink(tmp_path)


def load_library():
    """Return the ctypes-bound library, compiling if needed; None if the
    native path is unavailable (no g++, compile failure, SELDIO_DISABLE=1).
    """
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    if os.environ.get("SELDIO_DISABLE") == "1":
        _lib_error = "disabled via SELDIO_DISABLE"
        return None
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _compile()
        lib = ctypes.CDLL(str(_LIB))
        lib.seldio_decode_wav.restype = ctypes.c_int
        lib.seldio_decode_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_char_p,
            ctypes.c_int32,
        ]
        lib.seldio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.seldio_version.restype = ctypes.c_char_p
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        _lib_error = f"{type(e).__name__}: {e}"
    return _lib


def native_available() -> bool:
    return load_library() is not None


def decode_wav(path) -> tuple[np.ndarray, int]:
    """Decode a WAV via the native library.

    Returns (float32 (channels, frames) planar array in [-1, 1], sample
    rate). Raises RuntimeError if the native library is unavailable or the
    file cannot be decoded (callers fall back to the Python decoder).
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError(f"seldio unavailable: {_lib_error}")
    data = ctypes.POINTER(ctypes.c_float)()
    channels = ctypes.c_int32()
    frames = ctypes.c_int64()
    sr = ctypes.c_int32()
    err = ctypes.create_string_buffer(256)
    rc = lib.seldio_decode_wav(
        str(path).encode(), ctypes.byref(data), ctypes.byref(channels),
        ctypes.byref(frames), ctypes.byref(sr), err, len(err),
    )
    if rc != 0:
        raise RuntimeError(
            f"seldio_decode_wav rc={rc}: {err.value.decode()} ({path})"
        )
    try:
        n = channels.value * frames.value
        out = np.ctypeslib.as_array(data, shape=(n,)).reshape(
            channels.value, frames.value
        ).copy()
    finally:
        lib.seldio_free(data)
    return out, sr.value
