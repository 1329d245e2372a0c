"""ctypes bindings for the native C++ WAV decoder (lazy-built with g++).

The shared library is compiled on first import into this directory; set
``ADVOC_TPU_NO_NATIVE=1`` to force the pure-numpy fallback in
:mod:`advoc_tpu.data.audioio`.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "wavio.cc"
_SO = _DIR / "_wavio.so"
_LOCK = threading.Lock()
_LIB = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-o",
        str(_SO),
        str(_SRC),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Build (if needed) and return the ctypes library handle."""
    global _LIB
    if _LIB is not None:
        return _LIB
    if os.environ.get("ADVOC_TPU_NO_NATIVE"):
        raise NativeUnavailable("ADVOC_TPU_NO_NATIVE is set")
    with _LOCK:
        if _LIB is not None:
            return _LIB
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                _build()
            lib = ctypes.CDLL(str(_SO))
        except (OSError, subprocess.CalledProcessError) as e:
            raise NativeUnavailable(f"native wavio unavailable: {e}") from e

        lib.advoc_wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.advoc_wav_info.restype = ctypes.c_int
        lib.advoc_wav_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
        ]
        lib.advoc_wav_decode.restype = ctypes.c_long
        lib.advoc_wav_decode_slice.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.advoc_wav_decode_slice.restype = ctypes.c_long
        lib.advoc_wav_write.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_int,
        ]
        lib.advoc_wav_write.restype = ctypes.c_int
        _LIB = lib
        return _LIB
