"""ctypes bindings for the native FLAC decoder (native/flacdec.cpp).

Builds the shared library on first use (g++ -O3) and caches it next to the
source. Decoded samples are returned as float32 in [-1, 1], shaped
(channels, T), matching audio_io.read_wav.
"""
from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libflacdec.so"
_LOCK = threading.Lock()
_LIB = None


def _build():
    src = _NATIVE_DIR / "flacdec.cpp"
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO_PATH), str(src)],
        check=True, capture_output=True)


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not _SO_PATH.exists():
            _build()
        lib = ctypes.CDLL(str(_SO_PATH))
        lib.flac_decode.restype = ctypes.c_int
        lib.flac_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.flac_free.restype = None
        lib.flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
        _LIB = lib
        return lib


def decode_flac_bytes(data: bytes) -> tuple[np.ndarray, int]:
    lib = _load()
    out = ctypes.POINTER(ctypes.c_int32)()
    n = ctypes.c_int64()
    ch = ctypes.c_int()
    sr = ctypes.c_int()
    bps = ctypes.c_int()
    rc = lib.flac_decode(data, len(data), ctypes.byref(out), ctypes.byref(n),
                         ctypes.byref(ch), ctypes.byref(sr), ctypes.byref(bps))
    if rc != 0:
        raise ValueError(f"FLAC decode failed (code {rc})")
    try:
        count = n.value * ch.value
        arr = np.ctypeslib.as_array(out, shape=(count,)).copy()
    finally:
        lib.flac_free(out)
    scale = float(1 << (bps.value - 1))
    x = (arr.astype(np.float32) / scale).reshape(n.value, ch.value).T.copy()
    return x, sr.value


def decode_flac_file(path) -> tuple[np.ndarray, int]:
    return decode_flac_bytes(Path(path).read_bytes())
