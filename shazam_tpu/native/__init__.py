"""ctypes bindings for the native C++ ingest data-loader.

Builds ``libsia_loader.so`` from dataloader.cpp on first use (g++ is part
of the toolchain); every entry point degrades gracefully to the pure-
Python implementations in audio/io.py when the toolchain or the build is
unavailable, so the framework never hard-depends on the extension.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dataloader.cpp")
_LIB_PATH = os.path.join(_HERE, "libsia_loader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB_PATH, _SRC, "-lpthread",
    ]
    try:
        return subprocess.run(cmd, capture_output=True).returncode == 0
    except OSError:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """The loader library, building it on first call; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.sia_sha1_file.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.sia_sha1_file.restype = ctypes.c_int
        lib.sia_wav_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_long),
        ]
        lib.sia_wav_info.restype = ctypes.c_int
        lib.sia_decode_channel.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ]
        lib.sia_decode_channel.restype = ctypes.c_long
        lib.sia_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_long), ctypes.c_char_p, ctypes.c_int,
        ]
        lib.sia_load_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def sha1_file(path: str) -> Optional[str]:
    lib = load_library()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(41)
    if lib.sia_sha1_file(path.encode(), out) != 0:
        return None
    return out.value.decode()


def decode_channel(path: str, channel: int, cap: int) -> Optional[np.ndarray]:
    lib = load_library()
    if lib is None:
        return None
    out = np.zeros(cap, np.float32)
    got = lib.sia_decode_channel(
        path.encode(), channel,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
    )
    if got < 0:
        return None
    return out[:got]


def wav_info(path: str) -> Optional[Tuple[int, int, int]]:
    """(channels, sample_rate, frames) or None."""
    lib = load_library()
    if lib is None:
        return None
    ch = ctypes.c_int()
    rate = ctypes.c_int()
    frames = ctypes.c_long()
    if lib.sia_wav_info(path.encode(), ctypes.byref(ch), ctypes.byref(rate),
                        ctypes.byref(frames)) != 0:
        return None
    return ch.value, rate.value, frames.value


def decode_all(path: str, limit: Optional[float] = None):
    """Decode every channel of a WAV natively.

    Returns (channels list of int16 arrays, sample_rate, sha1_hex) or None
    when the native path can't handle the file (callers use the Python
    reader).
    """
    info = wav_info(path)
    if info is None:
        return None
    n_ch, rate, frames = info
    if limit is not None:
        frames = min(frames, int(limit * rate))
    channels = []
    for c in range(n_ch):
        got = decode_channel(path, c, frames)
        if got is None:
            return None
        channels.append(got[:frames].astype(np.int16))
    sha = sha1_file(path)
    if sha is None:
        return None
    return channels, rate, sha


def load_batch(
    paths: List[str], cap: int, n_threads: int = 8
) -> Optional[Tuple[np.ndarray, np.ndarray, List[str]]]:
    """Threaded decode of channel 0 of each file into an (n, cap) matrix.

    Returns (matrix float32, n_valid int64, sha1 hex list) or None if the
    native library is unavailable / any file failed (callers fall back to
    the Python reader for exactness of the error path).
    """
    lib = load_library()
    if lib is None or not paths:
        return None
    n = len(paths)
    enc = [p.encode() for p in paths]
    arr = (ctypes.c_char_p * n)(*enc)
    mat = np.zeros((n, cap), np.float32)
    n_valid = np.zeros(n, np.int64)
    sha = ctypes.create_string_buffer(41 * n)
    bad = lib.sia_load_batch(
        arr, n, mat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        n_valid.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), sha,
        n_threads,
    )
    if bad:
        return None
    hexes = [
        sha.raw[41 * i : 41 * i + 40].decode() for i in range(n)
    ]
    return mat, n_valid, hexes
