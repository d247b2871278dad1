"""Native C++ data-loader vs the Python reference implementations."""

import hashlib

import numpy as np
import pytest

from shazam_tpu import native
from shazam_tpu.audio.io import read, write_wav
from shazam_tpu.audio.synth import synth_song


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader did not build"
)


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    paths = []
    for i in range(4):
        p = str(d / f"s{i}.wav")
        write_wav(p, synth_song(i, duration_s=2.0 + i, seed=5), 44100)
        paths.append(p)
    stereo = str(d / "stereo.wav")
    s = synth_song(9, duration_s=2.0, seed=5)
    write_wav(stereo, np.stack([s, -s // 2]), 44100)
    return paths, stereo


def test_sha1_matches_hashlib(wavs):
    paths, _ = wavs
    for p in paths:
        with open(p, "rb") as fh:
            expect = hashlib.sha1(fh.read()).hexdigest().upper()
        assert native.sha1_file(p) == expect


def test_decode_matches_python(wavs):
    paths, stereo = wavs
    for p in paths:
        channels, fs, _ = read(p)
        got = native.decode_channel(p, 0, len(channels[0]) + 10)
        assert np.array_equal(got.astype(np.int16), channels[0])
    channels, _, _ = read(stereo)
    for c in range(2):
        got = native.decode_channel(stereo, c, len(channels[c]) + 10)
        assert np.array_equal(got.astype(np.int16), channels[c])


def test_threaded_batch(wavs):
    paths, _ = wavs
    cap = int(6 * 44100)
    out = native.load_batch(paths, cap, n_threads=4)
    assert out is not None
    mat, n_valid, hexes = out
    for i, p in enumerate(paths):
        channels, _, sha = read(p)
        assert n_valid[i] == len(channels[0])
        assert np.array_equal(mat[i, : n_valid[i]].astype(np.int16), channels[0])
        assert mat[i, n_valid[i]:].max() == 0.0
        assert hexes[i] == sha


def test_bad_file_falls_back(tmp_path):
    p = str(tmp_path / "junk.wav")
    with open(p, "wb") as fh:
        fh.write(b"this is not RIFF data")
    assert native.decode_channel(p, 0, 100) is None
    assert native.load_batch([p], 100) is None


def test_zero_bits_wav_rejected_not_sigfpe(tmp_path):
    """A corrupt fmt chunk with bits_per_sample=0 must be a clean error
    (the old parse divided by (bits/8)*channels: SIGFPE, process death)."""
    import struct

    from shazam_tpu import native

    if not native.available():
        import pytest as _pytest
        _pytest.skip("native loader unavailable")
    data = b"\x00\x00" * 8
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 0, 0, 0)  # bits = 0
    riff = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    p = tmp_path / "corrupt.wav"
    p.write_bytes(riff)
    assert native.wav_info(str(p)) is None  # clean rejection, no SIGFPE
