"""WAV decode parity across sample widths (8/16/24/32-bit PCM + float32).

The reference decodes via pydub/ffmpeg (``__init__.py:86``); here WAVs
route through the native C++ loader with a pure-Python stdlib fallback.
Both must produce identical int16 channels for every width the format
allows — each payload below encodes the SAME int16 signal losslessly,
so decode must return it exactly.
"""

import struct

import numpy as np
import pytest

from shazam_tpu.audio.io import read


def _wav_raw(path, payload: bytes, fs: int, n_ch: int, sampwidth: int,
             fmt_tag: int) -> None:
    hdr = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, fmt_tag, n_ch, fs, fs * n_ch * sampwidth,
        n_ch * sampwidth, sampwidth * 8)
    hdr += b"data" + struct.pack("<I", len(payload))
    with open(path, "wb") as fh:
        fh.write(hdr + payload)


def _pack24(v32: np.ndarray) -> bytes:
    b = np.zeros((len(v32), 3), np.uint8)
    b[:, 0] = v32 & 0xFF
    b[:, 1] = (v32 >> 8) & 0xFF
    b[:, 2] = (v32 >> 16) & 0xFF
    return b.tobytes()


X = (np.arange(-128, 128, dtype=np.int16) << 8)  # lossless at every width


def _encode(x: np.ndarray, width: str) -> tuple:
    """(payload bytes, sampwidth, fmt_tag) encoding x losslessly."""
    if width == "u8":
        return (((x >> 8) + 128).astype(np.uint8).tobytes(), 1, 1)
    if width == "i16":
        return (x.tobytes(), 2, 1)
    if width == "i24":
        return (_pack24(x.astype(np.int32) << 8), 3, 1)
    if width == "i32":
        return ((x.astype(np.int32) << 16).tobytes(), 4, 1)
    if width == "f32":
        return ((x.astype(np.float32) / 32768.0).tobytes(), 4, 3)
    raise AssertionError(width)


@pytest.mark.parametrize("width", ["u8", "i16", "i24", "i32", "f32"])
def test_wav_width_roundtrip(tmp_path, width):
    payload, sw, tag = _encode(X, width)
    p = str(tmp_path / f"{width}.wav")
    _wav_raw(p, payload, 44100, 1, sw, tag)
    ch, fs, sha = read(p)
    assert fs == 44100 and len(ch) == 1
    assert np.array_equal(ch[0], X), width


@pytest.mark.parametrize("width", ["i24", "f32"])
def test_wav_width_stereo_deinterleave(tmp_path, width):
    y = -X
    inter = np.empty(2 * len(X), np.int16)
    inter[0::2], inter[1::2] = X, y
    payload, sw, tag = _encode(inter, width)
    p = str(tmp_path / f"st_{width}.wav")
    _wav_raw(p, payload, 44100, 2, sw, tag)
    ch, fs, _ = read(p)
    assert len(ch) == 2
    assert np.array_equal(ch[0], X) and np.array_equal(ch[1], y)


@pytest.mark.parametrize("width", ["u8", "i24", "i32", "f32"])
def test_python_fallback_matches_native(tmp_path, width, monkeypatch):
    """The stdlib fallback must decode exactly like the native loader
    (float WAVs especially: stdlib wave rejects fmt tag 3, so the
    manual RIFF parse is the only pure-Python path)."""
    from shazam_tpu import native

    payload, sw, tag = _encode(X, width)
    p = str(tmp_path / f"fb_{width}.wav")
    _wav_raw(p, payload, 44100, 1, sw, tag)
    with_native = read(p)[0][0] if native.available() else None

    monkeypatch.setattr(native, "decode_all", lambda *a, **k: None)
    ch, fs, _ = read(p)
    assert np.array_equal(ch[0], X), width
    if with_native is not None:
        assert np.array_equal(ch[0], with_native)


def test_limit_respected_float(tmp_path):
    payload, sw, tag = _encode(X, "f32")
    p = str(tmp_path / "lim.wav")
    _wav_raw(p, payload, 44100, 1, sw, tag)
    from shazam_tpu import native
    # the limit path through the pure-Python float parser
    import shazam_tpu.audio.io as io_mod
    data, fs, n_ch = io_mod._read_float_wav(p, limit=1e-3)
    assert len(data) == int(1e-3 * 44100)


def test_probe_float_wav(tmp_path, monkeypatch):
    """probe() must size float WAVs header-only (ingest batch planning)
    even without the native loader."""
    from shazam_tpu import native
    from shazam_tpu.audio.io import probe

    payload, sw, tag = _encode(X, "f32")
    p = str(tmp_path / "probe.wav")
    _wav_raw(p, payload, 44100, 1, sw, tag)
    monkeypatch.setattr(native, "wav_info", lambda *a, **k: None,
                        raising=False)
    assert probe(p) == (1, 44100, len(X))


def test_read_wav_bytes_fuzz_untrusted():
    """The serving daemon feeds untrusted network bytes straight into
    read_wav_bytes; mutated/truncated headers must either decode to a
    bounded result or raise a clean exception — never hang, never
    allocate absurd output (every exception maps to an HTTP 400)."""
    import io as _io
    import time
    import wave as _wave

    import numpy as np

    from shazam_tpu.audio.io import read_wav_bytes

    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(44100)
        wf.writeframes(np.random.default_rng(0).integers(
            -100, 100, 5000).astype("<i2").tobytes())
    base = bytearray(buf.getvalue())

    rng = np.random.default_rng(42)
    for trial in range(600):
        b = bytearray(base)
        mode = trial % 3
        if mode == 0:      # random byte flips
            for _ in range(int(rng.integers(1, 8))):
                b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        elif mode == 1:    # truncation
            b = b[: int(rng.integers(0, len(b)))]
        else:              # targeted header-field corruption
            for off in (16, 20, 22, 24, 28, 32, 34, 40):
                if rng.random() < 0.4 and off < len(b):
                    b[off] = int(rng.integers(0, 256))
        t0 = time.time()
        try:
            channels, _fs = read_wav_bytes(bytes(b))
            assert sum(len(c) for c in channels) < 10_000_000
        except Exception:  # noqa: BLE001 — clean exception = a 400
            pass
        assert time.time() - t0 < 2.0, f"slow decode on trial {trial}"


def test_corrupt_mp3_raises_without_ffmpeg(tmp_path, monkeypatch):
    """A stream libmpg123 rejects surfaces the decode error when no
    ffmpeg exists to sniff it by content (and must NOT crash with an
    unrelated 'ffmpeg missing' error masking the cause)."""
    from shazam_tpu.audio import io as aio

    if not aio._mp3_available():
        import pytest

        pytest.skip("libmpg123 not present")
    bad = tmp_path / "noise.mp3"
    bad.write_bytes(b"\x00" * 64)   # no MPEG sync anywhere
    monkeypatch.setattr(aio, "_FFMPEG", None)
    import pytest

    with pytest.raises(Exception):
        aio.read(str(bad))


def test_corrupt_mp3_falls_back_to_ffmpeg(tmp_path, monkeypatch):
    """When ffmpeg IS present, an mpg123-rejected .mp3 routes through it
    (content sniffing covered mis-extensioned files before the
    libmpg123 path existed — keep that)."""
    from shazam_tpu.audio import io as aio

    if not aio._mp3_available():
        import pytest

        pytest.skip("libmpg123 not present")
    calls = {}

    def fake_ffmpeg(path, limit):
        calls["path"] = path
        import numpy as np

        return np.zeros(8, np.int16), 44100, 1

    monkeypatch.setattr(aio, "_FFMPEG", "/usr/bin/ffmpeg")
    monkeypatch.setattr(aio, "_read_via_ffmpeg", fake_ffmpeg)
    bad = tmp_path / "noise.mp3"
    bad.write_bytes(b"\x00" * 64)
    channels, fs, sha = aio.read(str(bad))
    assert calls["path"] == str(bad) and fs == 44100
