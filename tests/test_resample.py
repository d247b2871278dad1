"""Mixed-sample-rate audio: polyphase resample to the config rate.

The reference fingerprinted files at their NATIVE rate with 44.1 kHz
constants (``__init__.py:86-95,232``) — a 48 kHz file pitch-shifted
every hash and could never cross-match.  Here ``SIA(resample=True)``
(the default) converts at decode time; ``resample=False`` keeps the
loud rejection.
"""

import numpy as np
import pytest

from shazam_tpu import SIA
from shazam_tpu.audio.io import write_wav
from shazam_tpu.audio.resample import resample_channel
from shazam_tpu.audio.synth import synth_song

DUR = 8.0
FS = 44100


def test_tone_frequency_preserved():
    fs_in, fs_out = 48000, 44100
    t = np.arange(int(fs_in * 1.0)) / fs_in
    x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    y = resample_channel(x, fs_in, fs_out)
    assert abs(len(y) - fs_out) <= 2
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    f_peak = np.argmax(spec) * fs_out / len(y)
    assert abs(f_peak - 1000.0) < 2.0
    assert y.dtype == np.float32


def test_int16_stays_int16():
    rng = np.random.default_rng(0)
    x = rng.integers(-20000, 20000, 22050, dtype=np.int16)
    y = resample_channel(x, 22050, 44100)
    assert y.dtype == np.int16
    assert abs(len(y) - 44100) <= 2


def test_same_rate_is_identity():
    x = np.arange(1000, dtype=np.int16)
    assert resample_channel(x, 44100, 44100) is x


@pytest.fixture(scope="module")
def engine():
    sia = SIA()
    songs = [(f"track{i:06d}", synth_song(i, duration_s=DUR, seed=21))
             for i in range(3)]
    stats = sia.ingest_arrays(songs, batch_size=4)
    assert stats["ingested"] == 3
    return sia


def test_recognize_file_cross_rate(engine, tmp_path):
    """A 48 kHz recording of a 44.1 kHz-ingested song must match."""
    song = synth_song(1, duration_s=DUR, seed=21)
    clip = song[int(2.0 * FS): int(7.0 * FS)]
    clip_48k = resample_channel(clip.astype(np.float32), FS, 48000)
    p = str(tmp_path / "clip48k.wav")
    write_wav(p, clip_48k, 48000)
    out = engine.recognize_file(p)
    assert out["results"]
    assert out["results"][0]["song_name"] == "track000001"
    assert abs(out["results"][0]["offset_seconds"] - 2.0) < 0.3


def test_recognize_file_rejects_when_disabled(tmp_path):
    sia = SIA(resample=False)
    sia.ingest_arrays([("t0", synth_song(0, duration_s=DUR, seed=21))])
    p = str(tmp_path / "c.wav")
    write_wav(p, np.zeros(48000, np.float32), 48000)
    with pytest.raises(ValueError, match="sample rate"):
        sia.recognize_file(p)


def test_ingest_cross_rate_corpus(tmp_path):
    """Ingest one 48 kHz file alongside 44.1 kHz ones; recognize a
    44.1 kHz clip of the 48 kHz-ingested song."""
    sia = SIA()
    paths = []
    for i in range(3):
        song = synth_song(i, duration_s=DUR, seed=33)
        fs = 48000 if i == 1 else FS
        data = (resample_channel(song.astype(np.float32), FS, fs)
                if fs != FS else song)
        p = str(tmp_path / f"track{i:06d}.wav")
        write_wav(p, data, fs)
        paths.append(p)
    stats = sia.ingest_files(paths, batch_size=4)
    assert stats["ingested"] == 3
    # query the 48 kHz-ingested song with the original 44.1 kHz audio
    song = synth_song(1, duration_s=DUR, seed=33)
    clip = song[int(1.0 * FS): int(6.0 * FS)]
    out = sia.recognize_samples([clip])
    assert out["results"]
    assert out["results"][0]["song_name"] == "track000001"


def test_ingest_rejects_when_disabled(tmp_path):
    sia = SIA(resample=False)
    p = str(tmp_path / "bad.wav")
    write_wav(p, np.zeros(48000, np.float32), 48000)
    with pytest.raises(ValueError, match="sample rate"):
        sia.ingest_files([p])
