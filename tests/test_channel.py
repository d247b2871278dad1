"""Tests for the synthetic acoustic-channel simulator (audio/channel.py)
standing in for the reference's speaker->room->mic loop
(``recognizer_test.py:561-580``)."""

import numpy as np

from shazam_tpu.audio.channel import simulate_channel
from shazam_tpu.audio.synth import synth_music_song


def test_deterministic_and_shape():
    clip = synth_music_song(1, duration_s=4.0)
    a = simulate_channel(clip, rng=7)
    b = simulate_channel(clip, rng=7)
    c = simulate_channel(clip, rng=8)
    assert a.dtype == np.int16 and len(a) == len(clip)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_band_limit_applied():
    """Out-of-band energy (sub-bass, >8 kHz) must drop hard."""
    fs = 44100
    t = np.arange(4 * fs) / fs
    x = (8000.0 * np.sin(2 * np.pi * 50.0 * t)
         + 8000.0 * np.sin(2 * np.pi * 1000.0 * t)
         + 8000.0 * np.sin(2 * np.pi * 12000.0 * t)).astype(np.int16)
    y = simulate_channel(x, fs=fs, rng=3).astype(np.float64)
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    f = np.fft.rfftfreq(len(y), 1 / fs)

    def band(fc):
        m = (f > fc * 0.98) & (f < fc * 1.02)
        return spec[m].max()

    assert band(50.0) < 0.05 * band(1000.0)
    assert band(12000.0) < 0.05 * band(1000.0)


def test_reverb_smears_transients():
    """An impulse must gain a tail (reverb), not stay a single click."""
    fs = 44100
    x = np.zeros(fs, np.int16)
    x[fs // 2] = 20000
    y = simulate_channel(x, fs=fs, rng=11).astype(np.float64)
    peak_at = int(np.abs(y).argmax())
    tail = np.abs(y[peak_at + int(0.01 * fs): peak_at + int(0.08 * fs)])
    assert tail.max() > 0.02 * np.abs(y[peak_at])


def test_recognition_survives_channel(tmp_path):
    """Clips through the channel must still mostly recognize — the loop
    degrades, it doesn't destroy (the reference's rig achieved 0.96)."""
    from shazam_tpu import SIA
    from shazam_tpu.audio.synth import synth_corpus
    from shazam_tpu.audio.io import read

    files = synth_corpus(str(tmp_path), 3, duration_s=12.0,
                         style="music", seed=5)
    sia = SIA(catalog_path=str(tmp_path / "cat.sqlite"))
    sia.ingest_files([p for p, _ in files])
    hits = 0
    rng = np.random.default_rng(123)
    for path, sid in files:
        ch, fs, _ = read(path)
        clip = simulate_channel(ch[0][3 * fs: 8 * fs], fs=fs, rng=rng)
        r = sia.recognize_samples([clip])
        if r["results"] and \
                r["results"][0]["song_name"] == f"track{sid:06d}":
            hits += 1
    assert hits >= 2, hits


def test_harness_channel_mode(tmp_path):
    from shazam_tpu import SIA
    from shazam_tpu.audio.synth import synth_corpus
    from shazam_tpu.bench.harness import BenchConfig, run_recognition_sweep

    files = [p for p, _ in synth_corpus(str(tmp_path), 3, duration_s=10.0,
                                        style="music", seed=9)]
    sia = SIA(catalog_path=str(tmp_path / "cat.sqlite"))
    sia.ingest_files(files)
    cfg = BenchConfig(record_seconds=5.0, channel=True,
                      out_dir=str(tmp_path / "out"), seed=4,
                      checkpoints=False)
    s = run_recognition_sweep(sia, files, cfg)
    assert s["n"] == 3
    assert s["accuracy"] >= 2 / 3


def test_severity_knob():
    """severity interpolates the channel harshness: deterministic per
    (clip, seed, severity); severity=0 stays closer to the input than
    the stress rig on average (gentler band-limit, dry room, no level
    swing)."""
    import numpy as np
    from shazam_tpu.audio.channel import simulate_channel

    rng = np.random.default_rng(3)
    clip = (rng.normal(0, 6000, 44100 * 2)).astype(np.int16)

    a = simulate_channel(clip, rng=5, severity=0.3)
    b = simulate_channel(clip, rng=5, severity=0.3)
    np.testing.assert_array_equal(a, b)
    c = simulate_channel(clip, rng=5, severity=0.9)
    assert not np.array_equal(a, c)

    def err(sev, seeds=range(8)):
        tot = 0.0
        for s in seeds:
            y = simulate_channel(clip, rng=s, severity=sev).astype(np.float64)
            x = clip.astype(np.float64)
            tot += np.mean((y - x) ** 2) / np.mean(x ** 2)
        return tot

    assert err(0.0) < err(1.0)


def test_harness_channel_severity(tmp_path):
    """channel_severity reaches the sweep: severity 0 on a tiny corpus
    keeps accuracy at least as high as the stress rig."""
    from shazam_tpu import SIA
    from shazam_tpu.audio.synth import synth_corpus
    from shazam_tpu.bench.harness import BenchConfig, run_recognition_sweep

    files = [p for p, _ in synth_corpus(str(tmp_path), 3, duration_s=10.0,
                                        style="music", seed=9)]
    sia = SIA(catalog_path=str(tmp_path / "cat.sqlite"))
    sia.ingest_files(files)
    cfg = BenchConfig(record_seconds=5.0, channel=True,
                      channel_severity=0.0,
                      out_dir=str(tmp_path / "out"), seed=4,
                      checkpoints=False)
    s = run_recognition_sweep(sia, files, cfg)
    assert s["n"] == 3 and s["accuracy"] == 1.0
