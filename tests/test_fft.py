"""Matmul FFT numerics vs numpy rfft."""

import numpy as np

from shazam_tpu.ops.fft import rfft_power


def test_rfft_power_matches_numpy(rng):
    frames = rng.normal(0, 1000.0, (7, 4096)).astype(np.float32)
    got = np.asarray(rfft_power(frames))
    ref = np.abs(np.fft.rfft(frames.astype(np.float64), axis=-1)) ** 2
    # relative tolerance: f32 matmul accumulation over 64-term stages
    denom = np.maximum(ref, ref.max(axis=-1, keepdims=True) * 1e-9)
    rel = np.abs(got - ref) / denom
    assert np.percentile(rel, 99) < 1e-4
    assert got.shape == (7, 2049)


def test_rfft_power_tone_bins():
    fs, n = 44100, 4096
    t = np.arange(n) / fs
    tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    got = np.asarray(rfft_power(tone[None, :]))[0]
    assert np.argmax(got) == int(round(1000.0 * n / fs))


def test_rfft_power_zero_input():
    got = np.asarray(rfft_power(np.zeros((3, 4096), np.float32)))
    assert np.all(got == 0)
