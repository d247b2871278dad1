"""Acoustic-channel degradation for robustness benchmarks.

The reference's published accuracy numbers all survived a real analog
loop: each query fragment was PLAYED through speakers and re-recorded
from the mic (reference ``recognizer_test.py:561-580``, ``play_thread``
at ``:381-388``) — DAC, speaker, room, mic, ADC. Our harness is
file-based (right for CI), so this module provides a seeded synthetic
stand-in for that channel, applied to query clips before recognition:

1. speaker/mic band-limit — 4th-order Butterworth band-pass
   (~120 Hz – 7.5 kHz, typical laptop speaker + electret mic);
2. small-room reverb — sparse early reflections plus an exponentially
   decaying diffuse tail (~120 ms RT60-ish), energy-normalized;
3. speaker nonlinearity — soft clip (tanh) at a randomized drive;
4. room noise floor at a randomized 30–40 dB SNR;
5. playback level variation (±6 dB) and int16 re-quantization.

Each knob is drawn from the seeded RNG per clip, so a sweep sees a
distribution of channels, like a test rig whose operator moves the mic
between runs. Used by ``bench/harness.py`` (``BenchConfig.channel``)
and the CLI bench's ``--channel`` flag.
"""

from __future__ import annotations

import numpy as np


def _butter_bandpass_sos(lo_hz: float, hi_hz: float, fs: int):
    from scipy.signal import butter

    ny = fs / 2.0
    hi = min(hi_hz, ny * 0.98)
    return butter(4, [lo_hz / ny, hi / ny], btype="band", output="sos")


def _room_impulse(rng: np.random.Generator, fs: int,
                  rt_ms: float) -> np.ndarray:
    """Sparse early reflections + diffuse exponential tail, direct-path
    dominant, normalized to unit energy."""
    n = max(int(rt_ms / 1000.0 * fs), 8)
    ir = np.zeros(n, np.float64)
    ir[0] = 1.0
    n_refl = int(rng.integers(3, 7))
    for _ in range(n_refl):
        at = int(rng.integers(int(0.002 * fs), max(int(0.035 * fs), 2)))
        if at < n:
            ir[at] += rng.uniform(0.1, 0.4) * rng.choice((-1.0, 1.0))
    tail = rng.normal(0.0, 1.0, n) * np.exp(
        -np.arange(n) / (rt_ms / 1000.0 * fs / 6.9))  # -60 dB at rt_ms
    ir += 0.25 * tail
    return ir / np.sqrt(np.sum(ir * ir))


def simulate_channel(clip: np.ndarray, fs: int = 44100,
                     rng: np.random.Generator | int | None = None
                     ) -> np.ndarray:
    """Pass one query clip through a randomized synthetic acoustic loop.

    Input any int16-scale 1-D array; output int16 of the same length.
    Deterministic per (clip, seed).
    """
    from scipy.signal import fftconvolve, sosfilt

    if not isinstance(rng, np.random.Generator):
        rng = np.random.default_rng(rng)
    x = np.asarray(clip, np.float64)
    peak_in = np.max(np.abs(x)) + 1e-9

    # 1. speaker/mic band-limit (randomize edges a little)
    lo = rng.uniform(100.0, 180.0)
    hi = rng.uniform(6500.0, 7900.0)
    x = sosfilt(_butter_bandpass_sos(lo, hi, fs), x)

    # 2. small-room reverb
    ir = _room_impulse(rng, fs, rt_ms=rng.uniform(80.0, 180.0))
    x = fftconvolve(x, ir)[: len(clip)]

    # 3. speaker soft-clip: drive the top ~few dB into tanh
    drive = rng.uniform(1.2, 2.2)
    ref = np.max(np.abs(x)) + 1e-9
    x = np.tanh(x / ref * drive) * (ref / np.tanh(drive))

    # 4. room/mic noise floor at 30-40 dB SNR
    rms = np.sqrt(np.mean(x * x)) + 1e-9
    snr_db = rng.uniform(30.0, 40.0)
    x = x + rng.normal(0.0, rms * 10.0 ** (-snr_db / 20.0), len(x))

    # 5. playback level +-6 dB around the input peak, re-quantized
    gain = 10.0 ** (rng.uniform(-6.0, 6.0) / 20.0)
    x = x * (peak_in / (np.max(np.abs(x)) + 1e-9)) * gain
    return np.clip(np.round(x), -32768, 32767).astype(np.int16)
