"""Parity + recognition on the reference's REAL audio fixture.

``/root/reference/signal_with_noise.wav`` is the noise-injector output the
reference itself queries with (``recognizer_test.py:557`` writes it, mono
22,050 Hz, 10 s) — the one real-audio artifact in the tree that decodes
with the stdlib. BASELINE.json config 1 names it verbatim: "Single 5s WAV
query vs 1-song in-memory index (signal_with_noise.wav — CPU NumPy
parity)". Every other accuracy test here uses synthetic tones; this file
is the real-music gate.
"""

import os

import numpy as np
import pytest

from tests.oracle import oracle_fingerprint

FIXTURE = "/root/reference/signal_with_noise.wav"
FS = 22050

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference fixture not present"
)


@pytest.fixture(scope="module")
def fixture_audio():
    from shazam_tpu.audio.io import read

    channels, fs, sha = read(FIXTURE)
    assert fs == FS
    assert len(channels) == 1
    return channels[0]


def test_fixture_decodes(fixture_audio):
    # 10.0 s mono int16, non-silent real signal
    assert fixture_audio.dtype == np.int16
    assert len(fixture_audio) == 220500
    assert np.abs(fixture_audio.astype(np.int64)).mean() > 100


def test_fixture_hash_parity_vs_oracle(fixture_audio):
    """JAX pipeline (f32) vs the NumPy/scipy oracle (f64) on real audio,
    at the fixture's native 22,050 Hz through the fs-parameterized path."""
    from shazam_tpu.ops.fingerprint import (
        fingerprint_samples, fingerprint_to_hex_pairs,
    )
    import jax.numpy as jnp

    fp = fingerprint_samples(
        jnp.asarray(fixture_audio.astype(np.float32)), fs=FS,
        peak_capacity=16384,
    )
    assert int(fp.n_peaks) <= 16384
    ours = set(fingerprint_to_hex_pairs(fp))
    ref = set(oracle_fingerprint(fixture_audio, fs=FS))
    assert len(ref) > 200  # a real 10 s clip fingerprints densely
    jaccard = len(ours & ref) / len(ours | ref)
    # Measured 1.000000 (1626/1626 hashes identical) on this fixture — the
    # f32 pipeline is bit-identical to the f64 oracle here. Gate pinned just
    # under the measurement; tighter than every synthetic gate in the suite.
    assert jaccard > 0.995, f"jaccard={jaccard} ({len(ours)} vs {len(ref)})"


def test_fixture_one_song_recognition(fixture_audio):
    """BASELINE config 1: the fixture as a 1-song index, a 5 s cut of it
    as the query — top-1 must be the fixture with a confident offset."""
    import dataclasses

    from shazam_tpu.api import SIA
    from shazam_tpu.config import DEFAULT_CONFIG

    config = dataclasses.replace(DEFAULT_CONFIG, sample_rate=FS)
    sia = SIA(config=config)
    stats = sia.ingest_arrays([("signal_with_noise", fixture_audio)])
    assert stats["ingested"] == 1
    assert stats["hashes"] > 200

    # 5 s clip starting at 2.0 s (frame offset 2*22050/2048 ~ 21)
    clip = fixture_audio[2 * FS : 7 * FS]
    out = sia.recognize_samples([clip], topn=2)
    assert out["results"], "no match for a clip of the only indexed song"
    top = out["results"][0]
    assert top["song_name"] == "signal_with_noise"
    assert top["hashes_matched_in_input"] > 50
    # offset_seconds must place the clip near its true 2 s start
    assert abs(top["offset_seconds"] - 2.0) < 0.5


# ---------------------------------------------------------------------------
# Real MUSIC: the reference's MP3 corpus fixture, decoded via libmpg123
# (reference ``songsES/000002.mp3`` — the song its ES pipeline ingests,
# ``__init__.py:86`` decodes the corpus with pydub/ffmpeg; here
# ``audio/mp3.py`` binds the system libmpg123).
# ---------------------------------------------------------------------------

MP3_FIXTURE = "/root/reference/songsES/000002.mp3"
NOISE_MP3 = "/root/reference/city-traffic-sounds/city-traffic-sounds.mp3"


def _mp3_ready():
    try:
        from shazam_tpu.audio.mp3 import available

        return available() and os.path.exists(MP3_FIXTURE)
    except Exception:
        return False


mp3mark = pytest.mark.skipif(
    not _mp3_ready(), reason="libmpg123 or mp3 fixture not present")


@pytest.fixture(scope="module")
def music_audio():
    from shazam_tpu.audio.io import read

    channels, fs, sha = read(MP3_FIXTURE)
    assert fs == 44100
    assert len(channels) == 2
    return channels


@mp3mark
def test_mp3_decodes(music_audio):
    left = music_audio[0]
    assert left.dtype == np.int16
    assert 29.0 < len(left) / 44100 < 31.0   # ~30 s track
    assert np.abs(left.astype(np.int64)).mean() > 500   # real signal
    # stereo channels correlated but distinct (real mix, not dual-mono)
    right = music_audio[1].astype(np.float64)
    l = left.astype(np.float64)
    corr = np.dot(l, right) / (np.linalg.norm(l) * np.linalg.norm(right))
    assert 0.2 < corr < 0.9999, corr


@mp3mark
def test_mp3_limit_prefix(music_audio):
    from shazam_tpu.audio.io import read

    channels, fs, _ = read(MP3_FIXTURE, limit=5.0)
    assert len(channels[0]) == 5 * 44100
    np.testing.assert_array_equal(channels[0], music_audio[0][: 5 * 44100])


@mp3mark
def test_mp3_hash_parity_vs_oracle(music_audio):
    """Real MUSIC parity: f32 JAX pipeline vs f64 oracle on the MP3."""
    from shazam_tpu.ops.fingerprint import (
        fingerprint_samples, fingerprint_to_hex_pairs,
    )
    import jax.numpy as jnp

    left = music_audio[0]
    fp = fingerprint_samples(
        jnp.asarray(left.astype(np.float32)), peak_capacity=16384)
    ours = set(fingerprint_to_hex_pairs(fp))
    ref = set(oracle_fingerprint(left, fs=44100))
    assert len(ref) > 500   # 30 s of real music fingerprints densely
    jaccard = len(ours & ref) / len(ours | ref)
    assert jaccard > 0.97, f"jaccard={jaccard} ({len(ours)} vs {len(ref)})"


@mp3mark
def test_mp3_one_song_recognition_with_real_noise(music_audio):
    """Ingest the real song, query a 5 s cut mixed with the reference's
    REAL city-traffic noise recording at 0 dB SNR — the exact robustness
    experiment of ``recognizer_test.py:426-435``."""
    from shazam_tpu.api import SIA
    from shazam_tpu.audio.io import read
    from shazam_tpu.audio.noise import mix_at_snr

    sia = SIA()
    stats = sia.ingest_arrays([("000002", music_audio[0])])
    assert stats["ingested"] == 1

    noise_ch, nfs, _ = read(NOISE_MP3)
    assert nfs == 44100
    clip = music_audio[0][10 * 44100: 15 * 44100]
    # mix_at_snr works in the reference's renormalized [-1,1] domain;
    # scale back to int16 exactly like the bench loop (harness.py:101)
    mixed = mix_at_snr(clip, noise_ch[0], snr_db=0.0, rng=7)
    noisy = np.clip(mixed * 32767.0, -32768, 32767).astype(np.int16)
    out = sia.recognize_samples([noisy], topn=2)
    assert out["results"], "no match at 0 dB city-traffic noise"
    top = out["results"][0]
    assert top["song_name"] == "000002"
    assert abs(top["offset_seconds"] - 10.0) < 0.5
