"""Device-ring incremental streaming (stream_device.py): bit-equality
with full recompute, fixed-shape quanta, and end-to-end recognition
(CLAUDE.md roadmap item 3; reference capture loop recognizer.py:355-382)."""

import numpy as np
import pytest

from shazam_tpu import SIA
from shazam_tpu.audio.synth import synth_song
from shazam_tpu.stream import StreamRecognizer, CHUNK
from shazam_tpu.stream_device import DeviceIncrementalFingerprinter, FRAME_STEP


@pytest.fixture(scope="module")
def engine():
    sia = SIA()
    songs = [
        (f"track{i}", synth_song(i, duration_s=20.0, seed=33 + i))
        for i in range(4)
    ]
    sia.ingest_arrays(songs)
    return sia


def _hex_pairs(fp):
    from shazam_tpu.ops.fingerprint import fingerprint_to_hex_pairs

    return set(fingerprint_to_hex_pairs(fp))


def _fingerprint_window(sia, samples):
    from shazam_tpu.ops.fingerprint import fingerprint_samples
    import jax.numpy as jnp

    return _hex_pairs(fingerprint_samples(
        jnp.asarray(np.asarray(samples, np.float32)),
        fs=sia.config.sample_rate, peak_capacity=sia.config.peak_capacity,
    ))


def test_device_incremental_equals_full_recompute(engine):
    """After every quantum, the ring-window hash set equals a from-scratch
    fingerprint of exactly the window's sample range."""
    song = synth_song(1, duration_s=20.0, seed=34)
    inc = DeviceIncrementalFingerprinter(engine.config, window_seconds=6.0)

    stream = song.astype(np.float32)
    fed = 0
    checks = 0
    while fed + CHUNK <= len(stream):
        inc.feed(stream[fed: fed + CHUNK])
        fed += CHUNK
        if not inc.ready or (fed // CHUNK) % 8:
            continue
        a, b = inc.window_sample_range()
        got = _hex_pairs(inc.fingerprints())
        ref = _fingerprint_window(engine, stream[a:b])
        assert got == ref, f"window [{a},{b}): {len(got)} vs {len(ref)}"
        checks += 1
    assert checks >= 3


def test_device_feed_consumes_fixed_quanta(engine):
    """Absorbed frames advance in 16-frame quanta (one fixed-shape
    program per quantum) and STFT work tracks new audio only."""
    song = synth_song(2, duration_s=12.0, seed=35).astype(np.float32)
    inc = DeviceIncrementalFingerprinter(engine.config, window_seconds=4.0)
    fed = 0
    while fed + CHUNK <= len(song):
        inc.feed(song[fed: fed + CHUNK])
        fed += CHUNK
        assert inc.n_frames % FRAME_STEP == 0
    hop = engine.config.hop
    # every completed quantum was absorbed, nothing recomputed
    n_quanta = (fed - (engine.config.window_size - hop)) // (FRAME_STEP * hop)
    assert inc.frames_computed == n_quanta * FRAME_STEP
    before = inc.frames_computed
    inc.fingerprints()
    assert inc.frames_computed == before  # recognize does no STFT work


def test_device_stream_recognizer_end_to_end(engine):
    """StreamRecognizer(engine="device") recognizes and equals the
    non-incremental full recompute."""
    song = synth_song(3, duration_s=20.0, seed=36)
    clip = song[int(2.0 * 44100): int(12.0 * 44100)]
    stereo = np.empty(2 * len(clip), np.int16)
    stereo[0::2] = clip
    stereo[1::2] = clip

    rec = StreamRecognizer(engine, channels=2, window_seconds=5.0,
                           engine="device")
    outs = []
    for base in range(0, len(stereo) - 2 * CHUNK, 2 * CHUNK):
        rec.feed(stereo[base: base + 2 * CHUNK])
        if all(f.ready for f in rec._fps):
            outs.append(rec.recognize())
    assert len(outs) >= 3
    for out in outs:
        assert out["results"][0]["song_name"] == "track3"

    full = rec.recognize(incremental=False)
    inc = rec.recognize(incremental=True)
    assert inc["input_hashes"] == full["input_hashes"]
    assert (
        inc["results"][0]["hashes_matched_in_input"]
        == full["results"][0]["hashes_matched_in_input"]
    )
    assert inc["results"][0]["offset"] == full["results"][0]["offset"]


def test_device_engine_guards(engine):
    """Too-short windows are rejected with a clear error; recognize
    before the ring fills falls back (via OverflowError)."""
    with pytest.raises(ValueError, match="2.5 s"):
        DeviceIncrementalFingerprinter(engine.config, window_seconds=1.0)
    inc = DeviceIncrementalFingerprinter(engine.config, window_seconds=4.0)
    inc.feed(np.zeros(CHUNK, np.float32))
    assert not inc.ready
    with pytest.raises(OverflowError):
        inc.fingerprints()


def test_frame_overflow_signals_no_escalation(engine):
    """A single STFT column past the 128-peak frame capacity cannot be
    fixed by raising the TOTAL peak capacity — the overflow must carry
    escalate=False so StreamRecognizer falls back immediately instead of
    burning ~10 futile recompiles doubling toward 1<<22."""
    inc = DeviceIncrementalFingerprinter(engine.config, window_seconds=4.0)
    song = synth_song(0, duration_s=8.0, seed=50).astype(np.float32)
    fed = 0
    while not inc.ready:
        inc.feed(song[fed: fed + CHUNK])
        fed += CHUNK

    # poke a dense column (256 mask bins) into the window's interior —
    # the cached ring rows feed the fingerprint mask directly
    w = inc.window_frames
    row = int((inc._t - w // 2) % inc.cap)
    inc._mask_ring = inc._mask_ring.at[row, 0:2048:8].set(True)

    with pytest.raises(OverflowError) as ei:
        inc.fingerprints()
    assert getattr(ei.value, "escalate", True) is False
    # and even a huge capacity cannot clear it (the point of the flag)
    with pytest.raises(OverflowError):
        inc.fingerprints(capacity=1 << 16)
