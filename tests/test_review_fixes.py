"""Regressions for the round-2 whole-package review findings.

Contracts pinned here:

- every QUERY path escalates peak capacity instead of silently
  truncating a long clip's tail (the reference handles any clip length,
  ``recognizer.py:289-338``);
- ``recognize_batch`` detects per-clip peak overflow and re-runs that
  clip alone, results identical to ``recognize_samples``;
- ``q_pad_to`` (the serving warmup knob) never changes results;
- in-memory WAV decode (`read_wav_bytes`) is bit-identical to ``read``,
  including float WAVs with chunks before ``fmt ``;
- the ffmpeg probe fails loudly when the sample rate can't be parsed
  (a silent 44100 default would pitch-shift every hash).
"""

import io
import struct
import wave

import numpy as np
import pytest

from shazam_tpu import SIA, FingerprintConfig
from shazam_tpu.audio.synth import synth_song

FS = 44100


def _hash_set(fp):
    v = np.asarray(fp.valid)
    return set(zip(np.asarray(fp.hi)[v].tolist(),
                   np.asarray(fp.lo)[v].tolist(),
                   np.asarray(fp.ex)[v].tolist(),
                   np.asarray(fp.t1)[v].tolist()))


def test_fingerprint_channel_escalates_capacity():
    clip = np.asarray(synth_song(0, duration_s=20.0, seed=3), np.float32)
    small = SIA(FingerprintConfig(peak_capacity=128))
    big = SIA(FingerprintConfig())
    fp_s = small._fingerprint_channel(clip)
    fp_b = big._fingerprint_channel(clip)
    assert int(fp_b.n_peaks) > 128  # the clip really overflows 128
    # escalation found a fitting capacity: same peaks, same hash set
    assert int(fp_s.n_peaks) == int(fp_b.n_peaks)
    assert _hash_set(fp_s) == _hash_set(fp_b)


def test_recognize_batch_peak_overflow_matches_solo():
    cfg = FingerprintConfig(peak_capacity=192)
    sia = SIA(cfg)
    songs = [
        (f"t{i}", np.asarray(synth_song(i, duration_s=8.0, seed=11),
                             np.float32))
        for i in range(3)
    ]
    sia.ingest_arrays(songs)

    long_clip = np.asarray(
        synth_song(1, duration_s=8.0, seed=11), np.float32)[: int(7.5 * FS)]
    short_clip = np.asarray(
        synth_song(2, duration_s=8.0, seed=11), np.float32)[: int(2.5 * FS)]
    # the long clip must overflow the tiny capacity (else the test is vacuous)
    over = sia._fingerprint_channel(long_clip)
    assert int(over.n_peaks) > cfg.peak_capacity

    outs = sia.recognize_batch([long_clip, short_clip])
    for clip, out in zip((long_clip, short_clip), outs):
        solo = sia.recognize_samples([clip])
        assert out["results"] == solo["results"]
        assert out["total_matches"] == solo["total_matches"]
        assert out["input_hashes"] == solo["input_hashes"]
    assert outs[0]["results"][0]["song_name"] == "t1"
    assert outs[1]["results"][0]["song_name"] == "t2"


def test_q_pad_to_identity():
    sia = SIA()
    songs = [
        (f"t{i}", np.asarray(synth_song(i, duration_s=8.0, seed=21),
                             np.float32))
        for i in range(2)
    ]
    sia.ingest_arrays(songs)
    clip = np.asarray(synth_song(1, duration_s=8.0, seed=21),
                      np.float32)[: int(4.0 * FS)]
    base = sia.recognize_samples([clip])
    padded = sia.recognize_samples([clip], q_pad_to=8192)
    assert padded["results"] == base["results"]
    assert padded["input_hashes"] == base["input_hashes"]
    bouts = sia.recognize_batch([clip, clip], q_pad_to=8192)
    for out in bouts:
        assert out["results"] == base["results"]
    # a silent clip through the padded path (what warmup sends)
    silent = np.zeros(int(4.0 * FS), np.float32)
    out = sia.recognize_samples([silent], q_pad_to=4096)
    assert out["results"] == []
    bo = sia.recognize_batch([silent, silent], q_pad_to=4096)
    assert all(o["results"] == [] for o in bo)


# ---- audio/io ---------------------------------------------------------


def _pcm_wav_bytes(samples: np.ndarray, fs: int = FS) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(fs)
        wf.writeframes(samples.astype(np.int16).tobytes())
    return buf.getvalue()


def _float_wav_bytes(samples_f32: np.ndarray, fs: int = FS,
                     junk: int = 0) -> bytes:
    """Hand-rolled IEEE-float WAV, optionally with a JUNK chunk before
    fmt (common encoder output; a raw header sniff misreads these)."""
    data = samples_f32.astype("<f4").tobytes()
    chunks = b""
    if junk:
        chunks += b"JUNK" + struct.pack("<I", junk) + b"\x00" * junk
    chunks += b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, fs, fs * 4, 4, 32)
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_read_wav_bytes_matches_read(tmp_path):
    from shazam_tpu.audio.io import read, read_wav_bytes

    samples = (np.asarray(synth_song(0, duration_s=2.0, seed=5))
               ).astype(np.int16)
    blob = _pcm_wav_bytes(samples)
    p = tmp_path / "a.wav"
    p.write_bytes(blob)
    ch_f, fs_f, _sha = read(str(p))
    ch_b, fs_b = read_wav_bytes(blob)
    assert fs_f == fs_b == FS
    assert len(ch_f) == len(ch_b) == 1
    np.testing.assert_array_equal(ch_f[0], ch_b[0])
    # limit honored identically
    ch_b1, _ = read_wav_bytes(blob, limit=1.0)
    ch_f1, _, _ = read(str(p), limit=1.0)
    np.testing.assert_array_equal(ch_f1[0], ch_b1[0])
    with pytest.raises(ValueError, match="RIFF"):
        read_wav_bytes(b"\x00" * 64)


def test_float_wav_with_junk_chunk(tmp_path):
    from shazam_tpu.audio.io import read, read_wav_bytes

    f = np.linspace(-0.5, 0.5, 4096, dtype=np.float32)
    blob = _float_wav_bytes(f, junk=100)
    p = tmp_path / "f.wav"
    p.write_bytes(blob)
    ch_f, fs_f, _sha = read(str(p))
    ch_b, fs_b = read_wav_bytes(blob)
    assert fs_f == fs_b == FS
    np.testing.assert_array_equal(ch_f[0], ch_b[0])
    expect = np.clip(f * 32768.0, -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(ch_b[0], expect)


def test_ffmpeg_probe_requires_sample_rate(monkeypatch, tmp_path):
    from shazam_tpu.audio import io as aio

    class _Probe:
        returncode = 1
        stdout = b""
        stderr = "  Stream #0:0: Audio: mp3, stereo, fltp, 128 kb/s\n"

    monkeypatch.setattr(aio, "_FFMPEG", "ffmpeg")
    monkeypatch.setattr(aio.subprocess, "run", lambda *a, **k: _Probe())
    with pytest.raises(ValueError, match="sample rate"):
        aio._read_via_ffmpeg("x.mp3", None)


def test_load_index_reconciles_orphaned_catalog_rows(tmp_path):
    """Durability invariant: a catalog row marked fingerprinted whose
    rows never made it into the saved index (crash / unpersisted online
    ingest) is purged at load so the song can re-ingest — otherwise the
    SHA-1 resume dedup skips it forever while recognition can't match."""
    db = str(tmp_path / "cat")
    song_a = np.asarray(synth_song(0, duration_s=6.0, seed=31), np.float32)
    song_b = np.asarray(synth_song(1, duration_s=6.0, seed=31), np.float32)

    sia = SIA(catalog_path=db + ".sqlite")
    sia.ingest_arrays([("a", song_a)])
    sia.save_index(db + ".npz")
    # online ingest that never persists, then the process "crashes"
    sia.ingest_channels("b", [song_b])
    assert {d["song_name"] for d in sia.catalog.get_songs()} == {"a", "b"}

    sia2 = SIA(catalog_path=db + ".sqlite")
    sia2.load_index(db + ".npz")
    assert {d["song_name"] for d in sia2.catalog.get_songs()} == {"a"}
    # b re-ingests cleanly (the stale flag no longer blocks the SHA dedup)
    st = sia2.ingest_channels("b", [song_b])
    assert st["ingested"] == 1
    clip = song_b[: int(4 * FS)]
    out = sia2.recognize_samples([clip])
    assert out["results"][0]["song_name"] == "b"


def test_load_index_drops_orphaned_index_rows(tmp_path):
    """The mirror-image tear: an online DELETE without --persist removes
    the sqlite row but the saved npz still holds the song's hash rows.
    After a reload the deleted song must not win matches under a bare
    numeric name — its orphan rows are dropped at load."""
    db = str(tmp_path / "cat")
    song_a = np.asarray(synth_song(0, duration_s=6.0, seed=47), np.float32)
    song_b = np.asarray(synth_song(1, duration_s=6.0, seed=47), np.float32)

    sia = SIA(catalog_path=db + ".sqlite")
    sia.ingest_arrays([("a", song_a), ("b", song_b)])
    sia.save_index(db + ".npz")
    doomed = [d["song_id"] for d in sia.catalog.get_songs()
              if d["song_name"] == "b"]
    sia.delete_songs(doomed)   # sqlite commits; the npz is NOT re-saved

    sia2 = SIA(catalog_path=db + ".sqlite")
    sia2.load_index(db + ".npz")
    assert {d["song_name"] for d in sia2.catalog.get_songs()} == {"a"}
    clip = song_b[: int(4 * FS)]
    out = sia2.recognize_samples([clip])
    assert all(r["song_id"] != doomed[0] for r in out["results"])
    # and the surviving song still matches normally
    out = sia2.recognize_samples([song_a[: int(4 * FS)]])
    assert out["results"][0]["song_name"] == "a"
