"""Bounded-memory streaming ingest + linear-time index merge.

The reference's pool streams song-by-song (``__init__.py:335-357``) so
host memory never holds the corpus; ingest here must do the same:
peak decoded-but-unprocessed channels stays O(batch), finished songs merge
into the index in sorted-run chunks, and results are identical to the
one-shot in-memory path.
"""

import numpy as np
import pytest

from tests.test_match import _build_db, _index_from_rows, _random_hex


def _random_index(rng, n_songs=5, rows_per_song=200):
    return _index_from_rows(_build_db(rng, n_songs=n_songs,
                                      rows_per_song=rows_per_song))


@pytest.mark.parametrize("seed", [0, 1, 7])
def test_merge_into_equals_merge_indices(seed):
    """merge_into (two-run ~O(n) merge + local repair) must produce
    element-identical arrays to the full concat+lexsort."""
    from shazam_tpu.index.store import merge_indices, merge_into

    rng = np.random.default_rng(seed)
    base = _random_index(rng, n_songs=4)
    add = _random_index(rng, n_songs=6)
    # force cross-run (hi, lo) collisions with mismatched ex/payload order:
    # copy some of base's keys into the addition with different ex values
    n_share = 40
    pick = rng.integers(0, base.n_hashes, n_share)
    add.key_hi[:n_share] = base.key_hi[pick]
    add.key_lo[:n_share] = base.key_lo[pick]
    add.key_ex[:n_share] = rng.integers(0, 1 << 16, n_share).astype(np.uint32)
    # re-sort the mutated addition so both inputs satisfy the precondition
    from shazam_tpu.index.store import _sort_entries

    cols = _sort_entries(add.key_hi, add.key_lo, add.key_ex,
                         add.song_id, add.offset)
    add.key_hi, add.key_lo, add.key_ex, add.song_id, add.offset = cols

    ref = merge_indices([base, add])
    got = merge_into(base, add)
    assert got.n_songs == ref.n_songs
    assert got.max_offset == ref.max_offset
    for name in ("key_hi", "key_lo", "key_ex", "song_id", "offset"):
        assert np.array_equal(getattr(got, name), getattr(ref, name)), name


def test_merge_into_empty_sides(rng):
    from shazam_tpu.index.store import merge_into, build_index

    base = _random_index(rng)
    empty = build_index([], n_songs=0)
    out = merge_into(base, empty)
    assert np.array_equal(out.key_hi, base.key_hi)
    out = merge_into(empty, base)
    assert np.array_equal(out.key_ex, base.key_ex)


@pytest.fixture(scope="module")
def wav_corpus(tmp_path_factory):
    from shazam_tpu.audio.synth import synth_corpus

    d = tmp_path_factory.mktemp("stream_corpus")
    return synth_corpus(str(d), 10, duration_s=8.0, seed=21)


def test_streaming_ingest_matches_oneshot(wav_corpus):
    """ingest_files (streaming, chunked merges) builds the same index as
    ingest_arrays of the same audio, and memory stays O(batch)."""
    from shazam_tpu import SIA
    from shazam_tpu.audio.io import read

    files = [f for f, _ in wav_corpus]
    sia = SIA()
    stats = sia.ingest_files(files, batch_size=4, merge_chunk_hashes=5000)
    assert stats["ingested"] == len(files)
    assert not stats["overflowed"]
    # chunked merges actually happened (not one corpus-sized sort)
    assert stats["merges"] >= 2
    # decoded-but-unprocessed channels bounded by ~2 batches (1 in flight)
    assert stats["peak_pending_channels"] <= 2 * 4

    # one-shot in-memory twin
    sia2 = SIA()
    named = []
    for f in files:
        ch, fs, _ = read(f)
        assert fs == 44100
        named.append((f, ch[0]))
    sia2.ingest_arrays(named)

    assert sia.index.n_hashes == sia2.index.n_hashes
    assert np.array_equal(sia.index.key_hi, sia2.index.key_hi)
    assert np.array_equal(sia.index.key_lo, sia2.index.key_lo)
    assert np.array_equal(sia.index.key_ex, sia2.index.key_ex)
    assert np.array_equal(sia.index.offset, sia2.index.offset)

    # recognition through the streamed index
    clip = read(files[3])[0][0][44100 : 44100 * 6]
    out = sia.recognize_samples([clip])
    assert out["results"]
    import os

    assert out["results"][0]["song_name"] == os.path.splitext(
        os.path.basename(files[3])
    )[0]


def test_streaming_ingest_resume(wav_corpus):
    """SHA-1 resume semantics survive the streaming rewrite."""
    from shazam_tpu import SIA

    files = [f for f, _ in wav_corpus]
    sia = SIA()
    s1 = sia.ingest_files(files[:4], batch_size=4)
    assert s1["ingested"] == 4
    s2 = sia.ingest_files(files, batch_size=4)
    assert s2["skipped"] == 4
    assert s2["ingested"] == len(files) - 4


def test_streaming_ingest_stereo(tmp_path):
    """Multi-channel WAVs stream through with per-song channel union."""
    from shazam_tpu import SIA
    from shazam_tpu.audio.synth import synth_song
    from shazam_tpu.audio.io import write_wav, read

    fs = 44100
    song = synth_song(1, duration_s=8.0, seed=5)
    # stereo: right channel slightly attenuated
    stereo = np.stack([song, (song * 0.7).astype(song.dtype)], axis=0)
    path = str(tmp_path / "stereo.wav")
    write_wav(path, stereo, fs)

    sia = SIA()
    stats = sia.ingest_files([path], batch_size=4)
    assert stats["ingested"] == 1
    assert stats["hashes"] > 100

    clip = song[fs : fs * 6]
    out = sia.recognize_samples([clip])
    assert out["results"][0]["song_name"] == "stereo"
