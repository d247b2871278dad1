"""Batched multi-query recognition == per-clip recognition."""

import numpy as np
import pytest

from shazam_tpu import SIA
from shazam_tpu.audio.synth import synth_corpus, synth_song

N_SONGS = 5
DUR = 10.0


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("bcorpus")
    files = [f for f, _ in synth_corpus(str(d), N_SONGS, duration_s=DUR, seed=11)]
    sia = SIA()
    sia.ingest_files(files, batch_size=4)
    return sia


def test_batched_matches_single(engine):
    clips = []
    for sid in range(N_SONGS):
        song = synth_song(sid, duration_s=DUR, seed=11)
        start = int((1.0 + sid) * 44100)
        clips.append(song[start : start + 5 * 44100])

    batched = engine.recognize_batch(clips, topn=3)
    assert len(batched) == N_SONGS
    for sid, out in enumerate(batched):
        single = engine.recognize_samples([clips[sid]], topn=3)
        assert out["results"][0]["song_name"] == f"track{sid:06d}"
        got = [(r["song_id"], r["offset"], r["hashes_matched_in_input"])
               for r in out["results"]]
        ref = [(r["song_id"], r["offset"], r["hashes_matched_in_input"])
               for r in single["results"]]
        assert got == ref
        assert out["total_matches"] == single["total_matches"]


def test_batched_empty():
    sia = SIA()
    assert sia.recognize_batch([]) == []


def test_batched_sparse_equals_dense():
    """The vmapped sparse matcher must equal the vmapped dense one."""
    import jax.numpy as jnp
    import numpy as np
    from shazam_tpu.match.batched import match_queries_batched

    rng = np.random.default_rng(7)
    n, n_songs, stride = 50_000, 300, 512
    hi = rng.integers(0, 1 << 10, n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 4, n, dtype=np.uint32)
    ex = rng.integers(0, 1 << 2, n, dtype=np.uint32)
    sid = rng.integers(0, n_songs, n, dtype=np.uint32)
    off = rng.integers(0, 500, n, dtype=np.uint32)
    order = np.lexsort((off, sid, ex, lo, hi))
    cols = tuple(jnp.asarray(a[order]) for a in (hi, lo, ex))
    cols = cols + (jnp.asarray(sid[order] * np.uint32(stride) + off[order]),)

    Bq, Q = 3, 256
    qi = rng.integers(0, n, (Bq, Q))
    args = (cols,
            jnp.asarray(hi[qi]), jnp.asarray(lo[qi]), jnp.asarray(ex[qi]),
            jnp.asarray(rng.integers(0, 100, (Bq, Q)).astype(np.uint32)),
            jnp.asarray(np.ones((Bq, Q), bool)),
            jnp.asarray(np.ones((Bq, Q), bool)))
    kw = dict(n_songs=n_songs, delta_min=-128, delta_range=768,
              match_capacity=16384, topn=2, offset_stride=stride)
    dense = match_queries_batched(*args, sparse=False, **kw)
    sp = match_queries_batched(*args, sparse=True, **kw)
    for a, b in zip(sp, dense):
        assert np.array_equal(np.asarray(a), np.asarray(b))
