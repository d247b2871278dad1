"""Sharded index query on a virtual 8-device CPU mesh vs single-device."""

import numpy as np
import pytest

from tests.test_match import (
    _build_db, _index_from_rows, _query_from_pairs, _rows_by_hash, _random_hex,
)
from tests.oracle import oracle_align


@pytest.fixture(scope="module")
def mesh():
    import jax
    from shazam_tpu.parallel.mesh import make_mesh

    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def _match_args(index, q, topn=4):
    import jax.numpy as jnp

    delta_min = -(index.max_offset + 100)
    delta_range = 2 * (index.max_offset + 100)
    return dict(
        q_hi=jnp.asarray(q.hi), q_lo=jnp.asarray(q.lo), q_ex=jnp.asarray(q.ex),
        q_t=jnp.asarray(q.t), q_valid=jnp.asarray(q.valid),
        q_first=jnp.asarray(q.first),
        n_songs=index.n_songs, delta_min=delta_min, delta_range=delta_range,
        match_capacity=65536, topn=topn,
    )


@pytest.mark.parametrize("seed", [0, 3])
def test_sharded_matches_single_device(mesh, seed):
    import jax.numpy as jnp
    from shazam_tpu.match.lookup import match_query
    from shazam_tpu.parallel.mesh import shard_index_arrays
    from shazam_tpu.parallel.sharded import sharded_match_query

    rng = np.random.default_rng(seed)
    rows = _build_db(rng, n_songs=8, rows_per_song=400)
    index = _index_from_rows(rows)

    true_sid = 5
    song_rows = [r for r in rows if r[1] == true_sid]
    q_pairs = sorted(
        {(h, max(off - 21, 0)) for h, _s, off in song_rows[:120]}
        | {(h, int(rng.integers(0, 300))) for h in _random_hex(rng, 40)}
    )
    q = _query_from_pairs(q_pairs)
    args = _match_args(index, q)

    single = match_query(index.device_arrays(), **args,
                         offset_stride=index.offset_stride)
    shards = tuple(jnp.asarray(a) for a in shard_index_arrays(index, 8))
    sharded = sharded_match_query(mesh, shards, **args,
                                  offset_stride=index.offset_stride)

    assert int(sharded.total_rows) == int(single.total_rows)
    assert np.array_equal(np.asarray(sharded.top_songs), np.asarray(single.top_songs))
    assert np.array_equal(np.asarray(sharded.top_deltas), np.asarray(single.top_deltas))
    assert np.array_equal(np.asarray(sharded.top_votes), np.asarray(single.top_votes))
    assert np.array_equal(np.asarray(sharded.row_counts), np.asarray(single.row_counts))

    # and both equal the oracle
    ranked, dedup = oracle_align(_rows_by_hash(rows), q_pairs, topn=4)
    got = [
        (int(sharded.top_songs[i]), int(sharded.top_deltas[i]), int(sharded.top_votes[i]))
        for i in range(min(4, int(sharded.n_ranked)))
    ]
    assert got == ranked


def test_sharded_ingest_step(mesh):
    import jax
    from shazam_tpu.parallel.sharded import sharded_ingest_step
    from shazam_tpu.ops.fingerprint import fingerprint_samples
    from shazam_tpu.audio.synth import synth_song

    n_b, blen = 8, 1 << 17
    batch = np.zeros((n_b, blen), np.float32)
    n_valid = np.zeros(n_b, np.int32)
    for i in range(n_b):
        song = synth_song(i, duration_s=2.0, seed=31)
        batch[i, : len(song)] = song
        n_valid[i] = len(song)

    fp = sharded_ingest_step(mesh, batch, n_valid, peak_capacity=2048)
    fp = jax.device_get(fp)

    # row 3 must equal the single-device result exactly
    ref = fingerprint_samples(
        batch[3], np.int32(n_valid[3]), peak_capacity=2048
    )
    v = np.asarray(fp.valid[3])
    rv = np.asarray(ref.valid)
    assert np.array_equal(v, rv)
    assert np.array_equal(np.asarray(fp.hi[3])[v], np.asarray(ref.hi)[rv])
    assert np.array_equal(np.asarray(fp.t1[3])[v], np.asarray(ref.t1)[rv])
    assert int(fp.n_peaks[3]) == int(ref.n_peaks)


def test_sharded_hot_shard_overflow_detected(mesh):
    """A popular hash concentrates its rows on ONE key-range shard: when
    that shard's expansion cap is exceeded the query must report overflow
    even though the global total stays under match_capacity."""
    import jax.numpy as jnp
    from shazam_tpu.parallel.mesh import shard_index_arrays
    from shazam_tpu.parallel.sharded import sharded_match_query

    rng = np.random.default_rng(11)
    rows = _build_db(rng, n_songs=4, rows_per_song=1000)
    hot = _random_hex(rng, 1)[0]
    # 5000 contiguous rows of one hash: with ~9000 rows over 8 row-balanced
    # shards (~1125 rows each) several shards are entirely hot (>1024 rows)
    rows += [(hot, 2, int(off)) for off in range(5000)]
    index = _index_from_rows(sorted(set(rows)))

    q = _query_from_pairs([(hot, 3)], pad_to=256)
    # match_capacity 8192 over 8 devices -> per-shard cap 1024
    args = _match_args(index, q)
    args["match_capacity"] = 8192
    shards = tuple(jnp.asarray(a) for a in shard_index_arrays(index, 8))
    raw = sharded_match_query(mesh, shards, **args,
                              offset_stride=index.offset_stride)
    # the true total (5000) is under the global cap, but hot shards
    # truncated their expansion: total_rows must be clamped above capacity
    assert int(raw.total_rows) > 8192
