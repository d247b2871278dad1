"""Song-sharded catalog matching == single-device matching (8-dev mesh)."""

import numpy as np
import pytest

from tests.test_match import (
    _build_db, _index_from_rows, _query_from_pairs, _random_hex,
)


@pytest.fixture(scope="module")
def mesh():
    import jax
    from shazam_tpu.parallel.mesh import make_mesh

    assert jax.device_count() >= 8
    return make_mesh(8)


@pytest.mark.parametrize("seed", [1, 4])
def test_song_sharded_matches_single(mesh, seed):
    import jax.numpy as jnp
    from shazam_tpu.match.lookup import match_query
    from shazam_tpu.parallel.bigcatalog import (
        shard_index_by_song, sharded_match_by_song,
    )

    rng = np.random.default_rng(seed)
    rows = _build_db(rng, n_songs=24, rows_per_song=200)
    index = _index_from_rows(rows)

    true_sid = 13
    song_rows = [r for r in rows if r[1] == true_sid]
    q_pairs = sorted(
        {(h, max(off - 9, 0)) for h, _s, off in song_rows[:100]}
        | {(h, int(rng.integers(0, 200))) for h in _random_hex(rng, 30)}
    )
    q = _query_from_pairs(q_pairs)
    delta_min = -(index.max_offset + 100)
    delta_range = 2 * (index.max_offset + 100)
    qargs = tuple(jnp.asarray(a)
                  for a in (q.hi, q.lo, q.ex, q.t, q.valid, q.first))

    single = match_query(
        index.device_arrays(), *qargs,
        n_songs=index.n_songs, delta_min=delta_min, delta_range=delta_range,
        match_capacity=65536, topn=4, offset_stride=index.offset_stride,
    )

    stacked, n_local, stride = shard_index_by_song(index, 8)
    sharded = sharded_match_by_song(
        mesh, stacked, n_local, stride, *qargs,
        delta_min=delta_min, delta_range=delta_range,
        match_capacity=65536, topn=4,
    )

    n = min(4, int(single.n_ranked))
    got = [(int(sharded.top_songs[i]), int(sharded.top_deltas[i]),
            int(sharded.top_votes[i]), int(sharded.row_counts[i]))
           for i in range(n)]
    ref = [(int(single.top_songs[i]), int(single.top_deltas[i]),
            int(single.top_votes[i]), int(single.row_counts[i]))
           for i in range(n)]
    assert got == ref
    assert int(sharded.total_rows) == int(single.total_rows)
    assert int(sharded.n_ranked) == int(single.n_ranked)


def _synth_big_index(n_songs, rows_per_song, rng, planted):
    """Vectorized synthetic index: unique keys derived by bit-mixing the
    row number (no SHA-1 cost at 10^5-song scale), plus planted songs with
    known rows for exact expectations.

    planted: dict sid -> list of (key_seed, offset).
    """
    from shazam_tpu.index.store import FingerprintIndex, _sort_entries

    n = n_songs * rows_per_song
    row = np.arange(n, dtype=np.uint64)
    # splitmix-style mixing -> effectively unique 64-bit values
    z = (row + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    hi = (z >> np.uint64(32)).astype(np.uint32) | np.uint32(0x80000000)
    lo = z.astype(np.uint32)
    ex = ((z >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.uint32)
    sid = np.repeat(
        np.arange(n_songs, dtype=np.uint32), rows_per_song
    )
    max_off = 16383  # stride 16384: exercises the uint32 packing edge
    off = rng.integers(0, max_off + 1, n, dtype=np.uint32)

    extra = []
    for p_sid, rows in planted.items():
        for seed, p_off in rows:
            extra.append((np.uint32(seed), np.uint32(~seed & 0xFFFFFFFF),
                          np.uint32(seed & 0x7FFF), np.uint32(p_sid),
                          np.uint32(p_off)))
    if extra:
        e = np.array(extra, np.uint32)
        # planted keys use hi < 0x80000000 -> cannot collide with synthetic
        hi = np.concatenate([hi, e[:, 0] & np.uint32(0x7FFFFFFF)])
        lo = np.concatenate([lo, e[:, 1]])
        ex = np.concatenate([ex, e[:, 2]])
        sid = np.concatenate([sid, e[:, 3]])
        off = np.concatenate([off, e[:, 4]])
    cols = _sort_entries(hi, lo, ex, sid, off)
    return FingerprintIndex(*cols, n_songs=n_songs, max_offset=max_off)


def test_song_sharded_at_catalog_scale(mesh):
    """The by-song regime at the scale it exists for: 10^5 songs
    (12,500 local songs/shard), uint32 payload packing at the stride
    edge, round-robin boundary ids (0, 99_999) — expectations exact by
    construction (reference real scale: fingerprints_queries.sql:2-3)."""
    import jax.numpy as jnp
    from shazam_tpu.parallel.bigcatalog import (
        shard_index_by_song, sharded_match_by_song,
    )

    rng = np.random.default_rng(9)
    n_songs = 100_000
    # planted song 99_999: 80 rows at the top of the offset range (its
    # local id 12_499 on shard 7 packs to ~2.05e8, near the shard's max)
    hit_rows = [(1000 + i, 16303 + i) for i in range(80)]
    # planted song 0: 40 rows at the bottom boundary
    low_rows = [(500_000 + i, 10 + i) for i in range(40)]
    index = _synth_big_index(
        n_songs, rows_per_song=3, rng=rng,
        planted={99_999: hit_rows, 0: low_rows},
    )
    assert index.n_hashes == n_songs * 3 + 120
    assert index.offset_stride == 16384

    stacked, n_local, stride = shard_index_by_song(index, 8)
    assert n_local == 12_500
    assert stride == 16384

    def run_query(rows, shift):
        pairs_hi = np.array([np.uint32(s) & np.uint32(0x7FFFFFFF)
                             for s, _ in rows], np.uint32)
        pairs_lo = np.array([np.uint32(~np.uint32(s)) for s, _ in rows],
                            np.uint32)
        pairs_ex = np.array([np.uint32(s) & np.uint32(0x7FFF)
                             for s, _ in rows], np.uint32)
        t = np.array([off - shift for _s, off in rows], np.uint32)
        n = len(rows)
        cap = 256
        pad = cap - n
        order = np.lexsort((t, pairs_ex, pairs_lo, pairs_hi))
        q = [np.pad(a[order], (0, pad)) for a in
             (pairs_hi, pairs_lo, pairs_ex, t)]
        valid = np.pad(np.ones(n, bool), (0, pad))
        return sharded_match_by_song(
            mesh, stacked, n_local, stride,
            *(jnp.asarray(a) for a in q),
            jnp.asarray(valid), jnp.asarray(valid),
            delta_min=-128, delta_range=256, match_capacity=4096, topn=4,
        )

    raw = run_query(hit_rows, shift=7)
    assert int(raw.top_songs[0]) == 99_999
    assert int(raw.top_votes[0]) == 80      # all aligned at delta +7
    assert int(raw.top_deltas[0]) == 7
    assert int(raw.row_counts[0]) == 80
    assert int(raw.total_rows) == 80        # unique keys -> no other hits

    raw = run_query(low_rows, shift=3)
    assert int(raw.top_songs[0]) == 0
    assert int(raw.top_votes[0]) == 40
    assert int(raw.top_deltas[0]) == 3
    assert int(raw.total_rows) == 40


def test_sharded_heads_match_headless(mesh):
    """Per-shard bucket-CDF heads must not change either regime's result
    (8K rows/shard — large enough that the head path really engages)."""
    import jax
    import jax.numpy as jnp
    from shazam_tpu.index.search import build_head, head_bits_for
    from shazam_tpu.parallel.mesh import shard_index_arrays
    from shazam_tpu.parallel.sharded import sharded_match_query
    from shazam_tpu.parallel.bigcatalog import (
        shard_index_by_song, sharded_match_by_song,
    )

    rng = np.random.default_rng(9)
    rows = _build_db(rng, n_songs=40, rows_per_song=1700)  # 68K rows
    index = _index_from_rows(rows)

    song_rows = [r for r in rows if r[1] == 7]
    q_pairs = sorted(
        {(h, max(off - 4, 0)) for h, _s, off in song_rows[:200]}
        | {(h, int(rng.integers(0, 200))) for h in _random_hex(rng, 50)}
    )
    q = _query_from_pairs(q_pairs)
    delta_min = -(index.max_offset + 100)
    delta_range = 2 * (index.max_offset + 100)
    qargs = tuple(jnp.asarray(a)
                  for a in (q.hi, q.lo, q.ex, q.t, q.valid, q.first))

    def raws_equal(a, b):
        return all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(a, b))

    # key-range regime
    shards = tuple(jnp.asarray(a) for a in shard_index_arrays(index, 8))
    bits = head_bits_for(shards[0].shape[1])
    heads = jax.vmap(lambda h: build_head(h, bits=bits))(shards[0])
    kw = dict(n_songs=index.n_songs, delta_min=delta_min,
              delta_range=delta_range, match_capacity=65536, topn=4,
              offset_stride=index.offset_stride)
    no_head = sharded_match_query(mesh, shards, *qargs, **kw)
    with_head = sharded_match_query(mesh, shards, *qargs,
                                    sharded_head=heads, **kw)
    assert raws_equal(no_head, with_head)

    # by-song regime
    stacked, n_local, stride = shard_index_by_song(index, 8)
    stacked = tuple(jnp.asarray(a) for a in stacked)
    bits = head_bits_for(stacked[0].shape[1])
    heads = jax.vmap(lambda h: build_head(h, bits=bits))(stacked[0])
    kw2 = dict(delta_min=delta_min, delta_range=delta_range,
               match_capacity=65536, topn=4)
    no_head = sharded_match_by_song(mesh, stacked, n_local, stride,
                                    *qargs, **kw2)
    with_head = sharded_match_by_song(mesh, stacked, n_local, stride,
                                      *qargs, sharded_head=heads, **kw2)
    assert raws_equal(no_head, with_head)


def test_by_song_sum_over_nominal_cap_is_exact_not_overflow(mesh):
    """Every by-song shard expands with the FULL match_capacity, so a
    psum'd total above the nominal cap with every shard under its own
    cap is EXACT — it must neither clamp total_rows nor read as
    overflow against effective_match_capacity."""
    import jax.numpy as jnp
    from shazam_tpu.parallel.bigcatalog import (
        effective_match_capacity, shard_index_by_song, sharded_match_by_song,
    )

    rng = np.random.default_rng(23)
    # 24 songs round-robin over 8 shards; each shard owns ~600 rows
    rows = sorted(set(_build_db(rng, n_songs=24, rows_per_song=200)))
    index = _index_from_rows(rows)
    # query EVERY row once: per-shard totals ~600 <= cap 1024, global
    # sum ~4800 > 1024
    q_pairs = sorted({(h, 0) for h, _s, _o in rows})[:4096]
    q_hashes = {h for h, _t in q_pairs}
    q = _query_from_pairs(q_pairs, pad_to=4096)
    stacked, n_local, stride = shard_index_by_song(index, 8)
    raw = sharded_match_by_song(
        mesh, stacked, n_local, stride,
        jnp.asarray(q.hi), jnp.asarray(q.lo), jnp.asarray(q.ex),
        jnp.asarray(q.t), jnp.asarray(q.valid), jnp.asarray(q.first),
        delta_min=-(index.max_offset + 100),
        delta_range=2 * (index.max_offset + 100),
        match_capacity=1024, topn=4,
    )
    total = int(raw.total_rows)
    assert total > 1024                       # sum over the nominal cap
    assert total <= effective_match_capacity(1024, 8)   # ...but exact
    assert total == sum(1 for h, _s, _o in rows if h in q_hashes)


def test_by_song_hot_shard_overflow_clamps_total(mesh):
    """One shard's local expansion overflow must clamp total_rows above
    the EFFECTIVE bound so callers flag/escalate."""
    import jax.numpy as jnp
    from shazam_tpu.parallel.bigcatalog import (
        effective_match_capacity, shard_index_by_song, sharded_match_by_song,
    )

    rng = np.random.default_rng(29)
    rows = sorted(set(_build_db(rng, n_songs=8, rows_per_song=100)))
    hot = _random_hex(rng, 1)[0]
    rows += [(hot, 2, int(off)) for off in range(3000)]  # song 2's shard
    index = _index_from_rows(sorted(set(rows)))

    q = _query_from_pairs([(hot, 3)], pad_to=256)
    stacked, n_local, stride = shard_index_by_song(index, 8)
    raw = sharded_match_by_song(
        mesh, stacked, n_local, stride,
        jnp.asarray(q.hi), jnp.asarray(q.lo), jnp.asarray(q.ex),
        jnp.asarray(q.t), jnp.asarray(q.valid), jnp.asarray(q.first),
        delta_min=-(index.max_offset + 100),
        delta_range=2 * (index.max_offset + 100),
        match_capacity=1024, topn=4,
    )
    assert int(raw.total_rows) > effective_match_capacity(1024, 8)
