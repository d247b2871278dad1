"""Index lookup + vote/align semantics vs the oracle (random synthetic data)."""

import hashlib

import numpy as np
import pytest

from tests.oracle import oracle_align


def _keys_from_hex(hexes):
    hi = np.array([int(h[0:8], 16) for h in hexes], np.uint32)
    lo = np.array([int(h[8:16], 16) for h in hexes], np.uint32)
    ex = np.array([int(h[16:20], 16) for h in hexes], np.uint32)
    return hi, lo, ex


def _random_hex(rng, n):
    return [
        hashlib.sha1(bytes(rng.integers(0, 256, 8, dtype=np.uint8))).hexdigest()[:20]
        for _ in range(n)
    ]


def _build_db(rng, n_songs=6, rows_per_song=300, shared_pool=80):
    """Random DB with a pool of hashes shared across songs (forces multi-row
    buckets) plus unique rows."""
    pool = _random_hex(rng, shared_pool)
    rows = []  # (hex, sid, offset)
    for sid in range(n_songs):
        for _ in range(rows_per_song):
            if rng.random() < 0.35:
                h = pool[int(rng.integers(0, shared_pool))]
            else:
                h = _random_hex(rng, 1)[0]
            rows.append((h, sid, int(rng.integers(0, 4000))))
    # dedupe exact (hash, sid, offset) triples like INSERT IGNORE
    rows = sorted(set(rows))
    return rows


def _rows_by_hash(rows):
    d = {}
    for h, sid, off in rows:
        d.setdefault(h.upper(), []).append((sid, off))
    return d


def _index_from_rows(rows):
    from shazam_tpu.index.store import build_index

    per_song = {}
    for h, sid, off in rows:
        per_song.setdefault(sid, []).append((h, off))
    entries = []
    for sid, pairs in per_song.items():
        hexes = [p[0] for p in pairs]
        hi, lo, ex = _keys_from_hex(hexes)
        off = np.array([p[1] for p in pairs], np.uint32)
        entries.append((sid, hi, lo, ex, off))
    return build_index(entries, n_songs=max(r[1] for r in rows) + 1)


def _query_from_pairs(pairs, pad_to=None):
    """pairs: [(hex, q_offset)] unique — build padded QueryPairs arrays."""
    from shazam_tpu.match.prepare import QueryPairs, _bucket

    pairs = sorted(set(pairs))
    hexes = [p[0] for p in pairs]
    hi, lo, ex = _keys_from_hex(hexes)
    t = np.array([p[1] for p in pairs], np.uint32)
    n = len(pairs)
    first = np.ones(n, bool)
    first[1:] = np.array([hexes[i] != hexes[i - 1] for i in range(1, n)])
    cap = pad_to or _bucket(max(n, 1))
    pad = cap - n
    return QueryPairs(
        np.pad(hi, (0, pad)), np.pad(lo, (0, pad)), np.pad(ex, (0, pad)),
        np.pad(t, (0, pad)), np.pad(np.ones(n, bool), (0, pad)),
        np.pad(first, (0, pad)), n,
    )


def _run_match(index, q, topn=3, match_capacity=65536):
    import jax.numpy as jnp
    from shazam_tpu.match.lookup import match_query

    delta_min = -(index.max_offset + 100)  # synthetic q offsets span the DB range
    delta_range = 2 * (index.max_offset + 100)
    return match_query(
        index.device_arrays(),
        jnp.asarray(q.hi), jnp.asarray(q.lo), jnp.asarray(q.ex),
        jnp.asarray(q.t), jnp.asarray(q.valid), jnp.asarray(q.first),
        n_songs=index.n_songs,
        delta_min=delta_min,
        delta_range=delta_range,
        match_capacity=match_capacity,
        topn=topn,
        offset_stride=index.offset_stride,
    )


def test_binary_search_bounds(rng):
    import jax.numpy as jnp
    from shazam_tpu.index.search import lexi_lower_bound, lexi_upper_bound

    hexes = _random_hex(rng, 500)
    hi, lo, ex = _keys_from_hex(hexes)
    order = np.lexsort((ex, lo, hi))
    hi, lo, ex = hi[order], lo[order], ex[order]
    # duplicate some keys to make non-trivial buckets
    hi = np.concatenate([hi, hi[:100]])
    lo = np.concatenate([lo, lo[:100]])
    ex = np.concatenate([ex, ex[:100]])
    order = np.lexsort((ex, lo, hi))
    hi, lo, ex = hi[order], lo[order], ex[order]

    q_idx = rng.integers(0, len(hi), 64)
    q_hi, q_lo, q_ex = hi[q_idx], lo[q_idx], ex[q_idx]
    lb = np.asarray(lexi_lower_bound(*map(jnp.asarray, (hi, lo, ex, q_hi, q_lo, q_ex))))
    ub = np.asarray(lexi_upper_bound(*map(jnp.asarray, (hi, lo, ex, q_hi, q_lo, q_ex))))

    packed = hi.astype(object) * (1 << 48) + lo.astype(object) * (1 << 16) + ex.astype(object)
    q_packed = (
        q_hi.astype(object) * (1 << 48) + q_lo.astype(object) * (1 << 16) + q_ex.astype(object)
    )
    ref_lb = np.searchsorted(packed, q_packed, side="left")
    ref_ub = np.searchsorted(packed, q_packed, side="right")
    assert np.array_equal(lb, ref_lb)
    assert np.array_equal(ub, ref_ub)


def test_binary_search_missing_keys(rng):
    import jax.numpy as jnp
    from shazam_tpu.index.search import lexi_lower_bound, lexi_upper_bound

    hexes = _random_hex(rng, 200)
    hi, lo, ex = _keys_from_hex(hexes)
    order = np.lexsort((ex, lo, hi))
    hi, lo, ex = hi[order], lo[order], ex[order]
    other = _random_hex(rng, 64)
    q_hi, q_lo, q_ex = _keys_from_hex(other)
    lb = np.asarray(lexi_lower_bound(*map(jnp.asarray, (hi, lo, ex, q_hi, q_lo, q_ex))))
    ub = np.asarray(lexi_upper_bound(*map(jnp.asarray, (hi, lo, ex, q_hi, q_lo, q_ex))))
    # keys absent => empty buckets
    assert np.array_equal(lb, ub)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_match_vs_oracle(seed):
    rng = np.random.default_rng(seed)
    rows = _build_db(rng)
    index = _index_from_rows(rows)
    by_hash = _rows_by_hash(rows)

    # query: mostly hashes of one song (the "true" match), some noise,
    # some repeated hashes at different offsets (multi-offset mapper case)
    true_sid = 2
    song_rows = [r for r in rows if r[1] == true_sid]
    q_pairs = []
    base = 37
    for h, _sid, off in song_rows[:150]:
        q_pairs.append((h, max(off - base, 0)))
    for h in _random_hex(rng, 30):  # absent hashes
        q_pairs.append((h, int(rng.integers(0, 200))))
    for h, _sid, off in song_rows[:10]:  # duplicate hash, second offset
        q_pairs.append((h, max(off - base, 0) + 5))
    q_pairs = sorted(set(q_pairs))

    raw = _run_match(index, _query_from_pairs(q_pairs), topn=4)
    ref_ranked, ref_dedup = oracle_align(by_hash, q_pairs, topn=4)

    total_ref = sum(
        len(by_hash.get(h.upper(), [])) for h, _ in q_pairs
    )
    assert int(raw.total_rows) == total_ref

    got = [
        (int(raw.top_songs[i]), int(raw.top_deltas[i]), int(raw.top_votes[i]))
        for i in range(min(4, int(raw.n_ranked)))
    ]
    assert got == ref_ranked
    for i, (sid, _d, _v) in enumerate(got):
        assert int(raw.row_counts[i]) == ref_dedup[sid]


def test_match_no_hits(rng):
    rows = _build_db(rng, n_songs=3, rows_per_song=50)
    index = _index_from_rows(rows)
    q_pairs = [(h, i) for i, h in enumerate(_random_hex(rng, 20))]
    raw = _run_match(index, _query_from_pairs(q_pairs))
    assert int(raw.total_rows) == 0
    assert int(raw.n_ranked) == 0


def test_index_save_load(tmp_path, rng):
    rows = _build_db(rng, n_songs=3, rows_per_song=50)
    index = _index_from_rows(rows)
    path = str(tmp_path / "idx.npz")
    index.save(path)
    from shazam_tpu.index.store import FingerprintIndex

    loaded = FingerprintIndex.load(path)
    assert loaded.n_hashes == index.n_hashes
    assert loaded.n_songs == index.n_songs
    assert np.array_equal(loaded.key_hi, index.key_hi)
    assert np.array_equal(loaded.offset, index.offset)


def test_apriori_without_exit_matches_full(rng):
    """Apriori accumulation over batches == one-shot matching when the
    2x margin never triggers early (tiny batches force multiple steps)."""
    import jax.numpy as jnp
    from shazam_tpu.match.apriori import match_query_apriori

    rows = _build_db(rng, n_songs=6, rows_per_song=150)
    index = _index_from_rows(rows)
    # two songs with near-equal support -> no early exit
    songs = [r for r in rows if r[1] in (1, 2)]
    q_pairs = sorted({(h, max(off - 5, 0)) for h, _s, off in songs[:160]})
    q = _query_from_pairs(q_pairs, pad_to=2048)

    full = _run_match(index, q, topn=3)
    raw, used, _clamped = match_query_apriori(
        index.device_arrays(), q,
        n_songs=index.n_songs,
        delta_min=-(index.max_offset + 100),
        delta_range=2 * (index.max_offset + 100),
        match_capacity=65536, topn=3, batch_size=64,
        offset_stride=index.offset_stride,
    )
    got = [(int(raw.top_songs[i]), int(raw.top_deltas[i]), int(raw.top_votes[i]))
           for i in range(min(3, int(raw.n_ranked)))]
    ref = [(int(full.top_songs[i]), int(full.top_deltas[i]), int(full.top_votes[i]))
           for i in range(min(3, int(full.n_ranked)))]
    # near-equal support: the 2x margin must never fire, so every batch
    # runs and the accumulated result is identical to the one-shot match.
    # Batching covers the TRUE pair count — pure-padding batches past
    # n_pairs are a wasted dispatch + host RTT each and are skipped.
    assert used == -(-q.n_pairs // 64) > 1
    assert got == ref
    assert int(raw.total_rows) == int(full.total_rows)


def test_apriori_early_exit_fires(rng):
    """A heavily skewed query makes the 2x-leader margin fire mid-sweep
    (the reference's distinguishing behavior, recognizer_apriori.py:303):
    batches_used < n_batches and the partial leader is the true song."""
    from shazam_tpu.match.apriori import match_query_apriori

    rows = _build_db(rng, n_songs=6, rows_per_song=150)
    index = _index_from_rows(rows)
    # query = many hashes of song 3 at one consistent offset shift (all
    # aligned votes land in a single delta bin -> huge vote leader whose
    # dedup row count dwarfs every other song's)
    song3 = [r for r in rows if r[1] == 3]
    q_pairs = sorted({(h, off + 7) for h, _s, off in song3[:400]})
    q = _query_from_pairs(q_pairs, pad_to=2048)

    raw, used, _clamped = match_query_apriori(
        index.device_arrays(), q,
        n_songs=index.n_songs,
        delta_min=-(index.max_offset + 100),
        delta_range=2 * (index.max_offset + 100),
        match_capacity=65536, topn=3, batch_size=256,
        offset_stride=index.offset_stride,
    )
    n_batches = -(-len(q.hi) // 256)
    assert used < n_batches, f"early exit never fired ({used}/{n_batches})"
    assert int(raw.top_songs[0]) == 3
    assert int(raw.top_votes[0]) > 0


def test_apriori_ondevice_equals_host_loop(rng):
    """The single-dispatch ``lax.while_loop`` apriori (zero host RTTs per
    margin check) must reproduce the host-loop variant exactly — same
    ranked results, same batches_used — in BOTH regimes: near-equal
    support (margin never fires, every batch runs) and a skewed query
    (exit fires mid-sweep)."""
    from shazam_tpu.match.apriori import (match_query_apriori,
                                          match_query_apriori_ondevice)

    rows = _build_db(rng, n_songs=6, rows_per_song=150)
    index = _index_from_rows(rows)
    kw = dict(
        n_songs=index.n_songs,
        delta_min=-(index.max_offset + 100),
        delta_range=2 * (index.max_offset + 100),
        match_capacity=65536, topn=3,
        offset_stride=index.offset_stride,
    )
    dev = index.device_arrays()

    # regime 1: two songs near-equal -> no exit, all batches run
    songs = [r for r in rows if r[1] in (1, 2)]
    q_pairs = sorted({(h, max(off - 5, 0)) for h, _s, off in songs[:160]})
    q1 = _query_from_pairs(q_pairs, pad_to=2048)
    # regime 2: heavily skewed -> exit fires mid-sweep
    song3 = [r for r in rows if r[1] == 3]
    q_pairs = sorted({(h, off + 7) for h, _s, off in song3[:400]})
    q2 = _query_from_pairs(q_pairs, pad_to=2048)

    for q, bs in ((q1, 64), (q2, 32)):
        host, used_h, cl_h = match_query_apriori(dev, q, batch_size=bs,
                                                 **kw)
        devr, used_d, cl_d = match_query_apriori_ondevice(
            dev, q, batch_size=bs, **kw)
        assert used_d == used_h
        assert cl_d == cl_h
        assert int(devr.total_rows) == int(host.total_rows)
        assert int(devr.n_ranked) == int(host.n_ranked)
        for i in range(min(3, int(host.n_ranked))):
            assert int(devr.top_songs[i]) == int(host.top_songs[i])
            assert int(devr.top_deltas[i]) == int(host.top_deltas[i])
            assert int(devr.top_votes[i]) == int(host.top_votes[i])
    # the skewed query must actually have exercised the early exit
    # (batch_size 32 over its ~150 dedup pairs -> several batches)
    _, used2, _ = match_query_apriori_ondevice(dev, q2, batch_size=32,
                                               **kw)
    assert used2 < -(-q2.n_pairs // 32)


def test_long_query_votes_not_dropped(rng):
    """Queries longer than the old fixed 1024-frame window (~47 s) must
    still count votes: the delta window now derives from the clip length
    (the reference handles any length, recognizer.py:289-338)."""
    from shazam_tpu.api import SIA
    from shazam_tpu.match.lookup import match_query
    import jax.numpy as jnp

    hexes = _random_hex(rng, 50)
    rows = [(h, 0, i) for i, h in enumerate(hexes)]
    index = _index_from_rows(rows)
    # query offsets near frame 3000 -> deltas ~ -3000, far below -1024
    q_pairs = [(h, off + 2990) for h, _s, off in rows]
    q = _query_from_pairs(q_pairs)

    sia = SIA(index=index)
    sia._ensure_device_index()
    # a 5 s clip stays in the baseline bucket (no recompile churn)
    assert sia._q_frames_for(5 * 44100) == 1024
    # a ~145 s clip gets a window that covers its deltas
    n_samples = 3100 * 2048 + 4096
    delta_min, delta_range = sia._delta_params_for(n_samples)
    assert delta_min <= -2990

    raw = match_query(
        index.device_arrays(),
        jnp.asarray(q.hi), jnp.asarray(q.lo), jnp.asarray(q.ex),
        jnp.asarray(q.t), jnp.asarray(q.valid), jnp.asarray(q.first),
        n_songs=index.n_songs, delta_min=delta_min, delta_range=delta_range,
        match_capacity=4096, topn=2, offset_stride=index.offset_stride,
    )
    assert int(raw.top_songs[0]) == 0
    assert int(raw.top_votes[0]) == 50  # every pair voted at delta -2990


def test_match_capacity_escalation_counts_every_row():
    """Hyper-common hashes can expand one query past match_capacity; the
    tiered retry must escalate until every row votes (reference counts
    ALL rows via SQL expansion) instead of truncating silently."""
    import dataclasses

    import numpy as np
    from shazam_tpu.api import SIA
    from shazam_tpu.audio.synth import synth_song
    from shazam_tpu.config import DEFAULT_CONFIG

    cfg = dataclasses.replace(
        DEFAULT_CONFIG, match_capacity_fast=64, match_capacity=128,
        match_capacity_max=1 << 15,
    )
    sia = SIA(config=cfg)
    songs = [(f"s{i}", synth_song(i, duration_s=4.0, seed=21))
             for i in range(3)]
    sia.ingest_arrays(songs)

    clip = songs[1][1][: 3 * 44100]
    out = sia.recognize_samples([clip])
    r0 = out["results"][0]
    # a 3 s self-clip matches far more than 128 rows; escalation must
    # land the right song with the full vote count and no overflow flag
    assert r0["song_name"] == "s1"
    assert r0["hashes_matched_in_input"] > 128
    assert not out["overflowed"]


def test_sparse_matcher_equals_dense():
    """match_query_sparse (sort + run-length count, no dense histogram)
    must be ELEMENT-IDENTICAL to the dense matcher."""
    import jax.numpy as jnp
    import numpy as np
    from shazam_tpu.match.lookup import match_query, match_query_sparse

    rng = np.random.default_rng(11)
    n, n_songs, stride = 200_000, 4000, 1024
    hi = rng.integers(0, 1 << 12, n, dtype=np.uint32)  # dense keys: many
    lo = rng.integers(0, 1 << 4, n, dtype=np.uint32)   # multi-row buckets
    ex = rng.integers(0, 1 << 2, n, dtype=np.uint32)
    sid = rng.integers(0, n_songs, n, dtype=np.uint32)
    off = rng.integers(0, 1000, n, dtype=np.uint32)
    # plant an aligned song
    plant = rng.choice(n, 400, replace=False)
    sid[plant] = 1234
    off[plant] = np.sort(rng.integers(60, 900, 400)).astype(np.uint32)
    order = np.lexsort((off, sid, ex, lo, hi))
    cols = tuple(jnp.asarray(a[order]) for a in (hi, lo, ex))
    cols = cols + (jnp.asarray(
        sid[order] * np.uint32(stride) + off[order]),)

    Q = 512
    q_hi, q_lo, q_ex = hi[plant], lo[plant], ex[plant]
    q_t = (off[plant].astype(np.int64) - 40).astype(np.uint32)

    def padq(a):
        out = np.zeros(Q, a.dtype)
        out[:400] = a
        return jnp.asarray(out)

    qv = jnp.asarray(np.arange(Q) < 400)
    kw = dict(n_songs=n_songs, delta_min=-256, delta_range=1536,
              match_capacity=65536, topn=2, offset_stride=stride)
    args = (cols, padq(q_hi), padq(q_lo), padq(q_ex), padq(q_t), qv, qv)

    dense = match_query(*args, **kw)
    sparse = match_query_sparse(*args, **kw)
    for a, b in zip(sparse, dense):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert int(sparse.top_songs[0]) == 1234
    # small-capacity clamp must agree too (truncated expansions)
    kw2 = dict(kw, match_capacity=1024)
    d2 = match_query(*args, **kw2)
    s2 = match_query_sparse(*args, **kw2)
    for a, b in zip(s2, d2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_pruned_matcher_equals_sparse():
    """match_query_pruned (candidate-pruned dense rank with an
    in-program lax.cond sort fallback) must be ELEMENT-IDENTICAL to the
    sort path UNCONDITIONALLY — whichever branch the exactness
    certificate selects."""
    import jax.numpy as jnp
    import numpy as np
    from shazam_tpu.match.lookup import (match_query, match_query_pruned,
                                         match_query_sparse)

    rng = np.random.default_rng(12)
    n, n_songs, stride = 200_000, 4000, 1024
    hi = rng.integers(0, 1 << 12, n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 4, n, dtype=np.uint32)
    ex = rng.integers(0, 1 << 2, n, dtype=np.uint32)
    sid = rng.integers(0, n_songs, n, dtype=np.uint32)
    off = rng.integers(0, 1000, n, dtype=np.uint32)
    # two planted songs: a strong winner and a clear runner-up, so the
    # strict certificate has a real gap to certify at topn=2
    plant = rng.choice(n, 400, replace=False)
    sid[plant] = 1234
    off[plant] = np.sort(rng.integers(60, 900, 400)).astype(np.uint32)
    plant2 = rng.choice(np.setdiff1d(np.arange(n), plant), 120,
                        replace=False)
    sid[plant2] = 777
    off[plant2] = (rng.integers(60, 900, 120) * 0 + 500).astype(np.uint32)
    order = np.lexsort((off, sid, ex, lo, hi))
    cols = tuple(jnp.asarray(a[order]) for a in (hi, lo, ex))
    cols = cols + (jnp.asarray(
        sid[order] * np.uint32(stride) + off[order]),)

    Q = 512
    q_hi, q_lo, q_ex = hi[plant], lo[plant], ex[plant]
    q_t = (off[plant].astype(np.int64) - 40).astype(np.uint32)

    def padq(a):
        out = np.zeros(Q, a.dtype)
        out[:400] = a
        return jnp.asarray(out)

    qv = jnp.asarray(np.arange(Q) < 400)
    kw = dict(n_songs=n_songs, delta_min=-256, delta_range=1536,
              match_capacity=65536, topn=2, offset_stride=stride)
    args = (cols, padq(q_hi), padq(q_lo), padq(q_ex), padq(q_t), qv, qv)

    sparse = match_query_sparse(*args, **kw)
    oks = {}
    for n_cand in (1, 64, 256, n_songs):
        pruned, ok = match_query_pruned(*args, n_candidates=n_cand, **kw)
        oks[n_cand] = bool(ok)
        for a, b in zip(pruned, sparse):
            assert np.array_equal(np.asarray(a), np.asarray(b)), n_cand
    assert int(pruned.top_songs[0]) == 1234
    # C = 1: only one candidate, top_votes[1] is forced to 0 while other
    # songs own votes — the certificate must fail closed (sort branch)
    assert not oks[1]
    # n_candidates >= n_songs degenerates to the exact dense rank and
    # the certificate is unconditionally true
    assert oks[n_songs]
    # dense parity too (three-way agreement)
    dense = match_query(*args, **kw)
    for a, b in zip(sparse, dense):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    # clamped expansion must agree too (truncated vote streams)
    kw2 = dict(kw, match_capacity=1024)
    s2 = match_query_sparse(*args, **kw2)
    p2, _ = match_query_pruned(*args, n_candidates=256, **kw2)
    for a, b in zip(p2, s2):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    # topn=1: the certificate needs the runner bound; results must agree
    kw1 = dict(kw, topn=1)
    s1 = match_query_sparse(*args, **kw1)
    p1, _ = match_query_pruned(*args, n_candidates=256, **kw1)
    for a, b in zip(p1, s1):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    # no-hit query: zero votes everywhere -> excluded_max == 0 path,
    # certificate true, result equals the sparse rank
    q_miss = jnp.asarray(np.full(Q, 0xFFFFFFF0, np.uint32))
    margs = (cols, q_miss, padq(q_lo), padq(q_ex), padq(q_t), qv, qv)
    pm, okm = match_query_pruned(*margs, n_candidates=64, **kw)
    sm = match_query_sparse(*margs, **kw)
    assert bool(okm)
    for a, b in zip(pm, sm):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_pruned_matcher_randomized_parity():
    """Randomized adversarial parity: many small random indexes / query
    mixes (hits, misses, ties), pruned == sparse element-identical at
    several candidate counts."""
    import jax.numpy as jnp
    import numpy as np
    from shazam_tpu.match.lookup import match_query_pruned, match_query_sparse

    for seed in range(6):
        rng = np.random.default_rng(100 + seed)
        n, n_songs, stride = 20_000, 64, 1024
        hi = rng.integers(0, 1 << 6, n, dtype=np.uint32)   # heavy ties
        lo = rng.integers(0, 1 << 2, n, dtype=np.uint32)
        ex = np.zeros(n, np.uint32)
        sid = rng.integers(0, n_songs, n, dtype=np.uint32)
        off = rng.integers(0, 400, n, dtype=np.uint32)
        order = np.lexsort((off, sid, ex, lo, hi))
        cols = tuple(jnp.asarray(a[order]) for a in (hi, lo, ex))
        cols = cols + (jnp.asarray(
            sid[order] * np.uint32(stride) + off[order]),)

        Q = 256
        pick = rng.integers(0, n, Q)
        q = (hi[pick], lo[pick], ex[pick],
             rng.integers(0, 100, Q).astype(np.uint32))
        qv = jnp.asarray(rng.random(Q) < 0.9)
        qf = jnp.asarray(rng.random(Q) < 0.7)
        kw = dict(n_songs=n_songs, delta_min=-128, delta_range=1280,
                  match_capacity=8192, topn=3, offset_stride=stride)
        args = (cols, *(jnp.asarray(a) for a in q), qv, qf)
        sparse = match_query_sparse(*args, **kw)
        for n_cand in (2, 16, 64):
            pruned, _ = match_query_pruned(*args, n_candidates=n_cand, **kw)
            for a, b in zip(pruned, sparse):
                assert np.array_equal(np.asarray(a), np.asarray(b)), (
                    seed, n_cand)


def test_scan_rank_equals_sparse_randomized():
    """_scan_vote_rank (sort + cumulative scans, scatter-free) must be
    ELEMENT-IDENTICAL to _sparse_vote_rank on adversarial vote streams:
    heavy (song, delta) ties, out-of-range deltas, OUT-OF-RANGE SONG IDS
    (sid >= n_songs — the scatter ranks drop them, caught live on a
    1-based-id stream at prod12288), invalid slots, no-vote streams,
    single-song catalogs, catalogs smaller than topn."""
    import jax.numpy as jnp
    from shazam_tpu.match.lookup import _scan_vote_rank, _sparse_vote_rank

    def run(rank, sid, delta, first, valid, **kw):
        return rank(jnp.asarray(sid), jnp.asarray(delta),
                    jnp.asarray(first), jnp.asarray(valid),
                    jnp.int32(int(valid.sum())), jnp.int32(3), **kw)

    for seed in range(8):
        rng = np.random.default_rng(200 + seed)
        cap = 4096
        n_songs = int(rng.choice([1, 2, 3, 64, 500]))
        delta_range = int(rng.choice([64, 1280]))
        delta_min = -32
        topn = int(rng.choice([1, 2, 3, 5]))
        # heavy ties: few distinct (song, delta) pairs; sid deliberately
        # overshoots n_songs (1-based-id streams carry sid == n_songs)
        sid = rng.integers(0, n_songs + int(rng.choice([0, 1, 3])),
                           cap).astype(np.int32)
        delta = (rng.integers(-64, delta_range, cap)
                 + delta_min).astype(np.int32)
        valid = rng.random(cap) < rng.choice([0.0, 0.05, 0.9])
        first = rng.random(cap) < 0.6
        kw = dict(n_songs=n_songs, delta_min=delta_min,
                  delta_range=delta_range, topn=topn)
        a = run(_sparse_vote_rank, sid, delta, first, valid, **kw)
        b = run(_scan_vote_rank, sid, delta, first, valid, **kw)
        for f in a._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(b, f)), np.asarray(getattr(a, f)),
                (seed, f, n_songs, topn))

    # targeted edges: all-invalid stream; exact vote tie between two
    # songs (smallest id wins); within-song delta tie (smallest delta)
    for sid_v, delta_v in (
        (np.zeros(64, np.int32), np.zeros(64, np.int32)),
        (np.array([5, 5, 2, 2] * 8, np.int32),
         np.array([7, 7, 9, 9] * 8, np.int32)),
        (np.array([3] * 32 + [3] * 32, np.int32),
         np.array([10] * 32 + [4] * 32, np.int32)),
    ):
        cap = sid_v.shape[0]
        for valid in (np.zeros(cap, bool), np.ones(cap, bool)):
            kw = dict(n_songs=8, delta_min=0, delta_range=64, topn=2)
            first = np.ones(cap, bool)
            a = run(_sparse_vote_rank, sid_v, delta_v, first, valid, **kw)
            b = run(_scan_vote_rank, sid_v, delta_v, first, valid, **kw)
            for f in a._fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(b, f)), np.asarray(getattr(a, f)), f)


def test_scan_matcher_equals_sparse():
    """match_query_sparse(vote_rank='scan') end-to-end parity with the
    sort rank: fitting and clamped capacities, scalar and blocked
    expansion, and the spanned variant."""
    import jax.numpy as jnp
    from shazam_tpu.match.lookup import (match_query_sparse,
                                         match_query_sparse_spanned)

    rng = np.random.default_rng(31)
    n, n_songs, stride = 200_000, 4000, 1024
    hi = rng.integers(0, 1 << 12, n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 4, n, dtype=np.uint32)
    ex = rng.integers(0, 1 << 2, n, dtype=np.uint32)
    sid = rng.integers(0, n_songs, n, dtype=np.uint32)
    off = rng.integers(0, 1000, n, dtype=np.uint32)
    plant = rng.choice(n, 400, replace=False)
    sid[plant] = 1234
    off[plant] = np.sort(rng.integers(60, 900, 400)).astype(np.uint32)
    order = np.lexsort((off, sid, ex, lo, hi))
    # pad to a 512 multiple so blocked expansion applies
    npad = -(-n // 512) * 512
    S = np.uint32(0xFFFFFFFF)

    def padded(a, fill):
        return jnp.asarray(np.concatenate(
            [a[order], np.full(npad - n, fill, np.uint32)]))

    cols = (padded(hi, S), padded(lo, S), padded(ex, S),
            padded(sid * np.uint32(stride) + off, 0))

    Q = 512
    q_hi, q_lo, q_ex = hi[plant], lo[plant], ex[plant]
    q_t = (off[plant].astype(np.int64) - 40).astype(np.uint32)

    def padq(a):
        out = np.zeros(Q, a.dtype)
        out[:400] = a
        return jnp.asarray(out)

    qv = jnp.asarray(np.arange(Q) < 400)
    kw = dict(n_songs=n_songs, delta_min=-256, delta_range=1536,
              topn=2, offset_stride=stride)
    args = (cols, padq(q_hi), padq(q_lo), padq(q_ex), padq(q_t), qv, qv)

    for cap in (65536, 1024):   # fitting + clamped
        for blk in (0, 512):
            ref = match_query_sparse(*args, match_capacity=cap,
                                     expand_block=blk, **kw)
            got = match_query_sparse(*args, match_capacity=cap,
                                     expand_block=blk, vote_rank="scan",
                                     **kw)
            for f in ref._fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(got, f)),
                    np.asarray(getattr(ref, f)), (f, cap, blk))
    assert int(got.top_songs[0]) == 1234

    # spanned variant: split the index into 2 sorted spans
    half = npad // 2
    spans = (tuple(c[:half] for c in cols), tuple(c[half:] for c in cols))
    sargs = (spans,) + args[1:]
    ref = match_query_sparse_spanned(*sargs, match_capacity=65536, **kw)
    got = match_query_sparse_spanned(*sargs, match_capacity=65536,
                                     vote_rank="scan", **kw)
    for a, b in zip(got[0], ref[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_blocked_expansion_parity():
    """expand_block > 0 (block-gather expansion): element-identical
    RawMatch to the scalar path at a fitting capacity, through both the
    sparse and pruned matchers, with and without a unique view."""
    import jax.numpy as jnp
    from shazam_tpu.index.search import build_unique_view, maybe_build_head
    from shazam_tpu.match.lookup import (match_query_pruned,
                                         match_query_sparse)

    rng = np.random.default_rng(17)
    n, n_songs, stride = 50000, 40, 4096
    hi = rng.integers(0, 200, n, dtype=np.uint32)      # few keys => runs
    lo = rng.integers(0, 4, n, dtype=np.uint32)
    ex = np.zeros(n, np.uint32)
    sid = rng.integers(0, n_songs, n, dtype=np.uint32)
    off = rng.integers(0, 3000, n, dtype=np.uint32)
    order = np.lexsort((off, sid, ex, lo, hi))
    hi, lo, ex, sid, off = (a[order] for a in (hi, lo, ex, sid, off))
    keep = np.ones(n, bool)
    same = (hi[1:] == hi[:-1]) & (lo[1:] == lo[:-1]) \
        & (sid[1:] == sid[:-1]) & (off[1:] == off[:-1])
    keep[1:] = ~same
    hi, lo, ex, sid, off = (a[keep] for a in (hi, lo, ex, sid, off))
    n = len(hi)
    npad = -(-n // 512) * 512
    S = np.uint32(0xFFFFFFFF)

    def padded(a):
        return jnp.asarray(np.concatenate(
            [a, np.full(npad - n, S, np.uint32)]))

    packed = sid * np.uint32(stride) + off
    dev = (padded(hi), padded(lo), padded(ex), padded(packed))
    head = maybe_build_head(dev[0])
    uview, usteps = build_unique_view(hi, lo, ex)

    q_n = 128
    pick = rng.integers(0, n, q_n)
    valid = np.ones(q_n, bool)
    valid[100:] = False
    q_hi = hi[pick].copy()
    q_hi[100:] = 0xFFFFFFFF
    q = (jnp.asarray(q_hi), jnp.asarray(lo[pick]), jnp.asarray(ex[pick]),
         jnp.asarray(rng.integers(0, 50, q_n).astype(np.uint32)),
         jnp.asarray(valid), jnp.asarray(valid))
    kw = dict(n_songs=n_songs, delta_min=-64, delta_range=stride + 128,
              match_capacity=1 << 16, topn=4, offset_stride=stride)

    for uv, us in ((None, 0), (uview, usteps)):
        ref = match_query_sparse(dev, *q, head=head, uview=uv,
                                 u_steps=us, **kw)
        for B in (128, 512):
            got = match_query_sparse(dev, *q, head=head, uview=uv,
                                     u_steps=us, expand_block=B, **kw)
            for f in ref._fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(got, f)),
                    np.asarray(getattr(ref, f)), (f, B, us))
        gp, ok = match_query_pruned(dev, *q, head=head, uview=uv,
                                    u_steps=us, expand_block=512,
                                    n_candidates=64, **kw)
        for f in ref._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(gp, f)), np.asarray(getattr(ref, f)),
                (f, "pruned", us))


def test_blocked_expansion_clamp_invariants():
    """Under clamp the blocked path keeps the whole-run contract: total
    exact, n_dropped counts excluded runs, included runs complete (all
    their votes present)."""
    import jax.numpy as jnp
    from shazam_tpu.match.lookup import _expand

    rng = np.random.default_rng(23)
    n, n_songs, stride = 40960, 20, 4096
    hi = np.sort(rng.integers(0, 8, n).astype(np.uint32))  # 8 hot runs
    lo = np.zeros(n, np.uint32)
    ex = np.zeros(n, np.uint32)
    sid = rng.integers(0, n_songs, n, dtype=np.uint32)
    off = rng.integers(0, 3000, n, dtype=np.uint32)
    order = np.lexsort((off, sid, ex, lo, hi))
    packed = (sid * np.uint32(stride) + off)[order]
    dev = tuple(jnp.asarray(a) for a in
                (hi, lo[order], ex[order], packed))

    q_n = 16
    q_hi = np.arange(8, dtype=np.uint32).repeat(2)
    q = (jnp.asarray(q_hi), jnp.asarray(np.zeros(q_n, np.uint32)),
         jnp.asarray(np.zeros(q_n, np.uint32)),
         jnp.asarray(np.arange(q_n, dtype=np.uint32)),
         jnp.asarray(np.ones(q_n, bool)))
    cap = 8192   # forces drops: total = 2 * 40960
    sid_b, delta_b, p_b, valid_b, total_b, nd_b = _expand(
        dev, *q, match_capacity=cap, offset_stride=stride,
        expand_block=512)
    total_b = int(total_b)
    assert total_b == 2 * n
    nd = int(nd_b)
    assert nd > 0
    # included runs are whole: per-lane kept counts are 0 or the lane's
    # true run length
    p_np = np.asarray(p_b)[np.asarray(valid_b)]
    kept = np.bincount(p_np, minlength=q_n)
    runs = np.bincount(q_hi[np.arange(q_n)], minlength=8)
    true_len = np.array([np.sum(hi == k) for k in range(8)])
    for lane in range(q_n):
        want = true_len[q_hi[lane]]
        assert kept[lane] in (0, want), (lane, kept[lane], want)
    assert int(np.sum(kept == 0)) == nd


def test_blocked_expansion_run_budget():
    """expand_runs caps the blocked expansion's nonempty-run budget:
    excess runs are DROPPED into n_dropped (never silent), total stays
    exact, included runs stay whole, and a budget >= the nonempty-run
    count is a no-op (element-identical stream semantics)."""
    import jax.numpy as jnp
    from shazam_tpu.match.lookup import _expand, _sparse_vote_rank

    rng = np.random.default_rng(29)
    n, n_songs, stride = 40960, 20, 4096
    hi = np.sort(rng.integers(0, 8, n).astype(np.uint32))  # 8 hot runs
    lo = np.zeros(n, np.uint32)
    ex = np.zeros(n, np.uint32)
    sid = rng.integers(0, n_songs, n, dtype=np.uint32)
    off = rng.integers(0, 3000, n, dtype=np.uint32)
    order = np.lexsort((off, sid, ex, lo, hi))
    packed = (sid * np.uint32(stride) + off)[order]
    dev = tuple(jnp.asarray(a) for a in (hi, lo[order], ex[order], packed))

    q_n = 64                      # 8 nonempty lanes, 56 padding lanes
    q_hi = np.full(q_n, 0xFFFFFFFF, np.uint32)
    q_hi[:8] = np.arange(8)
    valid = np.zeros(q_n, bool)
    valid[:8] = True
    q = (jnp.asarray(q_hi), jnp.asarray(np.zeros(q_n, np.uint32)),
         jnp.asarray(np.zeros(q_n, np.uint32)),
         jnp.asarray(np.arange(q_n, dtype=np.uint32)),
         jnp.asarray(valid))
    cap = 65536                   # fits all 8 runs (total = 40960)
    true_len = np.array([np.sum(hi == k) for k in range(8)])

    # budget >= nonempty runs: nothing dropped, stream much SHORTER
    # (cap/B + 2*8 blocks vs cap/B + 2*64)
    sid_b, _, p_b, valid_b, total_b, nd_b = _expand(
        dev, *q, match_capacity=cap, offset_stride=stride,
        expand_block=512, expand_runs=8)
    assert int(total_b) == n and int(nd_b) == 0
    assert sid_b.shape[0] == (cap // 512 + 2 * 8) * 512
    kept = np.bincount(np.asarray(p_b)[np.asarray(valid_b)],
                       minlength=q_n)
    np.testing.assert_array_equal(kept[:8], true_len)

    # budget < nonempty runs: exactly 5 whole runs kept (shortest-first
    # in BLOCK units — block-count ties break by lane order, so the
    # kept SET isn't pinned here), 3 dropped into n_dropped
    sid_s, _, p_s, valid_s, total_s, nd_s = _expand(
        dev, *q, match_capacity=cap, offset_stride=stride,
        expand_block=512, expand_runs=5)
    assert int(total_s) == n
    assert int(nd_s) == 3
    kept = np.bincount(np.asarray(p_s)[np.asarray(valid_s)],
                       minlength=q_n)
    for lane in range(8):
        assert kept[lane] in (0, true_len[lane]), (lane, kept[lane])
    assert int(np.sum(kept[:8] == 0)) == 3

    # rank-level: the budgeted stream feeds the rank with exact
    # n_dropped so the early-accept margin stays a valid proof
    raw = _sparse_vote_rank(
        sid_s, (np.zeros_like(np.asarray(sid_s))
                + jnp.zeros(sid_s.shape[0], jnp.int32)),
        jnp.ones(sid_s.shape[0], bool), valid_s, total_s, nd_s,
        n_songs=n_songs, delta_min=0, delta_range=8, topn=2)
    assert int(raw.n_dropped) == 3


def test_run_budget_api_fallback():
    """API level: a tiny expand_block_runs forces run drops on every
    query; the terminal scalar fallback keeps recognition EXACT (same
    results as the scalar baseline config)."""
    from shazam_tpu.api import SIA
    from shazam_tpu.audio import synth_song
    from shazam_tpu.config import FingerprintConfig

    songs = [np.atleast_2d(synth_song(i, duration_s=6.0, seed=300 + i))
             for i in range(4)]

    def run(cfg):
        sia = SIA(config=cfg)
        sia.ingest_arrays([(f"s{i}", ch[0]) for i, ch in enumerate(songs)])
        out = []
        for ch in songs:
            r = sia.recognize_samples([ch[0][44100:44100 * 5]])
            out.append((r["results"][0]["song_name"],
                        r["results"][0]["offset"],
                        r["results"][0]["hashes_matched_in_input"]))
        return out

    base = run(FingerprintConfig(sparse_vote_threshold=0))
    budg = run(FingerprintConfig(sparse_vote_threshold=0,
                                 vote_rank="scan", expand_block=512,
                                 expand_block_runs=2,
                                 expand_block_min_capacity=0))
    assert budg == base
    assert [s for s, *_ in base] == [f"s{i}" for i in range(4)]


def test_stacked_blocked_expansion_parity():
    """Blocked expansion over the CONSOLIDATED stacked spanned layout:
    element-identical RawMatch to the scalar stacked expansion at a
    fitting capacity (scan + sort ranks), and the run budget drops into
    n_dropped exactly like the flat path."""
    import jax.numpy as jnp
    from shazam_tpu.match.lookup import match_query_sparse_spanned

    rng = np.random.default_rng(31)
    n, n_songs, stride = 60000, 48, 4096
    hi = rng.integers(0, 300, n, dtype=np.uint32)      # few keys => runs
    lo = rng.integers(0, 4, n, dtype=np.uint32)
    ex = np.zeros(n, np.uint32)
    sid = rng.integers(0, n_songs, n, dtype=np.uint32)
    off = rng.integers(0, 3000, n, dtype=np.uint32)

    # two independently sorted spans, each padded to a 1024 multiple
    halves = (slice(0, n // 2), slice(n // 2, n))
    span_cols = []
    span_rows = -(-max(n - n // 2, n // 2) // 1024) * 1024
    S = np.uint32(0xFFFFFFFF)
    for sl in halves:
        o = np.lexsort((off[sl], sid[sl], ex[sl], lo[sl], hi[sl]))
        cols = []
        for a, fill in ((hi[sl], S), (lo[sl], S), (ex[sl], S),
                        (sid[sl] * np.uint32(stride) + off[sl], 0)):
            a = a[o]
            cols.append(np.concatenate(
                [a, np.full(span_rows - len(a), fill, np.uint32)]))
        span_cols.append(cols)
    stacked = tuple(jnp.asarray(np.stack([span_cols[0][i],
                                          span_cols[1][i]]))
                    for i in range(4))

    q_n = 256
    pick = rng.integers(0, n, q_n)
    valid = np.ones(q_n, bool)
    valid[200:] = False
    q_hi = hi[pick].copy()
    q_hi[200:] = 0xFFFFFFFF
    q = (jnp.asarray(q_hi), jnp.asarray(lo[pick]), jnp.asarray(ex[pick]),
         jnp.asarray(rng.integers(0, 50, q_n).astype(np.uint32)),
         jnp.asarray(valid), jnp.asarray(valid))
    kw = dict(n_songs=n_songs, delta_min=-64, delta_range=stride + 128,
              match_capacity=1 << 16, topn=3, offset_stride=stride)

    ref, ref_max = match_query_sparse_spanned(stacked, *q, **kw)
    for B, rank in ((512, "sort"), (512, "scan"), (128, "scan")):
        got, got_max = match_query_sparse_spanned(
            stacked, *q, expand_block=B, expand_runs=1024,
            vote_rank=rank, **kw)
        assert int(got_max) == int(ref_max), (B, rank)
        for f in ref._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)),
                (f, B, rank))

    # run budget: a tiny budget drops runs into n_dropped, never silent.
    # Each of the ~distinct query keys matches runs in BOTH spans, so
    # expand_runs=1 (x n_spans=2 inside) keeps the 2 shortest runs
    got, _ = match_query_sparse_spanned(
        stacked, *q, expand_block=512, expand_runs=1, vote_rank="scan",
        **kw)
    assert int(got.n_dropped) > 0
    assert int(got.total_rows) == int(ref.total_rows)


def test_query_total_equals_matcher_total():
    """query_total / query_total_spanned: the probe's exact total equals
    the matchers' total_rows, and with_bounds returns the same (lb, ub)
    the expansion uses (bounds reuse is element-identical)."""
    import jax.numpy as jnp
    from shazam_tpu.match.lookup import (match_query_sparse,
                                         match_query_sparse_spanned,
                                         query_total, query_total_spanned)

    rng = np.random.default_rng(37)
    n, n_songs, stride = 30000, 30, 4096
    hi = rng.integers(0, 500, n, dtype=np.uint32)
    lo = rng.integers(0, 4, n, dtype=np.uint32)
    ex = np.zeros(n, np.uint32)
    sid = rng.integers(0, n_songs, n, dtype=np.uint32)
    off = rng.integers(0, 3000, n, dtype=np.uint32)
    order = np.lexsort((off, sid, ex, lo, hi))
    npad = -(-n // 1024) * 1024
    S = np.uint32(0xFFFFFFFF)

    def pad(a, fill):
        return jnp.asarray(np.concatenate(
            [a[order], np.full(npad - n, fill, np.uint32)]))

    dev = (pad(hi, S), pad(lo, S), pad(ex, S),
           pad(sid * np.uint32(stride) + off, 0))

    q_n = 128
    pick = rng.integers(0, n, q_n)
    valid = np.ones(q_n, bool)
    valid[100:] = False
    q_hi = hi[pick].copy()
    q_hi[100:] = 0xFFFFFFFF
    q = (jnp.asarray(q_hi), jnp.asarray(lo[pick]), jnp.asarray(ex[pick]),
         jnp.asarray(rng.integers(0, 50, q_n).astype(np.uint32)),
         jnp.asarray(valid), jnp.asarray(valid))
    kw = dict(n_songs=n_songs, delta_min=-64, delta_range=stride + 128,
              match_capacity=1 << 16, topn=2, offset_stride=stride)

    total, lb, ub = query_total(dev, q[0], q[1], q[2], q[4],
                                with_bounds=True)
    raw = match_query_sparse(dev, *q, **kw)
    assert int(total) == int(raw.total_rows) > 0
    # bounds reuse: identical RawMatch through the precomputed bounds
    reused = match_query_sparse(dev, *q, bounds=(lb, ub), **kw)
    for f in raw._fields:
        np.testing.assert_array_equal(np.asarray(getattr(reused, f)),
                                      np.asarray(getattr(raw, f)), f)

    # spanned: stacked layout probe + bounds reuse; per-span tuple total
    half = npad // 2
    stacked = tuple(jnp.stack([c[:half], c[half:]]) for c in dev)
    tuples = (tuple(c[:half] for c in dev), tuple(c[half:] for c in dev))
    ts, lbs, ubs = query_total_spanned(stacked, q[0], q[1], q[2], q[4],
                                       with_bounds=True)
    raw_s, _ = match_query_sparse_spanned(stacked, *q, **kw)
    assert int(ts) == int(raw_s.total_rows) == int(raw.total_rows)
    reused_s, _ = match_query_sparse_spanned(stacked, *q,
                                             bounds=(lbs, ubs), **kw)
    for f in raw_s._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(reused_s, f)),
            np.asarray(getattr(raw_s, f)), f)
    tt = query_total_spanned(tuples, q[0], q[1], q[2], q[4])
    assert int(tt) == int(raw.total_rows)
