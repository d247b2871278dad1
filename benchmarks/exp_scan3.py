"""Escalated-tier SCAN-RANK decomposition: where do the ~9-14 ns/el go?

exp_scan (round 4) showed block expansion is ~1 ns/el and claimed the
rank's cost is the single-operand sort (~1 ns/el at 1M) — but the
measured fitted-tier dispatch (exp_policy r4: 16.1 ms at the 1M tier on
music8192, ~13.4 ms net of the probe) is ~4x the sum of those parts.
This decomposes the escalated program stage by stage on the real packs
(same chained-timing protocol; every variant consumes all its outputs):

  bounds       search descent only
  expand       + block-gather expansion (run budget, production config)
  pack         + vote-key pack (divmod by non-pow2 delta_range)
  sort         + lax.sort of the padded stream
  runlen       + prefix slice, boundary/cummin run-length machinery
  topn         + iterative masked argmax (topn=2)
  full         the production scan rank (adds row counts / challenger)
  full_pow2    full rank with delta_range rounded to a power of two —
               every //, % becomes a shift/mask (parity-checked top-1)

Run: python benchmarks/exp_scan3.py  (env: SCAN_DB build prefix,
SCAN_CAP to pin the tier; defaults to each pack-set's p50 fitting tier)
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                     # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp        # noqa: E402
from jax import lax            # noqa: E402

from shazam_tpu.config import DEFAULT_CONFIG as CFG             # noqa: E402
from shazam_tpu.index.store import FingerprintIndex             # noqa: E402
from shazam_tpu.index.search import build_unique_view           # noqa: E402
from shazam_tpu.match.lookup import (_expand, check_vote_key,   # noqa: E402
                                     match_query_sparse, query_total)
from shazam_tpu.match.prepare import q_frames_for_max_offset    # noqa: E402

PREFIX = os.environ.get("SCAN_DB", "/root/repo/.data/music8192")
CHAIN = 8
SENT32 = 0x7FFFFFFF


def main():
    print(f"=== {PREFIX}", flush=True)
    index = FingerprintIndex.load(PREFIX + ".idx.npz")
    qz = np.load(PREFIX + ".queries.npz")
    n_songs = int(qz["n_songs"])
    dev = index.device_arrays()
    uview, usteps = build_unique_view(index.key_hi, index.key_lo,
                                      index.key_ex)
    packs = tuple(jnp.asarray(qz[k]) for k in
                  ("hi", "lo", "ex", "t", "valid", "first"))
    qn = int(qz["hi"].shape[0])
    clip_frames = int(qz["clip_samples"]) // 2048 + 1
    delta_min = -q_frames_for_max_offset(clip_frames)
    delta_range = ((index.max_offset // 4096) + 1) * 4096 \
        + q_frames_for_max_offset(clip_frames)
    stride = index.offset_stride
    kw = dict(n_songs=n_songs, delta_min=delta_min,
              delta_range=delta_range, topn=2, offset_stride=stride)

    probe = jax.jit(functools.partial(
        query_total, u_steps=usteps))
    totals = sorted(
        int(jax.device_get(probe(
            dev, packs[0][i], packs[1][i], packs[2][i], packs[4][i],
            head=None, uview=uview)))
        for i in range(qn))
    tiers = [CFG.match_capacity_fast, CFG.match_capacity]
    while tiers[-1] < CFG.match_capacity_max:
        step = 2 if tiers[-1] >= CFG.match_tier_fine_from else 4
        tiers.append(min(tiers[-1] * step, CFG.match_capacity_max))
    p50_fit = next((c for c in tiers if c >= totals[qn // 2]), tiers[-1])
    cap = int(os.environ.get("SCAN_CAP", p50_fit))
    print(f"packs {qn}: totals {totals}; decomposing at tier {cap}",
          flush=True)

    BLK = CFG.expand_block
    RUNS = CFG.expand_block_runs
    ex_kw = dict(match_capacity=cap, offset_stride=stride,
                 u_steps=usteps, expand_block=BLK, expand_runs=RUNS)

    def timed(name, fn):
        @functools.partial(jax.jit, static_argnames=("k",))
        def loop(qs, dv, uv, k):
            def body(i, acc):
                q = tuple(lax.dynamic_index_in_dim(x, i % qn, 0,
                                                   keepdims=False)
                          for x in qs)
                out = fn(dv, q, uv)
                return acc + sum(jnp.sum(l.astype(jnp.float32))
                                 for l in jax.tree_util.tree_leaves(out))
            return lax.fori_loop(0, k, body, jnp.float32(0))

        res = {}
        for k in (1, CHAIN):
            float(loop(packs, dev, uview, k))
            best = []
            for _ in range(3):
                t0 = time.time()
                float(loop(packs, dev, uview, k))
                best.append(time.time() - t0)
            res[k] = min(best)
        dt = max((res[CHAIN] - res[1]) / (CHAIN - 1), 1e-6)
        print(f"{name:>24}: {dt*1e3:8.2f} ms", flush=True)
        return dt

    def expand_of(dv, q, uv):
        return _expand(dv, q[0], q[1], q[2], q[3], q[4], uview=uv,
                       **ex_kw)

    # ---- truncated pipeline stages -----------------------------------
    def v_bounds(dv, q, uv):
        return query_total(dv, q[0], q[1], q[2], q[4], uview=uv,
                           u_steps=usteps)

    def v_expand(dv, q, uv):
        sid, delta, p, valid, total, nd = expand_of(dv, q, uv)
        return sid, delta, p, valid.astype(jnp.int32), total, nd

    def key_of(sid, delta, valid):
        dbin = delta - delta_min
        ok = valid & (dbin >= 0) & (dbin < delta_range) \
            & (sid >= 0) & (sid < n_songs)
        return jnp.where(ok, sid * delta_range + dbin, jnp.int32(SENT32))

    def v_pack(dv, q, uv):
        sid, delta, p, valid, total, nd = expand_of(dv, q, uv)
        return key_of(sid, delta, valid), total, nd

    def v_sort(dv, q, uv):
        sid, delta, p, valid, total, nd = expand_of(dv, q, uv)
        return jax.lax.sort(key_of(sid, delta, valid)), total, nd

    def runlen_of(ks):
        n = ks.shape[0]
        live = ks != SENT32
        idx = jnp.arange(n, dtype=jnp.int32)
        change = jnp.concatenate([jnp.ones(1, bool), ks[1:] != ks[:-1]])
        cand = jnp.where(change, idx, jnp.int32(n))
        nxt_incl = jax.lax.cummin(cand[::-1])[::-1]
        nxt = jnp.concatenate([nxt_incl[1:], jnp.full(1, n, jnp.int32)])
        run_start = change & live
        count = jnp.where(run_start, nxt - idx, 0)
        return live, count

    def v_runlen(dv, q, uv):
        sid, delta, p, valid, total, nd = expand_of(dv, q, uv)
        ks = jax.lax.sort(key_of(sid, delta, valid))[:cap]
        live, count = runlen_of(ks)
        return count, total, nd

    def v_topn(dv, q, uv):
        sid, delta, p, valid, total, nd = expand_of(dv, q, uv)
        ks = jax.lax.sort(key_of(sid, delta, valid))[:cap]
        live, count = runlen_of(ks)
        song = jnp.where(live, ks // delta_range, n_songs)
        db = ks % delta_range
        tops, topv = [], []
        masked = count
        for r in range(2):
            pos = jnp.argmax(masked)
            v = masked[pos]
            s_r = jnp.where(v > 0, song[pos], jnp.int32(0))
            tops.append(s_r)
            topv.append(jnp.maximum(v, 0))
            if r == 0:
                masked = jnp.where(song == s_r, jnp.int32(0), masked)
        return jnp.stack(tops), jnp.stack(topv), total, nd

    def v_full(dv, q, uv):
        return match_query_sparse(
            dv, *q, match_capacity=cap, uview=uv, u_steps=usteps,
            vote_rank="scan", expand_block=BLK, expand_runs=RUNS, **kw)

    # ---- pow2 delta_range variant ------------------------------------
    dr2 = 1 << int(np.ceil(np.log2(delta_range)))
    shift = int(np.log2(dr2))
    pow2_ok = n_songs * dr2 < (1 << 31)

    def v_full_pow2(dv, q, uv):
        sid, delta, p, valid, total, nd = expand_of(dv, q, uv)
        first = jnp.take(q[5], p)
        dbin = delta - delta_min
        ok = valid & (dbin >= 0) & (dbin < delta_range) \
            & (sid >= 0) & (sid < n_songs)
        key = jnp.where(ok, (sid << shift) | dbin, jnp.int32(SENT32))
        ks = jax.lax.sort(key)[:cap]
        live, count = runlen_of(ks)
        song = jnp.where(live, ks >> shift, n_songs)
        db = ks & (dr2 - 1)
        tops, topd, topv = [], [], []
        masked = count
        for r in range(2):
            pos = jnp.argmax(masked)
            v = masked[pos]
            got = v > 0
            s_r = jnp.where(got, song[pos], jnp.int32(0))
            fallback = jnp.int32(0)
            for _ in range(max(1, len(tops))):
                for prev in tops:
                    fallback = jnp.where(fallback == prev, fallback + 1,
                                         fallback)
            s_r = jnp.where(got, s_r, fallback)
            tops.append(s_r)
            topd.append((jnp.where(got, db[pos], 0) + delta_min)
                        .astype(jnp.int32))
            topv.append(jnp.maximum(v, 0))
            if r == 0:
                masked = jnp.where(song == s_r, jnp.int32(0), masked)
        vf = (valid & first).astype(jnp.int32)
        rcs = [jnp.sum(jnp.where(sid == s, vf, 0)) for s in tops]
        run_start = jnp.concatenate([jnp.ones(1, bool), ks[1:] != ks[:-1]]) \
            & live
        n_ranked = jnp.sum((run_start & jnp.concatenate(
            [jnp.ones(1, bool), song[1:] != song[:-1]])).astype(jnp.int32))
        win = tops[0]
        masked2 = jnp.where(song == win, jnp.int32(0), count)
        second_song = jnp.maximum(jnp.max(masked2), 0)
        win_best = topd[0] - delta_min
        second_bin = jnp.max(jnp.where(run_start & (song == win)
                                       & (db != win_best), count,
                                       jnp.int32(0)))
        runner = jnp.maximum(second_song, second_bin).astype(jnp.int32)
        return (jnp.stack(tops), jnp.stack(topd), jnp.stack(topv),
                jnp.stack(rcs), total, n_ranked, nd, runner)

    # parity: pow2 variant's top-1/top-2 must match the production rank
    if pow2_ok:
        f_ref = jax.jit(lambda dv, q, uv: v_full(dv, q, uv))
        f_p2 = jax.jit(lambda dv, q, uv: v_full_pow2(dv, q, uv))
        for i in range(qn):
            q = tuple(a[i] for a in packs)
            want = jax.device_get(f_ref(dev, q, uview))
            got = jax.device_get(f_p2(dev, q, uview))
            for a_, b_, nm in zip(
                    got, want,
                    ("songs", "deltas", "votes", "rcs", "total",
                     "n_ranked", "nd", "runner")):
                assert np.array_equal(np.asarray(a_), np.asarray(b_)), \
                    (i, nm, a_, b_)
        print("parity ok: pow2-range rank == production scan rank",
              flush=True)

    timed("bounds", v_bounds)
    timed("expand", v_expand)
    timed("expand+pack", v_pack)
    timed("expand+pack+sort", v_sort)
    timed("+slice+runlen", v_runlen)
    timed("+topn argmax", v_topn)
    timed("FULL scan rank", v_full)
    if pow2_ok:
        timed("FULL pow2 range", v_full_pow2)


if __name__ == "__main__":
    main()
