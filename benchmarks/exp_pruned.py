"""Candidate-pruned vote rank on REAL catalogs: parity, cert rate, latency.

The sparse rank's lax.sort dominates escalated match tiers (measured:
fitting tier 32.75 ms at 262144 rows vs the 95.3M production index —
exp_decided.py).  match_query_pruned replaces it with O(cap) scatters
plus an exactness certificate and an in-program lax.cond sort fallback
(match/lookup._pruned_vote_rank).  For each saved build with query
packs this measures on the real chip:

1. PARITY: pruned == sparse element-identical on every pack at the
   fast and fitting tiers (the cond makes this unconditional);
2. certificate pass rate per tier and candidate count (a failed cert
   pays the sort anyway — the rate is the speedup knob);
3. honest chained timings (fori_loop, all outputs consumed) of the
   sparse vs pruned matchers at both tiers, and the policy p50
   (fast + decided early-accept, escalate undecided overflows).

Run: python benchmarks/exp_pruned.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                     # noqa: E402
import jax.numpy as jnp        # noqa: E402
from jax import lax            # noqa: E402

from shazam_tpu.index.store import FingerprintIndex            # noqa: E402
from shazam_tpu.index.search import (                          # noqa: E402
    build_unique_view, maybe_build_head,
)
from shazam_tpu.match.lookup import (                          # noqa: E402
    match_query_pruned, match_query_sparse,
)
from shazam_tpu.match.prepare import q_frames_for_max_offset   # noqa: E402

_DEFAULT = ("/root/repo/.data/prod12288", "/root/repo/.data/music8192",
            "/root/repo/.data/music2714")
PREFIXES = [p for p in os.environ.get("PRUNED_DB", ",".join(_DEFAULT)
                                      ).split(",")
            if os.path.exists(p + ".idx.npz")
            and os.path.exists(p + ".queries.npz")]

FAST = 16384
CHAIN = 16
CANDS = tuple(int(c) for c in
              os.environ.get("PRUNED_CANDS", "256,1024").split(","))


def run_one(prefix):
    print(f"=== {prefix}", flush=True)
    index = FingerprintIndex.load(prefix + ".idx.npz")
    qz = np.load(prefix + ".queries.npz")
    n_songs = int(qz["n_songs"])
    dev = index.device_arrays()
    head = maybe_build_head(dev[0])
    uview, usteps = build_unique_view(index.key_hi, index.key_lo,
                                      index.key_ex)
    packs = tuple(jnp.asarray(qz[k]) for k in
                  ("hi", "lo", "ex", "t", "valid", "first"))
    qn = int(qz["hi"].shape[0])
    clip_frames = int(qz["clip_samples"]) // 2048 + 1
    kw = dict(
        n_songs=n_songs,
        delta_min=-q_frames_for_max_offset(clip_frames),
        delta_range=((index.max_offset // 4096) + 1) * 4096
        + q_frames_for_max_offset(clip_frames),
        topn=2, offset_stride=index.offset_stride)

    def probe_sparse(cap):
        f = jax.jit(functools.partial(match_query_sparse, match_capacity=cap,
                                      u_steps=usteps, **kw))
        return [jax.device_get(f(dev, *(a[i] for a in packs), head=head,
                                 uview=uview)) for i in range(qn)]

    def probe_pruned(cap, n_cand):
        f = jax.jit(functools.partial(
            match_query_pruned, match_capacity=cap, u_steps=usteps,
            n_candidates=n_cand, **kw))
        return [jax.device_get(f(dev, *(a[i] for a in packs), head=head,
                                 uview=uview)) for i in range(qn)]

    fast = probe_sparse(FAST)
    totals = [int(r.total_rows) for r in fast]
    decided = [int(r.top_votes[0]) - int(r.runner_votes) > int(r.n_dropped)
               for r in fast]
    over = [t > FAST for t in totals]
    undec = [o and not d for o, d in zip(over, decided)]
    need = max((t for t, u in zip(totals, undec) if u), default=0)
    fit = FAST
    while fit < need and fit < (1 << 22):
        fit *= 4
    print(f"packs {qn}: totals {sorted(totals)}; fitting tier {fit}; "
          f"escalation {sum(undec)}/{qn}", flush=True)

    # parity + cert rates at both tiers, each candidate count
    for cap in (FAST, fit):
        ref = fast if cap == FAST else probe_sparse(cap)
        for n_cand in CANDS:
            got = probe_pruned(cap, n_cand)
            for i, ((raw, ok), want) in enumerate(zip(got, ref)):
                for a, b in zip(raw, want):
                    assert np.array_equal(np.asarray(a), np.asarray(b)), \
                        (cap, n_cand, i)
            rate = sum(bool(ok) for _, ok in got)
            print(f"cap {cap:>8} C {n_cand:>5}: parity ok, "
                  f"cert {rate}/{qn}", flush=True)

    def time_chain(matcher, cap, n_cand=None):
        extra = {} if n_cand is None else {"n_candidates": n_cand}

        @functools.partial(jax.jit, static_argnames=("k",))
        def loop(qs, dv, hd, uv, k):
            def body(i, acc):
                q = tuple(lax.dynamic_index_in_dim(a, i % qn, 0,
                                                   keepdims=False)
                          for a in qs)
                out = matcher(dv, *q, match_capacity=cap, head=hd,
                              uview=uv, u_steps=usteps, **extra, **kw)
                return acc + sum(jnp.sum(l.astype(jnp.float32))
                                 for l in jax.tree_util.tree_leaves(out))
            return lax.fori_loop(0, k, body, jnp.float32(0))

        res = {}
        for k in (1, CHAIN):
            float(loop(packs, dev, head, uview, k))
            best = []
            for _ in range(3):
                t0 = time.time()
                float(loop(packs, dev, head, uview, k))
                best.append(time.time() - t0)
            res[k] = min(best)
        return max((res[CHAIN] - res[1]) / (CHAIN - 1), 1e-6)

    for cap in (FAST, fit):
        t_s = time_chain(match_query_sparse, cap)
        line = f"cap {cap:>8}: sparse {t_s*1e3:6.2f} ms"
        t_ps = {}
        for n_cand in CANDS:
            t_p = time_chain(match_query_pruned, cap, n_cand)
            t_ps[n_cand] = t_p
            line += f" | pruned C={n_cand} {t_p*1e3:6.2f} ms"
        print(line, flush=True)
        if cap == fit:
            best_c = min(t_ps, key=t_ps.get)
            t_fit_p, t_fit_s = t_ps[best_c], t_s
        if cap == FAST:
            t_fast_p = min(t_ps.values())
            t_fast_s = t_s

    def p50(t_fast, t_fit):
        per = sorted(t_fast + (t_fit if u else 0.0) for u in undec)
        return per[qn // 2]

    print(f"POLICY p50 sparse {p50(t_fast_s, t_fit_s)*1e3:.2f} ms | "
          f"pruned {p50(t_fast_p, t_fit_p)*1e3:.2f} ms per 15 s clip vs "
          f"{index.n_hashes}-hash real index (exact, cond fallback)",
          flush=True)


def main():
    if not PREFIXES:
        print("no saved builds with query packs under .data/")
        return
    for p in PREFIXES:
        run_one(p)


if __name__ == "__main__":
    main()
