"""Decided-escalation policy on REAL catalogs: rate, latency, proof check.

For each saved build (.data/{music8192,prod12288,music2714}) with query
packs, measures on the real chip:

1. per-pack fast-tier (16K) match: total_rows, decided?
   (top1 - runner > n_dropped — the provably-exact early accept,
   match/lookup.RawMatch);
2. PROOF CHECK: for every decided pack, the escalated full-expansion
   result must have the same top-1 song and delta (the bound says it
   cannot differ — this verifies the implementation on real data);
3. honest chained timings of the fast tier and the fitting tier, and
   the policy p50 = median over packs of t_fast + (undecided ? t_fit : 0).

Run: python benchmarks/exp_decided.py
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
    match_query, match_query_sparse,
)
from shazam_tpu.match.prepare import q_frames_for_max_offset   # noqa: E402

PREFIXES = [p for p in ("/root/repo/.data/music8192",
                        "/root/repo/.data/prod12288",
                        "/root/repo/.data/music2714")
            if os.path.exists(p + ".idx.npz")
            and os.path.exists(p + ".queries.npz")]

FAST = 16384
CHAIN = 16


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
    matcher = (match_query_sparse
               if n_songs * kw["delta_range"] > 16_000_000 else match_query)

    def probe(cap):
        f = jax.jit(functools.partial(matcher, match_capacity=cap,
                                      u_steps=usteps, **kw))
        return [jax.device_get(f(dev, *(a[i] for a in packs), head=head,
                                 uview=uview)) for i in range(qn)]

    fast = probe(FAST)
    totals = [int(r.total_rows) for r in fast]
    decided = [int(r.top_votes[0]) - int(r.runner_votes) > int(r.n_dropped)
               for r in fast]
    over = [t > FAST for t in totals]
    need = max((t for t, d, o in zip(totals, decided, over)
                if o and not d), default=0)
    fit = FAST
    while fit < need and fit < (1 << 22):
        fit *= 4
    full_cap = FAST
    while full_cap < max(totals) and full_cap < (1 << 22):
        full_cap *= 4
    print(f"packs {qn}: totals {sorted(totals)}", flush=True)
    print(f"decided {sum(decided)}/{qn} "
          f"(overflowing {sum(over)}/{qn}); "
          f"undecided fitting tier {fit}", flush=True)

    # proof check: decided answers equal the full expansion's
    full = probe(full_cap)
    for i, r in enumerate(fast):
        if over[i] and decided[i]:
            assert int(r.top_songs[0]) == int(full[i].top_songs[0]), \
                f"pack {i}: decided top-1 differs from full!"
            assert int(r.top_deltas[0]) == int(full[i].top_deltas[0]), \
                f"pack {i}: decided delta differs from full!"
    print("proof check ok: every decided pack == full expansion", flush=True)

    def time_chain(cap):
        @functools.partial(jax.jit, static_argnames=("k",))
        def loop(qs, dv, hd, uv, k):
            def body(i, acc):
                q = tuple(lax.dynamic_index_in_dim(a, i % qn, 0,
                                                   keepdims=False)
                          for a in qs)
                out = matcher(dv, *q, match_capacity=cap, head=hd,
                              uview=uv, u_steps=usteps, **kw)
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

    t_fast = time_chain(FAST)
    undec = [o and not d for o, d in zip(over, decided)]
    t_fit = time_chain(fit) if any(undec) else 0.0
    per_pack = sorted(t_fast + (t_fit if u else 0.0) for u in undec)
    p50 = per_pack[qn // 2]
    print(f"fast tier {t_fast*1e3:.2f} ms | fitting tier ({fit}) "
          f"{t_fit*1e3:.2f} ms | escalation rate {sum(undec)}/{qn}",
          flush=True)
    print(f"POLICY p50 {p50*1e3:.2f} ms per 15 s clip vs "
          f"{index.n_hashes}-hash real index (exact top-1 guaranteed)",
          flush=True)


def main():
    if not PREFIXES:
        print("no saved builds with query packs under .data/")
        return
    for p in PREFIXES:
        run_one(p)


if __name__ == "__main__":
    main()
