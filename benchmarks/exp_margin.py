"""Decide-rate analysis for a decided-first escalation policy.

The bounds-first policy (round 4) probes the exact total and dispatches
once at the fitting tier — every clip pays the fitting tier's cost even
when a cheaper clamped dispatch would already PROVE the answer: the
expansion drops whole runs (longest first) and each dropped run can add
at most one vote to any (song, delta) bin, so a clamped dispatch with
``top_votes[0] - runner_votes > n_dropped`` is exact-top-1
(``RawMatch`` docstring; api._decided).

This measures, per saved build and per candidate decide-tier cap, on
the real query packs:

  total rows | n_dropped (runs) | winner margin | decided?

and the would-be decide RATE — the number that tells whether a
decided-first policy (dispatch at a small tier, accept on margin,
escalate only undecided clips) beats bounds-first p50 (music8192:
18.83 ms bounds-first, the <10 ms round-5 target).

Every decided verdict is proof-checked against the full (fitting-tier)
expansion: top-1 song and delta must be identical.

Run: python benchmarks/exp_margin.py   (env: MARGIN_DB to pin a build,
JAX_PLATFORMS=cpu to analyze snapshots without the TPU)
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                     # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp        # noqa: E402

from shazam_tpu.config import DEFAULT_CONFIG as CFG             # noqa: E402
from shazam_tpu.index.store import FingerprintIndex             # noqa: E402
from shazam_tpu.index.search import build_unique_view           # noqa: E402
from shazam_tpu.match.lookup import match_query_sparse          # noqa: E402
from shazam_tpu.match.prepare import q_frames_for_max_offset    # noqa: E402

ONE = os.environ.get("MARGIN_DB")
PREFIXES = [ONE] if ONE else [
    p for p in ("/root/repo/.data/prod12288", "/root/repo/.data/music8192")
    if os.path.exists(p + ".idx.npz")]
CAPS = tuple(int(c) for c in os.environ.get(
    "MARGIN_CAPS", "65536,262144,524288").split(","))


def analyze(prefix):
    index = FingerprintIndex.load(prefix + ".idx.npz")
    qz = np.load(prefix + ".queries.npz")
    n_songs = int(qz["n_songs"])
    dev = index.device_arrays()
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

    tiers = [CFG.match_capacity_fast, CFG.match_capacity]
    while tiers[-1] < CFG.match_capacity_max:
        step = 2 if tiers[-1] >= CFG.match_tier_fine_from else 4
        tiers.append(min(tiers[-1] * step, CFG.match_capacity_max))

    def fn(cap):
        b = (CFG.expand_block
             if cap >= CFG.expand_block_min_capacity
             and int(dev[3].shape[0]) % CFG.expand_block == 0 else 0)
        return jax.jit(functools.partial(
            match_query_sparse, match_capacity=cap, u_steps=usteps,
            vote_rank="scan" if b else "sort", expand_block=b,
            expand_runs=CFG.expand_block_runs if b else 0, **kw))

    # full-expansion reference per pack (fitting tier)
    probe = fn(CAPS[0])
    raws0 = [jax.device_get(probe(dev, *(a[i] for a in packs),
                                  head=None, uview=uview))
             for i in range(qn)]
    totals = [int(r.total_rows) for r in raws0]
    fits = [next((c for c in tiers if c >= t), tiers[-1]) for t in totals]
    print(f"packs {qn}: totals {sorted(totals)}; fitting tiers "
          f"{sorted(set(fits))}", flush=True)
    refs = {}
    for cap in sorted(set(fits)):
        f = fn(cap)
        for i in range(qn):
            if fits[i] == cap:
                refs[i] = jax.device_get(
                    f(dev, *(a[i] for a in packs), head=None, uview=uview))

    for cap in CAPS:
        f = fn(cap)
        decided = 0
        lines = []
        for i in range(qn):
            r = (raws0[i] if cap == CAPS[0] else jax.device_get(
                f(dev, *(a[i] for a in packs), head=None, uview=uview)))
            margin = int(r.top_votes[0]) - int(r.runner_votes)
            dropped = int(r.n_dropped)
            clamped = totals[i] > cap or dropped > 0
            ok = (not clamped) or margin > dropped
            if ok and clamped:
                # proof check: decided == full expansion on top-1
                ref = refs[i]
                assert int(r.top_songs[0]) == int(ref.top_songs[0]), \
                    (i, cap, int(r.top_songs[0]), int(ref.top_songs[0]))
                assert int(r.top_deltas[0]) == int(ref.top_deltas[0]), \
                    (i, cap)
            decided += ok
            lines.append(
                f"  pack {i}: total {totals[i]:>8} win {int(r.top_songs[0]):>6} "
                f"votes {int(r.top_votes[0]):>6} runner {int(r.runner_votes):>6} "
                f"margin {margin:>6} dropped {dropped:>5} "
                f"{'DECIDED' if ok else 'undecided'}")
        print(f"cap {cap}: decided {decided}/{qn}", flush=True)
        for ln in lines:
            print(ln, flush=True)


def main():
    for prefix in PREFIXES:
        print(f"=== {prefix}", flush=True)
        analyze(prefix)


if __name__ == "__main__":
    main()
