"""Bounds-first policy p50 on the real builds (the BENCH_r04 headline).

Runs bench.bench_query_latency_real per saved build — the EXACT
programs the round-end driver bench runs (warming the worker-side
compile cache), printing the policy breakdown — plus a parity gate:
the escalated-tier program (scan rank + block expansion + run budget)
must be element-identical to scalar+sort at every pack's fitting tier.

Run: python benchmarks/exp_policy.py   (env: POLICY_DB to pin one build)
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                     # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp        # noqa: E402

import bench                                                    # noqa: E402
from shazam_tpu.config import DEFAULT_CONFIG as CFG             # noqa: E402
from shazam_tpu.index.store import FingerprintIndex             # noqa: E402
from shazam_tpu.index.search import build_unique_view           # noqa: E402
from shazam_tpu.match.lookup import match_query_sparse          # noqa: E402
from shazam_tpu.match.prepare import q_frames_for_max_offset    # noqa: E402

ONE = os.environ.get("POLICY_DB")
PREFIXES = [ONE] if ONE else [
    p for p in ("/root/repo/.data/prod12288", "/root/repo/.data/music8192")
    if os.path.exists(p + ".idx.npz")]


def parity(prefix):
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

    probe = jax.jit(functools.partial(
        match_query_sparse, match_capacity=16384, u_steps=usteps, **kw))
    totals = [int(jax.device_get(probe(
        dev, *(a[i] for a in packs), head=None, uview=uview)).total_rows)
        for i in range(qn)]
    fits = [next((c for c in tiers if c >= t), tiers[-1]) for t in totals]
    print(f"packs {qn}: totals {sorted(totals)}; fitting tiers "
          f"{sorted(set(fits))}", flush=True)

    for cap in sorted(set(fits)):
        f_ref = jax.jit(functools.partial(
            match_query_sparse, match_capacity=cap, u_steps=usteps, **kw))
        b = (CFG.expand_block
             if cap >= CFG.expand_block_min_capacity else 0)
        f_new = jax.jit(functools.partial(
            match_query_sparse, match_capacity=cap, u_steps=usteps,
            vote_rank="scan", expand_block=b,
            expand_runs=CFG.expand_block_runs, **kw))
        for i in range(qn):
            if fits[i] != cap:
                continue
            q = tuple(a[i] for a in packs)
            want = jax.device_get(f_ref(dev, *q, head=None, uview=uview))
            got = jax.device_get(f_new(dev, *q, head=None, uview=uview))
            for fld in want._fields:
                a_, b_ = np.asarray(getattr(got, fld)), \
                    np.asarray(getattr(want, fld))
                assert np.array_equal(a_, b_), (i, cap, fld, a_, b_)
    print("parity ok: scan+block+run-budget == scalar+sort at every "
          "pack's fitting tier", flush=True)


def main():
    for prefix in PREFIXES:
        print(f"=== {prefix}", flush=True)
        parity(prefix)
        bench.REAL_DB_PREFIXES = (prefix,)
        out = bench.bench_query_latency_real(jax, jnp)
        (p50, max_rows, n_hashes, n_songs, cap, esc, t_fast, policy) = out
        print(f"POLICY p50 {p50*1e3:.2f} ms | esc rate {esc:.3f} | "
              f"max_rows {max_rows} | {n_hashes} hashes", flush=True)
        print(f"policy breakdown: {policy}", flush=True)


if __name__ == "__main__":
    main()
