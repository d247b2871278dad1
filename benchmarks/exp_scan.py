"""Scan-rank escalated-tier timing: block expansion + scatter-free rank.

exp_esc (round 4) isolated the escalated-tier cost stack: block-gather
expansion solved the expansion wall (245.9 -> 4.1 ms at the 4M tier),
leaving the vote RANK — and the rank's cost is NOT the sort (0.97 ms at
1M single-operand) but the 3-4 full-stream SCATTERS the sparse rank
issues at ~10 ns/element.  ``_scan_vote_rank`` removes every scatter
(run-length counts via one reverse cummin; ranking via masked argmax —
sorted order is the tie rule).  This measures, per saved build:

1. block expand + SCAN rank at the fitting tier, B in {128, 512} —
   the block stream is ``cap + 2 * n_lanes * B`` elements, so B trades
   gather width against sort length;
2. the same program one tier down (the tier most production packs
   actually fit — per-query escalation picks per-pack tiers);
3. ``cummin`` alone at the B=128 stream length (the one new primitive);
4. PARITY: block+scan == scalar+sort on every pack at the fitting tier.

Baselines from exp_esc on the same builds (do not re-pay the compiles):
prod12288 @1M: scalar+sort 122.36 ms, block expand 2.26, bounds 1.40;
music8192 @4M: scalar+sort 491.13 ms, block expand 3.83, bounds 2.79.

Run: python benchmarks/exp_scan.py   (env: ESC_DB like exp_esc)
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                     # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp        # noqa: E402
from jax import lax            # noqa: E402

from shazam_tpu.index.store import FingerprintIndex            # noqa: E402
from shazam_tpu.index.search import build_unique_view          # noqa: E402
from shazam_tpu.match.lookup import match_query_sparse         # noqa: E402
from shazam_tpu.match.prepare import q_frames_for_max_offset   # noqa: E402

PREFIX = os.environ.get("ESC_DB", "/root/repo/.data/prod12288")
CHAIN = 8


def main():
    print(f"=== {PREFIX}", flush=True)
    index = FingerprintIndex.load(PREFIX + ".idx.npz")
    qz = np.load(PREFIX + ".queries.npz")
    n_songs = int(qz["n_songs"])
    dev = index.device_arrays()
    uview, usteps = build_unique_view(index.key_hi, index.key_lo,
                                      index.key_ex)
    assert uview is not None

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

    probe = jax.jit(functools.partial(
        match_query_sparse, match_capacity=16384, u_steps=usteps, **kw))
    totals = [int(jax.device_get(probe(
        dev, *(a[i] for a in packs), head=None, uview=uview)).total_rows)
        for i in range(qn)]
    need = max(totals)
    fit = 16384
    while fit < need and fit < (1 << 23):
        fit *= 4
    print(f"packs {qn}: totals {sorted(totals)}; fitting tier {fit}",
          flush=True)

    def timed(name, fn, *args):
        @functools.partial(jax.jit, static_argnames=("k",))
        def loop(qs, a, k):
            def body(i, acc):
                q = tuple(lax.dynamic_index_in_dim(x, i % qn, 0,
                                                   keepdims=False)
                          for x in qs)
                out = fn(q, a)
                return acc + sum(jnp.sum(l.astype(jnp.float32))
                                 for l in jax.tree_util.tree_leaves(out))
            return lax.fori_loop(0, k, body, jnp.float32(0))

        res = {}
        for k in (1, CHAIN):
            float(loop(packs, args, k))
            best = []
            for _ in range(3):
                t0 = time.time()
                float(loop(packs, args, k))
                best.append(time.time() - t0)
            res[k] = min(best)
        dt = max((res[CHAIN] - res[1]) / (CHAIN - 1), 1e-6)
        print(f"{name:>36}: {dt*1e3:8.2f} ms", flush=True)
        return dt

    def scan_fn(cap, blk):
        def f(q, a):
            dv, uv = a
            return match_query_sparse(
                dv, *q, match_capacity=cap, u_steps=usteps, uview=uv,
                head=None, expand_block=blk, vote_rank="scan", **kw)
        return f

    # PARITY on every pack at the fitting tier (nothing clamps)
    f_ref = jax.jit(functools.partial(
        match_query_sparse, match_capacity=fit, u_steps=usteps, **kw))
    f_scan = jax.jit(functools.partial(
        match_query_sparse, match_capacity=fit, u_steps=usteps,
        expand_block=128, vote_rank="scan", **kw))
    for i in range(qn):
        q = tuple(a[i] for a in packs)
        want = jax.device_get(f_ref(dev, *q, head=None, uview=uview))
        got = jax.device_get(f_scan(dev, *q, head=None, uview=uview))
        for a, b in zip(got, want):
            assert np.array_equal(np.asarray(a), np.asarray(b)), i
    print("parity ok: block+scan == scalar+sort at the fitting tier",
          flush=True)

    n_lanes = int(qz["hi"].shape[1])
    stream128 = fit + 2 * n_lanes * 128
    keys = jnp.asarray(np.random.default_rng(0).integers(
        0, 1 << 30, stream128).astype(np.int32))

    def cummin_only(q, a):
        (k,) = a
        return lax.cummin(k + q[3][0].astype(jnp.int32))

    timed(f"block128 + scan @ {fit}", scan_fn(fit, 128), dev, uview)
    timed(f"block512 + scan @ {fit}", scan_fn(fit, 512), dev, uview)
    timed(f"block128 + scan @ {fit // 4}", scan_fn(fit // 4, 128),
          dev, uview)
    timed(f"cummin only @ {stream128}", cummin_only, keys)


if __name__ == "__main__":
    main()
