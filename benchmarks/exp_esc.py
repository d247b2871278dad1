"""Escalated-tier decomposition + block-gather expansion prototype.

exp_pruned (round 4) showed the candidate-pruned rank does NOT move the
escalated tier (sparse 490.9 vs pruned 487.3 ms at cap 4M on the 81.1M
music build): the wall is the EXPANSION — O(cap) independent scalar
gathers into the payload column, ~120 ns each on TPU HBM.  But matched
rows are CONTIGUOUS runs ([lb, ub) per query hash), so the same bytes
can move as aligned 512-row BLOCK gathers (rows of a (N/512, 512)
reshape — each gathered element is one sequential 2 KB DMA, cap/512
DMAs instead of cap scalar gathers).

This measures, per saved build, at the fitting tier:

1. bounds-only (uview descent) — the search cost;
2. the current scalar expansion (everything consumed);
3. expansion + sparse rank (the production escalated program);
4. rank-only at cap-length streams (isolates the vote scatters);
5. BLOCK expansion prototype (B=512) — same run semantics (whole runs,
   block-budget shortest-first, exact totals), element validity by run
   bounds;
6. block expansion + sparse rank, PARITY-checked against (3) on every
   pack at a tier where nothing clamps.

Run: python benchmarks/exp_esc.py   (PRUNED_DB-style env: ESC_DB)
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                     # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize pins the platform programmatically; honor
    # an explicit CPU request (smoke tests) the same way conftest does
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp        # noqa: E402
from jax import lax            # noqa: E402

from shazam_tpu.index.store import FingerprintIndex            # noqa: E402
from shazam_tpu.index.search import (                          # noqa: E402
    build_unique_view, unique_bounds,
)
from shazam_tpu.match.lookup import (                          # noqa: E402
    _expand, _sparse_vote_rank, match_query_sparse,
)
from shazam_tpu.match.prepare import q_frames_for_max_offset   # noqa: E402

PREFIX = os.environ.get("ESC_DB", "/root/repo/.data/music8192")
CHAIN = 8
B = int(os.environ.get("ESC_B", 512))


def block_expand(payload2d, lb, ub, q_t, q_valid, q_first, *,
                 match_capacity: int, offset_stride: int):
    """Block-gather expansion: whole runs, shortest-first block budget.

    Returns (sid, delta, first, valid, total, n_dropped) shaped
    (cap_blocks, B) (callers flatten) — semantics match `_expand`'s
    whole-run contract: `total` is the exact global match count and
    `n_dropped` counts runs the block budget excluded.
    """
    lens = jnp.where(q_valid, ub - lb, 0)
    total = jnp.sum(lens)
    b0 = lb // B
    b1 = (ub + B - 1) // B
    nblk = jnp.where(lens > 0, b1 - b0, 0)

    order = jnp.argsort(nblk)
    nblk_s = jnp.take(nblk, order)
    b0_s = jnp.take(b0, order)
    # +2 blocks/run headroom: alignment can waste up to 2 partial blocks
    # per run, and the whole-run guarantee ("row total <= capacity =>
    # nothing dropped") must survive that
    cap_blocks = match_capacity // B + 2 * lens.shape[0]
    cum = jnp.cumsum(nblk_s)
    included = cum <= cap_blocks
    n_dropped = jnp.sum(((nblk_s > 0) & ~included).astype(jnp.int32))
    nblk_inc = jnp.where(included, nblk_s, 0)
    cum_inc = jnp.cumsum(nblk_inc)
    total_blocks = cum_inc[-1]

    v = jnp.arange(cap_blocks, dtype=jnp.int32)
    marks = jnp.zeros(cap_blocks, jnp.int32).at[cum_inc].add(1, mode="drop")
    p = jnp.cumsum(marks)
    p = jnp.minimum(p, lens.shape[0] - 1)
    prev = jnp.where(p > 0, jnp.take(cum_inc, p - 1), 0)
    blk = jnp.take(b0_s, p) + (v - prev)          # block id per out block
    blk_valid = v < total_blocks
    run = jnp.take(order, p)                      # owning lane per block

    safe_blk = jnp.where(blk_valid, blk, 0)
    rows = jnp.take(payload2d, safe_blk, axis=0)  # (cap_blocks, B) DMA rows
    g = safe_blk[:, None] * B + jnp.arange(B, dtype=jnp.int32)[None, :]
    lbr = jnp.take(lb, run)[:, None]
    ubr = jnp.take(ub, run)[:, None]
    valid = blk_valid[:, None] & (g >= lbr) & (g < ubr)

    sid = (rows // jnp.uint32(offset_stride)).astype(jnp.int32)
    doff = (rows % jnp.uint32(offset_stride)).astype(jnp.int32)
    delta = doff - jnp.take(q_t, run).astype(jnp.int32)[:, None]
    first = jnp.take(q_first, run)[:, None] & valid
    return sid, delta, first, valid, total, n_dropped


def main():
    print(f"=== {PREFIX}", flush=True)
    index = FingerprintIndex.load(PREFIX + ".idx.npz")
    qz = np.load(PREFIX + ".queries.npz")
    n_songs = int(qz["n_songs"])
    dev = index.device_arrays()
    uview, usteps = build_unique_view(index.key_hi, index.key_lo,
                                      index.key_ex)
    assert uview is not None
    # packed payload reshaped to (N/B, B), zero-padded (pad rows only
    # ever land in masked-out slots)
    stride = index.offset_stride
    assert stride > 0, "block prototype assumes the packed payload layout"
    pay = (index.song_id.astype(np.uint32) * np.uint32(stride)
           + index.offset.astype(np.uint32))
    n = index.n_hashes
    npad = -(-n // B) * B
    pad = np.zeros(npad, np.uint32)
    pad[:n] = pay
    payload2d = jnp.asarray(pad.reshape(-1, B))
    del pay, pad

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

    # fitting tier for these packs
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
        print(f"{name:>34}: {dt*1e3:8.2f} ms", flush=True)
        return dt

    cap = fit

    def bounds_only(q, a):
        dv, uv = a
        return unique_bounds(uv, q[0], q[1], q[2], q[4], steps=usteps)

    def expand_only(q, a):
        dv, uv = a
        return _expand(dv, q[0], q[1], q[2], q[3], q[4],
                       match_capacity=cap, offset_stride=kw["offset_stride"],
                       uview=uv, u_steps=usteps)

    def full_sparse(q, a):
        dv, uv = a
        return match_query_sparse(dv, *q, match_capacity=cap,
                                  u_steps=usteps, uview=uv, head=None, **kw)

    def blocks_only(q, a):
        dv, uv, p2 = a
        lb, ub = unique_bounds(uv, q[0], q[1], q[2], q[4], steps=usteps)
        return block_expand(p2, lb, ub, q[3], q[4], q[5],
                            match_capacity=cap,
                            offset_stride=kw["offset_stride"])

    def block_sparse(q, a):
        dv, uv, p2 = a
        lb, ub = unique_bounds(uv, q[0], q[1], q[2], q[4], steps=usteps)
        sid, delta, first, valid, total, nd = block_expand(
            p2, lb, ub, q[3], q[4], q[5], match_capacity=cap,
            offset_stride=kw["offset_stride"])
        return _sparse_vote_rank(
            sid.reshape(-1), delta.reshape(-1), first.reshape(-1),
            valid.reshape(-1), total, nd, n_songs=n_songs,
            delta_min=kw["delta_min"], delta_range=kw["delta_range"],
            topn=2)

    # PARITY first: block path == sparse path on every pack (nothing
    # clamps at the fitting tier, so included sets are identical).
    # Index columns/payload are jit ARGUMENTS — closing over them bakes
    # 100s-of-MB HLO constants and the remote-compile tunnel 413s
    # (CLAUDE.md; measured here before this was threaded through)
    f_ref = jax.jit(functools.partial(
        match_query_sparse, match_capacity=cap, u_steps=usteps, **kw))
    got_fn = jax.jit(block_sparse)
    for i in range(qn):
        q = tuple(a[i] for a in packs)
        want = jax.device_get(f_ref(dev, *q, head=None, uview=uview))
        got = jax.device_get(got_fn(q, (dev, uview, payload2d)))
        for a, b in zip(got, want):
            assert np.array_equal(np.asarray(a), np.asarray(b)), i
    print("parity ok: block expansion == scalar expansion (sparse rank)",
          flush=True)

    from shazam_tpu.match.lookup import _pruned_vote_rank

    def block_pruned(q, a):
        dv, uv, p2 = a
        lb, ub = unique_bounds(uv, q[0], q[1], q[2], q[4], steps=usteps)
        sid, delta, first, valid, total, nd = block_expand(
            p2, lb, ub, q[3], q[4], q[5], match_capacity=cap,
            offset_stride=kw["offset_stride"])
        raw, ok = _pruned_vote_rank(
            sid.reshape(-1), delta.reshape(-1), first.reshape(-1),
            valid.reshape(-1), total, nd, n_songs=n_songs,
            delta_min=kw["delta_min"], delta_range=kw["delta_range"],
            topn=2, n_candidates=256)
        return raw, ok

    # rank-phase micro-costs at cap-length streams (random-access HBM is
    # the suspected wall): one int32 sort, one hashed scatter-add, one
    # gather — each over `cap` elements passed as ARGUMENTS
    keys = jnp.asarray(np.random.default_rng(0).integers(
        0, 1 << 30, cap).astype(np.int32))
    tbl_bits = min(24, max(18, (cap * 16 - 1).bit_length()))

    def sort_only(q, a):
        (k,) = a
        return jax.lax.sort(k + q[3][0].astype(jnp.int32))

    def scatter_only(q, a):
        (k,) = a
        b = ((k + q[3][0].astype(jnp.int32)) >> 5) & ((1 << tbl_bits) - 1)
        return jnp.zeros(1 << tbl_bits, jnp.int32).at[b].add(1, mode="drop")

    def gather_only(q, a):
        (k,) = a
        b = ((k + q[3][0].astype(jnp.int32)) >> 5) & ((1 << tbl_bits) - 1)
        return jnp.take(k, b & (cap - 1) if (cap & (cap - 1)) == 0
                        else jnp.minimum(b, cap - 1))

    timed("bounds only (uview)", bounds_only, dev, uview)
    timed(f"scalar expand @ {cap}", expand_only, dev, uview)
    timed(f"scalar expand + sparse @ {cap}", full_sparse, dev, uview)
    timed(f"BLOCK expand @ {cap}", blocks_only, dev, uview, payload2d)
    timed(f"BLOCK expand + sparse @ {cap}", block_sparse, dev, uview,
          payload2d)
    timed(f"BLOCK expand + pruned @ {cap}", block_pruned, dev, uview,
          payload2d)
    timed(f"sort only @ {cap}", sort_only, keys)
    timed(f"hashed scatter only @ {cap}", scatter_only, keys)
    timed(f"gather only @ {cap}", gather_only, keys)


if __name__ == "__main__":
    main()
