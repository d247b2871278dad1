"""Where does recognize-at-95M actually spend its ms? REAL-index split.

Loads the saved production build (.data/prod12288: 95,293,120 real
hashes, 8 real 15 s query packs) and decomposes the match stage with
chained fori_loop timings (CLAUDE.md protocol). Variants:

  bounds_hB      lexi_bounds with a 2^B-bucket head (B = 20 default /
                 22 / 24): descent rounds ~ log2(rows/bucket), so more
                 head bits trade a bigger (but build-once) CDF for
                 fewer rounds of 3 random gathers x 4096 lanes each.
  bounds_pk_hB   same descent over an INTERLEAVED (n, 3) uint32 key
                 table: one 12-byte row gather per probe instead of 3
                 scattered 4-byte gathers (TPU HBM gathers are
                 latency-bound; a row is one transaction).
  expand_16k     + capacity-bounded row expansion (payload gathers)
  sparse_16k/65k full match_query_sparse (the production regime at 12K
                 songs) at the fast tier and the escalated tier.

Every variant is verified against the baseline bounds before timing.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from shazam_tpu.index.search import _head_spans, _lt, _le_q, build_head
from shazam_tpu.index.store import FingerprintIndex
from shazam_tpu.match.lookup import match_query_sparse, _expand
from shazam_tpu.match.prepare import q_frames_for_max_offset

PREFIX = os.environ.get("CLIP95_DB", "/root/repo/.data/prod12288")

index = FingerprintIndex.load(PREFIX + ".idx.npz")
qz = np.load(PREFIX + ".queries.npz")
n_songs = int(qz["n_songs"])
dev = index.device_arrays()
packs = tuple(jnp.asarray(qz[k]) for k in
              ("hi", "lo", "ex", "t", "valid", "first"))
qn = int(qz["hi"].shape[0])
print(f"index {index.n_hashes} rows, {n_songs} songs; {qn} packs of "
      f"{qz['hi'].shape[1]} lanes", flush=True)

clip_frames = int(qz["clip_samples"]) // 2048 + 1
delta_min = -q_frames_for_max_offset(clip_frames)
delta_range = ((index.max_offset // 4096) + 1) * 4096 \
    + q_frames_for_max_offset(clip_frames)
kw = dict(n_songs=n_songs, delta_min=delta_min, delta_range=delta_range,
          topn=2, offset_stride=index.offset_stride)

# interleaved key table for the packed-descent variant
packed_keys = jnp.asarray(
    np.stack([np.asarray(index.key_hi), np.asarray(index.key_lo),
              np.asarray(index.key_ex)], axis=1))  # (n, 3) uint32

heads = {}
for bits in (20, 22, 24):
    t0 = time.time()
    heads[bits] = jax.block_until_ready(build_head(dev[0], bits=bits))
    print(f"head {bits} bits: {heads[bits].nbytes >> 20} MB, "
          f"built in {time.time()-t0:.1f}s", flush=True)


def packed_bounds(pk, head, q_hi, q_lo, q_ex, q_valid):
    """lexi_bounds' head path with one (lanes, 3) row gather per round."""
    lo0, hi0 = _head_spans(head, q_hi)
    lo0 = jnp.where(q_valid, lo0, 0)
    hi0 = jnp.where(q_valid, hi0, 0)

    def descend(keep_left_on, lo, hi):
        def step(c):
            lo, hi = c
            mid = (lo + hi) >> 1
            m = jnp.take(pk, mid, axis=0)       # (lanes, 3) one row txn
            go_right = keep_left_on(m[:, 0], m[:, 1], m[:, 2],
                                    q_hi, q_lo, q_ex) & (lo < hi)
            return (jnp.where(go_right, mid + 1, lo),
                    jnp.where(go_right | (lo >= hi), hi, mid))
        return lax.while_loop(lambda c: jnp.any(c[0] < c[1]), step,
                              (lo, hi))[0]

    lb = descend(_lt, lo0, hi0)
    ub = descend(_le_q, lb, hi0)
    return lb, ub


# ---- correctness gates (pack 0) ----------------------------------------
from shazam_tpu.index.search import lexi_bounds

q0 = tuple(a[0] for a in packs)
lb_ref, ub_ref = jax.device_get(lexi_bounds(
    dev[0], dev[1], dev[2], q0[0], q0[1], q0[2], head=heads[20],
    q_valid=q0[4]))
for bits in (22, 24):
    lb, ub = jax.device_get(lexi_bounds(
        dev[0], dev[1], dev[2], q0[0], q0[1], q0[2], head=heads[bits],
        q_valid=q0[4]))
    assert np.array_equal(lb, lb_ref) and np.array_equal(ub, ub_ref), bits
for bits in (20, 24):
    lb, ub = jax.device_get(jax.jit(packed_bounds)(
        packed_keys, heads[bits], q0[0], q0[1], q0[2], q0[4]))
    assert np.array_equal(lb, lb_ref) and np.array_equal(ub, ub_ref), bits
print("correctness gates ok", flush=True)


# ---- chained timings ----------------------------------------------------
# Large arrays (index columns, heads, the packed key table) MUST flow
# through jit as ARGUMENTS (the `ops` pytree), never closures: a
# closed-over device array is baked into the serialized HLO as a
# constant and the remote-compile tunnel rejects bodies past ~100 MB
# with HTTP 413 (measured on this very script's first run).
def chain_time(make_out, label, *ops):
    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(qs, ops, k):
        def body(i, acc):
            bump = (acc * 1e-30).astype(jnp.uint32)
            q = tuple(lax.dynamic_index_in_dim(a, i % qn, 0,
                                               keepdims=False) for a in qs)
            out = make_out((q[0] ^ bump,) + q[1:], *ops)
            return acc + sum(jnp.sum(l.astype(jnp.float32))
                             for l in jax.tree_util.tree_leaves(out))
        return lax.fori_loop(0, k, body, jnp.float32(0))

    res = {}
    for k in (1, 9):
        float(loop(packs, ops, k))
        best = []
        for _ in range(3):
            t0 = time.time()
            float(loop(packs, ops, k))
            best.append(time.time() - t0)
        res[k] = min(best)
    ms = (res[9] - res[1]) / 8 * 1000
    print(f"{label:18s} {ms:7.2f} ms", flush=True)
    return ms


for bits in (20, 22, 24):
    chain_time(lambda q, d, h: lexi_bounds(
        d[0], d[1], d[2], q[0], q[1], q[2], head=h,
        q_valid=q[4]), f"bounds_h{bits}", dev, heads[bits])
for bits in (20, 22, 24):
    chain_time(lambda q, p, h: packed_bounds(
        p, h, q[0], q[1], q[2], q[4]),
        f"bounds_pk_h{bits}", jnp.asarray(packed_keys), heads[bits])

for cap in (16384, 262144):
    chain_time(lambda q, d, h, c=cap: _expand(
        d, q[0], q[1], q[2], q[3], q[4], match_capacity=c,
        offset_stride=index.offset_stride, head=h),
        f"expand_{cap // 1024}k", dev, heads[20])

# the tones corpus's real 15 s packs expand to 174K-262K rows at 95.3M
# (measured: every hash owns ~350 rows) — the p50 serving tier is
# 262144, so that's the honest single-dispatch cost; 16k/64k show the
# tier scaling.
for cap in (16384, 65536, 262144):
    chain_time(lambda q, d, h, c=cap: match_query_sparse(
        d, *q, match_capacity=c, head=h, **kw),
        f"sparse_{cap // 1024}k", dev, heads[20])

# the sparse matcher pays a match_capacity-length lax.sort per query;
# the dense histogram (n_songs x delta_range int32, ~500 MB here) pays
# memset + scatter-add + a full-bin rank instead — bandwidth-bound, no
# sort, so it may win at escalated tiers for SINGLE queries (batched
# serving can't afford 500 MB/query; sparse stays for that regime).
from shazam_tpu.match.lookup import match_query

for cap in (16384, 262144):
    chain_time(lambda q, d, h, c=cap: match_query(
        d, *q, match_capacity=c, head=h, **kw),
        f"dense_{cap // 1024}k", dev, heads[20])
