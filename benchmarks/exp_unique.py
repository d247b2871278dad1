"""Unique-key search table: can collapsing duplicate 80-bit keys beat
the two-descent lexi_bounds at production scale?

Fingerprint keys repeat heavily on real catalogs (the tone-corpus
95.3M-row build averages ~350 rows per hash => only ~270K UNIQUE keys;
music-skew catalogs sit between that and 1 row/key). The production
search (`index/search.lexi_bounds`) runs TWO dynamic descents over the
full row table — and a hot 70K-row run costs every lane log2(70K)
rounds because the while_loop trips until the widest lane converges.

Layout under test: (uniq_hi, uniq_lo, uniq_ex) sorted unique keys +
cdf[u+1] (row offsets into the payload table, which stays exactly as
it is). Then for a query q:

    pos       = lower_bound(uniq, q)          # ONE descent
    hit       = pos < u  &  uniq[pos] == q
    (lb, ub)  = (cdf[pos], cdf[pos+1]) where hit else (0, 0)

- the upper bound is FREE (one take on the cdf);
- duplicate runs collapse to one unique row, so hot runs cannot
  inflate the while_loop trip count;
- the searched table shrinks n -> u (272K at tone-95.3M: 18 fixed
  rounds over 3.3 MB instead of dynamic rounds over 1.1 GB);
- with a bucket head over uniq_hi the descent is ~log2(u / 2^bits).

Variants (all verified against production lexi_bounds row spans):
  prod_h20        production lexi_bounds with the 20-bit head
  uniq_h{B}       unique-table descent, B-bit head over uniq_hi
  uniq_pk_h{B}    same, with the unique keys interleaved (u, 3) so one
                  row gather replaces 3 column gathers per probe

Memory: unique layout REPLACES the 3 full key columns at serving time
(keys stored once per unique + u+1 cdf) — smaller than the row-key
layout whenever keys repeat at all.

Usage: [CLIP95_DB=prefix] python benchmarks/exp_unique.py
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

from shazam_tpu.index.search import build_head, lexi_bounds, _head_spans, _lt
from shazam_tpu.index.store import FingerprintIndex

PREFIX = os.environ.get("CLIP95_DB", "/root/repo/.data/prod12288")

index = FingerprintIndex.load(PREFIX + ".idx.npz")
qz = np.load(PREFIX + ".queries.npz")
dev = index.device_arrays()
packs = tuple(jnp.asarray(qz[k]) for k in
              ("hi", "lo", "ex", "t", "valid", "first"))
qn = int(qz["hi"].shape[0])

# ---- build the unique-key table on host (one lexsorted pass) -----------
hi = np.asarray(index.key_hi)
lo = np.asarray(index.key_lo)
ex = np.asarray(index.key_ex)
n = hi.shape[0]
new = np.empty(n, bool)
new[0] = True
np.logical_or(hi[1:] != hi[:-1],
              np.logical_or(lo[1:] != lo[:-1], ex[1:] != ex[:-1]),
              out=new[1:])
starts = np.flatnonzero(new).astype(np.uint32)
u = len(starts)
print(f"index {n} rows -> {u} unique keys "
      f"({n / max(u, 1):.1f} rows/key)", flush=True)
uq = (jnp.asarray(hi[starts]), jnp.asarray(lo[starts]),
      jnp.asarray(ex[starts]))
cdf = jnp.asarray(np.concatenate(
    [starts, np.uint32([n])]).astype(np.int32))
uq_pk = jnp.asarray(np.stack(
    [hi[starts], lo[starts], ex[starts]], axis=1))  # (u, 3)


def uniq_bounds(uq, cdf, head, q_hi, q_lo, q_ex, q_valid, *, steps):
    """(lb, ub) row spans from the unique table: one fixed-round
    descent + two cdf takes. Head gives per-lane windows; `steps` is
    log2 of the widest bucket MEASURED at head-build time (static), so
    no dynamic while_loop is needed and hot runs can't inflate it."""
    u_hi, u_lo, u_ex = uq
    uu = u_hi.shape[0]
    lo0, hi0 = _head_spans(head, q_hi)
    lo0 = jnp.where(q_valid, lo0, 0)
    hi0 = jnp.where(q_valid, hi0, 0)

    def step(c, _):
        lo_, hi_ = c
        mid = (lo_ + hi_) >> 1
        m = (jnp.take(u_hi, mid), jnp.take(u_lo, mid), jnp.take(u_ex, mid))
        go_right = _lt(m[0], m[1], m[2], q_hi, q_lo, q_ex) & (lo_ < hi_)
        return (jnp.where(go_right, mid + 1, lo_),
                jnp.where(go_right | (lo_ >= hi_), hi_, mid)), None

    (pos, _), _ = lax.scan(step, (lo0, hi0), None, length=steps)
    safe = jnp.minimum(pos, uu - 1)
    hit = (pos < uu) & q_valid \
        & (jnp.take(u_hi, safe) == q_hi) \
        & (jnp.take(u_lo, safe) == q_lo) \
        & (jnp.take(u_ex, safe) == q_ex)
    lb = jnp.where(hit, jnp.take(cdf, safe), 0)
    ub = jnp.where(hit, jnp.take(cdf, safe + 1), 0)
    return lb, ub


def uniq_bounds_pk(pk, cdf, head, q_hi, q_lo, q_ex, q_valid, *, steps):
    """uniq_bounds over the interleaved (u, 3) key table: one row
    gather per probe instead of 3 column gathers."""
    uu = pk.shape[0]
    lo0, hi0 = _head_spans(head, q_hi)
    lo0 = jnp.where(q_valid, lo0, 0)
    hi0 = jnp.where(q_valid, hi0, 0)

    def step(c, _):
        lo_, hi_ = c
        mid = (lo_ + hi_) >> 1
        m = jnp.take(pk, mid, axis=0)
        go_right = _lt(m[:, 0], m[:, 1], m[:, 2],
                       q_hi, q_lo, q_ex) & (lo_ < hi_)
        return (jnp.where(go_right, mid + 1, lo_),
                jnp.where(go_right | (lo_ >= hi_), hi_, mid)), None

    (pos, _), _ = lax.scan(step, (lo0, hi0), None, length=steps)
    safe = jnp.minimum(pos, uu - 1)
    m = jnp.take(pk, safe, axis=0)
    hit = (pos < uu) & q_valid & (m[:, 0] == q_hi) \
        & (m[:, 1] == q_lo) & (m[:, 2] == q_ex)
    lb = jnp.where(hit, jnp.take(cdf, safe), 0)
    ub = jnp.where(hit, jnp.take(cdf, safe + 1), 0)
    return lb, ub


# heads over the UNIQUE hi column (tiny build) + the production head;
# per-head static round count = log2(widest measured bucket) + 1
uheads = {}
usteps = {}
for b in (16, 20):
    bb = min(b, max(1, int(np.log2(max(u, 2)))))
    h = jax.block_until_ready(build_head(uq[0], bits=bb))
    widest = int(np.max(np.diff(np.asarray(h))))
    uheads[b] = h
    usteps[b] = max(1, widest.bit_length() + 1)
    print(f"uniq head {b} bits: widest bucket {widest} -> "
          f"{usteps[b]} rounds", flush=True)
prod_head = jax.block_until_ready(build_head(dev[0], bits=20))

# ---- correctness gates vs production lexi_bounds ------------------------
q0 = tuple(a[0] for a in packs)
lb_ref, ub_ref = jax.device_get(lexi_bounds(
    dev[0], dev[1], dev[2], q0[0], q0[1], q0[2], head=prod_head,
    q_valid=q0[4]))
# production returns (0,0) for masked lanes; misses return lb==ub
span_ref = np.where(np.asarray(q0[4]), ub_ref - lb_ref, 0)
lbr = np.where(span_ref > 0, lb_ref, 0)
for name, fn in (("uniq", lambda: uniq_bounds(
        uq, cdf, uheads[16], q0[0], q0[1], q0[2], q0[4],
        steps=usteps[16])),
        ("uniq_pk", lambda: uniq_bounds_pk(
            uq_pk, cdf, uheads[16], q0[0], q0[1], q0[2], q0[4],
            steps=usteps[16]))):
    lb_t, ub_t = jax.device_get(jax.jit(lambda f=fn: f())())
    span_t = ub_t - lb_t
    assert np.array_equal(span_t, span_ref), name
    assert np.array_equal(np.where(span_t > 0, lb_t, 0), lbr), name
print("correctness gates ok", flush=True)


# ---- chained timings (ops as jit ARGS — closures 413 the tunnel) --------
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
    print(f"{label:16s} {ms:7.2f} ms", flush=True)
    return ms


chain_time(lambda q, d, h: lexi_bounds(
    d[0], d[1], d[2], q[0], q[1], q[2], head=h, q_valid=q[4]),
    "prod_h20", dev, prod_head)
for b, h in uheads.items():
    chain_time(lambda q, t, c, hh, s=usteps[b]: uniq_bounds(
        t, c, hh, q[0], q[1], q[2], q[4], steps=s),
        f"uniq_h{b}", uq, cdf, h)
    chain_time(lambda q, t, c, hh, s=usteps[b]: uniq_bounds_pk(
        t, c, hh, q[0], q[1], q[2], q[4], steps=s),
        f"uniq_pk_h{b}", uq_pk, cdf, h)
