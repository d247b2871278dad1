"""Search-descent attribution + interpolation seeding at 95M rows.

The sparse matcher at production scale spends most of its time in
lexi_bounds: every round is a lane-parallel random gather into the big
key arrays (fence rounds included — TPU has no HBM data cache, the
2.2 MB fence costs the same per round as the 95M arrays). Fingerprint
keys are SHA-1 prefixes => uniform, so the row position is predictable
from the key VALUE to ~sqrt(N)/2 rows (binomial std ~4.9K at 95M):
interpolation seeding replaces the ~19 fence rounds with one multiply.

Variants measured here:
  base    — production lexi_bounds (fence + shared-descent ub)
  interp  — interpolation-seeded window +-6 sigma, exact batch-level
            escape to the fence search when any lane's window misses
  hi1     — descent rounds gather only k_hi (1 gather/round) until the
            span is inside one hi-run, then full-key rounds
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax, random

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from shazam_tpu.index.search import lexi_bounds, _search_rounds, _lt, FENCE_STRIDE

N = int(os.environ.get("SEARCH_ROWS", 95_000_000))
Q = 4096


@jax.jit
def build_keys(key):
    k1, k2, k3 = random.split(key, 3)
    hi = random.bits(k1, (N,), jnp.uint32)
    lo = random.bits(k2, (N,), jnp.uint32)
    ex = random.bits(k3, (N,), jnp.uint32) >> 16
    return lax.sort((hi, lo, ex), num_keys=3)


def interp_bounds(k_hi, k_lo, k_ex, q_hi, q_lo, q_ex):
    """lexi_bounds with the fence search replaced by interpolation."""
    n = k_hi.shape[0]
    keys = (k_hi, k_lo, k_ex)
    queries = (q_hi, q_lo, q_ex)
    # predicted row from the key value (uniform keys): est = hi/2^32 * n
    est = (q_hi.astype(jnp.float32) * (np.float32(n) / np.float32(2**32))
           ).astype(jnp.int32)
    W = 1 << max(12, int(np.ceil(np.log2(6.0 * np.sqrt(n) / 2))))  # 6 sigma
    lo_w = jnp.clip(est - W, 0, n)
    hi_w = jnp.clip(est + W, 0, n)
    # verify the window brackets the boundary: key[lo_w-1] < q (or edge)
    # and key[hi_w] >= q (or edge); q compares by full 96-bit value but
    # the window only needs to hold the hi-run, and est error >> run len
    pl = jnp.maximum(lo_w - 1, 0)
    ph = jnp.minimum(hi_w, n - 1)
    below_ok = (lo_w == 0) | _lt(jnp.take(k_hi, pl), jnp.take(k_lo, pl),
                                 jnp.take(k_ex, pl), q_hi, q_lo, q_ex)
    above_ok = (hi_w == n) | ~_lt(jnp.take(k_hi, ph), jnp.take(k_lo, ph),
                                  jnp.take(k_ex, ph), q_hi, q_lo, q_ex)
    ok = below_ok & above_ok

    lt = lambda mh, ml, me, qh, ql, qe: _lt(mh, ml, me, qh, ql, qe)
    steps = (2 * W - 1).bit_length() + 1

    def fast(_):
        return _search_rounds(keys, queries, lt, lo_w, hi_w, steps)

    def slow(_):
        full = _search_rounds(keys, queries, lt,
                              jnp.zeros_like(lo_w), jnp.full_like(hi_w, n),
                              max(1, (n - 1).bit_length()) + 1)
        good = _search_rounds(keys, queries, lt, lo_w, hi_w, steps)
        return jnp.where(ok, good, full)

    lb = lax.cond(jnp.all(ok), fast, slow, 0)

    keep_left = lambda mh, ml, me, qh, ql, qe: ~_lt(qh, ql, qe, mh, ml, me)
    cap_hi = jnp.minimum(lb + FENCE_STRIDE, n)
    ub_r = _search_rounds(keys, queries, keep_left, lb, cap_hi,
                          FENCE_STRIDE.bit_length() + 1)
    probe = jnp.minimum(ub_r, n - 1)
    at_cap = (ub_r == cap_hi) & (cap_hi < n)
    still_le = ~_lt(q_hi, q_lo, q_ex, jnp.take(k_hi, probe),
                    jnp.take(k_lo, probe), jnp.take(k_ex, probe))
    suspect = at_cap & still_le

    def full_ub(_):
        ub_f = _search_rounds(keys, queries, keep_left,
                              jnp.zeros_like(lb), jnp.full_like(lb, n),
                              max(1, (n - 1).bit_length()) + 1)
        return jnp.where(suspect, ub_f, ub_r)

    ub = lax.cond(jnp.any(suspect), full_ub, lambda _: ub_r, 0)
    return lb, ub


def hi1_bounds(k_hi, k_lo, k_ex, q_hi, q_lo, q_ex):
    """Descend on k_hi alone (1 gather/round), then full-key finish.

    Phase 1 finds the first row with k_hi >= q_hi. Phase 2 resolves the
    (lo, ex) order inside the hi-run with bounded full-key rounds
    [p, p+FENCE_STRIDE] + the same hot-run escape as production.
    """
    n = k_hi.shape[0]
    keys = (k_hi, k_lo, k_ex)
    queries = (q_hi, q_lo, q_ex)

    def hi_only(steps, lo0, hi0):
        def body(_, carry):
            lo, hi = carry
            mid = (lo + hi) >> 1
            m = jnp.take(k_hi, mid)
            go_right = (m < q_hi) & (lo < hi)
            return (jnp.where(go_right, mid + 1, lo),
                    jnp.where(go_right | (lo >= hi), hi, mid))
        lo, hi = lax.fori_loop(0, steps, body, (lo0, hi0))
        return lo

    p = hi_only(max(1, (n - 1).bit_length()) + 1,
                jnp.zeros(q_hi.shape, jnp.int32),
                jnp.full(q_hi.shape, n, jnp.int32))

    lt = lambda mh, ml, me, qh, ql, qe: _lt(mh, ml, me, qh, ql, qe)
    cap = jnp.minimum(p + FENCE_STRIDE, n)
    lb_r = _search_rounds(keys, queries, lt, p, cap,
                          FENCE_STRIDE.bit_length() + 1)
    probe = jnp.minimum(lb_r, n - 1)
    at_cap = (lb_r == cap) & (cap < n)
    still_lt = _lt(jnp.take(k_hi, probe), jnp.take(k_lo, probe),
                   jnp.take(k_ex, probe), q_hi, q_lo, q_ex)
    suspect = at_cap & still_lt

    def full_lb(_):
        f = _search_rounds(keys, queries, lt,
                           jnp.zeros_like(p), jnp.full_like(p, n),
                           max(1, (n - 1).bit_length()) + 1)
        return jnp.where(suspect, f, lb_r)

    lb = lax.cond(jnp.any(suspect), full_lb, lambda _: lb_r, 0)

    keep_left = lambda mh, ml, me, qh, ql, qe: ~_lt(qh, ql, qe, mh, ml, me)
    cap_hi = jnp.minimum(lb + FENCE_STRIDE, n)
    ub_r = _search_rounds(keys, queries, keep_left, lb, cap_hi,
                          FENCE_STRIDE.bit_length() + 1)
    probe2 = jnp.minimum(ub_r, n - 1)
    at_cap2 = (ub_r == cap_hi) & (cap_hi < n)
    still_le = ~_lt(q_hi, q_lo, q_ex, jnp.take(k_hi, probe2),
                    jnp.take(k_lo, probe2), jnp.take(k_ex, probe2))
    suspect2 = at_cap2 & still_le

    def full_ub(_):
        f = _search_rounds(keys, queries, keep_left,
                           jnp.zeros_like(lb), jnp.full_like(lb, n),
                           max(1, (n - 1).bit_length()) + 1)
        return jnp.where(suspect2, f, ub_r)

    ub = lax.cond(jnp.any(suspect2), full_ub, lambda _: ub_r, 0)
    return lb, ub


def time_fn(fn, cols, q, tag):
    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(cols, k):
        def body(i, acc):
            lb, ub = fn(*cols, q[0] + (acc * 1e-30).astype(jnp.uint32),
                        q[1], q[2])
            return acc + jnp.sum(lb.astype(jnp.float32)) \
                + jnp.sum(ub.astype(jnp.float32))
        return lax.fori_loop(0, k, body, jnp.float32(0))

    res = {}
    for k in (1, 17):
        float(loop(cols, k))
        best = []
        for _ in range(3):
            t0 = time.time()
            float(loop(cols, k))
            best.append(time.time() - t0)
        res[k] = min(best)
    ms = (res[17] - res[1]) / 16 * 1000
    print(f"{tag}: {ms:.2f} ms / {Q}-lane bounds @ {N} rows", flush=True)
    return ms


def main():
    cols = build_keys(random.PRNGKey(0))
    jax.block_until_ready(cols)
    print(f"keys ready: {N} rows", flush=True)

    rng = np.random.default_rng(1)
    pick = rng.integers(0, N, Q)
    q = tuple(jnp.take(c, jnp.asarray(pick)) for c in cols)

    # correctness first (on-device compare, one batch)
    lb0, ub0 = lexi_bounds(*cols, *q)
    for name, fn in (("interp", interp_bounds), ("hi1", hi1_bounds)):
        lb, ub = jax.jit(fn)(*cols, *q)
        ok = bool(jnp.all(lb == lb0) & jnp.all(ub == ub0))
        print(f"{name} parity: {ok}", flush=True)
        assert ok, name

    time_fn(lambda *a: lexi_bounds(*a), cols, q, "base   ")
    time_fn(jax.jit(interp_bounds), cols, q, "interp ")
    time_fn(jax.jit(hi1_bounds), cols, q, "hi1    ")


if __name__ == "__main__":
    main()
