"""Vectorized lexicographic binary search over 80-bit fingerprint keys.

The HBM index stores keys as three parallel uint32 arrays (hi, lo, ex16)
sorted lexicographically. Lookups are lane-parallel binary searches: every
query walks ceil(log2 N) rounds of gather + compare, all queries at once.
This replaces the reference's ``SELECT ... WHERE hash IN (...)`` round
trips (``mysql_database.py:82-86``, ``recognizer.py:252-257``) with a few
dozen fused HBM gathers.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _lt(a_hi, a_lo, a_ex, b_hi, b_lo, b_ex):
    """Lexicographic (hi, lo, ex) <."""
    return (a_hi < b_hi) | (
        (a_hi == b_hi) & ((a_lo < b_lo) | ((a_lo == b_lo) & (a_ex < b_ex)))
    )


FENCE_STRIDE = 512  # span refined by the fence pre-search


def _search_rounds(keys, queries, keep_left_on, lo, hi, steps):
    """`steps` rounds of lane-parallel gather+compare on [lo, hi]."""
    k_hi, k_lo, k_ex = keys
    q_hi, q_lo, q_ex = queries

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) >> 1
        m_hi = jnp.take(k_hi, mid)
        m_lo = jnp.take(k_lo, mid)
        m_ex = jnp.take(k_ex, mid)
        go_right = keep_left_on(m_hi, m_lo, m_ex, q_hi, q_lo, q_ex) & (lo < hi)
        new_lo = jnp.where(go_right, mid + 1, lo)
        new_hi = jnp.where(go_right | (lo >= hi), hi, mid)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def _binary_search(keys, queries, keep_left_on):
    """Shared lower/upper bound machinery, interpolation-seeded.

    keep_left_on(k_mid, q) -> True where the search range should move right
    (i.e. mid is strictly before the boundary).

    Random gathers into the full key arrays are the latency hot-spot at
    13M+ rows (~25 rounds x 3 gathers/lane), and TPU HBM gathers have no
    data cache, so even a compact fence of every 512th key costs a full
    round per step. Fingerprint keys are SHA-1 prefixes => uniform in
    [0, 2^32), so the boundary row is ~Binomial(n, hi/2^32): the key
    VALUE predicts the row to ~sqrt(n)/2 std and one multiply replaces
    the ~19-round descent (11.4 -> 4.8 ms per 4096-lane ``lexi_bounds``
    at 95M rows, benchmarks/exp_search2.py). The +-6 sigma window is
    verified exactly per lane; any miss (non-uniform keys) escapes to a
    full descent under a batch-level ``lax.cond`` and the per-lane
    results are merged, so correctness never depends on the key
    distribution.
    """
    k_hi = keys[0]
    n = k_hi.shape[0]
    q_shape = queries[0].shape

    if n <= 8 * FENCE_STRIDE:
        lo = jnp.zeros(q_shape, jnp.int32)
        hi = jnp.full(q_shape, n, jnp.int32)
        steps = max(1, (n - 1).bit_length() if n > 0 else 1) + 1
        return _search_rounds(keys, queries, keep_left_on, lo, hi, steps)

    q_hi = queries[0]
    # f32 relative error ~2^-24 adds < n/2^24 rows of est error —
    # negligible vs the >=4096-row window at any n that reaches here
    est = (q_hi.astype(jnp.float32)
           * jnp.float32(n / float(2**32))).astype(jnp.int32)
    w = 1 << max(12, math.ceil(math.log2(6.0 * math.sqrt(n) / 2.0)))
    lo_w = jnp.clip(est - w, 0, n)
    hi_w = jnp.clip(est + w, 0, n)
    # the window brackets the boundary iff key[lo_w-1] is strictly before
    # it (or the window starts at 0) and key[hi_w] is not (or it ends at n)
    pl = jnp.maximum(lo_w - 1, 0)
    ph = jnp.minimum(hi_w, n - 1)

    def take3(p):
        return (jnp.take(keys[0], p), jnp.take(keys[1], p),
                jnp.take(keys[2], p))

    below_ok = (lo_w == 0) | keep_left_on(*take3(pl), *queries)
    above_ok = (hi_w == n) | ~keep_left_on(*take3(ph), *queries)
    ok = below_ok & above_ok
    steps = (2 * w - 1).bit_length() + 1
    full_steps = max(1, (n - 1).bit_length()) + 1

    def fast(_):
        return _search_rounds(keys, queries, keep_left_on, lo_w, hi_w, steps)

    def slow(_):
        full = _search_rounds(
            keys, queries, keep_left_on,
            jnp.zeros(q_shape, jnp.int32), jnp.full(q_shape, n, jnp.int32),
            full_steps)
        good = _search_rounds(keys, queries, keep_left_on, lo_w, hi_w, steps)
        return jnp.where(ok, good, full)

    return jax.lax.cond(jnp.all(ok), fast, slow, 0)


@functools.partial(jax.jit)
def lexi_bounds(k_hi, k_lo, k_ex, q_hi, q_lo, q_ex):
    """(lower, upper) bounds sharing one descent.

    The upper bound always lies in [lb, n]; for buckets shorter than
    FENCE_STRIDE it lies in [lb, lb + FENCE_STRIDE], so a 10-round
    search over that span replaces the full ~28-round descent. Lanes
    whose span saturates AND whose capped boundary key still compares
    <= the query (hyper-hot keys) are resolved exactly by a full
    upper-bound search under a batch-level lax.cond — typical queries
    skip it entirely (~32% fewer search rounds).
    """
    keys = (k_hi, k_lo, k_ex)
    queries = (q_hi, q_lo, q_ex)
    lb = _binary_search(
        keys, queries,
        lambda mh, ml, me, qh, ql, qe: _lt(mh, ml, me, qh, ql, qe),
    )
    n = k_hi.shape[0]
    keep_left = lambda mh, ml, me, qh, ql, qe: ~_lt(qh, ql, qe, mh, ml, me)

    def capped_ub(lo, span, prev_ub, redo):
        """Bounded [lo, lo+span] upper search for lanes in `redo`; flags
        lanes whose bucket may extend past the cap."""
        cap = jnp.minimum(lo + span, n)
        found = _search_rounds(keys, queries, keep_left, lo, cap,
                               span.bit_length() + 1)
        ub = jnp.where(redo, found, prev_ub)
        probe = jnp.minimum(ub, n - 1)
        at_cap = redo & (ub == cap) & (cap < n)
        still_le = ~_lt(q_hi, q_lo, q_ex, jnp.take(k_hi, probe),
                        jnp.take(k_lo, probe), jnp.take(k_ex, probe))
        return ub, at_cap & still_le

    ones = jnp.ones(lb.shape, bool)
    ub_r, suspect = capped_ub(lb, FENCE_STRIDE, jnp.zeros_like(lb), ones)

    # hyper-common hashes own 10K-70K rows at production scale and show
    # up in most real query batches, so a straight escape to the full
    # descent fires nearly always there; a 128K middle tier resolves any
    # observed bucket in +8 rounds and keeps the full search for the
    # pathological tail only
    def tier2(_):
        ub2, susp2 = capped_ub(lb, 128 * 1024, ub_r, suspect)

        def full_ub(_):
            ub_f = _binary_search(keys, queries, keep_left)
            return jnp.where(susp2, ub_f, ub2)

        return jax.lax.cond(jnp.any(susp2), full_ub, lambda _: ub2, 0)

    ub = jax.lax.cond(jnp.any(suspect), tier2, lambda _: ub_r, 0)
    return lb, ub


@functools.partial(jax.jit)
def lexi_lower_bound(k_hi, k_lo, k_ex, q_hi, q_lo, q_ex):
    """First index i with keys[i] >= q (per query lane)."""
    return _binary_search(
        (k_hi, k_lo, k_ex), (q_hi, q_lo, q_ex),
        lambda mh, ml, me, qh, ql, qe: _lt(mh, ml, me, qh, ql, qe),
    )


@functools.partial(jax.jit)
def lexi_upper_bound(k_hi, k_lo, k_ex, q_hi, q_lo, q_ex):
    """First index i with keys[i] > q (per query lane)."""
    return _binary_search(
        (k_hi, k_lo, k_ex), (q_hi, q_lo, q_ex),
        lambda mh, ml, me, qh, ql, qe: ~_lt(qh, ql, qe, mh, ml, me),
    )
