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
    """Shared lower/upper bound machinery, fence-accelerated.

    keep_left_on(k_mid, q) -> True where the search range should move right
    (i.e. mid is strictly before the boundary).

    Random gathers into the full key arrays are the latency hot-spot at
    13M+ rows (~25 rounds x 3 gathers/lane). A fence of every 512th key
    (~300 KB at 13M rows — cache-resident after the first rounds) absorbs
    all but log2(512)+1 of the rounds: the fence search narrows each lane
    to one 512-row span, and only ~10 rounds touch the big arrays.
    """
    k_hi = keys[0]
    n = k_hi.shape[0]
    q_shape = queries[0].shape

    if n > 8 * FENCE_STRIDE:
        # (a SECOND fence level measured perf-neutral at 95M rows —
        # 21.3 vs 20.8 ms per 4096-lane match_query, benchmarks/
        # exp_search.py: the search is bound by the per-round gathers
        # into the big arrays, not by L1-fence cache residency)
        fence = tuple(k[::FENCE_STRIDE] for k in keys)
        nf = fence[0].shape[0]
        f_steps = max(1, (nf - 1).bit_length()) + 1
        f0 = _search_rounds(
            fence, queries, keep_left_on,
            jnp.zeros(q_shape, jnp.int32), jnp.full(q_shape, nf, jnp.int32),
            f_steps,
        )
        # fence[f0-1] is before the boundary, fence[f0] is not (or past
        # the end): the answer lies in [(f0-1)*S + 1, min(f0*S, n)] —
        # widen the left edge to (f0-1)*S to keep the invariant simple
        lo = jnp.maximum(f0 - 1, 0) * FENCE_STRIDE
        hi = jnp.minimum(f0 * FENCE_STRIDE, n)
        steps = FENCE_STRIDE.bit_length() + 1
    else:
        lo = jnp.zeros(q_shape, jnp.int32)
        hi = jnp.full(q_shape, n, jnp.int32)
        steps = max(1, (n - 1).bit_length() if n > 0 else 1) + 1

    return _search_rounds(keys, queries, keep_left_on, lo, hi, steps)


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
    cap_hi = jnp.minimum(lb + FENCE_STRIDE, n)
    ub_r = _search_rounds(keys, queries, keep_left, lb, cap_hi,
                          FENCE_STRIDE.bit_length() + 1)
    probe = jnp.minimum(ub_r, n - 1)
    at_cap = (ub_r == cap_hi) & (cap_hi < n)
    still_le = ~_lt(q_hi, q_lo, q_ex, jnp.take(k_hi, probe),
                    jnp.take(k_lo, probe), jnp.take(k_ex, probe))
    suspect = at_cap & still_le

    def full_ub(_):
        ub_f = _binary_search(keys, queries, keep_left)
        return jnp.where(suspect, ub_f, ub_r)

    ub = jax.lax.cond(jnp.any(suspect), full_ub, lambda _: ub_r, 0)
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
