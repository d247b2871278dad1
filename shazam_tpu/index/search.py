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


def _binary_search(keys, queries, keep_left_on):
    """Shared lower/upper bound machinery.

    keep_left_on(k_mid, q) -> True where the search range should move right
    (i.e. mid is strictly before the boundary).
    """
    k_hi, k_lo, k_ex = keys
    q_hi, q_lo, q_ex = queries
    n = k_hi.shape[0]
    steps = max(1, (n - 1).bit_length() if n > 0 else 1)

    lo = jnp.zeros(q_hi.shape, jnp.int32)
    hi = jnp.full(q_hi.shape, n, jnp.int32)

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

    lo, hi = jax.lax.fori_loop(0, steps + 1, body, (lo, hi))
    return lo


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
