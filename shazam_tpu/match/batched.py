"""Batched multi-query matching: many clips against the index in one program.

The reference answers one query at a time over a DB socket (thread pools
just parallelize the SELECT batches, ``recognizer_thread.py:290-298``).
On TPU the natural form is a vmap over the whole query batch: every
clip's binary searches, vote expansion and histogram reduce run in one
compiled program, amortizing dispatch and filling the chip — the serving
path for high-QPS deployments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .lookup import (match_local, match_query_sparse, rank_votes,
                     RawMatch)


@functools.partial(
    jax.jit,
    static_argnames=("n_songs", "delta_min", "delta_range", "match_capacity",
                     "topn", "offset_stride", "sparse", "u_steps"),
)
def match_queries_batched(
    index_arrays,
    q_hi, q_lo, q_ex, q_t, q_valid, q_first,   # each (Bq, Q)
    *,
    n_songs: int,
    delta_min: int,
    delta_range: int,
    match_capacity: int = 65536,
    topn: int = 2,
    offset_stride: int = 0,
    sparse: bool = None,
    head=None,
    uview=None,
    u_steps: int = 0,
) -> RawMatch:
    """Match a (Bq, Q) batch of padded queries; returns batched RawMatch.

    ``sparse`` (default: auto past 16M histogram bins) vmaps the
    sort-based matcher instead of the dense histogram — a (Bq, n_songs,
    delta_range) histogram stack is ~4 GB per batch at 12K songs.
    """
    if sparse is None:
        sparse = n_songs * delta_range > 16_000_000

    def one(hi, lo, ex, t, valid, first):
        if sparse:
            return match_query_sparse(
                index_arrays, hi, lo, ex, t, valid, first,
                n_songs=n_songs, delta_min=delta_min,
                delta_range=delta_range, match_capacity=match_capacity,
                topn=topn, offset_stride=offset_stride, head=head,
                uview=uview, u_steps=u_steps,
            )
        hist, rows_hist, total, n_dropped = match_local(
            index_arrays, hi, lo, ex, t, valid, first,
            n_songs=n_songs, delta_min=delta_min, delta_range=delta_range,
            match_capacity=match_capacity, offset_stride=offset_stride,
            head=head, uview=uview, u_steps=u_steps,
        )
        return rank_votes(hist, rows_hist, total, delta_min=delta_min,
                          topn=topn, n_dropped=n_dropped)

    return jax.vmap(one)(q_hi, q_lo, q_ex, q_t, q_valid, q_first)


@functools.partial(
    jax.jit,
    static_argnames=("n_songs", "delta_min", "delta_range", "match_capacity",
                     "topn", "offset_stride"),
)
def match_queries_batched_spanned(
    span_arrays,
    q_hi, q_lo, q_ex, q_t, q_valid, q_first,   # each (Bq, Q)
    *,
    n_songs: int,
    delta_min: int,
    delta_range: int,
    match_capacity: int = 65536,
    topn: int = 2,
    offset_stride: int = 0,
    heads=None,
):
    """``match_queries_batched`` against a spanned index (per-span tuples
    or the consolidated stacked layout — lookup.match_query_sparse_spanned
    dispatches).  Returns (batched RawMatch, (Bq,) span_max): the retry /
    overflow signal is per clip, since every span clamps its expansion
    independently at ``match_capacity``."""
    from .lookup import match_query_sparse_spanned

    def one(hi, lo, ex, t, valid, first):
        return match_query_sparse_spanned(
            span_arrays, hi, lo, ex, t, valid, first,
            n_songs=n_songs, delta_min=delta_min, delta_range=delta_range,
            match_capacity=match_capacity, topn=topn,
            offset_stride=offset_stride, heads=heads,
        )

    return jax.vmap(one)(q_hi, q_lo, q_ex, q_t, q_valid, q_first)
