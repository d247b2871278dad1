"""Pallas candidate-table compaction: shrink before the final top_k.

Turns the per-(frame, group) candidate table emitted by
``peaks.peak_candidates_fused`` (R x 8 slots, mostly empty) into densely
packed per-tile segments, so the order-preserving top_k that produces the
final (capacity,) peak list runs over 4x fewer elements. (A fully
contiguous in-kernel cursor write is blocked by Mosaic's 128-alignment
rule for dynamic stores; a cumsum+searchsorted finish is gather-bound at
~20 ns/element. This two-level shape measures fastest.)

Per (song, 256-row tile) grid step:
- per-row exclusive prefix of kept counts (log-shift adds over sublanes),
- one-hot projection of the tile's <= TILE_CAP candidates into a dense
  (TILE_CAP,) segment: k along lanes, rows along sublanes, int32
  multiply + column sums (values pack as t * 4096 + f, exact in int32),
- aligned per-tile writes; the segment count rides in a side output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .peaks import GROUP_CAP, N_GROUPS

TILE_ROWS = 1024   # candidate-table rows per grid step (~60 frames)
TILE_CAP = 1024    # dense segment size per tile (typ. ~200 candidates)


def _kernel(tab_ref, out_ref, cnt_ref):
    rt = pl.program_id(1)

    tile = tab_ref[0]                      # (TILE_ROWS, 128) int32
    cand = tile[:, :GROUP_CAP]             # global freq or -1
    kept = jnp.minimum(tile[:, GROUP_CAP : GROUP_CAP + 1], GROUP_CAP)

    # exclusive per-row prefix of kept counts (log shifts over sublanes)
    incl = kept
    shift = 1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 1), 0)
    while shift < TILE_ROWS:
        rolled = pltpu.roll(incl, shift, 0)
        incl = incl + jnp.where(row_ids >= shift, rolled, 0)
        shift *= 2
    base = incl - kept                     # (TILE_ROWS, 1)
    tile_total = incl[TILE_ROWS - 1, 0]

    c_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, GROUP_CAP), 1)
    valid = c_ids < kept
    pos = jnp.where(valid, base + c_ids, TILE_CAP)  # invalid -> out of range

    r_tab = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, GROUP_CAP), 0)
    t_val = ((rt * TILE_ROWS) + r_tab) // N_GROUPS
    packed_val = jnp.where(valid, t_val * 4096 + cand, 0)  # < 2^26, int32

    # one-hot projection: k along lanes, rows along sublanes (no reshapes
    # or transposes — Mosaic-friendly), int32 column sums
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, TILE_CAP), 1)
    out_tile = jnp.zeros((1, TILE_CAP), jnp.int32)
    for c in range(GROUP_CAP):
        onehot = (pos[:, c : c + 1] == k_ids).astype(jnp.int32)
        out_tile = out_tile + jnp.sum(
            onehot * packed_val[:, c : c + 1], axis=0, keepdims=True
        )

    # out block is (8, 128): reshape the 1024-lane segment (minor stays
    # a multiple of 128 so Mosaic accepts it)
    out_ref[0] = out_tile.reshape(8, 128)
    cnt_ref[0] = jnp.full((8, 128), tile_total, jnp.int32)


@functools.partial(jax.jit, static_argnames=("capacity",))
def compact_candidates(table: jnp.ndarray, capacity: int):
    """(B, R, 128) candidate table -> (times, freqs, n_peaks) per song.

    Same contract as ``peaks.extract_peaks_from_candidates`` (peaks in
    (t, f) order, zeros past the count, n_peaks clamped above capacity on
    any per-group or tile overflow).
    """
    bsz, r, _ = table.shape
    if r % TILE_ROWS:
        pad = TILE_ROWS - r % TILE_ROWS
        table = jnp.pad(table, ((0, 0), (0, pad), (0, 0)))
        r += pad
    r_tiles = r // TILE_ROWS

    segs, seg_counts = pl.pallas_call(
        _kernel,
        grid=(bsz, r_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE_ROWS, 128), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, 128), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, r_tiles * 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((bsz, r_tiles * 8, 128), jnp.int32),
        ),
    )(table)
    segs = segs.reshape(bsz, r_tiles, TILE_CAP)
    seg_counts = seg_counts[:, ::8, 0]

    def one(seg, cnt, counts_row):
        n = seg.shape[0] * TILE_CAP
        slot_in_tile = jnp.arange(n, dtype=jnp.int32) % TILE_CAP
        live = slot_in_tile < jnp.repeat(
            jnp.minimum(cnt, TILE_CAP), TILE_CAP, total_repeat_length=n
        )
        score = jnp.where(live, n - jnp.arange(n, dtype=jnp.int32), 0)
        vals, idx = jax.lax.top_k(score, min(capacity, n))
        if capacity > n:
            vals = jnp.pad(vals, (0, capacity - n))
            idx = jnp.pad(idx, (0, capacity - n))
        ok = vals > 0
        packed = jnp.where(ok, jnp.take(seg.reshape(-1), idx), 0)
        times = (packed // 4096).astype(jnp.uint32)
        freqs = (packed % 4096).astype(jnp.uint32)

        n_peaks = jnp.sum(counts_row).astype(jnp.uint32)
        overflow = (
            jnp.any(counts_row > GROUP_CAP)
            | jnp.any(cnt > TILE_CAP)
            | (jnp.sum(jnp.minimum(cnt, TILE_CAP)) > capacity)
        )
        n_peaks = jnp.where(
            overflow, jnp.maximum(n_peaks, jnp.uint32(capacity + 1)), n_peaks
        )
        return times, freqs, n_peaks

    return jax.vmap(one)(segs, seg_counts, table[:, :, GROUP_CAP])
