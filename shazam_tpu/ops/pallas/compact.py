"""Pallas candidate-table compaction: shrink before the final top_k.

Turns the per-(frame, group) candidate table emitted by
``peaks.peak_candidates_fused`` (R x 8 slots, mostly empty) into densely
packed per-tile segments, so the order-preserving top_k that produces the
final (capacity,) peak list runs over 4x fewer elements. (A fully
contiguous in-kernel cursor write is blocked by Mosaic's 128-alignment
rule for dynamic stores; a cumsum+searchsorted finish is gather-bound at
~20 ns/element. This two-level shape measures fastest.)

Per (song, TILE_ROWS-row tile) grid step:
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

TILE_ROWS = 2176   # candidate-table rows per grid step (= one 128-frame
                   # peaks tile; measured fastest — benchmarks/exp_tile.py)
TILE_CAP = 1024    # dense segment size per tile (typ. ~300 candidates at
                   # 128 frames; overflow falls back to the exact path)


def _kernel(tab_ref, out_ref, cnt_ref, *, tile_rows=TILE_ROWS,
            tile_cap=TILE_CAP, group_cap=GROUP_CAP):
    rt = pl.program_id(1)
    a_rows = tile_cap // 128

    tile = tab_ref[0]                      # (tile_rows, 128) int32
    cand = tile[:, :group_cap]             # global freq or -1
    kept = jnp.minimum(tile[:, group_cap : group_cap + 1], group_cap)

    # exclusive per-row prefix of kept counts (log shifts over sublanes)
    incl = kept
    shift = 1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, 1), 0)
    while shift < tile_rows:
        rolled = pltpu.roll(incl, shift, 0)
        incl = incl + jnp.where(row_ids >= shift, rolled, 0)
        shift *= 2
    base = incl - kept                     # (tile_rows, 1)
    tile_total = incl[tile_rows - 1, 0]

    c_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, group_cap), 1)
    valid = c_ids < kept
    pos = jnp.where(valid, base + c_ids, tile_cap)  # invalid -> out of range

    r_tab = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, group_cap), 0)
    t_val = ((rt * tile_rows) + r_tab) // N_GROUPS
    packed_val = jnp.where(valid, t_val * 4096 + cand, 0)  # < 2^26, int32

    # rank-factored one-hot scatter: position k = 128 a + b splits into
    # an (TILE_ROWS, 8) and a (TILE_ROWS, 128) one-hot whose product
    # contracts on the MXU — out[a, b] = sum_rows H[row, a] (L*val)[row, b]
    # lands each value at its position. ~7x fewer VPU compares than a
    # flat (TILE_ROWS, TILE_CAP) one-hot, and the sum rides the MXU.
    # Values are < 2^24 so the f32 matmul is exact.
    #
    # Every elementwise op here costs a FULL (TILE_ROWS, 128)-vreg pass
    # regardless of array width (narrow (N, 1)/(N, 8) arrays still span
    # 128 vregs), so div/mod/casts are hoisted out of the slot loop —
    # the loop body is two compares, a select, a cast and the dot.
    a_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, a_rows), 1)
    b_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, 128), 1)
    pdiv = pos // 128                          # (TILE_ROWS, GROUP_CAP)
    pmod = pos % 128
    val_f = packed_val.astype(jnp.float32)
    out_tile = jnp.zeros((a_rows, 128), jnp.float32)
    dn = (((0,), (0,)), ((), ()))
    for c in range(group_cap):
        h = (pdiv[:, c : c + 1] == a_ids).astype(jnp.float32)
        lv = jnp.where(pmod[:, c : c + 1] == b_ids, val_f[:, c : c + 1], 0.0)
        out_tile = out_tile + jax.lax.dot_general(
            h, lv, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    out_ref[0] = out_tile.astype(jnp.int32)
    cnt_ref[0] = jnp.full((a_rows, 128), tile_total, jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("capacity", "tile_rows", "tile_cap",
                              "group_cap")
)
def compact_candidates(table: jnp.ndarray, capacity: int,
                       tile_rows: int = TILE_ROWS,
                       tile_cap: int = TILE_CAP,
                       group_cap: int = GROUP_CAP):
    """(B, R, 128) candidate table -> (times, freqs, n_peaks) per song.

    Same contract as ``peaks.extract_peaks_from_candidates`` (peaks in
    (t, f) order, zeros past the count, n_peaks clamped above capacity on
    any per-group or tile overflow).
    """
    bsz, r, _ = table.shape
    a_rows = tile_cap // 128
    if r % tile_rows:
        pad = tile_rows - r % tile_rows
        table = jnp.pad(table, ((0, 0), (0, pad), (0, 0)))
        r += pad
    r_tiles = r // tile_rows

    segs, seg_counts = pl.pallas_call(
        functools.partial(_kernel, tile_rows=tile_rows, tile_cap=tile_cap,
                          group_cap=group_cap),
        grid=(bsz, r_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_rows, 128), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, a_rows, 128), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_rows, 128), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, r_tiles * a_rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((bsz, r_tiles * a_rows, 128), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            # large tiles (2048+ rows, double-buffered) exceed the 16M
            # default scoped-vmem budget
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(table)
    segs = segs.reshape(bsz, r_tiles, tile_cap)
    seg_counts = seg_counts[:, ::a_rows, 0]

    # finish: the segments are DENSE (live lanes are [0, cnt)), so the
    # final peak list is just their concatenation — a scan of r_tiles
    # dynamic-update-slices at the running offsets. This replaces an
    # order-preserving top_k over r_tiles * tile_cap candidates that
    # measured 3.6 ms/batch (gather/sort-bound); the scan is ~free.
    # Each segment's dead tail lanes are overwritten by the next segment
    # (base advances by exactly cnt); whatever survives past the total is
    # masked below.
    kept = jnp.minimum(seg_counts, tile_cap)                    # (B, R)
    base = jnp.cumsum(kept, axis=1) - kept                      # exclusive
    total_kept = jnp.sum(kept, axis=1)                          # (B,)

    buf0 = jnp.zeros((bsz, capacity + tile_cap), jnp.int32)

    def step(buf, inp):
        seg, st = inp  # (B, tile_cap), (B,)
        buf = jax.vmap(
            lambda b, s, i: jax.lax.dynamic_update_slice(b, s, (i,))
        )(buf, seg, jnp.minimum(st, capacity))
        return buf, None

    buf, _ = jax.lax.scan(
        step, buf0, (segs.transpose(1, 0, 2), base.T.astype(jnp.int32))
    )
    packed = buf[:, :capacity]
    live = (
        jnp.arange(capacity, dtype=jnp.int32)[None, :] < total_kept[:, None]
    )
    packed = jnp.where(live, packed, 0)
    times = (packed // 4096).astype(jnp.uint32)
    freqs = (packed % 4096).astype(jnp.uint32)

    counts_all = table[:, :, group_cap]
    n_peaks = jnp.sum(counts_all, axis=1).astype(jnp.uint32)
    overflow = (
        jnp.any(counts_all > group_cap, axis=1)
        | jnp.any(seg_counts > tile_cap, axis=1)
        | (total_kept > capacity)
    )
    n_peaks = jnp.where(
        overflow, jnp.maximum(n_peaks, jnp.uint32(capacity + 1)), n_peaks
    )
    return times, freqs, n_peaks
