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


def _tile_segment(tile, rt, seg_ref, *, tile_rows, tile_cap, group_cap):
    """One candidate-table tile -> (dense packed segment, tile_total).

    The shared core of both compaction kernels: per-row exclusive prefix
    of kept counts, then the rank-factored one-hot scatter placing each
    candidate's packed ``t * 4096 + f`` value at its dense position.
    ``seg_ref`` is an (tile_cap // 128, 128) f32 VMEM scratch holding the
    scatter accumulator so slot dots can be predicated (see below).

    Exactness: the scatter rides an f32 MXU matmul, which is exact only
    below 2^24 — but ``t`` reaches 4608 frames on 210 s tracks, so the
    GLOBAL packed value (up to ~18.9M) would round (off-by-one freqs in
    every frame >= 4096, silently corrupting hashes).  The scatter
    therefore places the TILE-LOCAL value ``t_loc * 4096 + f`` (t_loc <
    tile_frames = 128 => value < 2^19, exact) and the per-tile frame
    base is added back with one masked int32 add on the (a_rows, 128)
    segment — positions [0, tile_total) are exactly the live slots, so
    the mask is a flat-index compare.  int32 holds t < 2^19 frames
    (~6.8 h of audio), far past the 2^16-frame single-dispatch bound.
    """
    a_rows = tile_cap // 128
    tile_frames = tile_rows // N_GROUPS

    cand = tile[:, :group_cap]             # global freq or -1
    kept = jnp.minimum(tile[:, group_cap: group_cap + 1], group_cap)

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
    t_loc = r_tab // N_GROUPS              # frame within this tile
    packed_val = jnp.where(valid, t_loc * 4096 + cand, 0)  # < 2^19: exact

    # rank-factored one-hot scatter: position k = 128 a + b splits into
    # an (TILE_ROWS, 8) and a (TILE_ROWS, 128) one-hot whose product
    # contracts on the MXU — out[a, b] = sum_rows H[row, a] (L*val)[row, b]
    # lands each value at its position. ~7x fewer VPU compares than a
    # flat (TILE_ROWS, TILE_CAP) one-hot, and the sum rides the MXU.
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
    dn = (((0,), (0,)), ((), ()))
    # MXU cycles here are ~K per dot (M=8 << 128), i.e. proportional to
    # table CELLS streamed — so skip slots no row uses: for c >= max(kept)
    # every h/lv is exactly zero (pos = tile_cap for invalid slots), and
    # real tables rarely fill all GROUP_CAP slots (measured mean per-tile
    # max ~5.5/8 on the bench corpus -> ~30% of the scatter skipped).
    max_kept = jnp.max(kept)
    seg_ref[...] = jnp.zeros((a_rows, 128), jnp.float32)
    for c in range(group_cap):
        @pl.when(c < max_kept)
        def _(c=c):
            h = (pdiv[:, c: c + 1] == a_ids).astype(jnp.float32)
            lv = jnp.where(pmod[:, c: c + 1] == b_ids,
                           val_f[:, c: c + 1], 0.0)
            seg_ref[...] += jax.lax.dot_general(
                h, lv, dn, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    # add the global frame base back on the live slots (int32, exact)
    seg = seg_ref[...].astype(jnp.int32)
    fi = (jax.lax.broadcasted_iota(jnp.int32, (a_rows, 128), 0) * 128
          + jax.lax.broadcasted_iota(jnp.int32, (a_rows, 128), 1))
    live = fi < jnp.minimum(tile_total, tile_cap)
    seg = seg + jnp.where(live, rt * (tile_frames * 4096), 0)
    return seg, tile_total


def _kernel(tab_ref, out_ref, cnt_ref, seg_ref, *, tile_rows=TILE_ROWS,
            tile_cap=TILE_CAP, group_cap=GROUP_CAP):
    rt = pl.program_id(1)
    a_rows = tile_cap // 128
    seg, tile_total = _tile_segment(
        tab_ref[0], rt, seg_ref, tile_rows=tile_rows, tile_cap=tile_cap,
        group_cap=group_cap)
    out_ref[0] = seg
    cnt_ref[0] = jnp.full((a_rows, 128), tile_total, jnp.int32)


def _ff_kernel(tab_ref, out_ref, cnt_ref, acc_ref, cur_ref, seg_ref, *,
               tile_rows, tile_cap, capacity, a_acc, r_tiles,
               group_cap=GROUP_CAP):
    """Fused-finish variant: the scan-of-DUS finish folded in.

    A persistent VMEM accumulator + SMEM cursor place each tile's dense
    segment at the running flat offset with dynamic rotates (lane roll +
    row-carry select, then a sublane roll) — Mosaic has no dynamic
    stores, but dynamic rotates are fine.  Replaces the XLA scan finish
    (~0.3 ms/batch net) and shrinks outputs ~6x; measured exact-parity
    vs the two-level path on TPU (benchmarks/exp_compact5.py).
    """
    rt = pl.program_id(1)
    a_rows = tile_cap // 128

    @pl.when(rt == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        cur_ref[0] = 0
        cur_ref[1] = 0

    seg, tile_total = _tile_segment(
        tab_ref[0], rt, seg_ref, tile_rows=tile_rows, tile_cap=tile_cap,
        group_cap=group_cap)                             # (a_rows, 128)

    # place seg at flat offset min(cur, capacity): lane roll + row-carry
    # split, then a dynamic sublane roll of the (a_rows+1)-row
    # contribution padded to the accumulator height
    cur = cur_ref[0]
    off = jnp.minimum(cur, capacity)
    s = off % 128
    r0 = off // 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (a_rows, 128), 1)
    rolled = pltpu.roll(seg, s, 1)
    low = jnp.where(lane >= s, rolled, 0)
    high = jnp.where(lane < s, rolled, 0)
    zrow = jnp.zeros((1, 128), jnp.int32)
    contrib = (jnp.concatenate([low, zrow], 0)
               + jnp.concatenate([zrow, high], 0))       # (a_rows+1, 128)
    pad = jnp.zeros((a_acc - a_rows - 1, 128), jnp.int32)
    acc_ref[...] += pltpu.roll(jnp.concatenate([contrib, pad], 0), r0, 0)

    cur_ref[0] = cur + jnp.minimum(tile_total, tile_cap)
    cur_ref[1] = jnp.maximum(cur_ref[1], tile_total)

    @pl.when(rt == r_tiles - 1)
    def _emit():
        out_ref[0] = acc_ref[...]
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        cnt_ref[0] = jnp.where(
            rows8 == 0, cur_ref[0], jnp.where(rows8 == 1, cur_ref[1], 0))


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
    any per-group or tile overflow).  Uses the fused-finish kernel
    (``_ff_kernel``); the two-level ``_kernel`` + scan finish is kept for
    the benchmark history in benchmarks/exp_compact*.py.
    """
    bsz, r, _ = table.shape
    a_rows = tile_cap // 128
    if r % tile_rows:
        pad = tile_rows - r % tile_rows
        table = jnp.pad(table, ((0, 0), (0, pad), (0, 0)))
        r += pad
    r_tiles = r // tile_rows
    a_acc = -(-(capacity // 128 + a_rows + 1) // 8) * 8

    out, cnt = pl.pallas_call(
        functools.partial(
            _ff_kernel, tile_rows=tile_rows, tile_cap=tile_cap,
            capacity=capacity, a_acc=a_acc, r_tiles=r_tiles,
            group_cap=group_cap),
        grid=(bsz, r_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_rows, 128), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, a_acc, 128), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, a_acc, 128), jnp.int32),
            jax.ShapeDtypeStruct((bsz, 8, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((a_acc, 128), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((tile_cap // 128, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # large tiles (2048+ rows, double-buffered) exceed the 16M
            # default scoped-vmem budget
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(table)

    packed = out.reshape(bsz, a_acc * 128)[:, :capacity]
    total_kept = cnt[:, 0, 0]
    raw_max = cnt[:, 1, 0]
    live = (jnp.arange(capacity, dtype=jnp.int32)[None, :]
            < total_kept[:, None])
    packed = jnp.where(live, packed, 0)
    times = (packed // 4096).astype(jnp.uint32)
    freqs = (packed % 4096).astype(jnp.uint32)

    counts_all = table[:, :, group_cap]
    n_peaks = jnp.sum(counts_all, axis=1).astype(jnp.uint32)
    overflow = (
        jnp.any(counts_all > group_cap, axis=1)
        | (raw_max > tile_cap)
        | (total_kept > capacity)
    )
    n_peaks = jnp.where(
        overflow, jnp.maximum(n_peaks, jnp.uint32(capacity + 1)), n_peaks
    )
    return times, freqs, n_peaks
