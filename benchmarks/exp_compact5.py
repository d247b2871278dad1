"""Round 5: fold the scan-of-DUS finish INTO the compact kernel.

The production compact stage is 3.3 ms/batch: kernel 2.68 (prefix+IO
0.56 + scatter loop 2.12) + XLA scan finish 1.02. Every scatter-loop
hypothesis is refuted (compare volume, transposes, dot count/precision),
so target the OTHER ~1 ms: the finish.

s6 keeps a persistent (A, 128) VMEM accumulator + SMEM cursor across the
row-tile grid steps and places each tile's dense segment at the running
flat offset with dynamic rolls (lane roll + row-carry select, then a
sublane roll of the 9-row contribution) — Mosaic has no dynamic stores,
but dynamic *rotates* are fine. The XLA finish collapses to a slice +
mask, and the kernel outputs shrink from 2x(r_tiles*8, 128) to
(A, 128) + (8, 128) per song.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from shazam_tpu.audio.synth import synth_song
from shazam_tpu.ops.pallas.spectrogram import spectrogram_db_fused
from shazam_tpu.ops.pallas.peaks import peak_candidates_fused, GROUP_CAP, N_GROUPS
from shazam_tpu.ops.pallas.compact import (
    compact_candidates, TILE_ROWS, TILE_CAP,
)

fs, secs, batch = 44100, 30.0, 16
n = int(secs * fs)
blen = -(-n // (1 << 18)) * (1 << 18)
mat = np.zeros((batch, blen), np.float32)
for i in range(batch):
    mat[i, :n] = synth_song(i, duration_s=secs, fs=fs, seed=5)
mat_d = jnp.asarray(mat)
nvf = jnp.asarray(np.full(batch, (n - 4096) // 2048 + 1, np.int32))
CAPACITY = 8192  # production fingerprint peak_capacity


def _ff_kernel(tab_ref, out_ref, cnt_ref, acc_ref, cur_ref, *,
               tile_rows, tile_cap, capacity, a_acc, r_tiles):
    rt = pl.program_id(1)
    a_rows = tile_cap // 128

    @pl.when(rt == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        cur_ref[0] = 0
        cur_ref[1] = 0

    tile = tab_ref[0]
    cand = tile[:, :GROUP_CAP]
    kept = jnp.minimum(tile[:, GROUP_CAP: GROUP_CAP + 1], GROUP_CAP)

    incl = kept
    shift = 1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, 1), 0)
    while shift < tile_rows:
        rolled = pltpu.roll(incl, shift, 0)
        incl = incl + jnp.where(row_ids >= shift, rolled, 0)
        shift *= 2
    base = incl - kept
    tile_total = incl[tile_rows - 1, 0]

    c_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, GROUP_CAP), 1)
    valid = c_ids < kept
    pos = jnp.where(valid, base + c_ids, tile_cap)
    r_tab = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, GROUP_CAP), 0)
    t_val = ((rt * tile_rows) + r_tab) // N_GROUPS
    packed_val = jnp.where(valid, t_val * 4096 + cand, 0)

    a_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, a_rows), 1)
    b_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, 128), 1)
    pdiv = pos // 128
    pmod = pos % 128
    val_f = packed_val.astype(jnp.float32)
    out_tile = jnp.zeros((a_rows, 128), jnp.float32)
    dn = (((0,), (0,)), ((), ()))
    for c in range(GROUP_CAP):
        h = (pdiv[:, c: c + 1] == a_ids).astype(jnp.float32)
        lv = jnp.where(pmod[:, c: c + 1] == b_ids, val_f[:, c: c + 1], 0.0)
        out_tile = out_tile + jax.lax.dot_general(
            h, lv, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    seg = out_tile.astype(jnp.int32)                     # (a_rows, 128)

    # place seg at flat offset min(cur, capacity) in the accumulator:
    # lane roll + row-carry split, then a dynamic sublane roll of the
    # (a_rows+1)-row contribution padded to the accumulator height
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


@functools.partial(jax.jit, static_argnames=("capacity",))
def compact_ff(table, capacity: int):
    bsz, r, _ = table.shape
    tile_rows, tile_cap = TILE_ROWS, TILE_CAP
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
            capacity=capacity, a_acc=a_acc, r_tiles=r_tiles),
        grid=(bsz, r_tiles),
        in_specs=[pl.BlockSpec((1, tile_rows, 128), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM)],
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
        ],
        compiler_params=pltpu.CompilerParams(
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

    counts_all = table[:, :, GROUP_CAP]
    n_peaks = jnp.sum(counts_all, axis=1).astype(jnp.uint32)
    overflow = (jnp.any(counts_all > GROUP_CAP, axis=1)
                | (raw_max > tile_cap)
                | (total_kept > capacity))
    n_peaks = jnp.where(
        overflow, jnp.maximum(n_peaks, jnp.uint32(capacity + 1)), n_peaks)
    return times, freqs, n_peaks


def consume(x):
    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(x))


def timed(stage, name, chain=16):
    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(x, k):
        def body(i, acc):
            return acc + stage(jnp.roll(x, i, axis=0) + acc * 1e-30)
        return lax.fori_loop(0, k, body, jnp.float32(0))

    float(loop(mat_d, chain))
    best = []
    for _ in range(3):
        t0 = time.time()
        float(loop(mat_d, chain))
        best.append(time.time() - t0)
    ms = min(best) / chain * 1000
    print(f"{name}: {ms:.2f} ms/batch", flush=True)
    return ms


def main():
    def table_of(x):
        return peak_candidates_fused(spectrogram_db_fused(x, nvf))

    # parity first (also runs under interpret mode on CPU)
    table = table_of(mat_d)
    prod = compact_candidates(table, CAPACITY)
    ff = compact_ff(table, CAPACITY)
    names = ("times", "freqs", "n_peaks")
    for nm, a, b in zip(names, prod, ff):
        same = np.array_equal(np.asarray(a), np.asarray(b))
        print(f"parity {nm}: {'OK' if same else 'MISMATCH'}")
        assert same, nm

    a = timed(lambda x: consume(table_of(x)), "base spec+peaks")
    p = timed(lambda x: consume(compact_candidates(table_of(x), CAPACITY)),
              "prod compact   ")
    f = timed(lambda x: consume(compact_ff(table_of(x), CAPACITY)),
              "fused-finish   ")
    print(f"\ncompact stage: prod {p-a:.2f} -> fused-finish {f-a:.2f} ms")


if __name__ == "__main__":
    main()
