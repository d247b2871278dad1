"""Round 2 of the compact-stage attack (exp_compact.py measured:
kernel 2.68 ms of which SCATTER 2.12, prefix ~0.5, XLA finish 1.0).

- s1: 32x32 position factorization for the rank-factored scatter
  (pos = 32a + b): one-hot compare volume drops 392 -> 128 lane-cells
  per row per slot; output tile (32, 32) padded to (32, 128).
- f_mm: finish as ONE factorized matmul scatter over all tiles
  (pos = 128A + b over the 5120-slot output) instead of the 11-step
  scan of dynamic-update-slices.
- f_at: finish as a flat jnp .at[].set scatter (XLA native lowering).

Combos timed against the production kernel + scan finish.
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
from shazam_tpu.ops.pallas.compact import compact_candidates, TILE_ROWS, TILE_CAP

fs, secs, batch = 44100, 30.0, 16
n = int(secs * fs)
blen = -(-n // (1 << 18)) * (1 << 18)
mat = np.zeros((batch, blen), np.float32)
for i in range(batch):
    mat[i, :n] = synth_song(i, duration_s=secs, fs=fs, seed=5)
mat_d = jnp.asarray(mat)
nvf = jnp.asarray(np.full(batch, (n - 4096) // 2048 + 1, np.int32))
CAPACITY = 4096


def _s1_kernel(tab_ref, out_ref, cnt_ref):
    """32x32-factorized scatter; out rows (32, 128) use lanes [0:32)."""
    rt = pl.program_id(1)
    tile = tab_ref[0]
    cand = tile[:, :GROUP_CAP]
    kept = jnp.minimum(tile[:, GROUP_CAP: GROUP_CAP + 1], GROUP_CAP)

    incl = kept
    shift = 1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 1), 0)
    while shift < TILE_ROWS:
        rolled = pltpu.roll(incl, shift, 0)
        incl = incl + jnp.where(row_ids >= shift, rolled, 0)
        shift *= 2
    base = incl - kept
    tile_total = incl[TILE_ROWS - 1, 0]

    c_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, GROUP_CAP), 1)
    valid = c_ids < kept
    pos = jnp.where(valid, base + c_ids, TILE_CAP)
    r_tab = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, GROUP_CAP), 0)
    t_val = ((rt * TILE_ROWS) + r_tab) // N_GROUPS
    packed_val = jnp.where(valid, t_val * 4096 + cand, 0)

    a_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 32), 1)
    b_ids = a_ids  # same iota, 32 lanes
    out_tile = jnp.zeros((32, 32), jnp.float32)
    dn = (((0,), (0,)), ((), ()))
    for c in range(GROUP_CAP):
        pos_c = pos[:, c: c + 1]
        h = ((pos_c // 32) == a_ids).astype(jnp.float32)
        lv = ((pos_c % 32) == b_ids).astype(jnp.float32) \
            * packed_val[:, c: c + 1].astype(jnp.float32)
        out_tile = out_tile + jax.lax.dot_general(
            h, lv, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    pad = jnp.zeros((32, 96), jnp.float32)
    out_ref[0] = jnp.concatenate([out_tile, pad], axis=1).astype(jnp.int32)
    cnt_ref[0] = jnp.full((8, 128), tile_total, jnp.int32)


def _s1_call(table):
    bsz, r, _ = table.shape
    if r % TILE_ROWS:
        p = TILE_ROWS - r % TILE_ROWS
        table = jnp.pad(table, ((0, 0), (0, p), (0, 0)))
        r += p
    r_tiles = r // TILE_ROWS
    return pl.pallas_call(
        _s1_kernel,
        grid=(bsz, r_tiles),
        in_specs=[pl.BlockSpec((1, TILE_ROWS, 128), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, 32, 128), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, r_tiles * 32, 128), jnp.int32),
            jax.ShapeDtypeStruct((bsz, r_tiles * 8, 128), jnp.int32),
        ),
    )(table)


def _segs_s1(table):
    segs32, cnts = _s1_call(table)
    bsz = table.shape[0]
    r_tiles = segs32.shape[1] // 32
    segs = segs32.reshape(bsz, r_tiles, 32, 128)[:, :, :, :32] \
        .reshape(bsz, r_tiles, TILE_CAP)
    seg_counts = cnts[:, ::8, 0]
    return segs, seg_counts


def _finish_scan(segs, seg_counts, capacity):
    bsz = segs.shape[0]
    kept = jnp.minimum(seg_counts, TILE_CAP)
    base = jnp.cumsum(kept, axis=1) - kept
    total_kept = jnp.sum(kept, axis=1)
    buf0 = jnp.zeros((bsz, capacity + TILE_CAP), jnp.int32)

    def step(buf, inp):
        seg, st = inp
        buf = jax.vmap(
            lambda b, s, i: jax.lax.dynamic_update_slice(b, s, (i,))
        )(buf, seg, jnp.minimum(st, capacity))
        return buf, None

    buf, _ = jax.lax.scan(
        step, buf0, (segs.transpose(1, 0, 2), base.T.astype(jnp.int32)))
    packed = buf[:, :capacity]
    live = (jnp.arange(capacity, dtype=jnp.int32)[None, :]
            < total_kept[:, None])
    return jnp.where(live, packed, 0), total_kept


def _finish_mm(segs, seg_counts, capacity):
    """One factorized matmul scatter over every tile's dense lanes."""
    bsz, r_tiles, _ = segs.shape
    kept = jnp.minimum(seg_counts, TILE_CAP)
    base = (jnp.cumsum(kept, axis=1) - kept).astype(jnp.int32)
    total_kept = jnp.sum(kept, axis=1)
    out_slots = capacity + TILE_CAP
    n_a = out_slots // 128

    j = jnp.arange(TILE_CAP, dtype=jnp.int32)[None, None, :]
    pos = jnp.where(
        j < kept[:, :, None], base[:, :, None] + j, out_slots
    ).reshape(bsz, r_tiles * TILE_CAP)
    vals = segs.reshape(bsz, r_tiles * TILE_CAP).astype(jnp.float32)

    a_ids = jnp.arange(n_a, dtype=jnp.int32)[None, None, :]
    b_ids = jnp.arange(128, dtype=jnp.int32)[None, None, :]
    h = ((pos[:, :, None] // 128) == a_ids).astype(jnp.float32)
    lv = ((pos[:, :, None] % 128) == b_ids).astype(jnp.float32) \
        * vals[:, :, None]
    packed = jax.lax.dot_general(
        h, lv, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(bsz, out_slots)[:, :capacity].astype(jnp.int32)
    live = (jnp.arange(capacity, dtype=jnp.int32)[None, :]
            < total_kept[:, None])
    return jnp.where(live, packed, 0), total_kept


def _finish_at(segs, seg_counts, capacity):
    """Flat unique-index scatter via .at[].set (XLA native)."""
    bsz, r_tiles, _ = segs.shape
    kept = jnp.minimum(seg_counts, TILE_CAP)
    base = (jnp.cumsum(kept, axis=1) - kept).astype(jnp.int32)
    total_kept = jnp.sum(kept, axis=1)
    out_slots = capacity + TILE_CAP

    j = jnp.arange(TILE_CAP, dtype=jnp.int32)[None, None, :]
    # invalid lanes get DISTINCT out-of-range positions (unique_indices
    # must hold for every index, dropped or not)
    flat = jnp.arange(r_tiles * TILE_CAP, dtype=jnp.int32) \
        .reshape(1, r_tiles, TILE_CAP)
    pos = jnp.where(
        j < kept[:, :, None], base[:, :, None] + j, out_slots + flat
    ).reshape(bsz, r_tiles * TILE_CAP)
    vals = segs.reshape(bsz, r_tiles * TILE_CAP)

    def one(p, v):
        return jnp.zeros(out_slots, jnp.int32).at[p].set(
            v, mode="drop", unique_indices=True)[:capacity]

    packed = jax.vmap(one)(pos, vals)
    live = (jnp.arange(capacity, dtype=jnp.int32)[None, :]
            < total_kept[:, None])
    return jnp.where(live, packed, 0), total_kept


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

    def prod(x):
        return consume(compact_candidates(table_of(x), CAPACITY))

    def s1_only(x):
        return consume(_s1_call(table_of(x)))

    def s1_scan(x):
        segs, cnts = _segs_s1(table_of(x))
        return consume(_finish_scan(segs, cnts, CAPACITY))

    def s1_mm(x):
        segs, cnts = _segs_s1(table_of(x))
        return consume(_finish_mm(segs, cnts, CAPACITY))

    def s1_at(x):
        segs, cnts = _segs_s1(table_of(x))
        return consume(_finish_at(segs, cnts, CAPACITY))

    p = timed(prod, "prod kernel+scan  ")
    a = timed(s1_only, "s1 kernel only    ")
    b = timed(s1_scan, "s1 + scan finish  ")
    c = timed(s1_mm, "s1 + matmul finish")
    d = timed(s1_at, "s1 + .at[] finish ")
    print(f"\nprod {p:.2f} | s1 kernel {a:.2f} | +scan {b:.2f} | "
          f"+mm {c:.2f} | +at {d:.2f}")

    # parity check (values, not timings)
    table = table_of(mat_d)
    t0, f0, n0 = compact_candidates(table, CAPACITY)
    segs, cnts = _segs_s1(table)
    for nm, fin in (("mm", _finish_mm), ("at", _finish_at),
                    ("scan", _finish_scan)):
        packed, tk = fin(segs, cnts, CAPACITY)
        t1 = (packed // 4096).astype(np.uint32)
        f1 = (packed % 4096).astype(np.uint32)
        ok = (np.array_equal(np.asarray(t0), np.asarray(t1))
              and np.array_equal(np.asarray(f0), np.asarray(f1)))
        print(f"parity s1+{nm}: {'OK' if ok else 'MISMATCH'}", flush=True)


if __name__ == "__main__":
    main()
