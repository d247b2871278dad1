"""Isolate the ~3.75 ms compact stage (exp_layout.py refuted the regroup
hypothesis: the reshape costs 0.12 ms; the cost is INSIDE compact).

Variants on spec+peaks (10.07 ms base, 13.82 with full compact):

  k0  compact Pallas kernel only (no XLA scan finish)
  k1  kernel with the sublane prefix loop (10x pltpu.roll on a
      (1024, 1) vector — suspected layout poison) replaced by a
      two-level MXU prefix ((8, 128) reshape + triangular matmul)
  k2  kernel with the rank-factored scatter loop removed (prefix only)
  kf  full compact_candidates (kernel + scan-of-DUS finish)

k0 - base = kernel; kf - k0 = finish; k2 vs k0 = scatter share;
k1 vs k0 = prefix-loop share.
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


def _prefix_roll(kept):
    """The production kernel's prefix: log rolls over a (1024, 1) vec."""
    incl = kept
    shift = 1
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 1), 0)
    while shift < TILE_ROWS:
        rolled = pltpu.roll(incl, shift, 0)
        incl = incl + jnp.where(row_ids >= shift, rolled, 0)
        shift *= 2
    return incl


def _prefix_mxu(kept):
    """Two-level MXU prefix: (1024,1) -> (8,128) tri-matmul + combine."""
    k8 = kept.astype(jnp.float32).reshape(8, 128)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ).astype(jnp.float32)
    within = jax.lax.dot_general(
        k8, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # inclusive within each 128-chunk
    totals = within[:, 127:128]                       # (8, 1)
    chunk = totals
    s = 1
    cid = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    while s < 8:
        chunk = chunk + jnp.where(cid >= s, pltpu.roll(chunk, s, 0), 0.0)
        s *= 2
    excl_chunk = chunk - totals                       # exclusive chunk base
    incl = within + excl_chunk                        # (8, 128)
    # broadcast back to (1024, 1): Mosaic cannot reshape (8,128)->(1024,1),
    # but row_sel @ incl lands chunk i's lanes on rows 128i..128i+127 and
    # a lane one-hot picks row%128 — one tiny MXU op + a lane reduce
    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 8), 0)
    row_sel = ((rows // 128) == jax.lax.broadcasted_iota(
        jnp.int32, (TILE_ROWS, 8), 1)).astype(jnp.float32)
    spread = jax.lax.dot_general(
        row_sel, incl, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (1024, 128)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 1)
    pick = (jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 0)
            % 128) == lanes
    return jnp.sum(jnp.where(pick, spread, 0.0), axis=1,
                   keepdims=True).astype(jnp.int32)


def _make_kernel(prefix_impl, do_scatter):
    def _kernel(tab_ref, out_ref, cnt_ref):
        rt = pl.program_id(1)
        tile = tab_ref[0]
        cand = tile[:, :GROUP_CAP]
        kept = jnp.minimum(tile[:, GROUP_CAP: GROUP_CAP + 1], GROUP_CAP)
        incl = prefix_impl(kept)
        base = incl - kept
        tile_total = incl[TILE_ROWS - 1, 0]

        if do_scatter:
            c_ids = jax.lax.broadcasted_iota(
                jnp.int32, (TILE_ROWS, GROUP_CAP), 1)
            valid = c_ids < kept
            pos = jnp.where(valid, base + c_ids, TILE_CAP)
            r_tab = jax.lax.broadcasted_iota(
                jnp.int32, (TILE_ROWS, GROUP_CAP), 0)
            t_val = ((rt * TILE_ROWS) + r_tab) // N_GROUPS
            packed_val = jnp.where(valid, t_val * 4096 + cand, 0)
            a_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 8), 1)
            b_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 1)
            out_tile = jnp.zeros((8, 128), jnp.float32)
            dn = (((0,), (0,)), ((), ()))
            for c in range(GROUP_CAP):
                pos_c = pos[:, c: c + 1]
                h = ((pos_c // 128) == a_ids).astype(jnp.float32)
                lv = ((pos_c % 128) == b_ids).astype(jnp.float32) \
                    * packed_val[:, c: c + 1].astype(jnp.float32)
                out_tile = out_tile + jax.lax.dot_general(
                    h, lv, dn, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            out_ref[0] = out_tile.astype(jnp.int32)
        else:
            out_ref[0] = jnp.broadcast_to(
                base[:8, :], (8, 128)
            )
        cnt_ref[0] = jnp.full((8, 128), tile_total, jnp.int32)
    return _kernel


def _kernel_call(kernel, table):
    bsz, r, _ = table.shape
    if r % TILE_ROWS:
        pad = TILE_ROWS - r % TILE_ROWS
        table = jnp.pad(table, ((0, 0), (0, pad), (0, 0)))
        r += pad
    r_tiles = r // TILE_ROWS
    return pl.pallas_call(
        kernel,
        grid=(bsz, r_tiles),
        in_specs=[pl.BlockSpec((1, TILE_ROWS, 128), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM)],
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
    def base(x):
        return consume(peak_candidates_fused(spectrogram_db_fused(x, nvf)))

    def mk(kernel):
        def stage(x):
            table = peak_candidates_fused(spectrogram_db_fused(x, nvf))
            return consume(_kernel_call(kernel, table))
        return stage

    def kf(x):
        table = peak_candidates_fused(spectrogram_db_fused(x, nvf))
        return consume(compact_candidates(table, 4096))

    a = timed(base, "base spec+peaks      ")
    k0 = timed(mk(_make_kernel(_prefix_roll, True)), "k0 +kernel (roll+scat)")
    k1 = timed(mk(_make_kernel(_prefix_mxu, True)), "k1 +kernel (mxu+scat) ")
    k2 = timed(mk(_make_kernel(_prefix_roll, False)), "k2 +kernel (roll only)")
    k3 = timed(mk(_make_kernel(_prefix_mxu, False)), "k3 +kernel (mxu only) ")
    f = timed(kf, "kf full compact       ")
    print(f"\nkernel {k0-a:.2f} (prefix-roll {k2-a:.2f}, mxu-prefix "
          f"{k3-a:.2f}, scatter {k0-k2:.2f}) | mxu-kernel {k1-a:.2f} | "
          f"finish {f-k0:.2f}")


if __name__ == "__main__":
    main()
