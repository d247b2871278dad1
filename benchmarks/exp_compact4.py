"""Round 4: is the scatter cost the 8 small HIGHEST-precision dots?

exp2: compare volume not the cost (32x32 == 8x128). exp3: transpose-free
(8,1024) form WORSE (4.47). Remaining suspect: 8 sequential tiny
dot_generals per tile, each f32-HIGHEST (3-6 MXU passes each, pipeline
startup per dot; 1408 small matmuls per batch).

  s4: production kernel, DEFAULT precision (WRONG VALUES — timing only,
      quantifies the HIGHEST overhead)
  s3: one concatenated dot, contraction 8192, HIGHEST
  s5: one concatenated dot, DEFAULT (timing only)
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
from shazam_tpu.ops.pallas.compact import TILE_ROWS, TILE_CAP

fs, secs, batch = 44100, 30.0, 16
n = int(secs * fs)
blen = -(-n // (1 << 18)) * (1 << 18)
mat = np.zeros((batch, blen), np.float32)
for i in range(batch):
    mat[i, :n] = synth_song(i, duration_s=secs, fs=fs, seed=5)
mat_d = jnp.asarray(mat)
nvf = jnp.asarray(np.full(batch, (n - 4096) // 2048 + 1, np.int32))


def _mk_kernel(mode, precision):
    def _kernel(tab_ref, out_ref, cnt_ref):
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
        dn = (((0,), (0,)), ((), ()))
        if mode == "loop":
            out_tile = jnp.zeros((8, 128), jnp.float32)
            for c in range(GROUP_CAP):
                pos_c = pos[:, c: c + 1]
                h = ((pos_c // 128) == a_ids).astype(jnp.float32)
                lv = ((pos_c % 128) == b_ids).astype(jnp.float32) \
                    * packed_val[:, c: c + 1].astype(jnp.float32)
                out_tile = out_tile + jax.lax.dot_general(
                    h, lv, dn, preferred_element_type=jnp.float32,
                    precision=precision)
        else:  # one concatenated dot over 8*1024 rows
            hs, lvs = [], []
            for c in range(GROUP_CAP):
                pos_c = pos[:, c: c + 1]
                hs.append(((pos_c // 128) == a_ids).astype(jnp.float32))
                lvs.append(
                    ((pos_c % 128) == b_ids).astype(jnp.float32)
                    * packed_val[:, c: c + 1].astype(jnp.float32))
            h_all = jnp.concatenate(hs, axis=0)    # (8192, 8)
            lv_all = jnp.concatenate(lvs, axis=0)  # (8192, 128)
            out_tile = jax.lax.dot_general(
                h_all, lv_all, dn, preferred_element_type=jnp.float32,
                precision=precision)

        out_ref[0] = out_tile.astype(jnp.int32)
        cnt_ref[0] = jnp.full((8, 128), tile_total, jnp.int32)
    return _kernel


def _kernel_call(kernel, table):
    bsz, r, _ = table.shape
    if r % TILE_ROWS:
        p = TILE_ROWS - r % TILE_ROWS
        table = jnp.pad(table, ((0, 0), (0, p), (0, 0)))
        r += p
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
    H = jax.lax.Precision.HIGHEST
    D = jax.lax.Precision.DEFAULT

    def table_of(x):
        return peak_candidates_fused(spectrogram_db_fused(x, nvf))

    def mk(mode, prec):
        k = _mk_kernel(mode, prec)

        def stage(x):
            return consume(_kernel_call(k, table_of(x)))
        return stage

    a = timed(lambda x: consume(table_of(x)), "base spec+peaks   ")
    p = timed(mk("loop", H), "loop HIGHEST (prod)")
    s4 = timed(mk("loop", D), "loop DEFAULT       ")
    s3 = timed(mk("cat", H), "cat  HIGHEST       ")
    s5 = timed(mk("cat", D), "cat  DEFAULT       ")
    print(f"\nkernel costs: prod {p-a:.2f} | loop-default {s4-a:.2f} | "
          f"cat-highest {s3-a:.2f} | cat-default {s5-a:.2f}")

    # parity: cat-HIGHEST must equal loop-HIGHEST exactly
    table = table_of(mat_d)
    s0 = _kernel_call(_mk_kernel("loop", H), table)
    s1 = _kernel_call(_mk_kernel("cat", H), table)
    ok = all(np.array_equal(np.asarray(x), np.asarray(y))
             for x, y in zip(s0, s1))
    print("parity cat vs loop (HIGHEST):", "OK" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
