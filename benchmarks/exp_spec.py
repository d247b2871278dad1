"""Isolate the spectrogram kernel's 6.2 ms: DMA/framing vs stage-1 vs
stage-2 vs epilogue. All variants write the same (NA, tile, NB) block so
output bandwidth is constant; only the compute prefix differs.

  s0  DMA + framing + Hann (frames reduced into the out block)
  s1  + stage-1 dots (writes gr)
  s2  + stage-2 batched dots (writes xr)
  s3  full power kernel (production)
  s4  stage-2 with er|ei merged into ONE double-wide dot per part
      (2 dots instead of 4 — tests per-dot overhead)
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
from shazam_tpu.ops.pallas import spectrogram as SP
from shazam_tpu.ops.pallas.spectrogram import (
    spectrogram_power_fused, _tables, NA, NB, PRECISION,
)
from shazam_tpu.ops.spectrogram import hann_window

fs, secs, batch = 44100, 30.0, 16
n = int(secs * fs)
blen = -(-n // (1 << 18)) * (1 << 18)
mat = np.zeros((batch, blen), np.float32)
for i in range(batch):
    mat[i, :n] = synth_song(i, duration_s=secs, fs=fs, seed=5)
mat_d = jnp.asarray(mat)
nvf = jnp.asarray(np.full(batch, (n - 4096) // 2048 + 1, np.int32))
WSIZE, HOP, TILE = 4096, 2048, 128


def _mk_kernel(depth):
    def _kernel(nvf_ref, x_hbm, win_ref, c32_ref, s32_ref, er_ref, ei_ref,
                scale_ref, out_ref, x_vmem, sems):
        b = pl.program_id(0)
        t_tile = pl.program_id(1)
        n_tiles = pl.num_programs(1)
        span_rows = (TILE * HOP + (WSIZE - HOP)) // NB
        step = b * n_tiles + t_tile
        slot = jax.lax.rem(step, 2)
        nxt_slot = jax.lax.rem(step + 1, 2)

        def dma(bb, tt, s):
            return pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(tt * (TILE * HOP // NB), span_rows)],
                x_vmem.at[s], sems.at[s])

        @pl.when(step == 0)
        def _():
            dma(b, t_tile, slot).start()

        nxt = step + 1

        @pl.when(nxt < pl.num_programs(0) * n_tiles)
        def _():
            dma(nxt // n_tiles, jax.lax.rem(nxt, n_tiles), nxt_slot).start()

        dma(b, t_tile, slot).wait()
        x_tile = x_vmem[slot]

        rows = x_tile.reshape(TILE + 1, HOP)
        frames = jnp.concatenate([rows[0:TILE], rows[1:TILE + 1]], axis=1)
        frames = frames * win_ref[:][None, :]
        x2 = frames.reshape(TILE, NA, NB)

        if depth == 0:
            out_ref[0] = jnp.broadcast_to(
                jnp.sum(x2, axis=1)[None], (NA, TILE, NB))
            return

        dn1 = (((1,), (1,)), ((), ()))
        gr = jax.lax.dot_general(c32_ref[:], x2, dn1,
                                 preferred_element_type=jnp.float32,
                                 precision=PRECISION)
        gi = jax.lax.dot_general(s32_ref[:], x2, dn1,
                                 preferred_element_type=jnp.float32,
                                 precision=PRECISION)
        if depth == 1:
            out_ref[0] = gr + gi
            return

        dnb = (((2,), (1,)), ((0,), (0,)))
        if depth == 4:
            # merged: E2 = [er | ei] along m' -> one (b, 256) dot per part
            e2 = jnp.concatenate([er_ref[:], ei_ref[:]], axis=2)  # (r,b,256)
            pr = jax.lax.dot_general(gr, e2, dnb,
                                     preferred_element_type=jnp.float32,
                                     precision=PRECISION)
            pi = jax.lax.dot_general(gi, e2, dnb,
                                     preferred_element_type=jnp.float32,
                                     precision=PRECISION)
            xr = pr[:, :, :NB] - pi[:, :, NB:]
            xi = pr[:, :, NB:] + pi[:, :, :NB]
        else:
            xr = (jax.lax.dot_general(gr, er_ref[:], dnb,
                                      preferred_element_type=jnp.float32,
                                      precision=PRECISION)
                  - jax.lax.dot_general(gi, ei_ref[:], dnb,
                                        preferred_element_type=jnp.float32,
                                        precision=PRECISION))
            xi = (jax.lax.dot_general(gr, ei_ref[:], dnb,
                                      preferred_element_type=jnp.float32,
                                      precision=PRECISION)
                  + jax.lax.dot_general(gi, er_ref[:], dnb,
                                        preferred_element_type=jnp.float32,
                                        precision=PRECISION))
        if depth == 2:
            out_ref[0] = xr + xi
            return

        power = (xr * xr + xi * xi) * scale_ref[:][:, None, :]
        nv = nvf_ref[b]
        t_ids = jax.lax.broadcasted_iota(jnp.int32, power.shape, 1) \
            + t_tile * TILE
        out_ref[0] = jnp.where(t_ids < nv, power, 0.0)
    return _kernel


def _call(depth, samples):
    bsz, nn = samples.shape
    n_frames = (nn - WSIZE) // HOP + 1
    t_tiles = -(-n_frames // TILE)
    t_pad = t_tiles * TILE
    need = t_pad * HOP + (WSIZE - HOP)
    if need > nn:
        samples = jnp.pad(samples, ((0, 0), (0, need - nn)))
    c32, s32, er, ei, scale = (jnp.asarray(t) for t in _tables(WSIZE, fs))
    win = hann_window(WSIZE)
    span = TILE * HOP + (WSIZE - HOP)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, t_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(
            (1, NA, TILE, NB), lambda b, t, *_: (b, 0, t, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, span // NB, NB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _mk_kernel(depth),
        out_shape=jax.ShapeDtypeStruct((bsz, NA, t_pad, NB), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(nvf.astype(jnp.int32), samples.astype(jnp.float32).reshape(bsz, -1, NB),
      win, c32, s32, er, ei, scale)


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
    s3p = timed(lambda x: consume(spectrogram_power_fused(x, nvf)),
                "prod power+untwist")
    s0 = timed(lambda x: consume(_call(0, x)), "s0 dma+framing    ")
    s1 = timed(lambda x: consume(_call(1, x)), "s1 +stage1 dots   ")
    s2 = timed(lambda x: consume(_call(2, x)), "s2 +stage2 dots   ")
    s3 = timed(lambda x: consume(_call(3, x)), "s3 +epilogue      ")
    s4 = timed(lambda x: consume(_call(4, x)), "s4 merged stage2  ")
    print(f"\nframing {s0:.2f} | stage1 {s1-s0:.2f} | stage2 {s2-s1:.2f} | "
          f"epilogue {s3-s2:.2f} | untwist {s3p-s3:.2f} | "
          f"merged-stage2 delta {s4-s2:.2f}")


if __name__ == "__main__":
    main()
