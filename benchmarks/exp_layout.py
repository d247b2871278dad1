"""Isolate the peaks-kernel lane->sublane regroup cost (round-2 lever).

CLAUDE.md suspects the unexplained ~3.4 ms in the peaks/compact stages
is the in-kernel (128, 2176) -> (2176, 128) reshape (mask rows regroup
from 17 lane-groups into sublanes) feeding the rank matmul. Variants,
all on the standard 16 x 30 s batch (identical DMA + separable max +
identical output write volume so only the middle differs):

  v0  spectrogram alone (attribution base)
  v1  mask only: counts written, no reshape, no rank/extract
  v2  v1 + the (2176, 128) reshape (a lane-sum of the reshaped mask)
  v3  the real kernel (reshape + tri matmul + 8-slot extract)
  v4  lane-layout rank/extract: segmented prefix along lanes by log-roll
      (no reshape) + per-group extract via (2176 x 17) group matmuls,
      emitting a compact (128, 256) table (8x smaller write)

v2 - v1 = the regroup cost. v4 vs v3 = the restructure's win before
committing to a new table format downstream.
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
from shazam_tpu.ops.pallas.peaks import (
    _running, peak_candidates_fused, F_HALO, F_OUT, F_PAD, F_TOT, N_GROUPS,
    GROUP_CAP, OUT_LANES,
)
from shazam_tpu.ops.pallas.compact import compact_candidates

fs, secs, batch = 44100, 30.0, 16
n = int(secs * fs)
blen = -(-n // (1 << 18)) * (1 << 18)
mat = np.zeros((batch, blen), np.float32)
for i in range(batch):
    mat[i, :n] = synth_song(i, duration_s=secs, fs=fs, seed=5)
mat_d = jnp.asarray(mat)
nvf = jnp.asarray(np.full(batch, (n - 4096) // 2048 + 1, np.int32))

TILE = 128
PAD_ROWS = 16
RADIUS = 10
AMP_MIN = 10.0


def _mask_preamble(spec_hbm, buf, sems, tile_frames):
    """DMA + separable max/erosion; returns the (tile, 2176) peak mask.
    (Copy of the production kernel's preamble — experiment only.)"""
    b = pl.program_id(0)
    t_tile = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    rows = tile_frames + 2 * PAD_ROWS

    step = b * n_tiles + t_tile
    slot = jax.lax.rem(step, 2)
    nxt_slot = jax.lax.rem(step + 1, 2)

    def _dma_cases(bb, tt, s):
        first = tt == 0
        last = tt == n_tiles - 1
        off = (tt * (tile_frames // 8) - PAD_ROWS // 8) * 8
        full = pltpu.make_async_copy(
            spec_hbm.at[bb, pl.ds(off, rows)], buf.at[s], sems.at[s])
        head = pltpu.make_async_copy(
            spec_hbm.at[bb, pl.ds(0, rows - PAD_ROWS)],
            buf.at[s, pl.ds(PAD_ROWS, rows - PAD_ROWS)], sems.at[s])
        tail = pltpu.make_async_copy(
            spec_hbm.at[bb, pl.ds(off, rows - PAD_ROWS)],
            buf.at[s, pl.ds(0, rows - PAD_ROWS)], sems.at[s])
        single = pltpu.make_async_copy(
            spec_hbm.at[bb, pl.ds(0, tile_frames)],
            buf.at[s, pl.ds(PAD_ROWS, tile_frames)], sems.at[s])
        return ((~first & ~last, full), (first & ~last, head),
                (last & ~first, tail), (first & last, single))

    def dma_start(bb, tt, s):
        for cond, copy in _dma_cases(bb, tt, s):
            pl.when(cond)(copy.start)

    def dma_wait(bb, tt, s):
        for cond, copy in _dma_cases(bb, tt, s):
            pl.when(cond)(copy.wait)

    @pl.when(step == 0)
    def _():
        dma_start(b, t_tile, slot)

    nxt = step + 1
    nxt_b = nxt // n_tiles
    nxt_t = jax.lax.rem(nxt, n_tiles)

    @pl.when(nxt < pl.num_programs(0) * n_tiles)
    def _():
        dma_start(nxt_b, nxt_t, nxt_slot)

    dma_wait(b, t_tile, slot)

    spec = buf[slot]
    g = jax.lax.broadcasted_iota(jnp.int32, spec.shape, 0) \
        + (t_tile * tile_frames - PAD_ROWS)
    spec = jnp.where((g >= 0) & (g < n_tiles * tile_frames), spec, 0.0)
    width = 2 * RADIUS + 1
    lane0 = F_HALO - RADIUS
    row0 = PAD_ROWS - RADIUS

    fmax = _running(spec, width, jnp.maximum, axis=1)
    tfmax = _running(fmax, width, jnp.maximum, axis=0)
    center = spec[PAD_ROWS:PAD_ROWS + tile_frames, F_HALO:F_HALO + F_PAD]
    local_max = tfmax[row0:row0 + tile_frames, lane0:lane0 + F_PAD] == center

    bg = spec == 0.0
    fbg = _running(bg, width, jnp.logical_and, axis=1)
    tbg = _running(fbg, width, jnp.logical_and, axis=0)
    eroded = tbg[row0:row0 + tile_frames, lane0:lane0 + F_PAD]

    f_ids = jax.lax.broadcasted_iota(jnp.int32, center.shape, 1)
    return (local_max != eroded) & (center > AMP_MIN) & (f_ids < F_OUT)


def _v1_kernel(spec_hbm, out_ref, buf, sems):
    """mask only; write per-frame lane-sums broadcast to the full table
    shape (same write volume as the real kernel)."""
    mask = _mask_preamble(spec_hbm, buf, sems, TILE)
    counts = jnp.sum(mask.astype(jnp.float32), axis=1, keepdims=True)
    out_ref[0] = jnp.broadcast_to(
        counts.astype(jnp.int32), (TILE, F_PAD // 128 * 128)
    ).reshape(TILE * N_GROUPS, 128)


def _v2_kernel(spec_hbm, out_ref, buf, sems):
    """v1 + the lane->sublane regroup reshape (then a trivial use)."""
    mask = _mask_preamble(spec_hbm, buf, sems, TILE)
    m_f = mask.astype(jnp.float32).reshape(TILE * N_GROUPS, 128)
    out_ref[0] = (m_f + 1.0).astype(jnp.int32)


def _v4_kernel(spec_hbm, out_ref, buf, sems):
    """Lane-layout rank + extract: NO regroup; compact (TILE, 256) out.

    Segmented inclusive prefix along the 2176 lanes (17 groups of 128)
    by log-step rolls with group-boundary masks; extraction of the first
    GROUP_CAP slots per group via one (2176 -> 17*(CAP+1)) projection
    matmul per slot batched as a single (2176, 256) matrix.
    """
    mask = _mask_preamble(spec_hbm, buf, sems, TILE)
    m_f = mask.astype(jnp.float32)                  # (TILE, 2176)
    lane = jax.lax.broadcasted_iota(jnp.int32, m_f.shape, 1)
    pos_in_g = jax.lax.rem(lane, 128)

    # segmented prefix: after step s, prefix covers 2^s lanes back,
    # masked so nothing crosses a 128-lane group boundary
    prefix = m_f
    shift = 1
    while shift < 128:
        rolled = pltpu.roll(prefix, shift, 1)
        prefix = prefix + jnp.where(
            (pos_in_g >= shift), rolled, 0.0
        )
        shift *= 2
    rank = prefix.astype(jnp.int32) - mask.astype(jnp.int32)  # 0-based

    # per-group extraction: contract each slot's hit row over the lanes
    # with a (2176, 17) group one-hot — the MXU does the segmented sums
    g_of_lane = lane[:1, :] // 128                    # (1, 2176)
    proj = (
        g_of_lane.T == jax.lax.broadcasted_iota(
            jnp.int32, (F_PAD, N_GROUPS), 1)
    ).astype(jnp.float32)                             # (2176, 17)
    dn = (((1,), (0,)), ((), ()))
    outs = []
    for c in range(GROUP_CAP):
        hit = mask & (rank == c)
        fval = jnp.where(hit, pos_in_g, 0).astype(jnp.float32)
        got = hit.astype(jnp.float32)
        outs.append(jax.lax.dot_general(
            fval, proj, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))    # (TILE, 17)
        outs.append(jax.lax.dot_general(
            got, proj, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))
    counts = jax.lax.dot_general(
        m_f, proj, dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)         # (TILE, 17)
    lanes = N_GROUPS * (2 * GROUP_CAP + 1)            # 289
    pad = jnp.zeros((TILE, 384 - lanes), jnp.float32)
    out_ref[0] = jnp.concatenate(outs + [counts, pad], axis=1) \
        .astype(jnp.int32)


def _call(kernel, out_rows, out_lanes, spec):
    bsz, t_pad, _ = spec.shape
    t_tiles = t_pad // TILE
    return pl.pallas_call(
        kernel,
        grid=(bsz, t_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, out_rows, out_lanes), lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, t_pad // TILE * out_rows, out_lanes), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, TILE + 32, F_TOT), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )(spec)


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
    def v0(x):
        return consume(spectrogram_db_fused(x, nvf))

    def v1(x):
        spec = spectrogram_db_fused(x, nvf)
        return consume(_call(_v1_kernel, TILE * N_GROUPS, 128, spec))

    def v2(x):
        spec = spectrogram_db_fused(x, nvf)
        return consume(_call(_v2_kernel, TILE * N_GROUPS, 128, spec))

    def v3(x):
        spec = spectrogram_db_fused(x, nvf)
        return consume(peak_candidates_fused(spec))

    def v3c(x):
        spec = spectrogram_db_fused(x, nvf)
        return consume(compact_candidates(peak_candidates_fused(spec), 4096))

    def v4(x):
        spec = spectrogram_db_fused(x, nvf)
        return consume(_call(_v4_kernel, TILE, 384, spec))

    a = timed(v0, "v0 spectrogram")
    b1 = timed(v1, "v1 +mask only        ")
    b2 = timed(v2, "v2 +mask+regroup     ")
    b3 = timed(v3, "v3 +real peaks kernel")
    b4 = timed(v4, "v4 +lane-layout table")
    c = timed(v3c, "v3c real peaks+compact")
    print(f"\nmask {b1-a:.2f} | regroup {b2-b1:.2f} | rank/extract "
          f"{b3-b2:.2f} | lane-layout full {b4-b1:.2f} vs current "
          f"{b3-b1:.2f} | compact stage {c-b3:.2f}")


if __name__ == "__main__":
    main()
