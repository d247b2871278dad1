"""Spec stage-2 emitting [r, m', t] with only the live m' rows.

The production kernel's stage-2 batched dot emits [r, t, m'] with m' the
128-lane minor dim, of which only 72 rows carry data (the rest are
zero-rows baked into the DFT matrix for the freq halo + one-sided fold).
Swapping the free-dim order — dot(er[r, m', b], gr[r, t, b]) -> [r, m', t]
with t minor — lets m' live on the sublane axis where 80 rows (mult of 8)
are legal, trimming 37.5% of stage-2 MXU work, the epilogue VPU work and
the output write volume (201 -> 126 MB/batch). The untwist transpose
reshapes [b, t, m', r] -> (b, t, 2560) and slices the 2432 live cols.

Variants:
  base  — production spectrogram_power_fused
  mt80  — [r, m', t] stage-2, M_LIVE=80 rows
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from shazam_tpu.ops.pallas import spectrogram as S
from shazam_tpu.ops.spectrogram import hann_window

NA, NB = S.NA, S.NB
M_SHIFT, F_TOT = S.M_SHIFT, S.F_TOT
M_LIVE = 80   # >= (F_HALO + F_PAD)/32 + M_SHIFT = 72 + pad to mult 8... 80
PRECISION = S.PRECISION


@functools.lru_cache(maxsize=2)
def _tables_mt(wsize: int, fs: int):
    a = np.arange(NA)
    b = np.arange(NB)
    r = np.arange(NA)
    m_sh = np.arange(M_LIVE) - M_SHIFT
    live = (m_sh >= 0) & (m_sh < (S.F_PAD // NA))
    ang32 = -2.0 * np.pi * np.outer(r, a) / NA
    ang128 = -2.0 * np.pi * np.outer(m_sh, b) / NB
    angt = -2.0 * np.pi * np.outer(r, b) / wsize

    win = np.hanning(wsize)
    base = 1.0 / (fs * np.sum(win * win))
    k = 32 * m_sh[None, :] + r[:, None]                 # [r, m']
    scale = np.where((k >= 0) & (k < S.F_OUT), 2.0 * base, 0.0)
    scale = np.where((k == 0) | (k == wsize // 2), base, scale)

    c128 = np.where(live[:, None], np.cos(ang128), 0.0)  # [m', b]
    s128 = np.where(live[:, None], np.sin(ang128), 0.0)

    twr = np.cos(angt)[:, None, :]                      # [r, 1, b]
    twi = np.sin(angt)[:, None, :]
    er = twr * c128[None] - twi * s128[None]            # [r, m', b]
    ei = twr * s128[None] + twi * c128[None]

    f32 = lambda x: np.asarray(x, np.float32)
    return (f32(np.cos(ang32)), f32(np.sin(ang32)),
            f32(er), f32(ei), f32(scale))


def _kernel_mt(nvf_ref, x_hbm, win_ref, c32_ref, s32_ref, er_ref, ei_ref,
               scale_ref, out_ref, x_vmem, sems,
               *, tile_frames: int, wsize: int, hop: int):
    b = pl.program_id(0)
    t_tile = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    span_rows = (tile_frames * hop + (wsize - hop)) // NB

    step = b * n_tiles + t_tile
    slot = jax.lax.rem(step, 2)
    nxt_slot = jax.lax.rem(step + 1, 2)

    def dma(bb, tt, s):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(tt * (tile_frames * hop // NB), span_rows)],
            x_vmem.at[s],
            sems.at[s],
        )

    @pl.when(step == 0)
    def _():
        dma(b, t_tile, slot).start()

    nxt = step + 1
    nxt_b = nxt // n_tiles
    nxt_t = jax.lax.rem(nxt, n_tiles)

    @pl.when(nxt < pl.num_programs(0) * n_tiles)
    def _():
        dma(nxt_b, nxt_t, nxt_slot).start()

    dma(b, t_tile, slot).wait()
    x_tile = x_vmem[slot]

    k = wsize // hop
    rows = x_tile.reshape(tile_frames + k - 1, hop)
    frames = jnp.concatenate(
        [rows[j: j + tile_frames] for j in range(k)], axis=1)
    frames = frames * win_ref[:][None, :]
    x2 = frames.reshape(tile_frames, NA, NB)

    dn1 = (((1,), (1,)), ((), ()))
    gr = jax.lax.dot_general(c32_ref[:], x2, dn1,
                             preferred_element_type=jnp.float32,
                             precision=PRECISION)
    gi = jax.lax.dot_general(s32_ref[:], x2, dn1,
                             preferred_element_type=jnp.float32,
                             precision=PRECISION)
    # [r, t, b]

    # stage 2: X[r, m', t] = sum_b E[r, m', b] G[r, t, b]
    dnb = (((2,), (2,)), ((0,), (0,)))
    xr = (
        jax.lax.dot_general(er_ref[:], gr, dnb,
                            preferred_element_type=jnp.float32,
                            precision=PRECISION)
        - jax.lax.dot_general(ei_ref[:], gi, dnb,
                              preferred_element_type=jnp.float32,
                              precision=PRECISION)
    )
    xi = (
        jax.lax.dot_general(ei_ref[:], gr, dnb,
                            preferred_element_type=jnp.float32,
                            precision=PRECISION)
        + jax.lax.dot_general(er_ref[:], gi, dnb,
                              preferred_element_type=jnp.float32,
                              precision=PRECISION)
    )

    power = (xr * xr + xi * xi) * scale_ref[:][:, :, None]  # [r, m', t]
    nvf = nvf_ref[b]
    t_ids = jax.lax.broadcasted_iota(jnp.int32, power.shape, 2) \
        + t_tile * tile_frames
    out = jnp.where(t_ids < nvf, power, 0.0)
    out_ref[0] = out


@functools.partial(jax.jit, static_argnames=("fs", "wsize", "hop",
                                             "tile_frames"))
def spectrogram_power_mt(samples, n_valid_frames, *, fs=44100, wsize=4096,
                         hop=2048, tile_frames=128):
    bsz, n = samples.shape
    n_frames = (n - wsize) // hop + 1
    t_tiles = -(-n_frames // tile_frames)
    t_pad = t_tiles * tile_frames
    need = t_pad * hop + (wsize - hop)
    if need > n:
        samples = jnp.pad(samples, ((0, 0), (0, need - n)))

    c32, s32, er, ei, scale = (jnp.asarray(t) for t in _tables_mt(wsize, fs))
    win = hann_window(wsize)
    span = tile_frames * hop + (wsize - hop)
    kernel = functools.partial(_kernel_mt, tile_frames=tile_frames,
                               wsize=wsize, hop=hop)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, t_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, NA, M_LIVE, tile_frames),
            lambda b, t, *_: (b, 0, 0, t),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, span // NB, NB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    samples_2d = samples.astype(jnp.float32).reshape(bsz, -1, NB)
    twisted = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, NA, M_LIVE, t_pad), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(n_valid_frames.astype(jnp.int32), samples_2d,
      win, c32, s32, er, ei, scale)

    # untwist [b, r, m', t] -> [b, t, m', r] -> (b, t, 32*M_LIVE)
    spec = jnp.transpose(twisted, (0, 3, 2, 1)).reshape(bsz, t_pad,
                                                        NA * M_LIVE)
    return spec[:, :, :F_TOT]


def chain(fn, x, nv, k):
    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(x, nv, k):
        def body(i, acc):
            out = fn(x + acc * 1e-30, nv)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))
    return loop(x, nv, k)


def main():
    B, SECS, FS = 16, 30, 44100
    n = SECS * FS // 2048 * 2048
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32) * 1000)
    frames = (n - 4096) // 2048 + 1
    nv = jnp.full((B,), frames, jnp.int32)

    a = S.spectrogram_power_fused(x, nv)
    b = spectrogram_power_mt(x, nv)
    print("shapes:", a.shape, b.shape, flush=True)
    d = jnp.max(jnp.abs(a - b))
    print("max abs diff:", float(d), flush=True)
    # not bit-identical (1.2e-4 dB: the reordered stage-2 dot accumulates
    # in a different order); measure the win before deciding adoption
    assert float(d) < 1e-2, "numerically diverged"

    for name, fn in (("base", S.spectrogram_power_fused),
                     ("mt80", spectrogram_power_mt)):
        res = {}
        for k in (1, 17):
            float(chain(fn, x, nv, k))
            best = []
            for _ in range(3):
                t0 = time.time()
                float(chain(fn, x, nv, k))
                best.append(time.time() - t0)
            res[k] = min(best)
        ms = (res[17] - res[1]) / 16 * 1000
        print(f"{name}: {ms:.2f} ms / {B}x{SECS}s batch", flush=True)


if __name__ == "__main__":
    main()
