"""Fused Pallas spectrogram kernel: samples -> dB PSD in one HBM pass.

The XLA pipeline (ops/spectrogram.py) materializes framed windows and six
FFT-stage intermediates in HBM (~2 GB of traffic for a 16x30 s batch ->
~12 ms). This kernel streams sample tiles into VMEM and performs

    framing (50% overlap) -> Hann window -> 32x128 Cooley-Tukey matmul
    rFFT -> |.|^2 -> mlab PSD scaling -> 10*log10 (zeros preserved)
    -> valid-frame masking

entirely on-chip: HBM traffic is one read of the samples plus one write
of the spectrogram. The FFT matmuls run on the MXU per tile.

Mosaic layout constraints drive the factorization: reshapes must keep the
minor dimension 128-aligned, so frames (T, 4096) split as n = 128a + b
(a in [0,32), b in [0,128)) and both DFT stages contract into shapes with
a 128 minor dim:

    X[32m + r] = sum_b W128^(bm) W4096^(br) G[r, b]
    G[r, b]    = sum_a x[128a + b] W32^(ar)

The kernel therefore emits power in a twisted (r, t, m) layout with
k = 32m + r; the host-side wrapper untwists it with one XLA transpose
(~1 HBM pass) into the (T, F) layout the peak picker consumes.

Semantics identical to ops/spectrogram.spectrogram_db (mlab.specgram PSD,
reference ``__init__.py:232-241``): freq bins >= 2049 land at exactly 0
(eroded background downstream, same as scipy's border_value=1) and frames
>= n_valid_frames are zeroed (the pad-to-bucket mask).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spectrogram import hann_window
# the (F_OUT, F_PAD, F_HALO, F_TOT) freq layout is a CONTRACT with the
# peak kernel (it masks f >= F_OUT and reads data at [F_HALO, F_HALO +
# F_PAD)); one module owns the numbers so they cannot drift apart
from .peaks import F_HALO, F_OUT, F_PAD, F_TOT

# FFT matmul precision. HIGHEST (full f32) is required: DEFAULT (bf16)
# drops peak-set jaccard vs the XLA pipeline to 0.71 — bf16 PSD noise
# reorders near-tied constellation maxima. (Mosaic supports only
# DEFAULT/HIGHEST in kernels.)
PRECISION = jax.lax.Precision.HIGHEST

NA = 32    # outer Cooley-Tukey factor
NB = 128   # inner factor (native lane width)
M_SHIFT = F_HALO // NA  # 4: halo in twisted m-units (k = 32 m + r)
M_OUT = (F_HALO + F_PAD) // NA  # 72: m' rows carrying halo + data


@functools.lru_cache(maxsize=4)
def _tables(wsize: int, fs: int):
    """Host-side DFT/twiddle/scale tables for the 32x128 factorization.

    The stage-2 DFT matrix is built in SHIFTED m' coordinates,
    m' = m + M_SHIFT with zero rows outside [M_SHIFT, M_OUT): the
    downstream peak kernel's frequency zero-halo comes straight out of
    the matmul — no XLA pad pass over the (B, T, F) spectrogram.
    """
    assert wsize == NA * NB
    a = np.arange(NA)
    b = np.arange(NB)
    r = np.arange(NA)
    m_sh = np.arange(NB) - M_SHIFT                      # m for row m'
    live = (m_sh >= 0) & (m_sh < (F_PAD // NA))
    ang32 = -2.0 * np.pi * np.outer(r, a) / NA          # [r, a]
    ang128 = -2.0 * np.pi * np.outer(m_sh, b) / NB      # [m', b]
    angt = -2.0 * np.pi * np.outer(r, b) / wsize        # [r, b]

    # PSD scale in twisted [r, m'] layout for k = 32 (m' - M_SHIFT) + r;
    # zero for halo rows and k >= F_OUT (one-sided fold by k range)
    win = np.hanning(wsize)
    base = 1.0 / (fs * np.sum(win * win))
    k = 32 * m_sh[None, :] + r[:, None]                 # [r, m']
    scale = np.where((k >= 0) & (k < F_OUT), 2.0 * base, 0.0)
    scale = np.where((k == 0) | (k == wsize // 2), base, scale)

    c128 = np.where(live[:, None], np.cos(ang128), 0.0)  # [m', b]
    s128 = np.where(live[:, None], np.sin(ang128), 0.0)

    # fold the W4096^(br) twiddle into r-BATCHED stage-2 matrices:
    # E[r, b, m'] = tw[r, b] * D128[m', b] (complex) — one batched
    # matmul replaces twiddle mul + separate DFT contraction, dropping
    # a 6-op VPU pass and two (r, t, b) temporaries per tile
    twr = np.cos(angt)[:, :, None]                      # [r, b, 1]
    twi = np.sin(angt)[:, :, None]
    er = twr * c128.T[None] - twi * s128.T[None]        # [r, b, m']
    ei = twr * s128.T[None] + twi * c128.T[None]

    f32 = lambda x: np.asarray(x, np.float32)
    return (
        f32(np.cos(ang32)), f32(np.sin(ang32)),
        f32(er), f32(ei),
        f32(scale),
    )


def _kernel(nvf_ref, x_hbm, win_ref, c32_ref, s32_ref, er_ref, ei_ref,
            scale_ref, out_ref, x_vmem, sems,
            *, tile_frames: int, wsize: int, hop: int, emit_db: bool):
    b = pl.program_id(0)
    t_tile = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    # samples come pre-reshaped to (B, N // 128, 128) so the DMA moves 2D
    # tiles (1D DMAs hit a Mosaic tiling mismatch)
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

    # double buffering: prefetch the next tile while this one computes
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
    _compute_tile(
        nvf_ref, win_ref, c32_ref, s32_ref, er_ref, ei_ref,
        scale_ref, out_ref, x_vmem[slot],
        b=b, t_tile=t_tile,
        tile_frames=tile_frames, wsize=wsize, hop=hop, emit_db=emit_db,
    )


def _compute_tile(nvf_ref, win_ref, c32_ref, s32_ref, er_ref, ei_ref,
                  scale_ref, out_ref, x_tile,
                  *, b, t_tile, tile_frames: int, wsize: int, hop: int,
                  emit_db: bool):
    # framing via shifted slices over hop-sized rows (wsize = k * hop)
    k = wsize // hop
    rows = x_tile.reshape(tile_frames + k - 1, hop)
    frames = jnp.concatenate(
        [rows[j : j + tile_frames] for j in range(k)], axis=1
    )
    frames = frames * win_ref[:][None, :]

    # n = 128 a + b
    x2 = frames.reshape(tile_frames, NA, NB)  # [t, a, b]

    # stage 1: G[r, t, b] = sum_a C32[r, a] x2[t, a, b]
    dn1 = (((1,), (1,)), ((), ()))
    gr = jax.lax.dot_general(c32_ref[:], x2, dn1,
                             preferred_element_type=jnp.float32, precision=PRECISION)
    gi = jax.lax.dot_general(s32_ref[:], x2, dn1,
                             preferred_element_type=jnp.float32, precision=PRECISION)
    # [r, t, b]

    # stage 2 with the twiddle folded in: X[r, t, m] = sum_b G[r, t, b]
    # E[r, b, m], batched over r (E = W4096^(br) * D128, see _tables)
    dnb = (((2,), (1,)), ((0,), (0,)))
    xr = (
        jax.lax.dot_general(gr, er_ref[:], dnb,
                            preferred_element_type=jnp.float32, precision=PRECISION)
        - jax.lax.dot_general(gi, ei_ref[:], dnb,
                              preferred_element_type=jnp.float32, precision=PRECISION)
    )
    xi = (
        jax.lax.dot_general(gr, ei_ref[:], dnb,
                            preferred_element_type=jnp.float32, precision=PRECISION)
        + jax.lax.dot_general(gi, er_ref[:], dnb,
                              preferred_element_type=jnp.float32, precision=PRECISION)
    )

    power = (xr * xr + xi * xi) * scale_ref[:][:, None, :]  # [r, t, m]
    if emit_db:
        out = jnp.where(
            power > 0,
            10.0 * (jnp.log(power) / np.float32(np.log(10.0))), 0.0,
        )
    else:
        # power domain: the log is monotone, so the peak kernel can gate
        # and compare raw power (peaks.py power_domain=True) — skipping
        # ~42M transcendentals per 16x30s batch
        out = power

    # valid-frame mask (pad-to-bucket): t dim is axis 1
    nvf = nvf_ref[b]
    t_ids = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1) + t_tile * tile_frames
    out = jnp.where(t_ids < nvf, out, 0.0)

    out_ref[0] = out


@functools.partial(
    jax.jit, static_argnames=("fs", "wsize", "hop", "tile_frames")
)
def spectrogram_power_fused(
    samples: jnp.ndarray,
    n_valid_frames: jnp.ndarray,
    *,
    fs: int = 44100,
    wsize: int = 4096,
    hop: int = 2048,
    tile_frames: int = 128,
) -> jnp.ndarray:
    """``spectrogram_db_fused`` without the 10*log10: raw scaled PSD.

    The fused pipeline's hot path — the peak kernel gates and compares
    in the power domain (``peaks.peak_candidates_fused(power_domain=
    True)``), which is bit-equivalent for the final peak mask (the dB
    map is strictly monotone for power > 0, gated cells have power > 1,
    and the exact dB threshold is translated to a power threshold on
    the f32 lattice).
    """
    return _spectrogram_fused(samples, n_valid_frames, fs=fs, wsize=wsize,
                              hop=hop, tile_frames=tile_frames,
                              emit_db=False)


@functools.partial(
    jax.jit, static_argnames=("fs", "wsize", "hop", "tile_frames")
)
def spectrogram_db_fused(
    samples: jnp.ndarray,
    n_valid_frames: jnp.ndarray,
    *,
    fs: int = 44100,
    wsize: int = 4096,
    hop: int = 2048,
    tile_frames: int = 128,
) -> jnp.ndarray:
    """Batched fused spectrogram, emitted freq-PRE-PADDED for the peak kernel.

    :param samples: (B, N) float32, N a multiple of hop.
    :param n_valid_frames: (B,) int32 — frames >= this are zeroed.
    :return: (B, T_pad, F_TOT) dB spectrogram with T_pad =
        ceil(T / tile) * tile, T = (N - wsize) // hop + 1. Data bins live
        at cols [F_HALO, F_HALO + F_PAD); the freq halos (and bins >=
        F_OUT) are exactly zero — baked into the stage-2 DFT matrix as
        zero rows, so the peak kernel's frequency boundary context costs
        no XLA pad pass. (Time boundaries are handled by the peak
        kernel's own clamped DMAs.)
    """
    return _spectrogram_fused(samples, n_valid_frames, fs=fs, wsize=wsize,
                              hop=hop, tile_frames=tile_frames,
                              emit_db=True)


def _spectrogram_fused(samples, n_valid_frames, *, fs, wsize, hop,
                       tile_frames, emit_db):
    if wsize != NA * NB or wsize % hop != 0:
        raise ValueError("fused kernel supports wsize=4096 with hop | wsize")
    bsz, n = samples.shape
    n_frames = (n - wsize) // hop + 1
    t_tiles = -(-n_frames // tile_frames)
    t_pad = t_tiles * tile_frames

    # tail tiles read past the signal: pad so every tile's span is in
    # bounds (those frames land at t >= n_valid_frames and are zeroed)
    need = t_pad * hop + (wsize - hop)
    if need > n:
        samples = jnp.pad(samples, ((0, 0), (0, need - n)))

    c32, s32, er, ei, scale = (
        jnp.asarray(t) for t in _tables(wsize, fs)
    )
    win = hann_window(wsize)

    span = tile_frames * hop + (wsize - hop)
    kernel = functools.partial(
        _kernel, tile_frames=tile_frames, wsize=wsize, hop=hop,
        emit_db=emit_db,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, t_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # samples stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # window
            pl.BlockSpec(memory_space=pltpu.VMEM),   # c32
            pl.BlockSpec(memory_space=pltpu.VMEM),   # s32
            pl.BlockSpec(memory_space=pltpu.VMEM),   # er (twiddle-folded)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ei
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scale
        ],
        out_specs=pl.BlockSpec(
            (1, NA, tile_frames, NB),
            lambda b, t, *_: (b, 0, t, 0),
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
        out_shape=jax.ShapeDtypeStruct((bsz, NA, t_pad, NB), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(n_valid_frames.astype(jnp.int32), samples_2d,
      win, c32, s32, er, ei, scale)

    # untwist [b, r, t, m'] -> [b, t, k' = 32 m' + r]: keep all 128 m'
    # through the transpose (a 76-lane minor slice de-aligns the
    # transpose tiling and measures slower) and slice the 2432 live
    # k' columns afterwards — XLA fuses the slice into the transpose
    spec = jnp.transpose(twisted, (0, 2, 3, 1)).reshape(bsz, t_pad, wsize)
    return spec[:, :, :F_TOT]
