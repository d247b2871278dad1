"""Fused Pallas constellation kernel: dB spec -> per-group peak candidates.

The XLA peak path costs ~28 ms per 16-song batch on TPU: the separable
reduce_window mask is fine (~4.5 ms) but every order-preserving
compaction primitive XLA offers (top_k = full sorts, scatter, cumsum +
searchsorted gathers) collapses on the 2M-cell-per-song mask. This kernel
computes the mask AND compacts it in VMEM, emitting a dense per-
(frame, 128-bin freq group) candidate table that is three orders of
magnitude smaller — the final global compaction over it is cheap.

Per (song, 64-frame tile) grid step:

1. DMA a (96, 2432) spec tile — the fused spectrogram bakes the zero
   freq-halo into its stage-2 DFT matrix, and time boundaries need no
   padding at all: boundary tiles clamp their DMA to the valid rows and
   mask the out-of-range rows to zero in VMEM, so no XLA pad pass runs
   anywhere between the kernels. Zeros reproduce scipy's boundary
   semantics for this pipeline: they are exact background for the
   erosion (border_value=1, reference ``__init__.py:148``) and can only
   affect local-max status of cells below the strict amp_min > 0 gate.
2. 21-wide local max + zero-background erosion, both separable, via
   log-step running max/AND over static slices (5 ops per axis instead
   of 21) — reference ``get_2D_peaks`` semantics (``__init__.py:130-151``).
3. mask = (local_max != eroded) & (spec > amp_min) & (f < 2049).
4. Peak ranks within each (frame, 128-bin group) via one triangular-
   matrix matmul on the MXU; ranks c in [0, GROUP_CAP) extracted with
   masked row reductions.

GROUP_CAP=8 per 128 bins supports 136 peaks per frame — far beyond the
~6 of real audio.  NB the hard distinct-value bound is ceil(128/11) = 12
per group (two distinct-valued maxima need only be radius+1 = 11 bins
apart), so a dense harmonic comb with a ~120-170 Hz fundamental CAN pack
9+ peaks into one group; that and equal-valued plateaus are detected
downstream via the exact per-group counts, and the ingest paths retry
such rows (fused ``group_cap=12`` covers every distinct-valued input;
the exact XLA pipeline is the last resort) — overflow is never silent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F_OUT = 2049
F_PAD = 2176          # data cols in the padded spec: [128, 128 + F_PAD)
F_HALO = 128          # freq pad each side (>= radius, lane-aligned)
F_TOT = F_HALO + F_PAD + F_HALO  # 2432
N_GROUPS = F_PAD // 128          # 17
GROUP_CAP = 8         # candidates kept per (frame, group)
OUT_LANES = 128       # row: [0:CAP]=global freqs (-1 empty), [CAP]=count


def _running(x, width, op, axis):
    """One-sided running reduce: out[i] = op(x[i : i + width]) along axis."""
    def shift(a, s):
        return a[s:] if axis == 0 else a[:, s:]

    def head(a, s):
        return a[:-s] if axis == 0 else a[:, :-s]

    covered = 1
    while covered * 2 <= width:
        x = op(shift(x, covered), head(x, covered))
        covered *= 2
    rem = width - covered
    if rem:
        x = op(shift(x, rem), head(x, rem))
    return x


@functools.lru_cache(maxsize=8)
def power_threshold(amp_min: float) -> float:
    """Smallest f32 power whose kernel dB value exceeds ``amp_min``.

    Bisects the f32 bit lattice of the exact f32 expression the dB
    kernel computes (10 * ln(p) / ln(10)), so gating raw power with
    ``p >= power_threshold(amp_min)`` selects EXACTLY the cells the dB
    gate ``db(p) > amp_min`` selects.
    """
    import struct

    def db(u: int) -> float:
        p = struct.unpack("<f", struct.pack("<I", u))[0]
        return float(
            np.float32(10.0)
            * (np.log(np.float32(p)) / np.float32(np.log(10.0)))
        )

    lo = struct.unpack("<I", struct.pack("<f", np.float32(1e-30)))[0]
    hi = struct.unpack("<I", struct.pack("<f", np.float32(3.0e38)))[0]
    if not db(hi) > amp_min:
        raise ValueError("amp_min beyond the f32 dB range")
    while lo + 1 < hi:
        mid = (lo + hi) // 2
        if db(mid) > amp_min:
            hi = mid
        else:
            lo = mid
    return struct.unpack("<f", struct.pack("<I", hi))[0]


def _kernel(spec_hbm, out_ref, buf, sems, ero_ref, *, tile_frames: int, radius: int,
            pad_rows: int, amp_min: float, power_domain: bool,
            group_cap: int = GROUP_CAP, _skip_erosion: bool = False):
    b = pl.program_id(0)
    t_tile = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    rows = tile_frames + 2 * pad_rows  # 8-aligned DMA slice (pad_rows=16)

    step = b * n_tiles + t_tile
    slot = jax.lax.rem(step, 2)
    nxt_slot = jax.lax.rem(step + 1, 2)

    # The spec has NO time padding (its freq halo is baked in): boundary
    # tiles clamp their DMA to the valid rows (every offset stays 8-row
    # aligned since pad_rows and tile_frames are multiples of 16) and the
    # rows outside [0, t_pad) are masked to zero after the wait — exactly
    # the zeros a pre-padded read would have produced.
    def _dma_cases(bb, tt, s):
        first = tt == 0
        last = tt == n_tiles - 1
        # written as 8*(...) so Mosaic can prove the 8-row tiling holds
        # (it can't see through `tt * 64 - 16`)
        off = (tt * (tile_frames // 8) - pad_rows // 8) * 8
        full = pltpu.make_async_copy(
            spec_hbm.at[bb, pl.ds(off, rows)],
            buf.at[s], sems.at[s],
        )
        head = pltpu.make_async_copy(
            spec_hbm.at[bb, pl.ds(0, rows - pad_rows)],
            buf.at[s, pl.ds(pad_rows, rows - pad_rows)], sems.at[s],
        )
        tail = pltpu.make_async_copy(
            spec_hbm.at[bb, pl.ds(off, rows - pad_rows)],
            buf.at[s, pl.ds(0, rows - pad_rows)], sems.at[s],
        )
        single = pltpu.make_async_copy(
            spec_hbm.at[bb, pl.ds(0, tile_frames)],
            buf.at[s, pl.ds(pad_rows, tile_frames)], sems.at[s],
        )
        return (
            (~first & ~last, full), (first & ~last, head),
            (last & ~first, tail), (first & last, single),
        )

    def dma_start(bb, tt, s):
        for cond, copy in _dma_cases(bb, tt, s):
            pl.when(cond)(copy.start)

    def dma_wait(bb, tt, s):
        for cond, copy in _dma_cases(bb, tt, s):
            pl.when(cond)(copy.wait)

    # double buffering: prefetch the next tile while this one computes
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

    spec = buf[slot]  # (rows, F_TOT); data cols start at F_HALO
    # zero rows outside the valid frame range (boundary tiles only read
    # a partial window; the rest of the slot buffer is stale)
    g = jax.lax.broadcasted_iota(jnp.int32, spec.shape, 0) \
        + (t_tile * tile_frames - pad_rows)
    spec = jnp.where(
        (g >= 0) & (g < n_tiles * tile_frames), spec, 0.0
    )
    width = 2 * radius + 1
    lane0 = F_HALO - radius  # running-window col for data col 0
    row0 = pad_rows - radius  # running-window row for tile row 0

    # ---- separable 21x21 local max (freq then time) ----
    fmax = _running(spec, width, jnp.maximum, axis=1)
    tfmax = _running(fmax, width, jnp.maximum, axis=0)
    center = spec[pad_rows : pad_rows + tile_frames, F_HALO : F_HALO + F_PAD]
    local_max = tfmax[row0 : row0 + tile_frames, lane0 : lane0 + F_PAD] == center

    # ---- eroded zero background (border_value=1 == padded zeros) ----
    # power domain: dB-zero cells are power == 0 (masked) OR power == 1
    # (10*log10(1) == 0 exactly)
    if _skip_erosion:
        # TIMING EXPERIMENTS ONLY (benchmarks/exp_peaks2.py): erosion
        # cost isolation. Semantically wrong on zero plateaus.
        eroded = jnp.zeros((tile_frames, F_PAD), jnp.bool_)
    else:
        # conditional erosion, exact semantics (0.6 ms/batch when it
        # runs — benchmarks/exp_peaks2.py): every 21x21 window centered
        # in the data region contains >= radius+1 data-column cells, so
        # if NO background cell exists among the data columns of the
        # windows' row span, no window can be fully background and the
        # erosion is identically False. Zeros only occur at time
        # boundaries / padded frames / silence, so interior tiles skip
        # both running-AND reductions.
        if power_domain:
            bg = (spec == 0.0) | (spec == 1.0)
        else:
            bg = spec == 0.0
        # only LIVE data columns count: cols >= F_OUT are structurally
        # zero (PSD scale 0) but the mask excludes them anyway, and a
        # window centered at j < F_OUT always contains >= radius+1 cells
        # from cols <= 2048
        span = bg[row0 : row0 + tile_frames + 2 * radius,
                  F_HALO : F_HALO + F_PAD]
        live_col = (
            jax.lax.broadcasted_iota(jnp.int32, span.shape, 1) < F_OUT
        )
        has_bg = jnp.any(span & live_col)
        ero_ref[...] = jnp.zeros_like(ero_ref)

        @pl.when(has_bg)
        def _erode():
            fbg = _running(bg, width, jnp.logical_and, axis=1)
            tbg = _running(fbg, width, jnp.logical_and, axis=0)
            ero_ref[...] = tbg[
                row0 : row0 + tile_frames, lane0 : lane0 + F_PAD
            ].astype(jnp.float32)

        eroded = ero_ref[...] > 0.0

    f_ids = jax.lax.broadcasted_iota(jnp.int32, center.shape, 1)
    # the amplitude gate: in power domain, >= the exact f32 threshold is
    # bit-equivalent to the dB-domain strict compare (power_threshold);
    # gated cells then have power > 1, so power-vs-dB local-max compares
    # agree even against dB-zero cells (monotone map for power > 0)
    if power_domain:
        gate = center >= np.float32(power_threshold(amp_min))
    else:
        gate = center > amp_min
    mask = (local_max != eroded) & gate & (f_ids < F_OUT)

    # ---- per-(frame, group) ranks via triangular matmul on the MXU ----
    # (Mosaic cannot reshape i1 vectors: cast first, re-derive the bool)
    m_f = mask.astype(jnp.float32).reshape(tile_frames * N_GROUPS, 128)
    m2 = m_f > 0
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ).astype(jnp.float32)
    prefix = jax.lax.dot_general(
        m_f, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # inclusive prefix count along lanes (values <= 128: exact)
    rank = prefix.astype(jnp.int32) - m2.astype(jnp.int32)

    # ---- extract the first GROUP_CAP peaks per group ----
    # (pass-count-trimmed: ranks within a row enumerate 0..count-1, so
    # "slot c occupied" == c < counts — no per-slot hit reduction; the
    # rank select is hoisted so the loop body is compare+select+sum)
    row_ids = jax.lax.broadcasted_iota(
        jnp.int32, (tile_frames * N_GROUPS, 128), 0
    )
    lane_ids = jax.lax.broadcasted_iota(
        jnp.int32, (tile_frames * N_GROUPS, 128), 1
    )
    f_glob = (row_ids % N_GROUPS) * 128 + lane_ids
    counts = jnp.sum(m2.astype(jnp.int32), axis=1, keepdims=True)
    rank_sel = jnp.where(m2, rank, -1)
    # slots no group uses are constant -1 columns: skip their full-tile
    # compare/select/reduce passes (typical per-tile max count is ~5.5
    # of GROUP_CAP=8 — same cells-streamed argument as the compact
    # scatter's predicated slot dots)
    max_count = jnp.max(counts)
    neg1 = jnp.full((tile_frames * N_GROUPS, 1), -1, jnp.int32)
    cols = []
    for c in range(group_cap):
        def _live(c=c):
            fval = jnp.sum(
                jnp.where(rank_sel == c, f_glob, 0), axis=1, keepdims=True
            )
            return jnp.where(counts > c, fval, -1)
        cols.append(jax.lax.cond(c < max_count, _live, lambda: neg1))
    table = jnp.concatenate(
        cols + [counts]
        + [jnp.zeros((tile_frames * N_GROUPS, OUT_LANES - group_cap - 1),
                     jnp.int32)],
        axis=1,
    )
    out_ref[0] = table


@functools.partial(
    jax.jit,
    static_argnames=("tile_frames", "radius", "amp_min", "power_domain",
                     "group_cap", "_skip_erosion"),
)
def peak_candidates_fused(
    spec: jnp.ndarray,
    *,
    amp_min: float = 10.0,
    radius: int = 10,
    tile_frames: int = 128,
    power_domain: bool = False,
    group_cap: int = GROUP_CAP,
    _skip_erosion: bool = False,
):
    """Per-(frame, group) peak candidates from the freq-pre-padded dB spec.

    `spec` is the fused-spectrogram output, shape (B, T_pad, F_TOT) with
    data bins at cols [F_HALO, F_HALO + F_PAD) and zero freq halos baked
    in by the spectrogram's DFT tables. Time boundaries need no padding
    at all: boundary tiles clamp their DMA and mask the out-of-range
    rows to zero in VMEM — NO XLA pad pass anywhere. Requires
    amp_min > 0 (the zero padding must stay sub-threshold).

    Returns int32 (B, T_pad * 17, 128): row r = t * 17 + g holds, in
    lanes [0:GROUP_CAP], the global freq indices of the first GROUP_CAP
    peaks of frame t in freq group g (ascending; -1 = empty) and in lane
    GROUP_CAP the true per-group peak count. Row order == (t, f) order.
    """
    if amp_min <= 0:
        raise ValueError("fused peak kernel requires amp_min > 0")
    if not 0 < radius <= 16:
        # pad_rows=16 bounds the time halo each tile DMAs; a larger
        # radius would wrap the tfmax slice start negative and silently
        # misalign the peak mask
        raise ValueError(f"fused peak kernel supports radius in [1, 16], "
                         f"got {radius}")
    bsz, t_pad, f_tot = spec.shape
    if f_tot != F_TOT or t_pad <= 0 or t_pad % tile_frames:
        raise ValueError("expected freq-pre-padded fused-spectrogram layout")

    pad_rows = 16  # multiple of 8: every clamped DMA offset stays aligned
    padded = spec
    t_tiles = t_pad // tile_frames
    rows_per_tile = tile_frames * N_GROUPS

    kernel = functools.partial(
        _kernel, tile_frames=tile_frames, radius=radius, pad_rows=pad_rows,
        amp_min=amp_min, power_domain=power_domain, group_cap=group_cap,
        _skip_erosion=_skip_erosion,
    )
    return pl.pallas_call(
        kernel,
        grid=(bsz, t_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, rows_per_tile, OUT_LANES),
            lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, t_pad * N_GROUPS, OUT_LANES), jnp.int32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_frames + 32, F_TOT), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((tile_frames, F_PAD), jnp.float32),  # cond. erosion
        ],
        compiler_params=pltpu.CompilerParams(
            # the double-buffered input tile pushes peak usage slightly
            # past the default 16M scoped-vmem budget
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(padded)


def extract_peaks_from_candidates(table: jnp.ndarray, capacity: int,
                                  group_cap: int = GROUP_CAP):
    """XLA finish: candidate table -> (times, freqs, n_peaks) per song.

    Same contract as ops.peaks.extract_peaks: uint32 (capacity,) arrays in
    (t, f) order plus the true peak count (clamped above capacity when any
    group overflowed ``group_cap`` so callers see the truncation).
    ``group_cap`` must match the value the table was built with
    (``peak_candidates_fused(group_cap=...)``).
    """
    def one(tab):
        r = tab.shape[0]
        cand = tab[:, :group_cap]                     # (R, CAP) global f
        counts = tab[:, group_cap]                    # (R,)
        kept = jnp.minimum(counts, group_cap)
        c_ids = jnp.arange(group_cap, dtype=jnp.int32)[None, :]
        valid = c_ids < kept[:, None]
        t_ids = (
            jnp.arange(r, dtype=jnp.int32) // N_GROUPS
        )[:, None]

        n = r * group_cap  # flat candidate count
        flat_pos = (
            jnp.arange(r, dtype=jnp.int32)[:, None] * group_cap + c_ids
        )
        score = jnp.where(valid, n - flat_pos, 0).reshape(-1)
        vals, idx = jax.lax.top_k(score, min(capacity, n))
        if capacity > n:
            vals = jnp.pad(vals, (0, capacity - n))
            idx = jnp.pad(idx, (0, capacity - n))
        sel_valid = vals > 0
        times = jnp.where(
            sel_valid, jnp.take(t_ids[:, 0], idx // group_cap), 0
        ).astype(jnp.uint32)
        freqs = jnp.where(
            sel_valid, jnp.take(cand.reshape(-1), idx), 0
        ).astype(jnp.uint32)

        n_peaks = jnp.sum(counts).astype(jnp.uint32)
        overflow = jnp.any(counts > group_cap)
        n_peaks = jnp.where(
            overflow, jnp.maximum(n_peaks, jnp.uint32(capacity + 1)), n_peaks
        )
        return times, freqs, n_peaks

    return jax.vmap(one)(table)
