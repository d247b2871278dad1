"""Pallas fused kernels vs the XLA pipeline (interpret mode on CPU).

On real TPU hardware the fused path was verified bit-identical for peaks
(jaccard 1.0) and 0.998-jaccard for hash sets (f32 FFT rounding). These
CI tests run the same kernels through the Pallas interpreter on small
inputs so regressions are caught without a chip.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def clip():
    from shazam_tpu.audio.synth import synth_song

    return synth_song(0, duration_s=4.0, seed=3).astype(np.float32)


def _interpret():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.force_tpu_interpret_mode()


def test_fused_spectrogram_matches_xla(clip):
    import jax.numpy as jnp
    from shazam_tpu.ops.pallas.spectrogram import spectrogram_db_fused
    from shazam_tpu.ops.spectrogram import spectrogram_db

    n = 1 << 18
    mat = np.zeros((1, n), np.float32)
    mat[0, : len(clip)] = clip
    nvf = np.array([(len(clip) - 4096) // 2048 + 1], np.int32)
    with _interpret():
        fused = np.asarray(
            spectrogram_db_fused(jnp.asarray(mat), jnp.asarray(nvf))
        )
    ref = np.asarray(spectrogram_db(jnp.asarray(clip))).T
    # freq-pre-padded layout: data at cols [128, 128+2049)
    data = fused[0, : nvf[0], 128 : 128 + 2049]
    # f32 matmul-FFT vs rfft: dB differences concentrate at near-zero
    # power bins (the parity gate is recognition accuracy, SURVEY.md §7)
    assert np.abs(data - ref[: nvf[0]]).max() < 0.3
    strong = ref[: nvf[0]] > -20
    assert np.abs(data[strong] - ref[: nvf[0]][strong]).max() < 0.02
    # freq halos and invalid frames are exactly zero
    assert np.abs(fused[0, nvf[0] :, :]).max() == 0.0     # padded frames
    assert np.abs(fused[0, :, :128]).max() == 0.0         # left freq halo
    assert np.abs(fused[0, :, 128 + 2049 :]).max() == 0.0  # right halo


def test_fused_peaks_match_xla(clip):
    import jax.numpy as jnp
    from shazam_tpu.ops.pallas.peaks import (
        peak_candidates_fused, extract_peaks_from_candidates,
    )
    from shazam_tpu.ops.peaks import extract_peaks
    from shazam_tpu.ops.spectrogram import spectrogram_db

    spec_ft = np.asarray(spectrogram_db(jnp.asarray(clip)))
    t = spec_ft.shape[1]
    t_pad = -(-t // 128) * 128
    # freq-pre-padded layout the fused spectrogram now emits
    spec_tf = np.zeros((1, t_pad, 2432), np.float32)
    spec_tf[0, :t, 128 : 128 + 2049] = spec_ft.T

    with _interpret():
        table = peak_candidates_fused(jnp.asarray(spec_tf))
    times, freqs, n_peaks = extract_peaks_from_candidates(table, 4096)

    rt, rf, rn = extract_peaks(jnp.asarray(spec_ft), 10.0, radius=10,
                               capacity=4096)
    n = int(rn)
    assert int(n_peaks[0]) == n
    got = list(zip(np.asarray(times)[0][:n].tolist(),
                   np.asarray(freqs)[0][:n].tolist()))
    ref = list(zip(np.asarray(rt)[:n].tolist(), np.asarray(rf)[:n].tolist()))
    assert got == ref


def test_fused_fingerprint_batch(clip):
    import jax.numpy as jnp
    from shazam_tpu.ops.fingerprint import (
        fingerprint_batch, fingerprint_batch_fused,
    )

    n = 1 << 18
    mat = np.zeros((2, n), np.float32)
    mat[0, : len(clip)] = clip
    mat[1, : len(clip) // 2] = clip[: len(clip) // 2]
    nv = np.array([len(clip), len(clip) // 2], np.int32)

    with _interpret():
        ff = fingerprint_batch_fused(jnp.asarray(mat), jnp.asarray(nv),
                                     peak_capacity=2048)
    fx = fingerprint_batch(jnp.asarray(mat), jnp.asarray(nv),
                           peak_capacity=2048)
    for b in range(2):
        vx = np.asarray(fx.valid[b])
        vf = np.asarray(ff.valid[b])
        sx = set(zip(np.asarray(fx.hi[b])[vx].tolist(),
                     np.asarray(fx.t1[b])[vx].tolist()))
        sf = set(zip(np.asarray(ff.hi[b])[vf].tolist(),
                     np.asarray(ff.t1[b])[vf].tolist()))
        # interpret-mode FFT numerics == XLA f32 up to matmul assoc; peak
        # identity can only flip for near-equal bins
        jac = len(sx & sf) / max(len(sx | sf), 1)
        assert jac > 0.99, jac


def test_compact_candidates_matches_topk_finish(clip):
    import jax.numpy as jnp
    from shazam_tpu.ops.pallas.peaks import (
        peak_candidates_fused, extract_peaks_from_candidates,
    )
    from shazam_tpu.ops.pallas.compact import compact_candidates
    from shazam_tpu.ops.spectrogram import spectrogram_db

    spec_ft = np.asarray(spectrogram_db(jnp.asarray(clip)))
    t = spec_ft.shape[1]
    t_pad = -(-t // 128) * 128
    # freq-pre-padded layout the fused spectrogram now emits
    spec_tf = np.zeros((1, t_pad, 2432), np.float32)
    spec_tf[0, :t, 128 : 128 + 2049] = spec_ft.T
    with _interpret():
        table = peak_candidates_fused(jnp.asarray(spec_tf))
        t2, f2, n2 = compact_candidates(table, 4096)
    t1, f1, n1 = extract_peaks_from_candidates(table, 4096)
    n = int(n1[0])
    assert int(n2[0]) == n
    assert np.array_equal(np.asarray(t1)[0][:n], np.asarray(t2)[0][:n])
    assert np.array_equal(np.asarray(f1)[0][:n], np.asarray(f2)[0][:n])


def test_compact_exact_past_frame_4096():
    """Regression: the compact scatter must stay exact for frames >= 4096.

    The scatter rides an f32 matmul (exact < 2^24); the GLOBAL packed
    value t * 4096 + f reaches ~18.9M on 210 s tracks, where f32
    rounding flipped odd freqs off-by-one (silent hash corruption in the
    last ~16 s of every full-length track).  The kernel now scatters the
    tile-local value and re-adds the frame base in int32 — this test
    plants odd-frequency candidates at frames up to 4607 and requires
    bit-exact decode.
    """
    import jax.numpy as jnp
    from shazam_tpu.ops.pallas.peaks import (N_GROUPS,
                                             extract_peaks_from_candidates)
    from shazam_tpu.ops.pallas.compact import compact_candidates

    frames = 4608                       # 210 s track's t_pad
    rows = frames * N_GROUPS
    table = np.full((1, rows, 128), 0, np.int32)
    table[:, :, :8] = -1
    rng = np.random.default_rng(3)
    planted = []
    for t in [0, 5, 4095, 4096, 4500, 4607]:
        g = int(rng.integers(0, N_GROUPS))
        lanes = sorted(int(x) for x in
                       rng.choice(128, size=3, replace=False))
        f_glob = [g * 128 + l for l in lanes]
        # force odd global freqs (the corrupted class)
        f_glob = [f | 1 for f in f_glob]
        row = t * N_GROUPS + g
        table[0, row, :3] = sorted(set(f_glob))[:3]
        table[0, row, 8] = len(sorted(set(f_glob))[:3])
        planted.append((t, sorted(set(f_glob))[:3]))

    with _interpret():
        t2, f2, n2 = compact_candidates(jnp.asarray(table), 256)
    t1, f1, n1 = extract_peaks_from_candidates(jnp.asarray(table), 256)
    n = int(n1[0])
    assert int(n2[0]) == n == sum(len(fs) for _t, fs in planted)
    assert np.array_equal(np.asarray(t1)[0][:n], np.asarray(t2)[0][:n])
    assert np.array_equal(np.asarray(f1)[0][:n], np.asarray(f2)[0][:n])
    got = list(zip(np.asarray(t2)[0][:n].tolist(),
                   np.asarray(f2)[0][:n].tolist()))
    want = [(t, f) for t, fs in planted for f in fs]
    assert got == want


def test_fused_peaks_single_tile(clip):
    """A one-tile spectrogram exercises the first&last clamped-DMA branch."""
    import jax.numpy as jnp
    from shazam_tpu.ops.pallas.peaks import (
        peak_candidates_fused, extract_peaks_from_candidates,
    )
    from shazam_tpu.ops.peaks import extract_peaks
    from shazam_tpu.ops.spectrogram import spectrogram_db

    from shazam_tpu.audio.synth import synth_song

    long_clip = synth_song(1, duration_s=7.0, seed=3).astype(np.float32)
    short = long_clip[: 2048 * 127 + 4096]  # exactly 128 frames = one tile
    spec_ft = np.asarray(spectrogram_db(jnp.asarray(short)))
    assert spec_ft.shape[1] == 128
    spec_tf = np.zeros((1, 128, 2432), np.float32)
    spec_tf[0, :, 128 : 128 + 2049] = spec_ft.T

    with _interpret():
        table = peak_candidates_fused(jnp.asarray(spec_tf))
    times, freqs, n_peaks = extract_peaks_from_candidates(table, 2048)
    rt, rf, rn = extract_peaks(jnp.asarray(spec_ft), 10.0, radius=10,
                               capacity=2048)
    n = int(rn)
    assert int(n_peaks[0]) == n
    assert np.array_equal(np.asarray(times)[0][:n], np.asarray(rt)[:n])
    assert np.array_equal(np.asarray(freqs)[0][:n], np.asarray(rf)[:n])


def test_power_domain_peaks_bitexact(clip):
    """The power-domain hot path (no 10*log10) must produce EXACTLY the
    dB-domain peak set: monotone map + exact f32 threshold translation
    (peaks.power_threshold) + the p==1 background case."""
    import jax.numpy as jnp
    from shazam_tpu.ops.pallas.spectrogram import (
        spectrogram_db_fused, spectrogram_power_fused,
    )
    from shazam_tpu.ops.pallas.peaks import (
        peak_candidates_fused, extract_peaks_from_candidates,
        power_threshold,
    )

    # threshold sanity: smallest f32 with dB > amp_min
    import struct

    t = power_threshold(10.0)
    f32 = np.float32
    db = lambda p: f32(10.0) * (np.log(f32(p)) / f32(np.log(10.0)))
    below = struct.unpack("<f", struct.pack(
        "<I", struct.unpack("<I", struct.pack("<f", f32(t)))[0] - 1))[0]
    assert db(t) > 10.0 and not db(below) > 10.0

    n = 1 << 18
    mat = np.zeros((1, n), np.float32)
    mat[0, : len(clip)] = clip
    nvf = np.array([(len(clip) - 4096) // 2048 + 1], np.int32)
    with _interpret():
        spec_db = spectrogram_db_fused(jnp.asarray(mat), jnp.asarray(nvf))
        spec_pw = spectrogram_power_fused(jnp.asarray(mat), jnp.asarray(nvf))
        tab_db = peak_candidates_fused(spec_db)
        tab_pw = peak_candidates_fused(spec_pw, power_domain=True)
    t1, f1, n1 = extract_peaks_from_candidates(tab_db, 4096)
    t2, f2, n2 = extract_peaks_from_candidates(tab_pw, 4096)
    assert int(n1[0]) == int(n2[0])
    k = int(n1[0])
    assert k > 50
    assert np.array_equal(np.asarray(t1)[0][:k], np.asarray(t2)[0][:k])
    assert np.array_equal(np.asarray(f1)[0][:k], np.asarray(f2)[0][:k])


def test_group_cap_12_resolves_dense_combs():
    """Two impulses ~300 samples apart inside one frame make a spectral
    interference comb (~13-bin ripple) that packs >8 distinct maxima
    into a 128-bin group: group_cap=8 must FLAG the song (n_peaks
    sentinel above capacity) and group_cap=12 — the hard distinct-value
    packing bound — must match the exact XLA path bit for bit."""
    import jax.numpy as jnp
    import numpy as np
    from shazam_tpu.ops.fingerprint import (
        fingerprint_batch, fingerprint_batch_fused,
    )

    rng = np.random.default_rng(5)
    n = 1 << 18
    t = np.arange(n, dtype=np.float64)
    sig = rng.normal(0, 3.0, n)
    # 10 tones 13 bins apart inside freq group 6 (>= 11-bin spacing =
    # distinct local maxima), gated by periodic bursts so the burst
    # frame is also a local max along TIME: 10 > GROUP_CAP=8 there
    env = np.exp(-0.5 * ((t % (30 * 2048) - 2048.0) / 1200.0) ** 2)
    for j in range(10):
        f_bin = 768 + 6 + 13 * j
        sig += env * (6000 + 700 * j) * np.sin(
            2 * np.pi * (f_bin * 44100 / 4096) * t / 44100)
    mat = jnp.asarray(sig.astype(np.float32)[None, :])
    nv = jnp.asarray([n], np.int32)

    fpx = fingerprint_batch(mat, nv, peak_capacity=8192)
    with _interpret():
        fp8 = fingerprint_batch_fused(mat, nv, peak_capacity=8192)
        fp12 = fingerprint_batch_fused(mat, nv, peak_capacity=8192,
                                       group_cap=12)
    assert int(fp8.n_peaks[0]) > 8192          # flagged, never silent
    assert int(fp12.n_peaks[0]) == int(fpx.n_peaks[0]) <= 8192
    for a, b in zip(fp12, fpx):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_compact_slot_skip_edges():
    """The predicated slot dots must be exact at both extremes: an
    all-empty tile (max kept = 0 -> every dot skipped) and a row using
    every GROUP_CAP slot (no dot skipped), plus the peaks-extract analog
    (covered via direct table equality with the XLA finish)."""
    import jax.numpy as jnp
    from shazam_tpu.ops.pallas.peaks import (GROUP_CAP, N_GROUPS,
                                             extract_peaks_from_candidates)
    from shazam_tpu.ops.pallas.compact import compact_candidates

    frames = 384                       # 3 tiles of 128 frames
    rows = frames * N_GROUPS
    table = np.zeros((1, rows, 128), np.int32)
    table[:, :, :GROUP_CAP] = -1
    # tile 0 (frames 0..127): left empty -> max_kept == 0
    # tile 1: one row with ALL slots used, another with 1
    r_full = 130 * N_GROUPS + 4
    table[0, r_full, :GROUP_CAP] = [4 * 128 + 2 * i for i in range(GROUP_CAP)]
    table[0, r_full, GROUP_CAP] = GROUP_CAP
    r_one = 200 * N_GROUPS + 16
    table[0, r_one, 0] = 16 * 128 + 77
    table[0, r_one, GROUP_CAP] = 1
    # tile 2: a couple of mid-density rows
    for j, (t, g, k) in enumerate([(300, 2, 3), (383, 16, 5)]):
        r = t * N_GROUPS + g
        table[0, r, :k] = [g * 128 + 3 * i + 1 for i in range(k)]
        table[0, r, GROUP_CAP] = k

    with _interpret():
        t2, f2, n2 = compact_candidates(jnp.asarray(table), 256)
    t1, f1, n1 = extract_peaks_from_candidates(jnp.asarray(table), 256)
    n = int(n1[0])
    assert int(n2[0]) == n == GROUP_CAP + 1 + 3 + 5
    assert np.array_equal(np.asarray(t1)[0][:n], np.asarray(t2)[0][:n])
    assert np.array_equal(np.asarray(f1)[0][:n], np.asarray(f2)[0][:n])
    # nothing leaked into the skipped-empty-tile region
    assert np.asarray(t2)[0][:n].min() >= 130
