"""Interpolation-seeded lexicographic search vs numpy, at scale sizes.

The CPU suites exercise small indexes; the interpolation-seeded descent
engages past 4,096 rows. The dense-key cases here (hi < 2^8) defeat the
uniform-key row prediction, forcing the exact batch-level escape path;
the uniform case exercises the seeded fast path. Both verified against
numpy searchsorted on the packed 80-bit keys.
"""

import numpy as np
import pytest


@pytest.mark.parametrize("n", [50_000, 3_000_000])
def test_bounds_match_numpy(n):
    import jax.numpy as jnp
    from shazam_tpu.index.search import lexi_lower_bound, lexi_upper_bound

    rng = np.random.default_rng(3)
    hi = rng.integers(0, 1 << 8, n, dtype=np.uint32)   # dense: many dups
    lo = rng.integers(0, 1 << 4, n, dtype=np.uint32)
    ex = rng.integers(0, 1 << 3, n, dtype=np.uint32)
    order = np.lexsort((ex, lo, hi))
    hi, lo, ex = hi[order], lo[order], ex[order]
    packed = (hi.astype(np.uint64) << 32) | (lo.astype(np.uint64) << 16) | ex

    m = 1024
    qi = rng.integers(0, n, m)
    q_hi, q_lo, q_ex = hi[qi].copy(), lo[qi].copy(), ex[qi].copy()
    # mix in misses and extremes
    q_hi[:64] = rng.integers(0, 1 << 9, 64, dtype=np.uint32)
    q_hi[64:72] = 0
    q_hi[72:80] = np.uint32(0xFFFFFFFF)
    q_packed = (q_hi.astype(np.uint64) << 32) \
        | (q_lo.astype(np.uint64) << 16) | q_ex

    from shazam_tpu.index.search import lexi_bounds

    lb2, ub2 = lexi_bounds(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(ex),
        jnp.asarray(q_hi), jnp.asarray(q_lo), jnp.asarray(q_ex))
    assert np.array_equal(np.asarray(lb2),
                          np.searchsorted(packed, q_packed, "left"))
    assert np.array_equal(np.asarray(ub2),
                          np.searchsorted(packed, q_packed, "right"))

    lb = np.asarray(lexi_lower_bound(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(ex),
        jnp.asarray(q_hi), jnp.asarray(q_lo), jnp.asarray(q_ex)))
    ub = np.asarray(lexi_upper_bound(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(ex),
        jnp.asarray(q_hi), jnp.asarray(q_lo), jnp.asarray(q_ex)))
    assert np.array_equal(lb, np.searchsorted(packed, q_packed, "left"))
    assert np.array_equal(ub, np.searchsorted(packed, q_packed, "right"))


def test_bounds_uniform_keys_fast_path():
    """Uniform (SHA-1-like) keys take the interpolation-seeded window;
    verify exactness there, including edge queries outside the key range
    and near-boundary windows."""
    import jax.numpy as jnp
    from shazam_tpu.index.search import lexi_bounds

    rng = np.random.default_rng(11)
    n = 200_000
    hi = np.sort(rng.integers(0, 1 << 32, n, dtype=np.uint64)).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    ex = rng.integers(0, 1 << 16, n, dtype=np.uint32)
    order = np.lexsort((ex, lo, hi))
    hi, lo, ex = hi[order], lo[order], ex[order]
    packed = np.array([(int(h) << 48) | (int(l) << 16) | int(e)
                       for h, l, e in zip(hi, lo, ex)], dtype=object)

    m = 512
    qi = rng.integers(0, n, m)
    q_hi, q_lo, q_ex = hi[qi].copy(), lo[qi].copy(), ex[qi].copy()
    q_hi[:16] = rng.integers(0, 1 << 32, 16, dtype=np.uint64).astype(np.uint32)
    q_hi[16:20] = 0
    q_hi[20:24] = np.uint32(0xFFFFFFFF)
    q_packed = np.array([(int(h) << 48) | (int(l) << 16) | int(e)
                         for h, l, e in zip(q_hi, q_lo, q_ex)], dtype=object)

    lb, ub = lexi_bounds(jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(ex),
                         jnp.asarray(q_hi), jnp.asarray(q_lo),
                         jnp.asarray(q_ex))
    assert np.array_equal(np.asarray(lb),
                          np.searchsorted(packed, q_packed, "left"))
    assert np.array_equal(np.asarray(ub),
                          np.searchsorted(packed, q_packed, "right"))


def test_bounds_hot_buckets():
    """lexi_bounds' capped upper search must resolve buckets longer than
    FENCE_STRIDE exactly (the lax.cond full-search path)."""
    import jax.numpy as jnp
    import numpy as np
    from shazam_tpu.index.search import lexi_bounds

    rng = np.random.default_rng(5)
    n = 100_000
    hi = rng.integers(0, 1 << 16, n, dtype=np.uint32)
    hi[:2000] = 777            # one 2000-row hot bucket
    hi[2000:2300] = 778        # one 300-row bucket
    lo = np.zeros(n, np.uint32)
    ex = np.zeros(n, np.uint32)
    hi = np.sort(hi)
    packed = hi.astype(np.uint64)

    q_hi = np.array([777, 778, 5, 0xFFFF], np.uint32)
    z = np.zeros(4, np.uint32)
    lb, ub = lexi_bounds(jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(ex),
                         jnp.asarray(q_hi), jnp.asarray(z), jnp.asarray(z))
    assert np.array_equal(np.asarray(lb),
                          np.searchsorted(packed, q_hi, "left"))
    assert np.array_equal(np.asarray(ub),
                          np.searchsorted(packed, q_hi, "right"))
    assert int(ub[0] - lb[0]) >= 2000


def test_bounds_giant_bucket_full_escape():
    """A bucket longer than the 128K second-tier cap must resolve via the
    final full-search escape."""
    import jax.numpy as jnp
    from shazam_tpu.index.search import lexi_bounds

    rng = np.random.default_rng(7)
    n = 400_000
    hi = rng.integers(0, 1 << 20, n, dtype=np.uint32)
    hi[:200_000] = 9999           # one 200K-row bucket (> 128K tier cap)
    lo = np.zeros(n, np.uint32)
    ex = np.zeros(n, np.uint32)
    hi = np.sort(hi)
    packed = hi.astype(np.uint64)

    q_hi = np.array([9999, 12345, 0], np.uint32)
    z = np.zeros(3, np.uint32)
    lb, ub = lexi_bounds(jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(ex),
                         jnp.asarray(q_hi), jnp.asarray(z), jnp.asarray(z))
    assert np.array_equal(np.asarray(lb),
                          np.searchsorted(packed, q_hi, "left"))
    assert np.array_equal(np.asarray(ub),
                          np.searchsorted(packed, q_hi, "right"))
    assert int(ub[0] - lb[0]) == 200_000


def _np_bounds(hi, lo, ex, q_hi, q_lo, q_ex):
    # exact 80-bit order via Python ints (uint64 packing would overflow)
    packed = np.array([(int(h) << 48) | (int(l) << 16) | int(e)
                       for h, l, e in zip(hi, lo, ex)], dtype=object)
    qp = np.array([(int(h) << 48) | (int(l) << 16) | int(e)
                   for h, l, e in zip(q_hi, q_lo, q_ex)], dtype=object)
    return (np.searchsorted(packed, qp, "left"),
            np.searchsorted(packed, qp, "right"))


@pytest.mark.parametrize("dist", ["dense", "uniform", "hot", "giant"])
@pytest.mark.parametrize("bits", [4, 10, 16])
def test_head_seeded_bounds(dist, bits):
    """The bucket-CDF head path is exact for ANY key distribution —
    including ones that defeat interpolation (hot runs, dense dups)."""
    import jax.numpy as jnp
    from shazam_tpu.index.search import lexi_bounds, build_head

    rng = np.random.default_rng(17)
    n = 150_000
    if dist == "dense":
        hi = rng.integers(0, 1 << 8, n, dtype=np.uint32)
    elif dist == "uniform":
        hi = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    elif dist == "hot":
        hi = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
        hi[:40_000] = 0xABCD1234          # 40K-row hot run
        hi[40_000:41_000] = 0xABCD1235
    else:  # giant: one run dominating the whole index
        hi = np.full(n, 7 << 20, np.uint32)
        hi[: n // 10] = rng.integers(0, 1 << 20, n // 10, dtype=np.uint32)
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    ex = rng.integers(0, 1 << 16, n, dtype=np.uint32)
    order = np.lexsort((ex, lo, hi))
    hi, lo, ex = hi[order], lo[order], ex[order]

    m = 512
    qi = rng.integers(0, n, m)
    q_hi, q_lo, q_ex = hi[qi].copy(), lo[qi].copy(), ex[qi].copy()
    q_hi[:32] = rng.integers(0, 1 << 32, 32, dtype=np.uint64).astype(np.uint32)
    q_hi[32:36] = 0
    q_hi[36:40] = np.uint32(0xFFFFFFFF)
    if dist in ("hot", "giant"):
        q_hi[40:44] = hi[n // 2]          # guaranteed hot-run queries
        q_lo[40:44] = lo[n // 2]
        q_ex[40:44] = ex[n // 2]

    head = build_head(jnp.asarray(hi), bits=bits)
    assert int(head[0]) == 0 and int(head[-1]) == n
    lb, ub = lexi_bounds(jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(ex),
                         jnp.asarray(q_hi), jnp.asarray(q_lo),
                         jnp.asarray(q_ex), head=head)
    nlb, nub = _np_bounds(hi, lo, ex, q_hi, q_lo, q_ex)
    assert np.array_equal(np.asarray(lb), nlb)
    assert np.array_equal(np.asarray(ub), nub)


def test_head_matches_manual_cdf():
    """build_head's searchsorted formulation == the direct bincount CDF."""
    import jax.numpy as jnp
    from shazam_tpu.index.search import build_head

    rng = np.random.default_rng(23)
    hi = np.sort(rng.integers(0, 1 << 32, 30_000, dtype=np.uint64)
                 .astype(np.uint32))
    bits = 8
    head = np.asarray(build_head(jnp.asarray(hi), bits=bits))
    counts = np.bincount(hi >> np.uint32(32 - bits), minlength=1 << bits)
    expect = np.concatenate([[0], np.cumsum(counts)])
    assert np.array_equal(head, expect)


def test_head_with_sentinel_padding():
    """Device-resident columns pad the tail with 0xFFFFFFFF sentinels;
    the head must bracket real keys correctly over the FULL padded array
    (sentinels land in the last bucket)."""
    import jax.numpy as jnp
    from shazam_tpu.index.search import lexi_bounds, build_head

    rng = np.random.default_rng(29)
    n_real, pad = 20_000, 12_768
    hi = np.sort(rng.integers(0, 1 << 32, n_real, dtype=np.uint64)
                 .astype(np.uint32))
    lo = rng.integers(0, 1 << 32, n_real, dtype=np.uint64).astype(np.uint32)
    ex = rng.integers(0, 1 << 16, n_real, dtype=np.uint32)
    order = np.lexsort((ex, lo, hi))
    hi, lo, ex = hi[order], lo[order], ex[order]
    S = np.uint32(0xFFFFFFFF)
    hi_p = np.concatenate([hi, np.full(pad, S, np.uint32)])
    lo_p = np.concatenate([lo, np.full(pad, S, np.uint32)])
    ex_p = np.concatenate([ex, np.full(pad, S, np.uint32)])

    qi = rng.integers(0, n_real, 256)
    q_hi, q_lo, q_ex = hi[qi], lo[qi], ex[qi]

    head = build_head(jnp.asarray(hi_p), bits=10)
    lb, ub = lexi_bounds(
        jnp.asarray(hi_p), jnp.asarray(lo_p), jnp.asarray(ex_p),
        jnp.asarray(q_hi), jnp.asarray(q_lo), jnp.asarray(q_ex), head=head)
    nlb, nub = _np_bounds(hi, lo, ex, q_hi, q_lo, q_ex)
    assert np.array_equal(np.asarray(lb), nlb)
    assert np.array_equal(np.asarray(ub), nub)


def test_head_invalid_lanes_zero_span():
    """Padding lanes (q_valid False, sort key 0xFFFFFFFF) must get
    zero-width spans: on a device-resident index the last bucket spans
    the whole sentinel tail and the dynamic descent would pay the batch
    max for bounds nobody reads. Valid lanes' bounds must be unaffected."""
    import jax.numpy as jnp
    from shazam_tpu.index.search import lexi_bounds, build_head

    rng = np.random.default_rng(41)
    n_real, pad = 30_000, 34_768   # padded capacity like DeviceIndex
    hi = np.sort(rng.integers(0, 1 << 32, n_real, dtype=np.uint64)
                 .astype(np.uint32))
    lo = rng.integers(0, 1 << 32, n_real, dtype=np.uint64).astype(np.uint32)
    ex = rng.integers(0, 1 << 16, n_real, dtype=np.uint32)
    order = np.lexsort((ex, lo, hi))
    hi, lo, ex = hi[order], lo[order], ex[order]
    S = np.uint32(0xFFFFFFFF)
    hi_p = np.concatenate([hi, np.full(pad, S, np.uint32)])
    lo_p = np.concatenate([lo, np.full(pad, S, np.uint32)])
    ex_p = np.concatenate([ex, np.full(pad, S, np.uint32)])

    m = 256
    qi = rng.integers(0, n_real, m)
    q_hi, q_lo, q_ex = hi[qi].copy(), lo[qi].copy(), ex[qi].copy()
    q_valid = np.ones(m, bool)
    q_valid[m // 2:] = False          # padding lanes, keys forced to max
    q_hi[m // 2:] = S
    q_lo[m // 2:] = S
    q_ex[m // 2:] = S

    head = build_head(jnp.asarray(hi_p), bits=10)
    lb, ub = lexi_bounds(
        jnp.asarray(hi_p), jnp.asarray(lo_p), jnp.asarray(ex_p),
        jnp.asarray(q_hi), jnp.asarray(q_lo), jnp.asarray(q_ex),
        head=head, q_valid=jnp.asarray(q_valid))
    lb, ub = np.asarray(lb), np.asarray(ub)
    assert np.all(lb[m // 2:] == 0) and np.all(ub[m // 2:] == 0)

    nlb, nub = _np_bounds(hi, lo, ex, q_hi[: m // 2], q_lo[: m // 2],
                          q_ex[: m // 2])
    assert np.array_equal(lb[: m // 2], nlb)
    assert np.array_equal(ub[: m // 2], nub)


def test_maybe_build_head_policy():
    import jax.numpy as jnp
    from shazam_tpu.index.search import maybe_build_head, HEAD_MIN_ROWS

    small = jnp.zeros(HEAD_MIN_ROWS - 1, jnp.uint32)
    assert maybe_build_head(small) is None
    big = jnp.sort(jnp.arange(HEAD_MIN_ROWS, dtype=jnp.uint32) * 999983)
    h = maybe_build_head(big)
    assert h is not None and int(h[0]) == 0 and int(h[-1]) == HEAD_MIN_ROWS
