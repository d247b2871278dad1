"""Batched match throughput vs a production-scale (95M-row) index.

The reference serves one query at a time over a DB socket (thread pools
just parallelize SELECT batches). Here the serving path for high QPS is
``match_queries_batched``: a vmap over the whole query batch — every
clip's head-seeded searches, vote expansion and sparse vote count run in
one compiled program. This measures queries/s/chip at the reference's
production catalog scale (95M rows incl. implanted hyper-hot runs, the
real key distribution) for several batch widths.

Chained-loop protocol per CLAUDE.md.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax, random

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from shazam_tpu.index.search import maybe_build_head
from shazam_tpu.match.batched import match_queries_batched

N = int(os.environ.get("SEARCH_ROWS", 95_000_000))
N_SONGS, STRIDE = 12288, 8192
Q_LANES = 1024
N_HOT = 32
HOT_LEN = 32768
BATCHES = tuple(int(b) for b in
                os.environ.get("BATCHES", "4,16").split(","))


def build_index(key):
    k1, k2, k3, k4, k5, k6 = random.split(key, 6)
    hi = random.bits(k1, (N,), jnp.uint32)
    lo = random.bits(k2, (N,), jnp.uint32)
    ex = random.bits(k3, (N,), jnp.uint32) >> 16
    # implant hot runs on keys the queries will hit
    hot_hi = random.bits(k6, (N_HOT,), jnp.uint32)
    hot_len = min(HOT_LEN, max(N // (4 * N_HOT), 1))
    tot = N_HOT * hot_len
    hi = hi.at[:tot].set(jnp.repeat(hot_hi, hot_len, total_repeat_length=tot))
    pay = (random.randint(k4, (N,), 0, N_SONGS, jnp.int32).astype(jnp.uint32)
           * jnp.uint32(STRIDE)
           + random.randint(k5, (N,), 0, 4500, jnp.int32).astype(jnp.uint32))
    hi, lo, ex, pay = lax.sort((hi, lo, ex, pay), num_keys=3)
    return hi, lo, ex, pay


def make_queries(cols, rng, batch):
    """Half real index keys (some hot), half misses — per clip."""
    hi, lo, ex = (np.asarray(c[:: max(1, N // 200_000)]) for c in cols[:3])
    qs = []
    for b in range(batch):
        pick = rng.integers(0, len(hi), Q_LANES // 2)
        q_hi = np.concatenate([hi[pick], rng.integers(
            0, 2**32, Q_LANES - Q_LANES // 2, dtype=np.uint32)])
        q_lo = np.concatenate([lo[pick], rng.integers(
            0, 2**32, Q_LANES - Q_LANES // 2, dtype=np.uint32)])
        q_ex = np.concatenate([ex[pick], rng.integers(
            0, 2**16, Q_LANES - Q_LANES // 2, dtype=np.uint32)])
        order = np.lexsort((q_ex, q_lo, q_hi))
        qs.append((q_hi[order], q_lo[order], q_ex[order]))
    q_hi = np.stack([q[0] for q in qs])
    q_lo = np.stack([q[1] for q in qs])
    q_ex = np.stack([q[2] for q in qs])
    q_t = rng.integers(0, 640, (batch, Q_LANES)).astype(np.uint32)
    ones = np.ones((batch, Q_LANES), bool)
    return tuple(jnp.asarray(a) for a in (q_hi, q_lo, q_ex, q_t, ones, ones))


def main():
    cols = jax.jit(build_index)(random.PRNGKey(3))
    jax.block_until_ready(cols)
    head = maybe_build_head(cols[0])
    jax.block_until_ready(head)
    print(f"index ready: {N} rows, head {head.shape}", flush=True)
    rng = np.random.default_rng(5)

    kw = dict(n_songs=N_SONGS, delta_min=-1024, delta_range=8192,
              match_capacity=16384, topn=2, offset_stride=STRIDE)

    for batch in BATCHES:
        args = make_queries(cols, rng, batch)

        @functools.partial(jax.jit, static_argnames=("k",))
        def loop(qs, cols, hd, k):
            def body(i, acc):
                rolled = tuple(jnp.roll(a, i, axis=1) for a in qs)
                out = match_queries_batched(cols, *rolled, head=hd, **kw)
                return acc + sum(jnp.sum(l.astype(jnp.float32))
                                 for l in jax.tree_util.tree_leaves(out))
            return lax.fori_loop(0, k, body, jnp.float32(0))

        res = {}
        for k in (1, 9):
            float(loop(args, cols, head, k))
            best = []
            for _ in range(3):
                t0 = time.time()
                float(loop(args, cols, head, k))
                best.append(time.time() - t0)
            res[k] = min(best)
        ms = (res[9] - res[1]) / 8 * 1000
        print(f"batch {batch:3d}: {ms:7.2f} ms/batch = "
              f"{batch / ms * 1000:8.0f} queries/s/chip", flush=True)


if __name__ == "__main__":
    main()
