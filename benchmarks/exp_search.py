"""Query latency vs index size: one- vs two-level fence.

At 95M rows the single-level fence (every 512th key, ~2.2 MB) outgrows
cache and its ~18 rounds gather from HBM. The second fence level
(~stride^2 spacing, a few KB) absorbs those leading rounds. Index built
ON the device (random sorted keys — search cost only depends on size).
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

from shazam_tpu.match.lookup import match_query, match_query_sparse

N = int(os.environ.get("SEARCH_ROWS", 95_000_000))
N_SONGS, STRIDE = 12288, 8192
HIST_SONGS = int(os.environ.get("HIST_SONGS", N_SONGS))
MATCHER = (match_query_sparse if os.environ.get("SPARSE")
           else None)
Q = 4096


@jax.jit
def build_index(key):
    k1, k2, k3, k4 = random.split(key, 4)
    hi = random.bits(k1, (N,), jnp.uint32)
    lo = random.bits(k2, (N,), jnp.uint32)
    ex = random.bits(k3, (N,), jnp.uint32) >> 16
    pay = (random.randint(k4, (N,), 0, N_SONGS, jnp.int32).astype(jnp.uint32)
           * jnp.uint32(STRIDE)
           + (random.bits(k4, (N,), jnp.uint32) % jnp.uint32(4500)))
    return lax.sort((hi, lo, ex, pay), num_keys=3)


def main():
    cols = build_index(random.PRNGKey(0))
    jax.block_until_ready(cols)
    print(f"index ready: {N} rows", flush=True)

    rng = np.random.default_rng(1)
    pick = rng.integers(0, N, Q)
    q = tuple(jnp.asarray(np.asarray(c)[pick]) if False else
              jnp.take(c, jnp.asarray(pick)) for c in cols[:3])
    q_t = jnp.asarray(rng.integers(0, 640, Q).astype(np.uint32))
    ones = jnp.asarray(np.ones(Q, bool))

    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(cols, k):
        def body(i, acc):
            raw = (MATCHER or match_query)(
                cols, q[0] + (acc * 1e-30).astype(jnp.uint32), q[1], q[2],
                q_t, ones, ones,
                n_songs=HIST_SONGS, delta_min=-1024, delta_range=10240,
                match_capacity=16384, topn=2, offset_stride=STRIDE)
            return acc + sum(jnp.sum(l.astype(jnp.float32))
                             for l in jax.tree_util.tree_leaves(raw))
        return lax.fori_loop(0, k, body, jnp.float32(0))

    res = {}
    for k in (1, 17):
        float(loop(cols, k))
        best = []
        for _ in range(3):
            t0 = time.time()
            float(loop(cols, k))
            best.append(time.time() - t0)
        res[k] = min(best)
    ms = (res[17] - res[1]) / 16 * 1000
    print(f"{"sparse" if MATCHER else "dense"} match {Q}-lane vs {N}-row index (hist {HIST_SONGS} songs): {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
