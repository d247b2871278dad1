"""Compact tile-size sweep: fewer grid steps + shorter finish scan."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from shazam_tpu.audio.synth import synth_song
from shazam_tpu.ops.pallas.spectrogram import spectrogram_db_fused
from shazam_tpu.ops.pallas.peaks import peak_candidates_fused
from shazam_tpu.ops.pallas.compact import compact_candidates

fs, secs, batch = 44100, 30.0, 16
n = int(secs * fs)
blen = -(-n // (1 << 18)) * (1 << 18)
mat = np.zeros((batch, blen), np.float32)
for i in range(batch):
    mat[i, :n] = synth_song(i, duration_s=secs, fs=fs, seed=5)
mat_d = jnp.asarray(mat)
nvf = jnp.asarray(np.full(batch, (n - 4096) // 2048 + 1, np.int32))


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
    def table_of(x):
        return peak_candidates_fused(spectrogram_db_fused(x, nvf))

    def mk(tr, tc):
        def stage(x):
            return consume(compact_candidates(table_of(x), 4096,
                                              tile_rows=tr, tile_cap=tc))
        return stage

    a = timed(lambda x: consume(table_of(x)), "base           ")
    r = {}
    for tr, tc in ((2048, 2048), (4096, 2048), (2176, 1024)):
        r[(tr, tc)] = timed(mk(tr, tc), f"tiles {tr:4d}/{tc:4d}")
    print("\ncompact costs:",
          {k: round(v - a, 2) for k, v in r.items()})

    # parity across tile sizes
    table = table_of(mat_d)
    ref = compact_candidates(table, 4096)
    for tr, tc in ((2048, 2048), (4096, 2048), (2176, 1024)):
        got = compact_candidates(table, 4096, tile_rows=tr, tile_cap=tc)
        ok = all(np.array_equal(np.asarray(x), np.asarray(y))
                 for x, y in zip(ref, got))
        print(f"parity {tr}/{tc}:", "OK" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
