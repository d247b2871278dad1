"""Peaks-kernel erosion cost isolation (+ spec tile_frames negative).

tile_frames 128 vs 192 measured identical (6.14 ms — per-tile overhead
is NOT the spec stage's non-dot cost; 256 exceeds the 64M scoped-vmem
budget). Here: how much of the peaks stage do the two bool running-AND
erosion reductions cost? (If significant, a zero-free fast path with a
pl.when-guarded erosion preserves semantics exactly.)
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

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from shazam_tpu.audio.synth import synth_song
from shazam_tpu.ops.pallas.spectrogram import spectrogram_power_fused
from shazam_tpu.ops.pallas.peaks import peak_candidates_fused

fs, secs, batch = 44100, 30.0, 16
n = int(secs * fs)
blen = -(-n // (1 << 18)) * (1 << 18)
mat = np.zeros((batch, blen), np.float32)
for i in range(batch):
    mat[i, :n] = synth_song(i, duration_s=secs, fs=fs, seed=5)
mat_d = jnp.asarray(mat)
nvf = jnp.asarray(np.full(batch, (n - 4096) // 2048 + 1, np.int32))


def consume(x):
    return jnp.sum(x.astype(jnp.float32))


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
    def spec(x):
        return spectrogram_power_fused(x, nvf)

    a = timed(lambda x: consume(spec(x)), "spec only        ")
    b = timed(lambda x: consume(
        peak_candidates_fused(spec(x), power_domain=True)),
        "spec+peaks       ")
    c = timed(lambda x: consume(
        peak_candidates_fused(spec(x), power_domain=True,
                              _skip_erosion=True)),
        "spec+peaks noero ")
    print(f"\npeaks stage {b-a:.2f}; erosion cost {b-c:.2f}")


if __name__ == "__main__":
    main()
