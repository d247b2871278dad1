"""Spec-kernel tile_frames sweep: amortize per-tile overhead.

The stage-2 dots are ~1.6-2.3 ms of the 6.2 ms spectrogram stage; the
rest is framing/DMA/scheduling overhead paid per grid step (96 tiles per
16x30s batch at tile_frames=128). Larger tiles halve the step count;
VMEM budget allows up to ~256 frames/tile.
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
    for tf in (128, 192, 256):
        timed(lambda x, tf=tf: consume(
            spectrogram_power_fused(x, nvf, tile_frames=tf)),
            f"tile_frames={tf:3d}")
    # parity: larger tiles must be bit-identical on the valid frames
    ref = np.asarray(spectrogram_power_fused(mat_d, nvf, tile_frames=128))
    for tf in (192, 256):
        got = np.asarray(spectrogram_power_fused(mat_d, nvf, tile_frames=tf))
        tmin = min(ref.shape[1], got.shape[1])
        ok = np.array_equal(ref[:, :tmin], got[:, :tmin])
        print(f"parity tf={tf}: {'OK' if ok else 'MISMATCH'}")


if __name__ == "__main__":
    main()
