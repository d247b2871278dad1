"""Stage split of the fused fingerprint pipeline (chained timings).

Times cumulative prefixes of the pipeline on the standard 16 x 30 s
batch: spectrogram kernel | + peak kernel | + compaction | + SHA-1.
Every stage's outputs are consumed into the carry so XLA cannot DCE
anything; each prefix is its own compiled program.
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
from shazam_tpu.ops.pallas.compact import compact_candidates
from shazam_tpu.ops.hashes import generate_hashes

fs, secs, batch = 44100, 30.0, 16
n = int(secs * fs)
blen = -(-n // (1 << 18)) * (1 << 18)
mat = np.zeros((batch, blen), np.float32)
for i in range(batch):
    mat[i, :n] = synth_song(i, duration_s=secs, fs=fs, seed=5)
mat_d = jnp.asarray(mat)
nvf = jnp.asarray(np.full(batch, (n - 4096) // 2048 + 1, np.int32))


def consume(x):
    return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(x))


def stage_spec(x):
    return consume(spectrogram_power_fused(x, nvf))


def stage_peaks(x):
    spec = spectrogram_power_fused(x, nvf)
    return consume(peak_candidates_fused(spec, power_domain=True))


def stage_compact(x):
    spec = spectrogram_power_fused(x, nvf)
    table = peak_candidates_fused(spec, power_domain=True)
    return consume(compact_candidates(table, 4096))


def stage_full(x):
    spec = spectrogram_power_fused(x, nvf)
    table = peak_candidates_fused(spec, power_domain=True)
    times, freqs, n_peaks = compact_candidates(table, 4096)

    def hash_one(t, f, npk):
        return generate_hashes(t, f, jnp.minimum(npk, jnp.uint32(4096)))

    return consume(jax.vmap(hash_one)(times, freqs, n_peaks))


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


a = timed(stage_spec, "spectrogram")
b = timed(stage_peaks, "+ peaks kernel")
c = timed(stage_compact, "+ compaction")
d = timed(stage_full, "+ sha1 (full)")
print(f"split: spec {a:.2f} | peaks {b-a:.2f} | compact {c-b:.2f} "
      f"| sha1 {d-c:.2f} | total {d:.2f}")
