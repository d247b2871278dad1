"""Fast on-TPU parity gate for the fused fingerprint path.

Run before long on-device benches whenever kernels changed: validates on
the REAL chip (Mosaic semantics differ from interpret mode) that

1. the fused-finish compact kernel's peak lists are EXACTLY equal to the
   XLA finish over the same candidate tables (including a 210 s song,
   whose frames > 4095 exercise the tile-local scatter + frame-base
   re-add, and the bench corpus's dense harmonic combs that fill
   candidate slots unevenly — the predicated slot dots must be exact);
2. the fused end-to-end hash sets match the XLA pipeline (jaccard gate;
   1.0 expected — f32 dB-collision plateaus are the only known source
   of daylight, see ops/pallas docstrings).

Exits nonzero on any failure. ~1 compile + a few seconds of device time.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from shazam_tpu.audio.synth import synth_song
from shazam_tpu.ops.fingerprint import fingerprint_batch, fingerprint_batch_fused
from shazam_tpu.ops.pallas.spectrogram import spectrogram_db_fused
from shazam_tpu.ops.pallas.peaks import (
    peak_candidates_fused, extract_peaks_from_candidates,
)
from shazam_tpu.ops.pallas.compact import compact_candidates

FS = 44100


def _batch(durs, seed):
    n = max(int(d * FS) for d in durs)
    blen = -(-n // (1 << 18)) * (1 << 18)
    mat = np.zeros((len(durs), blen), np.float32)
    nv = []
    for i, d in enumerate(durs):
        s = synth_song(i, duration_s=d, fs=FS, seed=seed)
        mat[i, : len(s)] = s
        nv.append(len(s))
    return jnp.asarray(mat), jnp.asarray(np.asarray(nv, np.int32))


def main() -> int:
    ok = True

    # --- 1. compact kernel finish == XLA finish, exactly -------------
    # 210 s song: frames up to 4521 > 4095 (scatter frame-base re-add)
    for durs, seed, cap in (((30.0, 30.0, 17.0), 5, 8192),
                            ((210.0,), 5, 32768)):
        mat, nv = _batch(durs, seed)
        nvf = (nv - 4096) // 2048 + 1
        spec = spectrogram_db_fused(mat, nvf)
        table = peak_candidates_fused(spec)
        tk, fk, nk = (np.asarray(a) for a in compact_candidates(table, cap))
        tx, fx, nx = (np.asarray(a) for a in
                      extract_peaks_from_candidates(table, cap))
        same = (np.array_equal(nk, nx) and np.array_equal(tk, tx)
                and np.array_equal(fk, fx))
        print(f"compact parity durs={durs}: "
              f"{'OK' if same else 'MISMATCH'} (n_peaks {nk.tolist()})")
        ok &= same

    # --- 2. fused end-to-end hashes vs the XLA pipeline --------------
    mat, nv = _batch((30.0, 30.0), 5)
    ff = fingerprint_batch_fused(mat, nv, peak_capacity=4096)
    fx = fingerprint_batch(mat, nv, peak_capacity=4096)
    for b in range(2):
        vf = np.asarray(ff.valid[b])
        vx = np.asarray(fx.valid[b])
        sf = set(zip(np.asarray(ff.hi[b])[vf].tolist(),
                     np.asarray(ff.t1[b])[vf].tolist()))
        sx = set(zip(np.asarray(fx.hi[b])[vx].tolist(),
                     np.asarray(fx.t1[b])[vx].tolist()))
        jac = len(sf & sx) / max(len(sf | sx), 1)
        print(f"fused e2e jaccard song {b}: {jac:.6f} "
              f"({len(sf)} vs {len(sx)} hashes)")
        ok &= jac >= 0.9999

    print("PARITY GATE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
