"""Probed solo-clip path timing at production scale (round 4).

recognize_clip at big indexes now runs TWO programs: (A) fused
fingerprint + dedup + exact-total bounds probe (pairs device-resident),
(B) one fitted-tier match over those pairs (timed in exp_policy —
7.04 ms @ 262K on prod12288). This measures program A chained on the
saved build, so solo device latency = t_A + t_tier.

Run: python benchmarks/exp_clipprobe.py  (env: CLIP_DB like exp_esc)
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                     # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp        # noqa: E402
from jax import lax            # noqa: E402

from shazam_tpu.audio.synth import synth_song                   # noqa: E402
from shazam_tpu.config import DEFAULT_CONFIG as CFG             # noqa: E402
from shazam_tpu.index.store import FingerprintIndex             # noqa: E402
from shazam_tpu.index.search import build_unique_view           # noqa: E402
from shazam_tpu.match.ondevice import fingerprint_probe_on_device  # noqa: E402

PREFIX = os.environ.get("CLIP_DB", "/root/repo/.data/prod12288")
CHAIN = 9


def main():
    print(f"=== {PREFIX}", flush=True)
    index = FingerprintIndex.load(PREFIX + ".idx.npz")
    dev = index.device_arrays()
    uview, usteps = build_unique_view(index.key_hi, index.key_lo,
                                      index.key_ex)

    fs = CFG.sample_rate
    clip = synth_song(7, duration_s=16.0, seed=3)[: 15 * fs]
    blen = 1 << 20                      # 15 s @ 44.1k pads to 2^20
    while blen < len(clip):
        blen <<= 1
    padded = np.zeros(blen, np.float32)
    padded[: len(clip)] = clip
    x = jnp.asarray(padded)[None, :]
    nv = jnp.asarray([len(clip)], np.int32)
    kw = dict(fs=fs, wsize=CFG.window_size, hop=CFG.hop,
              amp_min=CFG.amp_min, radius=CFG.peak_neighborhood_size,
              fan_value=CFG.fan_value, min_dt=CFG.min_hash_time_delta,
              max_dt=CFG.max_hash_time_delta,
              peak_capacity=CFG.peak_capacity,
              use_fused=jax.devices()[0].platform == "tpu",
              query_capacity=4096, u_steps=usteps)

    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(x, nv, dv, uv, k):
        def body(i, acc):
            out = fingerprint_probe_on_device(
                x + acc * 1e-30, nv, dv, head=None, uview=uv, **kw)
            return acc + sum(jnp.sum(l.astype(jnp.float32))
                             for l in jax.tree_util.tree_leaves(out))
        return lax.fori_loop(0, k, body, jnp.float32(0))

    res = {}
    for k in (1, CHAIN):
        float(loop(x, nv, dev, uview, k))
        best = []
        for _ in range(3):
            t0 = time.time()
            float(loop(x, nv, dev, uview, k))
            best.append(time.time() - t0)
        res[k] = min(best)
    t = max((res[CHAIN] - res[1]) / (CHAIN - 1), 1e-6)
    q, n_pairs, n_peaks, n_h, total = jax.device_get(
        fingerprint_probe_on_device(x, nv, dev, head=None, uview=uview,
                                    **kw))
    print(f"fingerprint+probe program: {t*1e3:.2f} ms "
          f"(pairs {int(n_pairs)}, peaks {int(n_peaks)}, "
          f"total rows {int(total)})", flush=True)


if __name__ == "__main__":
    main()
