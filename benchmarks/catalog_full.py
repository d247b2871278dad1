"""Reference-scale catalog benchmark: 2,714 FULL-LENGTH tracks, 15 s clips.

The round-1 catalog bench used 15 s songs (8.1M hashes); the reference's
headline (BASELINE.md row 1) is 2,714 full songs — ~11-12K hashes/song,
and its production catalog held 95.5M hashes (fingerprints_queries.sql:2).
This bench ingests 2,714 x 210 s synthetic tracks (~110M hashes — BEYOND
the reference's bench scale, matching its production scale), then runs:

- a 300-clip 15 s recognition sweep through the harness path
  (channel-union, seeded random starts) -> accuracy,
- the chained device-honest query p50 at this index size,
- the single-dispatch recognize_clip latency.

Song generation is vectorized (one CPU here; the per-note synth would
take ~90 min), ingest streams in chunks so host memory stays bounded.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_SONGS = int(os.environ.get("CATALOG_SONGS", 2714))
DURATION = float(os.environ.get("CATALOG_DURATION", 210.0))
CLIP_S = 15.0
N_CLIPS = int(os.environ.get("CATALOG_CLIPS", 300))
FS = 44100


def fast_song(sid: int, duration_s: float = DURATION, fs: int = FS,
              seed: int = 77) -> np.ndarray:
    """Vectorized synthetic track: harmonic random-walk voices + clicks.

    Same workload shape as audio.synth.synth_song (~190 hashes/s) but
    built from whole-array ops (~0.2 s per 210 s song on one core).
    """
    rng = np.random.default_rng(np.random.SeedSequence([seed, sid]))
    block = 8192
    nblocks = int(duration_s * fs) // block + 1
    n = nblocks * block
    audio = np.zeros(n, np.float32)
    ramp = np.arange(block, dtype=np.float32)
    for _v in range(3):
        walk = np.exp(np.cumsum(rng.normal(0, 0.12, nblocks)))
        f = np.clip(rng.uniform(80, 800) * walk, 60, 3500)
        # phase is linear within a block: tiny f64 per-block cumsum for
        # the start phases, one fused f32 broadcast for the samples
        step = 2 * np.pi * f / fs
        starts = np.mod(
            np.concatenate([[0.0], np.cumsum(step * block)[:-1]]),
            2 * np.pi,
        ).astype(np.float32)
        phase = starts[:, None] + step.astype(np.float32)[:, None] * ramp
        env = rng.uniform(0.15, 1.0, nblocks).astype(np.float32)[:, None]
        # harmonics from one sin/cos pair: sin2x = 2sc, sin3x = s(3-4s^2)
        s = np.sin(phase)
        c = np.cos(phase)
        audio += (env * (s + c * s + 0.25 * s * (3.0 - 4.0 * s * s))
                  ).reshape(-1)
    # percussive clicks
    hits = rng.integers(0, n - 512, int(duration_s * 2))
    click = np.exp(-np.arange(441) / 22.0).astype(np.float32)
    for h in hits:
        audio[h : h + 441] += np.float32(rng.normal(0, 1.2)) * click
    audio += rng.standard_normal(n, dtype=np.float32) * np.float32(0.01)
    audio = audio / np.abs(audio).max() * 0.8
    return (audio[: int(duration_s * fs)] * 32767).astype(np.int16)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from shazam_tpu.api import SIA

    # device-resident: additions merge ON the chip (index/devmerge.py,
    # 71 ms vs 29 s host at 48M rows) — the only way a 110M-hash ingest
    # finishes in minutes. NB: touching `.index` here would materialize
    # a full device->host download; use _live_n_hashes() for progress.
    sia = SIA(device_resident=True)
    t0 = time.time()
    chunk = 32
    for base in range(0, N_SONGS, chunk):
        songs = [
            (f"track{i:06d}", fast_song(i))
            for i in range(base, min(base + chunk, N_SONGS))
        ]
        stats = sia.ingest_arrays(songs, batch_size=8,
                                  song_peak_capacity=65536)
        if stats["overflowed"]:
            print("OVERFLOWED:", stats["overflowed"])
        if base % 256 == 0:
            print(f"ingested {base + len(songs)}/{N_SONGS} "
                  f"({sia._live_n_hashes()} hashes, {time.time()-t0:.0f}s)",
                  flush=True)
    n_hashes = sia._live_n_hashes()
    print(f"catalog: {N_SONGS} songs x {DURATION:.0f}s, {n_hashes} hashes, "
          f"ingest {time.time()-t0:.0f}s", flush=True)

    # ---- accuracy sweep: N_CLIPS random 15 s clips ----
    rng = np.random.default_rng(42)
    correct = 0
    times = []
    picks = rng.choice(N_SONGS, N_CLIPS, replace=False)
    for i, sid in enumerate(picks):
        song = fast_song(int(sid))
        a = int(rng.integers(0, len(song) - int(CLIP_S * FS)))
        clip = song[a : a + int(CLIP_S * FS)]
        t1 = time.time()
        out = sia.recognize_samples([clip], topn=2)
        times.append(time.time() - t1)
        if out["results"] and out["results"][0]["song_name"] == f"track{sid:06d}":
            correct += 1
        if (i + 1) % 50 == 0:
            print(f"sweep {i+1}/{N_CLIPS}: acc so far {correct/(i+1):.4f}, "
                  f"p50 api {np.median(times)*1000:.0f} ms", flush=True)
    acc = correct / N_CLIPS
    print(f"ACCURACY {acc:.4f} over {N_CLIPS} x {CLIP_S:.0f}s clips vs "
          f"{n_hashes}-hash index; api p50 {np.median(times)*1000:.0f} ms",
          flush=True)

    # ---- device-honest single-dispatch latency on this real index ----
    import functools
    import jax.numpy as jnp
    from jax import lax
    from shazam_tpu.match.ondevice import recognize_on_device

    dev = sia._ensure_device_index()
    delta_min, delta_range = sia._delta_params_for(int(CLIP_S * FS))
    clip = fast_song(99)[: int(CLIP_S * FS)]
    blen = -(-len(clip) // (1 << 18)) * (1 << 18)
    padded = np.zeros(blen, np.float32)
    padded[: len(clip)] = clip
    kw = dict(
        n_songs=N_SONGS, delta_min=delta_min, delta_range=delta_range,
        match_capacity=sia.config.match_capacity_fast, topn=2,
        offset_stride=sia._offset_stride, peak_capacity=8192,
        query_capacity=4096,
    )

    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(x, nv, k):
        def body(i, acc):
            out = recognize_on_device(
                jnp.roll(x, i, axis=1) + acc * 1e-30, nv, dev, **kw)
            return acc + sum(jnp.sum(l.astype(jnp.float32))
                             for l in jax.tree_util.tree_leaves(out))
        return lax.fori_loop(0, k, body, jnp.float32(0))

    args = (jnp.asarray(padded)[None, :], jnp.asarray([len(clip)], np.int32))
    res = {}
    for k in (1, 9):
        float(loop(*args, k))
        best = []
        for _ in range(3):
            t1 = time.time()
            float(loop(*args, k))
            best.append(time.time() - t1)
        res[k] = min(best)
    ms = (res[9] - res[1]) / 8 * 1000
    print(f"recognize_clip device: {ms:.2f} ms per 15 s clip "
          f"(q_cap 4096) vs {n_hashes}-hash real index", flush=True)


if __name__ == "__main__":
    main()
