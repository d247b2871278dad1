"""Reproduce serve_qps's deterministic wrong answers OUTSIDE the server.

serve_prod2 (95.3M tone build) and serve_music (81.1M music build) each
answered 2/128 5 s clips with the same wrong song across three sweeps.
This regenerates exactly those clips (same seed-5 draw as
serve_qps._load_prebuilt) and recognizes them through the plain API —
solo and batched — printing the top-2 votes for the wanted vs returned
song.  Distinguishes a genuine 5 s near-collision (solo agrees with the
server: accept + document a threshold) from a serving-path bug (solo
differs: fix the path).

Run:  PROBE_DB=/root/repo/.data/prod12288 PROBE_SONGS=12288 \
      PROBE_IDS=19,99 python benchmarks/probe_wrong.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

PREFIX = os.environ["PROBE_DB"]
IDS = [int(x) for x in os.environ.get("PROBE_IDS", "19,99").split(",")]
CLIP = float(os.environ.get("PROBE_CLIP", 5.0))
NEED = int(os.environ.get("PROBE_NEED", 128))   # CLIENTS*REQS of the run
FS = 44100


def main():
    import jax.numpy as jnp

    from shazam_tpu import SIA

    import catalog_full as cf

    sia = SIA(catalog_path=PREFIX + ".sqlite")
    t0 = time.time()
    sia.load_index(PREFIX + ".idx.npz")
    print(f"loaded {sia._live_n_hashes()}-hash index in "
          f"{time.time()-t0:.0f}s", flush=True)

    gen = cf._make_gen()
    rng = np.random.default_rng(5)              # serve_qps clip draw
    sids = rng.integers(0, cf.N_SONGS, NEED)
    starts = rng.integers(0, cf.N_SAMP - int(CLIP * FS), NEED)

    clips = []
    for k in IDS:
        sid, s = int(sids[k]), int(starts[k])
        base = sid // cf.BATCH * cf.BATCH
        batch = np.asarray(gen(jnp.asarray(np.arange(
            base, min(base + cf.BATCH, cf.N_SONGS), dtype=np.int32))))
        row = batch[sid - base]
        clips.append((k, f"track{sid:06d}",
                      row[s: s + int(CLIP * FS)].astype(np.int16)))

    for k, want, clip in clips:
        solo = sia.recognize_samples([clip], topn=2)
        r = solo["results"]
        print(f"clip {k} want {want}: solo top1={r[0]['song_name']} "
              f"votes={r[0]['input_confidence']:.3f}/"
              f"{r[0]['hashes_matched_in_input']} "
              f"top2={r[1]['song_name'] if len(r) > 1 else '-'} "
              f"({r[1]['hashes_matched_in_input'] if len(r) > 1 else 0})",
              flush=True)
        fast = sia.recognize_clip(clip, topn=2)
        rf = fast["results"]
        print(f"          single-dispatch top1={rf[0]['song_name']}",
              flush=True)

    batch_out = sia.recognize_batch([c for _, _, c in clips], topn=2)
    for (k, want, _), out in zip(clips, batch_out):
        print(f"clip {k} want {want}: batched top1="
              f"{out['results'][0]['song_name']}", flush=True)


if __name__ == "__main__":
    main()
