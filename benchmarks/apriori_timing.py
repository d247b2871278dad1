"""When does the apriori early exit actually pay off?

The reference's apriori mode exits after each 1000-hash DB batch once the
leader's dedup rows double the runner-up's (recognizer_apriori.py:303) —
a win when every batch is a network round trip. Here a batch is one
device program, but the margin check is a host round trip (~100 ms RTT
through this tunnel), so the exit must skip MANY batches to pay.

Measures wall time of recognize_samples(early_exit=True/False) for a
15 s clip (a skewed query: exit fires on the first batch) against an
in-memory catalog, on the real TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from shazam_tpu.api import SIA
from shazam_tpu.audio.synth import synth_song

sia = SIA()
songs = [(f"t{i}", synth_song(i, duration_s=30.0, seed=5)) for i in range(64)]
sia.ingest_arrays(songs)

clip = songs[7][1][44100 : 44100 * 16]  # 15 s -> ~3K pairs, several batches


def timed(early):
    sia.recognize_samples([clip], early_exit=early)  # warm/compile
    best = []
    for _ in range(5):
        t0 = time.time()
        out = sia.recognize_samples([clip], early_exit=early)
        best.append(time.time() - t0)
    assert out["results"][0]["song_name"] == "t7"
    return min(best), out["query_time"]


full_t, full_q = timed(False)
ap_t, ap_q = timed(True)
print(f"full match:   total {full_t*1000:.0f} ms (query {full_q*1000:.0f} ms)")
print(f"apriori exit: total {ap_t*1000:.0f} ms (query {ap_q*1000:.0f} ms)")
print("verdict:", "apriori pays off" if ap_t < full_t else
      "apriori is slower here (per-batch host RTT dominates; use it only "
      "when per-batch cost >> RTT, e.g. remote shards)")
