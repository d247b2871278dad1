"""Edge cases: empty index, empty clips, topn > ranked songs."""

import numpy as np

from shazam_tpu import SIA
from shazam_tpu.audio.synth import synth_song


def test_recognize_on_empty_index():
    sia = SIA()
    clip = synth_song(0, duration_s=3.0, seed=1)
    out = sia.recognize_samples([clip])
    assert out["results"] == []
    assert out["total_matches"] == 0
    out2 = sia.recognize_clip(clip)
    assert out2["results"] == []


def test_recognize_silent_clip_against_catalog():
    sia = SIA()
    sia.ingest_arrays([("a", synth_song(0, duration_s=4.0, seed=2))])
    out = sia.recognize_samples([np.zeros(44100 * 3, np.int16)])
    assert out["results"] == []
    assert out["input_hashes"] == 0


def test_topn_exceeds_catalog():
    sia = SIA()
    sia.ingest_arrays([("only", synth_song(3, duration_s=4.0, seed=2))])
    clip = synth_song(3, duration_s=4.0, seed=2)[: 3 * 44100]
    out = sia.recognize_samples([clip], topn=5)
    assert len(out["results"]) == 1  # trimmed to ranked songs
    assert out["results"][0]["song_name"] == "only"


def test_batched_on_empty_index():
    sia = SIA()
    outs = sia.recognize_batch([synth_song(0, duration_s=3.0, seed=1)])
    assert outs[0]["results"] == []
