"""Single-dispatch recognize_clip == two-dispatch recognize_samples."""

import numpy as np
import pytest

from shazam_tpu import SIA
from shazam_tpu.audio.synth import synth_corpus, synth_song

N_SONGS = 4
DUR = 10.0


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("odcorpus")
    files = [f for f, _ in synth_corpus(str(d), N_SONGS, duration_s=DUR, seed=51)]
    sia = SIA()
    sia.ingest_files(files, batch_size=4)
    return sia


@pytest.mark.parametrize("sid", [0, 2])
def test_recognize_clip_matches_two_dispatch(engine, sid):
    song = synth_song(sid, duration_s=DUR, seed=51)
    clip = song[int(2.2 * 44100): int(7.2 * 44100)]
    one = engine.recognize_clip(clip, topn=3)
    two = engine.recognize_samples([clip], topn=3)
    assert one["input_hashes"] == two["input_hashes"]
    assert one["total_matches"] == two["total_matches"]
    g = [(r["song_id"], r["offset"], r["hashes_matched_in_input"],
          r["input_confidence"]) for r in one["results"]]
    r = [(r["song_id"], r["offset"], r["hashes_matched_in_input"],
          r["input_confidence"]) for r in two["results"]]
    assert g == r
    assert one["results"][0]["song_name"] == f"track{sid:06d}"


def test_recognize_clip_unknown(engine):
    stranger = synth_song(321, duration_s=5.0, seed=9999)
    out = engine.recognize_clip(stranger)
    ref = engine.recognize_samples([stranger])
    assert out["total_matches"] == ref["total_matches"]
