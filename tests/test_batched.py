"""Batched multi-query recognition == per-clip recognition."""

import numpy as np
import pytest

from shazam_tpu import SIA
from shazam_tpu.audio.synth import synth_corpus, synth_song

N_SONGS = 5
DUR = 10.0


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("bcorpus")
    files = [f for f, _ in synth_corpus(str(d), N_SONGS, duration_s=DUR, seed=11)]
    sia = SIA()
    sia.ingest_files(files, batch_size=4)
    return sia


def test_batched_matches_single(engine):
    clips = []
    for sid in range(N_SONGS):
        song = synth_song(sid, duration_s=DUR, seed=11)
        start = int((1.0 + sid) * 44100)
        clips.append(song[start : start + 5 * 44100])

    batched = engine.recognize_batch(clips, topn=3)
    assert len(batched) == N_SONGS
    for sid, out in enumerate(batched):
        single = engine.recognize_samples([clips[sid]], topn=3)
        assert out["results"][0]["song_name"] == f"track{sid:06d}"
        got = [(r["song_id"], r["offset"], r["hashes_matched_in_input"])
               for r in out["results"]]
        ref = [(r["song_id"], r["offset"], r["hashes_matched_in_input"])
               for r in single["results"]]
        assert got == ref
        assert out["total_matches"] == single["total_matches"]


def test_batched_empty():
    sia = SIA()
    assert sia.recognize_batch([]) == []
