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


def test_delete_songs_removes_from_catalog_and_index():
    sia = SIA()
    songs = [(f"s{i}", synth_song(i, duration_s=5.0, seed=66)) for i in range(3)]
    sia.ingest_arrays(songs)
    before = sia.index.n_hashes
    sid = [r["song_id"] for r in sia.catalog.get_songs()
           if r["song_name"] == "s1"][0]
    removed = sia.delete_songs([sid])
    assert removed > 0
    assert sia.index.n_hashes == before - removed
    assert sia.catalog.get_song_by_id(sid) is None
    out = sia.recognize_samples([songs[1][1][: 44100 * 4]])
    assert all(r["song_name"] != "s1" for r in out["results"])
    out0 = sia.recognize_samples([songs[0][1][: 44100 * 4]])
    assert out0["results"][0]["song_name"] == "s0"
