"""End-to-end: ingest a synthetic corpus, recognize clips through the API."""

import numpy as np
import pytest

from shazam_tpu import SIA, FingerprintConfig
from shazam_tpu.audio.synth import synth_corpus, synth_song
from shazam_tpu.audio.noise import mix_at_snr, white_noise_for_snr, renormalize


N_SONGS = 6
DUR = 12.0


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    files = synth_corpus(str(d), N_SONGS, duration_s=DUR, seed=7)
    return files


@pytest.fixture(scope="module")
def engine(corpus, tmp_path_factory):
    sia = SIA()
    stats = sia.ingest_files([f for f, _ in corpus], batch_size=4)
    assert stats["ingested"] == N_SONGS
    assert stats["hashes"] > 100 * N_SONGS
    assert not stats["overflowed"]
    return sia


def _clip(song_id, start_s, dur_s=5.0):
    song = synth_song(song_id, duration_s=DUR, seed=7)
    fs = 44100
    a = int(start_s * fs)
    return song[a:a + int(dur_s * fs)]


def test_recognize_clean_clips(engine):
    for sid_file in range(N_SONGS):
        clip = _clip(sid_file, start_s=3.0)
        out = engine.recognize_samples([clip])
        assert out["results"], f"no results for track{sid_file:06d}"
        top = out["results"][0]
        assert top["song_name"] == f"track{sid_file:06d}"
        # offset should point at ~3 s into the song
        assert abs(top["offset_seconds"] - 3.0) < 0.3
        assert top["input_confidence"] > 0.05
        assert out["total_matches"] > 0


def test_recognize_noisy_clip(engine):
    clip = _clip(2, start_s=4.0)
    noisy = mix_at_snr(clip, white_noise_for_snr(renormalize(clip), 0.0, rng=3),
                       snr_db=0.0, rng=5)
    out = engine.recognize_samples([np.clip(noisy * 32767, -32768, 32767).astype(np.int16)])
    assert out["results"]
    assert out["results"][0]["song_name"] == "track000002"


def test_recognize_stereo_union(engine):
    clip = _clip(1, start_s=2.0)
    out = engine.recognize_samples([clip, clip])  # identical channels union
    assert out["results"][0]["song_name"] == "track000001"


def test_unknown_clip_low_confidence(engine):
    stranger = synth_song(999, duration_s=5.0, seed=12345)
    out = engine.recognize_samples([stranger])
    if out["results"]:
        # an unknown song must not align strongly anywhere
        top = out["results"][0]
        clean = engine.recognize_samples([_clip(0, 3.0)])
        assert top["hashes_matched_in_input"] < clean["results"][0]["hashes_matched_in_input"]


def test_ingest_resume_skips_known_files(corpus):
    sia = SIA()
    files = [f for f, _ in corpus]
    s1 = sia.ingest_files(files[:3], batch_size=4)
    assert s1["ingested"] == 3
    s2 = sia.ingest_files(files, batch_size=4)
    assert s2["skipped"] == 3
    assert s2["ingested"] == N_SONGS - 3
    out = sia.recognize_samples([_clip(4, 3.0)])
    assert out["results"][0]["song_name"] == "track000004"


def test_index_persistence_roundtrip(engine, tmp_path):
    p = str(tmp_path / "index.npz")
    engine.save_index(p)
    # catalog travels with the SIA object; reuse it with a reloaded index
    engine.load_index(p)
    out = engine.recognize_samples([_clip(3, 3.0)])
    assert out["results"][0]["song_name"] == "track000003"


def test_metadata_roundtrip(engine):
    engine.catalog.insert_metadata(
        1, track_title="T", album_title="A", artist_name="X",
        artist_website="w", track_genres="g", track_url="u",
    )
    md = engine.get_metadata(1)
    assert md["track_title"] == "T"
    assert md["artist_name"] == "X"


def test_sparse_and_pruned_paths_match_dense_end_to_end(corpus):
    """Force the big-catalog matchers on a small corpus
    (sparse_vote_threshold=0) and check the whole API surface returns
    results identical to the default dense path: recognize_samples (the
    tiered host path), recognize_clip (single dispatch), and
    recognize_batch (vmapped + certificate solo retries) — with the
    pruned rank on (default) and off (rank_candidates=0)."""
    files = [f for f, _ in corpus]
    clips = [_clip(i, start_s=2.0 + i) for i in range(N_SONGS)]
    clips.append(np.zeros(44100 * 3, np.float32))  # silence: no match
    miss = synth_song(999, duration_s=5.0, seed=123)  # not in catalog
    clips.append(miss)

    def run(cfg):
        sia = SIA(config=cfg)
        sia.ingest_files(files, batch_size=4)
        outs = {
            "samples": [sia.recognize_samples([c]) for c in clips],
            "clip": [sia.recognize_clip(c) for c in clips],
            "batch": sia.recognize_batch(clips),
        }
        return outs

    def strip(res):
        # timings differ run to run; compare the semantic payload
        return [
            (r["results"][0]["song_name"] if r["results"] else None,
             r["results"][0]["offset"] if r["results"] else None,
             r["results"][0]["hashes_matched_in_input"] if r["results"]
             else None,
             r["total_matches"])
            for r in (res if isinstance(res, list) else [res])
        ]

    base = run(FingerprintConfig())
    forced = run(FingerprintConfig(sparse_vote_threshold=0))
    pruned_off = run(FingerprintConfig(sparse_vote_threshold=0,
                                       rank_candidates=0))
    tiny_c = run(FingerprintConfig(sparse_vote_threshold=0,
                                   rank_candidates=2))
    # scatter-free scan rank + block-gather expansion (the escalated-tier
    # production combination) through the same three API paths
    # (min_capacity gate dropped so blocks engage at the fast tier too)
    scan_blk = run(FingerprintConfig(sparse_vote_threshold=0,
                                     vote_rank="scan", expand_block=512,
                                     expand_block_min_capacity=0))
    # bounds-first policy (production default past 2^25 rows): the
    # exact-total probe dispatches straight to the fitting tier
    bounds1 = run(FingerprintConfig(sparse_vote_threshold=0,
                                    bounds_probe_min_rows=1))

    for key in ("samples", "clip", "batch"):
        want = strip(base[key])
        assert strip(forced[key]) == want, key
        assert strip(pruned_off[key]) == want, key
        assert strip(tiny_c[key]) == want, key
        assert strip(scan_blk[key]) == want, key
        assert strip(bounds1[key]) == want, key
    # sanity: the planted clips actually recognized
    names = [s for s, *_ in strip(base["batch"])]
    assert names[:N_SONGS] == [f"track{i:06d}" for i in range(N_SONGS)]
