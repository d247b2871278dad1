"""ShardedCatalog end-to-end: ingest on one device, serve across the mesh."""

import numpy as np
import pytest

from shazam_tpu import SIA
from shazam_tpu.audio.synth import synth_corpus, synth_song
from shazam_tpu.match.prepare import prepare_query


N_SONGS = 5
DUR = 8.0


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("scorpus")
    files = [f for f, _ in synth_corpus(str(d), N_SONGS, duration_s=DUR, seed=31)]
    sia = SIA()
    sia.ingest_files(files, batch_size=4)
    return sia


@pytest.mark.parametrize("dense_limit", [1 << 30, 1])  # key_range / by_song
def test_sharded_catalog_serves(engine, dense_limit):
    from shazam_tpu.parallel.mesh import make_mesh
    from shazam_tpu.parallel.serving import ShardedCatalog

    mesh = make_mesh(8)
    sc = ShardedCatalog(engine.index, mesh=mesh, catalog=engine.catalog,
                        dense_limit_bytes=dense_limit)
    expected_regime = "key_range" if dense_limit > 1 else "by_song"
    assert sc.stats()["regime"] == expected_regime

    song = synth_song(2, duration_s=DUR, seed=31)
    clip = song[int(1.5 * 44100): int(6.5 * 44100)]
    fp = engine._fingerprint_channel(clip)
    q = prepare_query([fp])
    matched = sc.match(q, topn=3)
    assert matched.results
    top = matched.results[0]
    assert top["song_name"] == "track000002"

    # agreement with the single-device engine
    single = engine.recognize_samples([clip], topn=3)
    ref = single["results"][0]
    assert top["song_id"] == ref["song_id"]
    assert top["offset"] == ref["offset"]
    assert top["hashes_matched_in_input"] == ref["hashes_matched_in_input"]
    assert matched.total_matches == single["total_matches"]


def test_sharded_recognizer_serves_http(engine):
    """ShardedRecognizer is a drop-in serve engine: clips posted over
    HTTP match across the mesh with SIA-identical results."""
    import json
    import urllib.request

    from shazam_tpu.parallel.mesh import make_mesh
    from shazam_tpu.parallel.serving import ShardedCatalog, ShardedRecognizer
    from shazam_tpu.serve import RecognitionServer
    from tests.test_serve import _wav_bytes

    mesh = make_mesh(8)
    sc = ShardedCatalog(engine.index, mesh=mesh, catalog=engine.catalog,
                        config=engine.config)
    rec = ShardedRecognizer(sc)
    song = synth_song(2, duration_s=DUR, seed=31)
    clip = song[int(1.5 * 44100): int(6.5 * 44100)]

    direct = rec.recognize_samples([clip], topn=3)
    single = engine.recognize_samples([clip], topn=3)
    assert (direct["results"][0]["song_name"]
            == single["results"][0]["song_name"])
    assert direct["total_matches"] == single["total_matches"]

    srv = RecognitionServer(rec, port=0, max_batch=4, max_wait_ms=50.0,
                            request_timeout_s=600.0)
    srv.start_background()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/recognize?topn=3",
            data=_wav_bytes(clip), method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert (out["results"][0]["song_name"]
                == single["results"][0]["song_name"])
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["index_hashes"] == engine.index.n_hashes
    finally:
        srv.close()
