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
