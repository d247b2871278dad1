"""Integrity checker (tools/fsck.py) — healthy stores pass, every
planted corruption class is detected.

Reference parity: the hand-run integrity SQL
(``fingerprints_queries.sql:1-6``, ``songs_queries.sql:1-11``) and the
``DELETE_UNFINGERPRINTED`` startup purge, promoted to one command.
"""

import numpy as np
import pytest

from shazam_tpu import SIA
from shazam_tpu.audio.synth import synth_song
from shazam_tpu.tools.fsck import check_integrity

N_SONGS = 4
DUR = 8.0


def _songs():
    return [(f"track{i:06d}", synth_song(i, duration_s=DUR, seed=11))
            for i in range(N_SONGS)]


@pytest.fixture()
def host_sia():
    sia = SIA()
    stats = sia.ingest_arrays(_songs(), batch_size=4)
    assert stats["ingested"] == N_SONGS
    return sia


def test_healthy_host_index_passes(host_sia):
    report = check_integrity(host_sia)
    assert report["ok"], report
    assert not report["errors"]
    assert report["checks"]["index_hashes"] == report["checks"]["catalog_hashes"]
    assert report["checks"]["songs_reconciled"] == N_SONGS


def test_unsorted_keys_detected(host_sia):
    ix = host_sia.index
    # swap the first and last rows of the key columns
    for name in ("key_hi", "key_lo", "key_ex"):
        col = getattr(ix, name)
        col[0], col[-1] = col[-1].copy(), col[0].copy()
    report = check_integrity(host_sia, deep=False)
    assert not report["ok"]
    assert any("not sorted" in e for e in report["errors"])


def test_row_count_mismatch_detected(host_sia):
    # catalog claims more hashes than the index holds for song 0
    sid, want = min(host_sia.catalog.song_hashes_by_id().items())
    host_sia.catalog.update_song_hashes(sid, want + 17)
    report = check_integrity(host_sia)
    assert not report["ok"]
    assert any("disagrees with the catalog" in e or "catalog records" in e
               for e in report["errors"])


def test_out_of_range_song_id_detected(host_sia):
    ix = host_sia.index
    ix.song_id[0] = ix.n_songs + 5
    report = check_integrity(host_sia, deep=False)
    assert not report["ok"]
    assert any("song_id max" in e for e in report["errors"])


def test_catalog_warnings(host_sia):
    conn = host_sia.catalog.conn
    # an unfingerprinted leftover + a duplicate SHA-1
    conn.execute(
        "INSERT INTO songs (song_name, file_sha1, fingerprinted)"
        " VALUES ('partial', 'DEAD', 0)")
    sha = conn.execute(
        "SELECT file_sha1 FROM songs WHERE fingerprinted = 1"
        " LIMIT 1").fetchone()[0]
    conn.execute(
        "INSERT INTO songs (song_name, file_sha1, fingerprinted,"
        " total_hashes) VALUES ('dupe', ?, 1, 0)", (sha,))
    conn.commit()
    report = check_integrity(host_sia)
    assert any("unfingerprinted" in w for w in report["warnings"])
    assert any("duplicate file SHA-1" in w for w in report["warnings"])
    assert any("zero recorded hashes" in w for w in report["warnings"])


def test_healthy_device_store_passes():
    sia = SIA(device_resident=True)
    sia.ingest_arrays(_songs(), batch_size=4)
    report = check_integrity(sia)
    assert report["ok"], report
    assert report["checks"]["store"] == "DeviceIndex"
    assert report["checks"]["index_hashes"] == report["checks"]["catalog_hashes"]
    assert report["checks"]["spans_checked"] >= 1


def test_healthy_spanned_store_passes():
    sia = SIA(device_resident=True, device_span_rows=1 << 16)
    sia.ingest_arrays(_songs(), batch_size=4)
    report = check_integrity(sia)
    assert report["ok"], report
    assert report["checks"]["store"] == "SpannedDeviceStore"


def test_deferred_append_is_warning_not_error():
    sia = SIA(device_resident=True)
    sia.ingest_arrays(_songs()[:2], batch_size=2)
    store = sia._ensure_dev_store()
    # plant an un-finalized deferred-sort append
    rng = np.random.default_rng(3)
    n_add = 256
    cols = tuple(
        np.sort(rng.integers(0, 1 << 20, n_add).astype(np.uint32))
        for _ in range(3)) + (
        rng.integers(0, store.n_songs * max(store.stride, 1),
                     n_add).astype(np.uint32),)
    import jax.numpy as jnp
    store.append_run(tuple(jnp.asarray(c) for c in cols), n_add,
                     store.n_songs, store.max_offset)
    report = check_integrity(sia)
    # the planted rows break the catalog total, but sortedness must be a
    # WARNING for the pending span, not an error
    assert any("deferred-sort" in w for w in report["warnings"])
    assert not any("not sorted" in e for e in report["errors"])


def test_device_mismatch_vs_catalog_detected():
    sia = SIA(device_resident=True)
    sia.ingest_arrays(_songs()[:2], batch_size=2)
    sid, want = min(sia.catalog.song_hashes_by_id().items())
    sia.catalog.update_song_hashes(sid, want + 3)
    report = check_integrity(sia)
    assert not report["ok"]
    assert any("catalog records" in e for e in report["errors"])
