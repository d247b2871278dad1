"""On-device ingest (api.ingest_device_batch + index/devingest.py).

The device path — fingerprints -> global 4-key sort -> neighbor dedup
-> device merge — must be element-identical to the host ingest path
(download, np.unique per song, lexsort, upload).  Runs on the CPU
backend (same XLA fingerprint path on both sides).
"""

import numpy as np
import pytest


def _songs(n, secs=3.0):
    from shazam_tpu.audio.synth import synth_song

    return [(f"s{i}", synth_song(i, duration_s=secs, seed=11))
            for i in range(n)]


def _pad_batch(arrs):
    import jax.numpy as jnp

    blen = 1 << 18
    mat = np.zeros((len(arrs), blen), np.float32)
    nv = []
    for i, a in enumerate(arrs):
        mat[i, : len(a)] = a
        nv.append(len(a))
    return jnp.asarray(mat), nv


def test_device_ingest_matches_host_ingest():
    from shazam_tpu.api import SIA

    songs = _songs(5)

    host = SIA()
    host.ingest_arrays(songs)

    dev = SIA(device_resident=True)
    batch, nv = _pad_batch([s for _n, s in songs])
    stats = dev.ingest_device_batch([n for n, _s in songs], batch, nv)
    assert stats["ingested"] == 5
    assert stats["overflowed"] == []

    hix, dix = host.index, dev.index  # dev: device->host sync on access
    assert dix.n_hashes == hix.n_hashes
    for a, b in ((hix.key_hi, dix.key_hi), (hix.key_lo, dix.key_lo),
                 (hix.key_ex, dix.key_ex), (hix.song_id, dix.song_id),
                 (hix.offset, dix.offset)):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    # catalog hash totals match the host path's per-song counts
    h_totals = sorted(host.catalog.song_hashes_by_id().values())
    d_totals = sorted(dev.catalog.song_hashes_by_id().values())
    assert h_totals == d_totals

    # and recognition agrees
    clip = songs[2][1][22050 : 22050 + 2 * 44100]
    out_h = host.recognize_samples([clip])
    out_d = dev.recognize_samples([clip])
    assert out_h["results"][0]["song_name"] == "s2"
    assert out_d["results"][0]["song_name"] == "s2"
    assert (out_h["results"][0]["hashes_matched_in_input"]
            == out_d["results"][0]["hashes_matched_in_input"])


def test_device_ingest_channel_union():
    """Two rows with one name = channels of one song; identical channels
    must dedup to the single-channel hash set (reference set-union,
    __init__.py:254-266)."""
    from shazam_tpu.api import SIA

    _, s0 = _songs(1)[0]

    single = SIA(device_resident=True)
    b1, nv1 = _pad_batch([s0])
    single.ingest_device_batch(["dup"], b1, nv1)

    double = SIA(device_resident=True)
    b2, nv2 = _pad_batch([s0, s0])
    stats = double.ingest_device_batch(["dup", "dup"], b2, nv2)
    assert stats["ingested"] == 1

    a, b = single.index, double.index
    assert a.n_hashes == b.n_hashes
    assert np.array_equal(np.asarray(a.key_hi), np.asarray(b.key_hi))
    assert (double.catalog.song_hashes_by_id()
            == single.catalog.song_hashes_by_id())


def test_device_ingest_resume_and_incremental():
    from shazam_tpu.api import SIA

    songs = _songs(4)
    sia = SIA(device_resident=True)
    batch, nv = _pad_batch([s for _n, s in songs])

    first = sia.ingest_device_batch([n for n, _s in songs], batch, nv)
    again = sia.ingest_device_batch([n for n, _s in songs], batch, nv)
    assert again["skipped"] == 4 and again["ingested"] == 0

    # incremental second batch merges on device into the same index
    more = _songs(7)[4:]
    b2, nv2 = _pad_batch([s for _n, s in more])
    second = sia.ingest_device_batch([n for n, _s in more], b2, nv2)
    assert second["ingested"] == 3
    assert sia._live_n_hashes() == first["hashes"] + second["hashes"]

    ref = SIA()
    ref.ingest_arrays(_songs(7))
    assert np.array_equal(np.asarray(ref.index.key_hi),
                          np.asarray(sia.index.key_hi))


def test_device_ingest_overflow_retry():
    """Tiny per-song capacity: the 2x retry run kicks in; songs still
    flagged after the retry are NOT ingested (a flagged fused/XLA
    n_peaks is a sentinel and the hash lanes can't be trusted) — they
    stay unfingerprinted and are reported, never silently merged."""
    from shazam_tpu.api import SIA

    songs = _songs(2)
    sia = SIA(device_resident=True)
    batch, nv = _pad_batch([s for _n, s in songs])
    stats = sia.ingest_device_batch(
        [n for n, _s in songs], batch, nv, song_peak_capacity=64)
    assert stats.get("fallbacks", 0) == 2
    assert stats["merges"] == 2          # main (over rows masked) + retry
    assert set(stats["overflowed"]) == {"s0", "s1"}  # 3 s songs >> 128 peaks
    assert stats["ingested"] == 0        # dropped, reported, no garbage
    assert sia._live_n_hashes() == 0
    assert sia.catalog.get_songs() == []  # never marked fingerprinted

    # a sufficient capacity on the SAME object then ingests them cleanly
    stats2 = sia.ingest_device_batch(
        [n for n, _s in songs], batch, nv, song_peak_capacity=4096)
    assert stats2["ingested"] == 2 and stats2["overflowed"] == []


def test_device_ingest_requires_device_resident():
    from shazam_tpu.api import SIA

    sia = SIA()
    with pytest.raises(ValueError):
        sia.ingest_device_batch(["x"], np.zeros((1, 8), np.float32), [8])


def test_defer_sort_matches_scatter_merge():
    """Bulk-ingest mode (append_run + one finalize sort) must produce an
    element-identical index to per-batch scatter merges."""
    from shazam_tpu.api import SIA

    songs = _songs(6)

    a = SIA(device_resident=True)
    b = SIA(device_resident=True, device_reserve_hashes=1 << 17)
    for base in (0, 3):
        chunk = songs[base : base + 3]
        batch, nv = _pad_batch([s for _n, s in chunk])
        names = [n for n, _s in chunk]
        a.ingest_device_batch(names, batch, nv)
        b.ingest_device_batch(names, batch, nv, defer_sort=True)

    assert b._ensure_dev_store()._unsorted       # still pending
    ia, ib = a.index, b.index                    # .index finalizes b
    assert ia.n_hashes == ib.n_hashes
    for x, y in ((ia.key_hi, ib.key_hi), (ia.key_lo, ib.key_lo),
                 (ia.key_ex, ib.key_ex), (ia.song_id, ib.song_id),
                 (ia.offset, ib.offset)):
        assert np.array_equal(np.asarray(x), np.asarray(y))

    clip = songs[4][1][22050 : 22050 + 2 * 44100]
    out = b.recognize_samples([clip])
    assert out["results"][0]["song_name"] == "s4"
