"""Device-side index merge (index/devmerge.py) vs the host merge oracle.

The device-resident index must be element-identical to the host
``merge_into`` chain on the valid prefix, across capacity growth,
stride repacks (max_offset growth) and the packed->unpacked layout
switch (catalog too large to pack).  Reference parity target: the
always-online MySQL inverted index (``mysql_database.py:46-59``).
"""

import numpy as np
import pytest

from shazam_tpu.index.store import FingerprintIndex, build_index, merge_into
from shazam_tpu.index.devmerge import DeviceIndex


def _random_index(rng, n, n_songs, max_offset, seed_songs=None):
    """A sorted FingerprintIndex of n random rows."""
    hi = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    ex = rng.integers(0, 1 << 16, n, dtype=np.uint32)
    sid = rng.integers(0, max(n_songs, 1), n, dtype=np.uint32)
    off = rng.integers(0, max_offset + 1, n, dtype=np.uint32)
    order = np.lexsort((off, sid, ex, lo, hi))
    return FingerprintIndex(
        hi[order], lo[order], ex[order], sid[order], off[order],
        n_songs=n_songs, max_offset=int(off.max()) if n else 0,
    )


def _assert_same(a: FingerprintIndex, b: FingerprintIndex):
    for name in ("key_hi", "key_lo", "key_ex", "song_id", "offset"):
        np.testing.assert_array_equal(
            getattr(a, name), getattr(b, name), err_msg=name
        )
    assert a.n_songs == b.n_songs
    assert a.max_offset == b.max_offset


def test_device_merge_matches_host_packed():
    rng = np.random.default_rng(0)
    host = _random_index(rng, 5000, n_songs=40, max_offset=3000)
    dev = DeviceIndex.from_host(host)
    assert dev.stride  # packed layout
    for k in range(4):
        add = _random_index(rng, 700 + 37 * k, n_songs=40, max_offset=3000)
        host = merge_into(host, add)
        dev.merge(add)
        assert dev.n_valid == host.n_hashes
    _assert_same(dev.to_host(), host)


def test_device_merge_with_key_collisions():
    """Cross-run equal (hi, lo) keys exercise the tie-break columns."""
    rng = np.random.default_rng(1)
    # tiny key space => many exact collisions across runs
    def small(n, n_songs):
        hi = rng.integers(0, 4, n, dtype=np.uint32)
        lo = rng.integers(0, 4, n, dtype=np.uint32)
        ex = rng.integers(0, 3, n, dtype=np.uint32)
        sid = rng.integers(0, n_songs, n, dtype=np.uint32)
        off = rng.integers(0, 50, n, dtype=np.uint32)
        order = np.lexsort((off, sid, ex, lo, hi))
        return FingerprintIndex(
            hi[order], lo[order], ex[order], sid[order], off[order],
            n_songs=n_songs, max_offset=int(off.max()),
        )

    host = small(800, 6)
    dev = DeviceIndex.from_host(host)
    for _ in range(3):
        add = small(300, 6)
        host = merge_into(host, add)
        dev.merge(add)
    _assert_same(dev.to_host(), host)


def test_capacity_growth_and_empty_start():
    rng = np.random.default_rng(2)
    dev = DeviceIndex.from_host(build_index([], n_songs=0))
    host = build_index([], n_songs=0)
    cap0 = dev.cols[0].shape[0]
    # push well past the minimum capacity to force _grow
    for k in range(3):
        add = _random_index(rng, 40_000, n_songs=10, max_offset=1000)
        host = merge_into(host, add)
        dev.merge(add)
    assert dev.cols[0].shape[0] > cap0
    _assert_same(dev.to_host(), host)


def test_stride_repack_on_max_offset_growth():
    rng = np.random.default_rng(3)
    host = _random_index(rng, 3000, n_songs=8, max_offset=1000)
    dev = DeviceIndex.from_host(host)
    stride0 = dev.stride
    # longer songs push max_offset past the old power-of-two stride
    add = _random_index(rng, 1500, n_songs=8, max_offset=50_000)
    host = merge_into(host, add)
    dev.merge(add)
    assert dev.stride > stride0
    _assert_same(dev.to_host(), host)


def test_layout_switch_to_unpacked_at_huge_catalog():
    rng = np.random.default_rng(4)
    host = _random_index(rng, 2000, n_songs=100, max_offset=4000)
    dev = DeviceIndex.from_host(host)
    assert dev.stride != 0
    # 2M songs * stride 4096 > 2^32: packing impossible -> 5-column layout
    add = _random_index(rng, 1000, n_songs=2_000_000, max_offset=4000)
    host = merge_into(host, add)
    dev.merge(add)
    assert dev.stride == 0 and len(dev.cols) == 5
    # and further merges stay unpacked + correct
    add2 = _random_index(rng, 1000, n_songs=2_000_000, max_offset=4000)
    host = merge_into(host, add2)
    dev.merge(add2)
    _assert_same(dev.to_host(), host)


def test_sia_device_resident_end_to_end():
    """ingest + recognize with device_resident=True == default mode."""
    from shazam_tpu.api import SIA
    from shazam_tpu.audio.synth import synth_song

    songs = [(f"s{i}", synth_song(i, duration_s=4.0)) for i in range(6)]
    ref = SIA()
    ref.ingest_arrays(songs, batch_size=4)
    dut = SIA(device_resident=True)
    # two batches => at least one real device merge beyond from_host
    dut.ingest_arrays(songs[:3], batch_size=4)
    dut.ingest_arrays(songs[3:], batch_size=4)
    assert dut._dev_store is not None
    assert dut._live_n_hashes() == ref.index.n_hashes

    clip = np.asarray(songs[2][1])[: 2 * 44100]
    out_ref = ref.recognize_samples([clip])
    out_dut = dut.recognize_samples([clip])
    assert out_dut["results"][0]["song_name"] == "s2"
    assert (
        out_dut["results"][0]["hashes_matched_in_input"]
        == out_ref["results"][0]["hashes_matched_in_input"]
    )
    # host sync on .index access gives the identical index
    _assert_same(dut.index, ref.index)
