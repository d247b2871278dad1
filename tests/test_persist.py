"""Crash-safe snapshot writes (utils/persist.atomic_savez).

Contract: a snapshot save that dies mid-write must leave the previous
snapshot intact (serve --persist rewrites the ONLY copy after every
mutation), and a completed save is indistinguishable from np.savez*.
"""

import os

import numpy as np
import pytest

from shazam_tpu.index.store import FingerprintIndex, build_index
from shazam_tpu.utils import persist


def _tiny_index(seed: int) -> FingerprintIndex:
    rng = np.random.default_rng(seed)
    n = 500
    return build_index(
        [(s,
          rng.integers(0, 2**32, n, dtype=np.uint32),
          rng.integers(0, 2**32, n, dtype=np.uint32),
          rng.integers(0, 2**16, n, dtype=np.uint32),
          rng.integers(0, 2000, n, dtype=np.uint32)) for s in range(2)],
        n_songs=2)


def test_atomic_savez_roundtrip(tmp_path):
    idx = _tiny_index(0)
    path = str(tmp_path / "idx.npz")
    idx.save(path)
    back = FingerprintIndex.load(path)
    np.testing.assert_array_equal(back.key_hi, idx.key_hi)
    np.testing.assert_array_equal(back.offset, idx.offset)
    assert back.n_songs == idx.n_songs


def test_atomic_savez_appends_npz_like_numpy(tmp_path):
    idx = _tiny_index(1)
    prefix = str(tmp_path / "noext")
    idx.save(prefix)  # numpy string-path behavior: ".npz" appended
    assert os.path.exists(prefix + ".npz")
    FingerprintIndex.load(prefix + ".npz")


def test_failed_save_preserves_previous_snapshot(tmp_path, monkeypatch):
    """A writer that dies mid-stream must not tear the live snapshot."""
    idx_old = _tiny_index(2)
    path = str(tmp_path / "live.npz")
    idx_old.save(path)

    def torn_writer(fh, **arrays):
        fh.write(b"PK\x03\x04 truncated garbage")
        raise OSError("simulated crash mid-write")

    monkeypatch.setattr(persist.np, "savez_compressed", torn_writer)
    idx_new = _tiny_index(3)
    with pytest.raises(OSError, match="simulated crash"):
        idx_new.save(path)

    # the previous snapshot still loads bit-for-bit...
    back = FingerprintIndex.load(path)
    np.testing.assert_array_equal(back.key_hi, idx_old.key_hi)
    # ...and the aborted temp file was cleaned up
    assert [f for f in os.listdir(tmp_path) if f != "live.npz"] == []
