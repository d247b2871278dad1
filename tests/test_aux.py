"""Aux subsystems: backend registry, metadata import, profiling utils."""

import csv
import os

import numpy as np
import pytest


def test_backend_registry(tmp_path):
    from shazam_tpu.index.registry import get_backend, register_backend

    mem = get_backend("memory")("")
    assert mem.index.n_hashes == 0

    local = get_backend("local")(str(tmp_path / "cat"))
    assert os.path.exists(str(tmp_path / "cat.sqlite"))

    with pytest.raises(TypeError, match="Unsupported backend"):
        get_backend("postgres")  # the reference's dangling backend

    register_backend("custom", "shazam_tpu.index.registry", "_memory_backend")
    assert get_backend("custom")("").index.n_hashes == 0


def test_metadata_csv_import(tmp_path):
    from shazam_tpu.index.catalog import SongCatalog

    p = str(tmp_path / "md.csv")
    with open(p, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=[
            "track_id", "track_title", "artist_name", "album_title",
            "track_genres", "track_url", "artist_website", "ignored_col",
        ])
        w.writeheader()
        w.writerow({"track_id": "2", "track_title": "Food",
                    "artist_name": "AWOL", "album_title": "AWOL - A Way Of Life",
                    "track_genres": "Hip-Hop", "track_url": "http://x",
                    "artist_website": "http://y", "ignored_col": "z"})
        w.writerow({"track_id": "bad", "track_title": "nope"})

    cat = SongCatalog()
    assert cat.import_metadata_csv(p) == 1
    md = cat.get_metadata(2)
    assert md["track_title"] == "Food"
    assert md["artist_name"] == "AWOL"
    assert cat.get_metadata(99) is None


def test_stage_timer():
    from shazam_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("fingerprint_times"):
        pass
    with t.stage("query_time"):
        pass
    row = t.as_row()
    assert set(row) == {"fingerprint_times", "query_time", "total_time"}
    assert row["total_time"] >= 0


def test_device_trace_noop(tmp_path):
    from shazam_tpu.utils.profiling import device_trace
    import jax.numpy as jnp

    with device_trace(None):
        pass
    with device_trace(str(tmp_path / "trace")):
        jnp.ones(8).sum().block_until_ready()


def test_config_json_roundtrip(tmp_path):
    from shazam_tpu.config import FingerprintConfig

    cfg = FingerprintConfig(fan_value=7, amp_min=12.0, topn=5)
    p = tmp_path / "cfg.json"
    p.write_text(cfg.to_json())
    back = FingerprintConfig.from_json(p.read_text())
    assert back == cfg
    assert back.hop == 2048 and back.n_freqs == 2049
    assert back.frames_to_seconds(43) == round(43 / 44100 * 4096 * 0.5, 5)


def test_config_validation():
    import pytest as _pytest
    from shazam_tpu.config import FingerprintConfig

    with _pytest.raises(ValueError):
        FingerprintConfig(window_size=1000)
    with _pytest.raises(ValueError):
        FingerprintConfig(overlap_ratio=1.5)
