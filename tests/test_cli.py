"""CLI lifecycle: the argparse surface users actually type.

Drives ``cli.main(argv)`` in-process over one tmp ``--db`` through the
reference's workflows (synth corpus -> ingest -> stats -> recognize ->
fsck -> sanity -> bench sweep -> metadata import). Guards the flag
names and JSON output contract — unit suites import the API directly
and would miss an argparse regression.
"""

import json
import os

import numpy as np
import pytest

from shazam_tpu import cli


def _run(capsys, *argv):
    cli.main(list(argv))
    out = capsys.readouterr().out
    # first JSON document on stdout (recognize may append metadata lines)
    dec = json.JSONDecoder()
    obj, _ = dec.raw_decode(out[out.index("{"):])
    return obj


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cliws")
    return {"db": str(root / "db"), "songs": str(root / "songs"),
            "root": root}


def test_synth_and_ingest(workspace, capsys):
    out = _run(capsys, "synth", workspace["songs"], "-n", "3",
               "--seconds", "8")
    assert out["generated"] == 3
    out = _run(capsys, "--db", workspace["db"], "ingest", workspace["songs"])
    assert out["ingested"] == 3 and not out["overflowed"]
    assert os.path.exists(workspace["db"] + ".npz")
    # resume dedup: a second ingest skips everything
    out = _run(capsys, "--db", workspace["db"], "ingest", workspace["songs"])
    assert out["skipped"] == 3 and out["ingested"] == 0


def test_stats_and_fsck(workspace, capsys):
    csv = str(workspace["root"] / "hashes.csv")
    out = _run(capsys, "--db", workspace["db"], "stats", "--out", csv)
    assert out["n_songs"] == 3 and out["index_hashes"] > 1000
    assert os.path.exists(csv)
    out = _run(capsys, "--db", workspace["db"], "fsck")
    assert out["ok"] and not out["errors"]


def test_recognize_file(workspace, capsys):
    track = sorted(os.listdir(workspace["songs"]))[1]
    out = _run(capsys, "--db", workspace["db"], "recognize",
               os.path.join(workspace["songs"], track), "--limit", "5")
    assert out["results"][0]["song_name"] == os.path.splitext(track)[0]
    assert out["results"][0]["input_confidence"] > 0.5


def test_sanity_and_bench_sweep(workspace, capsys):
    out = _run(capsys, "--db", workspace["db"], "sanity", workspace["songs"])
    assert out["checked"] == 3 and not out.get("deleted")
    out_dir = str(workspace["root"] / "bench")
    out = _run(capsys, "--db", workspace["db"], "bench", workspace["songs"],
               "--limit-songs", "2", "--seconds", "4", "--seed", "7",
               "--out-dir", out_dir)
    assert out["n"] == 2 and out["accuracy"] == 1.0
    assert any(f.startswith("shazam_results") for f in os.listdir(out_dir))


def test_metadata_import(workspace, capsys):
    csv = workspace["root"] / "meta.csv"
    csv.write_text(  # FMA-style schema (reference metadatatable.sql)
        "track_id,track_title,artist_name\n1,Track Zero,Synth\n")
    out = _run(capsys, "--db", workspace["db"], "metadata", str(csv))
    assert out["imported"] == 1


def test_recognize_without_index_exits(tmp_path, capsys):
    with pytest.raises(SystemExit):
        cli.main(["--db", str(tmp_path / "nodb"), "recognize", "x.wav"])
