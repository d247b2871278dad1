"""Bench harness + report artifacts + aux tools + streaming + early exit."""

import csv
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from shazam_tpu import SIA
from shazam_tpu.audio.synth import synth_corpus, synth_song


N_SONGS = 4
DUR = 10.0


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("hcorpus")
    return [f for f, _ in synth_corpus(str(d), N_SONGS, duration_s=DUR, seed=21)]


@pytest.fixture(scope="module")
def engine(corpus):
    sia = SIA()
    sia.ingest_files(corpus, batch_size=4)
    return sia


def test_sweep_clean(engine, corpus, tmp_path):
    from shazam_tpu.bench.harness import BenchConfig, run_recognition_sweep

    cfg = BenchConfig(record_seconds=5.0, out_dir=str(tmp_path), seed=3)
    summary = run_recognition_sweep(engine, corpus, cfg)
    assert summary["n"] == N_SONGS
    assert summary["accuracy"] == 1.0
    # final checkpoint artifacts exist with reference columns
    arts = summary["artifacts"][-1]
    with open(arts["results"]) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == N_SONGS
    assert set(rows[0].keys()) == {
        "file_name_played", "file_name_result", "song_start_time", "correct",
        "fingerprint_times", "query_time", "align_time", "total_time",
        "final_results",
    }
    assert all(r["correct"] == "1" for r in rows)
    for kind in ("cm", "cmsk", "crsk", "assk"):
        assert os.path.exists(arts[kind])
    assert float(arts["accuracy"]) == 1.0


def test_sweep_awgn_noise(engine, corpus, tmp_path):
    from shazam_tpu.bench.harness import BenchConfig, run_recognition_sweep

    cfg = BenchConfig(record_seconds=5.0, add_noise=True, snr_db=0.0,
                      noise_kind="awgn", out_dir=str(tmp_path), seed=4,
                      checkpoints=False)
    summary = run_recognition_sweep(engine, corpus, cfg)
    assert summary["accuracy"] >= 0.75  # 0 dB SNR floor (reference: 0.81)
    name = os.path.basename(summary["artifacts"][-1]["results"])
    assert "0SNR" in name  # SNR encoded in filename like the reference


def test_early_exit_recognition(engine, corpus):
    song = synth_song(1, duration_s=DUR, seed=21)
    clip = song[int(2.0 * 44100): int(7.0 * 44100)]
    full = engine.recognize_samples([clip])
    fast = engine.recognize_samples([clip], early_exit=True)
    assert fast["results"][0]["song_name"] == full["results"][0]["song_name"]
    assert fast["results"][0]["song_name"] == "track000001"


def test_stream_recognizer(engine):
    from shazam_tpu.stream import StreamRecognizer, CHUNK

    song = synth_song(2, duration_s=DUR, seed=21)
    clip = song[int(1.0 * 44100): int(6.0 * 44100)]
    # interleave into stereo chunks like a mic source would deliver
    stereo = np.empty(2 * len(clip), np.int16)
    stereo[0::2] = clip
    stereo[1::2] = clip
    rec = StreamRecognizer(engine, channels=2, window_seconds=6.0)
    for base in range(0, len(stereo) - 2 * CHUNK, 2 * CHUNK):
        rec.feed(stereo[base: base + 2 * CHUNK])
    assert rec.buffered_seconds > 4.0
    out = rec.recognize()
    assert out["results"][0]["song_name"] == "track000002"


def test_mic_unavailable_is_clear():
    from shazam_tpu.stream import mic_chunks

    with pytest.raises(RuntimeError, match="pyaudio"):
        list(mic_chunks(0.1))


def test_sanity_checker(tmp_path, corpus):
    from shazam_tpu.tools.sanity import check_corpus_sanity
    from shazam_tpu.audio.io import write_wav

    short = str(tmp_path / "short.wav")
    write_wav(short, np.zeros(4410, np.int16), 44100)
    bogus = str(tmp_path / "bogus.wav")
    with open(bogus, "wb") as fh:
        fh.write(b"not a wav at all")
    log = str(tmp_path / "songs_deleted.csv")
    out = check_corpus_sanity(corpus + [short, bogus], record_seconds=5.0,
                              log_path=log)
    assert out["checked"] == len(corpus) + 2
    assert out["bad"] == 2
    reasons = {b["file"]: b["reason"] for b in out["bad_files"]}
    assert reasons[short].startswith("too_short")
    assert reasons[bogus].startswith("decode_error")
    assert os.path.exists(log)


def test_stats_dump(engine, tmp_path):
    from shazam_tpu.tools.stats import dump_song_hash_stats

    out = dump_song_hash_stats(engine.catalog, str(tmp_path / "sh.csv"))
    assert out["n_songs"] == N_SONGS
    assert out["n_hashes"] > 0
    with open(out["csv"]) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == N_SONGS


def test_plot_tool(tmp_path):
    from shazam_tpu.tools.plot import plot_constellation

    clip = synth_song(0, duration_s=3.0, seed=21)
    out = plot_constellation(clip, str(tmp_path / "c.png"))
    assert os.path.getsize(out) > 10_000


def test_cli_end_to_end(tmp_path):
    """ingest -> recognize -> stats -> sanity through the real CLI."""
    corpus_dir = tmp_path / "songs"
    synth_corpus(str(corpus_dir), 3, duration_s=8.0, seed=77)
    db = str(tmp_path / "cat")
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    def run(*args):
        r = subprocess.run(
            [sys.executable, "-m", "shazam_tpu.cli", "--db", db, *args],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert r.returncode == 0, r.stderr
        return r.stdout

    out = run("ingest", str(corpus_dir))
    assert json.loads(out.splitlines()[-1])["ingested"] == 3
    out = run("recognize", str(corpus_dir / "track000001.wav"), "--limit", "5")
    data = json.loads("\n".join(out.splitlines()))
    assert data["results"][0]["song_name"] == "track000001"
    out = run("stats", "--out", str(tmp_path / "stats.csv"))
    assert json.loads(out)["n_songs"] == 3
    out = run("sanity", str(corpus_dir), "--seconds", "5")
    assert json.loads(out)["bad"] == 0


def test_sweep_file_noise(engine, corpus, tmp_path):
    """Noise-from-recording mode (the reference's city-traffic mp3 path,
    recognizer_test.py:426-435) with a synthetic noise file."""
    from shazam_tpu.audio.io import write_wav
    from shazam_tpu.bench.harness import BenchConfig, run_recognition_sweep

    rng = np.random.default_rng(8)
    noise = (rng.normal(0, 0.3, 44100 * 20) * 32767).astype(np.int16)
    noise_path = str(tmp_path / "noise.wav")
    write_wav(noise_path, noise, 44100)

    cfg = BenchConfig(record_seconds=5.0, add_noise=True, snr_db=0.0,
                      noise_kind="file", noise_file=noise_path,
                      out_dir=str(tmp_path), seed=6, checkpoints=False)
    summary = run_recognition_sweep(engine, corpus, cfg)
    assert summary["accuracy"] >= 0.75
    assert "0SNR" in os.path.basename(summary["artifacts"][-1]["results"])
