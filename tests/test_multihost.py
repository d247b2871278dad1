"""Multi-host (DCN) catalog spanning: 2 localhost processes x 4 virtual
CPU devices run one song-sharded query end to end via jax.distributed
(SURVEY.md §5 'Distributed communication backend'; the knob the reference
pinned to 1, elastic_database.py:42,80)."""

import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(extra_args, ok_token, timeout=280, attempts=3):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)       # workers set their own device count
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(HERE, "multihost_worker.py")
    for attempt in range(attempts):
        port = _free_port()           # fresh rendezvous per attempt
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(pid), str(port)] + extra_args,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env, cwd=REPO,
            )
            for pid in range(2)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
        # Gloo/jax.distributed rendezvous can time out (DEADLINE_EXCEEDED
        # on the KV-store init, a hard ~30 s inside the runtime) when the
        # box is saturated — e.g. 4-way xdist running the rest of the
        # suite (round-4 verdict: passes solo, flaked in the full run).
        # That's load, not product breakage: retry on a fresh port, and
        # only for this signature so real failures still fail fast.
        flaky = any(p.returncode != 0
                    and ("DEADLINE_EXCEEDED" in out or "Timed out" in out
                         or "deadline" in out.lower())
                    for p, out in zip(procs, outs))
        if flaky and attempt + 1 < attempts:
            continue
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
            assert ok_token in out, out[-3000:]
        return outs


def test_two_process_spanned_query():
    _run_workers([], "MULTIHOST_OK")


def test_two_process_distributed_ingest(tmp_path):
    """Each process fingerprints only its own shards' songs; the spanned
    query and the per-process shard-file round trip both succeed."""
    outs = _run_workers(["ingest", str(tmp_path)], "INGEST_OK", timeout=420)
    # the two processes fingerprinted disjoint, complementary song sets
    import re

    sets = [set(map(int, re.search(r"owned=\[([\d, ]+)\]", o).group(1)
                    .split(", "))) for o in outs]
    assert sets[0] & sets[1] == set()
    assert sets[0] | sets[1] == set(range(8))
