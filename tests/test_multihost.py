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


def test_two_process_spanned_query():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)       # workers set their own device count
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(HERE, "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out, out[-3000:]
