"""Two-process jax.distributed validation (VERDICT r4 #5).

All other multi-device evidence is single-process (8 virtual CPU devices in
one process).  This test spawns TWO OS processes of 4 virtual devices each,
initializes jax.distributed across a localhost coordinator, and runs the
sharded batch solver over the global 8-device mesh — so the scenario shards
and the BatchStats psum actually cross a process boundary (the DCN-analog
path of SURVEY.md §2.3; BASELINE.md multi-host scaling story).

Each worker asserts its local shards equal a single-process reference solve
(tests/_distributed_worker.py).
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_solve():
    port = _free_port()
    nprocs = 2
    env = dict(os.environ)
    existing = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + existing if existing else "")
    # the worker sets its own XLA_FLAGS (4 devices per process)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), str(nprocs)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for pid in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, (
            f"worker {pid} exited {rc}\n--- stdout ---\n{out}"
            f"\n--- stderr ---\n{err[-4000:]}")
        assert f"OK process {pid}" in out, out
