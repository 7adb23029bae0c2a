"""Multi-*process* smoke test (SURVEY.md §4.5): jax.distributed on
localhost with two processes, global mesh, cross-process psum.

The psum math itself is covered by the fake-device tests; this checks
the actual multi-process rendezvous + collective path end to end.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum():
    # NOTE: no pytest-timeout in this env; the real guard is the
    # communicate(timeout=240) below, which kills hung workers.
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")
    repo_root = os.path.dirname(os.path.dirname(worker))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            env=env, cwd=os.path.dirname(os.path.dirname(worker)),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        if p.returncode != 0:
            pytest.fail(
                f"worker failed rc={p.returncode}\n"
                f"stdout:\n{out.decode()}\nstderr:\n{err.decode()[-2000:]}"
            )
        outs.append(out.decode())
    lines = {}
    for out in outs:
        for ln in out.splitlines():
            if ln.startswith("COUNTERS"):
                _, pid, *vals = ln.split()
                lines[pid] = vals
    assert set(lines) == {"0", "1"}
    # replicated psum'd counters identical across processes
    assert lines["0"] == lines["1"]
    # 4 global devices x 8 frames each
    assert int(lines["0"][0]) == 32
