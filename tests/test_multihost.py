"""Multi-host (DCN) path: a REAL 2-process jax.distributed run.

The reference is single-process/single-GPU; multi-host is a new capability
(SURVEY.md §2h).  This test spawns two OS processes, each owning 4 virtual
CPU devices, joined by jax.distributed into one 8-device mesh; the sharded
renderer splits pixel rows across both processes and every process asserts
its shards match a locally-computed single-device render bit-exactly.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_render(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    # the workers configure their own virtual device counts
    env.pop("XLA_FLAGS", None)
    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"mh_{pid}.npz"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, str(pid), "2", str(port), str(out)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = []
    codes = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
        codes.append(p.returncode)
    assert codes == [0, 0], "worker logs:\n" + "\n----\n".join(logs)
    for pid, out in enumerate(outs):
        data = np.load(out)
        assert bool(data["ok"]), f"proc {pid} shard mismatch"
        assert int(data["checked"]) == 4
