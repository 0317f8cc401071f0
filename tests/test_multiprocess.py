"""REAL multi-process evidence for the multi-host layer (VERDICT r3 #5).

Launches 2 OS processes x 4 virtual CPU devices each; the worker
(scripts/multiprocess_worker.py) initializes jax.distributed, builds the
global 8-device mesh with parallel/hosts.py, runs the shard_map halo PCG
solve with cross-process collectives, asserts shard-wise equality with a
single-device solve, and round-trips an orbax sharded checkpoint. This is
the closest a CPU CI box gets to a pod run; the same worker structure is
what scripts/run_pod.sh launches per host.
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_halo_solve_and_checkpoint(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "scripts", "multiprocess_worker.py")
    port = _free_port()
    nproc = 2
    procs = []
    env = dict(os.environ)
    # the worker sets its own XLA_FLAGS/JAX_PLATFORMS; drop the test
    # session's forced device count so the two don't concatenate oddly
    env.pop("XLA_FLAGS", None)
    for pid in range(nproc):
        out = tmp_path / f"verdict_{pid}.json"
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, worker,
                    "--coordinator", f"127.0.0.1:{port}",
                    "--num-processes", str(nproc),
                    "--process-id", str(pid),
                    "--local-devices", "4",
                    "--out", str(out),
                    "--ckpt-dir", str(tmp_path / "ckpt"),
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess worker timed out")
        logs.append(stdout.decode(errors="replace"))
    for pid, p in enumerate(procs):
        assert p.returncode == 0, f"process {pid} failed:\n{logs[pid][-4000:]}"
    verdicts = [
        json.loads((tmp_path / f"verdict_{pid}.json").read_text())
        for pid in range(nproc)
    ]
    for v in verdicts:
        assert v["ndev"] == 8
        assert v["solve_ok"], v
        assert v["ckpt_ok"], v
        assert v["abs_iter_gap"] <= 3, v
    # both processes ran the same SPMD program: identical iteration counts
    assert verdicts[0]["iterations"] == verdicts[1]["iterations"]
