"""Two-process DCN test: prove the multihost path in anger.

Spawns 2 subprocesses (tests/dcn_worker.py), each a 2-virtual-CPU-device
"host" joined through ``jax.distributed`` — the same topology as two pod
slices over DCN.  Asserts: process wiring, ``host_batch_slice``
partitioning, ``global_batch_from_local`` assembly (a cross-process sum
equals the host-side truth), and one replicated EE train step whose loss
agrees bit-for-bit across processes.

(Beyond-reference scope: the reference has no distributed code at all,
SURVEY.md §2 parallelism note.)
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dcn_train_step(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "dcn_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"worker{pid}.json"
        outs.append(out)
        env = dict(os.environ)
        # append, don't overwrite: the env's PYTHONPATH points at the
        # sitecustomize dir that registers the TPU backend
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        # each worker sets its own XLA flags / platform before importing jax
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, str(port), str(pid), str(out)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    results = []
    for p, out in zip(procs, outs):
        try:
            stdout, stderr = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
        with open(out) as f:
            results.append(json.load(f))

    r0, r1 = sorted(results, key=lambda r: r["process_index"])
    assert (r0["process_count"], r1["process_count"]) == (2, 2)
    assert r0["global_device_count"] == 4
    # host_batch_slice partitions the global batch without overlap
    assert r0["slice"] == [0, 4] and r1["slice"] == [4, 8]
    # the cross-process reduction over the assembled global array is exact
    assert r0["sum_err"] < 1e-4 and r1["sum_err"] < 1e-4
    # the replicated train step agrees across processes and is finite
    assert np.isfinite(r0["loss"])
    assert r0["loss"] == r1["loss"]
