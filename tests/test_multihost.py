"""REAL 2-process multi-host run (jax.distributed.initialize on localhost).

Everything multi-host elsewhere in the suite uses injected fakes or simulated
splits; here two actual OS processes rendezvous through a localhost
coordinator (4 virtual CPU devices each -> one global 8-device mesh), run a
sharded train step plus a test-mode metric union, and the result must equal
a single-process run of the identical global computation.  This is the first
execution of ``allgather_object``'s ``process_allgather`` path with
``jax.process_count() > 1``.

Reference capability: torch.distributed env:// rendezvous + NCCL metric
all-reduce (net_utils/utils.py:423-449, :319-327).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "smoke_multihost.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    # the workers self-provision their virtual CPU devices; drop the
    # conftest-inherited flags so counts do not double up
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_two_process_run_matches_single_process(tmp_path):
    env = _clean_env()
    ref_out = str(tmp_path / "ref.json")
    r = subprocess.run(
        [sys.executable, SCRIPT, "--out", ref_out, "--local-devices", "8"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    port = _free_port()
    out0 = str(tmp_path / "p0.json")
    workers = []
    for pid in range(2):
        workers.append(
            subprocess.Popen(
                [
                    sys.executable, SCRIPT,
                    "--coordinator", f"localhost:{port}",
                    "--num-processes", "2",
                    "--process-id", str(pid),
                    "--out", out0 if pid == 0 else str(tmp_path / "p1.json"),
                ],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    errs = []
    for w in workers:
        try:
            _, err = w.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for ww in workers:
                ww.kill()
            pytest.fail("multi-host worker timed out")
        errs.append(err)
        assert w.returncode == 0, err[-3000:]

    with open(ref_out) as f:
        ref = json.load(f)
    with open(out0) as f:
        got = json.load(f)

    assert ref["process_count"] == 1 and ref["device_count"] == 8
    assert got["process_count"] == 2 and got["device_count"] == 8

    # sharded-jit loss: the 2-process shard is CONTIGUOUS (process p holds
    # rows [p*per, (p+1)*per)), so the reassembled global batch matches the
    # single-process one row-for-row and the loss must reproduce it (tiny
    # reduction-order slack only)
    for k, v in ref["losses"].items():
        np.testing.assert_allclose(got["losses"][k], v, rtol=2e-5, atol=1e-6)

    # APCalculator union across processes == single-process accumulation
    assert got["mAP"] == pytest.approx(ref["mAP"], abs=1e-12)
    assert got["AR"] == pytest.approx(ref["AR"], abs=1e-12)
    # non-vacuous AP state (detections matched)
    assert ref["AR"] > 0

    # LossRecorder (sum, count) merge == single-process running means
    for k, v in ref["recorder_means"].items():
        assert got["recorder_means"][k] == pytest.approx(v, abs=1e-12)
