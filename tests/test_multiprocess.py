"""Real 2-process multi-host training test (DCN wiring, SURVEY §2.4).

Spawns two coordinated JAX processes (CPU backend, gloo collectives, 2
virtual devices each) that run the production Trainer on abc_minimal.
Exercises the full multi-host path: distributed.initialize, per-host
batch slicing, make_array_from_process_local_data assembly, replicated
cloud uploads, gradient all-reduce across processes, and process-0-only
checkpoint writes.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training(tmp_path):
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)
    worker = os.path.join(here, "_mp_worker.py")
    coordinator = f"localhost:{_free_port()}"

    env = dict(os.environ)
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append("--xla_force_host_platform_device_count=2")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_COORDINATOR_ADDRESS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", coordinator,
             str(tmp_path)],
            cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    # both workers ended with identical replicated params
    digests = [
        ln.split("digest=")[1]
        for out in outs
        for ln in out.splitlines()
        if "WORKER_OK" in ln
    ]
    assert len(digests) == 2
    assert digests[0] == digests[1]

    # only process 0 wrote the checkpoint artifacts (and they exist)
    assert os.path.isfile(tmp_path / "models" / "mp_model.npz")
    assert os.path.isfile(tmp_path / "models" / "mp_params.json")
