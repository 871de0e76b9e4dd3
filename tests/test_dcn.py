"""Multi-host (DCN) dryrun: two OS processes, one global mesh, one
data-parallel train step (pcc_tpu/parallel/dcn.py). Both workers must
report the same finite loss — the gradient all-reduce spans processes.

The workers run in subprocesses because jax.distributed.initialize is
process-global; the test process itself never initializes it.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dcn_train_step():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "pcc_tpu.parallel.dcn",
             "--process_id", str(i), "--num_processes", "2",
             "--coordinator", f"127.0.0.1:{port}"],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"

    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("dcn worker")][-1]
        losses.append(float(line.split("loss=")[1]))
    assert np.isfinite(losses).all()
    # the psum makes the loss identical on every host
    assert abs(losses[0] - losses[1]) < 1e-6, losses
