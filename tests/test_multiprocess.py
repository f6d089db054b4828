"""2-process SPMD training equivalence (the multi-host DP path).

Proves the multi-host input pipeline is correct: two jax.distributed
processes, each holding half the global batch, produce exactly the same
loss as a single process holding all of it (shard_batch assembles local
rows via jax.make_array_from_process_local_data — see
notsofar_tpu/parallel/mesh.py). Replaces the reference's torchrun DDP
verification story (/root/reference/css/training/train.py:115-123), which
has no single-machine test at all.
"""
import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "mp_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(devices: int) -> dict:
    # minimal env: keeps the axon sitecustomize from claiming the TPU
    return {
        "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": REPO,
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={devices}",
        "JAX_PLATFORMS": "cpu",
    }


def _loss(output: str) -> float:
    m = re.search(r"LOSS (-?[\d.]+)", output)
    assert m, f"no LOSS line in output:\n{output[-3000:]}"
    return float(m.group(1))


@pytest.mark.slow
def test_two_process_step_matches_single_process():
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, CHILD, str(i), str(port)], env=_env(4),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"rc={p.returncode}\n{err[-4000:]}"
        outs.append(out)
    single = subprocess.run(
        [sys.executable, CHILD, "single", str(port)], env=_env(8),
        capture_output=True, text=True, cwd=REPO, timeout=600)
    assert single.returncode == 0, single.stderr[-4000:]

    l0, l1 = _loss(outs[0]), _loss(outs[1])
    ls = _loss(single.stdout)
    # the two processes see the same replicated global loss
    assert l0 == pytest.approx(l1, rel=0, abs=0.0)
    # and it matches the single-process global-batch loss (same reduction
    # tree up to float32 summation-order noise)
    assert l0 == pytest.approx(ls, rel=1e-5)
