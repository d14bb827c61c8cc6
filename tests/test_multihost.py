"""Execute the multi-process branch of parallel/mesh.py for real.

VERDICT r2 item 3: `put_global_batch`'s `jax.make_array_from_process_local_data`
path, `_local_rows`, and `put_replicated_global`'s multi-process branch had
never executed anywhere (every other test/dryrun is single-process). This
spawns TWO actual processes with `jax.distributed.initialize` on the CPU
platform (4 virtual devices each -> one 8-device global mesh), runs two
SPMD optimizer steps, and checks both processes' losses agree with each
other and with a single-process numpy replay of the same computation.
"""
import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parents[1]
WORKER = Path(__file__).resolve().parent / "_multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _replay_losses():
    """Single-process numpy replay of the worker's two SGD steps."""
    rng = np.random.default_rng(0)
    X = rng.normal(size=(64, 16)).astype(np.float32)
    y = (rng.normal(size=(64,)) > 0).astype(np.int32)
    W = (rng.normal(size=(16, 2)) * 0.1).astype(np.float32)
    losses = []
    for _ in range(2):
        logits = X @ W
        z = logits - logits.max(axis=1, keepdims=True)
        logp = z - np.log(np.exp(z).sum(axis=1, keepdims=True))
        losses.append(float(-logp[np.arange(len(y)), y].mean()))
        p = np.exp(logp)
        p[np.arange(len(y)), y] -= 1.0
        W = W - 0.1 * (X.T @ (p / len(y)))
    return losses


def test_two_process_mesh_matches_single_process():
    port = _free_port()
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=str(REPO),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(port), str(i), "2"],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    parsed = {}
    for out in outs:
        m = re.search(
            r"MHLOSS pid=(\d) l1=([0-9.]+) l2=([0-9.]+)", out
        )
        assert m, f"no MHLOSS line in:\n{out[-2000:]}"
        parsed[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))

    assert set(parsed) == {0, 1}
    # both processes observe the identical replicated losses
    np.testing.assert_allclose(parsed[0], parsed[1], rtol=0, atol=0)
    # and they match a single-process replay of the same computation
    expected = _replay_losses()
    np.testing.assert_allclose(parsed[0], expected, atol=1e-5)
    # the second step must have reduced the loss (the psum'd update landed)
    assert parsed[0][1] < parsed[0][0]
