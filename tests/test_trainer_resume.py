"""Step-granular preemption-safe resume (VERDICT r4 item 3).

The elastic story SURVEY §5.3-5.4 asks for: a mid-epoch SIGKILL (the
normal TPU-pod preemption) must not replay the whole epoch — with
`save_every_steps` the trainer checkpoints `latest` every K optimizer
steps (chunking the scan-epoch into ceil(steps/K) scans so a host
boundary exists to save at), records the step cursor + epoch batch
order + np.random shuffle stream in the meta, and `--resume` replays
only the remaining steps, landing BIT-IDENTICAL to an uninterrupted
run. The 2-process variant lives in tests/test_multihost.py.
"""
import json
import os
import signal
import subprocess
import sys
from dataclasses import replace
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # trains fixture models + a subprocess

REPO = Path(__file__).resolve().parents[1]
WORKER = REPO / "tests" / "_sigkill_trainer_worker.py"


def _flat(params):
    import jax

    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    return {
        str(p): np.asarray(jax.device_get(leaf)) for p, leaf in leaves
    }


def _assert_trees_equal(a, b):
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def _cfg(fixture_data_root, out_dir, scan, save_every):
    from ultrafnd_git_tpu.training.trainer import TrainConfig

    return TrainConfig(
        data_root=fixture_data_root,
        out_dir=str(out_dir),
        batch_size=8,
        epochs=3,
        seed=0,
        save_every_steps=save_every,
        scan_epoch=scan,
        cache_to_disk=False,
        log_metrics_jsonl=False,
        early_stop_patience=99,
    )


@pytest.fixture(scope="module")
def scan_save2_run(fixture_data_root, tmp_path_factory):
    """ONE uninterrupted (scan_epoch, save_every_steps=2) training run
    shared as the reference by the chunking-exactness test AND the
    [scan] SIGKILL test — both compare against exactly this config
    (VERDICT r4 weak 7: near-identical tiny trainings duplicated)."""
    from ultrafnd_git_tpu.training import checkpoint as ckpt
    from ultrafnd_git_tpu.training.trainer import ForensicTrainer

    out = tmp_path_factory.mktemp("scan_save2_ref")
    tr = ForensicTrainer(
        _cfg(fixture_data_root, out, scan=True, save_every=2)
    )
    best = tr.fit()
    leaves = _flat(tr.state.params)
    res = tr.test()
    ckpt.wait_for_writes()
    return {"best": best, "leaves": leaves, "test": res}


def test_step_save_chunking_is_exact(
    fixture_data_root, tmp_path, scan_save2_run
):
    """The ceil(steps/K)-scan epoch must be numerically IDENTICAL to the
    single-scan epoch (same step sequence, same RNG folds)."""
    from ultrafnd_git_tpu.training.trainer import ForensicTrainer

    a = ForensicTrainer(
        _cfg(fixture_data_root, tmp_path / "a", scan=True, save_every=0)
    )
    best_a = a.fit()
    assert best_a == scan_save2_run["best"]
    _assert_trees_equal(_flat(a.state.params), scan_save2_run["leaves"])


@pytest.mark.parametrize("scan", [True, False], ids=["scan", "perstep"])
def test_sigkill_midepoch_resume_bitmatches_uninterrupted(
    fixture_data_root, tmp_path, scan, scan_save2_run
):
    """SIGKILL a training subprocess mid-epoch (after the 3rd K-step
    save: epoch 2, step cursor 2 of 6), resume in a fresh trainer, and
    assert the final params/best are BIT-IDENTICAL to an uninterrupted
    run of the same config."""
    from ultrafnd_git_tpu.training import checkpoint as ckpt
    from ultrafnd_git_tpu.training.trainer import ForensicTrainer

    # ---- uninterrupted reference (shared fixture for [scan]) --------
    cfg = _cfg(fixture_data_root, tmp_path / "ref", scan, save_every=2)
    if scan:
        best_ref = scan_save2_run["best"]
        leaves_ref = scan_save2_run["leaves"]
        res_ref = scan_save2_run["test"]
    else:
        ref = ForensicTrainer(cfg)
        best_ref = ref.fit()
        leaves_ref = _flat(ref.state.params)
        res_ref = ref.test()
        ckpt.wait_for_writes()

    # ---- interrupted run (subprocess, SIGKILLs itself) --------------
    kill_out = tmp_path / "kill"
    kill_out.mkdir()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        ULTRAFND_DISABLE_HF="1",
        PYTHONPATH=str(REPO),
    )
    proc = subprocess.run(
        [
            sys.executable, str(WORKER), fixture_data_root,
            str(kill_out), "3", "scan" if scan else "perstep",
        ],
        env=env, capture_output=True, text=True, timeout=900,
        cwd=str(REPO),
    )
    assert proc.returncode == -signal.SIGKILL, (
        proc.stdout[-3000:] + proc.stderr[-3000:]
    )
    assert "SIGKILL after mid-epoch save #3" in proc.stdout
    assert ckpt.checkpoint_exists(str(kill_out), "latest")
    meta = json.loads((kill_out / "latest" / "meta.json").read_text())
    assert meta["in_epoch"] is True
    assert meta["epoch"] == 2
    assert meta["step_cursor"] == 2
    assert len(meta["epoch_order"]) > 0
    assert meta["np_random_state"][0] == "MT19937"

    # ---- resume and finish ------------------------------------------
    cfg2 = replace(cfg, out_dir=str(kill_out), resume=True)
    tr2 = ForensicTrainer(cfg2)
    assert tr2.start_epoch == 2
    assert tr2._resume_cursor == 2
    best2 = tr2.fit()
    assert best2 == best_ref
    _assert_trees_equal(_flat(tr2.state.params), leaves_ref)
    res2 = tr2.test()
    assert res2 == res_ref
