"""Subprocess worker: the REAL ForensicTrainer under 2-process
jax.distributed (not a test module — driven by tests/test_multihost.py).

VERDICT r3 item 1: the toy multihost worker proved the mesh helpers, but
`ForensicTrainer` itself — its corpus placement, `_batch_arrays`'
multi-process branch, the multi-process scan-epoch (item 2), and above
all Orbax save/restore under `jax.distributed` — had only ever run
single-process. This worker executes the full trainer flow with 2 real
processes over the checked-in fixture:

  phase 1: fresh fit() with scan_epoch=True  (one-dispatch epochs built
           from per-host batch COLUMNS via meshlib.put_epoch_batches),
           writing real best/latest Orbax checkpoints collectively;
  phase 2: --resume fit() with scan_epoch=False (per-step dispatch,
           _batch_arrays' put_global_batch branch) restoring `latest`
           under jax.distributed;
  then     test() restoring `best` under jax.distributed.

Prints a fingerprint line the parent compares across processes and
against its own single-process run of the identical two-phase flow.
"""
import hashlib
import sys


def fingerprint(params) -> str:
    """Order-stable sha256 over every leaf's raw bytes."""
    import jax
    import numpy as np

    h = hashlib.sha256()
    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in sorted(leaves, key=lambda kv: str(kv[0])):
        h.update(str(path).encode())
        h.update(np.ascontiguousarray(jax.device_get(leaf)).tobytes())
    return h.hexdigest()[:16]


def flat_leaves(params) -> dict:
    """{path: np.ndarray} with stable string keys (parent-side compare)."""
    import jax
    import numpy as np

    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    return {
        str(path): np.asarray(jax.device_get(leaf))
        for path, leaf in leaves
    }


def main() -> None:
    port, pid, n, data_root, out_dir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
        sys.argv[4], sys.argv[5],
    )

    import jax

    jax.config.update("jax_platforms", "cpu")

    from ultrafnd_git_tpu.parallel import mesh as meshlib
    from ultrafnd_git_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    # maybe_initialize_distributed also warms the global Gloo
    # communicator while both processes are still in lock-step (its
    # handshake has a hard 30 s deadline; see parallel/mesh.py)
    ok = meshlib.maybe_initialize_distributed(
        coordinator=f"localhost:{port}", num_processes=n, process_id=pid
    )
    assert ok and jax.process_count() == n

    from dataclasses import replace

    from ultrafnd_git_tpu.training import checkpoint as ckpt
    from ultrafnd_git_tpu.training.trainer import (
        ForensicTrainer,
        TrainConfig,
    )

    cfg = TrainConfig(
        data_root=data_root,
        out_dir=out_dir,
        batch_size=8,
        epochs=2,
        seed=0,
        dp=len(jax.devices()),  # the full 2-process global mesh
        cache_to_disk=False,  # two processes must not race one npz
        scan_epoch=True,
        log_metrics_jsonl=(pid == 0),  # one writer for metrics.jsonl
        early_stop_patience=99,  # both phases run their full epochs
    )
    trainer = ForensicTrainer(cfg)
    best1 = trainer.fit()
    fp1 = fingerprint(trainer.state.params)
    if pid == 0:
        import numpy as np

        np.savez(
            f"{out_dir}/params_phase1.npz",
            **flat_leaves(trainer.state.params),
        )

    # phase 1's async saves must be COMMITTED (incl. process 0's
    # meta.json finalizer) before any process constructs the resume
    # trainer — wait locally, then barrier globally
    ckpt.wait_for_writes()
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("phase1-committed")

    cfg2 = replace(
        cfg, resume=True, epochs=3, scan_epoch=False,
        log_metrics_jsonl=False,
    )
    trainer2 = ForensicTrainer(cfg2)
    assert trainer2.start_epoch == 3, trainer2.start_epoch
    best2 = trainer2.fit()
    fp2 = fingerprint(trainer2.state.params)
    if pid == 0:
        import numpy as np

        np.savez(
            f"{out_dir}/params_phase2.npz",
            **flat_leaves(trainer2.state.params),
        )
    res = trainer2.test()

    print(
        f"MHTRAIN pid={pid} fp1={fp1} best1={best1:.10f} "
        f"fp2={fp2} best2={best2:.10f} "
        f"test_auc={res['test_auc']:.10f} test_loss={res['test_loss']:.10f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
