"""Subprocess worker: train with step-granular saves, SIGKILL self after
the Nth MID-EPOCH `latest` commit (driven by tests/test_trainer_resume.py
and tests/test_multihost.py — not a test module).

The kill lands AFTER ckpt.wait_for_writes() so the death point is
deterministic (the mid-epoch slot is fully committed); killing during
the async write is covered by the checkpoint commit protocol itself
(meta.json presence == complete slot, training/checkpoint.py docstring)
and would simply resume from the previous committed slot — still on the
same trajectory.

argv: data_root out_dir kill_after scan|perstep [port pid nprocs]
The optional trailing args run the worker under 2-process
jax.distributed (the multi-host variant of the resume test).
"""
import os
import signal
import sys


def main() -> None:
    data_root, out_dir = sys.argv[1], sys.argv[2]
    kill_after = int(sys.argv[3])
    scan = sys.argv[4] == "scan"
    dist = len(sys.argv) > 5

    import jax

    jax.config.update("jax_platforms", "cpu")

    from ultrafnd_git_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    dp = None
    if dist:
        port, pid, n = sys.argv[5], int(sys.argv[6]), int(sys.argv[7])
        from ultrafnd_git_tpu.parallel import mesh as meshlib

        ok = meshlib.maybe_initialize_distributed(
            coordinator=f"localhost:{port}", num_processes=n, process_id=pid
        )
        assert ok and jax.process_count() == n
        dp = len(jax.devices())

    from ultrafnd_git_tpu.training import checkpoint as ckpt
    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig

    if kill_after > 0:
        orig = ckpt.save_checkpoint
        seen = {"n": 0}

        def wrapped(directory, name, state, meta):
            orig(directory, name, state, meta)
            if name == "latest" and meta.get("in_epoch"):
                seen["n"] += 1
                if seen["n"] >= kill_after:
                    ckpt.wait_for_writes()
                    print(
                        f"SIGKILL after mid-epoch save #{seen['n']} "
                        f"epoch={meta['epoch']} "
                        f"cursor={meta['step_cursor']}",
                        flush=True,
                    )
                    os.kill(os.getpid(), signal.SIGKILL)

        ckpt.save_checkpoint = wrapped

    cfg = TrainConfig(
        data_root=data_root,
        out_dir=out_dir,
        batch_size=8,
        epochs=1 if dist else 3,
        seed=0,
        dp=dp,
        resume=kill_after == 0 and os.environ.get("ULTRAFND_RESUME") == "1",
        save_every_steps=2,
        scan_epoch=scan,
        cache_to_disk=False,
        save_best=not dist,  # dist variant compares `latest` params only
        log_metrics_jsonl=False,
        early_stop_patience=99,
    )
    trainer = ForensicTrainer(cfg)
    if cfg.resume:
        print(
            f"RESUME start_epoch={trainer.start_epoch} "
            f"cursor={trainer._resume_cursor}",
            flush=True,
        )
    best = trainer.fit()
    from tests._multihost_trainer_worker import fingerprint

    print(
        f"DONE fp={fingerprint(trainer.state.params)} best={best:.10f}",
        flush=True,
    )
    if kill_after > 0:
        print("UNEXPECTED: fit completed without the kill", flush=True)
        sys.exit(3)


if __name__ == "__main__":
    main()
