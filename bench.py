#!/usr/bin/env python3
"""Benchmark: flagship train-step throughput on one chip.

Workload: the full jitted training step at FakeSV scale — differentiable
full-graph GCN over N=5376 nodes, gather, cross-modal fusion, NODE
classifier, masked CE, backward, AdamW update — batch 512, synthetic
features with the real cache contract shapes (768/128/512/256/+2).

Baseline (`vs_baseline` denominator): the reference implementation's
fusion+classifier AdamW step measured on this host via
`scripts/measure_reference_baseline.py` (torch CPU — the reference's only
non-Apple backend): 961.6 samples/s at batch 512 (recorded in BASELINE.md).
Note our step does strictly MORE work per step than the reference's (the
reference trains against a frozen GNN cache; we recompute the GCN
differentiably in-step).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
REFERENCE_SAMPLES_PER_SEC = 961.6  # see module docstring

N_NODES = 5376
BATCH = 512
VOCAB = 4096
TOKENS_PER_DOC = 12
ITERS = 30  # all steps scanned inside one jit


def synthetic_cache(n: int, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, size=n).astype(np.int64)
    vocab = [f"tok{i}" for i in range(VOCAB)]
    ocr_sets = [
        set(rng.choice(vocab, size=TOKENS_PER_DOC, replace=False))
        for _ in range(n)
    ]
    split = np.arange(n)
    rng.shuffle(split)
    k1, k2 = int(0.7 * n), int(0.85 * n)
    return {
        "ids": np.array([f"v{i}" for i in range(n)], dtype=object),
        "labels": labels,
        "text": rng.standard_normal((n, 768)).astype(np.float32),
        "audio": rng.standard_normal((n, 128)).astype(np.float32),
        "visual": rng.standard_normal((n, 512)).astype(np.float32),
        "temporal": rng.standard_normal((n, 256)).astype(np.float32),
        "aux": rng.uniform(size=(n, 2)).astype(np.float32),
        "ocr_sets": ocr_sets,
        "split": (split[:k1], split[k1:k2], split[k2:]),
    }


def main() -> None:
    import tempfile

    from ultrafnd_git_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig

    cache = synthetic_cache(N_NODES)
    with tempfile.TemporaryDirectory() as tmp:
        cfg = TrainConfig(
            data_root="<synthetic>",
            out_dir=tmp,
            batch_size=BATCH,
            epochs=0,
            seed=0,
            cache_to_disk=False,
            save_best=False,
            log_metrics_jsonl=False,
        )
        trainer = ForensicTrainer(cfg, cache=cache)

        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        step_fn = trainer._make_train_step()

        # All ITERS steps run inside ONE jit (lax.scan over pregenerated
        # index batches): per-step host dispatch — which on a tunneled TPU
        # is network round-trips — would otherwise dominate the timing.
        @jax.jit
        def run_steps(state, idx_all):
            ones = jnp.ones(BATCH, jnp.float32)

            def body(state, idx):
                state, out = step_fn(state, idx, ones)
                return state, out["loss"]

            return jax.lax.scan(body, state, idx_all)

        def idx_batches(n_steps):
            return jnp.asarray(
                rng.integers(0, N_NODES, size=(n_steps, BATCH)), jnp.int32
            )

        # first call compiles + warms; median of 3 timed calls smooths
        # run-to-run variance on a shared/tunneled chip
        state, losses = run_steps(trainer.state, idx_batches(ITERS))
        jax.block_until_ready(losses)

        times = []
        for _ in range(3):
            idx_all = idx_batches(ITERS)
            t0 = time.perf_counter()
            state, losses = run_steps(state, idx_all)
            jax.block_until_ready(losses)
            times.append((time.perf_counter() - t0) / ITERS)
        dt = float(np.median(times))
        assert np.isfinite(float(losses[-1]))

        throughput = BATCH / dt
        print(
            json.dumps(
                {
                    "metric": "flagship_train_step_throughput",
                    "value": round(throughput, 1),
                    "unit": "samples/sec",
                    "vs_baseline": round(
                        throughput / REFERENCE_SAMPLES_PER_SEC, 2
                    ),
                }
            )
        )


if __name__ == "__main__":
    main()
