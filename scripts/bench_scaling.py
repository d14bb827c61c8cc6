#!/usr/bin/env python3
"""Corpus-size scaling of the flagship train step on one chip.

The transductive GCN's (N, N) adjacency is the workload's O(N^2) object
(docs/SCALING.md): this sweep grows N at fixed batch and reports step
time, throughput, and adjacency footprint — demonstrating how far one
chip's HBM carries the full-graph formulation before `--shard_graph`
(row-sharding over the mesh) has to take over.

Usage: python scripts/bench_scaling.py [--nodes 5376 10752 21504]
"""
import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import numpy as np

from ultrafnd_git_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from bench import BATCH, ITERS, synthetic_cache  # noqa: E402


def run_one(n_nodes: int, batch: int, iters: int = None) -> dict:
    import tempfile

    import jax
    import jax.numpy as jnp

    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig

    iters = iters or ITERS
    cache = synthetic_cache(n_nodes)
    with tempfile.TemporaryDirectory() as tmp:
        cfg = TrainConfig(
            data_root="<synthetic>",
            out_dir=tmp,
            batch_size=batch,
            epochs=0,
            seed=0,
            cache_to_disk=False,
            save_best=False,
            log_metrics_jsonl=False,
        )
        t_init = time.perf_counter()
        trainer = ForensicTrainer(cfg, cache=cache)
        init_s = time.perf_counter() - t_init  # dominated by the host
        # OCR-Jaccard graph build (native/graphops.cpp when available)
        step_fn = trainer._make_train_step()

        # corpus is a jit ARGUMENT: a closure over the device arrays would
        # embed them in the remote-compile payload (HTTP 413 at N~10k)
        @jax.jit
        def run_steps(state, idx_all, corpus):
            ones = jnp.ones(batch, jnp.float32)

            def body(state, idx):
                state, out = step_fn(state, idx, ones, corpus)
                return state, out["loss"]

            return jax.lax.scan(body, state, idx_all)

        rng = np.random.default_rng(0)

        def batches():
            return jnp.asarray(
                rng.integers(0, n_nodes, size=(iters, batch)), jnp.int32
            )

        state, losses = run_steps(trainer.state, batches(), trainer.corpus)
        jax.block_until_ready(losses)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            state, losses = run_steps(state, batches(), trainer.corpus)
            jax.block_until_ready(losses)
            times.append((time.perf_counter() - t0) / iters)
        step_ms = float(np.median(times)) * 1e3
        return {
            "nodes": n_nodes,
            "adjacency_mb": round(n_nodes * n_nodes * 4 / 2**20, 1),
            "init_s": round(init_s, 2),
            "step_ms": round(step_ms, 3),
            "samples_per_s": round(batch / (step_ms / 1e3), 1),
        }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--nodes", type=int, nargs="+", default=[5376, 10752, 21504]
    )
    p.add_argument("--batch", type=int, default=BATCH)
    args = p.parse_args()

    print(
        f"{'N':>8} {'adj MB':>8} {'init s':>8} {'step ms':>9}"
        f" {'samples/s':>11}"
    )
    for n in args.nodes:
        r = run_one(n, args.batch)
        print(
            f"{r['nodes']:>8} {r['adjacency_mb']:>8} {r['init_s']:>8} "
            f"{r['step_ms']:>9} {r['samples_per_s']:>11}"
        )


if __name__ == "__main__":
    main()
