#!/usr/bin/env python3
"""Experiment (VERDICT r4 item 2): amortize the scan-iteration floor.

The flagship batch-512 step sits at ~2.0-2.3 ms with a measured fixed
tax of ~0.23-0.35 ms per `lax.scan` iteration (BASELINE.md "fused
Pallas AdamW + iteration floors"). This script runs K optimizer steps
inside ONE scan body — the epoch index matrix reshaped (S, B) ->
(S/K, K, B), body unrolls K sequential step_fn applications — so the
per-iteration tax divides by K while the parameter trajectory stays
IDENTICAL to the per-step loop (the dropout key folds from carried
(state.rng, state.step) only; asserted below at K=1 vs K=5).

Usage: python scripts/bench_scan_fuse.py [--cpu] [--ks 1,2,5,10]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_NODES = 5376
BATCH = 512
ITERS = 30
RUNS = 5


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ks", default="1,2,5,10")
    ap.add_argument("--iters", type=int, default=ITERS)
    ap.add_argument("--runs", type=int, default=RUNS)
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument(
        "--skip_exact", action="store_true",
        help="skip the K=1 vs K=5 trajectory-equality assert",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ultrafnd_git_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    import tempfile

    import jax.numpy as jnp

    from bench import synthetic_cache
    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig

    cache = synthetic_cache(N_NODES)
    ks = [int(k) for k in args.ks.split(",")]
    with tempfile.TemporaryDirectory() as tmp:
        cfg = TrainConfig(
            data_root="<synthetic>",
            out_dir=tmp,
            batch_size=args.batch,
            epochs=0,
            seed=0,
            cache_to_disk=False,
            save_best=False,
            log_metrics_jsonl=False,
        )
        trainer = ForensicTrainer(cfg, cache=cache)
        step_fn = trainer._make_train_step()
        rng = np.random.default_rng(0)

        def make_runner(k: int):
            @jax.jit
            def run(state, idx_all, corpus):
                ones = jnp.ones(args.batch, jnp.float32)

                def body(state, idxk):
                    losses = []
                    for j in range(k):
                        state, out = step_fn(state, idxk[j], ones, corpus)
                        losses.append(out["loss"])
                    return state, jnp.stack(losses)

                return jax.lax.scan(body, state, idx_all)

            return run

        def idx_matrix(n_steps):
            return rng.integers(
                0, N_NODES, size=(n_steps, args.batch)
            ).astype(np.int32)

        # ---- exactness: K=1 and K=5 land on the SAME params ----------
        if not args.skip_exact:
            idx_fixed = idx_matrix(10)
            r1 = make_runner(1)
            r5 = make_runner(5)
            s1, l1 = r1(
                trainer.state, jnp.asarray(idx_fixed[:, None]),
                trainer.corpus,
            )
            s5, l5 = r5(
                trainer.state, jnp.asarray(idx_fixed.reshape(2, 5, -1)),
                trainer.corpus,
            )
            np.testing.assert_array_equal(
                np.asarray(l1).reshape(-1), np.asarray(l5).reshape(-1)
            )
            for a, b in zip(jax.tree.leaves(s1.params),
                            jax.tree.leaves(s5.params)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            print("exactness: K=1 and K=5 trajectories bit-identical "
                  "(losses + params)", flush=True)

        # ---- timing --------------------------------------------------
        results = {}
        for k in ks:
            iters = (args.iters // k) * k
            if iters == 0:
                continue
            runner = make_runner(k)
            shaped = lambda m: jnp.asarray(m.reshape(iters // k, k, -1))
            # warm
            s, ls = runner(
                trainer.state, shaped(idx_matrix(iters)), trainer.corpus
            )
            jax.block_until_ready(ls)
            per_step = []
            for _ in range(args.runs):
                m = shaped(idx_matrix(iters))
                t0 = time.perf_counter()
                s, ls = runner(s, m, trainer.corpus)
                jax.block_until_ready(ls)
                per_step.append((time.perf_counter() - t0) / iters)
            p10, p50, p90 = (
                float(np.percentile(per_step, q)) * 1e3
                for q in (10, 50, 90)
            )
            results[k] = (p10, p50, p90)
            print(
                f"K={k:3d}: p10 {p10:.3f} ms  p50 {p50:.3f} ms  "
                f"p90 {p90:.3f} ms  ({args.batch / (p50 / 1e3):,.0f} "
                f"samples/s at p50)",
                flush=True,
            )

        if 1 in results:
            base = results[1][0]
            for k, (p10, _, _) in sorted(results.items()):
                print(f"K={k:3d}: p10 speedup vs K=1: {base / p10:.3f}x")


if __name__ == "__main__":
    main()
