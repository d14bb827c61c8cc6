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


def run_one(
    n_nodes: int,
    batch: int,
    iters: int = None,
    shard_graph: bool = False,
    sparse_graph: bool = False,
    dp: int = None,
    mesh_backend: str = None,
) -> dict:
    """One scaling row. With shard_graph/dp set, the (N, N) adjacency
    rows shard over the 'data' axis of a dp-device mesh — the VERDICT r3
    item 7 growth-path measurement: graph build time (native posting
    lists) and PER-DEVICE adjacency bytes at N >= 20k, executed instead
    of extrapolated (docs/SCALING.md 'graph growth, measured')."""
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
            shard_graph=shard_graph,
            sparse_graph=sparse_graph,
            dp=dp,
            mesh_backend=mesh_backend,
        )
        # isolate the native posting-list graph build (the measured
        # growth-path number — its output is then rebuilt inside the
        # trainer init, whose init_s also covers AX + the GCN pretrain).
        # Sparse mode times the O(E) edge lister and NEVER materializes
        # the (N, N) matrix — that object not existing is the point.
        if sparse_graph:
            from ultrafnd_git_tpu.ops.jaccard import build_edges_from_ocr

            t_g = time.perf_counter()
            e_src, _e_dst, _w = build_edges_from_ocr(
                cache["ocr_sets"], 0.12
            )
            graph_build_s = time.perf_counter() - t_g
            edges = int(len(e_src))
            del e_src, _e_dst, _w
        else:
            from ultrafnd_git_tpu.ops.jaccard import build_adj_from_ocr

            t_g = time.perf_counter()
            adj = build_adj_from_ocr(cache["ocr_sets"], 0.12)
            graph_build_s = time.perf_counter() - t_g
            edges = int(adj.sum() - n_nodes)  # off-diagonal links
            del adj

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

        # sync via a 1-float device->host fetch, not block_until_ready:
        # on the tunneled axon backend block_until_ready has been
        # observed returning ~1 ms after enqueue while the scan was
        # still executing remotely (measured 0.03 ms/step "results" at
        # N=21504 vs 2.5 ms real; the fetch forces completion — same
        # fix shape as bench.py's loss assert)
        state, losses = run_steps(trainer.state, batches(), trainer.corpus)
        assert np.isfinite(float(np.asarray(losses)[-1]))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            state, losses = run_steps(state, batches(), trainer.corpus)
            assert np.isfinite(float(np.asarray(losses)[-1]))
            times.append((time.perf_counter() - t0) / iters)
        step_ms = float(np.median(times)) * 1e3
        n_dev = (
            trainer.mesh.shape["data"] if trainer.mesh is not None else 1
        )
        if sparse_graph:
            # (N, K) int32 ids + (N, K) f32 weights — the graph's whole
            # device footprint in neighbor-list form
            k_max = int(trainer.corpus["nbr_idx"].shape[1])
            adj_mb = round(n_nodes * k_max * 8 / 2**20, 1)
        else:
            k_max = None
            adj_mb = round(n_nodes * n_nodes * 4 / 2**20, 1)
        return {
            "nodes": n_nodes,
            "edges": edges,
            "graph_build_s": round(graph_build_s, 3),
            "adjacency_mb": adj_mb,
            "adj_mb_per_device": round(adj_mb / n_dev, 1),
            "devices": n_dev,
            "init_s": round(init_s, 2),
            "step_ms": round(step_ms, 3),
            "samples_per_s": round(batch / (step_ms / 1e3), 1),
            **({"k_max": k_max} if k_max is not None else {}),
        }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--nodes", type=int, nargs="+", default=[5376, 10752, 21504]
    )
    p.add_argument("--batch", type=int, default=BATCH)
    p.add_argument(
        "--shard_graph", action="store_true",
        help="row-shard the (N, N) adjacency over a dp-device mesh "
             "(the graph growth path, measured)",
    )
    p.add_argument(
        "--sparse_graph", action="store_true",
        help="padded-neighbor-list graph: O(E) host build, O(N*K) "
             "device footprint, no (N, N) object anywhere",
    )
    p.add_argument("--dp", type=int, default=None)
    p.add_argument(
        "--mesh_backend", default=None,
        help='e.g. "cpu" for the 8-virtual-device host mesh',
    )
    p.add_argument("--iters", type=int, default=None)
    p.add_argument(
        "--cpu", action="store_true",
        help="pin the whole process to CPU (use with "
             "XLA_FLAGS=--xla_force_host_platform_device_count=8 for "
             "the virtual mesh)",
    )
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    print(
        f"{'N':>8} {'edges':>9} {'build s':>8} {'adj MB':>8} "
        f"{'MB/dev':>7} {'dev':>4} {'init s':>8} {'step ms':>9}"
        f" {'samples/s':>11}"
    )
    for n in args.nodes:
        r = run_one(
            n, args.batch, iters=args.iters,
            shard_graph=args.shard_graph,
            sparse_graph=args.sparse_graph, dp=args.dp,
            mesh_backend=args.mesh_backend,
        )
        print(
            f"{r['nodes']:>8} {r['edges']:>9} {r['graph_build_s']:>8} "
            f"{r['adjacency_mb']:>8} {r['adj_mb_per_device']:>7} "
            f"{r['devices']:>4} {r['init_s']:>8} "
            f"{r['step_ms']:>9} {r['samples_per_s']:>11}"
        )


if __name__ == "__main__":
    main()
