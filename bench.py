#!/usr/bin/env python3
"""Benchmark: flagship train-step throughput, MFU, and scaling on one chip.

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

Measurement protocol (BASELINE.md "variance" note): every step runs inside
one jitted `lax.scan` (per-call dispatch over a tunneled TPU measures the
network, not the chip); the primary batch is timed over >=5 scanned runs
and reported as p10/p50/p90; `value` is the p50. MFU = achieved FLOP/s
(XLA cost analysis of the compiled step, analytic fallback) over the
chip's bf16 peak. A batch-scaling row (512/2048/8192) shows where the
step leaves the latency floor.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu",
"achieved_tflops", "p10", "p50", "p90", "batch_scaling", ...}.
"""
from __future__ import annotations

import json
import os
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
RUNS = 5  # timed scan calls for the primary batch (p10/p50/p90)

# bf16 peak of one TPU v5e (v5 lite) chip; CPU runs report mfu vs this
# same number so the field is comparable across environments.
PEAK_FLOPS = 197e12


def synthetic_cache(n: int, seed: int = 0) -> dict:
    from ultrafnd_git_tpu.data.cache import TOWER_IDS_LEN, TOWER_VOCAB

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
        "text_ids": rng.integers(
            1, TOWER_VOCAB, size=(n, TOWER_IDS_LEN)
        ).astype(np.int32),
        "text_mask": np.ones((n, TOWER_IDS_LEN), np.float32),
        "ocr_sets": ocr_sets,
        "split": (split[:k1], split[k1:k2], split[k2:]),
    }


def _analytic_step_flops(batch: int) -> float:
    """Fallback FLOP estimate (docs/SCALING.md): fusion fwd ~8.6 GF +
    bwd 2x at batch 512, scaled linearly, + ~1 GF GCN propagation."""
    return (26e9 * batch / 512.0) + 1e9


def _compiled_flops(trainer, batch: int) -> float:
    """Per-step flops from XLA's cost analysis of ONE un-scanned step.

    (Cost analysis of the scanned executable counts the While body once,
    not trip-count times — measured 1.5 GF/step vs the ~26 GF analytic
    number — so the single step is lowered separately here.)
    """
    import jax
    import jax.numpy as jnp

    try:
        step_fn = jax.jit(trainer._make_train_step())
        idx = jnp.zeros((batch,), jnp.int32)
        ones = jnp.ones((batch,), jnp.float32)
        compiled = step_fn.lower(
            trainer.state, idx, ones, trainer.corpus
        ).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = float(analysis.get("flops", 0.0))
        if flops > 0:
            return flops
    except Exception:
        pass
    return _analytic_step_flops(batch)


def _time_scan(run_steps, state, idx_batches, n_runs):
    import jax

    per_step = []
    for _ in range(n_runs):
        idx_all = idx_batches(ITERS)
        t0 = time.perf_counter()
        state, losses = run_steps(state, idx_all)
        jax.block_until_ready(losses)
        per_step.append((time.perf_counter() - t0) / ITERS)
    return state, per_step, losses


def _probe_backend(timeout: float = 240.0) -> bool:
    """True if the configured PJRT backend answers within `timeout`.

    Probed in a SUBPROCESS: a hung tunnel blocks jax backend init under
    a lock, so an in-process watchdog thread could not recover — the
    parent must decide BEFORE first device use. (Observed failure mode:
    the tunneled chip stops answering and even jax.devices() hangs
    forever; without this guard the bench emits no JSON at all.)
    """
    import subprocess
    import sys

    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True,
            timeout=timeout,
        )
        return out.returncode == 0
    except Exception:
        return False


def main() -> None:
    import sys
    import tempfile

    t_start = time.perf_counter()

    def progress(msg: str) -> None:
        # stderr, so the stdout contract (ONE JSON line) holds; the
        # driver's captured tail shows where a slow run spent time
        print(f'bench[{time.perf_counter() - t_start:7.1f}s] {msg}',
              file=sys.stderr, flush=True)

    platform_note = None
    if not _probe_backend():
        import jax

        jax.config.update("jax_platforms", "cpu")
        platform_note = (
            "configured accelerator backend unresponsive (probe timeout); "
            "benchmarked on host CPU instead — numbers NOT comparable to "
            "accelerator rounds"
        )
        import sys

        print(f"warning: {platform_note}", file=sys.stderr, flush=True)

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
        progress('flagship trainer build')
        trainer = ForensicTrainer(cfg, cache=cache)

        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(0)

        def make_runner_for(tr, batch: int):
            step_fn = tr._make_train_step()

            @jax.jit
            def run_steps_jit(state, idx_all, corpus):
                ones = jnp.ones(batch, jnp.float32)

                def body(state, idx):
                    state, out = step_fn(state, idx, ones, corpus)
                    return state, out["loss"]

                return jax.lax.scan(body, state, idx_all)

            def run_steps(state, idx_all):
                # corpus bound at CALL time (a jit-closure capture would
                # embed it in the remote-compile payload)
                return run_steps_jit(state, idx_all, tr.corpus)

            def idx_batches(n_steps):
                return jnp.asarray(
                    rng.integers(0, N_NODES, size=(n_steps, batch)),
                    jnp.int32,
                )

            return run_steps, idx_batches

        def make_runner(batch: int):
            return make_runner_for(trainer, batch)

        # ---- primary batch: warm, then >=5 timed scans -------------------
        progress('flagship warm+timed scans')
        run_steps, idx_batches = make_runner(BATCH)
        state, losses = run_steps(trainer.state, idx_batches(ITERS))
        jax.block_until_ready(losses)
        step_flops = _compiled_flops(trainer, BATCH)

        state, per_step, losses = _time_scan(
            run_steps, state, idx_batches, RUNS
        )
        assert np.isfinite(float(losses[-1]))
        p10, p50, p90 = (
            float(np.percentile(per_step, q)) for q in (10, 50, 90)
        )

        throughput = BATCH / p50
        achieved = step_flops / p50

        # ---- batch scaling (one warm + one timed scan per size) ----------
        progress('batch scaling')
        scaling = {str(BATCH): round(throughput, 1)}
        for big in (2048, 8192):
            try:
                runner, batches = make_runner(big)
                # NOTE: reuses trainer.state (batch size is not baked into
                # params), fresh jit per batch size
                s, ls = runner(trainer.state, batches(ITERS))
                jax.block_until_ready(ls)
                _, times_b, ls = _time_scan(runner, s, batches, 2)
                scaling[str(big)] = round(big / float(np.median(times_b)), 1)
            except Exception:
                scaling[str(big)] = None

        # ---- bf16-compute lever (f32 master params) -----------------------
        progress('bf16 lever')
        try:
            cfg_bf16 = TrainConfig(
                data_root="<synthetic>",
                out_dir=tmp,
                batch_size=BATCH,
                epochs=0,
                seed=0,
                bf16_compute=True,
                cache_to_disk=False,
                save_best=False,
                log_metrics_jsonl=False,
            )
            tr16 = ForensicTrainer(cfg_bf16, cache=cache)

            for b16 in (BATCH, 8192):
                runner, batches16 = make_runner_for(tr16, b16)
                s, ls = runner(tr16.state, batches16(ITERS))
                jax.block_until_ready(ls)
                _, times16, ls = _time_scan(runner, s, batches16, 2)
                scaling[f"bf16_{b16}"] = round(
                    b16 / float(np.median(times16)), 1
                )
        except Exception:
            scaling["bf16_512"] = None

        # ---- sparse-graph lever (padded-neighbor GCN propagation) --------
        progress('sparse-graph lever')
        # Same protocol, --sparse_graph trainer: the graph channel's
        # dense (B, N) row propagation becomes a K-slot gather-sum.
        # Measured first in round 5: p10 1.948 ms / 259k samples/s vs
        # the 2.02-2.31 dense band (+12%) — recorded as a scaling row,
        # not the headline, to keep the flagship protocol comparable
        # across rounds (f32-close, not bit-identical to dense).
        try:
            cfg_sp = TrainConfig(
                data_root="<synthetic>",
                out_dir=tmp,
                batch_size=BATCH,
                epochs=0,
                seed=0,
                sparse_graph=True,
                cache_to_disk=False,
                save_best=False,
                log_metrics_jsonl=False,
            )
            trsp = ForensicTrainer(cfg_sp, cache=cache)
            runner, batches_sp = make_runner_for(trsp, BATCH)
            s, ls = runner(trsp.state, batches_sp(ITERS))
            jax.block_until_ready(ls)
            _, times_sp, ls = _time_scan(runner, s, batches_sp, 3)
            scaling["sparse_512"] = round(
                BATCH / float(np.median(times_sp)), 1
            )
        except Exception:
            scaling["sparse_512"] = None

        # ---- joint text-tower step (the FLOP-rich configuration) ---------
        progress('tower step')
        # VERDICT r2 item 4: --train_text_tower is where the chip does real
        # MXU work (the depth-2 width-768 tower fwd+bwd dominates). Report
        # p50 step time, samples/s, and MFU for bf16-compute (production
        # setting) + f32 for reference.
        tower = {}
        try:
            for label, bf16 in (("bf16", True), ("f32", False)):
                cfg_t = TrainConfig(
                    data_root="<synthetic>",
                    out_dir=tmp,
                    batch_size=BATCH,
                    epochs=0,
                    seed=0,
                    train_text_tower=True,
                    bf16_compute=bf16,
                    cache_to_disk=False,
                    save_best=False,
                    log_metrics_jsonl=False,
                )
                trt = ForensicTrainer(cfg_t, cache=cache)
                runner, batches_t = make_runner_for(trt, BATCH)
                s, ls = runner(trt.state, batches_t(ITERS))
                jax.block_until_ready(ls)
                _, times_t, ls = _time_scan(runner, s, batches_t, 3)
                p50_t = float(np.median(times_t))
                flops_t = _compiled_flops(trt, BATCH)
                tower[label] = {
                    "ms_per_step": round(p50_t * 1e3, 2),
                    "samples_per_s": round(BATCH / p50_t, 1),
                    "step_gflops": round(flops_t / 1e9, 1),
                    "mfu": round(flops_t / p50_t / PEAK_FLOPS, 4),
                }
        except Exception:
            tower = None

        # ---- v1 feature-stage throughput (device-CV path) ----------------
        progress('v1 feature stage')
        # Synthetic 8-clip batch through the BatchFeatureExtractor with
        # the accelerator CV stage — the VERDICT r1 "v1 pipeline
        # throughput" capture. Hash/DSP encoder rungs (hermetic).
        v1_ms_per_sample = None
        try:
            import os

            os.environ.setdefault("ULTRAFND_DISABLE_HF", "1")
            from ultrafnd_git_tpu.training.pipeline_v1 import (
                BatchFeatureExtractor,
            )

            rng_f = np.random.default_rng(0)
            fbatch = {
                "text_data": [
                    {"title": f"t{i}", "ocr": "o", "comments": ["c"]}
                    for i in range(8)
                ],
                "audio_waveform": [
                    rng_f.standard_normal(80000).astype(np.float32)
                    for _ in range(8)
                ],
                # structured (compressible) frames — pure noise makes the
                # host JPEG/ELA pass pathologically slow vs real video
                "video_frames": np.kron(
                    rng_f.integers(0, 255, (8, 30, 32, 32, 3)),
                    np.ones((1, 1, 8, 8, 1)),
                ).astype(np.uint8),
                "label": np.zeros(8, np.int64),
            }
            ext = BatchFeatureExtractor(seed=0, use_device_cv=True)
            if ext._device_cv is not None:
                ext(fbatch)  # warm (compile)
                # the production path is stream(): batch N+1's upload
                # dispatches before batch N's host work (cross-batch
                # double buffering) — time a 6-batch stream
                n_stream = 6
                t0 = time.perf_counter()
                for _ in ext.stream((fbatch, i) for i in range(n_stream)):
                    pass
                dt = time.perf_counter() - t0
                v1_ms_per_sample = round(dt / (8 * n_stream) * 1e3, 1)
        except Exception:
            pass

        progress('graph build')
        # native graph builder vs numpy incidence matmul (one-time host
        # cost of trainer init; see BASELINE.md "Native OCR-Jaccard")
        graph_build = None
        try:
            import importlib

            from ultrafnd_git_tpu import native as native_mod

            J = importlib.import_module("ultrafnd_git_tpu.ops.jaccard")
            gsets = synthetic_cache(5376)["ocr_sets"]
            if native_mod.get_graph_lib() is not None:
                t0 = time.perf_counter()
                a_nat = J.build_adj_from_ocr(gsets, 0.12)
                t_nat = time.perf_counter() - t0
                os.environ["ULTRAFND_NATIVE"] = "0"
                native_mod.reset()
                t0 = time.perf_counter()
                a_np = J.build_adj_from_ocr(gsets, 0.12)
                t_np = time.perf_counter() - t0
                os.environ.pop("ULTRAFND_NATIVE", None)
                native_mod.reset()
                graph_build = {
                    "n": 5376,
                    "native_s": round(t_nat, 3),
                    "numpy_s": round(t_np, 2),
                    "speedup": round(t_np / max(t_nat, 1e-9), 1),
                    "identical": bool(np.array_equal(a_nat, a_np)),
                }
        except Exception:
            pass

        # ---- serving throughput (records/s through Predictor.predict) ----
        progress('serving row')
        # End-to-end scoring capability: host featurization (prefetched),
        # inductive graph attachment, and the jitted scoring dispatch —
        # the direct-predict rate the HTTP serving rows in BASELINE.md
        # sit under. Trains a 1-epoch fixture model into tmp (the bench's
        # synthetic cache carries no checkpoint), warms ONE 64-record
        # bucket, then times 64-record requests (median of 3). Kept
        # deliberately small: every novel shape here is a remote compile
        # over the tunnel, and the serving row must not blow the bench's
        # wall-clock budget (the full protocol ladder lives in
        # scripts/bench_serving.py / bench_http_serving.py).
        serving = None
        try:
            from pathlib import Path as _Path

            from ultrafnd_git_tpu.serving import Predictor

            fixture = (
                _Path(__file__).resolve().parent
                / "tests" / "fixtures" / "fakesv_tiny"
            )
            sdir = _Path(tmp) / "serve"
            import contextlib

            # the fixture trainer prints per-epoch metric lines; stdout
            # must stay ONE JSON line (the driver contract), so route
            # them to stderr with the progress markers
            with contextlib.redirect_stdout(sys.stderr):
                st = ForensicTrainer(
                    TrainConfig(
                        data_root=str(fixture),
                        out_dir=str(sdir),
                        batch_size=8,
                        epochs=1,
                        seed=0,
                        log_metrics_jsonl=False,
                    )
                )
                st.fit()
                pred = Predictor(str(sdir), batch_size=64)
            n_req = 64
            records = [
                {
                    "video_id": f"q{i}",
                    "title": f"外星人 入侵 地球 警告 第{i}期",
                    "ocr": "外星 飞船 出现 危险",
                    "comments": ["太可怕了"],
                }
                for i in range(n_req)
            ]
            pred.predict(records)  # one bucket: warm featurize + score
            times_s = []
            for _ in range(3):
                t0 = time.perf_counter()
                rows = pred.predict(records)
                times_s.append(time.perf_counter() - t0)
            assert len(rows) == n_req
            dt = float(np.median(times_s))
            serving = {
                "records_per_s": round(n_req / dt, 1),
                "ms_per_record": round(dt / n_req * 1e3, 3),
                "request": n_req,
            }
        except Exception:
            pass

        progress('emit json')
        print(
            json.dumps(
                {
                    "metric": "flagship_train_step_throughput",
                    "value": round(throughput, 1),
                    "unit": "samples/sec",
                    "vs_baseline": round(
                        throughput / REFERENCE_SAMPLES_PER_SEC, 2
                    ),
                    "p10_ms": round(p10 * 1e3, 3),
                    "p50_ms": round(p50 * 1e3, 3),
                    "p90_ms": round(p90 * 1e3, 3),
                    "step_gflops": round(step_flops / 1e9, 2),
                    "achieved_tflops": round(achieved / 1e12, 2),
                    "mfu": round(achieved / PEAK_FLOPS, 4),
                    "batch_scaling": scaling,
                    "tower_512": tower,
                    "v1_feature_ms_per_sample": v1_ms_per_sample,
                    **(
                        {"graph_build_5376": graph_build}
                        if graph_build
                        else {}
                    ),
                    **({"serving": serving} if serving else {}),
                    "backend": jax.default_backend(),
                    **(
                        {"backend_note": platform_note}
                        if platform_note
                        else {}
                    ),
                }
            )
        )


if __name__ == "__main__":
    main()
