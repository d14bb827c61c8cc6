#!/usr/bin/env python3
"""Serving-throughput bench: records/s through Predictor.predict.

Trains a small model on the fixture once (cached in --out_dir), then
measures end-to-end scoring throughput — featurization + inductive graph
attachment + jitted forward — for repeated fixed-size request batches.
"""
import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("ULTRAFND_DISABLE_HF", "1")

FIXTURE = REPO / "tests" / "fixtures" / "fakesv_tiny"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="/tmp/ultrafnd_serve_bench")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--requests", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 matmul activations in the scorer")
    ap.add_argument("--quantize", action="store_true",
                    help="int8 serving weights (ops/quant.py)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ultrafnd_git_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from ultrafnd_git_tpu.serving import Predictor
    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig

    out = Path(args.out_dir)
    if not (out / "best").exists():
        print("training a fixture model once ...")
        trainer = ForensicTrainer(
            TrainConfig(
                data_root=str(FIXTURE),
                out_dir=str(out),
                batch_size=8,
                epochs=3,
                log_metrics_jsonl=False,
            )
        )
        trainer.fit()

    predictor = Predictor(
        str(out),
        batch_size=args.batch_size,
        bf16=args.bf16,
        quantize=args.quantize,
    )
    records = [
        {
            "video_id": f"q{i}",
            "title": f"外星人 入侵 地球 警告 第{i}期",
            "ocr": "外星 飞船 出现 危险",
            "comments": ["太可怕了"],
        }
        for i in range(args.requests)
    ]

    predictor.predict(records[: args.batch_size])  # warm/compile
    t0 = time.perf_counter()
    results = predictor.predict(records)
    dt = time.perf_counter() - t0
    assert len(results) == args.requests
    print(
        f"serving: {args.requests / dt:8.1f} records/s "
        f"({dt / args.requests * 1e3:.2f} ms/record, batch {args.batch_size}, "
        f"backend {jax.default_backend()})"
    )


if __name__ == "__main__":
    main()
