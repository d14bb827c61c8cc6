#!/usr/bin/env python3
"""Serve a trained out_dir over HTTP (stdlib-only; see ultrafnd_git_tpu/server.py).

Usage:
  python scripts/serve.py --out_dir outputs --port 8080
  curl -s localhost:8080/healthz
  curl -s -X POST localhost:8080/predict -d '{"records": [{"video_id": "x", "title": "...", "ocr": "...", "comments": []}]}'
  curl -s -X POST localhost:8080/explain -d '{"records": [...], "method": "shap"}'
"""
import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser(description="ultrafnd_git_tpu — HTTP serving")
    ap.add_argument("--out_dir", default=None,
                    help="Trained output dir (best checkpoint + cache)")
    ap.add_argument("--artifact", default=None,
                    help="AOT serving artifact dir (scripts/"
                         "export_serving.py) — serves frozen StableHLO; "
                         "/explain is unavailable in this mode; mutually "
                         "exclusive with --out_dir")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--checkpoint", default="best", choices=("best", "latest"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 matmul activations (accelerator serving)")
    ap.add_argument("--quantize", action="store_true",
                    help="int8 serving weights (per-channel scales, "
                         "dequantized in-program; 4x less HBM weight "
                         "traffic — see ops/quant.py)")
    ap.add_argument("--verbose", action="store_true",
                    help="Log one line per HTTP request")
    ap.add_argument("--batch_window_ms", type=float, default=4.0,
                    help="Dynamic-batching window: concurrent /predict "
                         "requests arriving within it coalesce into ONE "
                         "device dispatch (exact — scoring is "
                         "row-independent). Negative disables coalescing; "
                         "0 still coalesces whatever queued while the "
                         "device was busy")
    ap.add_argument("--max_batch", type=int, default=4096,
                    help="Max coalesced records per dispatch")
    ap.add_argument("--gap_ms", type=float, default=3.0,
                    help="Close the batching window early once arrivals "
                         "go quiet for this long (window is the MAX "
                         "wait); synchronized client bursts otherwise "
                         "idle out the full window every cycle")
    ap.add_argument("--serve_dp", type=int, default=None,
                    help="Shard each scoring dispatch's rows over this "
                         "many devices (replicated params, 'data' mesh); "
                         "predictions agree with single-device to 1 f32 "
                         "ulp. Default: single device")
    ap.add_argument("--warmup", type=int, default=64, metavar="N",
                    help="Precompile the featurize/score bucket ladder "
                         "up to N records BEFORE opening the socket "
                         "(default 64; 0 disables) — live requests "
                         "otherwise pay ~0.7-1 s per novel bucket shape "
                         "over a tunneled chip: the 16-client HTTP "
                         "protocol measured 10.2 records/s on a cold "
                         "cache vs 146.3 warm (Predictor.warmup)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if bool(args.out_dir) == bool(args.artifact):
        ap.error("pass exactly one of --out_dir / --artifact")
    if args.artifact:
        # frozen into the artifact at export time (meta.json) — see
        # the matching guards in scripts/predict.py
        for flag, on in (
            ("--bf16", args.bf16),
            ("--quantize", args.quantize),
        ):
            if on:
                ap.error(f"{flag} is fixed at export time; re-export "
                         "with scripts/export_serving.py instead")
        if args.checkpoint != "best":
            ap.error("--checkpoint is fixed at export time; re-export "
                     "from the slot you want")

    from ultrafnd_git_tpu.server import make_server

    if args.artifact:
        from ultrafnd_git_tpu.export_serving import ExportedPredictor

        predictor = ExportedPredictor(
            args.artifact, batch_size=args.batch_size
        )
    else:
        from ultrafnd_git_tpu.serving import Predictor

        predictor = Predictor(
            args.out_dir,
            batch_size=args.batch_size,
            checkpoint_name=args.checkpoint,
            bf16=args.bf16,
            quantize=args.quantize,
            serve_dp=args.serve_dp,
        )
    if args.warmup > 0:
        import time

        t0 = time.perf_counter()
        n_buckets = predictor.warmup(args.warmup)
        print(
            f"warmup: {n_buckets} bucket sizes compiled in "
            f"{time.perf_counter() - t0:.1f}s",
            flush=True,
        )

    server = make_server(
        predictor,
        host=args.host,
        port=args.port,
        quiet=not args.verbose,
        batch_window_ms=(
            None if args.batch_window_ms < 0 else args.batch_window_ms
        ),
        max_batch=args.max_batch,
        gap_ms=args.gap_ms,
    )
    host, port = server.server_address[:2]
    print(f"serving {args.out_dir or args.artifact} on http://{host}:{port} "
          "(POST /predict, POST /explain, GET /healthz)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("\nshutting down")
        server.shutdown()
    finally:
        if server.batcher is not None:
            server.batcher.close()


if __name__ == "__main__":
    main()
