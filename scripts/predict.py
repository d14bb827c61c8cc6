#!/usr/bin/env python3
"""Score new records with a trained checkpoint (serving CLI).

Usage:
  python scripts/predict.py --out_dir outputs --input new_records.json
  python scripts/predict.py --out_dir outputs --input data.json --output preds.jsonl

`--input` takes `data_complete.json` semantics (one JSON array or JSONL of
records with title/ocr/comments). Output is one JSON object per record:
{id, prob_fake, label, semantic_conflict, temporal_delay,
emotion_intensity}; with `--explain`, each line also carries an "explain"
object with classifier attributions (Gradient x Input by default,
`--explain_method shap` for the SHAP ladder incl. the native jitted
KernelSHAP rung).
"""
import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def load_records(path: Path) -> list:
    with open(path, "r", encoding="utf-8-sig") as fh:
        # skip BOM/leading whitespace before sniffing array vs JSONL
        head = ""
        while True:
            ch = fh.read(1)
            if not ch or not ch.isspace():
                head = ch
                break
        fh.seek(0)
        if head == "[":
            return json.load(fh)
        return [json.loads(ln) for ln in fh if ln.strip()]


def main() -> None:
    ap = argparse.ArgumentParser(description="ultrafnd_git_tpu — predict")
    ap.add_argument("--out_dir", default=None,
                    help="Trained output dir (best checkpoint + cache)")
    ap.add_argument("--artifact", default=None,
                    help="AOT serving artifact dir (scripts/"
                         "export_serving.py) — scores from frozen "
                         "StableHLO, no checkpoint/model code needed; "
                         "mutually exclusive with --out_dir")
    ap.add_argument("--input", required=True,
                    help="JSON array or JSONL of records")
    ap.add_argument("--output", default=None,
                    help="Write JSONL here (default: stdout)")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--checkpoint", default="best", choices=("best", "latest"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 matmul activations (accelerator serving; "
                         "scores move within the bf16 envelope)")
    ap.add_argument("--quantize", action="store_true",
                    help="int8 serving weights (per-channel scales, "
                         "dequantized in-program; 4x less HBM weight "
                         "traffic — see ops/quant.py)")
    ap.add_argument("--serve_dp", type=int, default=None,
                    help="Shard each scoring dispatch's rows over this "
                         "many devices (replicated params, 'data' mesh); "
                         "predictions agree with single-device to 1 f32 "
                         "ulp")
    ap.add_argument("--explain", action="store_true",
                    help="Attach per-record classifier attributions "
                         "(adds an 'explain' object per line)")
    ap.add_argument("--explain_method", default="grad",
                    choices=("grad", "shap"),
                    help="grad = Gradient x Input (fast); shap = SHAP "
                         "ladder (shap package -> native jitted "
                         "KernelSHAP -> SmoothGrad)")
    ap.add_argument("--top_k", type=int, default=8,
                    help="Fused dimensions listed per record with --explain")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if bool(args.out_dir) == bool(args.artifact):
        ap.error("pass exactly one of --out_dir / --artifact")
    if args.artifact:
        if args.explain:
            ap.error("--explain needs the full-precision modules; use "
                     "--out_dir (see export_serving.ExportedPredictor)")
        # these properties are frozen into the artifact at export time
        # (recorded in its meta.json) — silently ignoring the flags
        # would hand back whatever precision the export used
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
    records = load_records(Path(args.input))
    if args.explain:
        results = predictor.explain(
            records, method=args.explain_method, top_k=args.top_k
        )
    else:
        results = predictor.predict(records)

    sink = open(args.output, "w", encoding="utf-8") if args.output else sys.stdout
    try:
        for r in results:
            sink.write(json.dumps(r, ensure_ascii=False) + "\n")
    finally:
        if args.output:
            sink.close()
            print(f"wrote {len(results)} predictions to {args.output}")


if __name__ == "__main__":
    main()
