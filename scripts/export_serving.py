#!/usr/bin/env python3
"""Freeze a trained out_dir into an AOT serving artifact (jax.export).

Usage:
  python scripts/export_serving.py --out_dir outputs --artifact artifacts/scorer
  python scripts/predict.py --artifact artifacts/scorer --input new.json
  python scripts/serve.py   --artifact artifacts/scorer --port 8080

The artifact carries the scoring program as serialized StableHLO (traced
once with a symbolic batch dim, lowered for cpu AND tpu by default), the
weights, and the frozen corpus context — serving from it needs no
checkpoint, no Flax model construction, and cannot drift from the
exported numerics. See ultrafnd_git_tpu/export_serving.py.
"""
import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser(
        description="ultrafnd_git_tpu — export AOT serving artifact"
    )
    ap.add_argument("--out_dir", required=True,
                    help="Trained output dir (best checkpoint + cache)")
    ap.add_argument("--artifact", required=True,
                    help="Directory to write the artifact into")
    ap.add_argument("--checkpoint", default="best", choices=("best", "latest"))
    ap.add_argument("--batch_size", type=int, default=64,
                    help="Default serving chunk size recorded in the "
                         "artifact (loaders can override)")
    ap.add_argument("--platforms", default="cpu,tpu",
                    help="Comma-separated lowering targets baked into the "
                         "one artifact (jax.export cross-platform "
                         "lowering; no TPU needed to emit the tpu copy)")
    ap.add_argument("--bf16", action="store_true",
                    help="Export the bf16-activation scoring program")
    ap.add_argument("--quantize", action="store_true",
                    help="Export int8 weights + in-program dequantize")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ultrafnd_git_tpu.export_serving import export_artifact
    from ultrafnd_git_tpu.serving import Predictor

    predictor = Predictor(
        args.out_dir,
        batch_size=args.batch_size,
        checkpoint_name=args.checkpoint,
        bf16=args.bf16,
        quantize=args.quantize,
    )
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    root = export_artifact(predictor, args.artifact, platforms=platforms)
    # report only the three artifact files — exporting into a
    # pre-existing directory must not count unrelated contents
    artifact_files = ("scorer.jaxexport", "arrays.npz", "meta.json")
    sizes = {
        name: (root / name).stat().st_size for name in artifact_files
    }
    extras = sorted(
        p.name for p in root.iterdir() if p.name not in artifact_files
    )
    if extras:
        print(f"⚠️  target dir holds unrelated files (not artifact "
              f"contents): {extras}")
    total = sum(sizes.values())
    detail = ", ".join(f"{n} {s / 1e6:.2f} MB" for n, s in sizes.items())
    print(f"exported {root} ({total / 1e6:.2f} MB: {detail}) "
          f"for platforms {list(platforms)}")


if __name__ == "__main__":
    main()
