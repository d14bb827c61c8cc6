#!/usr/bin/env python3
"""Accuracy-parity protocol: reference v2 trainer vs ours, identical setup.

Runs both CLIs on the *hard* fixture (tests/fixtures/fakesv_hard — built by
`scripts/make_fixture.py --hard`: distributional class signal + 10% label
flips, so AUC lands strictly inside (0.5, 1.0) and a 0.5-pt delta is
meaningful; the old 64-record fixture saturated both sides at AUC 1.0,
VERDICT r2 item 1) over N seeds and prints a mean/range table.

Protocol (reference defaults, `/root/reference/run_train_eval.py:36-39`):
epochs 12 (early stop patience 3), batch 16, lr 2e-4, wd 1e-4, CPU,
PYTHONHASHSEED=0 so the reference's Python-hash fallback embedding is
reproducible (SURVEY §7 "hard parts").
"""
from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
REFERENCE = Path("/root/reference")
FIXTURE = REPO / "tests" / "fixtures" / "fakesv_hard"

METRIC_RE = re.compile(
    r"Test (Loss|Acc|AUC|Precision|Recall|F1|Cmcs|Dfdr)\s*:?\s*([0-9.]+)"
)


def run_side(
    cmd: list[str],
    cwd: Path,
    timeout: int = 900,
    extra_env: dict[str, str] | None = None,
) -> dict[str, float]:
    """Run one CLI training subprocess under the pinned protocol env and
    parse its final-results block. Shared with scripts/salt_sweep.py so
    the metric-print format is parsed in exactly one place."""
    env = dict(
        os.environ,
        PYTHONHASHSEED="0",
        HF_HUB_OFFLINE="1",
        TRANSFORMERS_OFFLINE="1",
        JAX_PLATFORMS="cpu",
        **(extra_env or {}),
    )
    out = subprocess.run(
        cmd, cwd=cwd, env=env, capture_output=True, text=True, timeout=timeout
    )
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-2000:] + "\n")
        raise RuntimeError(f"command failed: {' '.join(cmd)}")
    metrics = {m.group(1).lower(): float(m.group(2)) for m in METRIC_RE.finditer(out.stdout)}
    if "auc" not in metrics:
        sys.stderr.write(out.stdout[-2000:] + "\n")
        raise RuntimeError("could not parse Test AUC from output")
    return metrics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[42, 43, 44])
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--out_json", default=None)
    args = ap.parse_args()

    if not (FIXTURE / "data_complete.json").exists():
        raise SystemExit("hard fixture missing — run scripts/make_fixture.py --hard")

    results: dict[str, list[dict[str, float]]] = {"reference": [], "ours": []}
    with tempfile.TemporaryDirectory() as td:
        for seed in args.seeds:
            common = [
                "--data_root", str(FIXTURE),
                "--epochs", str(args.epochs),
                "--batch_size", str(args.batch_size),
                "--seed", str(seed),
                "--cpu",
            ]
            ref = run_side(
                [sys.executable, "run_train_eval.py",
                 "--out_dir", f"{td}/ref_{seed}", *common],
                cwd=REFERENCE,
            )
            ours = run_side(
                [sys.executable, "run_train_eval.py",
                 "--out_dir", f"{td}/ours_{seed}", *common],
                cwd=REPO,
            )
            results["reference"].append(ref)
            results["ours"].append(ours)
            print(f"seed {seed}: ref auc={ref['auc']:.4f} acc={ref['acc']:.4f} "
                  f"f1={ref['f1']:.4f} | ours auc={ours['auc']:.4f} "
                  f"acc={ours['acc']:.4f} f1={ours['f1']:.4f}", flush=True)

    print("\n| metric | reference mean [min,max] | ours mean [min,max] | delta |")
    print("|---|---|---|---|")
    summary = {}
    for key in ("acc", "auc", "f1", "cmcs", "dfdr"):
        rv = [r[key] for r in results["reference"]]
        ov = [r[key] for r in results["ours"]]
        rm, om = statistics.mean(rv), statistics.mean(ov)
        summary[key] = {"reference": rv, "ours": ov, "delta": om - rm}
        print(f"| {key} | {rm:.4f} [{min(rv):.3f},{max(rv):.3f}] "
              f"| {om:.4f} [{min(ov):.3f},{max(ov):.3f}] | {om-rm:+.4f} |")

    if args.out_json:
        Path(args.out_json).write_text(json.dumps(
            {"seeds": args.seeds, "epochs": args.epochs,
             "batch_size": args.batch_size, "results": results,
             "summary": summary}, indent=2))
        print(f"\nwrote {args.out_json}")


if __name__ == "__main__":
    main()
