#!/usr/bin/env python3
"""Salt sweep: tune the hash-featurization draw on VALIDATION metrics.

The offline hash features are a random projection whose collision draw
measurably moves acc/F1 (BASELINE.md "Accuracy parity, attributed" — the
four-cell analysis traces the residual end-to-end acc gap to the draw,
not the trainer). `--hash_salt` makes the draw a tunable hyperparameter;
this script measures what tuning it honestly buys:

  for each seed:
    train once per salt in the ladder (unsalted "" is always included)
    select the salt by the BEST CHECKPOINT's validation metric
      (meta.json names the best epoch; metrics.jsonl has that epoch's
      val_accuracy/val_f1 — the test set is never consulted)
    report the selected run's TEST metrics

Compares three columns: unsalted (parity protocol), oracle-free
val-selected salt, and (if --ref_json from run_parity_protocol.py is
given) the reference side. Selection uses val accuracy by default since
acc/F1 is the attributed gap; AUC is draw-insensitive anyway.

Protocol matches scripts/run_parity_protocol.py: hard fixture, 12
epochs, batch 16, CPU, PYTHONHASHSEED=0.
"""
from __future__ import annotations

import argparse
import json
import statistics
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
FIXTURE = REPO / "tests" / "fixtures" / "fakesv_hard"

sys.path.insert(0, str(REPO / "scripts"))
from run_parity_protocol import run_side  # noqa: E402  (shared runner/parser)

# validation metrics metrics.jsonl actually records (val_* keys), plus
# the trainer's own "acc" alias — validated BEFORE any training run so a
# typo costs milliseconds, not a discarded 12-epoch run
SELECT_ALIASES = {"acc": "accuracy"}
SELECT_METRICS = {
    "accuracy", "auc", "precision", "recall", "f1", "cmcs", "dfdr",
}


def run_one(
    seed: int, salt: str, out_dir: str, epochs: int, batch_size: int
) -> dict:
    """Train once; return {'test': {...}, 'val': {...}, 'best_epoch': e}."""
    cmd = [
        sys.executable, "run_train_eval.py",
        "--data_root", str(FIXTURE),
        "--out_dir", out_dir,
        "--epochs", str(epochs),
        "--batch_size", str(batch_size),
        "--seed", str(seed),
        "--cpu",
    ]
    if salt:
        cmd += ["--hash_salt", salt]
    test = run_side(
        cmd, cwd=REPO, timeout=1800,
        extra_env={"ULTRAFND_DISABLE_HF": "1"},
    )
    meta = json.loads((Path(out_dir) / "best" / "meta.json").read_text())
    best_epoch = int(meta["epoch"])
    val = {}
    with open(Path(out_dir) / "metrics.jsonl") as fh:
        for line in fh:
            row = json.loads(line)
            if int(row.get("epoch", -1)) == best_epoch:
                val = {
                    k[len("val_"):]: v
                    for k, v in row.items()
                    if k.startswith("val_")
                }
                break
    if not val:
        raise RuntimeError(
            f"best epoch {best_epoch} not found in metrics.jsonl ({out_dir})"
        )
    return {"test": test, "val": val, "best_epoch": best_epoch}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+",
                    default=list(range(42, 50)))
    ap.add_argument("--salts", nargs="+", default=["a", "b", "c"],
                    help='salt ladder; unsalted "" is always included first')
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--select", default="accuracy",
                    help="validation metric that picks the salt per seed")
    ap.add_argument("--ref_json", default=None,
                    help="run_parity_protocol.py --out_json output; adds a "
                         "reference column for the SAME seeds")
    ap.add_argument("--out_json", default=None)
    args = ap.parse_args()

    if not (FIXTURE / "data_complete.json").exists():
        raise SystemExit(
            "hard fixture missing — run scripts/make_fixture.py --hard"
        )
    args.select = SELECT_ALIASES.get(args.select, args.select)
    if args.select not in SELECT_METRICS:
        raise SystemExit(
            f"--select {args.select!r} is not a recorded validation "
            f"metric; choose from {sorted(SELECT_METRICS)}"
        )

    salts = [""] + [s for s in args.salts if s]
    per_seed: dict[int, dict[str, dict]] = {}
    with tempfile.TemporaryDirectory() as td:
        for seed in args.seeds:
            per_seed[seed] = {}
            # out_dirs are indexed by ladder POSITION, not salt text — a
            # salt literally named "base" must not collide with the
            # unsalted run's directory (appended metrics.jsonl would
            # make selection read the wrong run's val metrics)
            for i, salt in enumerate(salts):
                r = run_one(
                    seed, salt, f"{td}/s{seed}_{i}",
                    args.epochs, args.batch_size,
                )
                per_seed[seed][salt] = r
                print(
                    f"seed {seed} salt={salt or '(none)':>6}: "
                    f"val_{args.select}={r['val'][args.select]:.4f} "
                    f"(epoch {r['best_epoch']}) | test acc={r['test']['acc']:.4f} "
                    f"auc={r['test']['auc']:.4f} f1={r['test']['f1']:.4f}",
                    flush=True,
                )

    # per-seed honest selection: argmax val metric, ties -> unsalted first
    selected = {
        seed: max(salts, key=lambda s: per_seed[seed][s]["val"][args.select])
        for seed in args.seeds
    }
    print("\nselected salts:",
          {s: (selected[s] or "(none)") for s in args.seeds})

    ref_rows = None
    if args.ref_json:
        ref = json.loads(Path(args.ref_json).read_text())
        by_seed = dict(zip(ref.get("seeds", []), ref["results"]["reference"]))
        if all(s in by_seed for s in args.seeds):
            ref_rows = [by_seed[s] for s in args.seeds]
        else:
            print(f"note: --ref_json seeds {ref.get('seeds')} don't cover "
                  "the sweep seeds; reference column omitted")

    cols = {"unsalted": lambda seed: per_seed[seed][""]["test"],
            "val-selected": lambda seed: per_seed[seed][selected[seed]]["test"]}
    header = "| metric | " + " | ".join(cols) + (
        " | reference |" if ref_rows else " |")
    print("\n" + header)
    print("|---" * (len(cols) + 1 + bool(ref_rows)) + "|")
    summary: dict = {"selected": {str(k): v for k, v in selected.items()}}
    for key in ("acc", "auc", "f1", "cmcs", "dfdr"):
        row = f"| {key} |"
        for name, get in cols.items():
            vals = [get(seed)[key] for seed in args.seeds]
            summary.setdefault(name, {})[key] = vals
            row += f" {statistics.mean(vals):.4f} |"
        if ref_rows:
            rv = [r[key] for r in ref_rows]
            summary.setdefault("reference", {})[key] = rv
            row += f" {statistics.mean(rv):.4f} |"
        print(row)

    if args.out_json:
        Path(args.out_json).write_text(json.dumps(
            {"seeds": args.seeds, "salts": salts, "select": args.select,
             "epochs": args.epochs, "batch_size": args.batch_size,
             "per_seed": {str(k): v for k, v in per_seed.items()},
             "summary": summary}, indent=2))
        print(f"\nwrote {args.out_json}")


if __name__ == "__main__":
    main()
