#!/usr/bin/env python3
"""Pool unsalted parity-protocol batches into one paired-delta table.

Each argument is a `run_parity_protocol.py --out_json` file (reference +
ours on the same seeds, identical protocol). Seeds must be disjoint
across files; deltas are paired per seed and the t statistic is over the
pooled per-seed deltas.

    python scripts/parity_pooled.py benchmarks/parity/parity_hard_16.json \
        benchmarks/parity/parity_hard_ext16.json [...]

Defaults to all four checked-in batches (seeds 42-105, n=64).
"""
from __future__ import annotations

import json
import math
import sys
from pathlib import Path

METRICS = ("acc", "auc", "f1", "cmcs", "dfdr")
DEFAULT = [
    "benchmarks/parity/parity_hard_16.json",
    "benchmarks/parity/parity_hard_ext16.json",
    "benchmarks/parity/parity_hard_ext16b.json",
    "benchmarks/parity/parity_hard_ext16c.json",
]


def main() -> None:
    files = sys.argv[1:] or DEFAULT
    seeds, ref, ours = [], [], []
    for f in files:
        d = json.loads(Path(f).read_text())
        seeds += list(map(int, d["seeds"]))
        ref += d["results"]["reference"]
        ours += d["results"]["ours"]
    n = len(seeds)
    if len(set(seeds)) != n:
        raise SystemExit(f"overlapping seeds across {files}")
    print(f"pooled unsalted protocol batches: n={n} seeds, "
          f"{len(files)} files")
    print("| metric | reference | ours | delta | paired t |")
    print("|---|---|---|---|---|")
    for m in METRICS:
        dl = [o[m] - r[m] for o, r in zip(ours, ref)]
        mean = sum(dl) / n
        var = sum((x - mean) ** 2 for x in dl) / (n - 1)
        t = mean / math.sqrt(var / n) if var else float("inf")
        rm = sum(r[m] for r in ref) / n
        om = sum(o[m] for o in ours) / n
        print(f"| {m} | {rm:.4f} | {om:.4f} | {mean:+.4f} | {t:+.2f} |")


if __name__ == "__main__":
    main()
