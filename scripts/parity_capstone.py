#!/usr/bin/env python3
"""Zero-leakage capstone parity analysis (BASELINE.md "Capstone").

Pairs, per seed, the reference protocol runs (run_parity_protocol.py
--out_json) with our per-seed val-selected salt runs (salt_sweep.py
--select accuracy --out_json) on seeds that were never used for any
selection, and prints the paired-delta table with t statistics.

    python scripts/parity_capstone.py \
        benchmarks/parity/parity_hard_ext16.json:benchmarks/parity/salt_d_holdout_ext16.json \
        [more ref.json:ours.json pairs ...]

Each PAIR argument is `<reference_json>:<ours_json>`; seeds must match
within a pair. Multiple pairs pool.
"""
from __future__ import annotations

import json
import math
import sys
from pathlib import Path

METRICS = ("acc", "auc", "f1", "cmcs", "dfdr")


def load_pair(spec: str):
    ref_path, ours_path = spec.split(":")
    ref = json.loads(Path(ref_path).read_text())
    ours = json.loads(Path(ours_path).read_text())
    if list(map(int, ref["seeds"])) != list(map(int, ours["seeds"])):
        raise SystemExit(
            f"seed mismatch between {ref_path} ({ref['seeds']}) and "
            f"{ours_path} ({ours['seeds']})"
        )
    ref_rows = ref["results"]["reference"]
    ours_rows = {m: ours["summary"]["val-selected"][m] for m in METRICS}
    return ref["seeds"], ref_rows, ours_rows


def main() -> None:
    specs = sys.argv[1:] or [
        "benchmarks/parity/parity_hard_ext16.json:"
        "benchmarks/parity/salt_d_holdout_ext16.json"
    ]
    seeds, ref_all, ours_all = [], [], {m: [] for m in METRICS}
    for spec in specs:
        s, r, o = load_pair(spec)
        seeds += list(s)
        ref_all += r
        for m in METRICS:
            ours_all[m] += list(o[m])

    n = len(seeds)
    print(f"n = {n} untouched seeds: {seeds}")
    print("| metric | ours (val-selected) | reference | delta (t) |")
    print("|---|---|---|---|")
    for m in METRICS:
        r = [row[m] for row in ref_all]
        o = ours_all[m]
        d = [a - b for a, b in zip(o, r)]
        mean_d = sum(d) / n
        var = sum((x - mean_d) ** 2 for x in d) / (n - 1)
        t = mean_d / math.sqrt(var / n) if var > 0 else float("inf")
        print(
            f"| {m} | {sum(o) / n:.4f} | {sum(r) / n:.4f} "
            f"| {mean_d:+.4f} ({t:+.2f}) |"
        )


if __name__ == "__main__":
    main()
