"""Validation-selected hash-salt search (`--auto_salt`).

BASELINE.md ("Tuning the draw") established that the offline hash
featurization draw — not the trainer — carries the residual accuracy
variance vs the reference, and that selecting a draw on VALIDATION
metrics generalizes to held-out seeds (+6.8 pt acc / +15.8 pt F1 over
unsalted on 16 fresh seeds). This module promotes that protocol from an
offline script (`scripts/salt_sweep.py`) into a first-class training
lever: train one full run per candidate salt, pick the winner by the
run's best validation `select_metric`, and adopt the winner's artifacts
into the requested `out_dir` so `--eval_only`, `scripts/predict.py`,
and `scripts/serve.py` transparently serve the tuned draw.

The test set is never consulted; selection uses exactly the metric the
trainer already tracks for best-checkpoint selection. The reference has
no analogous lever (its draw is pinned by `PYTHONHASHSEED`; reference
`src/data/fakesv_dataset.py` hash fallback) — this is TPU-rebuild
surface, not a parity port.

Each candidate trains sequentially in this process: `ForensicTrainer`
pins the process-wide salt (`ops/hashing.set_hash_salt`) in its
constructor, so runs cannot interleave. Candidate runs live under
`out_dir/salt_search/<tag>/` and are kept for inspection.
"""
from __future__ import annotations

import dataclasses
import json
import shutil
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple


def _tag(salt: str) -> str:
    """Filesystem tag for a candidate salt ('' -> 'unsalted').

    Sanitization can collide ('a.b' and 'a_b' both -> 'salt_a_b'), so a
    short FNV digest of the RAW salt disambiguates whenever any
    character was rewritten — distinct candidates always get distinct
    run directories.
    """
    if salt == "":
        return "unsalted"
    safe = "".join(c if (c.isalnum() or c in "-_") else "_" for c in salt)
    if safe != salt:
        import hashlib  # NOT fnv1a_64: that hashes under the LIVE salt

        safe = f"{safe}_{hashlib.sha1(salt.encode()).hexdigest()[:6]}"
    return f"salt_{safe}"


def search_hash_salt(
    cfg,
    salts: Sequence[str],
    trainer_cls=None,
) -> Tuple[str, Dict[str, float]]:
    """Train one run per candidate salt; adopt the winner into cfg.out_dir.

    `salts` are the candidate draws; the unsalted draw ('') is always
    included as the baseline candidate. Returns `(winner_salt, scores)`
    where `scores[salt]` is that run's best validation `select_metric`
    (what `ForensicTrainer.fit` returns).

    After the search, `cfg.out_dir` contains the winner's `best`/`latest`
    slots, feature cache, and a `salt_search.json` record — the directory
    is indistinguishable from one trained directly with
    `--hash_salt <winner>`.
    """
    if trainer_cls is None:  # late import: trainer imports are heavy
        from ultrafnd_git_tpu.training.trainer import ForensicTrainer

        trainer_cls = ForensicTrainer

    candidates: List[str] = [""]
    for s in salts:
        if s not in candidates:
            candidates.append(s)
    if len(candidates) < 2:
        raise ValueError(
            "--auto_salt needs at least one non-empty candidate salt "
            "(the unsalted draw is always included as the baseline)"
        )

    out_root = Path(cfg.out_dir).resolve()
    search_root = out_root / "salt_search"
    scores: Dict[str, float] = {}
    for salt in candidates:
        run_dir = search_root / _tag(salt)
        sub = dataclasses.replace(
            cfg, hash_salt=salt, out_dir=str(run_dir), eval_only=False
        )
        print(f"\n>>> [auto_salt] training candidate {_tag(salt)!r}")
        trainer = trainer_cls(sub)
        scores[salt] = float(trainer.fit())
        del trainer

    sel = {"acc": "accuracy"}.get(cfg.select_metric, cfg.select_metric)
    winner = max(candidates, key=lambda s: scores[s])
    print(f"\n==== auto_salt: best val {sel} per candidate ====")
    for salt in candidates:
        mark = " <- selected" if salt == winner else ""
        print(f"  {_tag(salt):>16}: {scores[salt]:.4f}{mark}")

    _adopt(search_root / _tag(winner), out_root)
    # leave the process-wide draw on the WINNER (each candidate trainer
    # pinned its own salt in its constructor; without this, post-search
    # featurization in this process would use the LAST candidate's draw
    # against checkpoints trained under the winner's)
    from ultrafnd_git_tpu.ops.hashing import set_hash_salt

    set_hash_salt(winner)
    record = {
        "winner": winner,
        "select_metric": sel,
        # keyed by the RAW salt ('' = unsalted); tags are directory names
        "val_scores": {s: scores[s] for s in candidates},
        "run_dirs": {s: _tag(s) for s in candidates},
        "candidates": candidates,
    }
    (out_root / "salt_search.json").write_text(json.dumps(record, indent=2))
    return winner, scores


def _adopt(run_dir: Path, out_root: Path) -> None:
    """Copy a candidate run's artifacts up into the requested out_dir.

    Orbax slots are plain directories (checkpoint.py layout: `<slot>/
    meta.json` + `<slot>/state/`); the feature cache and metrics log ride
    along so `Predictor(out_dir)` and `--resume` see a directory bit-for-
    bit equivalent to a direct `--hash_salt <winner>` run. The slot copy
    happens only after the candidate's own save committed (save_checkpoint
    writes meta.json post-commit), so meta-present implies state-complete.
    """
    for name in ("best", "latest"):
        src = run_dir / name
        if not src.exists():
            continue
        dst = out_root / name
        if dst.exists():
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
    for fname in ("feature_cache.npz", "metrics.jsonl"):
        src = run_dir / fname
        if src.exists():
            shutil.copy2(src, out_root / fname)


def parse_salt_list(spec: Optional[str]) -> List[str]:
    """'a,b,c' -> ['a','b','c'] (empty segments dropped; None -> [])."""
    if not spec:
        return []
    return [s for s in (part.strip() for part in spec.split(",")) if s]
