"""Shared trainer-skeleton helpers (one copy of the duplicated logic).

The reference ships two trainers of the same shape
(`src/training/forensic_trainer.py` and the orphan
`forensic_trainer_integrated.py`); the rebuild keeps both behaviors but
extracts the parts that were copy-pasted between them — ragged-batch
padding, val-AUC improvement / early-stop accounting, gated
best-checkpoint writes, the cross-kind checkpoint guard, JSONL logging
and profiler bracketing — so a fix lands once instead of twice
(round-1 history needed coordinated two-file fixes for exactly this
logic, twice).

Behavioral differences (graph mode, LR schedule, label smoothing, metric
sets) stay in the trainers; everything here is policy-free plumbing with
the reference semantics documented per helper.
"""
from __future__ import annotations

import json
import os
from contextlib import contextmanager
from typing import Any, Dict, Iterator, Optional, Tuple

import numpy as np

from ultrafnd_git_tpu.training import checkpoint as ckpt


def np_random_state_payload() -> list:
    """JSON-serializable snapshot of np.random's global MT19937 state.

    The trainers draw every epoch's batch shuffle from this stream
    (seeded once at init, reference semantics); checkpointing it is what
    makes a resumed run's REMAINING epochs shuffle identically to the
    uninterrupted run — the keystone of bit-exact step-granular resume
    (VERDICT r4 item 3)."""
    kind, keys, pos, has_gauss, cached = np.random.get_state()
    return [
        str(kind),
        np.asarray(keys, np.uint32).tolist(),
        int(pos),
        int(has_gauss),
        float(cached),
    ]


def restore_np_random_state(payload) -> None:
    kind, keys, pos, has_gauss, cached = payload
    np.random.set_state(
        (str(kind), np.asarray(keys, np.uint32), int(pos),
         int(has_gauss), float(cached))
    )


def iter_padded_batches(
    order: np.ndarray, batch_size: int, shuffle: bool
) -> Iterator[Tuple[np.ndarray, np.ndarray, int]]:
    """Yield (chunk, mask, valid) fixed-shape batches.

    The ragged last batch repeats its final index and masks the padding
    (fixed shapes -> no recompilation; reference DataLoaders instead drop
    or reshape). `shuffle` uses np.random's global stream, matching the
    trainers' seeded setup.
    """
    order = np.array(order, dtype=np.int32)
    if shuffle:
        np.random.shuffle(order)
    for s in range(0, len(order), batch_size):
        chunk = order[s : s + batch_size]
        valid = len(chunk)
        if valid < batch_size:
            chunk = np.concatenate(
                [chunk, np.full(batch_size - valid, chunk[-1], chunk.dtype)]
            )
        mask = np.zeros(batch_size, np.float32)
        mask[:valid] = 1.0
        yield chunk, mask, valid


def flatten_epoch_rows(
    batches, labels: np.ndarray, p1_mat, forensic_mat=None
):
    """Drop padded rows from stacked per-step outputs.

    batches: the epoch's [(chunk, mask, valid), ...] list;
    p1_mat: (S, B) probabilities; forensic_mat: optional (S, 3, B).
    Returns (y, p1_flat[, f_cat]) with exactly the valid rows, in step
    order — the one place the padded-row slicing convention lives (both
    trainers, both dispatch modes).
    """
    p1_mat = np.asarray(p1_mat)
    y = np.concatenate([labels[c[:v]] for (c, _, v) in batches])
    p1 = np.concatenate(
        [p1_mat[i, :v] for i, (_, _, v) in enumerate(batches)]
    )
    if forensic_mat is None:
        return y, p1
    forensic_mat = np.asarray(forensic_mat)
    f_cat = np.concatenate(
        [forensic_mat[i, :, :v] for i, (_, _, v) in enumerate(batches)],
        axis=1,
    )
    return y, p1, f_cat


class ImprovementTracker:
    """val-AUC improvement accounting + gated best-checkpoint writes.

    One copy of the reference semantics (`forensic_trainer.py:350-366`):
    improvement = val_auc > best + 1e-4; `best` checkpoint written only
    then (and only when save_best); early stop after `patience`
    non-improving epochs. Accounting is independent of save_best — only
    the WRITE is gated.
    """

    def __init__(
        self,
        out_dir: str,
        kind: str,
        save_best: bool,
        patience: int,
        min_delta: float = 1e-4,
        best: float = -1.0,
        no_improve: int = 0,
    ):
        self.out_dir = out_dir
        self.kind = kind
        self.save_best = save_best
        self.patience = int(patience)
        self.min_delta = float(min_delta)
        self.best = float(best)
        self.no_improve = int(no_improve)

    def meta(self, epoch: int, cfg_dict: Dict[str, Any]) -> Dict[str, Any]:
        return {
            "trainer": self.kind,
            "epoch": epoch,
            "best_val_auc": self.best,
            "no_improve": self.no_improve,
            "cfg": cfg_dict,
        }

    def update(
        self, val_auc: float, state, epoch: int, cfg_dict: Dict[str, Any]
    ) -> bool:
        """Record one epoch's val AUC; write `best` on improvement."""
        if val_auc > self.best + self.min_delta:
            self.best = float(val_auc)
            self.no_improve = 0
            if self.save_best:
                ckpt.save_checkpoint(
                    self.out_dir, "best", state, self.meta(epoch, cfg_dict)
                )
                print(
                    f"  ↳ saved best checkpoint to {self.out_dir}/best "
                    f"(val_auc={val_auc:.3f})"
                )
            return True
        self.no_improve += 1
        return False

    @property
    def should_stop(self) -> bool:
        return self.no_improve >= self.patience

    def announce_stop(self) -> None:
        print(
            "↳ Early stopping (no val AUC improvement for "
            f"{self.patience} epochs)"
        )


def load_checkpoint_guarded(
    out_dir: str, name: str, state, expected_kind: str, action: str
) -> Optional[Tuple[Any, Dict[str, Any]]]:
    """Restore a slot ONLY if its meta tag matches `expected_kind`.

    Cross-kind restores are the silent-wrong-weights hazard: the two
    trainers' GNN param shapes coincide at default dims. Untagged meta
    defaults to 'v2' (conservative: see trainer_integrated.test()).
    Returns None — with a visible warning — on a foreign checkpoint.
    """
    restored = ckpt.load_checkpoint(out_dir, name, state)
    if restored is None:
        return None
    kind = restored[1].get("trainer", "v2")
    if kind != expected_kind:
        print(
            f"⚠️  {name} checkpoint in {out_dir} was written by the "
            f"'{kind}' trainer — ignoring it and {action}"
        )
        return None
    return restored


def log_jsonl(out_dir: str, enabled: bool, record: Dict[str, Any]) -> None:
    """Append one epoch record to <out_dir>/metrics.jsonl (full precision;
    the console prints are 4-decimal). Under multi-process
    (`--multihost`) only process 0 writes — every process computes the
    identical replicated metrics, and concurrent appends to the shared
    out_dir would interleave duplicate lines."""
    if not enabled:
        return
    import jax

    if jax.process_count() > 1 and jax.process_index() != 0:
        return
    with open(
        os.path.join(out_dir, "metrics.jsonl"), "a", encoding="utf-8"
    ) as fh:
        fh.write(json.dumps(record, ensure_ascii=False) + "\n")


@contextmanager
def profiler_trace(profile_dir: Optional[str]):
    """Bracket a fit loop with a jax.profiler trace when requested."""
    import jax

    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        if profile_dir:
            jax.profiler.stop_trace()
