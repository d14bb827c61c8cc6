"""Checkpointing: full-train-state Orbax checkpoints with best/latest slots.

The reference saves best-only model weights via torch.save and cannot
resume training (`src/training/forensic_trainer.py:350-361`, SURVEY §5.4).
Here:
  * `best`   — written when val AUC improves (same semantics),
  * `latest` — written every epoch for restart-from-latest fault recovery,
both containing the FULL TrainState (params + optimizer moments + step +
PRNG) plus a JSON metadata sidecar (epoch, best metric, config).

Saves are ASYNC (SURVEY §5.4 "Orbax async checkpointing"): `save_checkpoint`
enqueues the array writes on Orbax's background thread and returns, so the
per-epoch `latest` write overlaps the next epoch's compute. Every read
path barriers first (`load_checkpoint` calls `wait_for_writes`), and the
AsyncCheckpointer itself serializes back-to-back saves, so in-process
consistency is free. A crash mid-write leaves a partial slot whose restore
fails loudly into the warn-and-start-fresh path below — the same behavior
as any corrupt checkpoint.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

_ASYNC: Optional[ocp.AsyncCheckpointer] = None


def _ckptr() -> ocp.AsyncCheckpointer:
    global _ASYNC
    if _ASYNC is None:
        _ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC


def wait_for_writes() -> None:
    """Barrier: block until every enqueued checkpoint write has landed."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def save_checkpoint(
    directory: str, name: str, state: Any, meta: Dict[str, Any]
) -> None:
    root = Path(directory).resolve() / name
    _ckptr().save(root / "state", jax.device_get(state), force=True)
    with open(root / "meta.json", "w", encoding="utf-8") as fh:
        json.dump(meta, fh, ensure_ascii=False, indent=2)


def load_checkpoint(
    directory: str, name: str, target: Any
) -> Optional[Tuple[Any, Dict[str, Any]]]:
    """Restore (state, meta), or None if the slot doesn't exist."""
    wait_for_writes()  # a same-process save may still be in flight
    root = Path(directory).resolve() / name
    meta_path = root / "meta.json"
    if not meta_path.exists():
        return None
    try:
        state = _ckptr().restore(root / "state", item=jax.device_get(target))
        with open(meta_path, "r", encoding="utf-8") as fh:
            meta = json.load(fh)
        return state, meta
    except Exception as exc:  # corrupt/partial checkpoint, pytree mismatch
        # Distinguishable from the absent-slot None above: a corrupt slot
        # would otherwise silently restart training / eval current params.
        print(f"⚠️  failed to restore checkpoint {root}: {exc!r}")
        return None


def checkpoint_exists(directory: str, name: str) -> bool:
    return (Path(directory).resolve() / name / "meta.json").exists()
