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
consistency is free.

Commit protocol: meta.json presence implies a COMPLETE slot. The stale
meta is deleted before the state write is enqueued, and the new meta is
written (tmp + atomic rename) by a finalizer thread only after the Orbax
write commits. A crash at any point therefore leaves either no meta
(slot treated as absent) or a fully committed slot — never a fresh
meta.json over a partial/destroyed state dir, which `--resume` and
cross-process readers (Predictor, DeviceTextEncoder.from_checkpoint)
would otherwise misread as a valid checkpoint.
"""
from __future__ import annotations

import json
from concurrent.futures import Future, ThreadPoolExecutor
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import orbax.checkpoint as ocp

_ASYNC: Optional[ocp.AsyncCheckpointer] = None
_FINALIZERS: Optional[ThreadPoolExecutor] = None
_PENDING: List[Future] = []
_LAST_SLOT_FINALIZER: Dict[Path, Future] = {}


def _ckptr() -> ocp.AsyncCheckpointer:
    global _ASYNC
    if _ASYNC is None:
        _ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC


def _finalizer_pool() -> ThreadPoolExecutor:
    global _FINALIZERS
    if _FINALIZERS is None:
        # one worker: meta writes commit in save order
        _FINALIZERS = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-meta"
        )
    return _FINALIZERS


def wait_for_writes() -> None:
    """Barrier: block until every enqueued checkpoint write has landed
    (Orbax array writes AND the post-commit meta.json finalizers)."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()
    while _PENDING:
        _PENDING.pop(0).result()  # re-raises finalizer failures loudly


def save_checkpoint(
    directory: str, name: str, state: Any, meta: Dict[str, Any]
) -> None:
    """Enqueue an async full-state save of `state` into `directory/name`.

    Multi-process (`jax.distributed`): ALL processes must call this with
    the same arguments — Orbax's save is a collective (primary-host
    array writes + global barriers; executed 2-process for real by
    tests/test_multihost.py). The meta.json sidecar is written by
    process 0 only; every process's finalizer still barriers on the
    Orbax commit, so `wait_for_writes` keeps its meaning everywhere.
    """
    root = Path(directory).resolve() / name
    root.mkdir(parents=True, exist_ok=True)
    meta_path = root / "meta.json"
    # A still-pending finalizer from THIS slot's previous save could
    # otherwise re-create meta.json after the unlink below, while the new
    # force=True write is destroying the state dir — exactly the
    # fresh-meta-over-partial-state condition the protocol exists to
    # prevent. Cheap: Orbax's AsyncCheckpointer already serializes
    # back-to-back saves, so this only adds the meta-file write itself.
    prev = _LAST_SLOT_FINALIZER.get(root)
    if prev is not None:
        prev.result()  # re-raises an earlier finalizer failure loudly
    is_primary = jax.process_index() == 0
    # the old meta must not describe the in-flight overwrite (force=True
    # destroys the previous state dir before the new one commits)
    if is_primary:
        meta_path.unlink(missing_ok=True)
    ckptr = _ckptr()
    # device_get is safe multi-process because the trainers keep state
    # fully replicated (every process holds complete copies); sharded
    # states would pass the jax.Arrays straight through instead.
    ckptr.save(root / "state", jax.device_get(state), force=True)
    payload = json.dumps(meta, ensure_ascii=False, indent=2)

    def _commit_meta() -> None:
        ckptr.wait_until_finished()  # state write has landed
        if not is_primary:
            return  # one writer: the sidecar must not be raced
        tmp = meta_path.with_name("meta.json.tmp")
        tmp.write_text(payload, encoding="utf-8")
        tmp.replace(meta_path)  # atomic: meta presence == complete slot

    fut = _finalizer_pool().submit(_commit_meta)
    _PENDING.append(fut)
    _LAST_SLOT_FINALIZER[root] = fut


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


def load_checkpoint_raw(
    directory: str, name: str
) -> Optional[Tuple[Any, Dict[str, Any]]]:
    """Restore (state_tree, meta) WITHOUT a template pytree.

    Orbax's PyTreeCheckpointHandler can restore the stored structure
    as plain nested dicts of host arrays. Used by consumers that only
    need the weights and must not pay for building a full TrainState
    template (e.g. exporting a checkpoint without the feature cache
    the trainer/Predictor templates require)."""
    wait_for_writes()
    root = Path(directory).resolve() / name
    meta_path = root / "meta.json"
    if not meta_path.exists():
        return None
    try:
        state = _ckptr().restore(root / "state")
        with open(meta_path, "r", encoding="utf-8") as fh:
            meta = json.load(fh)
        return state, meta
    except Exception as exc:
        print(f"⚠️  failed to restore checkpoint {root}: {exc!r}")
        return None


def checkpoint_exists(directory: str, name: str) -> bool:
    return (Path(directory).resolve() / name / "meta.json").exists()
