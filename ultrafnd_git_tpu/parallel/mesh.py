"""Device mesh + sharding rules.

The reference is strictly single-device (SURVEY §2.9); this module is the
TPU-native scaling story: a 2-D `Mesh(('data', 'model'))` over which
  * batches shard on 'data' (pure data parallelism; gradient psum over ICI
    is inserted by XLA from the jit sharding annotations),
  * the fusion/classifier MLP pairs shard Megatron-style on 'model'
    (column-parallel first Dense, row-parallel second Dense) — optional at
    this model scale but exercised by the multichip dry run,
  * a 'sequence'/pipeline axis is left unpopulated by design: per SURVEY
    §5.7 the workload's sequences are tiny, so CP/PP are config hooks only.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    dp: Optional[int] = None, tp: int = 1, devices=None
) -> Mesh:
    """Build a (dp, tp) mesh over available (or given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        if len(devices) % tp != 0:
            raise ValueError(f"{len(devices)} devices not divisible by tp={tp}")
        dp = len(devices) // tp
    grid = mesh_utils.create_device_mesh((dp, tp), devices=devices[: dp * tp])
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_path(path: str, leaf) -> P:
    """Megatron-style specs for the large fusion/classifier MLPs."""
    if leaf.ndim == 2:
        # column-parallel first Dense of each MLP pair
        if any(k in path for k in ("fuse0", "pre0")):
            return P(None, MODEL_AXIS)
        # row-parallel second Dense (contracting dim sharded)
        if any(k in path for k in ("fuse1", "pre1")):
            return P(MODEL_AXIS, None)
    if leaf.ndim == 1 and any(k in path for k in ("fuse0", "pre0")):
        return P(MODEL_AXIS)
    return P()


def param_shardings(params: Dict[str, Any], mesh: Mesh):
    """NamedSharding pytree for the model params under `mesh`."""

    def assign(path, leaf):
        keys = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        return NamedSharding(mesh, _spec_for_path(keys, leaf))

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params, mesh: Mesh):
    """device_put the param pytree with its sharding rules."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, param_shardings(params, mesh)
    )


def pad_to_multiple(idx: np.ndarray, multiple: int) -> np.ndarray:
    """Pad a 1-D index array by repeating the last element."""
    r = len(idx) % multiple
    if r == 0:
        return idx
    pad = np.full(multiple - r, idx[-1] if len(idx) else 0, idx.dtype)
    return np.concatenate([idx, pad])
