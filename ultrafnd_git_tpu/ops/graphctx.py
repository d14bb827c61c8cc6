"""Shared corpus graph context: compact node features + normalized graph.

One definition of the graph featurization used by BOTH the v2 trainer and
the serving Predictor — the slice widths and normalization must match the
checkpoint's training graph exactly, so they live in one place.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ultrafnd_git_tpu.models.gnn import normalize_adjacency
from ultrafnd_git_tpu.ops.jaccard import build_adj_from_ocr

# Compact per-modality slice widths (reference forensic_trainer.py:191-199:
# text 192 || audio 32 || visual 128 || temporal 64 = 416).
SLICES = (("text", 192), ("audio", 32), ("visual", 128), ("temporal", 64))


def compact_node_features(cache: Dict[str, Any]) -> np.ndarray:
    """(N, 416) row-L2-normalized compact modality concat."""
    xg = np.concatenate(
        [cache[key][:, :width] for key, width in SLICES], axis=1
    ).astype(np.float32)
    xg /= np.linalg.norm(xg, axis=1, keepdims=True) + 1e-9
    return xg


@dataclass
class GraphContext:
    xg: np.ndarray  # (N, F) compact node features
    adj: np.ndarray  # (N, N) thresholded binary adjacency, diag = 1
    a_norm: np.ndarray  # D^-1/2 (adj + I) D^-1/2
    ax: np.ndarray  # a_norm @ xg (constant first propagation)
    deg: np.ndarray  # (N,) degrees of (adj + I) — what a_norm normalizes by


def build_graph_context(
    cache: Dict[str, Any], thresh: float
) -> GraphContext:
    xg = compact_node_features(cache)
    adj = build_adj_from_ocr(cache["ocr_sets"], thresh=thresh)
    a_norm = np.asarray(
        normalize_adjacency(jnp.asarray(adj)), dtype=np.float32
    )
    ax = (a_norm @ xg).astype(np.float32)
    # normalize_adjacency adds I on top of adj's existing diagonal 1, so
    # the effective degree is adj.sum + 1 (diagonal weight becomes 2).
    deg = np.asarray(adj.sum(axis=1) + 1.0, dtype=np.float32)
    return GraphContext(xg=xg, adj=adj, a_norm=a_norm, ax=ax, deg=deg)
