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


@dataclass
class SparseGraphContext:
    """Padded-neighbor-list form of the SAME normalized graph.

    O(N·K) storage instead of the dense (N, N) a_norm — the object that
    outgrows memory first (40 GB at N=100k f32; SURVEY §7 "hard parts"
    flags exactly this). K = 1 + max degree; row i holds [self,
    neighbors..., padding]: `nbr_idx[i, 0] = i` with the normalized
    self-loop weight 2·d_i·d_i, neighbor slots carry d_i·d_j, padding
    repeats i with weight 0 (in-bounds gathers, zero contribution, and
    row-local under `--shard_graph` row sharding).

    Weight provenance: computed in numpy f32 with the dense path's op
    order ((a_hat·d_i)·d_j on deg = rowsum + 1e-9), so entries agree
    with `normalize_adjacency` to float32 rounding (~1 ulp — the dense
    path evaluates `deg**-0.5` through XLA, whose libm may round the
    odd ulp differently). Downstream agreement is asserted at rtol 1e-6
    by tests/test_sparse_graph.py, not bit-exactness.
    """

    xg: np.ndarray  # (N, F) compact node features
    nbr_idx: np.ndarray  # (N, K) int32 neighbor ids, slot 0 = self
    nbr_w: np.ndarray  # (N, K) f32 normalized weights, 0 = padding
    ax: np.ndarray  # (N, F) = a_norm @ xg, computed sparsely
    deg: np.ndarray  # (N,) degrees of (adj + I) — same field as dense
    k_max: int


def build_sparse_graph_context(
    cache: Dict[str, Any], thresh: float
) -> SparseGraphContext:
    from ultrafnd_git_tpu.ops.jaccard import build_edges_from_ocr

    xg = compact_node_features(cache)
    n, f = xg.shape
    src, dst, _w = build_edges_from_ocr(cache["ocr_sets"], thresh=thresh)
    counts = (
        np.bincount(src, minlength=n).astype(np.int64)
        if n else np.zeros(0, np.int64)
    )
    k_max = int(counts.max()) + 1 if n else 1
    if n and k_max > max(64, n // 4):
        # padded lists cost O(N·K_max): one hub node inflates EVERY row.
        # Past ~N/4 the dense (N, N) matmul is both smaller and faster
        # on the MXU — tell the operator instead of silently degrading.
        import warnings

        warnings.warn(
            f"sparse graph: max degree {k_max - 1} of N={n} makes the "
            f"padded neighbor lists {n}x{k_max} "
            f"({n * k_max * 8 / 2**20:.0f} MB); past ~N/4 the dense "
            "adjacency (--shard_graph for growth) is the better layout",
            stacklevel=2,
        )

    # normalized weights, dense op order: deg_hat = rowsum(a_hat) + 1e-9
    # with binary a_hat = adj + I (adj carries diag 1 -> diag weight 2),
    # d = deg_hat**-0.5, entry = (a_hat * d_i) * d_j
    deg_hat = (counts + 2.0 + 1e-9).astype(np.float32)
    d = deg_hat**-0.5

    nbr_idx = np.tile(
        np.arange(n, dtype=np.int32)[:, None], (1, k_max)
    )
    nbr_w = np.zeros((n, k_max), dtype=np.float32)
    nbr_w[:, 0] = (2.0 * d).astype(np.float32) * d  # self-loop slot
    if len(src):
        # edges are sorted by (src, dst): slot positions are the running
        # count within each src row, offset by the self slot
        slot = np.ones(len(src), dtype=np.int64)
        row_start = np.searchsorted(src, np.arange(n))
        slot += np.arange(len(src)) - row_start[src]
        nbr_idx[src, slot] = dst
        nbr_w[src, slot] = (1.0 * d[src]).astype(np.float32) * d[dst]

    # first propagation a_norm @ xg without materializing a_norm:
    # row-chunked gather-weight-sum keeps the transient at
    # O(chunk · K · F)
    ax = np.empty((n, f), dtype=np.float32)
    chunk = max(1, min(n, (1 << 26) // max(1, k_max * f)))
    for s in range(0, n, chunk):
        idx_c = nbr_idx[s : s + chunk]
        w_c = nbr_w[s : s + chunk]
        ax[s : s + chunk] = np.einsum(
            "rk,rkf->rf", w_c, xg[idx_c], optimize=True
        )

    deg = (counts + 2.0).astype(np.float32)  # adj.sum + 1, as dense
    return SparseGraphContext(
        xg=xg, nbr_idx=nbr_idx, nbr_w=nbr_w, ax=ax, deg=deg, k_max=k_max
    )
