"""Graph stack: dense GCNs, graph builders, and a dependency-free fallback.

Parity targets:
  * SimpleGCN (reference `src/training/forensic_trainer.py:25-53`): 2-layer
    dense GCN, sym-normalized A-hat, GELU + dropout.
  * GNNModel (reference `src/models/gnn/gnn_model.py:7-37`): ReLU variant.
  * graph builders (reference `src/models/gnn/graph_builder.py`): cosine
    kNN adjacency, OCR-overlap weighting, temporal-inconsistency weighting —
    all vectorized here (the reference uses O(N^2) Python loops).
  * NumPy fallback GCN (reference `src/models/gnn/numpy_fallback.py`).

TPU-first notes: dense A_norm @ X @ W is exactly MXU-shaped work. The
normalization can be precomputed once per graph (`normalize_adjacency`) and
passed with `normalize=False` — the trainer does this so the per-step cost
is just the two propagation matmuls.
"""
from __future__ import annotations

from typing import Optional, Sequence, Set

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ultrafnd_git_tpu.models.initializers import torch_dense
from ultrafnd_git_tpu.ops.jaccard import incidence_matrix


def normalize_adjacency(adj: jnp.ndarray, add_self_loops: bool = True) -> jnp.ndarray:
    """D^{-1/2} (A + I) D^{-1/2} with the reference's 1e-9 degree epsilon."""
    n = adj.shape[0]
    a_hat = adj + jnp.eye(n, dtype=adj.dtype) if add_self_loops else adj
    deg = a_hat.sum(axis=-1) + 1e-9
    d = deg**-0.5
    return a_hat * d[:, None] * d[None, :]


class SimpleGCN(nn.Module):
    """Two-layer dense GCN (GELU), the trainer's graph encoder."""

    hid: int = 128
    out_dim: int = 128
    dropout: float = 0.3

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        adj: jnp.ndarray | None = None,
        deterministic: bool = True,
        normalize: bool = True,
        ax: jnp.ndarray | None = None,
        out_rows: jnp.ndarray | None = None,
        nbr_idx: jnp.ndarray | None = None,
        nbr_w: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """Two exact batching shortcuts for transductive training:

        ax: precomputed (normalized_adj @ x). Both the graph and the node
        features are constant, so the first propagation never changes —
        the trainer computes it once, removing an (N,N)@(N,F) matmul from
        every forward. Layer 1 is Dense(a @ x), so this is exact.

        out_rows: node indices whose embeddings are needed (the batch).
        Row i of the second propagation depends only on row i of `a`:
        z[rows] == Dense(a[rows] @ h), so computing just the batch rows
        replaces the (N,N)@(N,hid) matmul with (B,N)@(N,hid) — exact, and
        ~N/B cheaper. Layer 1 still runs over all nodes (the batch's
        neighbors span the whole graph).

        Sparse form (`--sparse_graph`): pass padded neighbor lists
        (nbr_idx, nbr_w) from ops/graphctx.build_sparse_graph_context
        INSTEAD of `adj` (requires `ax`; `normalize` must be False —
        the weights already carry the sym normalization). The second
        propagation becomes a gather + weighted sum over K neighbor
        slots per row — O(B·K·H) instead of O(B·N·H), and no (N, N)
        object anywhere. Same math as the dense row (a2 @ h reduces
        over h's rows in a different summation order, so agreement is
        f32-close, not bit-identical; tests/test_sparse_graph.py).
        """
        if nbr_idx is not None:
            if ax is None or normalize:
                raise ValueError(
                    "sparse GCN needs precomputed ax and normalize=False"
                )
            h = torch_dense(self.hid, ax.shape[-1], name="lin1")(ax)
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            rows_idx = nbr_idx if out_rows is None else nbr_idx[out_rows]
            rows_w = nbr_w if out_rows is None else nbr_w[out_rows]
            agg = jnp.einsum("rk,rkh->rh", rows_w, h[rows_idx])
            return torch_dense(self.out_dim, h.shape[-1], name="lin2")(agg)
        a = normalize_adjacency(adj) if normalize else adj
        ax_ = a @ x if ax is None else ax
        h = torch_dense(self.hid, ax_.shape[-1], name="lin1")(ax_)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        a2 = a if out_rows is None else a[out_rows]
        return torch_dense(self.out_dim, h.shape[-1], name="lin2")(a2 @ h)


class GNNModel(nn.Module):
    """ReLU 2-layer GCN variant (kept for API parity with the reference)."""

    hid: int = 256
    out_dim: int = 128
    dropout: float = 0.2

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        adj: jnp.ndarray,
        deterministic: bool = True,
        normalize: bool = True,
    ) -> jnp.ndarray:
        a = normalize_adjacency(adj) if normalize else adj
        h = nn.relu(a @ torch_dense(self.hid, x.shape[-1], name="lin1")(x))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return torch_dense(self.out_dim, h.shape[-1], name="lin2")(a @ h)


# ----------------------------------------------------------------------
# Graph builders (vectorized)
# ----------------------------------------------------------------------

def cosine_knn(X: np.ndarray, k: int = 8) -> np.ndarray:
    """Symmetric cosine-kNN 0/1 adjacency with self-loops."""
    X = np.asarray(X, dtype=np.float32)
    Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-9)
    S = Xn @ Xn.T
    np.fill_diagonal(S, -1.0)
    n = X.shape[0]
    kk = min(k, max(1, n - 1))
    nbrs = np.argpartition(-S, kk - 1, axis=1)[:, :kk]  # (N, k)
    A = np.zeros((n, n), dtype=np.float32)
    rows = np.repeat(np.arange(n), kk)
    A[rows, nbrs.ravel()] = 1.0
    A = np.maximum(A, A.T)  # symmetrize
    A += np.eye(n, dtype=np.float32)
    return A


def add_ocr_overlap_weights(
    A: np.ndarray, ocr_sets: Sequence[Set[str]], alpha: float = 0.4
) -> np.ndarray:
    """A += alpha * log1p(|overlap|) off-diagonal, via one incidence matmul."""
    m = incidence_matrix(ocr_sets)
    overlap = m @ m.T
    np.fill_diagonal(overlap, 0.0)
    return A + alpha * np.log1p(overlap).astype(np.float32)


def add_temporal_inconsistency(
    A: np.ndarray, delay_scores: np.ndarray, beta: float = 0.25
) -> np.ndarray:
    """Scale edges by 1 + beta * |delay_i - delay_j| (diagonal untouched)."""
    d = np.asarray(delay_scores, dtype=np.float32)
    w = 1.0 + beta * np.abs(d[:, None] - d[None, :])
    np.fill_diagonal(w, 1.0)
    return A * w


def build_dense_adj(
    X: np.ndarray,
    ocr_sets: Sequence[Set[str]],
    delay_scores: np.ndarray,
    k: int = 8,
    alpha: float = 0.4,
    beta: float = 0.25,
) -> np.ndarray:
    """kNN + OCR overlap + temporal inconsistency composition."""
    A = cosine_knn(X, k=k)
    A = add_ocr_overlap_weights(A, ocr_sets, alpha=alpha)
    return add_temporal_inconsistency(A, delay_scores, beta=beta)


# ----------------------------------------------------------------------
# Dependency-free NumPy GCN (quick tests anywhere)
# ----------------------------------------------------------------------

def normalize_adj(A: np.ndarray) -> np.ndarray:
    deg = A.sum(axis=1)
    d = 1.0 / (np.sqrt(deg) + 1e-9)
    return A * d[:, None] * d[None, :]


class GNNSimple:
    """Tiny numpy GCN with manual softmax-CE backward and SGD."""

    def __init__(self, in_dim: int, hid: int = 256, layers: int = 2,
                 num_classes: int = 2, seed: int = 42):
        rng = np.random.default_rng(seed)
        dims = [in_dim] + [hid] * (layers - 1) + [num_classes]
        self.W = [
            (rng.standard_normal((a, b)) * 0.05).astype(np.float32)
            for a, b in zip(dims[:-1], dims[1:])
        ]
        self.cache: dict = {}

    def forward(self, X: np.ndarray, A_norm: np.ndarray) -> np.ndarray:
        H = X
        self.cache["H"] = [H]
        for W in self.W[:-1]:
            H = np.maximum(0.0, A_norm @ H @ W)
            self.cache["H"].append(H)
        Z = A_norm @ H @ self.W[-1]
        ez = np.exp(Z - Z.max(axis=1, keepdims=True))
        P = ez / (ez.sum(axis=1, keepdims=True) + 1e-9)
        self.cache["P"] = P
        return P

    def backward(self, A_norm: np.ndarray, y_true: np.ndarray,
                 mask: np.ndarray, lr: float = 0.02, wd: float = 1e-4) -> None:
        P = self.cache["P"]
        n = P.shape[0]
        Y = np.zeros_like(P)
        Y[np.arange(n), y_true] = 1.0
        G = (P - Y) / (mask.sum() + 1e-9)
        G *= mask[:, None].astype(np.float32)

        # Layer k: pre_k = A H_k W_k, H_{k+1} = relu(pre_k). Gradients:
        #   dW_k = (A H_k)^T dpre_k
        #   dH_k = A^T dpre_k W_k^T   <- the A^T factor is part of the math
        Hs = self.cache["H"]
        grads = [None] * len(self.W)
        grads[-1] = (A_norm @ Hs[-1]).T @ G + wd * self.W[-1]
        Gh = (A_norm.T @ G @ self.W[-1].T) * (Hs[-1] > 0)
        for li in reversed(range(len(self.W) - 1)):
            grads[li] = (A_norm @ Hs[li]).T @ Gh + wd * self.W[li]
            if li > 0:
                Gh = (A_norm.T @ Gh @ self.W[li].T) * (Hs[li] > 0)
        for i, g in enumerate(grads):
            self.W[i] -= lr * g

    def predict(self, X: np.ndarray, A_norm: np.ndarray) -> np.ndarray:
        return np.argmax(self.forward(X, A_norm), axis=1)
