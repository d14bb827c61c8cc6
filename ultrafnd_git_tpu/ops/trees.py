"""Vectorized NODE-lite oblivious-tree routing.

Parity target: reference `src/models/fusion/deep_truth_classifier.py:28-90`
(`_ObliviousTree` / `NODEEnsemble`). The reference loops over trees and over
depths in Python, doubling a leaf-probability tensor at each depth. Here the
whole ensemble is three einsums over stacked parameters:

    alpha  = softmax(gates)                      (T, K, F)
    choice = x . alpha                           (B, T, K)
    s      = sigmoid(tau * (choice - thresh))    (B, T, K)   "go right"
    P[b,t,l] = prod_k  s  if bit_k(l) else 1-s   (B, T, L=2^K)
    logits = P @ leaf_logits                     (B, T, C)

Leaf-index convention matches the reference's `cat([p*left, p*right])`
doubling: bit k of leaf index l is `(l >> k) & 1`, 1 = right at depth k.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def leaf_bit_matrix(depth: int) -> np.ndarray:
    """(depth, 2^depth) 0/1 matrix; bits[k, l] = 1 iff leaf l goes right at k."""
    leaves = np.arange(1 << depth)
    ks = np.arange(depth)
    return ((leaves[None, :] >> ks[:, None]) & 1).astype(np.float32)


def oblivious_forest_logits(
    x: jnp.ndarray,
    gates: jnp.ndarray,
    thresh: jnp.ndarray,
    leaf_logits: jnp.ndarray,
    tau: float,
) -> jnp.ndarray:
    """Per-tree logits for a whole forest in one shot.

    x:           (B, F)
    gates:       (T, K, F)  feature-gate logits (softmaxed over F)
    thresh:      (T, K)     per-depth thresholds
    leaf_logits: (T, L, C)  with L == 2^K
    returns      (B, T, C)  per-tree logits (mean over T gives the ensemble)
    """
    depth = gates.shape[1]
    alpha = jnp.exp(gates - gates.max(axis=-1, keepdims=True))
    alpha = alpha / alpha.sum(axis=-1, keepdims=True)  # softmax over features
    # tiny contraction, but the soft feature choice feeds a tau-sharpened
    # sigmoid -> use exact accumulation so routing is precision-stable
    choice = jnp.einsum(
        "bf,tkf->btk", x, alpha, precision=jax.lax.Precision.HIGHEST
    )  # (B, T, K)
    s = jnp.asarray(1.0 / (1.0 + jnp.exp(-tau * (choice - thresh))))  # right prob

    bits = jnp.asarray(leaf_bit_matrix(depth))  # (K, L)
    # (B, T, K, 1) vs (K, L) -> (B, T, K, L) branch probabilities, product over K
    branch = bits * s[..., None] + (1.0 - bits) * (1.0 - s[..., None])
    leaf_probs = jnp.prod(branch, axis=2)  # (B, T, L)

    return jnp.einsum(
        "btl,tlc->btc", leaf_probs, leaf_logits,
        precision=jax.lax.Precision.HIGHEST,
    )
