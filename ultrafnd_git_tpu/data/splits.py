"""Stratified 70/15/15 split with the reference's safety fallbacks.

Parity target: reference `src/data_pipeline/fakesv_dataset.py:202-240`.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def stratified_indices(
    y: np.ndarray, frac: float, rng: np.random.Generator
) -> np.ndarray:
    """Pick ~frac of each class (at least one per present class)."""
    take = []
    for c in np.unique(y):
        cls_idx = np.where(y == c)[0]
        if cls_idx.size == 0:
            continue
        rng.shuffle(cls_idx)
        k = max(1, int(round(frac * cls_idx.size)))
        take.append(cls_idx[:k])
    return np.concatenate(take) if take else np.array([], dtype=int)


def make_split(
    labels: np.ndarray, rng: np.random.Generator
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stratified (train, val, test) ≈ (70, 15, 15) with non-empty guards."""
    n = labels.shape[0]
    all_idx = np.arange(n)
    rng.shuffle(all_idx)

    tr_idx = stratified_indices(labels, 0.70, rng)
    rem = np.setdiff1d(all_idx, tr_idx, assume_unique=False)

    val_frac_of_rem = 0.0
    if rem.size > 0:
        val_frac_of_rem = min(1.0, 0.15 / (rem.size / float(n)))
    va_take = stratified_indices(labels[rem], val_frac_of_rem, rng)
    va_idx = rem[va_take]
    te_idx = np.setdiff1d(rem, va_idx, assume_unique=False)

    if tr_idx.size == 0 and n > 0:
        tr_idx = all_idx[: max(1, int(0.7 * n))]
    if va_idx.size == 0 and n > 1:
        va_idx = all_idx[max(1, int(0.7 * n)) : max(1, int(0.85 * n))]
    if te_idx.size == 0 and n > 2:
        te_idx = np.setdiff1d(
            all_idx, np.concatenate([tr_idx, va_idx]), assume_unique=False
        )
    return tr_idx, va_idx, te_idx
