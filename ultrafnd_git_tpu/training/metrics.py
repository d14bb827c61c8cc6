"""Classification + forensic metrics.

Parity target: reference `src/training/metrics/forensic_metrics.py`.
Numerically identical definitions (host-side numpy/sklearn), in particular:

  * safe AUC            -> 0.5 when degenerate (ref :19-32)
  * score normalization -> (N,) probs / (N,2) probs / (N,2) logits (ref :35-56)
  * accuracy/AUC/P/R/F1 (+ optional confusion matrix) (ref :62-99)
  * CMCS = 1 - mean(clip(0.5*(semantic_conflict + temporal_delay))) (ref :105-119)
  * DFDR = TPR on the fake class at a threshold (ref :122-141)
  * epoch aggregation + compact fixed-order printer (ref :144-181)
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from sklearn.metrics import (
    accuracy_score,
    confusion_matrix,
    f1_score,
    precision_score,
    recall_score,
    roc_auc_score,
)


def _safe_auc(y_true: np.ndarray, y_prob: np.ndarray) -> float:
    """ROC AUC that returns chance level (0.5) instead of raising."""
    y_true = np.asarray(y_true)
    y_prob = np.asarray(y_prob)
    try:
        if y_true.size == 0 or np.unique(y_true).size < 2:
            return 0.5
        return float(roc_auc_score(y_true, y_prob))
    except Exception:
        return 0.5


# Public alias (the integrated trainer and external callers use this name,
# matching the reference's `auc_safe`, forensic_trainer_integrated.py:66).
safe_auc = _safe_auc


def _to_prob_1(y_score: np.ndarray) -> np.ndarray:
    """Normalize model outputs to positive-class probabilities of shape (N,).

    Accepts (N,) probabilities, (N,2) probabilities (rows ~sum to 1), or
    (N,2) logits (softmaxed here).
    """
    y_score = np.asarray(y_score)
    if y_score.ndim == 1:
        return y_score
    if y_score.ndim == 2 and y_score.shape[1] == 2:
        if np.allclose(y_score.sum(axis=1), 1.0, atol=1e-3):
            return y_score[:, 1]
        z = y_score - y_score.max(axis=1, keepdims=True)
        ez = np.exp(z)
        p = ez / np.clip(ez.sum(axis=1, keepdims=True), 1e-12, None)
        return p[:, 1]
    return np.max(y_score, axis=1)


def compute_classification_metrics(
    y_true: np.ndarray,
    y_score: np.ndarray,
    threshold: float = 0.5,
    include_cm: bool = False,
) -> Dict[str, float]:
    """Safe accuracy / AUC / precision / recall / F1 (+ cm_* when requested)."""
    y_true = np.asarray(y_true).astype(int)
    y_prob = _to_prob_1(y_score).astype(float)
    y_pred = (y_prob >= threshold).astype(int)

    has_data = bool(y_true.size)
    out: Dict[str, float] = {
        "accuracy": float(accuracy_score(y_true, y_pred)) if has_data else 0.0,
        "auc": _safe_auc(y_true, y_prob),
        "precision": float(precision_score(y_true, y_pred, zero_division=0))
        if has_data
        else 0.0,
        "recall": float(recall_score(y_true, y_pred, zero_division=0))
        if has_data
        else 0.0,
        "f1": float(f1_score(y_true, y_pred, zero_division=0)) if has_data else 0.0,
    }

    if include_cm and has_data:
        tn, fp, fn, tp = confusion_matrix(y_true, y_pred, labels=[0, 1]).ravel()
        out.update(
            cm_tn=float(tn), cm_fp=float(fp), cm_fn=float(fn), cm_tp=float(tp)
        )
    return out


def compute_cmcs(
    semantic_conflict: np.ndarray, temporal_delay: np.ndarray
) -> float:
    """Cross-Modal Consistency Score in [0,1]; higher = more consistent."""
    sc = np.asarray(semantic_conflict).astype(float)
    td = np.asarray(temporal_delay).astype(float)
    mix = np.clip(0.5 * (sc + td), 0.0, 1.0)
    return float(1.0 - mix.mean()) if mix.size else 0.0


def compute_dfdr(
    y_true: np.ndarray, y_score: np.ndarray, threshold: float = 0.5
) -> float:
    """DeepFake Detection Rate: TPR on the positive (fake) class."""
    y_true = np.asarray(y_true).astype(int)
    y_prob = _to_prob_1(y_score).astype(float)
    y_pred = (y_prob >= threshold).astype(int)

    pos = y_true == 1
    denom = float(pos.sum())
    if denom < 1.0:
        return 0.0
    return float((y_pred[pos] == 1).sum()) / denom


def aggregate_epoch_metrics(
    y_true: np.ndarray,
    y_score: np.ndarray,
    forensic: Optional[Dict[str, np.ndarray]] = None,
    threshold: float = 0.5,
    include_cm: bool = False,
) -> Dict[str, float]:
    """One-stop per-split/per-epoch aggregation used by the trainer."""
    metrics = compute_classification_metrics(
        y_true, y_score, threshold=threshold, include_cm=include_cm
    )
    if forensic:
        sc = forensic.get("semantic_conflict")
        td = forensic.get("temporal_delay")
        if sc is not None and td is not None:
            metrics["cmcs"] = compute_cmcs(sc, td)
        ei = forensic.get("emotion_intensity")
        if ei is not None:
            ei = np.asarray(ei).astype(float)
            metrics["emotion_intensity_mean"] = float(ei.mean()) if ei.size else 0.0
        metrics["dfdr"] = compute_dfdr(y_true, y_score, threshold=threshold)
    return metrics


_PRINT_ORDER = ("accuracy", "auc", "precision", "recall", "f1", "cmcs", "dfdr")


def pretty_print(split: str, m: Dict[str, float]) -> None:
    """Compact, stable-order log line per split."""
    line = " | ".join(f"{k}:{m[k]:.4f}" for k in _PRINT_ORDER if k in m)
    extras = [
        k for k in m if k not in _PRINT_ORDER and not k.startswith("cm_")
    ]
    if extras:
        line += " | " + " ".join(f"{k}:{m[k]:.4f}" for k in extras)
    print(f"[{split}] {line}")
