"""Metrics parity: compares against the reference implementation when the
reference repo is mounted, plus standalone hand-checked cases."""
import sys

import numpy as np
import pytest

from ultrafnd_git_tpu.training.metrics import (
    _to_prob_1,
    aggregate_epoch_metrics,
    compute_classification_metrics,
    compute_cmcs,
    compute_dfdr,
)

REFERENCE = "/root/reference"


def test_hand_case():
    y = np.array([0, 1, 1, 0])
    p = np.array([0.1, 0.9, 0.4, 0.6])
    m = compute_classification_metrics(y, p, include_cm=True)
    # preds = [0, 1, 0, 1] -> acc 0.5, precision 0.5, recall 0.5
    assert m["accuracy"] == pytest.approx(0.5)
    assert m["precision"] == pytest.approx(0.5)
    assert m["recall"] == pytest.approx(0.5)
    assert m["cm_tp"] == 1.0 and m["cm_fn"] == 1.0


def test_safe_auc_single_class():
    m = compute_classification_metrics(np.zeros(4), np.linspace(0, 1, 4))
    assert m["auc"] == 0.5


def test_score_normalization_logits_vs_probs():
    logits = np.array([[2.0, 0.0], [0.0, 3.0]])
    p = _to_prob_1(logits)
    assert p[0] < 0.5 < p[1]
    probs = np.array([[0.7, 0.3], [0.2, 0.8]])
    np.testing.assert_allclose(_to_prob_1(probs), [0.3, 0.8])


def test_cmcs_dfdr():
    assert compute_cmcs(np.zeros(3), np.zeros(3)) == 1.0
    assert compute_cmcs(np.ones(3), np.ones(3)) == 0.0
    y = np.array([1, 1, 0])
    p = np.array([0.9, 0.1, 0.9])
    assert compute_dfdr(y, p) == pytest.approx(0.5)


def test_aggregate_includes_forensic():
    y = np.array([0, 1, 1, 0])
    p = np.array([0.1, 0.9, 0.4, 0.6])
    forensic = {
        "semantic_conflict": np.array([0.2, 0.4, 0.6, 0.8]),
        "temporal_delay": np.array([0.1, 0.1, 0.1, 0.1]),
        "emotion_intensity": np.array([0.5, 0.5, 0.5, 0.5]),
    }
    m = aggregate_epoch_metrics(y, p, forensic=forensic)
    assert {"cmcs", "dfdr", "emotion_intensity_mean"} <= set(m)


@pytest.mark.skipif(
    not __import__("os").path.isdir(REFERENCE), reason="reference not mounted"
)
def test_parity_with_reference(rng):
    sys.path.insert(0, REFERENCE)
    try:
        from src.training.metrics import forensic_metrics as ref
    finally:
        sys.path.remove(REFERENCE)

    y = rng.integers(0, 2, size=200)
    logits = rng.normal(size=(200, 2)).astype(np.float32)
    sc = rng.uniform(size=200)
    td = rng.uniform(size=200)
    ei = rng.uniform(size=200)
    forensic = {
        "semantic_conflict": sc,
        "temporal_delay": td,
        "emotion_intensity": ei,
    }

    ours = aggregate_epoch_metrics(y, logits, forensic=forensic, include_cm=True)
    theirs = ref.aggregate_epoch_metrics(y, logits, forensic=forensic, include_cm=True)
    assert set(ours) == set(theirs)
    for k in ours:
        assert ours[k] == pytest.approx(theirs[k], abs=1e-9), k
