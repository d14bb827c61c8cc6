"""Trainer integration tests on the hermetic fixture (8 virtual CPU devices)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end trainer/mesh compiles

from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig

EXPECTED_KEYS = {
    "test_loss", "test_acc", "test_auc", "test_precision",
    "test_recall", "test_f1", "test_cmcs", "test_dfdr",
}


@pytest.fixture(scope="module")
def fixture_root():
    from pathlib import Path

    return str(Path(__file__).resolve().parent / "fixtures" / "fakesv_tiny")


def _cfg(root, tmp, **kw):
    base = dict(
        data_root=root,
        ocr_phrase_pkl=None,
        out_dir=str(tmp),
        batch_size=16,
        epochs=1,
        seed=42,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_trainer_zero_epochs_then_test(fixture_root, tmp_path):
    """Reference smoke-test pattern: epochs=0 init + .test() key contract."""
    t = ForensicTrainer(_cfg(fixture_root, tmp_path, epochs=0))
    res = t.test()
    assert EXPECTED_KEYS <= set(res)
    assert 0.0 <= res["test_acc"] <= 1.0


def test_trainer_one_epoch_improves_and_checkpoints(fixture_root, tmp_path):
    t = ForensicTrainer(_cfg(fixture_root, tmp_path, epochs=2))
    best = t.fit()
    assert best > 0.5  # fixture is separable; AUC should beat chance fast
    assert (tmp_path / "best" / "meta.json").exists()
    assert (tmp_path / "latest" / "meta.json").exists()
    assert (tmp_path / "metrics.jsonl").exists()
    res = t.test()
    assert res["test_auc"] > 0.5


def test_eval_only_reuses_cache(fixture_root, tmp_path):
    t1 = ForensicTrainer(_cfg(fixture_root, tmp_path, epochs=1))
    t1.fit()
    # second construction must load the persisted cache, not rebuild
    assert (tmp_path / "feature_cache.npz").exists()
    t2 = ForensicTrainer(_cfg(fixture_root, tmp_path, epochs=0))
    np.testing.assert_allclose(t2.cache["text"], t1.cache["text"])
    res = t2.test()  # restores t1's best checkpoint
    assert EXPECTED_KEYS <= set(res)


def test_select_metric_drives_selection_and_validates(fixture_root, tmp_path):
    # invalid metric fails loudly at fit() time
    t = ForensicTrainer(
        _cfg(fixture_root, tmp_path / "bad", epochs=1, select_metric="loss")
    )
    with pytest.raises(ValueError, match="select_metric"):
        t.fit()
    # "acc" (alias for accuracy) trains end-to-end and checkpoints
    t2 = ForensicTrainer(
        _cfg(fixture_root, tmp_path / "acc", epochs=2, select_metric="acc")
    )
    best = t2.fit()
    assert best > 0.5  # best val ACCURACY on the separable fixture
    res = t2.test()
    assert EXPECTED_KEYS <= set(res)


def test_trainer_no_gnn(fixture_root, tmp_path):
    t = ForensicTrainer(_cfg(fixture_root, tmp_path, use_gnn=False, epochs=1))
    t.fit()
    assert "gnn_proj" not in t.state.params["fusion"]


def test_trainer_resume(fixture_root, tmp_path):
    t1 = ForensicTrainer(_cfg(fixture_root, tmp_path, epochs=1))
    t1.fit()
    step1 = int(t1.state.step)
    t2 = ForensicTrainer(_cfg(fixture_root, tmp_path, epochs=2, resume=True))
    assert int(t2.state.step) == step1
    assert t2.start_epoch == 2
    t2.fit()
    assert int(t2.state.step) > step1


def test_trainer_freeze_gnn(fixture_root, tmp_path):
    """train_gnn=False (reference semantics): GNN params are bit-frozen
    through training — no gradient updates AND no weight-decay drift —
    while fusion/classifier params still move."""
    import jax

    t = ForensicTrainer(
        _cfg(fixture_root, tmp_path, epochs=1, train_gnn=False)
    )
    gnn_before = jax.tree.map(np.asarray, t.state.params["gnn"])
    fusion_before = np.asarray(
        jax.tree.leaves(t.state.params["fusion"])[0]
    ).copy()
    t.fit()
    for a, b in zip(
        jax.tree.leaves(gnn_before), jax.tree.leaves(t.state.params["gnn"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(
        fusion_before, np.asarray(jax.tree.leaves(t.state.params["fusion"])[0])
    )
    res = t.test()

    # eval-only with DEFAULT flags must adopt train_gnn=False from the
    # checkpoint meta (multi_transform opt_state) and restore cleanly —
    # identical test metrics, not a warn-and-score-fresh-params fallback
    t2 = ForensicTrainer(
        _cfg(fixture_root, tmp_path, epochs=0, eval_only=True)
    )
    assert t2.cfg.train_gnn is False
    res2 = t2.test()
    assert abs(res2["test_auc"] - res["test_auc"]) < 1e-9
    assert abs(res2["test_acc"] - res["test_acc"]) < 1e-9


def test_trainer_bf16_compute(fixture_root, tmp_path):
    """bf16-compute/f32-master: trains, params stay f32, metrics sane."""
    import jax.numpy as jnp

    t = ForensicTrainer(
        _cfg(fixture_root, tmp_path, epochs=1, bf16_compute=True)
    )
    best = t.fit()
    assert best > 0.5
    # master params are still float32 (bf16 is activations-only)
    leaves = [x.dtype for x in __import__("jax").tree.leaves(t.state.params)]
    assert all(d == jnp.float32 for d in leaves)


def test_trainer_resume_rejects_cross_kind_latest(fixture_root, tmp_path):
    """A 'latest' slot written by another trainer kind must not be resumed
    (param shapes coincide at default dims, so it would silently load
    wrong weights)."""
    import json

    t1 = ForensicTrainer(_cfg(fixture_root, tmp_path, epochs=1))
    t1.fit()
    meta_path = tmp_path / "latest" / "meta.json"
    meta = json.loads(meta_path.read_text())
    meta["trainer"] = "integrated"
    meta_path.write_text(json.dumps(meta))
    t2 = ForensicTrainer(_cfg(fixture_root, tmp_path, epochs=1, resume=True))
    assert t2.start_epoch == 1  # started fresh, foreign checkpoint ignored
    assert int(t2.state.step) == 0
