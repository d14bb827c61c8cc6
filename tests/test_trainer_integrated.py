"""Integrated trainer variant: annealed per-batch graphs, cosine LR."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end trainer compiles

from ultrafnd_git_tpu.training.trainer_integrated import (
    IntegratedForensicTrainer,
    IntegratedTrainConfig,
)


@pytest.fixture(scope="module")
def trainer_factory(fixture_data_root, tmp_path_factory):
    def make(**overrides):
        out = tmp_path_factory.mktemp("integrated")
        kwargs = dict(
            data_root=fixture_data_root,
            out_dir=str(out),
            batch_size=8,
            epochs=2,
            cache_to_disk=False,
        )
        kwargs.update(overrides)
        return IntegratedForensicTrainer(IntegratedTrainConfig(**kwargs))

    return make


def test_annealed_threshold_schedule(trainer_factory):
    t = trainer_factory(save_best=False)
    thr0 = t.cfg.gnn_overlap_thresh
    assert t._annealed_thresh(0) == pytest.approx(thr0)
    assert t._annealed_thresh(1) == pytest.approx(thr0 * 0.95)
    # floors at 0.05
    assert t._annealed_thresh(1000) == pytest.approx(0.05)


def test_train_and_test_end_to_end(trainer_factory):
    t = trainer_factory()
    results = t.train()
    assert set(results) == {"test_loss", "test_acc", "test_auc"}
    assert np.isfinite(results["test_loss"])
    assert 0.0 <= results["test_acc"] <= 1.0
    # the optimizer actually stepped through both epochs
    assert int(t.state.step) > 0


def test_class_weighting_weights_inverse_frequency(trainer_factory):
    t = trainer_factory(class_weighting=True, save_best=False)
    w = np.asarray(t.class_w)
    y = t.cache["labels"]
    pos, neg = float((y == 1).sum()), float((y == 0).sum())
    total = pos + neg
    np.testing.assert_allclose(
        w, [0.5 * total / neg, 0.5 * total / pos], rtol=1e-6
    )
    # unweighted default is all-ones
    t2 = trainer_factory(save_best=False)
    np.testing.assert_allclose(np.asarray(t2.class_w), [1.0, 1.0])


def test_no_gnn_path(trainer_factory):
    t = trainer_factory(use_gnn=False, save_best=False, epochs=1)
    loss, acc, auc = t._run_split(t.train_idx[:16], thr=0.12, train=True)
    assert np.isfinite(loss)


def test_label_smoothing_changes_loss(trainer_factory):
    t_smooth = trainer_factory(save_best=False)
    t_hard = trainer_factory(save_best=False, label_smoothing=0.0)
    import jax.numpy as jnp

    logits = jnp.asarray([[4.0, -4.0], [-4.0, 4.0]])
    y = jnp.asarray([0, 1])
    mask = jnp.ones(2)
    l_smooth = float(t_smooth._loss_from_logits(logits, y, mask))
    l_hard = float(t_hard._loss_from_logits(logits, y, mask))
    # smoothing adds probability mass on the wrong class -> higher loss here
    assert l_smooth > l_hard


def test_resume_continues_from_latest(trainer_factory, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("integ_resume"))
    t1 = trainer_factory(out_dir=out, epochs=1)
    t1.train()
    step_after_e1 = int(t1.state.step)
    assert step_after_e1 > 0

    # resume picks up epoch counter, best score, and optimizer step
    t2 = trainer_factory(out_dir=out, epochs=2, resume=True)
    assert t2.start_epoch == 2
    assert t2.best_score == pytest.approx(t1.best_score)
    assert int(t2.state.step) == step_after_e1
    t2.train()
    assert int(t2.state.step) > step_after_e1

    # without resume, a fresh trainer starts over
    t3 = trainer_factory(out_dir=out, epochs=2)
    assert t3.start_epoch == 1 and int(t3.state.step) == 0


def test_resume_adopts_checkpoint_hash_salt(trainer_factory, tmp_path_factory):
    """--resume without re-passing --hash_salt must adopt the draw the
    checkpoint was trained under (mirrors the v2 trainer), not silently
    re-featurize under the canonical one."""
    from ultrafnd_git_tpu.ops import hashing

    out = str(tmp_path_factory.mktemp("integ_salt"))
    t1 = trainer_factory(out_dir=out, epochs=1, hash_salt="integ-draw")
    t1.train()
    hashing.set_hash_salt("")
    try:
        t2 = trainer_factory(out_dir=out, epochs=2, resume=True)
        assert t2.cfg.hash_salt == "integ-draw"
        assert hashing.get_hash_salt() == "integ-draw"
        np.testing.assert_allclose(
            np.asarray(t2.TEXT), np.asarray(t1.TEXT), atol=1e-6
        )
    finally:
        hashing.set_hash_salt("")


def test_bf16_compute_runs_and_keeps_f32_params(trainer_factory):
    t = trainer_factory(save_best=False, bf16_compute=True, epochs=1)
    import jax
    import jax.numpy as jnp

    for leaf in jax.tree.leaves(t.state.params):
        assert leaf.dtype == jnp.float32  # master params stay f32
    thr = t._annealed_thresh(0)
    loss, acc, auc = t._run_split(t.train_idx[:16], thr, train=True)
    assert np.isfinite(loss)


def test_scan_epoch_matches_per_step_loop(trainer_factory):
    """scan_epoch runs the same step over the same RNG stream — losses,
    metrics and final params must match the per-step dispatch loop."""
    t_scan = trainer_factory(save_best=False, seed=5)
    t_loop = trainer_factory(save_best=False, seed=5, scan_epoch=False)

    thr = t_scan._annealed_thresh(0)
    l1, a1, auc1 = t_scan._run_split(t_scan.val_idx, thr, train=False)
    l2, a2, auc2 = t_loop._run_split(t_loop.val_idx, thr, train=False)
    assert abs(l1 - l2) < 1e-6
    assert a1 == a2 and abs(auc1 - auc2) < 1e-9

    np.random.seed(11)
    l1, _, _ = t_scan._run_split(t_scan.train_idx, thr, train=True)
    np.random.seed(11)
    l2, _, _ = t_loop._run_split(t_loop.train_idx, thr, train=True)
    assert abs(l1 - l2) < 1e-6
    import jax

    for x, y in zip(
        jax.tree.leaves(t_scan.state.params),
        jax.tree.leaves(t_loop.state.params),
    ):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
