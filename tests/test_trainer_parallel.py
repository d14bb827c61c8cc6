"""Trainer mesh/parallelism integration tests (8 virtual CPU devices).

Split out of test_trainer.py so pytest-xdist's per-file (loadfile)
distribution spreads the two compile-heavy halves across workers — the
single 600-line file was the slow partition's critical path (VERDICT r3
item 8). Covers: dp x tp meshes, sharded corpus/graph, scan-epoch
agreement, joint-tower on mesh, grad-accum, remat, --sp/--pp.
"""
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


def test_trainer_mesh_dp_tp(fixture_root, tmp_path):
    """Full train step over a (4 data x 2 model) mesh of virtual devices."""
    t = ForensicTrainer(
        _cfg(
            fixture_root, tmp_path, epochs=1, dp=4, tp=2, batch_size=16,
            mesh_backend="cpu",
        )
    )
    best = t.fit()
    assert best >= 0.0
    res = t.test()
    assert EXPECTED_KEYS <= set(res)


def test_mesh_and_single_device_agree(fixture_root, tmp_path):
    """Same seed, same data: mesh vs single-device losses stay close."""
    t1 = ForensicTrainer(
        _cfg(fixture_root, tmp_path / "a", epochs=1, save_best=False)
    )
    t2 = ForensicTrainer(
        _cfg(
            fixture_root, tmp_path / "b", epochs=1, dp=4, tp=2,
            save_best=False, mesh_backend="cpu",
        )
    )
    l1, _ = t1._epoch_loop(t1.va_idx, "val")
    l2, _ = t2._epoch_loop(t2.va_idx, "val")
    assert abs(l1 - l2) < 5e-2


def test_dcn_multislice_agrees_with_flat_dp(fixture_root, tmp_path):
    """--dcn 2 (outer slice axis x 4-way inner dp) computes the same
    losses as the flat 8-way dp mesh: the batch shards over the compound
    ('dcn', 'data') axes, so both layouts see identical rows and differ
    only in the all-reduce hierarchy (ICI within a slice, one DCN hop
    across) — agreement at f32 collective-rounding tolerance."""
    t_flat = ForensicTrainer(
        _cfg(
            fixture_root, tmp_path / "flat", epochs=1, dp=8,
            save_best=False, mesh_backend="cpu",
        )
    )
    t_dcn = ForensicTrainer(
        _cfg(
            fixture_root, tmp_path / "dcn", epochs=1, dp=4, dcn=2,
            save_best=False, mesh_backend="cpu",
        )
    )
    assert t_dcn.mesh.axis_names == ("dcn", "data", "model")
    assert t_dcn.mesh.shape["dcn"] == 2
    l1, m1 = t_flat._epoch_loop(t_flat.va_idx, "val")
    l2, m2 = t_dcn._epoch_loop(t_dcn.va_idx, "val")
    assert abs(l1 - l2) < 1e-4
    assert abs(m1["auc"] - m2["auc"]) < 1e-6
    # and a full scan-epoch TRAIN epoch executes over the layout
    tl, _ = t_dcn._epoch_loop(t_dcn.tr_idx[:32], "train")
    assert np.isfinite(tl)


def test_dcn_excludes_sp_pp(fixture_root, tmp_path):
    with pytest.raises(ValueError, match="--dcn composes"):
        ForensicTrainer(
            _cfg(
                fixture_root, tmp_path, dcn=2, sp=2,
                train_text_tower=True, mesh_backend="cpu",
            )
        )


def test_shard_corpus_agrees_with_replicated(fixture_root, tmp_path):
    """Row-sharded corpus (the SCALING.md growth path) computes the same
    losses as the replicated default on the virtual mesh."""
    t_rep = ForensicTrainer(
        _cfg(
            fixture_root, tmp_path / "rep", epochs=1, dp=4, tp=2,
            save_best=False, mesh_backend="cpu",
        )
    )
    t_sh = ForensicTrainer(
        _cfg(
            fixture_root, tmp_path / "sh", epochs=1, dp=4, tp=2,
            save_best=False, mesh_backend="cpu", shard_corpus=True,
        )
    )
    l1, m1 = t_rep._epoch_loop(t_rep.va_idx, "val")
    l2, m2 = t_sh._epoch_loop(t_sh.va_idx, "val")
    assert abs(l1 - l2) < 1e-4
    # and a train step executes over the sharded corpus
    loss, _ = t_sh._epoch_loop(t_sh.tr_idx[:16], "train")
    assert loss == loss  # finite


def test_scan_epoch_matches_per_step_loop(fixture_root, tmp_path):
    """scan_epoch runs the same step function over the same RNG stream —
    losses and metrics must match the per-step dispatch loop exactly."""
    t_scan = ForensicTrainer(
        _cfg(fixture_root, tmp_path / "scan", epochs=1, save_best=False)
    )
    t_loop = ForensicTrainer(
        _cfg(
            fixture_root, tmp_path / "loop", epochs=1, save_best=False,
            scan_epoch=False,
        )
    )
    # eval: identical params (same seed), no shuffle -> exact agreement
    l1, m1 = t_scan._epoch_loop(t_scan.va_idx, "val")
    l2, m2 = t_loop._epoch_loop(t_loop.va_idx, "val")
    assert abs(l1 - l2) < 1e-6
    assert abs(m1["auc"] - m2["auc"]) < 1e-9

    # train: pin the global np.random stream before each call so both
    # trainers draw the identical shuffle -> same steps, same final state
    np.random.seed(7)
    l1, _ = t_scan._epoch_loop(t_scan.tr_idx, "train")
    np.random.seed(7)
    l2, _ = t_loop._epoch_loop(t_loop.tr_idx, "train")
    assert abs(l1 - l2) < 1e-6
    assert int(t_scan.state.step) == int(t_loop.state.step) > 0
    import jax

    a = jax.tree.leaves(t_scan.state.params)
    b = jax.tree.leaves(t_loop.state.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_scan_epoch_matches_per_step_loop_on_mesh(fixture_root, tmp_path):
    """scan-epoch under a single-process dp x tp mesh (VERDICT r2 item 2):
    the (steps, B) matrices shard on the batch axis, so the scanned epoch
    must match the per-step mesh loop exactly. Uses the same 4x2 mesh as
    the other mesh tests so the per-step program comes out of the shared
    compilation cache (dp=8 was a one-off program compiled only here)."""
    t_scan = ForensicTrainer(
        _cfg(
            fixture_root, tmp_path / "scan", epochs=1, save_best=False,
            dp=4, tp=2, mesh_backend="cpu",
        )
    )
    t_loop = ForensicTrainer(
        _cfg(
            fixture_root, tmp_path / "loop", epochs=1, save_best=False,
            dp=4, tp=2, mesh_backend="cpu", scan_epoch=False,
        )
    )
    assert t_scan.mesh is not None  # the scan path really runs under a mesh

    l1, m1 = t_scan._epoch_loop(t_scan.va_idx, "val")
    l2, m2 = t_loop._epoch_loop(t_loop.va_idx, "val")
    assert abs(l1 - l2) < 1e-6
    assert abs(m1["auc"] - m2["auc"]) < 1e-9

    np.random.seed(7)
    l1, _ = t_scan._epoch_loop(t_scan.tr_idx, "train")
    np.random.seed(7)
    l2, _ = t_loop._epoch_loop(t_loop.tr_idx, "train")
    assert abs(l1 - l2) < 1e-6
    assert int(t_scan.state.step) == int(t_loop.state.step) > 0
    import jax

    for x, y in zip(
        jax.tree.leaves(t_scan.state.params),
        jax.tree.leaves(t_loop.state.params),
    ):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_shard_graph_agrees_with_replicated(fixture_root, tmp_path):
    """Row-sharded (N, N) adjacency — the O(N^2) growth path — computes
    the same losses as the replicated default on the virtual mesh."""
    t_rep = ForensicTrainer(
        _cfg(
            fixture_root, tmp_path / "rep", epochs=1, dp=4, tp=2,
            save_best=False, mesh_backend="cpu",
        )
    )
    t_sh = ForensicTrainer(
        _cfg(
            fixture_root, tmp_path / "sh", epochs=1, dp=4, tp=2,
            save_best=False, mesh_backend="cpu", shard_graph=True,
        )
    )
    # the adjacency actually carries the row sharding
    spec = t_sh.A_NORM.sharding.spec
    assert spec and spec[0] == "data"
    l1, _ = t_rep._epoch_loop(t_rep.va_idx, "val")
    l2, _ = t_sh._epoch_loop(t_sh.va_idx, "val")
    assert abs(l1 - l2) < 1e-4
    loss, _ = t_sh._epoch_loop(t_sh.tr_idx[:16], "train")
    assert np.isfinite(loss)


def test_train_text_tower_joint(tower_ckpt):
    """--train_text_tower: the on-device TextTransformer joins the train
    state and receives gradients (the reference's frozen-encoder
    architecture never could). Asserts on the shared session checkpoint
    (tests/conftest.py:tower_ckpt) instead of training its own."""
    assert tower_ckpt["best"] > 0.5
    # tower actually trained (params moved from init)
    assert not np.allclose(tower_ckpt["before_leaf"], tower_ckpt["tower_leaf"])
    assert tower_ckpt["test"]["test_auc"] > 0.5


def test_train_text_tower_on_mesh(fixture_root, tmp_path, monkeypatch):
    """Tower params replicate over the mesh; the joint step runs dp x tp.

    The assertion is structural — the JOINT tower step compiles and runs
    under a dp x tp mesh — so every size knob is turned down: depth 1,
    heads 4, a 2x2 mesh slice, token rows truncated to L=16, and a
    512-entry test vocab (the 32768x768 production embed plus its Adam
    state, replicated over virtual devices on one host core, dominated
    what used to be the slowest test in the suite at 113 s)."""
    from ultrafnd_git_tpu.data import cache as cache_mod
    from ultrafnd_git_tpu.data.cache import bootstrap_cache

    cache = dict(
        bootstrap_cache(fixture_root, str(tmp_path), cache_to_disk=False)
    )
    monkeypatch.setattr(cache_mod, "TOWER_VOCAB", 512)
    cache["text_ids"] = (cache["text_ids"][:, :16] % 512).copy()
    cache["text_mask"] = cache["text_mask"][:, :16].copy()
    t = ForensicTrainer(
        _cfg(
            fixture_root, tmp_path, epochs=1, batch_size=8, dp=2, tp=2,
            mesh_backend="cpu", train_text_tower=True, save_best=False,
            text_tower_depth=1, text_tower_heads=4, cache_to_disk=False,
        ),
        cache=cache,
    )
    assert t.text_tower.vocab_size == 512  # monkeypatch took
    loss, _ = t._epoch_loop(t.tr_idx[:16], "train")
    assert np.isfinite(loss)
    assert int(t.state.step) > 0


def test_resume_with_text_tower(fixture_root, tower_ckpt, tmp_path):
    """Resume restores the tower pytree; a flag-less resume adopts the
    setting from the latest checkpoint's meta. Resumes a COPY of the
    shared session checkpoint (resume mutates the out_dir)."""
    import shutil

    out = tmp_path / "resume"
    shutil.copytree(tower_ckpt["out"], out)
    step1 = tower_ckpt["step"]

    # note: NO train_text_tower flag here — adopted from the checkpoint
    t2 = ForensicTrainer(
        _cfg(fixture_root, out, epochs=2, batch_size=8, seed=0, resume=True)
    )
    assert t2.cfg.train_text_tower  # adopted
    assert "text_tower" in t2.state.params
    assert int(t2.state.step) == step1
    t2.fit()
    assert int(t2.state.step) > step1


def test_fast_dropout_rng_both_paths_train(fixture_root, tmp_path):
    """fast_dropout_rng=True (rbg in-step dropout, the default) and
    False (threefry, bit-exact replays) both train to a finite best
    metric; the checkpointed state.rng stays threefry in both."""
    t1 = ForensicTrainer(
        _cfg(fixture_root, tmp_path / "a", epochs=1, fast_dropout_rng=False)
    )
    b1 = t1.fit()
    t2 = ForensicTrainer(_cfg(fixture_root, tmp_path / "b", epochs=1))
    assert t2.cfg.fast_dropout_rng  # default on
    b2 = t2.fit()
    assert np.isfinite(b1) and np.isfinite(b2)
    # state.rng is a raw threefry key in both (checkpoint compatibility)
    assert t1.state.rng.shape == t2.state.rng.shape == (2,)


def _dropout_free_configs(tmp):
    """Write dropout-0 fusion/classifier YAMLs (same schema as
    configs/model_configs/*) so train-mode forwards are deterministic."""
    cfgdir = tmp / "cfgs"
    cfgdir.mkdir(parents=True, exist_ok=True)
    (cfgdir / "fusion.yaml").write_text(
        "hidden_dim: 512\ndropout: 0.0\nuse_gnn: true\ngnn_dim: 128\n"
    )
    (cfgdir / "classifier.yaml").write_text(
        "input_dim: 512\nhidden_dim: 512\ndropout: 0.0\nnum_classes: 2\n"
        "use_aux: true\naux_dim: 2\nnode_trees: 6\nnode_depth: 4\n"
        "node_tau: 10.0\nnode_dropout: 0.0\ntemperature: 1.0\n"
    )
    return str(cfgdir / "fusion.yaml"), str(cfgdir / "classifier.yaml")


def test_grad_accum_matches_big_batch(fixture_root, tmp_path):
    """grad_accum=A microbatches of B rows == ONE step at batch A*B.

    The accumulated update sums unnormalized masked-sum gradients over
    microbatches and divides once by the total valid count — linear in
    the loss, so it must equal the big-batch masked-mean gradient up to
    f32 summation order. Dropout is zeroed (configs + use_gnn=False) so
    the equality is testable without matching per-microbatch RNG streams.
    """
    import jax.numpy as jnp

    fus, clf = _dropout_free_configs(tmp_path)
    kw = dict(
        epochs=0, use_gnn=False, fusion_config=fus, classifier_config=clf
    )
    big = ForensicTrainer(
        _cfg(fixture_root, tmp_path / "big", batch_size=32, **kw)
    )
    acc = ForensicTrainer(
        _cfg(
            fixture_root, tmp_path / "acc", batch_size=8, grad_accum=4, **kw
        )
    )
    # same seed -> identical init params and corpus
    for a, b in zip(
        __import__("jax").tree.leaves(big.state.params),
        __import__("jax").tree.leaves(acc.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    import jax

    idx = jnp.arange(32, dtype=jnp.int32)
    mask = jnp.ones(32, jnp.float32)
    lb, gb, (p1b, fb) = jax.jit(big._make_grad_fn())(
        big.state, idx, mask, big.corpus
    )
    la, ga, (p1a, fa) = jax.jit(acc._make_grad_fn())(
        acc.state, idx, mask, acc.corpus
    )

    np.testing.assert_allclose(float(lb), float(la), rtol=1e-5)
    # per-row outputs identical ordering: (A, B) microbatches reflatten
    np.testing.assert_allclose(
        np.asarray(p1b), np.asarray(p1a), rtol=1e-5, atol=1e-6
    )
    assert fa.shape == fb.shape == (3, 32)
    # GRADIENTS agree leaf-by-leaf (the claim; post-AdamW params can't be
    # compared — a first Adam step maps near-zero grads to ±lr on sign
    # alone, so f32 summation-order noise would flip dead-pathway signs)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
        )


def test_grad_accum_end_to_end_and_mesh(fixture_root, tmp_path):
    """Default config (dropout + GCN on) trains under grad_accum, both
    unmeshed and over a dp=4 x tp=2 virtual mesh with scan-epoch."""
    t = ForensicTrainer(
        _cfg(
            fixture_root, tmp_path / "solo", epochs=1, batch_size=8,
            grad_accum=2,
        )
    )
    best = t.fit()
    assert np.isfinite(best)
    assert int(t.state.step) >= 1
    res = t.test()
    assert EXPECTED_KEYS <= set(res)

    tm = ForensicTrainer(
        _cfg(
            fixture_root, tmp_path / "mesh", epochs=1, batch_size=8,
            grad_accum=2, dp=4, tp=2, mesh_backend="cpu",
        )
    )
    bm = tm.fit()
    assert np.isfinite(bm)
    assert EXPECTED_KEYS <= set(tm.test())


def test_remat_tower_grads_match_plain(fixture_root, tmp_path):
    """--remat_tower is numerically exact at the TRAINER level: the joint
    tower step's gradients match the non-remat step bit-for-rounding
    (jax.checkpoint replays the same dropout rngs in the recompute)."""
    import jax
    import jax.numpy as jnp

    kw = dict(
        epochs=0, batch_size=8, train_text_tower=True,
        text_tower_depth=1, text_tower_heads=4, seed=0,
    )
    plain = ForensicTrainer(_cfg(fixture_root, tmp_path / "p", **kw))
    remat = ForensicTrainer(
        _cfg(fixture_root, tmp_path / "r", remat_tower=True, **kw)
    )
    idx = jnp.arange(8, dtype=jnp.int32)
    mask = jnp.ones(8, jnp.float32)
    lp, gp, _ = jax.jit(plain._make_grad_fn())(
        plain.state, idx, mask, plain.corpus
    )
    lr_, gr, _ = jax.jit(remat._make_grad_fn())(
        remat.state, idx, mask, remat.corpus
    )
    np.testing.assert_allclose(float(lp), float(lr_), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        )


def test_memory_levers_compose_with_tower(fixture_root, tmp_path):
    """--train_text_tower + --grad_accum + --remat_tower together (the
    composed memory story) trains end-to-end and checkpoints."""
    t = ForensicTrainer(
        _cfg(
            fixture_root, tmp_path, epochs=1, batch_size=8, grad_accum=2,
            train_text_tower=True, text_tower_depth=1, text_tower_heads=4,
            remat_tower=True, seed=0,
        )
    )
    best = t.fit()
    assert np.isfinite(best)
    res = t.test()
    assert EXPECTED_KEYS <= set(res)


def test_trainer_sp_ring_tower(fixture_root, tmp_path):
    """--sp: joint tower with ring attention over a (data=2, sp=4) mesh.
    At init (same seed) the SP eval loss matches the plain tower's at
    f32-rounding tolerance; one epoch then trains to a finite metric."""
    kw = dict(
        epochs=1, batch_size=8, train_text_tower=True, text_tower_depth=1,
        text_tower_heads=4, seed=0,
    )
    plain = ForensicTrainer(_cfg(fixture_root, tmp_path / "p", **kw))
    sp = ForensicTrainer(
        _cfg(
            fixture_root, tmp_path / "s", dp=2, sp=4,
            mesh_backend="cpu", **kw
        )
    )
    # identical init (same seed): SP eval == plain eval at f32 rounding
    l_plain, _ = plain._epoch_loop(plain.va_idx, "val")
    l_sp, _ = sp._epoch_loop(sp.va_idx, "val")
    assert abs(l_plain - l_sp) < 1e-3
    # then the SAME sp trainer trains end-to-end over the (2, 1, 4) mesh
    best = sp.fit()
    assert np.isfinite(best)
    assert EXPECTED_KEYS <= set(sp.test())


def test_trainer_sp_validates_flags(fixture_root, tmp_path):
    with pytest.raises(ValueError, match="train_text_tower"):
        ForensicTrainer(
            _cfg(fixture_root, tmp_path / "a", sp=2, mesh_backend="cpu")
        )
    with pytest.raises(ValueError, match="mutually exclusive"):
        ForensicTrainer(
            _cfg(
                fixture_root, tmp_path / "b", sp=2, mesh_backend="cpu",
                train_text_tower=True, moe_experts=2,
            )
        )


def test_trainer_pp_gpipe_tower(fixture_root, tmp_path):
    """--pp: joint tower under a GPipe schedule over a (data=2, pipe=2)
    mesh; init-time eval matches the plain tower (bit-identical math),
    then trains end-to-end."""
    kw = dict(
        epochs=1, batch_size=8, train_text_tower=True, text_tower_depth=2,
        text_tower_heads=4, seed=0,
    )
    plain = ForensicTrainer(_cfg(fixture_root, tmp_path / "p", **kw))
    pp = ForensicTrainer(
        _cfg(
            fixture_root, tmp_path / "g", dp=2, pp=2,
            mesh_backend="cpu", **kw
        )
    )
    l_plain, _ = plain._epoch_loop(plain.va_idx, "val")
    l_pp, _ = pp._epoch_loop(pp.va_idx, "val")
    assert abs(l_plain - l_pp) < 1e-5
    best = pp.fit()
    assert np.isfinite(best)
    assert EXPECTED_KEYS <= set(pp.test())
