"""Sparse (padded-neighbor-list) graph path — `--sparse_graph`.

The dense (N, N) a_norm is the first object to outgrow memory (40 GB at
N=100k f32; SURVEY §7 "hard parts" names exactly this). The sparse path
builds COO edges with the native O(E) posting-list lister
(`native/graphops.cpp:ufnd_jaccard_edges`), packs them into (N, K)
padded neighbor lists (ops/graphctx.build_sparse_graph_context), and
propagates the GCN's second layer as a gather + weighted K-slot sum
(models/gnn.SimpleGCN nbr_idx/nbr_w branch). These tests pin:

  * edge lists == dense builders' off-diagonal nonzeros, native AND
    numpy-fallback paths (exact);
  * neighbor-list reconstruction == dense a_norm (f32-close: the
    weights carry the same op order but numpy/XLA libm may differ in
    the odd ulp on deg**-0.5);
  * SimpleGCN sparse forward + grads == dense (rtol 1e-5);
  * trainer end-to-end under --sparse_graph: fit/test run, per-step
    agreement with the dense trainer, checkpoint interchange (params
    are shape-identical by construction);
  * composition with the 8-device mesh (shard_graph row-sharding).
"""
import os
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultrafnd_git_tpu import native
from ultrafnd_git_tpu.models.gnn import SimpleGCN, normalize_adjacency
from ultrafnd_git_tpu.ops.graphctx import (
    build_graph_context,
    build_sparse_graph_context,
)
from ultrafnd_git_tpu.ops.jaccard import (
    build_adj_from_ocr,
    build_edges_from_ocr,
    build_weighted_adj_from_ocr,
)


def _random_sets(n, vocab_n=160, seed=0, empty_every=17):
    rng = np.random.default_rng(seed)
    vocab = [f"t{i}" for i in range(vocab_n)]
    sets = [
        set(rng.choice(vocab, size=int(rng.integers(0, 12)), replace=False))
        for _ in range(n)
    ]
    for i in range(0, n, empty_every):
        sets[i] = set()  # empty-set rows exercise the jac(∅,·)=0 rule
    return sets


def _dense_offdiag_coo(dense):
    a = dense.copy()
    np.fill_diagonal(a, 0.0)
    src, dst = np.nonzero(a)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    return (
        src.astype(np.int32), dst.astype(np.int32),
        a[src, dst].astype(np.float32),
    )


@pytest.mark.parametrize("weighted", [False, True], ids=["binary", "wt"])
@pytest.mark.parametrize("use_native", [True, False], ids=["native", "numpy"])
def test_edges_match_dense_nonzeros(weighted, use_native, monkeypatch):
    if use_native and native.get_graph_lib() is None:
        pytest.skip("no native toolchain")
    if not use_native:
        monkeypatch.setenv("ULTRAFND_NATIVE", "0")
        native.reset()
    try:
        sets = _random_sets(140)
        dense = (
            build_weighted_adj_from_ocr if weighted else build_adj_from_ocr
        )(sets, 0.12)
        src, dst, w = build_edges_from_ocr(sets, 0.12, weighted=weighted)
        ref = _dense_offdiag_coo(dense)
        np.testing.assert_array_equal(src, ref[0])
        np.testing.assert_array_equal(dst, ref[1])
        np.testing.assert_array_equal(w, ref[2])
    finally:
        if not use_native:
            monkeypatch.delenv("ULTRAFND_NATIVE", raising=False)
            native.reset()


def _tiny_cache(n=96, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "labels": rng.integers(0, 2, n).astype(np.int64),
        "text": rng.standard_normal((n, 768)).astype(np.float32),
        "audio": rng.standard_normal((n, 128)).astype(np.float32),
        "visual": rng.standard_normal((n, 512)).astype(np.float32),
        "temporal": rng.standard_normal((n, 256)).astype(np.float32),
        "aux": rng.uniform(size=(n, 2)).astype(np.float32),
        "ocr_sets": _random_sets(n, seed=seed + 1),
    }


def test_sparse_context_reconstructs_dense_a_norm():
    cache = _tiny_cache()
    d = build_graph_context(cache, 0.12)
    s = build_sparse_graph_context(cache, 0.12)
    n = len(cache["labels"])
    recon = np.zeros((n, n), np.float32)
    for i in range(n):
        for k in range(s.k_max):
            recon[i, s.nbr_idx[i, k]] += s.nbr_w[i, k]
    np.testing.assert_allclose(recon, d.a_norm, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(s.ax, d.ax, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(s.deg, d.deg)
    # slot 0 is the self loop; padding repeats the row index with w=0
    np.testing.assert_array_equal(s.nbr_idx[:, 0], np.arange(n))
    pad = s.nbr_w == 0.0
    np.testing.assert_array_equal(
        s.nbr_idx[pad[:, 0].nonzero()[0], 0],
        np.arange(n)[pad[:, 0].nonzero()[0]],
    )


def test_simple_gcn_sparse_matches_dense_fwd_and_grads():
    cache = _tiny_cache()
    d = build_graph_context(cache, 0.12)
    s = build_sparse_graph_context(cache, 0.12)
    gcn = SimpleGCN(hid=64, out_dim=32, dropout=0.0)
    params = gcn.init(
        jax.random.PRNGKey(0), jnp.asarray(d.xg), jnp.asarray(d.a_norm),
        normalize=False,
    )["params"]
    rows = jnp.asarray([3, 17, 3, 40], jnp.int32)

    def z_dense(p):
        return gcn.apply(
            {"params": p}, jnp.asarray(d.xg), jnp.asarray(d.a_norm),
            normalize=False, ax=jnp.asarray(d.ax), out_rows=rows,
        )

    def z_sparse(p):
        return gcn.apply(
            {"params": p}, jnp.asarray(s.xg), None, normalize=False,
            ax=jnp.asarray(s.ax), out_rows=rows,
            nbr_idx=jnp.asarray(s.nbr_idx), nbr_w=jnp.asarray(s.nbr_w),
        )

    zd, zs = z_dense(params), z_sparse(params)
    np.testing.assert_allclose(np.asarray(zs), np.asarray(zd), rtol=1e-5,
                               atol=1e-6)
    gd = jax.grad(lambda p: jnp.sum(z_dense(p) ** 2))(params)
    gs = jax.grad(lambda p: jnp.sum(z_sparse(p) ** 2))(params)
    for (ka, va), (kb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(gd),
        jax.tree_util.tree_leaves_with_path(gs),
    ):
        np.testing.assert_allclose(
            np.asarray(vb), np.asarray(va), rtol=2e-4, atol=1e-6,
            err_msg=str(ka),
        )
    # full-graph rows (out_rows=None) — the pretrain path
    zd_full = gcn.apply(
        {"params": params}, jnp.asarray(d.xg), jnp.asarray(d.a_norm),
        normalize=False, ax=jnp.asarray(d.ax),
    )
    zs_full = gcn.apply(
        {"params": params}, jnp.asarray(s.xg), None, normalize=False,
        ax=jnp.asarray(s.ax), nbr_idx=jnp.asarray(s.nbr_idx),
        nbr_w=jnp.asarray(s.nbr_w),
    )
    np.testing.assert_allclose(
        np.asarray(zs_full), np.asarray(zd_full), rtol=1e-5, atol=1e-6
    )


def test_sparse_gcn_requires_ax_and_prenormalized():
    cache = _tiny_cache(n=24)
    s = build_sparse_graph_context(cache, 0.12)
    gcn = SimpleGCN(hid=8, out_dim=4, dropout=0.0)
    with pytest.raises(ValueError, match="sparse GCN"):
        gcn.init(
            jax.random.PRNGKey(0), jnp.asarray(s.xg), None,
            normalize=False, nbr_idx=jnp.asarray(s.nbr_idx),
            nbr_w=jnp.asarray(s.nbr_w),
        )


@pytest.mark.slow
def test_trainer_sparse_graph_end_to_end(fixture_data_root, tmp_path):
    """--sparse_graph trains, tests, and stays step-wise close to the
    dense trainer (identical seeds/order; the graph channel's f32
    summation order differs, so exact bit-match is not expected)."""
    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig

    base = TrainConfig(
        data_root=fixture_data_root,
        out_dir=str(tmp_path / "dense"),
        batch_size=8,
        epochs=1,
        seed=0,
        cache_to_disk=False,
        log_metrics_jsonl=False,
        fast_dropout_rng=False,
    )
    dense_tr = ForensicTrainer(base)
    sparse_tr = ForensicTrainer(
        replace(base, out_dir=str(tmp_path / "sparse"), sparse_graph=True)
    )
    assert "nbr_idx" in sparse_tr.corpus and "a_norm" not in sparse_tr.corpus

    # identical init (same seed; param shapes identical by construction)
    for (ka, va), (kb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(dense_tr.state.params),
        jax.tree_util.tree_leaves_with_path(sparse_tr.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(vb), np.asarray(va), rtol=1e-5, atol=1e-6,
            err_msg=f"init {ka}",
        )

    # one identical train step -> params stay close
    idx = jnp.arange(8, dtype=jnp.int32)
    ones = jnp.ones(8, jnp.float32)
    sd, _ = jax.jit(dense_tr._make_train_step())(
        dense_tr.state, idx, ones, dense_tr.corpus
    )
    ss, _ = jax.jit(sparse_tr._make_train_step())(
        sparse_tr.state, idx, ones, sparse_tr.corpus
    )
    for (ka, va), (kb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(sd.params),
        jax.tree_util.tree_leaves_with_path(ss.params),
    ):
        np.testing.assert_allclose(
            np.asarray(vb), np.asarray(va), rtol=1e-3, atol=2e-5,
            err_msg=f"post-step {ka}",
        )

    # full fit + test still runs and returns the metric contract
    best = sparse_tr.fit()
    res = sparse_tr.test()
    assert 0.0 <= best <= 1.0
    assert {"test_acc", "test_auc", "test_f1"} <= set(res)


@pytest.mark.slow
def test_sparse_checkpoint_serves_both_layouts(fixture_data_root, tmp_path):
    """A --sparse_graph checkpoint serves through BOTH graph layouts:
    by default the Predictor honors the checkpoint's recorded
    sparse_graph choice (no (N, N) object at serving init either), and
    `sparse_graph=False` forces the dense context — predictions agree
    to f32 rounding (the GCN params are layout-independent)."""
    from ultrafnd_git_tpu.serving import Predictor
    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig

    out = tmp_path / "sp_ckpt"
    ForensicTrainer(
        TrainConfig(
            data_root=fixture_data_root,
            out_dir=str(out),
            batch_size=8,
            epochs=1,
            seed=0,
            sparse_graph=True,
            cache_to_disk=True,
            log_metrics_jsonl=False,
        )
    ).fit()
    recs = [
        {"video_id": f"q{i}", "title": "警告 危险", "ocr": "飞船",
         "comments": ["评论"]}
        for i in range(3)
    ]
    p_auto = Predictor(str(out), batch_size=8)
    assert p_auto.sparse_graph and p_auto.A_NORM is None
    p_dense = Predictor(str(out), batch_size=8, sparse_graph=False)
    assert not p_dense.sparse_graph and p_dense.NBR_IDX is None
    r_s = p_auto.predict(recs)
    r_d = p_dense.predict(recs)
    for rs, rd in zip(r_s, r_d):
        assert rs["id"] == rd["id"]
        assert abs(rs["prob_fake"] - rd["prob_fake"]) < 1e-5
        assert 0.0 <= rs["prob_fake"] <= 1.0
    # the explain background's corpus propagation has a sparse branch
    # (neighbor einsum instead of A_NORM @ H_CORPUS) — drive it
    ex = p_auto.explain(recs[:1], method="grad", top_k=4)
    assert len(ex) == 1
    assert len(ex[0]["explain"]["top_fused_dims"]) == 4


@pytest.mark.slow
def test_sparse_graph_shards_over_mesh(fixture_data_root, tmp_path):
    """sparse_graph + shard_graph on the 8-device CPU mesh agrees with
    the unsharded sparse run (row-sharded (N, K) neighbor arrays)."""
    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig

    base = TrainConfig(
        data_root=fixture_data_root,
        out_dir=str(tmp_path / "a"),
        batch_size=8,
        epochs=1,
        seed=0,
        sparse_graph=True,
        cache_to_disk=False,
        log_metrics_jsonl=False,
        fast_dropout_rng=False,
    )
    plain = ForensicTrainer(base)
    best_plain = plain.fit()
    meshed = ForensicTrainer(
        replace(
            base,
            out_dir=str(tmp_path / "b"),
            dp=8,
            shard_graph=True,
            shard_corpus=True,
            mesh_backend="cpu",
        )
    )
    best_mesh = meshed.fit()
    assert abs(best_plain - best_mesh) < 1e-4


def test_sparse_context_warns_on_hub_degree():
    """A hub node inflates every padded row — the builder says so
    instead of silently degrading past the dense crossover."""
    import warnings

    n = 80
    cache = _tiny_cache(n=n)
    # identical 2-token sets: pairwise jaccard = 1 -> fully connected
    cache["ocr_sets"] = [{"HUB", "HUB2"} for _ in range(n)]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s = build_sparse_graph_context(cache, 0.12)
    assert s.k_max == n  # fully connected: self + (n-1) neighbors
    assert any("sparse graph" in str(x.message) for x in w)


def test_numpy_fallback_multiblock_matches_single_block(monkeypatch):
    """The fallback's row-blocked incidence matmul must agree with the
    dense nonzeros across block boundaries (auto sizing makes test-size
    corpora a single block, so pin a tiny block explicitly)."""
    monkeypatch.setenv("ULTRAFND_NATIVE", "0")
    native.reset()
    try:
        sets = _random_sets(90, seed=5)
        dense = build_adj_from_ocr(sets, 0.12)
        ref = _dense_offdiag_coo(dense)
        src, dst, w = build_edges_from_ocr(sets, 0.12, block_rows=7)
        np.testing.assert_array_equal(src, ref[0])
        np.testing.assert_array_equal(dst, ref[1])
        np.testing.assert_array_equal(w, ref[2])
    finally:
        monkeypatch.delenv("ULTRAFND_NATIVE", raising=False)
        native.reset()
