"""Shape contracts + routing-math correctness for the trainable core."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultrafnd_git_tpu.models.classifier import DeepTruthClassifier
from ultrafnd_git_tpu.models.fusion import CrossModalTransformer, cos01
from ultrafnd_git_tpu.models.gnn import (
    GNNModel,
    GNNSimple,
    SimpleGCN,
    add_ocr_overlap_weights,
    add_temporal_inconsistency,
    build_dense_adj,
    cosine_knn,
    normalize_adj,
    normalize_adjacency,
)
from ultrafnd_git_tpu.models.graph_nets import HeteroFGHGNN, PostEncoder
from ultrafnd_git_tpu.ops.trees import leaf_bit_matrix, oblivious_forest_logits

KEY = jax.random.PRNGKey(0)
B = 2


def _feats(key, use_gnn=True):
    ks = jax.random.split(key, 5)
    f = {
        "text_features": jax.random.normal(ks[0], (B, 768)),
        "audio_features": jax.random.normal(ks[1], (B, 128)),
        "visual_features": jax.random.normal(ks[2], (B, 512)),
        "temporal_features": jax.random.normal(ks[3], (B, 256)),
    }
    if use_gnn:
        f["gnn_feat"] = jax.random.normal(ks[4], (B, 128))
    return f


def test_fusion_shapes_from_config():
    model = CrossModalTransformer.from_config()
    feats = _feats(KEY)
    params = model.init(KEY, feats)
    out = model.apply(params, feats)
    assert out["fused"].shape == (B, 512)
    assert out["logits"].shape == (B, 2)
    for k in ("emotion_intensity", "semantic_conflict", "temporal_delay"):
        assert out["forensic"][k].shape == (B,)
        assert bool(jnp.all(out["forensic"][k] >= 0))


def test_fusion_without_gnn():
    model = CrossModalTransformer(use_gnn=False)
    feats = _feats(KEY, use_gnn=False)
    params = model.init(KEY, feats)
    out = model.apply(params, feats)
    assert out["fused"].shape == (B, 512)
    # 15H concat instead of 16H
    assert params["params"]["fuse0"]["kernel"].shape[0] == 15 * 512


def test_evidence_has_no_gradient():
    model = CrossModalTransformer(use_gnn=False)
    feats = _feats(KEY, use_gnn=False)
    params = model.init(KEY, feats)

    def conflict_sum(p):
        return model.apply(p, feats)["forensic"]["semantic_conflict"].sum()

    grads = jax.grad(conflict_sum)(params)
    total = sum(
        float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)
    )
    assert total == 0.0


def test_classifier_shapes_and_temperature():
    model = DeepTruthClassifier.from_config()
    fused = jax.random.normal(KEY, (B, 512))
    aux = jax.random.uniform(KEY, (B, 2))
    params = model.init(KEY, fused, aux)
    out = model.apply(params, fused, aux)
    assert out["logits"].shape == (B, 2)
    assert out["probs"].shape == (B, 2)
    np.testing.assert_allclose(np.asarray(out["probs"]).sum(-1), 1.0, atol=1e-5)
    assert 0.5 <= float(out["temperature"]) <= 5.0


def test_forest_matches_loop_reference():
    """Vectorized routing == per-tree/per-depth loop implementation."""
    rng = np.random.default_rng(0)
    T, K, F, C, Bn = 3, 4, 10, 2, 5
    tau = 10.0
    x = rng.standard_normal((Bn, F)).astype(np.float32)
    gates = rng.standard_normal((T, K, F)).astype(np.float32)
    thresh = rng.standard_normal((T, K)).astype(np.float32)
    leaf = rng.standard_normal((T, 1 << K, C)).astype(np.float32)

    fast = np.asarray(
        oblivious_forest_logits(
            jnp.asarray(x), jnp.asarray(gates), jnp.asarray(thresh),
            jnp.asarray(leaf), tau,
        )
    )

    # loop implementation mirroring the reference's leaf-doubling order
    def one_tree(t):
        probs = np.ones((Bn, 1), dtype=np.float64)
        for k in range(K):
            alpha = np.exp(gates[t, k] - gates[t, k].max())
            alpha /= alpha.sum()
            feat = (x * alpha).sum(-1, keepdims=True)
            s = 1.0 / (1.0 + np.exp(-tau * (feat - thresh[t, k])))
            probs = np.concatenate([probs * (1 - s), probs * s], axis=1)
        return probs @ leaf[t]

    slow = np.stack([one_tree(t) for t in range(T)], axis=1)
    np.testing.assert_allclose(fast, slow, atol=1e-4)


def test_leaf_bit_matrix():
    bits = leaf_bit_matrix(2)
    np.testing.assert_array_equal(bits, [[0, 1, 0, 1], [0, 0, 1, 1]])


def test_gcn_shapes():
    n, f = 16, 416
    x = jax.random.normal(KEY, (n, f))
    adj = (jax.random.uniform(KEY, (n, n)) > 0.7).astype(jnp.float32)
    adj = jnp.maximum(adj, adj.T)

    gcn = SimpleGCN(hid=256, out_dim=128)
    params = gcn.init(KEY, x, adj)
    z = gcn.apply(params, x, adj)
    assert z.shape == (n, 128)

    # pre-normalized path must equal the normalize-inside path
    a_norm = normalize_adjacency(adj)
    z2 = gcn.apply(params, x, a_norm, normalize=False)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), atol=1e-5)

    gm = GNNModel(hid=256, out_dim=128)
    pm = gm.init(KEY, x, adj)
    assert gm.apply(pm, x, adj).shape == (n, 128)


def test_graph_builders():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((20, 8)).astype(np.float32)
    A = cosine_knn(X, k=4)
    assert A.shape == (20, 20)
    assert np.array_equal(A, A.T)
    assert np.all(np.diag(A) >= 1.0)

    sets = [{"a", "b"} if i % 2 else {"b", "c"} for i in range(20)]
    A2 = add_ocr_overlap_weights(A.copy(), sets, alpha=0.4)
    assert (A2 - A).max() > 0
    d = rng.uniform(size=20)
    A3 = add_temporal_inconsistency(A2.copy(), d, beta=0.25)
    assert A3.shape == A.shape
    full = build_dense_adj(X, sets, d)
    assert np.isfinite(full).all()


def test_numpy_gcn_learns():
    rng = np.random.default_rng(0)
    n = 30
    y = (np.arange(n) >= n // 2).astype(int)
    X = rng.standard_normal((n, 8)).astype(np.float32) + y[:, None] * 2.0
    A = np.eye(n, dtype=np.float32)
    A_norm = normalize_adj(A)
    gcn = GNNSimple(in_dim=8, hid=16)
    mask = np.ones(n, dtype=bool)
    for _ in range(100):
        gcn.forward(X, A_norm)
        gcn.backward(A_norm, y, mask, lr=0.1)
    acc = (gcn.predict(X, A_norm) == y).mean()
    assert acc > 0.8


def test_post_encoder_and_hetero():
    x = jax.random.normal(KEY, (10, 16))
    senders = jnp.array([0, 1, 2, 3])
    receivers = jnp.array([1, 2, 3, 0])
    enc = PostEncoder(hid=32, out_dim=8)
    params = enc.init(KEY, x, senders, receivers)
    assert enc.apply(params, x, senders, receivers).shape == (10, 8)

    nodes = {
        "posts": jax.random.normal(KEY, (6, 16)),
        "phrases": jax.random.normal(KEY, (4, 8)),
        "sources": jax.random.normal(KEY, (3, 4)),
    }
    edges = {
        "post_phrase": (jnp.array([0, 1, 2]), jnp.array([0, 1, 2])),
        "source_post": (jnp.array([0, 1]), jnp.array([0, 3])),
    }
    h = HeteroFGHGNN(hid=32, out_dim=8)
    params = h.init(KEY, nodes, edges)
    out = h.apply(params, nodes, edges)
    assert out["posts"].shape == (6, 8)


def test_hetero_sentinel_padded_edges_are_inert():
    """Sentinel-padded hetero edges (per-endpoint ghost ids, pad_edges)
    must contribute NOTHING — clip-only gathering used to alias ghost
    senders onto the last real node of the other node set."""
    from ultrafnd_git_tpu.models.graph_nets import pad_edges

    nodes = {
        "posts": jax.random.normal(KEY, (3, 16)),  # P=3
        "phrases": jax.random.normal(KEY, (5, 8)),  # H=5 > P
        "sources": jax.random.normal(KEY, (2, 4)),
    }
    pp = (jnp.array([0, 1]), jnp.array([0, 1]))
    sp = (jnp.array([0]), jnp.array([2]))

    h = HeteroFGHGNN(hid=16, out_dim=8)
    params = h.init(KEY, nodes, {"post_phrase": pp, "source_post": sp})
    ref = h.apply(params, nodes, {"post_phrase": pp, "source_post": sp})

    pp_s, pp_r, _ = pad_edges(pp[0], pp[1], 8, 3, num_receiver_nodes=5)
    sp_s, sp_r, _ = pad_edges(sp[0], sp[1], 8, 2, num_receiver_nodes=3)
    padded = h.apply(
        params, nodes, {"post_phrase": (pp_s, pp_r), "source_post": (sp_s, sp_r)}
    )
    for k in ("posts", "phrases", "sources"):
        np.testing.assert_allclose(
            np.asarray(padded[k]), np.asarray(ref[k]), atol=1e-6
        )


def test_cos01_range():
    x = jax.random.normal(KEY, (4, 8))
    c = cos01(x, x)
    np.testing.assert_allclose(np.asarray(c), 1.0, atol=1e-5)
    c2 = cos01(x, -x)
    np.testing.assert_allclose(np.asarray(c2), 0.0, atol=1e-5)


def test_simple_gcn_shortcuts_are_exact():
    """ax and out_rows are pure batching shortcuts — outputs identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ultrafnd_git_tpu.models.gnn import SimpleGCN, normalize_adjacency

    rng = np.random.default_rng(0)
    n, f = 24, 16
    x = jnp.asarray(rng.standard_normal((n, f)), jnp.float32)
    adj = jnp.asarray((rng.uniform(size=(n, n)) > 0.7), jnp.float32)
    adj = 0.5 * (adj + adj.T)
    a = normalize_adjacency(adj)

    gcn = SimpleGCN(hid=8, out_dim=4)
    params = gcn.init(jax.random.PRNGKey(0), x, a, normalize=False)

    full = gcn.apply(params, x, a, normalize=False)
    via_ax = gcn.apply(params, x, a, normalize=False, ax=a @ x)
    np.testing.assert_allclose(np.asarray(full), np.asarray(via_ax), atol=1e-6)

    idx = jnp.asarray([3, 0, 17, 17, 9])
    rows = gcn.apply(params, x, a, normalize=False, ax=a @ x, out_rows=idx)
    np.testing.assert_allclose(
        np.asarray(full)[np.asarray(idx)], np.asarray(rows), atol=1e-6
    )
