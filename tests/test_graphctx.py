"""Shared graph context (ops/graphctx) — trainer/serving single source."""
import numpy as np

from ultrafnd_git_tpu.data.cache import build_feature_cache
from ultrafnd_git_tpu.data.dataset import FakeSVRawDataset
from ultrafnd_git_tpu.ops.graphctx import (
    SLICES,
    build_graph_context,
    compact_node_features,
)


def test_compact_features_shape_and_norm(fixture_data_root):
    cache = build_feature_cache(FakeSVRawDataset(fixture_data_root), seed=0)
    xg = compact_node_features(cache)
    assert xg.shape == (len(cache["labels"]), sum(w for _, w in SLICES))
    norms = np.linalg.norm(xg, axis=1)
    np.testing.assert_allclose(norms[norms > 1e-6], 1.0, atol=1e-4)


def test_graph_context_consistency(fixture_data_root):
    cache = build_feature_cache(FakeSVRawDataset(fixture_data_root), seed=0)
    g = build_graph_context(cache, thresh=0.12)
    n = len(cache["labels"])
    assert g.adj.shape == (n, n) and g.a_norm.shape == (n, n)
    # adjacency symmetric with unit diagonal; a_norm rows consistent with deg
    np.testing.assert_allclose(g.adj, g.adj.T)
    np.testing.assert_allclose(np.diag(g.adj), 1.0)
    np.testing.assert_allclose(g.deg, g.adj.sum(axis=1) + 1.0)
    # ax really is the first propagation
    np.testing.assert_allclose(g.ax, g.a_norm @ g.xg, atol=1e-5)
    # a_norm diagonal = 2 / deg (adj diag 1 + added self-loop)
    np.testing.assert_allclose(np.diag(g.a_norm), 2.0 / g.deg, atol=1e-6)
