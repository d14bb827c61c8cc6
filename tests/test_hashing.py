import numpy as np

from ultrafnd_git_tpu.ops.hashing import (
    fnv1a_64,
    hash_embed,
    hash_embed_batch,
    stable_unit_score,
)
from ultrafnd_git_tpu.ops.jaccard import (
    build_adj_from_ocr,
    build_weighted_adj_from_ocr,
    jaccard,
)


def test_fnv1a_known_values():
    # well-known FNV-1a 64-bit test vectors
    assert fnv1a_64("") == 0xCBF29CE484222325
    assert fnv1a_64("a") == 0xAF63DC4C8601EC8C


def test_hash_embed_deterministic_and_normalized():
    v1 = hash_embed("新闻 视频 新闻", 64)
    v2 = hash_embed("新闻 视频 新闻", 64)
    np.testing.assert_array_equal(v1, v2)
    assert np.isclose(np.linalg.norm(v1), 1.0, atol=1e-4)
    assert hash_embed("", 64).sum() == 0.0


def test_hash_embed_batch_matches_single():
    texts = ["a b c", "", "外星 危机 警告 外星", "x"]
    batch = hash_embed_batch(texts, 32)
    singles = np.stack([hash_embed(t, 32) for t in texts])
    np.testing.assert_allclose(batch, singles, atol=1e-6)


def test_stable_unit_score_range():
    for s in ["", "abc", "视频"]:
        assert 0.0 <= stable_unit_score(s) < 1.0


def test_jaccard_scalar():
    assert jaccard(set(), set()) == 0.0
    assert jaccard({"a"}, {"a"}) == 1.0 / (1.0 + 1e-9)
    assert jaccard({"a", "b"}, {"b", "c"}) == 1.0 / (3.0 + 1e-9)


def test_adjacency_matches_loop_reference():
    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(30)]
    ocr_sets = [
        set(rng.choice(vocab, size=rng.integers(0, 8), replace=False))
        for _ in range(40)
    ]
    thresh = 0.12
    fast = build_adj_from_ocr(ocr_sets, thresh)

    n = len(ocr_sets)
    slow = np.zeros((n, n), dtype=np.float32)
    for i in range(n):
        slow[i, i] = 1.0
        for j in range(i + 1, n):
            if jaccard(ocr_sets[i], ocr_sets[j]) >= thresh:
                slow[i, j] = slow[j, i] = 1.0

    np.testing.assert_array_equal(fast, slow)


def test_weighted_adjacency():
    sets = [{"a", "b"}, {"b", "c"}, {"z"}]
    w = build_weighted_adj_from_ocr(sets, thresh=0.1)
    assert w[0, 1] > 0 and w[0, 2] == 0.0
    assert np.all(np.diag(w) == 1.0)
