"""Native C++ host ops: equivalence with the pure-Python reference path."""
import os

import numpy as np
import pytest

from ultrafnd_git_tpu import native
from ultrafnd_git_tpu.ops.hashing import fnv1a_64

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

TEXTS = [
    "hello world hello",
    "外星人 入侵 地球 警告 危险",
    "",
    "mixed 中文 and english tokens 123",
    "   leading and trailing   ",
    "　ideographic　space　split",  # Unicode whitespace
    "nbsp\xa0separated\xa0tokens",
    "single",
    "a " * 500,  # many repeated tokens
]


def _python_hash_embed_batch(texts, dim, max_tokens=None):
    """The numpy reference path, bypassing the native dispatch."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, text in enumerate(texts):
        if not text:
            continue
        toks = text.split()
        if max_tokens is not None:
            toks = toks[:max_tokens]
        for tok in toks:
            out[i, fnv1a_64(tok) % dim] += 1.0
        n = float(np.linalg.norm(out[i]))
        if n > 0:
            out[i] /= n + 1e-9
    return out


def test_fnv1a_matches_python():
    for tok in ["", "a", "hello", "外星人", "🚀emoji", "x" * 1000]:
        assert native.fnv1a_64_native(tok) == fnv1a_64(tok)


@pytest.mark.parametrize("dim", [16, 128, 768])
def test_hash_embed_batch_matches_python(dim):
    ours = native.hash_embed_batch_native(TEXTS, dim)
    ref = _python_hash_embed_batch(TEXTS, dim)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_max_tokens_respected():
    ours = native.hash_embed_batch_native(TEXTS, 64, max_tokens=3)
    ref = _python_hash_embed_batch(TEXTS, 64, max_tokens=3)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_dispatch_through_public_api(monkeypatch):
    from ultrafnd_git_tpu.ops import hashing

    with_native = hashing.hash_embed_batch(TEXTS, 128)
    monkeypatch.setenv("ULTRAFND_NATIVE", "0")
    native.reset()
    try:
        without_native = hashing.hash_embed_batch(TEXTS, 128)
    finally:
        monkeypatch.setenv("ULTRAFND_NATIVE", "1")
        native.reset()
    np.testing.assert_allclose(with_native, without_native, atol=1e-6)


def test_unicode_whitespace_tokenization_exact():
    # the C++ splitter must agree with str.split() on exotic whitespace
    tricky = ["a b c", "x y", "p q r", "\x1ctok\x1d"]
    ours = native.hash_embed_batch_native(tricky, 32)
    ref = _python_hash_embed_batch(tricky, 32)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


# ----------------------------------------------------------------------
# graphops: posting-list OCR-Jaccard adjacency
# ----------------------------------------------------------------------


def _random_sets(n, vocab=3000, kmax=25, seed=1, with_empties=True):
    rng = np.random.default_rng(seed)
    sets = []
    for _ in range(n):
        k = int(rng.integers(0, kmax))
        sets.append(
            set(f"tok{x}" for x in rng.choice(vocab, size=k, replace=False))
        )
    if with_empties and n >= 3:
        sets[0] = set()
        sets[n // 2] = set()
    return sets


def _numpy_reference(fn, *args):
    """Run an ops.jaccard builder with the native path disabled."""
    old = os.environ.get("ULTRAFND_NATIVE")
    os.environ["ULTRAFND_NATIVE"] = "0"
    native.reset()
    try:
        return fn(*args)
    finally:
        if old is None:
            os.environ.pop("ULTRAFND_NATIVE", None)
        else:
            os.environ["ULTRAFND_NATIVE"] = old
        native.reset()


def test_graphops_available():
    assert native.get_graph_lib() is not None


@pytest.mark.parametrize("thresh", [0.05, 0.12, 0.5])
def test_jaccard_adj_bit_identical(thresh):
    """All three builder modes match the numpy incidence-matmul path
    bit for bit (same f32 op order in the C++), including empty sets."""
    import importlib

    J = importlib.import_module("ultrafnd_git_tpu.ops.jaccard")
    sets = _random_sets(400)
    for fn in (
        lambda s: J.build_adj_from_ocr(s, thresh),
        lambda s: J.build_weighted_adj_from_ocr(s, thresh),
        J.pairwise_jaccard,
    ):
        ref = _numpy_reference(fn, sets)
        nat = fn(sets)
        np.testing.assert_array_equal(ref, nat)


def test_jaccard_adj_degenerate_threshold_falls_back():
    """mode-0 thresh <= 0 links zero-intersection pairs in the numpy
    semantics — the native builder must refuse (dense fallback), not
    silently return a sparser graph."""
    import importlib

    J = importlib.import_module("ultrafnd_git_tpu.ops.jaccard")
    sets = [set("ab"), set("cd"), set()]
    assert native.jaccard_adj_native(sets, 0.0, mode=0) is None
    adj = J.build_adj_from_ocr(sets, 0.0)  # numpy fallback: all linked
    assert adj.min() == 1.0


def test_jaccard_adj_empty_and_single():
    import importlib

    J = importlib.import_module("ultrafnd_git_tpu.ops.jaccard")
    assert J.build_adj_from_ocr([], 0.12).shape == (0, 0)
    one = J.build_adj_from_ocr([set("ab")], 0.12)
    np.testing.assert_array_equal(one, np.ones((1, 1), np.float32))
