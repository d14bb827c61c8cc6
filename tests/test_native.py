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
