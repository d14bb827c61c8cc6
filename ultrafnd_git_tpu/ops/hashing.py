"""Stable, vectorizable hash embeddings.

The reference falls back to bag-of-hashed-tokens embeddings whenever HF
models are unavailable (`src/core_blocks/text_blocks.py:19-27`,
`audio_blocks.py:47-53`, `visual_blocks.py:117-122`). It uses Python's
built-in `hash`, which is randomized per process (PYTHONHASHSEED), so the
reference's own fallback features are NOT reproducible across runs.

We deliberately replace it with 64-bit FNV-1a over UTF-8 bytes: stable
across processes, hosts and Python versions, so cached features, parity
tests and multi-host data loading all agree.

Hot path: the per-record loop is hashed once per unique token and memoized;
embedding assembly is a numpy scatter-add over all records at once.
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = 0xFFFFFFFFFFFFFFFF

# Featurization salt (TrainConfig.hash_salt / --hash_salt). The offline
# hash features are a RANDOM PROJECTION whose draw is fixed by the hash
# function; the measured accuracy sensitivity across draws (BASELINE.md
# "Accuracy parity, attributed": the same trainer swings several points
# of acc between the reference's PYTHONHASHSEED draw and our FNV draw)
# makes the draw itself a hyperparameter worth controlling. A salt
# re-draws EVERY stable-hash featurization (bag-of-token embeddings,
# unit-score proxies, tower token ids) coherently, while OCR token sets —
# and therefore the Jaccard graph — are raw strings and never move.
# FNV's prefix property makes the salted hash exact: continuing from
# fnv1a(salt) equals hashing salt||token in one pass.
_SALT = ""
_BASIS = _FNV_OFFSET


def _fnv1a_64_raw(token: str, basis: int) -> int:
    h = basis
    for b in token.encode("utf-8"):
        h ^= b
        h = (h * _FNV_PRIME) & _MASK64
    return h


def set_hash_salt(salt: str) -> None:
    """Set the process-wide featurization salt ("" = canonical draw).

    Must be set BEFORE featurizing (the trainer/Predictor do this from
    TrainConfig / the checkpoint cfg); features built under different
    salts never mix — the cache fingerprint includes the salt.
    """
    global _SALT, _BASIS
    salt = salt or ""
    if salt == _SALT:
        return
    _SALT = salt
    _BASIS = _fnv1a_64_raw(salt, _FNV_OFFSET) if salt else _FNV_OFFSET
    _CACHE.clear()


def get_hash_salt() -> str:
    return _SALT


def get_hash_basis() -> int:
    """FNV starting state of the process-wide draw (see set_hash_salt)."""
    return _BASIS


def basis_for_salt(salt: str) -> int:
    """FNV starting state for an EXPLICIT salt, independent of the
    process-wide one — for components pinned to their own draw (e.g. a
    tower checkpoint trained under a different salt than the live one)."""
    return _fnv1a_64_raw(salt, _FNV_OFFSET) if salt else _FNV_OFFSET


def fnv1a_64(token: str, basis: Optional[int] = None) -> int:
    """64-bit FNV-1a hash of a unicode string (UTF-8 bytes), under the
    process-wide salt (unsalted by default) or an explicit `basis`
    (`basis_for_salt`)."""
    return _fnv1a_64_raw(token, _BASIS if basis is None else basis)


class _TokenHashCache:
    """Memoized token -> hash mapping, BOUNDED.

    A long-running serving process sees an unbounded stream of unique
    tokens; an uncapped dict would grow forever. FNV-1a is cheap, so the
    cap simply resets the memo — correctness is unaffected.
    """

    MAX_ENTRIES = 1 << 20

    def __init__(self) -> None:
        self._raw: Dict[str, int] = {}

    def bucket(self, token: str, dim: int) -> int:
        h = self._raw.get(token)
        if h is None:
            if len(self._raw) >= self.MAX_ENTRIES:
                self._raw.clear()
            h = fnv1a_64(token)
            self._raw[token] = h
        return h % dim

    def clear(self) -> None:
        """Drop memoized hashes (set_hash_salt: the draw changed)."""
        self._raw.clear()


_CACHE = _TokenHashCache()


def hash_embed(text: str, dim: int, max_tokens: int | None = None) -> np.ndarray:
    """Bag-of-hashed-tokens embedding, L2-normalized.

    Mirrors the reference fallback semantics (whitespace tokens, +1 count per
    token, L2 norm with 1e-9 eps) with a stable hash. `max_tokens` mirrors the
    reference audio/visual variants which only consume the first `dim` tokens.
    Empty text returns the zero vector (matching `text_blocks._hash_embed`,
    which returns zeros without normalizing).
    """
    v = np.zeros(dim, dtype=np.float32)
    if not text:
        return v
    toks = text.split()
    if max_tokens is not None:
        toks = toks[:max_tokens]
    for tok in toks:
        v[_CACHE.bucket(tok, dim)] += 1.0
    n = float(np.linalg.norm(v))
    if n == 0.0:
        return v
    return (v / (n + 1e-9)).astype(np.float32)


def hash_embed_batch(
    texts: Sequence[str], dim: int, max_tokens: int | None = None
) -> np.ndarray:
    """Vectorized batch of hash embeddings: one scatter-add over all records.

    Equivalent to stacking `hash_embed(t, dim)` per text, but tokenizes and
    hashes each unique token once and assembles the (N, dim) matrix with a
    single np.add.at call — this is the batched replacement for the
    reference's per-string hot loop (`fakesv_dataset.py:149-197`).
    """
    # Native C++ fast path (one pass, zero Python-object traffic); the
    # numpy path below is the reference implementation and the fallback.
    from ultrafnd_git_tpu import native

    native_out = native.hash_embed_batch_native(
        texts, dim, max_tokens, basis=_BASIS
    )
    if native_out is not None:
        return native_out

    n = len(texts)
    out = np.zeros((n, dim), dtype=np.float32)

    rows: List[int] = []
    cols: List[int] = []
    for i, text in enumerate(texts):
        if not text:
            continue
        toks = text.split()
        if max_tokens is not None:
            toks = toks[:max_tokens]
        for tok in toks:
            rows.append(i)
            cols.append(_CACHE.bucket(tok, dim))

    if rows:
        np.add.at(out, (np.asarray(rows), np.asarray(cols)), 1.0)
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        np.divide(out, norms + 1e-9, out=out, where=norms > 0)
    return out.astype(np.float32)


def stable_unit_score(text: str) -> float:
    """Deterministic pseudo-probability in [0,1) from a string.

    Stable replacement for the reference's `abs(hash(x)) % 1000` score proxies
    (`audio_blocks.py:239`, `visual_blocks.py:369`).
    """
    return float((fnv1a_64(text) % 1000) % 100) / 100.0


def token_vocabulary(token_sets: Iterable[Iterable[str]]) -> Dict[str, int]:
    """Assign consecutive ids to all unique tokens across the corpus."""
    vocab: Dict[str, int] = {}
    for toks in token_sets:
        for t in toks:
            if t not in vocab:
                vocab[t] = len(vocab)
    return vocab
