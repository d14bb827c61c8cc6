"""OCR phrase tokenization + phrase-feature pickle I/O.

Parity target: reference `src/scripts/generate_ocr_phrase_features.py`:
regex tokenization `[\\w一-龥]+` keeping tokens of length >= 2, pickled as
{"phrase_sets": {vid: set}, "freqs": {vid: {tok: n}}}.

The reference CLI accepts `--ocr_phrase_pkl` but never reads it
(SURVEY §2.3 "dead parameter"); here the cache builder actually consumes it
when provided — the regex tokenization is richer than the whitespace split.
"""
from __future__ import annotations

import pickle
import re
from collections import Counter
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Set

_TOKEN_RE = re.compile(r"[\w一-龥]+")


def clean_tokens(text: str) -> List[str]:
    """Regex tokens (word chars + CJK), length >= 2."""
    return [t for t in _TOKEN_RE.findall(text or "") if len(t) >= 2]


def whitespace_tokens(text: str) -> Set[str]:
    """The trainer's light tokenizer: whitespace split, length >= 2.

    Mirrors reference `fakesv_dataset.py:192-197`.
    """
    out: Set[str] = set()
    for tok in (text or "").replace("\t", " ").replace("\n", " ").split():
        tok = tok.strip()
        if len(tok) >= 2:
            out.add(tok)
    return out


def build_phrase_features(
    records: Sequence[Dict],
) -> Dict[str, Dict]:
    """Offline OCR phrase-feature structure keyed by video id."""
    phrase_sets: Dict[str, Set[str]] = {}
    freqs: Dict[str, Dict[str, int]] = {}
    for i, rec in enumerate(records):
        vid = rec.get("video_id") or rec.get("id") or f"rec_{i}"
        toks = clean_tokens(rec.get("ocr") or "")
        phrase_sets[vid] = set(toks)
        freqs[vid] = dict(Counter(toks))
    return {"phrase_sets": phrase_sets, "freqs": freqs}


def save_phrase_features(features: Dict, path: str) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as fh:
        pickle.dump(features, fh)


def load_phrase_features(path: str) -> Optional[Dict]:
    try:
        with open(path, "rb") as fh:
            data = pickle.load(fh)
        if isinstance(data, dict) and "phrase_sets" in data:
            return data
    except Exception:
        pass
    return None


def ocr_sets_for_records(
    records: Sequence[Dict],
    ocr_phrase_pkl: Optional[str] = None,
    clean_fallback: Optional[bool] = None,
) -> List[Set[str]]:
    """Per-record OCR token sets, preferring the richer pickle when given.

    `clean_fallback` controls how records ABSENT from the pickle are
    tokenized: the regex `clean_tokens` (the pickle's own tokenization) or
    the whitespace split. Default (None) = clean exactly when a pickle was
    loaded — mixing the two tokenizations in one corpus would make the
    Jaccard vocabularies disjoint and silently isolate those nodes.
    Serving passes True explicitly when the CHECKPOINT was trained with a
    pickle, so unseen records match the corpus tokenization even if the
    pickle file is gone at serving time.
    """
    pkl = load_phrase_features(ocr_phrase_pkl) if ocr_phrase_pkl else None
    if clean_fallback is None:
        clean_fallback = pkl is not None
    sets: List[Set[str]] = []
    for i, rec in enumerate(records):
        vid = rec.get("video_id") or rec.get("id") or f"rec_{i}"
        if pkl is not None and vid in pkl["phrase_sets"]:
            sets.append(set(pkl["phrase_sets"][vid]))
        elif clean_fallback:
            sets.append(set(clean_tokens(rec.get("ocr") or "")))
        else:
            sets.append(whitespace_tokens(rec.get("ocr") or ""))
    return sets
