#!/usr/bin/env python3
"""Offline OCR preprocessing: phrase-set pickle + placeholder mask hashes.

Parity target: reference `src/scripts/generate_ocr_phrase_features.py`
(same two artifacts, same CLI):
  1) `<out_root>/preprocess_ocr/sam/<vid>.mask.txt` — stable md5 of the
     sorted token set (placeholder for a future SAM mask);
  2) `<out_root>/fakesv/preprocess_ocr/ocr_phrase_fea.pkl` —
     {"phrase_sets": {vid: set}, "freqs": {vid: {tok: n}}} with regex
     tokenization `[\\w一-龥]+`, min length 2.

Unlike the reference, the produced pickle is actually CONSUMED downstream:
`--ocr_phrase_pkl` feeds the cache builder's graph tokenization
(data/ocr.py, fixing the dead parameter noted in SURVEY §2.3).

Usage:
  python scripts/generate_ocr_phrase_features.py \
      --data_path /data/FakeSV/data_complete.json --out_root .
"""
import argparse
import hashlib
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from ultrafnd_git_tpu.data.ocr import build_phrase_features, save_phrase_features


def _load_records(path: Path) -> list:
    """data_complete.json semantics: one JSON array OR JSONL."""
    import json

    with open(path, "r", encoding="utf-8") as fh:
        head = fh.read(1)
        fh.seek(0)
        if head == "[":
            return json.load(fh)
        return [json.loads(ln) for ln in fh if ln.strip()]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--data_path", required=True, help="data_complete.json (array or JSONL)"
    )
    ap.add_argument(
        "--out_root",
        required=True,
        help="Root under which preprocess_ocr/ and fakesv/ are created",
    )
    args = ap.parse_args()

    out_sam = Path(args.out_root) / "preprocess_ocr" / "sam"
    out_pkl_dir = Path(args.out_root) / "fakesv" / "preprocess_ocr"
    out_sam.mkdir(parents=True, exist_ok=True)
    out_pkl_dir.mkdir(parents=True, exist_ok=True)

    features = build_phrase_features(_load_records(Path(args.data_path)))

    for vid, toks in features["phrase_sets"].items():
        digest = hashlib.md5(
            (" ".join(sorted(toks))).encode("utf-8")
        ).hexdigest()
        (out_sam / f"{vid}.mask.txt").write_text(digest, encoding="utf-8")

    out_pkl = out_pkl_dir / "ocr_phrase_fea.pkl"
    save_phrase_features(features, str(out_pkl))

    print("Wrote:")
    print(" -", out_sam)
    print(" -", out_pkl)


if __name__ == "__main__":
    main()
