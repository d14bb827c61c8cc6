"""FakeSV metadata dataset (v2 canonical layout).

Parity target: reference `src/data_pipeline/fakesv_dataset.py:15-96`:
  * `data_complete.json` parsed as one JSON array OR JSONL (ref :36-44)
  * label map: 假/fake -> 1 (fake); 辟谣/true/real -> 0 (real); fallback 0
    (ref :47-53). NOTE the reference's *v1* pipeline maps 辟谣 -> fake — we
    standardize on the canonical v2 convention here (SURVEY §2.3).
  * per-record accessor returning id/title/ocr/comments/label (ref :60-73)
  * light augmentation helpers (ref :75-96)
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List

import numpy as np

FAKE_LABELS = ("假", "fake")
REAL_LABELS = ("辟谣", "true", "real")


def label_of(record: Dict[str, Any]) -> int:
    ann = (record.get("annotation") or "").strip()
    if ann in FAKE_LABELS:
        return 1
    if ann in REAL_LABELS:
        return 0
    return 0


class FakeSVRawDataset:
    """Metadata wrapper over a FakeSV-style data root.

    Expects `data_root/data_complete.json`; `videos/` and `video_comment/`
    are optional (used only by the raw-media pipeline in data/media.py).
    """

    def __init__(self, data_root: str):
        self.root = Path(data_root)
        self.json_path = self.root / "data_complete.json"
        if not self.json_path.exists():
            raise FileNotFoundError(
                f"data_complete.json not found at {self.json_path}"
            )

        self.records: List[Dict[str, Any]] = []
        with open(self.json_path, "r", encoding="utf-8-sig") as fh:
            # skip BOM/leading whitespace before sniffing array vs JSONL —
            # a pretty-printed or BOM'd array file is still a JSON array
            head = ""
            while True:
                ch = fh.read(1)
                if not ch or not ch.isspace():
                    head = ch
                    break
            fh.seek(0)
            if head == "[":
                self.records = json.load(fh)
            else:
                for line in fh:
                    line = line.strip()
                    if line:
                        self.records.append(json.loads(line))

        self.labels = np.array([label_of(r) for r in self.records], dtype=np.int64)

    def __len__(self) -> int:
        return len(self.records)

    def get_item(self, idx: int) -> Dict[str, Any]:
        r = self.records[idx]
        comments = r.get("comments") or []
        if isinstance(comments, str):
            comments = [comments]
        return {
            "id": r.get("video_id") or f"rec_{idx}",
            "title": r.get("title") or "",
            "ocr": r.get("ocr") or "",
            "comments": comments,
            "label": int(self.labels[idx]),
        }

    # ------------------------------------------------------------------
    # Light augmentation helpers (host-side numpy; used by the raw pipeline)
    # ------------------------------------------------------------------
    @staticmethod
    def augment_audio(
        audio: np.ndarray, rng: np.random.Generator | None = None
    ) -> np.ndarray:
        rng = rng or np.random.default_rng()
        noise_factor = rng.uniform(0.005, 0.05)
        return audio + noise_factor * rng.standard_normal(len(audio))

    @staticmethod
    def augment_video(
        video: np.ndarray, rng: np.random.Generator | None = None
    ) -> np.ndarray:
        """Random horizontal flip / spatial rotation.

        The reference helper (`fakesv_dataset.py:82-88`, unused there)
        rotates over np.rot90's DEFAULT axes (0, 1) — for a (T, H, W, C)
        clip that scrambles the time-height plane and changes the tensor
        shape. Implemented here as the intended spatial transform:
        flip/rotate the (H, W) plane of every frame.
        """
        rng = rng or np.random.default_rng()
        spatial = video.ndim >= 4  # (T, H, W, C) clip vs single frame
        if rng.random() < 0.5:
            video = np.flip(video, axis=2 if spatial else 1)
        if rng.random() < 0.5:
            video = np.rot90(
                video,
                k=int(rng.choice([1, 2, 3])),
                axes=(1, 2) if spatial else (0, 1),
            )
        return video

    @staticmethod
    def augment_text(text: str, rng: np.random.Generator | None = None) -> str:
        rng = rng or np.random.default_rng()
        words = text.split()
        if len(words) > 2:
            words[int(rng.integers(0, len(words)))] = "random"
        return " ".join(words)
