#!/usr/bin/env python3
"""Generate the tiny synthetic FakeSV fixture used by hermetic tests.

The reference ships no fixture (its smoke test hard-codes the author's Mac
paths, SURVEY §4); this creates a deterministic ~64-record JSONL in the
canonical `data_complete.json` layout with overlapping OCR vocab (so the
Jaccard graph has edges) and both label conventions' surface forms.
"""
import json
import random
from pathlib import Path

OUT = Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "fakesv_tiny"

TOPICS = [
    ("外星人 入侵 地球 警告", "外星 飞船 出现 危险 逃离", "假"),
    ("辟谣 外星人 谣言 不实", "专家 辟谣 谣言 证据 科学", "辟谣"),
    ("某地 疫苗 致命 危机", "疫苗 危险 致命 隐瞒 警告", "假"),
    ("疫苗 安全 官方 说明", "官方 数据 证明 疫苗 安全", "辟谣"),
    ("食物 相克 致死 视频", "食物 相克 中毒 危险 消失", "假"),
    ("食物 相克 说法 不成立", "科学 实验 食物 安全 辟谣", "辟谣"),
    ("手机 辐射 致癌 实录", "手机 辐射 致癌 警告 危机", "fake"),
    ("手机 辐射 无害 科普", "科普 辐射 标准 安全 研究", "real"),
]

COMMENTS = [
    "太可怕了 赶紧转发",
    "这是真的吗",
    "假的 别信",
    "官方已经辟谣了",
    "吓死我了",
    "求真相",
    "谣言止于智者",
    "已举报",
]


def write_media(records, n_media: int = 8) -> None:
    """Tiny real media for the raw pipeline: cv2 videos + wav sidecars +
    comment JSONs for the first `n_media` records (fake ones get hard
    scene cuts; real ones smooth motion — so tamper scores differ)."""
    import json as _json

    import numpy as np

    try:
        import cv2
        from scipy.io import wavfile
    except Exception as exc:
        print(f"cv2/scipy unavailable ({exc!r}) — skipping media fixture")
        return

    vid_dir = OUT / "videos"
    com_dir = OUT / "video_comment"
    vid_dir.mkdir(exist_ok=True)
    com_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(99)

    for rec in records[:n_media]:
        vid = rec["video_id"]
        fake = rec["annotation"] in ("假", "fake")
        h = w = 64
        path = vid_dir / f"{vid}.avi"  # MJPG/avi: codec always available
        vw = cv2.VideoWriter(
            str(path), cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (w, h)
        )
        base = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        for t in range(12):
            if fake and t % 4 == 0:  # hard scene cuts
                frame = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            else:  # smooth drift
                frame = np.roll(base, shift=t, axis=1)
            vw.write(frame)
        vw.release()

        tone = 440.0 if fake else 220.0
        t = np.arange(16000) / 16000.0
        wave = (0.3 * np.sin(2 * np.pi * tone * t)).astype(np.float32)
        wavfile.write(
            str(vid_dir / f"{vid}.wav"),
            16000,
            (wave * 32767).astype(np.int16),
        )

        with open(com_dir / f"{vid}.json", "w", encoding="utf-8") as fh:
            _json.dump(
                [{"content": c} for c in rec["comments"][:2]],
                fh,
                ensure_ascii=False,
            )
    # one deliberately corrupt comment file (the loader must skip it)
    (com_dir / "corrupt.json").write_text("{not json", encoding="utf-8")
    print(f"wrote media for {n_media} records under {vid_dir}")


HARD_OUT = Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "fakesv_hard"

# The aux-path sensational terms, imported from the cache builder itself so
# the fixture's class-skewed emotion signal can never silently decouple from
# the aux feature it exists to exercise (ref fakesv_dataset.py:184).
import sys  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from ultrafnd_git_tpu.data.cache import EMO_TERMS  # noqa: E402


def make_hard_fixture(
    n: int = 640,
    own_pool_p: float = 0.30,
    cross_pool_p: float = 0.12,
    label_flip_p: float = 0.10,
    seed: int = 20260817,
    out: Path = None,
) -> Path:
    """Non-saturating parity fixture (VERDICT r2 item 1).

    The tiny fixture's titles carry the class word verbatim, so any trainer
    pins AUC at 1.0 from epoch 1 and the 0.5-pt parity bar is unfalsifiable.
    Here the class signal is *distributional*: every record's tokens come
    from a shared neutral vocabulary, with class-leaning tokens mixed in at
    overlapping rates (own-class 0.30 vs cross-class 0.12 per token), and
    10% of annotations are label-flipped. Independent label noise at rate p
    caps achievable AUC at 1-p (a perfect scorer mis-orders exactly the
    flipped pairs), so a well-trained model lands in ~(0.75, 0.90) —
    strictly inside (0.5, 1.0), where a 0.5-pt metric delta is meaningful.
    """
    out = out or HARD_OUT
    rng = random.Random(seed)
    out.mkdir(parents=True, exist_ok=True)

    neutral = [f"话题{i:03d}" for i in range(120)]
    # class-leaning pools (disjoint surface forms; overlap comes from the
    # sampling mixture, not shared tokens)
    fake_pool = [f"危言{i:02d}" for i in range(30)]
    real_pool = [f"实证{i:02d}" for i in range(30)]
    comment_pool = COMMENTS + [f"评论{i:02d}" for i in range(12)]

    def sample_tokens(true_fake: bool, k: int):
        own = fake_pool if true_fake else real_pool
        other = real_pool if true_fake else fake_pool
        toks = []
        for _ in range(k):
            u = rng.random()
            if u < own_pool_p:
                toks.append(rng.choice(own))
            elif u < own_pool_p + cross_pool_p:
                toks.append(rng.choice(other))
            else:
                toks.append(rng.choice(neutral))
        return toks

    records = []
    for i in range(n):
        true_fake = i % 2 == 0  # balanced true classes
        title_toks = sample_tokens(true_fake, 8)
        ocr_toks = sample_tokens(true_fake, 10)
        # aux-path signal: sensational terms appear more often on true-fake
        emo_rate = 0.35 if true_fake else 0.12
        if rng.random() < emo_rate:
            title_toks.append(rng.choice(EMO_TERMS))
        if rng.random() < emo_rate:
            ocr_toks.append(rng.choice(EMO_TERMS))
        observed_fake = true_fake
        if rng.random() < label_flip_p:
            observed_fake = not observed_fake
        rec = {
            "video_id": f"hard_{i:05d}",
            "title": " ".join(title_toks),
            "ocr": " ".join(ocr_toks) if i % 11 else "",
            "annotation": ("假" if observed_fake else "辟谣"),
            "comments": rng.sample(comment_pool, rng.randint(0, 4)),
        }
        records.append(rec)

    with open(out / "data_complete.json", "w", encoding="utf-8") as fh:
        for rec in records:
            fh.write(json.dumps(rec, ensure_ascii=False) + "\n")
    print(f"wrote {len(records)} hard records to {out/'data_complete.json'}")
    return out


def main() -> None:
    rng = random.Random(1234)
    OUT.mkdir(parents=True, exist_ok=True)
    records = []
    for i in range(64):
        title, ocr, ann = TOPICS[i % len(TOPICS)]
        extra = rng.sample(["视频 记录", "现场 画面", "最新 消息", ""], 1)[0]
        n_comments = rng.randint(0, 5)
        rec = {
            "video_id": f"douyin_{i:04d}",
            "title": f"{title} 第{i}期",
            "ocr": (ocr + " " + extra).strip() if i % 7 else "",
            "annotation": ann,
            "comments": rng.sample(COMMENTS, n_comments),
        }
        records.append(rec)

    with open(OUT / "data_complete.json", "w", encoding="utf-8") as fh:
        for rec in records:
            fh.write(json.dumps(rec, ensure_ascii=False) + "\n")
    print(f"wrote {len(records)} records to {OUT/'data_complete.json'}")
    write_media(records)


if __name__ == "__main__":
    import sys

    if "--hard" in sys.argv:
        make_hard_fixture()
    else:
        main()
