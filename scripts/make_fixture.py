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


if __name__ == "__main__":
    main()
