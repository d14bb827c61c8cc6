#!/usr/bin/env python3
"""Preprocess-throughput baseline (BASELINE.md): decode + features.

Measures, on the checked-in fixture media:
  1) raw clip decode (video 30x256x256 + audio) — ours vs the reference's
     `_load_video_frames` (imported read-only from /root/reference);
  2) the full 7-encoder batch feature stage (ours);
  3) metadata-only cache build (records/s, ours).
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("ULTRAFND_DISABLE_HF", "1")

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from ultrafnd_git_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()  # the device-CV stage compile is ~50 s cold


FIXTURE = REPO / "tests" / "fixtures" / "fakesv_tiny"
REFERENCE = Path("/root/reference")


def bench_our_decode(clips, repeats=5):
    from ultrafnd_git_tpu.data.media import (
        load_audio_waveform,
        load_video_frames,
    )

    t0 = time.perf_counter()
    for _ in range(repeats):
        for p in clips:
            load_video_frames(p)
            load_audio_waveform(p)
    dt = time.perf_counter() - t0
    n = repeats * len(clips)
    print(f"ours     decode: {n/dt:8.1f} clips/s  ({dt/n*1e3:.1f} ms/clip)")
    return n / dt


def bench_reference_decode(clips, repeats=5):
    if not (REFERENCE / "src").exists():
        print("reference not mounted — skipping")
        return None
    sys.path.insert(0, str(REFERENCE))
    try:
        try:
            from src.training.run_train_eval import FakeSVRawDataset as RefDS
        except ImportError as exc:
            # the reference v1 module needs torchvision/torchaudio, which
            # this image does not ship — its decode path cannot even load
            print(f"reference decode unavailable here ({exc}) — skipping")
            return None

        ds = RefDS.__new__(RefDS)  # decode methods only, no dataset scan
        t0 = time.perf_counter()
        for _ in range(repeats):
            for p in clips:
                ds._load_video_frames(p)
                ds._load_audio(p)
        dt = time.perf_counter() - t0
        n = repeats * len(clips)
        print(
            f"reference decode: {n/dt:7.1f} clips/s  ({dt/n*1e3:.1f} ms/clip)"
        )
        return n / dt
    finally:
        sys.path.remove(str(REFERENCE))


def bench_feature_stage(repeats=3):
    from ultrafnd_git_tpu.data.media import RawMediaDataset, multimodal_collate
    from ultrafnd_git_tpu.training.pipeline_v1 import BatchFeatureExtractor

    ds = RawMediaDataset(str(FIXTURE), filter_existing=True)
    batch = multimodal_collate([ds[i] for i in range(len(ds))])
    n = len(ds)

    results = {}
    for label, device_cv in (("device-CV", True), ("host-CV", False)):
        ext = BatchFeatureExtractor(seed=0, use_device_cv=device_cv)
        if device_cv and ext._device_cv is None:
            continue
        ext(batch)  # warm (jit compiles)
        t0 = time.perf_counter()
        # production path: stream() double-buffers the device-CV stage
        # across batches (upload N+1 under host work N)
        for _ in ext.stream((batch, i) for i in range(repeats)):
            pass
        dt = (time.perf_counter() - t0) / repeats
        results[label] = dt / n
        print(
            f"feature stage ({label:9s}): {n/dt:8.1f} samples/s  "
            f"({dt/n*1e3:.1f} ms/sample)"
        )
    if len(results) == 2:
        print(
            "device-CV speedup over host-CV: "
            f"{results['host-CV']/results['device-CV']:.2f}x"
        )
    return results


def bench_cache_build(repeats=3):
    from ultrafnd_git_tpu.data.cache import build_feature_cache
    from ultrafnd_git_tpu.data.dataset import FakeSVRawDataset

    raw = FakeSVRawDataset(str(FIXTURE))
    build_feature_cache(raw, seed=0)  # warm
    t0 = time.perf_counter()
    for _ in range(repeats):
        build_feature_cache(raw, seed=0)
    dt = (time.perf_counter() - t0) / repeats
    print(f"cache build    : {len(raw)/dt:8.1f} records/s")


def main() -> None:
    clips = sorted((FIXTURE / "videos").glob("*.avi"))
    if not clips:
        print("no fixture media — run scripts/make_fixture.py first")
        sys.exit(1)
    ours = bench_our_decode(clips)
    ref = bench_reference_decode(clips)
    if ref:
        print(f"decode speedup vs reference: {ours/ref:.2f}x")
    bench_feature_stage()
    bench_cache_build()


if __name__ == "__main__":
    main()
