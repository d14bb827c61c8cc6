"""Device CV preprocessing stage: flow sanity, cue parity, pipeline wiring."""
import numpy as np
import pytest

import jax.numpy as jnp

from ultrafnd_git_tpu.kernels.preprocess import (
    DeviceCVStage,
    block_match_flow,
    cut_scores_device,
    density_histograms,
    flow_stats,
)


@pytest.fixture(scope="module")
def clip_batch(request):
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (2, 6, 64, 64, 3), dtype=np.uint8)


def test_block_match_recovers_translation():
    rng = np.random.default_rng(1)
    base = rng.uniform(0, 255, (300, 300)).astype(np.float32)
    g0 = base[20:148, 20:148][None]
    g1 = base[23:151, 22:150][None]  # content shifted: v=-3, u=-2
    u, v = block_match_flow(jnp.asarray(g0), jnp.asarray(g1))
    inner = (0, slice(2, -2), slice(2, -2))
    assert abs(float(jnp.median(v[inner])) + 3.0) < 0.3
    assert abs(float(jnp.median(u[inner])) + 2.0) < 0.3


def test_block_match_subpixel_and_static():
    """Static pair -> exactly zero flow (SAD tie resolves to zero
    displacement, not the search corner)."""
    rng = np.random.default_rng(7)
    g = rng.uniform(0, 255, (1, 64, 64)).astype(np.float32)
    u, v = block_match_flow(jnp.asarray(g), jnp.asarray(g))
    assert float(jnp.abs(u).max()) == 0.0
    assert float(jnp.abs(v).max()) == 0.0


def test_static_clip_zero_flow_zero_cuts():
    rng = np.random.default_rng(2)
    frame = rng.integers(0, 256, (1, 1, 64, 64, 3), dtype=np.uint8)
    clip = np.tile(frame, (1, 5, 1, 1, 1))
    out = DeviceCVStage()(clip)
    assert float(out["flow_mags"].max()) < 1e-5
    assert float(out["cuts"].max()) < 1e-6
    assert float(out["tamper"][0]) == 0.0


def test_density_histogram_matches_numpy():
    rng = np.random.default_rng(3)
    gray = rng.uniform(0, 255, (4, 32, 32)).astype(np.float32)
    got = np.asarray(density_histograms(jnp.asarray(gray)))
    for t in range(4):
        ref, _ = np.histogram(gray[t], bins=32, range=(0, 255), density=True)
        np.testing.assert_allclose(got[t], ref, atol=1e-6)


def test_cut_scores_match_host_chronos():
    from ultrafnd_git_tpu.models.chronos import cut_scores

    rng = np.random.default_rng(4)
    gray = rng.uniform(0, 255, (6, 64, 64)).astype(np.float32)
    got = np.asarray(cut_scores_device(jnp.asarray(gray)))
    ref = cut_scores(gray)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_flow_stats_layout_matches_host_pool():
    """Same flow fields through the device pooling and the host
    OpticalFlow3DCNN._pool_flow must agree (identical stat layout)."""
    from ultrafnd_git_tpu.models.visual import OpticalFlow3DCNN

    rng = np.random.default_rng(5)
    flows = [
        rng.standard_normal((64, 64, 2)).astype(np.float32)
        for _ in range(5)
    ]
    host = OpticalFlow3DCNN(dim=256, use_tvl1=False).pool_flows(flows)

    fx = np.stack([f[..., 0] for f in flows])
    fy = np.stack([f[..., 1] for f in flows])
    mag = np.sqrt(fx * fx + fy * fy)
    ang = (np.arctan2(fy, fx) + np.pi) / (2 * np.pi)
    dev = np.asarray(flow_stats(jnp.asarray(mag), jnp.asarray(ang)))
    np.testing.assert_allclose(dev, host, atol=2e-4, rtol=2e-4)


def test_stage_uint8_vs_float01_scale_parity(clip_batch):
    """The collate emits uint8 by default; the reference float [0, 1]
    contract must produce the SAME cues via the on-device rescale
    (regression: float [0, 1] input used to collapse the 32-bin
    [0, 255] histograms into bin 0, zeroing every cut score)."""
    u8 = clip_batch
    f01 = u8.astype(np.float32) / 255.0
    out_u8 = DeviceCVStage(flow_dim=128)(u8)
    out_f01 = DeviceCVStage(flow_dim=128)(f01)
    np.testing.assert_allclose(
        out_f01["cuts"], out_u8["cuts"], atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        out_f01["flow_feat"], out_u8["flow_feat"], atol=1e-3
    )
    np.testing.assert_allclose(
        out_f01["tamper"], out_u8["tamper"], atol=1e-3
    )
    # and the uint8 cuts actually carry signal on random frames
    assert float(out_u8["cuts"].max()) > 0.0


def test_stage_host_gray_matches_device_gray(clip_batch):
    """The host cv2 gray-extraction rung (3x smaller upload) must match
    the on-device RGB->gray path within cvtColor's uint8 rounding."""
    cv2 = pytest.importorskip("cv2")
    from ultrafnd_git_tpu.training.pipeline_v1 import BatchFeatureExtractor

    # Structured content (smooth pattern translating 2 px/frame): on pure
    # noise the +-0.5-level cvtColor rounding flips SAD ties and the flow
    # comparison measures tie-breaking, not the gray rung.
    rng = np.random.default_rng(11)
    base = np.kron(
        rng.integers(40, 216, (12, 12, 3)), np.ones((8, 8, 1))
    ).astype(np.uint8)  # (96, 96, 3), 8-px blocks
    clips = np.stack(
        [
            np.stack([base[2 * t : 2 * t + 64, 2 * t : 2 * t + 64] for t in range(6)]),
            np.stack([base[10 - t : 74 - t, 4 : 68] for t in range(6)]),
        ]
    )  # (2, 6, 64, 64, 3) uint8

    gray = BatchFeatureExtractor._gray_host(clips)
    assert gray.shape == clips.shape[:4] and gray.dtype == np.uint8

    out_rgb = DeviceCVStage(flow_dim=128)(clips)
    out_gray = DeviceCVStage(flow_dim=128)(gray)
    # cvtColor rounds gray to uint8 (<=0.5 level); cues are pooled over
    # 64^2 pixels so the residual is small but not zero
    np.testing.assert_allclose(
        out_gray["cuts"], out_rgb["cuts"], atol=5e-3, rtol=5e-2
    )
    # flat-SAD plateaus leave a few subpixel fits sensitive to the
    # rounding; the pooled feature stays within ~1% of its L2 ball
    np.testing.assert_allclose(
        out_gray["flow_feat"], out_rgb["flow_feat"], atol=1e-2
    )
    np.testing.assert_allclose(
        out_gray["tamper"], out_rgb["tamper"], atol=5e-2
    )


def test_stage_shapes_and_finiteness(clip_batch):
    out = DeviceCVStage(flow_dim=256)(clip_batch)
    assert out["flow_feat"].shape == (2, 256)
    assert out["cuts"].shape == (2, 5)
    assert out["flow_mags"].shape == (2, 5)
    assert out["tamper"].shape == (2,)
    for v in out.values():
        assert np.isfinite(v).all()
    np.testing.assert_allclose(
        np.linalg.norm(out["flow_feat"], axis=1), np.ones(2), atol=1e-5
    )
    assert ((out["tamper"] >= 0) & (out["tamper"] <= 1)).all()


def test_extractor_uses_device_stage(monkeypatch):
    """BatchFeatureExtractor routes the CV block through the device stage
    by default and falls back to the host ladder when disabled."""
    from ultrafnd_git_tpu.training.pipeline_v1 import BatchFeatureExtractor

    rng = np.random.default_rng(6)
    batch = {
        "text_data": [
            {"title": "a b", "ocr": "c", "comments": ["d"]},
            {"title": "e", "ocr": "", "comments": []},
        ],
        "audio_waveform": [
            rng.standard_normal(8000).astype(np.float32) for _ in range(2)
        ],
        "video_frames": rng.integers(
            0, 256, (2, 6, 64, 64, 3), dtype=np.uint8
        ),
        "label": np.array([0, 1]),
    }

    monkeypatch.setenv("ULTRAFND_DEVICE_CV", "1")
    ext = BatchFeatureExtractor(seed=0)
    assert ext._device_cv is not None
    feats = ext(batch)
    assert feats["visual"].shape == (2, 512)
    assert np.isfinite(feats["visual"]).all()

    monkeypatch.setenv("ULTRAFND_DEVICE_CV", "0")
    ext_host = BatchFeatureExtractor(seed=0)
    assert ext_host._device_cv is None
    feats_host = ext_host(batch)
    assert feats_host["visual"].shape == (2, 512)
    # text/audio/aux stages are CV-independent and must agree exactly
    np.testing.assert_allclose(feats["text"], feats_host["text"])
    np.testing.assert_allclose(feats["audio"], feats_host["audio"])


def test_extractor_stream_matches_per_call(monkeypatch):
    """stream() (cross-batch double buffering of the device-CV stage)
    must produce the exact same features as one __call__ per batch, in
    order, with metas passed through."""
    from ultrafnd_git_tpu.training.pipeline_v1 import BatchFeatureExtractor

    rng = np.random.default_rng(11)

    def mk_batch(seed):
        r = np.random.default_rng(seed)
        return {
            "text_data": [
                {"title": f"a{seed}", "ocr": "c", "comments": []},
                {"title": "e", "ocr": "", "comments": ["x"]},
            ],
            "audio_waveform": [
                r.standard_normal(8000).astype(np.float32) for _ in range(2)
            ],
            "video_frames": r.integers(
                0, 256, (2, 6, 64, 64, 3), dtype=np.uint8
            ),
            "label": np.array([0, 1]),
        }

    batches = [mk_batch(s) for s in (1, 2, 3)]

    monkeypatch.setenv("ULTRAFND_DEVICE_CV", "1")
    ext = BatchFeatureExtractor(seed=0)
    assert ext._device_cv is not None
    serial = [ext(b) for b in batches]
    streamed = list(ext.stream((b, i) for i, b in enumerate(batches)))
    assert [m for _, _, m in streamed] == [0, 1, 2]
    for (feats, _, _), ref in zip(streamed, serial):
        for key in ref:
            np.testing.assert_allclose(
                feats[key], ref[key], atol=1e-6, err_msg=key
            )
