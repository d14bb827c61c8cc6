"""Raw-media pipeline: decode ladders, collate, augmentation, v1 training."""
import numpy as np
import pytest

from ultrafnd_git_tpu.data.media import (
    AUDIO_LEN,
    AugmentedRawMediaDataset,
    RawMediaDataset,
    load_audio_waveform,
    load_comments,
    load_video_frames,
    multimodal_collate,
)
from ultrafnd_git_tpu.training.pipeline_v1 import (
    BatchFeatureExtractor,
    V1Config,
    focal_loss,
    mixup_arrays,
    train_and_evaluate,
)


@pytest.fixture(scope="module")
def media_root(fixture_data_root):
    return fixture_data_root


class TestDecoders:
    def test_video_decode_shape_and_range(self, media_root):
        frames = load_video_frames(f"{media_root}/videos/douyin_0000.avi")
        assert frames.shape == (30, 256, 256, 3)
        assert frames.dtype == np.uint8  # codec-native contract
        # 12 real frames then last-frame padding
        np.testing.assert_allclose(frames[11], frames[29])

    def test_video_decode_float_contract_on_request(self, media_root):
        u8 = load_video_frames(f"{media_root}/videos/douyin_0000.avi")
        f32 = load_video_frames(
            f"{media_root}/videos/douyin_0000.avi", dtype=np.float32
        )
        assert f32.dtype == np.float32
        assert 0.0 <= f32.min() and f32.max() <= 1.0
        np.testing.assert_allclose(f32, u8.astype(np.float32) / 255.0)
        from ultrafnd_git_tpu.data.media import frames_float01

        np.testing.assert_allclose(frames_float01(u8), f32)

    def test_video_decode_accepts_any_dtype_specifier(self, media_root):
        """np.dtype instances and strings must decode identically to the
        class form (regression: `dtype(255.0)` raised inside the blanket
        try/except and silently returned the all-zero dummy)."""
        path = f"{media_root}/videos/douyin_0000.avi"
        ref = load_video_frames(path, dtype=np.float32)
        assert ref.max() > 0.0
        for spec in (np.dtype(np.float32), "float32"):
            np.testing.assert_allclose(
                load_video_frames(path, dtype=spec), ref
            )

    def test_video_decode_missing_file_gives_dummy(self):
        frames = load_video_frames("/nonexistent/clip.mp4")
        assert frames.shape == (30, 256, 256, 3)
        assert np.all(frames == 0.0)

    def test_audio_wav_sidecar_ladder(self, media_root):
        wave = load_audio_waveform(f"{media_root}/videos/douyin_0000.avi")
        assert wave.shape == (AUDIO_LEN,)
        # 1s of tone zero-padded to 5s: energy in front, silence behind
        assert np.abs(wave[:16000]).max() > 0.1
        assert np.all(wave[16000:] == 0.0)

    def test_audio_ffmpeg_rung_with_stub_binary(self, tmp_path, monkeypatch):
        """A container with no WAV sidecar must route through the ffmpeg
        subprocess rung when an ffmpeg binary exists (reference ladder
        `run_train_eval.py:391-421`); exercised with a stub that emits
        s16le PCM on stdout."""
        import stat

        sr = 16000
        stub = tmp_path / "bin" / "ffmpeg"
        stub.parent.mkdir()
        # 1 s of a constant half-scale square wave, little-endian int16
        stub.write_text(
            "#!/bin/sh\n"
            "python3 -c \"import sys,numpy as np; "
            "sys.stdout.buffer.write("
            f"(np.ones({sr},np.int16)*16384).tobytes())\"\n"
        )
        stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv(
            "PATH", f"{stub.parent}:{__import__('os').environ['PATH']}"
        )

        clip = tmp_path / "clip.mp4"
        clip.write_bytes(b"\x00" * 64)  # container exists, no sidecar
        wave = load_audio_waveform(clip, sr=sr)
        assert wave.shape[0] >= sr * 5  # padded to min length
        # the stub's samples survive the ladder (16384/32767 ~ 0.5)
        assert abs(float(wave[:sr].mean()) - 0.5) < 0.01
        assert float(np.abs(wave[sr * 2 :]).max()) == 0.0  # zero-padded

    def test_audio_ffmpeg_rung_absent_binary_falls_to_silence(
        self, tmp_path, monkeypatch
    ):
        monkeypatch.setenv("PATH", str(tmp_path / "empty"))
        clip = tmp_path / "clip.mp4"
        clip.write_bytes(b"\x00" * 64)
        wave = load_audio_waveform(clip)
        assert float(np.abs(wave).max()) == 0.0

    def test_audio_silence_fallback(self):
        wave = load_audio_waveform("/nonexistent/clip.mp4")
        assert wave.shape == (AUDIO_LEN,) and np.all(wave == 0.0)

    def test_comments_loader_skips_corrupt(self, media_root):
        ok = load_comments(f"{media_root}/video_comment/douyin_0000.json")
        assert isinstance(ok, list)
        corrupt = load_comments(f"{media_root}/video_comment/corrupt.json")
        assert corrupt == []


class TestDatasetCollate:
    def test_dataset_item_contract(self, media_root):
        ds = RawMediaDataset(media_root)
        item = ds[0]
        assert item["video_frames"].shape == (30, 256, 256, 3)
        assert item["audio_waveform"].shape[0] >= AUDIO_LEN
        assert set(item["text_data"]) == {"title", "ocr", "comments"}
        assert item["label"] in (0, 1)

    def test_filter_existing_keeps_media_records(self, media_root):
        full = RawMediaDataset(media_root)
        filt = RawMediaDataset(media_root, filter_existing=True)
        assert len(filt) == 8 < len(full)

    def test_missing_media_counts_failure(self, media_root):
        ds = RawMediaDataset(media_root)
        _ = ds[20]  # record without media
        assert ds.decode_failures == 1

    def test_collate_fixed_shapes(self, media_root):
        ds = RawMediaDataset(media_root)
        batch = multimodal_collate([ds[0], ds[1], ds[20]])
        assert batch["video_frames"].shape == (3, 30, 256, 256, 3)
        assert batch["video_frames"].dtype == np.uint8  # dtype-preserving
        assert batch["audio_waveform"].shape == (3, AUDIO_LEN)
        assert batch["label"].shape == (3,)
        assert len(batch["text_data"]) == 3

    def test_collate_mixed_dtypes_promote_to_float(self, media_root):
        ds = RawMediaDataset(media_root)
        a, b = ds[0], ds[1]
        from ultrafnd_git_tpu.data.media import frames_float01

        b = dict(b, video_frames=frames_float01(b["video_frames"]))
        batch = multimodal_collate([a, b])
        assert batch["video_frames"].dtype == np.float32
        assert batch["video_frames"].max() <= 1.0

    def test_augmentation_preserves_contract(self, media_root):
        ds = AugmentedRawMediaDataset(RawMediaDataset(media_root), seed=0)
        item = ds[0]
        assert item["video_frames"].shape == (30, 256, 256, 3)
        assert item["video_frames"].dtype == np.uint8  # jitter stays uint8


class TestTrainMath:
    def test_focal_loss_downweights_easy_examples(self):
        import jax.numpy as jnp

        easy = jnp.asarray([[6.0, -6.0]])  # confident correct
        hard = jnp.asarray([[0.1, -0.1]])
        y = jnp.asarray([0])
        import optax

        ce_easy = optax.softmax_cross_entropy_with_integer_labels(easy, y)
        fl_easy = focal_loss(easy, y)
        fl_hard = focal_loss(hard, y)
        # focal shrinks easy-example loss far below its CE
        assert float(fl_easy[0]) < 0.01 * float(ce_easy[0])
        assert float(fl_hard[0]) > float(fl_easy[0])

    def test_mixup_arrays(self):
        rng = np.random.default_rng(0)
        lam, perm = mixup_arrays(rng, 8, alpha=0.2)
        assert 0.0 <= lam <= 1.0
        assert sorted(perm.tolist()) == list(range(8))
        lam1, _ = mixup_arrays(rng, 8, alpha=0.0)
        assert lam1 == 1.0


@pytest.mark.slow
class TestV1EndToEnd:
    def test_dummy_path_trains(self):
        cfg = V1Config(
            epochs=2, batch_size=4, ensemble_size=2, debug_mode=True,
            dummy_samples=16, eval_every=1,
        )
        results = train_and_evaluate(cfg=cfg)
        assert results["steps"] > 0
        assert np.isfinite(results["loss"])
        assert 0.0 <= results["val_acc"] <= 1.0

    def test_real_media_path_trains(self, media_root, tmp_path):
        extractor = BatchFeatureExtractor(seed=0)
        ds = RawMediaDataset(media_root, filter_existing=True)
        batch = multimodal_collate([ds[i] for i in range(4)])
        feats = extractor(batch)
        assert feats["text"].shape == (4, 768)
        assert feats["audio"].shape == (4, 128)
        assert feats["visual"].shape == (4, 512)
        assert feats["temporal"].shape == (4, 256)
        assert feats["evidence"].shape == (4, 3)
        # chronos tamper evidence separates cutty (fake) from smooth clips
        labels = batch["label"]
        tamper = feats["evidence"][:, 2]
        if labels.min() != labels.max():
            assert tamper[labels == 1].mean() > tamper[labels == 0].mean()

        # End-to-end on a TRIMMED root: v1 trains over every metadata
        # record (64 here, 48 of them decode-fallback), which made this
        # the second-slowest test in the suite. Eight real-video records
        # exercise the identical decode -> featurize -> train path.
        import json
        from pathlib import Path

        root = Path(media_root)
        have = {v.stem for v in (root / "videos").iterdir()}
        lines = [
            ln
            for ln in (root / "data_complete.json").read_text(
                encoding="utf-8"
            ).splitlines()
            if json.loads(ln)["video_id"] in have
        ][:8]
        small = tmp_path / "small_root"
        small.mkdir()
        (small / "data_complete.json").write_text(
            "\n".join(lines), encoding="utf-8"
        )
        (small / "videos").symlink_to(root / "videos")
        (small / "video_comment").symlink_to(root / "video_comment")

        cfg = V1Config(
            data_dir=str(small), epochs=1, batch_size=4,
            ensemble_size=2, eval_every=1, seed=0,
        )
        results = train_and_evaluate(cfg=cfg)
        assert results["steps"] > 0
        assert np.isfinite(results["loss"])


def test_v1_accelerator_failure_falls_back_to_cpu(monkeypatch):
    """VERDICT r2 item 8: the reference's v1 re-initializes on CPU when
    the accelerator dies (ref run_train_eval.py:673-714). Our guarded
    unit is the jitted step itself: inject one failure, training must
    continue on the CPU device with the state intact."""
    from ultrafnd_git_tpu.training.pipeline_v1 import EnsembleTrainer, V1Config

    cfg = V1Config(batch_size=4, ensemble_size=2, epochs=1)
    trainer = EnsembleTrainer(cfg)
    rng = np.random.default_rng(0)
    feats = {
        "text": rng.standard_normal((4, 768)).astype(np.float32),
        "audio": rng.standard_normal((4, 128)).astype(np.float32),
        "visual": rng.standard_normal((4, 512)).astype(np.float32),
        "temporal": rng.standard_normal((4, 256)).astype(np.float32),
        "aux": rng.uniform(size=(4, 2)).astype(np.float32),
        "evidence": rng.uniform(size=(4, 3)).astype(np.float32),
    }
    labels = np.array([0, 1, 0, 1], dtype=np.int64)

    real_step = trainer._train_step
    calls = {"n": 0}

    def flaky_step(*args, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected accelerator failure")
        return real_step(*args, **kw)

    trainer._train_step = flaky_step
    host_rng = np.random.default_rng(1)
    loss = trainer.train_batch(feats, labels, host_rng)
    assert np.isfinite(loss)
    assert trainer.device_failures == 1
    assert trainer._cpu_dev is not None
    assert calls["n"] == 2  # failed once, retried once
    # subsequent steps and eval run on the CPU device without incident
    loss2 = trainer.train_batch(feats, labels, host_rng)
    assert np.isfinite(loss2)
    probs = trainer.predict_batch(feats)
    assert probs.shape == (4, 2)
    assert trainer.device_failures == 1  # no further fallbacks
    import jax

    assert all(
        d.platform == "cpu"
        for leaf in jax.tree.leaves(trainer.params)
        for d in leaf.devices()
    )


def test_v1_accelerator_failure_at_materialization():
    """Jitted dispatch is async on real accelerators: a dying device
    usually surfaces at the FETCH of the result, not the call. Poison
    the returned loss so float() raises (review r3); the ladder must
    still fall back to CPU, retry from the last good state, and
    continue."""
    import jax

    from ultrafnd_git_tpu.training.pipeline_v1 import EnsembleTrainer, V1Config

    cfg = V1Config(batch_size=4, ensemble_size=2, epochs=1)
    trainer = EnsembleTrainer(cfg)
    rng = np.random.default_rng(0)
    feats = {
        "text": rng.standard_normal((4, 768)).astype(np.float32),
        "audio": rng.standard_normal((4, 128)).astype(np.float32),
        "visual": rng.standard_normal((4, 512)).astype(np.float32),
        "temporal": rng.standard_normal((4, 256)).astype(np.float32),
        "aux": rng.uniform(size=(4, 2)).astype(np.float32),
        "evidence": rng.uniform(size=(4, 3)).astype(np.float32),
    }
    labels = np.array([0, 1, 0, 1], dtype=np.int64)

    class _PoisonLoss:
        def __float__(self):
            raise RuntimeError("injected async failure at fetch")

    real_step = trainer._train_step
    calls = {"n": 0}

    def flaky_step(*args, **kw):
        calls["n"] += 1
        p, o, loss = real_step(*args, **kw)
        if calls["n"] == 1:
            return p, o, _PoisonLoss()
        return p, o, loss

    trainer._train_step = flaky_step
    loss = trainer.train_batch(feats, labels, np.random.default_rng(1))
    assert np.isfinite(loss)
    assert trainer.device_failures == 1
    assert calls["n"] == 2  # poisoned fetch once, retried once
    # state was committed from the SUCCESSFUL retry, on the CPU device
    assert all(
        d.platform == "cpu"
        for leaf in jax.tree.leaves(trainer.params)
        for d in leaf.devices()
    )
    # the re-init path used when the live state is unfetchable builds a
    # structurally identical fresh state
    p2, o2 = trainer._build_state()
    assert jax.tree.structure(p2) == jax.tree.structure(trainer.params)
