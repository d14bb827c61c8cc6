"""Evidence scorers: affective, chronos, semantic (+ fusion wiring).

Mirrors the reference's behavioral contracts (SURVEY §2.6) with
shape/range/ordering assertions; HF rungs are disabled (conftest), so the
lexicon / numpy / hash fallback rungs are what run here — exactly the
rungs the reference exercises offline.
"""
import numpy as np
import pytest

from ultrafnd_git_tpu.models.affective import (
    AffectiveForensics,
    lexicon_probs_batch,
)
from ultrafnd_git_tpu.models.chronos import ChronosGuard, cut_scores
from ultrafnd_git_tpu.models.semantic import (
    SemanticConfig,
    SemanticForgeryAnalyzer,
)

FEARFUL = "恐惧 危险 警告 外星人出现了 危机"
ANGRY = "愤怒 欺骗 骗局 谣言 假新闻"
JOYFUL = "真相 辟谣 科学 证据 研究 发现 开心"


class TestAffective:
    def test_lexicon_probs_rows(self):
        p = lexicon_probs_batch([FEARFUL, ANGRY, JOYFUL, ""])
        assert p.shape == (4, 3)
        assert p[0].argmax() == 0  # fear
        assert p[1].argmax() == 1  # anger
        assert p[2].argmax() == 2  # joy
        assert np.all(p[3] == 0.0)

    def test_intensity_ordering_and_range(self):
        af = AffectiveForensics()
        out = af.analyze_batch([FEARFUL, JOYFUL, ""])
        for key in ("intensity", "arousal", "valence"):
            assert out[key].shape == (3,)
            assert np.all(out[key] >= 0.0) and np.all(out[key] <= 1.0)
        # sensational text must score higher intensity than debunking text
        assert out["intensity"][0] > out["intensity"][1]
        # and the joyful text carries higher valence
        assert out["valence"][1] > out["valence"][0]

    def test_single_sample_api_matches_batch(self):
        af = AffectiveForensics()
        single = af.analyze(FEARFUL)
        batch = af.analyze_batch([FEARFUL])
        assert single["intensity"] == pytest.approx(
            float(batch["intensity"][0])
        )
        assert set(single["probs"]) == {"fear", "anger", "joy"}

    def test_audio_arousal_monotone_in_energy(self):
        af = AffectiveForensics()
        rng = np.random.default_rng(0)
        quiet = 0.01 * rng.standard_normal(16000).astype(np.float32)
        loud = 0.8 * rng.standard_normal(16000).astype(np.float32)
        assert af.audio_arousal(loud) > af.audio_arousal(quiet)
        assert af.audio_arousal(None) == 0.5

    def test_get_emotion_intensity_scalar(self):
        v = AffectiveForensics().get_emotion_intensity(ANGRY)
        assert isinstance(v, float) and 0.0 <= v <= 1.0


def _static_clip(t=8, seed=0):
    rng = np.random.default_rng(seed)
    frame = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    return np.stack([frame] * t)


def _cutty_clip(t=8, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(t, 32, 32, 3), dtype=np.uint8)


class TestChronos:
    def test_feature_shape_and_norm(self):
        cg = ChronosGuard(feat_dim=128)
        f = cg.extract_features(_cutty_clip())
        assert f.shape == (128,)
        assert np.linalg.norm(f) == pytest.approx(1.0, abs=1e-4)

    def test_short_clip_returns_zeros(self):
        cg = ChronosGuard(feat_dim=64)
        assert np.all(cg.extract_features(_static_clip(t=1)) == 0.0)
        assert cg.temporal_tamper_score(None) == 0.0

    def test_tamper_score_orders_cutty_above_static(self):
        cg = ChronosGuard()
        s_static = cg.temporal_tamper_score(_static_clip())
        s_cutty = cg.temporal_tamper_score(_cutty_clip())
        assert 0.0 <= s_static <= 1.0 and 0.0 <= s_cutty <= 1.0
        assert s_cutty > s_static

    def test_cut_scores_zero_for_identical_frames(self):
        gray = np.stack([np.full((16, 16), 100, np.uint8)] * 4)
        assert np.allclose(cut_scores(gray), 0.0)

    def test_batch_api(self):
        cg = ChronosGuard(feat_dim=32)
        out = cg.extract_features_batch([_static_clip(), _cutty_clip()])
        assert out.shape == (2, 32)
        scores = cg.temporal_tamper_score_batch(
            [_static_clip(), _cutty_clip()]
        )
        assert scores.shape == (2,)

    def test_av_lag_recovers_known_shift(self):
        sr = 100.0
        t = np.arange(400) / sr
        sig = np.sin(2 * np.pi * 3 * t)
        lag = ChronosGuard.estimate_av_lag(
            np.roll(sig, 10), sig, sr=sr, max_lag_s=0.5
        )
        assert lag == pytest.approx(10 / sr, abs=2 / sr)


class TestSemantic:
    def test_output_shapes_and_norms(self):
        an = SemanticForgeryAnalyzer(SemanticConfig(proj_dim=256))
        out = an({"title": ["a b c", "x y"], "ocr": ["a b c", "totally different"]})
        for key in ("semantic_text", "semantic_image", "semantic_gap"):
            assert out[key].shape == (2, 256)
            assert np.allclose(
                np.linalg.norm(out[key], axis=-1), 1.0, atol=1e-4
            )

    def test_ragged_title_ocr_lengths_pad(self):
        an = SemanticForgeryAnalyzer()
        out = an({"title": ["one"], "ocr": ["one", "two", "three"]})
        assert out["semantic_text"].shape[0] == 3

    def test_gap_magnitude_orders_mismatch_above_match(self):
        an = SemanticForgeryAnalyzer()
        g = an.gap_magnitude(
            ["外星人入侵地球", "外星人入侵地球"],
            ["外星人入侵地球", "官方辟谣 科学证据 完全不同"],
        )
        assert g.shape == (2,)
        assert np.all(g >= 0.0) and np.all(g <= 1.0)
        assert g[1] > g[0]

    def test_deterministic_across_instances(self):
        a = SemanticForgeryAnalyzer(seed=7)
        b = SemanticForgeryAnalyzer(seed=7)
        oa = a({"title": ["hello"], "ocr": ["world"]})
        ob = b({"title": ["hello"], "ocr": ["world"]})
        np.testing.assert_allclose(
            oa["semantic_gap"], ob["semantic_gap"], rtol=1e-6
        )

    def test_zeros_fallback_matches_reference(self):
        an = SemanticForgeryAnalyzer(SemanticConfig(zeros_fallback=True))
        enc = an.encode_text(["anything"])
        assert enc.shape == (1, 512) and np.all(enc == 0.0)


class TestFusionEvidenceWiring:
    def test_evidence_override_changes_forensic_outputs(self):
        import jax
        import jax.numpy as jnp

        from ultrafnd_git_tpu.models.fusion import CrossModalTransformer

        model = CrossModalTransformer(hidden=64, use_gnn=False)
        b = 3
        feats = {
            "text_features": jnp.ones((b, 768)),
            "audio_features": jnp.ones((b, 128)),
            "visual_features": jnp.ones((b, 512)),
            "temporal_features": jnp.ones((b, 256)),
        }
        params = model.init(jax.random.PRNGKey(0), feats)["params"]

        ev = jnp.asarray(
            [[0.9, 0.1, 0.4], [0.2, 0.8, 0.6], [0.0, 0.5, 1.0]], jnp.float32
        )
        out = model.apply({"params": params}, {**feats, "evidence": ev})
        np.testing.assert_allclose(
            np.asarray(out["forensic"]["semantic_conflict"]),
            np.asarray(ev[:, 0]),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(out["forensic"]["emotion_intensity"]),
            np.asarray(ev[:, 1]),
            rtol=1e-6,
        )
        # and logits actually depend on the evidence values
        out2 = model.apply(
            {"params": params}, {**feats, "evidence": jnp.zeros_like(ev)}
        )
        assert not np.allclose(
            np.asarray(out["logits"]), np.asarray(out2["logits"])
        )

    @pytest.mark.slow
    def test_cache_contains_evidence_and_trainer_consumes_it(
        self, fixture_data_root, tmp_path
    ):
        from ultrafnd_git_tpu.data.cache import build_feature_cache
        from ultrafnd_git_tpu.data.dataset import FakeSVRawDataset
        from ultrafnd_git_tpu.training.trainer import (
            ForensicTrainer,
            TrainConfig,
        )

        raw = FakeSVRawDataset(fixture_data_root)
        cache = build_feature_cache(raw, seed=0)
        n = len(raw)
        assert cache["evidence"].shape == (n, 3)
        assert np.all(cache["evidence"] >= 0.0)
        assert np.all(cache["evidence"] <= 1.0)

        cfg = TrainConfig(
            data_root=fixture_data_root,
            out_dir=str(tmp_path),
            batch_size=8,
            epochs=1,
            use_evidence=True,
            cache_to_disk=False,
            save_best=False,
            log_metrics_jsonl=False,
        )
        trainer = ForensicTrainer(cfg, cache=cache)
        loss, metrics = trainer._epoch_loop(
            trainer.tr_idx[:16], "train"
        )
        assert np.isfinite(loss)
        # forensic metrics now reflect the real scorer outputs
        assert 0.0 <= metrics["emotion_intensity_mean"] <= 1.0
