"""Regression tests for code-review findings (round-1 review pass)."""
import numpy as np
import pytest


def test_numpy_gcn_gradient_matches_finite_differences():
    """GNNSimple.backward must descend the true gradient (incl. A^T terms)."""
    from ultrafnd_git_tpu.models.gnn import GNNSimple, normalize_adj

    rng = np.random.default_rng(0)
    n, f = 12, 6
    X = rng.standard_normal((n, f)).astype(np.float32)
    A = (rng.uniform(size=(n, n)) > 0.6).astype(np.float32)
    A = normalize_adj(0.5 * (A + A.T))
    y = rng.integers(0, 2, size=n)
    mask = np.ones(n, dtype=np.float32)

    gnn = GNNSimple(in_dim=f, hid=5, layers=2, seed=1)

    def loss_of(weights):
        saved = [w.copy() for w in gnn.W]
        for w, nw in zip(gnn.W, weights):
            w[...] = nw
        P = gnn.forward(X, A)
        val = -np.log(P[np.arange(n), y] + 1e-12).mean()
        for w, s in zip(gnn.W, saved):
            w[...] = s
        return float(val)

    # analytic gradient via one backward call with lr folded out
    base = [w.copy() for w in gnn.W]
    gnn.forward(X, A)
    gnn.backward(A, y, mask, lr=1.0, wd=0.0)
    analytic = [b - w for b, w in zip(base, gnn.W)]  # lr * grad
    for w, b in zip(gnn.W, base):
        w[...] = b

    eps = 1e-3
    for li in range(len(gnn.W)):
        idx = (0, 0)
        wp = [w.copy() for w in base]
        wm = [w.copy() for w in base]
        wp[li][idx] += eps
        wm[li][idx] -= eps
        fd = (loss_of(wp) - loss_of(wm)) / (2 * eps)
        assert analytic[li][idx] == pytest.approx(fd, rel=0.08, abs=2e-3), (
            f"layer {li}"
        )


@pytest.mark.slow
def test_save_best_false_still_tracks_improvement(fixture_data_root, tmp_path):
    """save_best=False must not force early stop / -1.0 return."""
    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig

    cfg = TrainConfig(
        data_root=fixture_data_root,
        out_dir=str(tmp_path),
        batch_size=8,
        epochs=2,
        save_best=False,
        cache_to_disk=False,
        log_metrics_jsonl=False,
    )
    trainer = ForensicTrainer(cfg)
    best = trainer.fit()
    assert best > 0.0  # improvement tracked even without checkpoint writes
    assert trainer.no_improve < cfg.early_stop_patience or best > 0.0
    # and no best checkpoint was written
    assert not (tmp_path / "best").exists()


def test_av_lag_fps_resampling():
    """mouth_open at video fps is resampled to sr before correlating."""
    from ultrafnd_git_tpu.models.temporal import TemporalSyncNet

    sr, fps = 1000.0, 50.0
    t_audio = np.arange(2000) / sr
    audio = np.sin(2 * np.pi * 4 * t_audio)
    t_video = np.arange(100) / fps
    mouth = np.sin(2 * np.pi * 4 * t_video)  # same signal at 50 Hz
    lag = TemporalSyncNet.estimate_av_lag(
        audio, mouth, sr=sr, fps=fps, max_lag_s=0.2
    )
    assert lag == pytest.approx(0.0, abs=5e-3)

    # delay audio by 20 ms; convention: delayed audio -> positive lag
    # (matches the np.roll test in test_evidence.py)
    shifted = np.sin(2 * np.pi * 4 * (t_audio - 0.02))
    lag2 = TemporalSyncNet.estimate_av_lag(
        shifted, mouth, sr=sr, fps=fps, max_lag_s=0.2
    )
    assert lag2 == pytest.approx(0.02, abs=6e-3)


def test_device_text_encoder_empty_input_width():
    from ultrafnd_git_tpu.models.transformer import DeviceTextEncoder

    enc = DeviceTextEncoder(dim=128, depth=1, heads=2, max_len=8,
                            attention_backend="xla")
    out = enc.encode_batch([])
    assert out.shape == (0, 128)


def test_semantic_zeros_fallback_from_config(tmp_path):
    import yaml

    from ultrafnd_git_tpu.models.semantic import SemanticForgeryAnalyzer

    cfg_path = tmp_path / "semantic.yaml"
    cfg_path.write_text(
        yaml.safe_dump({"dim": 64, "zeros_fallback": True}), encoding="utf-8"
    )
    an = SemanticForgeryAnalyzer.from_config(str(cfg_path))
    assert an.cfg.zeros_fallback
    enc = an.encode_text(["anything"])
    assert np.all(enc == 0.0)


def test_augment_text_can_touch_last_word():
    from ultrafnd_git_tpu.data.dataset import FakeSVRawDataset

    rng = np.random.default_rng(0)
    seen_last = False
    for _ in range(200):
        out = FakeSVRawDataset.augment_text("aa bb cc", rng)
        if out.split()[2] == "random":
            seen_last = True
            break
    assert seen_last
