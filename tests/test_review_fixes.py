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
        batch_size=16,
        epochs=1,
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


# ---- round-2 full-repo review findings --------------------------------


def test_pool_flow_short_clips_finite():
    """2-4 frame clips used to NaN the whole flow feature (empty pyramid
    segments); both the host pooling and the device segment bounds must
    stay finite/non-empty."""
    from ultrafnd_git_tpu.kernels.preprocess import _segment_bounds
    from ultrafnd_git_tpu.models.visual import OpticalFlow3DCNN

    rng = np.random.default_rng(0)
    enc = OpticalFlow3DCNN(dim=256, use_tvl1=False)
    for t in (2, 3, 4, 5):
        frames = rng.integers(0, 255, (t, 64, 64, 3), dtype=np.uint8)
        feat = enc.extract(frames)
        assert np.isfinite(feat).all(), f"NaN at T={t}"
    for t in (1, 2, 3, 4):
        for a, b in _segment_bounds(t, 3):
            assert 0 <= a < b <= max(t, a + 1)


def test_ensure_gray_single_channel():
    from ultrafnd_git_tpu.models.visual import ensure_gray

    img = np.full((8, 8, 1), 7, np.uint8)
    out = ensure_gray(img)
    assert out.shape == (8, 8) and int(out[0, 0]) == 7


def test_cache_fingerprint_gates_reuse(fixture_data_root, tmp_path):
    """A persisted cache from a different seed/config must be rebuilt,
    not silently reused."""
    from ultrafnd_git_tpu.data.cache import bootstrap_cache

    c1 = bootstrap_cache(
        fixture_data_root, str(tmp_path), seed=42, cache_to_disk=True
    )
    # same config -> reused (identical split arrays)
    c2 = bootstrap_cache(
        fixture_data_root, str(tmp_path), seed=42, cache_to_disk=True
    )
    np.testing.assert_array_equal(c1["split"][0], c2["split"][0])
    # different seed -> rebuilt under the new seed (split differs)
    c3 = bootstrap_cache(
        fixture_data_root, str(tmp_path), seed=7, cache_to_disk=True
    )
    assert not np.array_equal(
        np.sort(c1["split"][0]), np.sort(c3["split"][0])
    ) or not np.array_equal(c1["split"][0], c3["split"][0])


def test_injected_cache_is_persisted(fixture_data_root, tmp_path):
    """cache_to_disk=True must persist an injected cache so the out_dir
    can serve (Predictor loads feature_cache.npz)."""
    from ultrafnd_git_tpu.data.cache import bootstrap_cache, load_cache

    built = bootstrap_cache(
        fixture_data_root, str(tmp_path / "a"), seed=0, cache_to_disk=False
    )
    bootstrap_cache(
        fixture_data_root, str(tmp_path / "b"), seed=0,
        cache_to_disk=True, cache=built,
    )
    assert load_cache(str(tmp_path / "b" / "feature_cache.npz")) is not None


def test_ocr_clean_fallback_matches_pickle_tokenization(tmp_path):
    """Records absent from a provided phrase pickle must be tokenized
    with the pickle's regex tokenizer, not the whitespace split, so the
    serving-time Jaccard vocabularies intersect the corpus ones."""
    from ultrafnd_git_tpu.data.ocr import (
        build_phrase_features,
        ocr_sets_for_records,
        save_phrase_features,
    )

    corpus = [{"id": "v0", "ocr": "警告!危险信号 警告"}]
    pkl = tmp_path / "ocr.pkl"
    save_phrase_features(build_phrase_features(corpus), str(pkl))

    new = [{"id": "unseen", "ocr": "警告!危险信号"}]
    with_pkl = ocr_sets_for_records(new, str(pkl))
    assert with_pkl[0] == {"警告", "危险信号"}  # regex tokens
    # explicit True works even without the pickle file (serving path)
    forced = ocr_sets_for_records(new, None, clean_fallback=True)
    assert forced[0] == {"警告", "危险信号"}
    # default without pickle stays the trainer's whitespace split
    plain = ocr_sets_for_records(new, None)
    assert plain[0] == {"警告!危险信号"}


@pytest.mark.slow
def test_bench_scaling_run_one_tiny():
    """scripts/bench_scaling.run_one stays importable/correct (the N-scaling
    sweep is a documented SCALING.md artifact)."""
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    for p in (repo, repo / "scripts"):
        if str(p) not in sys.path:
            sys.path.insert(0, str(p))
    from bench_scaling import run_one

    r = run_one(64, batch=16, iters=4)
    assert r["nodes"] == 64
    assert r["step_ms"] > 0 and np.isfinite(r["samples_per_s"])


def test_checkpoint_meta_commits_after_state(tmp_path):
    """Commit protocol (ADVICE r2): meta.json appears only once the async
    state write has landed (tmp+rename), so meta presence implies a
    complete slot; overwrites replace both state and meta atomically."""
    import jax.numpy as jnp

    from ultrafnd_git_tpu.training import checkpoint as ckpt

    ckpt.save_checkpoint(str(tmp_path), "best", {"w": jnp.arange(4.0)},
                         {"epoch": 1})
    ckpt.wait_for_writes()
    assert (tmp_path / "best" / "meta.json").exists()
    assert not (tmp_path / "best" / "meta.json.tmp").exists()
    got = ckpt.load_checkpoint(str(tmp_path), "best", {"w": jnp.zeros(4)})
    assert got is not None and got[1]["epoch"] == 1

    ckpt.save_checkpoint(str(tmp_path), "best", {"w": jnp.ones(4)},
                         {"epoch": 2})
    ckpt.wait_for_writes()
    state2, meta2 = ckpt.load_checkpoint(
        str(tmp_path), "best", {"w": jnp.zeros(4)}
    )
    assert meta2["epoch"] == 2
    np.testing.assert_allclose(np.asarray(state2["w"]), np.ones(4))


def test_stale_feature_cache_policy(tmp_path):
    """Feature-code version bump (review r3): fresh training rebuilds,
    but eval_only/resume/serving REUSE the cache — it is the exact
    feature map the out_dir's checkpoint was trained on, and rebuilding
    would silently score that checkpoint on a different distribution."""
    from ultrafnd_git_tpu.data import cache as cm

    n = 4
    c = {
        "ids": np.array([f"v{i}" for i in range(n)], dtype=object),
        "labels": np.zeros(n, np.int64),
        "text": np.zeros((n, 768), np.float32),
        "audio": np.zeros((n, 128), np.float32),
        "visual": np.zeros((n, 512), np.float32),
        "temporal": np.zeros((n, 256), np.float32),
        "aux": np.zeros((n, 2), np.float32),
        "ocr_sets": [set() for _ in range(n)],
        "split": (np.array([0, 1]), np.array([2]), np.array([3])),
    }
    path = str(tmp_path / "feature_cache.npz")
    fp = cm.cache_fingerprint("dr", 1, None)
    old = cm.FEATURES_VERSION
    cm.FEATURES_VERSION = old - 1  # simulate an older-feature-code writer
    try:
        cm.save_cache(c, path, fingerprint=fp)
    finally:
        cm.FEATURES_VERSION = old
    # fresh training: rebuild with current feature code
    assert cm.load_cache(path, expected_fingerprint=fp) is None
    # eval_only/resume/serving: reuse for checkpoint consistency
    got = cm.load_cache(path, expected_fingerprint=fp, stale_features="reuse")
    assert got is not None and got["text"].shape == (n, 768)
    # a config mismatch still rebuilds even under the reuse policy
    assert (
        cm.load_cache(
            path,
            expected_fingerprint=cm.cache_fingerprint("other", 2, None),
            stale_features="reuse",
        )
        is None
    )
    # a current-version cache loads clean under the default policy
    cm.save_cache(c, path, fingerprint=fp)
    assert cm.load_cache(path, expected_fingerprint=fp) is not None


def test_fingerprint_parser_handles_legacy_formats():
    """Fingerprints written before the feature version was split out
    carry 'features' inside the JSON; absent means v1; non-JSON
    fingerprints ('injected', empty) parse to (None, None)."""
    import json as _json

    from ultrafnd_git_tpu.data import cache as cm

    cfg, feat = cm._parse_fingerprint(
        _json.dumps(
            {"data_root": "/x", "seed": 1, "ocr_phrase_pkl": None,
             "features": 2}
        )
    )
    assert feat == 2 and "features" not in cfg
    cfg2, feat2 = cm._parse_fingerprint(
        _json.dumps({"data_root": "/x", "seed": 1, "ocr_phrase_pkl": None})
    )
    assert feat2 == 1
    assert cfg2 == {"data_root": "/x", "seed": 1, "ocr_phrase_pkl": None}
    assert cm._parse_fingerprint("injected") == (None, None)
    assert cm._parse_fingerprint("") == (None, None)


def test_save_checkpoint_waits_for_prior_slot_finalizer(tmp_path):
    """A pending finalizer from the SAME slot's previous save must land
    before the next save unlinks meta.json — otherwise it could re-create
    meta.json over the in-flight force=True state overwrite, and a crash
    would leave a valid-looking meta over a destroyed state dir
    (review r3)."""
    import threading
    import time
    from concurrent.futures import ThreadPoolExecutor

    import jax.numpy as jnp

    from ultrafnd_git_tpu.training import checkpoint as ckpt

    slot = tmp_path.resolve() / "best"
    gate = threading.Event()
    pool = ThreadPoolExecutor(max_workers=1)
    prev = pool.submit(gate.wait, 10.0)
    ckpt._LAST_SLOT_FINALIZER[slot] = prev
    threading.Timer(0.3, gate.set).start()
    t0 = time.perf_counter()
    ckpt.save_checkpoint(
        str(tmp_path), "best", {"w": jnp.ones(2)}, {"epoch": 7}
    )
    waited = time.perf_counter() - t0
    ckpt.wait_for_writes()
    pool.shutdown(wait=True)
    assert waited >= 0.25  # blocked on the prior slot finalizer
    got = ckpt.load_checkpoint(str(tmp_path), "best", {"w": jnp.zeros(2)})
    assert got is not None and got[1]["epoch"] == 7
