"""Featurization salt (`--hash_salt`): a tunable re-draw of every
stable-hash feature.

BASELINE.md ("Accuracy parity, attributed") measured that the offline
hash features are a random projection whose collision DRAW moves acc/F1
by several points in both trainers; the salt makes the draw controllable
like a seed. These tests pin the mechanics: exact FNV prefix semantics,
native/python agreement under a salt, fingerprint isolation, and the
train -> serve salt round-trip.
"""
import numpy as np
import pytest

from ultrafnd_git_tpu.ops import hashing


@pytest.fixture(autouse=True)
def _reset_salt():
    """Salt is process-wide state — never leak it into other tests."""
    yield
    hashing.set_hash_salt("")


def test_salted_hash_is_fnv_of_salt_prefix():
    # continuing from fnv1a(salt) == hashing salt||token in one pass
    hashing.set_hash_salt("")
    expect = hashing.fnv1a_64("salty-token")
    hashing.set_hash_salt("salty-")
    assert hashing.fnv1a_64("token") == expect


def test_salt_changes_and_reproduces_embeddings():
    texts = ["外星人 入侵 地球", "hello world", ""]
    hashing.set_hash_salt("")
    base = hashing.hash_embed_batch(texts, 64)
    hashing.set_hash_salt("A")
    salted = hashing.hash_embed_batch(texts, 64)
    salted2 = hashing.hash_embed_batch(texts, 64)
    # a salt re-draws bucket assignments (row norms stay unit/zero)
    assert not np.allclose(base, salted)
    np.testing.assert_allclose(salted, salted2)
    norms = np.linalg.norm(salted, axis=1)
    np.testing.assert_allclose(norms[:2], 1.0, atol=1e-5)
    assert norms[2] == 0.0
    # resetting restores the canonical draw (memo cleared both ways)
    hashing.set_hash_salt("")
    np.testing.assert_allclose(hashing.hash_embed_batch(texts, 64), base)


def test_native_and_python_paths_agree_under_salt(monkeypatch):
    from ultrafnd_git_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    texts = ["mixed 中文 tokens", "a b c a", "　ideographic　space　"]
    hashing.set_hash_salt("draw-7")
    with_native = hashing.hash_embed_batch(texts, 96)
    monkeypatch.setenv("ULTRAFND_NATIVE", "0")
    native.reset()
    try:
        without_native = hashing.hash_embed_batch(texts, 96)
    finally:
        monkeypatch.setenv("ULTRAFND_NATIVE", "1")
        native.reset()
    np.testing.assert_allclose(with_native, without_native, atol=1e-6)


def test_native_scalar_follows_salt():
    from ultrafnd_git_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    hashing.set_hash_salt("scalar-draw")
    # drop-in parity with the python path under a live salt
    assert native.fnv1a_64_native("令牌 token") == hashing.fnv1a_64(
        "令牌 token"
    )
    # explicit basis overrides the process-wide draw
    from ultrafnd_git_tpu.ops.hashing import basis_for_salt

    hashing.set_hash_salt("")
    assert native.fnv1a_64_native(
        "tok", basis=basis_for_salt("other")
    ) == hashing.fnv1a_64("tok", basis_for_salt("other"))


def test_tokenize_explicit_salt_is_pinned_not_global():
    from ultrafnd_git_tpu.models.transformer import hash_tokenize_batch

    texts = ["外星人 入侵 地球 警告"]
    hashing.set_hash_salt("live-draw")
    live, _ = hash_tokenize_batch(texts, max_len=8)
    # explicit salt pins the draw WITHOUT touching process state
    pinned, _ = hash_tokenize_batch(texts, max_len=8, salt="")
    assert hashing.get_hash_salt() == "live-draw"
    hashing.set_hash_salt("")
    canonical, _ = hash_tokenize_batch(texts, max_len=8)
    np.testing.assert_array_equal(pinned, canonical)
    assert not np.array_equal(live, canonical)


@pytest.mark.slow
def test_tower_from_checkpoint_never_clobbers_global_salt(tower_ckpt):
    """Loading a tower checkpoint pins ITS training draw per-instance;
    the process-wide salt (another component's draw) must survive."""
    from ultrafnd_git_tpu.models.transformer import DeviceTextEncoder

    hashing.set_hash_salt("other-components-draw")
    enc = DeviceTextEncoder.from_checkpoint(tower_ckpt["out"])
    assert hashing.get_hash_salt() == "other-components-draw"
    assert enc.hash_salt == ""  # the session tower was trained unsalted
    under_live = enc.encode_batch(["官方 辟谣 证据"])
    hashing.set_hash_salt("")
    under_canonical = enc.encode_batch(["官方 辟谣 证据"])
    # tokenization is pinned to the tower's own draw either way
    np.testing.assert_allclose(under_live, under_canonical, atol=1e-6)


def test_cache_fingerprint_isolates_salts(tmp_path):
    from ultrafnd_git_tpu.data.cache import cache_fingerprint

    hashing.set_hash_salt("")
    unsalted = cache_fingerprint(str(tmp_path), 42, None)
    # unsalted fingerprints carry no salt key: byte-compatible with
    # caches persisted before the salt existed (no spurious rebuilds)
    assert "hash_salt" not in unsalted
    hashing.set_hash_salt("B")
    assert cache_fingerprint(str(tmp_path), 42, None) != unsalted


@pytest.mark.slow
def test_salt_round_trips_train_to_serving(fixture_data_root, tmp_path):
    """Train salted -> Predictor adopts the salt -> request featurization
    matches the training-cache rows for the same record."""
    from ultrafnd_git_tpu.serving import Predictor
    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig

    out = tmp_path / "salted"
    cfg = TrainConfig(
        data_root=fixture_data_root,
        out_dir=str(out),
        batch_size=8,
        epochs=1,
        seed=0,
        hash_salt="draw-X",
        log_metrics_jsonl=False,
    )
    trainer = ForensicTrainer(cfg)
    trainer.fit()

    # a fresh unsalted build of the same fixture differs (the salt is
    # not a no-op on this corpus)
    hashing.set_hash_salt("")
    from ultrafnd_git_tpu.data.cache import build_feature_cache
    from ultrafnd_git_tpu.data.dataset import FakeSVRawDataset

    unsalted = build_feature_cache(
        FakeSVRawDataset(fixture_data_root), seed=0
    )
    assert not np.allclose(unsalted["text"], trainer.cache["text"])

    pred = Predictor(str(out))
    assert pred._hash_salt == "draw-X"
    # re-featurize record 0 through the serving path: identical text row
    raw = FakeSVRawDataset(fixture_data_root)
    rec = raw.get_item(0)
    feats = pred.featurize(
        [
            {
                "video_id": rec["id"],
                "title": rec.get("title", ""),
                "ocr": rec.get("ocr", ""),
                "comments": rec.get("comments", []),
            }
        ]
    )
    np.testing.assert_allclose(
        feats["text"][0], trainer.cache["text"][0], atol=1e-6
    )
