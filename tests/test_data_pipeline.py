import numpy as np
import pytest

from ultrafnd_git_tpu.data.cache import (
    build_feature_cache,
    load_cache,
    save_cache,
)
from ultrafnd_git_tpu.data.dataset import FakeSVRawDataset, label_of
from ultrafnd_git_tpu.data.ocr import (
    build_phrase_features,
    clean_tokens,
    load_phrase_features,
    save_phrase_features,
    whitespace_tokens,
)
from ultrafnd_git_tpu.data.splits import make_split


def test_label_map_v2_convention():
    assert label_of({"annotation": "假"}) == 1
    assert label_of({"annotation": "fake"}) == 1
    assert label_of({"annotation": "辟谣"}) == 0
    assert label_of({"annotation": "true"}) == 0
    assert label_of({"annotation": "real"}) == 0
    assert label_of({"annotation": "???"}) == 0
    assert label_of({}) == 0


def test_dataset_parses_jsonl(fixture_data_root):
    ds = FakeSVRawDataset(fixture_data_root)
    assert len(ds) == 64
    item = ds.get_item(0)
    assert set(item) == {"id", "title", "ocr", "comments", "label"}
    assert item["id"].startswith("douyin_")
    assert ds.labels.sum() > 0 and (ds.labels == 0).sum() > 0


def test_dataset_parses_json_array(tmp_path):
    p = tmp_path / "data_complete.json"
    p.write_text(
        '[{"video_id": "a", "annotation": "假", "title": "t"}]', encoding="utf-8"
    )
    ds = FakeSVRawDataset(str(tmp_path))
    assert len(ds) == 1 and ds.labels[0] == 1


def test_split_stratified():
    labels = np.array([0] * 70 + [1] * 30)
    tr, va, te = make_split(labels, np.random.default_rng(0))
    assert len(set(tr) & set(va)) == 0
    assert len(set(tr) & set(te)) == 0
    assert len(set(va) & set(te)) == 0
    assert len(tr) + len(va) + len(te) == 100
    # both classes present in train
    assert set(labels[tr]) == {0, 1}
    assert 60 <= len(tr) <= 80


def test_ocr_tokenizers():
    assert clean_tokens("外星人入侵!! ab c 地球") == ["外星人入侵", "ab", "地球"]
    assert whitespace_tokens("外星 警告\t假 a") == {"外星", "警告"}


def test_phrase_pkl_roundtrip(tmp_path):
    records = [{"video_id": "v1", "ocr": "外星 危机 外星"}]
    feats = build_phrase_features(records)
    assert feats["phrase_sets"]["v1"] == {"外星", "危机"}
    assert feats["freqs"]["v1"]["外星"] == 2
    p = tmp_path / "ocr_phrase_fea.pkl"
    save_phrase_features(feats, str(p))
    assert load_phrase_features(str(p))["phrase_sets"]["v1"] == {"外星", "危机"}


@pytest.fixture(scope="module")
def cache(request):
    root = request.getfixturevalue("fixture_data_root")
    return build_feature_cache(FakeSVRawDataset(root), seed=42)


# make the session fixture accessible at module scope
@pytest.fixture(scope="module")
def fixture_data_root():
    from pathlib import Path

    return str(
        Path(__file__).resolve().parent / "fixtures" / "fakesv_tiny"
    )


def test_cache_contract(cache):
    n = 64
    assert cache["text"].shape == (n, 768)
    assert cache["audio"].shape == (n, 128)
    assert cache["visual"].shape == (n, 512)
    assert cache["temporal"].shape == (n, 256)
    assert cache["aux"].shape == (n, 2)
    assert len(cache["ocr_sets"]) == n
    for k in ("text", "audio", "visual", "temporal", "aux"):
        assert cache[k].dtype == np.float32
        assert np.isfinite(cache[k]).all()
    # visual rows are unit-norm where nonzero
    norms = np.linalg.norm(cache["visual"], axis=1)
    nonzero = norms > 0
    np.testing.assert_allclose(norms[nonzero], 1.0, atol=1e-3)
    # aux in [0, 1]
    assert (cache["aux"] >= 0).all() and (cache["aux"] <= 1).all()


def test_cache_deterministic(fixture_data_root, cache):
    again = build_feature_cache(FakeSVRawDataset(fixture_data_root), seed=42)
    np.testing.assert_allclose(cache["text"], again["text"], atol=1e-6)
    np.testing.assert_allclose(cache["temporal"], again["temporal"], atol=1e-5)
    np.testing.assert_array_equal(cache["split"][0], again["split"][0])


def test_cache_persistence_roundtrip(cache, tmp_path):
    p = tmp_path / "cache.npz"
    save_cache(cache, str(p))
    loaded = load_cache(str(p))
    assert loaded is not None
    np.testing.assert_allclose(loaded["text"], cache["text"])
    np.testing.assert_array_equal(loaded["labels"], cache["labels"])
    assert loaded["ocr_sets"] == cache["ocr_sets"]
    np.testing.assert_array_equal(loaded["split"][2], cache["split"][2])
    assert load_cache(str(tmp_path / "missing.npz")) is None


def test_v2_cache_still_loads(tmp_path, fixture_data_root):
    """A pre-token-ids (v2) cache must keep loading — every field the
    non-tower paths use is present; only --train_text_tower needs a
    rebuilt v3 cache (regression: the version bump stranded existing
    trained out_dirs behind a misleading 'no feature cache' error)."""
    import numpy as np

    from ultrafnd_git_tpu.data.cache import (
        TOWER_IDS_LEN,
        build_feature_cache,
        load_cache,
        save_cache,
    )
    from ultrafnd_git_tpu.data.dataset import FakeSVRawDataset

    cache = build_feature_cache(FakeSVRawDataset(fixture_data_root), seed=0)
    path = tmp_path / "feature_cache.npz"
    save_cache(cache, str(path))

    # rewrite as v2: drop the token-id fields, stamp version 2
    z = dict(np.load(path, allow_pickle=False))
    z.pop("text_ids")
    z.pop("text_mask")
    z["version"] = np.int64(2)
    np.savez_compressed(path, **z)

    loaded = load_cache(str(path))
    assert loaded is not None
    np.testing.assert_allclose(loaded["text"], cache["text"])
    assert loaded["text_ids"].shape == (len(cache["labels"]), TOWER_IDS_LEN)
    assert np.all(loaded["text_ids"] == 0)  # zero-filled placeholder


def test_injected_cache_not_reused_under_other_args(tmp_path, fixture_data_root):
    """An injected cache persists with an 'injected' fingerprint, so a
    later bootstrap with real args rebuilds instead of trusting a cache
    that was never built from them (ADVICE r2)."""
    from ultrafnd_git_tpu.data.cache import bootstrap_cache

    fake = {
        "ids": np.array(["a", "b"], dtype=object),
        "labels": np.array([0, 1], dtype=np.int64),
        "text": np.zeros((2, 8), np.float32),
        "audio": np.zeros((2, 4), np.float32),
        "visual": np.zeros((2, 4), np.float32),
        "temporal": np.zeros((2, 4), np.float32),
        "aux": np.zeros((2, 2), np.float32),
        "ocr_sets": [set(), set()],
        "split": (np.array([0]), np.array([1]), np.array([], dtype=int)),
    }
    out = tmp_path / "o"
    got = bootstrap_cache(fixture_data_root, str(out), cache=fake)
    assert got is fake
    assert (out / "feature_cache.npz").exists()
    # same args, no injection: the 'injected' stamp must NOT satisfy the
    # fingerprint gate — this call rebuilds from the fixture (65 records)
    rebuilt = bootstrap_cache(fixture_data_root, str(out))
    assert rebuilt["labels"].shape[0] != 2
