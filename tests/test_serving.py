"""Serving: Predictor loads a trained out_dir and scores new records."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # trains a checkpoint to serve from

from ultrafnd_git_tpu.serving import Predictor

FAKE_REC = {
    "video_id": "q_fake",
    "title": "外星人 入侵 地球 警告 危险",
    "ocr": "外星 飞船 出现 危险 逃离",
    "comments": ["太可怕了 赶紧转发"],
}
REAL_REC = {
    "video_id": "q_real",
    "title": "辟谣 外星人 谣言 不实",
    "ocr": "专家 辟谣 谣言 证据 科学",
    "comments": ["官方已经辟谣了"],
}


@pytest.fixture(scope="module")
def trained_out_dir(v2_ckpt):
    # the session-shared plain checkpoint (tests/conftest.py v2_ckpt);
    # everything here only READS the out_dir
    return v2_ckpt


def test_predict_contract_and_discrimination(trained_out_dir):
    predictor = Predictor(trained_out_dir, batch_size=4)
    results = predictor.predict([FAKE_REC, REAL_REC])
    assert [r["id"] for r in results] == ["q_fake", "q_real"]
    for r in results:
        assert 0.0 <= r["prob_fake"] <= 1.0
        assert r["label"] in (0, 1)
        for k in ("semantic_conflict", "temporal_delay", "emotion_intensity"):
            assert np.isfinite(r[k])
    # the model trained to saturation on this vocabulary: the sensational
    # record must score as more fake than the debunking record
    assert results[0]["prob_fake"] > results[1]["prob_fake"]


def test_predict_batches_pad_without_recompiles(trained_out_dir):
    predictor = Predictor(trained_out_dir, batch_size=4)
    many = [dict(FAKE_REC, video_id=f"q{i}") for i in range(7)]  # ragged
    results = predictor.predict(many)
    assert len(results) == 7
    # identical inputs -> identical scores across both sub-batches
    probs = {r["prob_fake"] for r in results}
    assert len(probs) == 1


def test_warmup_precompiles_bucket_ladder(trained_out_dir):
    predictor = Predictor(trained_out_dir, batch_size=4)
    assert predictor.warmup(16) == 2  # featurize buckets 8, 16
    compiled = predictor._score._cache_size()
    assert compiled >= 1
    # live requests inside the warmed range reuse the compiled programs:
    # 5 ragged records hit featurize bucket 8 + the warmed score buckets
    results = predictor.predict(
        [dict(FAKE_REC, video_id=f"w{i}") for i in range(5)]
    )
    assert len(results) == 5
    assert predictor._score._cache_size() == compiled


def test_explain_grad_contract(trained_out_dir):
    predictor = Predictor(trained_out_dir, batch_size=4)
    results = predictor.explain([FAKE_REC, REAL_REC], method="grad", top_k=3)
    plain = predictor.predict([FAKE_REC, REAL_REC])
    assert len(results) == 2
    for r, p in zip(results, plain):
        assert r["prob_fake"] == pytest.approx(p["prob_fake"])  # same scores
        e = r["explain"]
        assert e["method"] == "grad_x_input"
        assert set(e["aux"]) == {"temporal_delay", "emotion"}
        assert len(e["top_fused_dims"]) == 3
        # grad-x-input magnitudes, sorted descending by |value|
        mags = [abs(v) for _, v in e["top_fused_dims"]]
        assert mags == sorted(mags, reverse=True)
        assert np.isfinite(e["fused_attr_l1"])


def test_explain_shap_additivity_ties_to_served_probability(trained_out_dir):
    predictor = Predictor(trained_out_dir, batch_size=4)
    results = predictor.explain(
        [FAKE_REC, REAL_REC], method="shap", n_coalitions=128,
        background_size=2,
    )
    for r in results:
        e = r["explain"]
        assert e["method"] == "kernel-shap"  # native rung (no shap pkg)
        # efficiency axiom: base + ALL values == prob_fake (top_fused_dims
        # is truncated, so reconstruct from the signed full sum)
        full = e["base_value"] + e["fused_signed_sum"] + e["aux"][
            "temporal_delay"
        ] + e["aux"]["emotion"]
        assert full == pytest.approx(r["prob_fake"], abs=1e-3)


def test_explain_shap_single_record_is_nondegenerate(trained_out_dir):
    # the background is the training corpus, NOT the request batch — a
    # single-record request must still get real (non-zero) attributions
    predictor = Predictor(trained_out_dir, batch_size=4)
    [r] = predictor.explain(
        [FAKE_REC], method="shap", n_coalitions=128, background_size=4
    )
    e = r["explain"]
    assert e["method"] == "kernel-shap"
    assert e["fused_attr_l1"] > 0.0
    full = e["base_value"] + e["fused_signed_sum"] + e["aux"][
        "temporal_delay"
    ] + e["aux"]["emotion"]
    assert full == pytest.approx(r["prob_fake"], abs=1e-3)
    # base is the corpus-background mean probability, not this record's
    assert e["base_value"] != pytest.approx(r["prob_fake"], abs=1e-6)


def test_explain_rejects_unknown_method(trained_out_dir):
    predictor = Predictor(trained_out_dir, batch_size=4)
    with pytest.raises(ValueError):
        predictor.explain([FAKE_REC], method="lime")


def test_bf16_serving_tracks_f32_scores(trained_out_dir):
    p32 = Predictor(trained_out_dir, batch_size=4)
    p16 = Predictor(trained_out_dir, batch_size=4, bf16=True)
    r32 = p32.predict([FAKE_REC, REAL_REC])
    r16 = p16.predict([FAKE_REC, REAL_REC])
    for a, b in zip(r32, r16):
        # bf16 envelope, not bit equality
        assert abs(a["prob_fake"] - b["prob_fake"]) < 0.05
    # ordering (the decision-relevant property) is preserved
    assert r16[0]["prob_fake"] > r16[1]["prob_fake"]


def test_predict_empty_and_missing_checkpoint(trained_out_dir, tmp_path):
    predictor = Predictor(trained_out_dir)
    assert predictor.predict([]) == []
    with pytest.raises(FileNotFoundError):
        Predictor(str(tmp_path))  # no cache/checkpoint there


def test_serving_text_tower_checkpoint(tower_ckpt):
    """A --train_text_tower checkpoint serves through the SAME trained
    tower (hash/HF text features would be a different distribution than
    the fusion saw in training). Uses the shared session checkpoint
    (best == final after its 1 epoch, so the param comparison holds)."""
    predictor = Predictor(tower_ckpt["out"], batch_size=4)
    assert predictor.text_tower is not None
    results = predictor.predict([FAKE_REC, REAL_REC])
    assert len(results) == 2
    for r in results:
        assert 0.0 <= r["prob_fake"] <= 1.0
    # the restored tower params are the TRAINED ones (match the trainer's)
    import jax

    served = jax.tree.leaves(predictor.params["text_tower"])[0]
    np.testing.assert_allclose(
        np.asarray(served), tower_ckpt["tower_leaf"], atol=1e-6
    )


def test_multi_chunk_fallback_ids_stay_request_global(trained_out_dir):
    """Records without video_id/id get q_{i} fallback ids; per-chunk
    featurization must offset them per chunk, or multi-chunk requests
    return colliding ids (review r3). Also: the featurize prefetch pool
    is long-lived, not rebuilt per predict() call."""
    predictor = Predictor(trained_out_dir, batch_size=2)
    recs = [
        {"title": FAKE_REC["title"], "ocr": FAKE_REC["ocr"], "comments": []}
        for _ in range(6)
    ]
    results = predictor.predict(recs)  # CPU backend: 3 chunks of 2
    assert [r["id"] for r in results] == [f"q_{i}" for i in range(6)]
    pool = predictor._featurize_pool_obj
    predictor.predict(recs[:2])
    assert predictor._featurize_pool_obj is pool


# ---------------------------------------------------------------------------
# AOT serving artifacts (export_serving.py): jax.export'ed scoring program


def test_exported_artifact_matches_live_predictor(trained_out_dir, tmp_path):
    """export -> ExportedPredictor scores bit-identically to the live
    Predictor (same backend, same program — the artifact is the SAME
    StableHLO the live scorer traces), including across chunk-padding
    (odd record counts) and fallback-id plumbing."""
    from ultrafnd_git_tpu.export_serving import (
        ExportedPredictor,
        export_artifact,
    )

    live = Predictor(trained_out_dir, batch_size=4)
    art = tmp_path / "artifact"
    export_artifact(live, str(art), platforms=("cpu",))
    assert (art / "scorer.jaxexport").exists()
    assert (art / "arrays.npz").exists()

    served = ExportedPredictor(str(art), batch_size=4)
    # warmup is inherited from Predictor and runs against the frozen
    # StableHLO program (serve.py --artifact ... --warmup)
    assert served.warmup(8) == 1
    recs = [FAKE_REC, REAL_REC] + [
        {"title": "普通 新闻 报道", "ocr": "今天 天气", "comments": []}
    ]  # 3 records -> bucket pad on the 4-row ladder
    got = served.predict(recs)
    want = live.predict(recs)
    assert [r["id"] for r in got] == [r["id"] for r in want]
    for g, w in zip(got, want):
        assert g["label"] == w["label"]
        for k in ("prob_fake", "semantic_conflict", "temporal_delay",
                  "emotion_intensity"):
            np.testing.assert_allclose(g[k], w[k], atol=1e-6, err_msg=k)


def test_exported_artifact_validates_featurizer_contract(
    trained_out_dir, tmp_path
):
    """A drifted featurizer contract must fail at LOAD with the cause
    (advisor r3): tampered feats_keys / tower_len in meta.json raise a
    descriptive ValueError instead of an opaque XLA arity error at the
    first dispatch."""
    import json as _json

    from ultrafnd_git_tpu.export_serving import (
        ExportedPredictor,
        export_artifact,
    )

    live = Predictor(trained_out_dir, batch_size=4)
    art = tmp_path / "artifact_drift"
    export_artifact(live, str(art), platforms=("cpu",))
    meta_path = art / "meta.json"
    meta = _json.loads(meta_path.read_text(encoding="utf-8"))

    bad = dict(meta, feats_keys=meta["feats_keys"] + ["bogus_features"])
    meta_path.write_text(_json.dumps(bad), encoding="utf-8")
    with pytest.raises(ValueError, match="feature spec"):
        ExportedPredictor(str(art))

    # a tower artifact whose token length drifted from the current
    # featurizer's TOWER_IDS_LEN (feats_keys adjusted to the tower set
    # so the length check is what fires)
    bad = dict(
        meta,
        tower_len=999,
        feats_keys=[k for k in meta["feats_keys"] if k != "text_features"],
    )
    meta_path.write_text(_json.dumps(bad), encoding="utf-8")
    with pytest.raises(ValueError, match="tower token length"):
        ExportedPredictor(str(art))

    # restore the real meta: the artifact loads again
    meta_path.write_text(_json.dumps(meta), encoding="utf-8")
    assert ExportedPredictor(str(art), batch_size=4) is not None


def test_exported_artifact_is_standalone(trained_out_dir, tmp_path):
    """The artifact serves WITHOUT the out_dir: no checkpoint restore, no
    feature-cache npz, no Flax module build. (Loaded from a copy in a
    directory where nothing else exists.)"""
    import shutil

    from ultrafnd_git_tpu.export_serving import (
        ExportedPredictor,
        export_artifact,
    )

    live = Predictor(trained_out_dir, batch_size=4)
    art = tmp_path / "a"
    export_artifact(live, str(art), platforms=("cpu",))
    moved = tmp_path / "elsewhere" / "artifact"
    moved.parent.mkdir()
    shutil.copytree(art, moved)

    served = ExportedPredictor(str(moved))
    out = served.predict([FAKE_REC])
    assert out[0]["id"] == "q_fake"
    assert 0.0 <= out[0]["prob_fake"] <= 1.0
    # explain needs the full-precision modules — loud, not wrong
    with pytest.raises(NotImplementedError):
        served.explain([FAKE_REC])


def test_exported_artifact_platform_guard(trained_out_dir, tmp_path):
    """Loading an artifact lowered for a platform this process doesn't
    run on fails loudly at construction, not at first dispatch."""
    from ultrafnd_git_tpu.export_serving import (
        ExportedPredictor,
        export_artifact,
    )

    live = Predictor(trained_out_dir, batch_size=4)
    art = tmp_path / "tpu_only"
    export_artifact(live, str(art), platforms=("tpu",))
    with pytest.raises(ValueError, match="lowered for"):
        ExportedPredictor(str(art))


def test_exported_quantized_artifact(trained_out_dir, tmp_path):
    """int8 serving weights export as int8 (the artifact stays small) and
    the in-program dequantize reproduces the live quantized scores."""
    from ultrafnd_git_tpu.export_serving import (
        ExportedPredictor,
        export_artifact,
    )

    live = Predictor(trained_out_dir, batch_size=4, quantize=True)
    art = tmp_path / "q"
    export_artifact(live, str(art), platforms=("cpu",))
    z = np.load(art / "arrays.npz")
    int8_keys = [k for k in z.files if z[k].dtype == np.int8]
    assert int8_keys, "quantized kernels must serialize as int8"

    served = ExportedPredictor(str(art), batch_size=4)
    got = served.predict([FAKE_REC, REAL_REC])
    want = live.predict([FAKE_REC, REAL_REC])
    for g, w in zip(got, want):
        np.testing.assert_allclose(g["prob_fake"], w["prob_fake"], atol=1e-6)


def test_exported_tower_artifact(tower_ckpt, tmp_path):
    """A --train_text_tower checkpoint exports with the tower INSIDE the
    frozen program (token ids in, text features computed on device) and
    matches the live tower predictor."""
    from ultrafnd_git_tpu.export_serving import (
        ExportedPredictor,
        export_artifact,
    )

    live = Predictor(tower_ckpt["out"], batch_size=4)
    art = tmp_path / "tower"
    export_artifact(live, str(art), platforms=("cpu",))
    served = ExportedPredictor(str(art), batch_size=4)
    assert served.text_tower is not None  # featurize emits token ids
    got = served.predict([FAKE_REC, REAL_REC])
    want = live.predict([FAKE_REC, REAL_REC])
    for g, w in zip(got, want):
        np.testing.assert_allclose(g["prob_fake"], w["prob_fake"], atol=1e-6)


def test_fused_align_single_dispatch_matches_legacy(trained_out_dir):
    """The fused-align scoring program (default) computes the temporal
    alignment IN-PROGRAM — featurize() never touches the device — and
    its scores match the round-3 two-dispatch paths to f32 tiling
    tolerance (the align MLP runs at a different batch shape, so exact
    bit-match is not owed; serving.py fused_align docstring)."""
    fused = Predictor(trained_out_dir, batch_size=4)
    legacy = Predictor(trained_out_dir, batch_size=4, fused_align=False)
    assert fused.fused_align and not legacy.fused_align

    # host-only featurize: no temporal/aux keys, no align dispatch
    recs = [FAKE_REC, REAL_REC]
    cache = fused.featurize(recs)
    assert "temporal" not in cache and "aux" not in cache
    assert "emo" in cache
    tsync = fused._encoders["tsync"]
    orig_apply = tsync._apply

    def _boom(*a, **k):  # the fused path must not dispatch the align MLP
        raise AssertionError("align MLP dispatched during fused featurize")

    tsync._apply = _boom
    try:
        got = fused.predict(recs)
    finally:
        tsync._apply = orig_apply

    want = legacy.predict(recs)
    leg_cache = legacy.featurize(recs)
    assert "temporal" in leg_cache and "aux" in leg_cache
    for g, w in zip(got, want):
        assert g["id"] == w["id"] and g["label"] == w["label"]
        for k in ("prob_fake", "semantic_conflict", "temporal_delay",
                  "emotion_intensity"):
            np.testing.assert_allclose(g[k], w[k], atol=1e-5, err_msg=k)

    # a full legacy cache handed to the fused predictor still scores
    # (the legacy program jits lazily) and agrees with the legacy rows
    via_full = fused.predict_featurized(leg_cache, len(recs))
    for g, w in zip(via_full, want):
        np.testing.assert_allclose(g["prob_fake"], w["prob_fake"], atol=1e-6)


def test_fused_align_evidence_checkpoint(fixture_data_root, tmp_path):
    """use_evidence checkpoints under fused_align: featurize emits the
    two host evidence columns ("evidence_host") and the program appends
    the in-program delay as column 2 — rows match the legacy
    three-column path."""
    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig

    out = tmp_path / "ev_ckpt"
    ForensicTrainer(
        TrainConfig(
            data_root=fixture_data_root,
            out_dir=str(out),
            batch_size=8,
            epochs=1,
            seed=0,
            use_evidence=True,
            cache_to_disk=True,
            log_metrics_jsonl=False,
        )
    ).fit()

    fused = Predictor(str(out), batch_size=4)
    legacy = Predictor(str(out), batch_size=4, fused_align=False)
    assert fused.use_evidence

    cache = fused.featurize([FAKE_REC, REAL_REC])
    assert cache["evidence_host"].shape[1] == 2
    assert "evidence" not in cache

    got = fused.predict([FAKE_REC, REAL_REC])
    want = legacy.predict([FAKE_REC, REAL_REC])
    for g, w in zip(got, want):
        for k in ("prob_fake", "semantic_conflict", "temporal_delay",
                  "emotion_intensity"):
            np.testing.assert_allclose(g[k], w[k], atol=1e-5, err_msg=k)


def test_exported_artifact_accelerator_chunking_stays_at_batch_size(
    trained_out_dir, tmp_path, monkeypatch
):
    """ADVICE r4: on accelerator backends _pipeline expands chunks up
    the 4096 bucket ladder — but an AOT artifact exists at exactly ONE
    shape, so requests (and startup warmup) above batch_size must chunk
    at batch_size instead of asking the program for an unexported
    bucket. Simulated by pinning default_backend()='tpu' inside the
    serving module; the artifact itself is lowered for cpu."""
    from ultrafnd_git_tpu import serving as serving_mod
    from ultrafnd_git_tpu.export_serving import (
        ExportedPredictor,
        export_artifact,
    )

    live = Predictor(trained_out_dir, batch_size=4)
    art = tmp_path / "artifact"
    export_artifact(live, str(art), platforms=("cpu",))
    served = ExportedPredictor(str(art), batch_size=4)
    want = served.predict([dict(FAKE_REC, video_id=f"q{i}") for i in range(7)])

    monkeypatch.setattr(
        serving_mod.jax, "default_backend", lambda: "tpu"
    )
    # 7 records > batch_size: without the _fixed_shape_dispatch clamp
    # this dispatches one 8-row bucket the artifact was never exported
    # with; with it, two 4-row chunks of the frozen program
    got = served.predict([dict(FAKE_REC, video_id=f"q{i}") for i in range(7)])
    assert [r["id"] for r in got] == [f"q{i}" for i in range(7)]
    for g, w in zip(got, want):
        np.testing.assert_allclose(g["prob_fake"], w["prob_fake"], atol=1e-6)
    # warmup's ladder (the serve.py --warmup default is 64 > batch_size)
    # must also survive on the fixed-shape artifact
    assert served.warmup(16) >= 1
