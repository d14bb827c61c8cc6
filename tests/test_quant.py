"""int8 weight-only serving quantization (ops/quant.py + Predictor).

Error contract: symmetric per-channel rounding bounds every dequantized
element within scale/2 of the original, and end-to-end serving scores
stay within the documented |d prob| envelope of the f32 Predictor.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultrafnd_git_tpu.ops.quant import (
    QKEY,
    SKEY,
    dequantize_tree,
    is_quantized_leaf,
    quantize_tree,
    quantized_bytes,
)


def _params():
    rng = np.random.default_rng(0)
    return {
        "dense": {
            "kernel": rng.standard_normal((64, 128)).astype(np.float32),
            "bias": rng.standard_normal(128).astype(np.float32),
        },
        "embed": {
            "embedding": (
                rng.standard_normal((256, 32)).astype(np.float32)
                * rng.uniform(0.01, 3.0, size=(256, 1))  # wild row scales
            ).astype(np.float32)
        },
        "tiny": {"kernel": rng.standard_normal((4, 4)).astype(np.float32)},
        "norm": {"scale": np.ones(128, np.float32)},
    }


def test_roundtrip_error_bounded_per_channel():
    p = _params()
    q, stats = quantize_tree(p, min_size=1024)
    assert stats["quantized"] == 2  # dense.kernel + embed.embedding
    assert is_quantized_leaf(q["dense"]["kernel"])
    assert q["dense"]["kernel"][QKEY].dtype == jnp.int8
    # per-output-channel: scale shape (1, out); embedding per-row (V, 1)
    assert q["dense"]["kernel"][SKEY].shape == (1, 128)
    assert q["embed"]["embedding"][SKEY].shape == (256, 1)

    deq = dequantize_tree(q)
    for key, axis in (("dense", "kernel"), ("embed", "embedding")):
        w = p[key][axis]
        err = np.abs(np.asarray(deq[key][axis]) - w)
        scale = np.asarray(q[key][axis][SKEY])
        assert (err <= scale / 2 + 1e-7).all()

    # untouched leaves pass through by identity
    np.testing.assert_array_equal(deq["dense"]["bias"], p["dense"]["bias"])
    np.testing.assert_array_equal(deq["tiny"]["kernel"], p["tiny"]["kernel"])
    np.testing.assert_array_equal(deq["norm"]["scale"], p["norm"]["scale"])


def test_small_leaves_kept_f32():
    q, stats = quantize_tree(_params(), min_size=10**9)
    assert stats["quantized"] == 0
    assert not is_quantized_leaf(q["dense"]["kernel"])


def test_dequantize_dtype_lever():
    q, _ = quantize_tree(_params(), min_size=1024)
    deq16 = dequantize_tree(q, jnp.bfloat16)
    assert deq16["dense"]["kernel"].dtype == jnp.bfloat16


def test_quantized_bytes_reports_compression():
    q, _ = quantize_tree(_params(), min_size=1024)
    qb, fb = quantized_bytes(q)
    assert qb < fb  # int8 leaves count 1 byte vs 4


def test_dequantize_is_jit_traceable():
    q, _ = quantize_tree(_params(), min_size=1024)

    @jax.jit
    def f(t):
        d = dequantize_tree(t)
        return d["dense"]["kernel"].sum()

    assert np.isfinite(float(f(q)))


@pytest.mark.slow
def test_quantized_predictor_tracks_f32_scores(v2_ckpt, fixture_data_root):
    """Predictor(quantize=True) serves scores within the weight-rounding
    envelope of the f32 Predictor, and hard predictions almost all agree."""
    from ultrafnd_git_tpu.serving import Predictor

    out = v2_ckpt  # session-shared plain checkpoint (read-only here)

    records = [
        json.loads(ln)
        for ln in open(
            f"{fixture_data_root}/data_complete.json", encoding="utf-8"
        )
    ][:16]

    p32 = Predictor(str(out), batch_size=8)
    pq = Predictor(str(out), batch_size=8, quantize=True)
    r32 = p32.predict(records)
    rq = pq.predict(records)

    d = np.abs(
        np.asarray([r["prob_fake"] for r in r32])
        - np.asarray([r["prob_fake"] for r in rq])
    )
    assert d.max() < 5e-2, d.max()  # documented envelope
    agree = np.mean([a["label"] == b["label"] for a, b in zip(r32, rq)])
    assert agree >= 0.9, agree


@pytest.mark.slow
def test_quantized_predictor_with_text_tower(tower_ckpt, fixture_data_root):
    """quantize=True also covers the trained text tower (its 32768x768
    embedding is the single biggest int8 win) and stays within the
    envelope of the f32 tower predictor."""
    from ultrafnd_git_tpu.serving import Predictor

    records = [
        json.loads(ln)
        for ln in open(
            f"{fixture_data_root}/data_complete.json", encoding="utf-8"
        )
    ][:8]
    p32 = Predictor(tower_ckpt["out"], batch_size=8)
    pq = Predictor(tower_ckpt["out"], batch_size=8, quantize=True)
    assert pq.text_tower is not None  # the tower path is actually live
    from ultrafnd_git_tpu.ops.quant import is_quantized_leaf

    assert is_quantized_leaf(
        pq._score_params["text_tower"]["tok_embed"]["embedding"]
    )
    r32 = p32.predict(records)
    rq = pq.predict(records)
    d = np.abs(
        np.asarray([r["prob_fake"] for r in r32])
        - np.asarray([r["prob_fake"] for r in rq])
    )
    assert d.max() < 5e-2, d.max()
