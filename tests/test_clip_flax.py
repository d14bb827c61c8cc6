"""Parity: Flax CLIP text tower with transferred torch weights vs torch.

Hermetic — builds a small randomly-initialized
`transformers.CLIPTextModelWithProjection` (no downloads) and asserts the
transferred-weights Flax tower reproduces `get_text_features` at fp32
tolerance, including the L2-normalized encode contract of reference
`src/models/semantic_forgery.py:119-157`.
"""
import string

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from ultrafnd_git_tpu.models.clip_flax import (
    ClipTextEncoderFlax,
    DeviceClipTextEncoder,
    torch_clip_text_to_flax_params,
)


def _tiny_clip(seed: int = 0, eos_token_id: int = 1, vocab_size: int = 96):
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    cfg = CLIPTextConfig(
        vocab_size=vocab_size,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=32,
        projection_dim=48,
        hidden_act="quick_gelu",
        bos_token_id=0,
        eos_token_id=eos_token_id,
        pad_token_id=eos_token_id,
    )
    torch.manual_seed(seed)
    model = CLIPTextModelWithProjection(cfg)
    model.eval()
    return model, cfg


def _tiny_clip_tokenizer(tmp_path):
    """Character-level BPE vocab (no merges) — enough for real tokenize."""
    import json

    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for ch in string.ascii_lowercase + string.digits:
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    from transformers import CLIPTokenizer

    return CLIPTokenizer(
        str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")
    )


def _flax_module(cfg, legacy=False):
    return ClipTextEncoderFlax(
        width=cfg.hidden_size,
        depth=cfg.num_hidden_layers,
        heads=cfg.num_attention_heads,
        intermediate=cfg.intermediate_size,
        vocab_size=cfg.vocab_size,
        max_positions=cfg.max_position_embeddings,
        proj_dim=cfg.projection_dim,
        hidden_act=cfg.hidden_act,
        ln_eps=cfg.layer_norm_eps,
        eos_token_id=cfg.eos_token_id,
        legacy_eos_pooling=legacy,
    )


def _ids_with_eos(rng, b, l, vocab, eos):
    """Random ids with a guaranteed EOS + eos-padding after it."""
    ids = rng.integers(2, vocab, (b, l))
    mask = np.ones((b, l), np.float32)
    for i, eos_at in enumerate([l - 1, 5, 9][:b]):
        ids[i, eos_at] = eos
        ids[i, eos_at + 1 :] = eos
        mask[i, eos_at + 1 :] = 0.0
    return ids, mask


def test_transferred_weights_match_torch_text_features():
    model, cfg = _tiny_clip()
    rng = np.random.default_rng(0)
    ids, mask = _ids_with_eos(rng, 3, 19, cfg.vocab_size, cfg.eos_token_id)

    with torch.inference_mode():
        ref = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).text_embeds.numpy()

    module = _flax_module(cfg)
    params = torch_clip_text_to_flax_params(
        model.state_dict(), cfg.num_hidden_layers
    )
    got, hidden = module.apply(
        {"params": params},
        jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.float32),
    )
    assert hidden.shape == (3, 19, cfg.hidden_size)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4, rtol=1e-4)


def test_legacy_eos_pooling_matches_torch():
    """eos_token_id == 2 checkpoints (all OpenAI releases) pool at
    argmax(ids); HF keeps that quirk and so must the transfer."""
    model, cfg = _tiny_clip(eos_token_id=2)
    rng = np.random.default_rng(1)
    ids, mask = _ids_with_eos(rng, 3, 15, cfg.vocab_size, cfg.eos_token_id)

    with torch.inference_mode():
        ref = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).text_embeds.numpy()

    module = _flax_module(cfg, legacy=True)
    params = torch_clip_text_to_flax_params(
        model.state_dict(), cfg.num_hidden_layers
    )
    got, _ = module.apply(
        {"params": params},
        jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4, rtol=1e-4)


def test_device_encoder_matches_torch_normalized_contract(tmp_path):
    model, cfg = _tiny_clip()
    tok = _tiny_clip_tokenizer(tmp_path)
    texts = ["hello world", "fake news 42", ""]

    enc = DeviceClipTextEncoder(model, tok, max_length=24)
    got = enc.encode_batch(texts)
    assert got.shape == (3, cfg.projection_dim)
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=-1), np.ones(3), atol=1e-4
    )

    batch = tok(
        texts, return_tensors="pt", padding="max_length", truncation=True,
        max_length=24,
    )
    with torch.inference_mode():
        ref = model(**batch).text_embeds.numpy()
    ref = ref / (np.linalg.norm(ref, axis=-1, keepdims=True) + 1e-9)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_analyzer_routes_clip_rung_through_device_tower(tmp_path, monkeypatch):
    """SemanticForgeryAnalyzer with a (stubbed-in) CLIP must encode via the
    device tower and produce the same normalized features."""
    from ultrafnd_git_tpu.models import semantic as semantic_mod
    from ultrafnd_git_tpu.models.semantic import (
        SemanticConfig,
        SemanticForgeryAnalyzer,
    )

    monkeypatch.setenv("ULTRAFND_CLIP_DEVICE", "1")
    model, cfg = _tiny_clip()
    tok = _tiny_clip_tokenizer(tmp_path)
    monkeypatch.setattr(
        semantic_mod,
        "load_once",
        lambda key, loader: (torch, tok, model),
    )

    ana = SemanticForgeryAnalyzer(SemanticConfig(max_length=24))
    out = ana.encode_text(["hello world", "fake news"])
    assert ana._device_clip is not None  # device rung engaged
    direct = DeviceClipTextEncoder(model, tok, max_length=24)
    np.testing.assert_allclose(
        out, direct.encode_batch(["hello world", "fake news"]), atol=1e-5
    )
