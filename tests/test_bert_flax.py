"""Parity: Flax BERT with transferred HF torch weights vs the torch forward.

Hermetic — builds a small randomly-initialized `transformers.BertModel`
(no downloads) and asserts the transferred-weights Flax tower reproduces
it at fp32 tolerance, including the mean-pool/L2 encode contract of
reference `src/core_blocks/text_blocks.py:69-106`.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from ultrafnd_git_tpu.models.bert_flax import (
    BertEncoderFlax,
    DeviceBertEncoder,
    torch_bert_to_flax_params,
)

VOCAB = 97


def _tiny_bert(seed: int = 0):
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=VOCAB,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=48,
        type_vocab_size=2,
        hidden_act="gelu",
    )
    torch.manual_seed(seed)
    model = BertModel(cfg)
    model.eval()
    return model, cfg


def _tiny_tokenizer(tmp_path):
    words = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]",
        "hello", "world", "fake", "news", "video", "title",
        "comment", "真", "假",
    ]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(words), encoding="utf-8")
    from transformers import BertTokenizer

    return BertTokenizer(str(vocab_file))


def test_transferred_weights_match_torch_hidden_states():
    model, cfg = _tiny_bert()
    rng = np.random.default_rng(0)
    B, L = 3, 17
    ids = rng.integers(0, VOCAB, (B, L))
    mask = np.ones((B, L), np.float32)
    mask[0, 12:] = 0.0
    mask[2, 5:] = 0.0

    with torch.inference_mode():
        ref = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()

    module = BertEncoderFlax(
        width=64,
        depth=2,
        heads=4,
        intermediate=128,
        vocab_size=VOCAB,
        max_positions=48,
        type_vocab=2,
        attention_backend="xla",
    )
    params = torch_bert_to_flax_params(model.state_dict(), depth=2)
    got = np.asarray(
        module.apply(
            {"params": params},
            jnp.asarray(ids, jnp.int32),
            jnp.asarray(mask, jnp.float32),
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_transfer_accepts_bert_prefixed_state_dict():
    model, _ = _tiny_bert()
    sd = {f"bert.{k}": v for k, v in model.state_dict().items()}
    params = torch_bert_to_flax_params(sd, depth=2)
    assert params["layer1"]["query"]["kernel"].shape == (64, 64)


def test_device_encoder_matches_torch_pooled_contract(tmp_path):
    model, _ = _tiny_bert()
    tok = _tiny_tokenizer(tmp_path)
    texts = ["hello world", "fake news video title", "真 假 comment", ""]

    enc = DeviceBertEncoder(model, tok, dim=64, max_length=32)
    got = enc.encode_batch(texts)
    assert got.shape == (4, 64)

    # the torch-rung contract: mean-pool-with-mask, L2-normalize
    batch = tok(
        texts, return_tensors="pt", padding=True, truncation=True,
        max_length=32,
    )
    with torch.inference_mode():
        hidden = model(**{
            k: v for k, v in batch.items() if k != "token_type_ids"
        }).last_hidden_state
    m = batch["attention_mask"].unsqueeze(-1).float()
    rep = (hidden * m).sum(dim=1) / m.sum(dim=1).clamp_min(1e-6)
    ref = rep.numpy()
    ref = ref / (np.linalg.norm(ref, axis=-1, keepdims=True) + 1e-9)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    # vectors L2-normalized
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=-1), np.ones(4), atol=1e-4
    )


def test_device_encoder_dim_fitting(tmp_path):
    """dim > hidden pads with zeros; dim < hidden truncates (ref _fit_dim)."""
    model, _ = _tiny_bert()
    tok = _tiny_tokenizer(tmp_path)
    wide = DeviceBertEncoder(model, tok, dim=96, max_length=32)
    out = wide.encode_batch(["hello world"])
    assert out.shape == (1, 96)
    assert np.all(out[:, 64:] == 0.0)
    narrow = DeviceBertEncoder(model, tok, dim=32, max_length=32)
    assert narrow.encode_batch(["hello world"]).shape == (1, 32)


def test_ladder_routes_hf_rung_through_device_bert(tmp_path, monkeypatch):
    """BERTContextEncoder with a (stubbed-in) HF model must encode via the
    device tower, not the host torch loop."""
    from ultrafnd_git_tpu.models.text import BERTContextEncoder

    monkeypatch.delenv("ULTRAFND_DISABLE_HF", raising=False)
    monkeypatch.setenv("ULTRAFND_BERT_DEVICE", "1")

    model, _ = _tiny_bert()
    tok = _tiny_tokenizer(tmp_path)

    enc = BERTContextEncoder.__new__(BERTContextEncoder)
    enc.dim = 64
    enc.max_length = 32
    enc.hf_batch_size = 8
    enc._want_device_tower = False
    enc._device_tower = None
    enc._torch, enc.tok, enc.model = torch, tok, model
    enc.use_hf = True
    enc._device_bert = None
    enc._device_bert_tried = False

    out = enc.encode_batch(["hello world", "fake news"])
    assert enc._device_bert is not None  # device rung engaged
    direct = DeviceBertEncoder(model, tok, dim=64, max_length=32)
    np.testing.assert_allclose(
        out, direct.encode_batch(["hello world", "fake news"]), atol=1e-5
    )
