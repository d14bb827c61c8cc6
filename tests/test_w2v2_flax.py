"""Parity: Flax Wav2Vec2 with transferred torch weights vs the torch forward.

Hermetic — builds a small randomly-initialized `transformers.Wav2Vec2Model`
(BASE layout, no downloads) and asserts the transferred-weights Flax tower
reproduces `last_hidden_state` at fp32 tolerance, plus the pooled/projected
encode contract of reference `src/core_blocks/audio_blocks.py:111-139`.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from ultrafnd_git_tpu.models.w2v2_flax import (
    DeviceW2V2Encoder,
    Wav2Vec2EncoderFlax,
    torch_w2v2_to_flax_params,
)


def _tiny_w2v2(seed: int = 0):
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    cfg = Wav2Vec2Config(
        vocab_size=32,
        hidden_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=96,
        conv_dim=(24, 24, 24),
        conv_kernel=(10, 3, 3),
        conv_stride=(5, 2, 2),
        conv_bias=False,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        hidden_act="gelu",
        apply_spec_augment=False,
    )
    torch.manual_seed(seed)
    model = Wav2Vec2Model(cfg)
    model.eval()
    return model, cfg


def _flax_module(cfg):
    return Wav2Vec2EncoderFlax(
        width=cfg.hidden_size,
        depth=cfg.num_hidden_layers,
        heads=cfg.num_attention_heads,
        intermediate=cfg.intermediate_size,
        conv_dim=tuple(cfg.conv_dim),
        conv_kernel=tuple(cfg.conv_kernel),
        conv_stride=tuple(cfg.conv_stride),
        conv_bias=bool(cfg.conv_bias),
        pos_conv_kernel=cfg.num_conv_pos_embeddings,
        pos_conv_groups=cfg.num_conv_pos_embedding_groups,
    )


def test_transferred_weights_match_torch_hidden_states():
    model, cfg = _tiny_w2v2()
    rng = np.random.default_rng(0)
    wave = rng.standard_normal((2, 2000)).astype(np.float32)

    with torch.inference_mode():
        ref = model(torch.tensor(wave)).last_hidden_state.numpy()

    module = _flax_module(cfg)
    params = torch_w2v2_to_flax_params(
        model.state_dict(), cfg.num_hidden_layers, len(cfg.conv_dim)
    )
    got = np.asarray(module.apply({"params": params}, jnp.asarray(wave)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_transfer_accepts_wav2vec2_prefixed_state_dict():
    model, cfg = _tiny_w2v2()
    sd = {f"wav2vec2.{k}": v for k, v in model.state_dict().items()}
    params = torch_w2v2_to_flax_params(sd, 2, 3)
    assert params["layer1"]["q_proj"]["kernel"].shape == (48, 48)


def test_legacy_weight_norm_keys_materialize_identically():
    """weight_g/weight_v (old torch) must give the same effective weight
    as the parametrizations keys (new torch)."""
    model, cfg = _tiny_w2v2()
    sd = dict(model.state_dict())
    base = "encoder.pos_conv_embed.conv"
    g_key, v_key = None, None
    for key in list(sd):
        if key.startswith(f"{base}.parametrizations.weight.original0"):
            g_key = key
        if key.startswith(f"{base}.parametrizations.weight.original1"):
            v_key = key
    if g_key is None:
        pytest.skip("torch version stores materialized conv weight")
    legacy = {
        k: v for k, v in sd.items() if not k.startswith(f"{base}.param")
    }
    legacy[f"{base}.weight_g"] = sd[g_key]
    legacy[f"{base}.weight_v"] = sd[v_key]

    p_new = torch_w2v2_to_flax_params(sd, 2, 3)
    p_old = torch_w2v2_to_flax_params(legacy, 2, 3)
    np.testing.assert_allclose(
        p_new["pos_conv"]["kernel"], p_old["pos_conv"]["kernel"], atol=1e-6
    )


def test_device_encoder_matches_torch_pooled_contract():
    """Mean-pooled, seeded-projected features must match the host torch
    rung's recipe (normalize -> forward -> mean-pool -> proj)."""
    model, cfg = _tiny_w2v2()
    rng = np.random.default_rng(1)
    waves = [rng.standard_normal(1600).astype(np.float32) for _ in range(3)]

    enc = DeviceW2V2Encoder(model, dim=16, batch_size=2, proj_seed=0)
    got = enc.encode_batch(waves)
    assert got.shape == (3, 16)

    g = torch.Generator().manual_seed(0)
    w = torch.randn(16, cfg.hidden_size, generator=g) / cfg.hidden_size**0.5
    arr = np.stack(waves)
    mu = arr.mean(axis=-1, keepdims=True)
    std = np.sqrt(arr.var(axis=-1, keepdims=True) + 1e-7)
    with torch.inference_mode():
        hidden = model(torch.tensor((arr - mu) / std)).last_hidden_state
        ref = (hidden.mean(dim=1) @ w.T).numpy()
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_device_encoder_rejects_stable_layer_norm():
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    cfg = Wav2Vec2Config(
        hidden_size=48,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=96,
        conv_dim=(24,),
        conv_kernel=(10,),
        conv_stride=(5,),
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        apply_spec_augment=False,
    )
    model = Wav2Vec2Model(cfg)
    with pytest.raises(ValueError):
        DeviceW2V2Encoder(model, dim=16)
