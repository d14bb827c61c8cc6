"""On-device CLIP text tower with real HuggingFace weights (Flax).

The reference's semantic module runs torch CLIP eagerly on the host CPU
(`src/models/semantic_forgery.py:110-157`, `get_text_features` per batch).
Here the pretrained weights are transferred once into a faithful Flax
reimplementation of the CLIP *text* transformer — pre-LayerNorm residuals,
causal self-attention, quick-GELU, final LayerNorm, EOS-token pooling,
bias-free text projection — so corpus-wide title/OCR encoding runs as a
few jitted TPU forwards, mirroring what `models/bert_flax.py` does for
the BERT rung (VERDICT r1 item 2's pattern, extended to the second HF
tower of the flagship path).

Attention backend: CLIP text sequences are <= 77 tokens; the measured
Pallas crossover is S>=512 (scripts/bench_kernels.py), and the Pallas
kernel's bias input is key-padding-only — causal attention at this length
belongs on the XLA path, so `reference_attention` is used with a combined
causal + padding bias.

Weight transfer (`torch_clip_text_to_flax_params`) is pure array
reshuffling (torch Linear stores (out, in), Flax Dense (in, out)); parity
vs the torch `get_text_features` is asserted in tests/test_clip_flax.py
on a randomly-initialized hermetic CLIPTextModelWithProjection (no
downloads) at fp32 tolerance.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ultrafnd_git_tpu.kernels.flash_attention import (
    NEG_INF,
    reference_attention,
)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """OpenAI CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


_ACTS = {
    "quick_gelu": quick_gelu,
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "gelu_new": lambda x: nn.gelu(x, approximate=True),
}


class ClipTextLayer(nn.Module):
    """One CLIP encoder layer: pre-LN causal attention + pre-LN MLP."""

    width: int
    heads: int
    intermediate: int
    hidden_act: str = "quick_gelu"
    ln_eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
        b, s, _ = x.shape
        d = self.width // self.heads

        h = nn.LayerNorm(epsilon=self.ln_eps, name="ln1")(x)
        q = nn.Dense(self.width, name="q_proj")(h)
        k = nn.Dense(self.width, name="k_proj")(h)
        v = nn.Dense(self.width, name="v_proj")(h)

        def heads_first(t):
            return t.reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)

        ctx = reference_attention(
            heads_first(q), heads_first(k), heads_first(v), bias=bias
        )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, self.width)
        x = x + nn.Dense(self.width, name="out_proj")(ctx)

        h = nn.LayerNorm(epsilon=self.ln_eps, name="ln2")(x)
        h = nn.Dense(self.intermediate, name="fc1")(h)
        h = _ACTS[self.hidden_act](h)
        return x + nn.Dense(self.width, name="fc2")(h)


class ClipTextEncoderFlax(nn.Module):
    """HF-CLIPTextModelWithProjection-shaped tower.

    ids/mask -> (text_features, last_hidden_state); text_features is the
    bias-free projection of the EOS-token hidden state (NOT normalized —
    HF's `get_text_features` isn't either; callers normalize).
    """

    width: int = 512
    depth: int = 12
    heads: int = 8
    intermediate: int = 2048
    vocab_size: int = 49408
    max_positions: int = 77
    proj_dim: int = 512
    hidden_act: str = "quick_gelu"
    ln_eps: float = 1e-5
    eos_token_id: int = 49407
    # HF legacy quirk: checkpoints whose config says eos_token_id == 2
    # (all the original OpenAI CLIP releases) pool at argmax(ids) — the
    # eot token happens to carry the highest vocab id — instead of the
    # first true-EOS position. Must be replicated for weight parity.
    legacy_eos_pooling: bool = False

    @nn.compact
    def __call__(self, ids: jnp.ndarray, mask: jnp.ndarray):
        b, s = ids.shape
        x = nn.Embed(self.vocab_size, self.width, name="token_embedding")(ids)
        x = x + nn.Embed(
            self.max_positions, self.width, name="position_embedding"
        )(jnp.arange(s)[None, :])

        # combined causal + key-padding additive bias: (B, 1, S, S)
        causal = jnp.triu(jnp.full((s, s), NEG_INF, x.dtype), k=1)
        pad = (1.0 - mask.astype(x.dtype)) * NEG_INF  # (B, S)
        bias = causal[None, None] + pad[:, None, None, :]

        for i in range(self.depth):
            x = ClipTextLayer(
                self.width,
                self.heads,
                self.intermediate,
                self.hidden_act,
                self.ln_eps,
                name=f"layer{i}",
            )(x, bias)
        x = nn.LayerNorm(epsilon=self.ln_eps, name="final_ln")(x)

        # EOS pooling: first position where ids == eos_token_id, or the
        # highest-id position on legacy checkpoints (see field docstring)
        if self.legacy_eos_pooling:
            eos_pos = jnp.argmax(ids, axis=-1)  # (B,)
        else:
            is_eos = (ids == self.eos_token_id).astype(jnp.int32)
            eos_pos = jnp.argmax(is_eos, axis=-1)  # (B,)
        pooled = x[jnp.arange(b), eos_pos]  # (B, width)
        feats = nn.Dense(self.proj_dim, use_bias=False, name="text_projection")(
            pooled
        )
        return feats, x


def _dense(sd, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": np.asarray(sd[f"{prefix}.weight"]).T.astype(np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"]).astype(np.float32),
    }


def _ln(sd, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]).astype(np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"]).astype(np.float32),
    }


def torch_clip_text_to_flax_params(state_dict, depth: int) -> Dict:
    """Map torch CLIP text-tower weights onto ClipTextEncoderFlax params.

    Accepts `CLIPModel` keys (`text_model....` + `text_projection.weight`)
    and `CLIPTextModelWithProjection` keys (same layout).
    """
    sd = {}
    for key, tensor in state_dict.items():
        arr = (
            tensor.detach().cpu().numpy()
            if hasattr(tensor, "detach")
            else np.asarray(tensor)
        )
        sd[key[11:] if key.startswith("text_model.") else key] = arr

    params: Dict = {
        "token_embedding": {
            "embedding": sd["embeddings.token_embedding.weight"].astype(
                np.float32
            )
        },
        "position_embedding": {
            "embedding": sd["embeddings.position_embedding.weight"].astype(
                np.float32
            )
        },
        "final_ln": _ln(sd, "final_layer_norm"),
        "text_projection": {
            "kernel": np.asarray(sd["text_projection.weight"]).T.astype(
                np.float32
            )
        },
    }
    for i in range(depth):
        pre = f"encoder.layers.{i}"
        params[f"layer{i}"] = {
            "ln1": _ln(sd, f"{pre}.layer_norm1"),
            "q_proj": _dense(sd, f"{pre}.self_attn.q_proj"),
            "k_proj": _dense(sd, f"{pre}.self_attn.k_proj"),
            "v_proj": _dense(sd, f"{pre}.self_attn.v_proj"),
            "out_proj": _dense(sd, f"{pre}.self_attn.out_proj"),
            "ln2": _ln(sd, f"{pre}.layer_norm2"),
            "fc1": _dense(sd, f"{pre}.mlp.fc1"),
            "fc2": _dense(sd, f"{pre}.mlp.fc2"),
        }
    return params


class DeviceClipTextEncoder:
    """Pretrained CLIP text tower resident on the accelerator.

    Wraps a host HF tokenizer + the transferred-weights Flax tower; the
    `encode_batch` contract matches `SemanticForgeryAnalyzer.encode_text`
    (L2-normalized `get_text_features`, reference
    `src/models/semantic_forgery.py:119-157`).
    """

    def __init__(
        self,
        torch_model,
        tokenizer,
        max_length: int = 64,
        batch_size: int = 256,
    ):
        cfg = torch_model.config
        text_cfg = getattr(cfg, "text_config", cfg)
        self.max_length = int(max_length)
        self.batch_size = int(batch_size)
        self.tok = tokenizer
        self.module = ClipTextEncoderFlax(
            width=text_cfg.hidden_size,
            depth=text_cfg.num_hidden_layers,
            heads=text_cfg.num_attention_heads,
            intermediate=text_cfg.intermediate_size,
            vocab_size=text_cfg.vocab_size,
            max_positions=text_cfg.max_position_embeddings,
            proj_dim=int(getattr(cfg, "projection_dim", 512)),
            hidden_act=str(getattr(text_cfg, "hidden_act", "quick_gelu")),
            ln_eps=float(getattr(text_cfg, "layer_norm_eps", 1e-5)),
            eos_token_id=int(getattr(text_cfg, "eos_token_id", 49407)),
            legacy_eos_pooling=(
                int(getattr(text_cfg, "eos_token_id", 49407)) == 2
            ),
        )
        self.params = jax.device_put(
            torch_clip_text_to_flax_params(
                torch_model.state_dict(), text_cfg.num_hidden_layers
            )
        )

        def features(params, ids, mask):
            feats, _ = self.module.apply({"params": params}, ids, mask)
            return feats

        self._features = jax.jit(features)

    def encode_batch(self, texts: Sequence[str]) -> np.ndarray:
        """(B,) strings -> (B, proj_dim) L2-normalized text features."""
        outs = []
        for s in range(0, len(texts), self.batch_size):
            chunk = [t or "" for t in texts[s : s + self.batch_size]]
            enc = self.tok(
                chunk,
                padding="max_length",  # one jit shape for the whole corpus
                truncation=True,
                max_length=self.max_length,
                return_tensors="np",
            )
            ids = np.asarray(enc["input_ids"], np.int32)
            mask = np.asarray(enc["attention_mask"], np.float32)
            # pad EVERY chunk (first included) to a power-of-two batch
            # bucket: serving featurize() sees arbitrary request counts,
            # and each distinct small first-chunk size would compile a
            # fresh program (tens of seconds over the tunnel)
            from ultrafnd_git_tpu.models.bert_flax import _seq_bucket

            bb = _seq_bucket(ids.shape[0], self.batch_size)
            bpad = bb - ids.shape[0]
            if bpad:
                ids = np.pad(ids, ((0, bpad), (0, 0)))
                mask = np.pad(mask, ((0, bpad), (0, 0)))
            feats = np.asarray(self._features(self.params, ids, mask))
            outs.append(feats[: len(chunk)])
        vecs = (
            np.concatenate(outs, axis=0)
            if outs
            else np.zeros((0, self.module.proj_dim), np.float32)
        )
        norms = np.linalg.norm(vecs, axis=-1, keepdims=True) + 1e-9
        return (vecs / norms).astype(np.float32)
