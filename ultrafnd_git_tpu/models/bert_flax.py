"""On-device BERT with real HuggingFace weights (Flax + Pallas attention).

The reference's HF rung runs torch BERT eagerly on the host CPU
(`src/core_blocks/text_blocks.py:69-106`). Here the same pretrained
weights are transferred once into a faithful Flax reimplementation of the
BERT encoder — post-LayerNorm residuals, learned position + token-type
embeddings, exact (erf) GELU, eps 1e-12 — whose attention runs through
`kernels/flash_attention.py`, so the whole corpus encode is a handful of
jitted TPU forwards instead of per-batch host matmuls.

Weight transfer (`torch_bert_to_flax_params`) is pure array reshuffling:
torch `nn.Linear` stores (out, in), Flax `nn.Dense` stores (in, out), and
every submodule below is named so the mapping is one dict comprehension
away from the torch `state_dict()` keys. Parity vs the torch forward is
asserted in tests/test_bert_flax.py on a randomly-initialized hermetic
BertModel (no downloads) at fp32 tolerance.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ultrafnd_git_tpu.kernels.flash_attention import (
    flash_attention,
    padding_bias,
)


class BertLayer(nn.Module):
    """One HF-BERT encoder layer: post-LN self-attention + post-LN FFN."""

    width: int
    heads: int
    intermediate: int
    ln_eps: float = 1e-12
    attention_backend: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        b, s, _ = x.shape
        d = self.width // self.heads
        q = nn.Dense(self.width, name="query")(x)
        k = nn.Dense(self.width, name="key")(x)
        v = nn.Dense(self.width, name="value")(x)

        def heads_first(t):
            return t.reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)

        ctx = flash_attention(
            heads_first(q),
            heads_first(k),
            heads_first(v),
            bias=padding_bias(mask, x.dtype),
            backend=self.attention_backend,
        )  # (B, H, S, D)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, self.width)
        ctx = nn.Dense(self.width, name="attn_out")(ctx)
        x = nn.LayerNorm(epsilon=self.ln_eps, name="attn_ln")(x + ctx)

        h = nn.Dense(self.intermediate, name="ffn_in")(x)
        h = nn.gelu(h, approximate=False)  # HF "gelu" = exact erf form
        h = nn.Dense(self.width, name="ffn_out")(h)
        return nn.LayerNorm(epsilon=self.ln_eps, name="ffn_ln")(x + h)


class BertEncoderFlax(nn.Module):
    """HF-BertModel-shaped encoder: ids/mask -> last_hidden_state."""

    width: int = 768
    depth: int = 12
    heads: int = 12
    intermediate: int = 3072
    vocab_size: int = 30522
    max_positions: int = 512
    type_vocab: int = 2
    ln_eps: float = 1e-12
    attention_backend: str = "auto"

    @nn.compact
    def __call__(
        self,
        ids: jnp.ndarray,
        mask: jnp.ndarray,
        type_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if type_ids is None:
            type_ids = jnp.zeros_like(ids)
        x = nn.Embed(self.vocab_size, self.width, name="word_embeddings")(ids)
        pos = nn.Embed(
            self.max_positions, self.width, name="position_embeddings"
        )(jnp.arange(ids.shape[1])[None, :])
        typ = nn.Embed(
            self.type_vocab, self.width, name="token_type_embeddings"
        )(type_ids)
        x = nn.LayerNorm(epsilon=self.ln_eps, name="embed_ln")(x + pos + typ)
        for i in range(self.depth):
            x = BertLayer(
                self.width,
                self.heads,
                self.intermediate,
                self.ln_eps,
                self.attention_backend,
                name=f"layer{i}",
            )(x, mask)
        return x


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


def torch_bert_to_flax_params(state_dict, depth: int) -> Dict:
    """Map a torch BertModel state_dict onto BertEncoderFlax params.

    Accepts both bare `BertModel` keys (`embeddings....`) and
    task-model keys with a `bert.` prefix.
    """
    sd = {}
    for key, tensor in state_dict.items():
        sd[key[5:] if key.startswith("bert.") else key] = (
            tensor.detach().cpu().numpy()
            if hasattr(tensor, "detach")
            else np.asarray(tensor)
        )

    params: Dict = {
        "word_embeddings": {
            "embedding": sd["embeddings.word_embeddings.weight"].astype(
                np.float32
            )
        },
        "position_embeddings": {
            "embedding": sd["embeddings.position_embeddings.weight"].astype(
                np.float32
            )
        },
        "token_type_embeddings": {
            "embedding": sd["embeddings.token_type_embeddings.weight"].astype(
                np.float32
            )
        },
        "embed_ln": _ln(sd, "embeddings.LayerNorm"),
    }
    for i in range(depth):
        pre = f"encoder.layer.{i}"
        params[f"layer{i}"] = {
            "query": _dense(sd, f"{pre}.attention.self.query"),
            "key": _dense(sd, f"{pre}.attention.self.key"),
            "value": _dense(sd, f"{pre}.attention.self.value"),
            "attn_out": _dense(sd, f"{pre}.attention.output.dense"),
            "attn_ln": _ln(sd, f"{pre}.attention.output.LayerNorm"),
            "ffn_in": _dense(sd, f"{pre}.intermediate.dense"),
            "ffn_out": _dense(sd, f"{pre}.output.dense"),
            "ffn_ln": _ln(sd, f"{pre}.output.LayerNorm"),
        }
    return params


def _seq_bucket(n: int, max_length: int) -> int:
    """Power-of-two padding bucket so jit shapes are reused, not retraced."""
    b = 32
    while b < n:
        b *= 2
    return min(b, max_length)


class DeviceBertEncoder:
    """Pretrained-BERT corpus encoder resident on the accelerator.

    Wraps a host HF tokenizer + the transferred-weights Flax tower. The
    `encode_batch` contract matches `BERTContextEncoder._hf_encode_batch`:
    mean-pooled-with-mask last hidden state, L2-normalized, width `dim`
    (reference `src/core_blocks/text_blocks.py:69-106`).

    On TPU the attention runs the Pallas fused kernel (heads-batched
    programs reach XLA parity at S=256, scripts/bench_kernels.py); off-TPU
    it uses the XLA path — "interpret" pallas would be slower than torch.
    """

    def __init__(
        self,
        torch_model,
        tokenizer,
        dim: int = 768,
        max_length: int = 256,
        batch_size: int = 256,
        attention_backend: Optional[str] = None,
    ):
        cfg = torch_model.config
        if attention_backend is None:
            attention_backend = (
                "pallas" if jax.default_backend() == "tpu" else "xla"
            )
        self.dim = int(dim)
        self.max_length = int(max_length)
        self.batch_size = int(batch_size)
        self.tok = tokenizer
        self.module = BertEncoderFlax(
            width=cfg.hidden_size,
            depth=cfg.num_hidden_layers,
            heads=cfg.num_attention_heads,
            intermediate=cfg.intermediate_size,
            vocab_size=cfg.vocab_size,
            max_positions=cfg.max_position_embeddings,
            type_vocab=cfg.type_vocab_size,
            ln_eps=float(getattr(cfg, "layer_norm_eps", 1e-12)),
            attention_backend=attention_backend,
        )
        self.params = jax.device_put(
            torch_bert_to_flax_params(
                torch_model.state_dict(), cfg.num_hidden_layers
            )
        )

        def pooled(params, ids, mask):
            hidden = self.module.apply({"params": params}, ids, mask)
            m = mask[..., None].astype(hidden.dtype)
            rep = (hidden * m).sum(axis=1) / jnp.maximum(
                m.sum(axis=1), 1e-6
            )
            return rep

        self._pooled = jax.jit(pooled)

    def encode_batch(self, texts: Sequence[str]) -> np.ndarray:
        outs = []
        for s in range(0, len(texts), self.batch_size):
            chunk = list(texts[s : s + self.batch_size])
            enc = self.tok(
                chunk,
                padding=True,
                truncation=True,
                max_length=self.max_length,
                return_tensors="np",
            )
            ids = np.asarray(enc["input_ids"], np.int32)
            mask = np.asarray(enc["attention_mask"], np.float32)
            # pad (batch, seq) up to reusable jit buckets
            sb = _seq_bucket(ids.shape[1], self.max_length)
            bb = _seq_bucket(ids.shape[0], self.batch_size)
            ids = np.pad(
                ids, ((0, bb - ids.shape[0]), (0, sb - ids.shape[1]))
            )
            mask = np.pad(
                mask, ((0, bb - mask.shape[0]), (0, sb - mask.shape[1]))
            )
            rep = np.asarray(self._pooled(self.params, ids, mask))
            outs.append(rep[: len(chunk)])
        vecs = np.concatenate(outs, axis=0) if outs else np.zeros(
            (0, self.dim), np.float32
        )
        if vecs.shape[-1] > self.dim:
            vecs = vecs[..., : self.dim]
        elif vecs.shape[-1] < self.dim:
            vecs = np.pad(vecs, ((0, 0), (0, self.dim - vecs.shape[-1])))
        norms = np.linalg.norm(vecs, axis=-1, keepdims=True)
        return (vecs / (norms + 1e-9)).astype(np.float32)
