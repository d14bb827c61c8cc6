"""On-device Wav2Vec2 with real HuggingFace weights (Flax).

The reference's audio HF rung runs torch Wav2Vec2 eagerly on the host CPU,
one waveform at a time (`src/core_blocks/audio_blocks.py:111-139`). Here
the pretrained weights are transferred once into a faithful Flax
reimplementation of the BASE (do_stable_layer_norm=False) architecture —
grouped-norm conv feature extractor, feature projection, weight-normed
positional convolution, post-LayerNorm transformer — so whole batches of
collated 80 k-sample waveforms encode as one jitted TPU forward. Third
tower of the device-residency pattern (BERT: models/bert_flax.py, CLIP:
models/clip_flax.py).

After the x320 conv downsampling a 10 s clip is ~249 tokens, so the
transformer runs at S=256-class lengths where the measured attention
policy picks XLA (`kernels/flash_attention.py` auto; Pallas crossover is
S>=512) — attention goes through `flash_attention(backend="auto")` and
inherits the policy.

Weight transfer (`torch_w2v2_to_flax_params`) is pure array reshuffling;
the weight-normed positional conv is materialized from either modern
`parametrizations.weight.original0/1` or legacy `weight_g/weight_v` keys.
Parity vs the torch forward is asserted in tests/test_w2v2_flax.py on a
randomly-initialized hermetic Wav2Vec2Model (no downloads) at fp32
tolerance.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ultrafnd_git_tpu.kernels.flash_attention import flash_attention


class ConvFeatureExtractor(nn.Module):
    """Stack of strided 1-D convs: raw waveform -> (B, T', conv_dim[-1]).

    BASE layout (feat_extract_norm="group"): layer 0 is conv -> GroupNorm
    (one group per channel) -> GELU; later layers conv -> GELU; no biases.
    """

    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False

    @nn.compact
    def __call__(self, wave: jnp.ndarray) -> jnp.ndarray:
        x = wave[..., None]  # (B, T, 1), feature-last
        for i, (dim, k, s) in enumerate(
            zip(self.conv_dim, self.conv_kernel, self.conv_stride)
        ):
            x = nn.Conv(
                dim,
                kernel_size=(k,),
                strides=(s,),
                padding="VALID",
                use_bias=self.conv_bias,
                name=f"conv{i}",
            )(x)
            if i == 0:
                x = nn.GroupNorm(
                    num_groups=dim, epsilon=1e-5, name="conv0_gn"
                )(x)
            x = nn.gelu(x, approximate=False)
        return x  # (B, T', C)


class W2V2Layer(nn.Module):
    """Post-LN transformer layer (BASE: LN after each residual add)."""

    width: int
    heads: int
    intermediate: int
    ln_eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, s, _ = x.shape
        d = self.width // self.heads
        q = nn.Dense(self.width, name="q_proj")(x)
        k = nn.Dense(self.width, name="k_proj")(x)
        v = nn.Dense(self.width, name="v_proj")(x)

        def heads_first(t):
            return t.reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)

        ctx = flash_attention(
            heads_first(q), heads_first(k), heads_first(v), backend="auto"
        )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, self.width)
        x = x + nn.Dense(self.width, name="out_proj")(ctx)
        x = nn.LayerNorm(epsilon=self.ln_eps, name="attn_ln")(x)

        h = nn.Dense(self.intermediate, name="ffn_in")(x)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(self.width, name="ffn_out")(h)
        return nn.LayerNorm(epsilon=self.ln_eps, name="ffn_ln")(x)


class Wav2Vec2EncoderFlax(nn.Module):
    """HF-Wav2Vec2Model(BASE)-shaped encoder: waveform -> last_hidden_state."""

    width: int = 768
    depth: int = 12
    heads: int = 12
    intermediate: int = 3072
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    ln_eps: float = 1e-5

    @nn.compact
    def __call__(self, wave: jnp.ndarray) -> jnp.ndarray:
        feats = ConvFeatureExtractor(
            self.conv_dim,
            self.conv_kernel,
            self.conv_stride,
            self.conv_bias,
            name="feature_extractor",
        )(wave)

        # feature projection: LN -> Dense(width)
        h = nn.LayerNorm(epsilon=self.ln_eps, name="proj_ln")(feats)
        h = nn.Dense(self.width, name="proj")(h)

        # weight-normed positional conv (weights arrive materialized),
        # SAME-pad 64/64 then drop the trailing step (even kernel)
        pos = nn.Conv(
            self.width,
            kernel_size=(self.pos_conv_kernel,),
            padding=((self.pos_conv_kernel // 2, self.pos_conv_kernel // 2),),
            feature_group_count=self.pos_conv_groups,
            name="pos_conv",
        )(h)
        if self.pos_conv_kernel % 2 == 0:
            pos = pos[:, :-1]
        h = h + nn.gelu(pos, approximate=False)
        h = nn.LayerNorm(epsilon=self.ln_eps, name="encoder_ln")(h)

        for i in range(self.depth):
            h = W2V2Layer(
                self.width,
                self.heads,
                self.intermediate,
                self.ln_eps,
                name=f"layer{i}",
            )(h)
        return h  # (B, T', width)


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


def _conv_kernel_to_flax(w: np.ndarray) -> np.ndarray:
    """torch Conv1d weight (out, in/groups, k) -> flax (k, in/groups, out)."""
    return np.transpose(np.asarray(w), (2, 1, 0)).astype(np.float32)


def _materialize_pos_conv_weight(sd) -> np.ndarray:
    """Effective weight of the weight-normed positional conv.

    torch applies weight_norm(conv, dim=2): per kernel position p,
    weight[:, :, p] = g[:, :, p] * v[:, :, p] / ||v[:, :, p]||_F.
    """
    base = "encoder.pos_conv_embed.conv"
    if f"{base}.weight" in sd:
        return np.asarray(sd[f"{base}.weight"])
    for g_key, v_key in (
        (
            f"{base}.parametrizations.weight.original0",
            f"{base}.parametrizations.weight.original1",
        ),
        (f"{base}.weight_g", f"{base}.weight_v"),
    ):
        if g_key in sd and v_key in sd:
            g = np.asarray(sd[g_key], dtype=np.float64)
            v = np.asarray(sd[v_key], dtype=np.float64)
            norm = np.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
            return (g * v / np.maximum(norm, 1e-12)).astype(np.float32)
    raise KeyError(f"positional-conv weight not found under {base}.*")


def torch_w2v2_to_flax_params(state_dict, depth: int, n_convs: int) -> Dict:
    """Map a torch Wav2Vec2Model (BASE) state_dict onto Wav2Vec2EncoderFlax."""
    sd = {}
    for key, tensor in state_dict.items():
        arr = (
            tensor.detach().cpu().numpy()
            if hasattr(tensor, "detach")
            else np.asarray(tensor)
        )
        sd[key[9:] if key.startswith("wav2vec2.") else key] = arr

    fe: Dict = {}
    for i in range(n_convs):
        pre = f"feature_extractor.conv_layers.{i}"
        conv = {"kernel": _conv_kernel_to_flax(sd[f"{pre}.conv.weight"])}
        if f"{pre}.conv.bias" in sd:
            conv["bias"] = np.asarray(sd[f"{pre}.conv.bias"]).astype(
                np.float32
            )
        fe[f"conv{i}"] = conv
    fe["conv0_gn"] = _ln(sd, "feature_extractor.conv_layers.0.layer_norm")

    params: Dict = {
        "feature_extractor": fe,
        "proj_ln": _ln(sd, "feature_projection.layer_norm"),
        "proj": _dense(sd, "feature_projection.projection"),
        "pos_conv": {
            "kernel": _conv_kernel_to_flax(_materialize_pos_conv_weight(sd)),
            "bias": np.asarray(sd["encoder.pos_conv_embed.conv.bias"]).astype(
                np.float32
            ),
        },
        "encoder_ln": _ln(sd, "encoder.layer_norm"),
    }
    for i in range(depth):
        pre = f"encoder.layers.{i}"
        params[f"layer{i}"] = {
            "q_proj": _dense(sd, f"{pre}.attention.q_proj"),
            "k_proj": _dense(sd, f"{pre}.attention.k_proj"),
            "v_proj": _dense(sd, f"{pre}.attention.v_proj"),
            "out_proj": _dense(sd, f"{pre}.attention.out_proj"),
            "attn_ln": _ln(sd, f"{pre}.layer_norm"),
            "ffn_in": _dense(sd, f"{pre}.feed_forward.intermediate_dense"),
            "ffn_out": _dense(sd, f"{pre}.feed_forward.output_dense"),
            "ffn_ln": _ln(sd, f"{pre}.final_layer_norm"),
        }
    return params


class DeviceW2V2Encoder:
    """Pretrained Wav2Vec2 resident on the accelerator.

    `encode_batch` contract matches `SpectralForensics._w2v2_features`
    (reference `src/core_blocks/audio_blocks.py:111-139`): zero-mean/
    unit-var normalize (the HF processor's do_normalize), mean-pool the
    last hidden state over time, project to `dim` with the same seeded
    linear head the host rung uses.
    """

    def __init__(
        self,
        torch_model,
        dim: int = 128,
        batch_size: int = 16,
        proj_seed: int = 0,
        processor=None,
    ):
        if processor is not None and not bool(
            getattr(
                getattr(processor, "feature_extractor", processor),
                "do_normalize",
                True,
            )
        ):
            raise ValueError(
                "processor has do_normalize=False; this tower hardcodes "
                "the zero-mean/unit-var normalize — keeping the host rung"
            )
        cfg = torch_model.config
        if bool(getattr(cfg, "do_stable_layer_norm", False)):
            raise ValueError(
                "only the BASE (do_stable_layer_norm=False) layout is "
                "supported on-device; LARGE checkpoints keep the host rung"
            )
        # Guard every config knob this tower hardcodes — a mismatch must
        # raise here so SpectralForensics falls back to the host torch
        # rung, not silently diverge from it.
        for field in ("hidden_act", "feat_extract_activation"):
            act = str(getattr(cfg, field, "gelu"))
            if act != "gelu":
                raise ValueError(
                    f"{field}={act!r} is not the exact-gelu this tower "
                    "implements; keeping the host rung"
                )
        self.dim = int(dim)
        self.batch_size = int(batch_size)
        self.module = Wav2Vec2EncoderFlax(
            width=cfg.hidden_size,
            depth=cfg.num_hidden_layers,
            heads=cfg.num_attention_heads,
            intermediate=cfg.intermediate_size,
            conv_dim=tuple(cfg.conv_dim),
            conv_kernel=tuple(cfg.conv_kernel),
            conv_stride=tuple(cfg.conv_stride),
            conv_bias=bool(cfg.conv_bias),
            pos_conv_kernel=int(cfg.num_conv_pos_embeddings),
            pos_conv_groups=int(cfg.num_conv_pos_embedding_groups),
            ln_eps=float(getattr(cfg, "layer_norm_eps", 1e-5)),
        )
        self.params = jax.device_put(
            torch_w2v2_to_flax_params(
                torch_model.state_dict(),
                cfg.num_hidden_layers,
                len(cfg.conv_dim),
            )
        )
        hidden = int(cfg.hidden_size)
        if hidden != self.dim:
            # same seeded projection recipe as the host torch rung
            # (audio.py: torch.randn(dim, hidden, generator=seed0)/sqrt(H))
            import torch as _torch

            g = _torch.Generator().manual_seed(proj_seed)
            w = (
                _torch.randn(self.dim, hidden, generator=g) / hidden**0.5
            ).numpy()
            self._proj_w = jnp.asarray(w.T)  # (hidden, dim)
        else:
            self._proj_w = None

        def pooled(params, wave):
            # HF processor do_normalize: per-sample zero-mean unit-var
            mu = wave.mean(axis=-1, keepdims=True)
            var = wave.var(axis=-1, keepdims=True)
            wave = (wave - mu) / jnp.sqrt(var + 1e-7)
            h = self.module.apply({"params": params}, wave)
            rep = h.mean(axis=1)
            if self._proj_w is not None:
                rep = rep @ self._proj_w
            return rep

        self._pooled = jax.jit(pooled)

    def encode_batch(self, waves: Sequence[np.ndarray]) -> np.ndarray:
        """Equal-length mono 16 kHz waveforms -> (B, dim) features."""
        arr = np.stack([np.asarray(w, np.float32).ravel() for w in waves])
        outs = []
        for s in range(0, arr.shape[0], self.batch_size):
            chunk = arr[s : s + self.batch_size]
            valid = chunk.shape[0]
            # pad EVERY ragged chunk (first included) up to a power-of-two
            # batch bucket — a fresh (batch, 80000) conv compile over the
            # tunnel is tens of seconds, and serving featurize() sees
            # arbitrary request counts, so each distinct small first-chunk
            # size would otherwise compile its own program
            from ultrafnd_git_tpu.models.bert_flax import _seq_bucket

            bb = _seq_bucket(valid, self.batch_size)
            if bb > valid:
                chunk = np.pad(chunk, ((0, bb - valid), (0, 0)))
            outs.append(
                np.asarray(self._pooled(self.params, chunk))[:valid]
            )
        return np.concatenate(outs, axis=0).astype(np.float32)
