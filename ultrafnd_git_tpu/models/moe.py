"""Mixture-of-Experts FFN with expert parallelism for the text tower.

Capability extension (no reference analogue — the reference's only FFNs
are dense torch MLPs, e.g. `src/models/multimodal_fusion.py`): a
switch-routed (top-1) MoE feed-forward whose experts shard over an `ep`
mesh axis, completing the rebuild's parallelism set (dp/tp/pp/sp/ep).

TPU-native formulation — the Mesh-TensorFlow/GShard dispatch recipe, not
a gather/scatter port:
  * Routing produces a DENSE one-hot dispatch tensor (T, E, C): token t
    -> (expert e, capacity slot c). Everything downstream is einsums —
    static shapes, MXU-friendly, no dynamic gathers, no host control
    flow. Tokens past an expert's capacity C are DROPPED by the one-hot
    itself (their column is all-zero) and pass through the residual,
    the standard switch-transformer behavior.
  * Expert weights are (E, W, hidden)/(E, hidden, W) stacked arrays;
    `expert_parallel_specs()` returns PartitionSpecs placing the E axis
    on `ep`. Under `jit` with those shardings XLA turns the dispatch
    einsum into the expert all_to_all on ICI — the scaling-book recipe
    (annotate shardings, let XLA insert collectives).
  * The router runs in f32 regardless of the compute dtype (bf16 gate
    logits make argmax ties platform-dependent).
  * Aux losses follow Switch Transformer: load-balance loss
    E * sum_e(frac_tokens_e * frac_prob_e) and router z-loss.

`MoEEncoderBlock` is `models/transformer.EncoderBlock` with the dense
MLP swapped for the MoE FFN — attention/LN/residual math identical.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from ultrafnd_git_tpu.models.transformer import MultiHeadAttention


class MoEFFN(nn.Module):
    """Switch (top-1) MoE feed-forward: (..., S, W) -> (..., S, W)."""

    width: int
    num_experts: int = 8
    mlp_ratio: int = 4
    capacity_factor: float = 1.25
    dtype: object = None  # bf16-compute lever (params/router stay f32)
    gelu: str = "tanh"  # see transformer.EncoderBlock.gelu

    @nn.compact
    def __call__(
        self, x: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (output, aux_loss). aux = balance + 1e-3 * z-loss."""
        B, S, W = x.shape
        E = self.num_experts
        T = B * S
        cap = int(max(1, -(-T * self.capacity_factor // E)))  # ceil

        xt = x.reshape(T, W)
        # router in f32: tiny FLOPs, tie-stable argmax
        logits = nn.Dense(E, dtype=jnp.float32, name="router")(
            xt.astype(jnp.float32)
        )  # (T, E)
        probs = jax.nn.softmax(logits, axis=-1)
        expert = jnp.argmax(probs, axis=-1)  # (T,)
        gate = jnp.take_along_axis(probs, expert[:, None], axis=-1)[:, 0]

        onehot_e = jax.nn.one_hot(expert, E, dtype=jnp.float32)  # (T, E)
        # capacity slot = this token's rank among earlier tokens routed
        # to the same expert (cumsum over the static token order)
        pos = jnp.cumsum(onehot_e, axis=0) * onehot_e  # 1-based ranks
        slot = jnp.sum(pos, axis=-1) - 1.0  # (T,)
        keep = slot < cap
        onehot_c = jax.nn.one_hot(
            jnp.where(keep, slot, cap).astype(jnp.int32),
            cap,
            dtype=jnp.float32,
        )  # (T, C) — overflow rows one-hot the dropped bucket...
        # ...which one_hot() zeroes because index==cap is out of range
        dispatch = onehot_e[:, :, None] * onehot_c[:, None, :]  # (T,E,C)
        combine = dispatch * gate[:, None, None]

        cdtype = self.dtype or xt.dtype
        w_in = self.param(
            "w_in",
            nn.initializers.lecun_normal(),
            (E, W, self.mlp_ratio * W),
        )
        b_in = self.param(
            "b_in", nn.initializers.zeros, (E, 1, self.mlp_ratio * W)
        )
        w_out = self.param(
            "w_out",
            nn.initializers.lecun_normal(),
            (E, self.mlp_ratio * W, W),
        )
        b_out = self.param("b_out", nn.initializers.zeros, (E, 1, W))

        xe = jnp.einsum(
            "tec,td->ecd", dispatch.astype(cdtype), xt.astype(cdtype)
        )  # (E, C, W) — under ep-sharded specs this IS the all_to_all
        h = jnp.einsum("ecd,edf->ecf", xe, w_in.astype(cdtype))
        h = nn.gelu(h + b_in.astype(cdtype),
                    approximate=self.gelu != "exact")
        ye = jnp.einsum("ecf,efd->ecd", h, w_out.astype(cdtype))
        ye = ye + b_out.astype(cdtype)
        yt = jnp.einsum(
            "tec,ecd->td", combine.astype(cdtype), ye
        )  # dropped tokens get exact 0 -> pure residual passthrough

        # Switch aux losses (computed in f32 on router quantities)
        frac_tokens = jnp.mean(onehot_e, axis=0)  # (E,)
        frac_probs = jnp.mean(probs, axis=0)  # (E,)
        balance = E * jnp.sum(frac_tokens * frac_probs)
        z = jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2)
        return yt.reshape(B, S, W).astype(x.dtype), balance + 1e-3 * z


class MoEEncoderBlock(nn.Module):
    """EncoderBlock with the dense MLP replaced by MoEFFN.

    Attention/LN/residual structure matches
    `models/transformer.EncoderBlock` exactly; returns (x, aux_loss).
    """

    width: int
    heads: int
    num_experts: int = 8
    mlp_ratio: int = 4
    capacity_factor: float = 1.25
    dropout: float = 0.1
    attention_backend: str = "auto"
    dtype: object = None
    gelu: str = "tanh"  # see transformer.EncoderBlock.gelu

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        h = MultiHeadAttention(
            self.width, self.heads, self.attention_backend,
            dtype=self.dtype, name="attn",
        )(h, mask)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = x + h

        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        y, aux = MoEFFN(
            self.width,
            num_experts=self.num_experts,
            mlp_ratio=self.mlp_ratio,
            capacity_factor=self.capacity_factor,
            dtype=self.dtype,
            gelu=self.gelu,
            name="moe",
        )(h)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return x + y, aux


def expert_parallel_specs(params: dict, axis: str = "ep") -> dict:
    """PartitionSpecs sharding every MoE expert array's E axis on `axis`.

    Leaves named w_in/b_in/w_out/b_out (MoEFFN's expert-stacked arrays —
    the names are unique to it) get P(axis, None, ...); everything else
    replicates (P()). Feed to `jax.device_put`/`jit(..., in_shardings=...)`
    with a NamedSharding over a mesh containing `axis`.
    """
    expert_leaves = {"w_in", "b_in", "w_out", "b_out"}

    def spec_for(path, leaf):
        name = getattr(path[-1], "key", None) if path else None
        if name in expert_leaves:
            return P(axis, *([None] * (leaf.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)
