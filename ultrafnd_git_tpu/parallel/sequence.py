"""Sequence parallelism (ring attention) for the transformer text tower.

SURVEY §5.7 puts long-context support on the rebuild's plate; the
reference caps context at 256 BERT tokens on one device
(`src/core_blocks/text_blocks.py:40`) and has no sequence-sharding story
at all. Round 2 reserved an `sp` mesh axis as an `extra_axes` hook
(`parallel/mesh.py: make_mesh`); this module makes the axis real, the
same way `parallel/pipeline.py` made `pipe` real.

Design — ring attention (the TPU-native long-context recipe):
  * Activations are sharded on the SEQUENCE axis: each of the N devices
    on `sp` holds an (B, L/N, width) slice. Everything pointwise over
    positions — embedding lookup, LayerNorm, the QKV/out projections,
    the MLP — runs locally on the slice with zero communication.
  * Attention is the one position-mixing op. Each device computes its
    local Q block's attention against ALL keys/values by rotating the
    local K/V (+ their padding bias) around the ring with
    `lax.ppermute` — N-1 neighbor hops that XLA lowers to ICI
    transfers — while accumulating the softmax ONLINE (running max m,
    running denominator l, running numerator acc), exactly the
    flash-attention recurrence. Peak memory per device is
    O(L/N · L/N) scores + O(L/N) K/V — the full (L, L) score matrix
    never exists anywhere, so context length scales linearly with the
    ring size.
  * The rotation loop is a static Python unroll over the N ring steps:
    on this hardware `lax.scan` bodies compile ~6x slower than unrolled
    equivalents for small trip counts (measured, BASELINE.md round-2
    notes), and N is a mesh-axis size (2-8), not a data size.
  * Pooling at the tail is a masked sum per slice + one `psum` pair
    (numerator and denominator) — the pooled (B, width) output comes
    back replicated.

Exactness: the online-softmax recurrence is algebraically identical to
one-shot softmax; reassociation differences land at f32 rounding
(~1e-6), asserted against the plain tower by `tests/test_sequence.py`.
Gradients flow through `ppermute` and the recurrence (pure jnp ops), so
the SP tower is trainable, not inference-only.

Composability: `sp` is orthogonal to `data`/`model`/`pipe` — a
(dp, sp) mesh sequence-shards each data replica's tower. Reference
parity target: none (capability extension; see PARITY.md).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INIT = -1e30  # running-max seed: finite so exp(m - new_m) is exact 0


def _ring_attention_local(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    axis: str,
) -> jnp.ndarray:
    """Ring attention body — call INSIDE shard_map over `axis`.

    q, k, v: (B, H, S_loc, D) local sequence slices; bias:
    (B, 1, 1, S_loc) additive padding bias for the local KEY slice
    (travels around the ring with k/v). Returns the local (B, H, S_loc,
    D) attention output. Softmax accumulates in f32 regardless of input
    dtype (the flash recurrence).
    """
    n = jax.lax.axis_size(axis)
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    qf = q.astype(jnp.float32)

    b, h, s_loc, d = q.shape
    m = jnp.full((b, h, s_loc, 1), NEG_INIT, jnp.float32)
    l = jnp.zeros((b, h, s_loc, 1), jnp.float32)
    acc = jnp.zeros((b, h, s_loc, d), jnp.float32)
    perm = [(i, (i + 1) % n) for i in range(n)]

    for _ in range(n):  # static unroll: n is the mesh-axis size
        s = (
            jnp.einsum(
                "bhqd,bhkd->bhqk", qf, k.astype(jnp.float32)
            )
            * scale
            + bias.astype(jnp.float32)
        )  # (B, H, S_loc, S_loc)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        acc = acc * corr + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v.astype(jnp.float32)
        )
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        m = m_new
        k = jax.lax.ppermute(k, axis, perm)
        v = jax.lax.ppermute(v, axis, perm)
        bias = jax.lax.ppermute(bias, axis, perm)

    return (acc / l).astype(q.dtype)


def sequence_parallel_tower_apply(
    tower,
    params: Dict[str, Any],
    ids: jnp.ndarray,
    mask: jnp.ndarray,
    mesh: Mesh,
    axis: str = "sp",
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """TextTransformer forward with the SEQUENCE axis sharded over
    `mesh[axis]` and attention run as a ring.

    Output contract identical to `tower.__call__` in deterministic mode:
    mean-pooled masked hidden state, L2-normalized, (B, width),
    replicated over the axis. `ids.shape[1]` must be divisible by the
    axis size. Params stay replicated (the regime this targets is
    long-L activations, not big params — compose with 'pipe'/'model'
    for the latter).

    `batch_axis` composes SP with data parallelism on the SAME mesh:
    the batch dim of ids/mask/output shards over it (e.g. "data"), so a
    (data, sp) mesh sequence-shards each data replica's slice instead of
    redundantly recomputing the full batch per data group. The ring and
    the pooling psum stay scoped to `axis` alone. This is how the
    trainer's `--sp` runs (ForensicTrainer._forward).
    """
    from flax import linen as nn

    n = mesh.shape[axis]
    B, L = ids.shape
    if L % n:
        raise ValueError(f"seq len {L} not divisible by sp={n}")
    W, H = tower.width, tower.heads
    d = W // H

    embed = nn.Embed(tower.vocab_size, W, dtype=tower.dtype)
    ln_embed = nn.LayerNorm(dtype=tower.dtype)
    ln = nn.LayerNorm(dtype=tower.dtype)
    dense = lambda feats: nn.Dense(feats, dtype=tower.dtype)  # noqa: E731
    ln_final = nn.LayerNorm()  # f32 tail, like the tower

    pos = params["pos_embed"][:, :L]  # (1, L, W), sharded on L below

    def tower_fn(p, ids_loc, mask_loc, pos_loc):
        b_loc = ids_loc.shape[0]  # LOCAL batch (global/dp when batch_axis)
        # embedding + positional + LN: pointwise over positions
        x = embed.apply({"params": p["tok_embed"]}, ids_loc)
        x = x + pos_loc.astype(x.dtype)
        x = ln_embed.apply({"params": p["ln_embed"]}, x)

        kbias = (
            (1.0 - mask_loc.astype(jnp.float32)) * -1e9
        )[:, None, None, :]  # local-KEY padding bias, rides the ring

        for i in range(tower.depth):
            bp = p[f"block{i}"]
            h = ln.apply({"params": bp["ln1"]}, x)
            qkv = dense(3 * W).apply({"params": bp["attn"]["qkv"]}, h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            hf = lambda t: t.reshape(  # noqa: E731
                b_loc, -1, H, d
            ).transpose(0, 2, 1, 3)
            o = _ring_attention_local(hf(q), hf(k), hf(v), kbias, axis)
            o = o.transpose(0, 2, 1, 3).reshape(b_loc, -1, W)
            o = dense(W).apply({"params": bp["attn"]["out"]}, o)
            x = x + o

            h = ln.apply({"params": bp["ln2"]}, x)
            # EncoderBlock's mlp_ratio (the tower always builds default 4)
            h = dense(getattr(tower, "mlp_ratio", 4) * W).apply(
                {"params": bp["mlp_in"]}, h
            )
            h = nn.gelu(h, approximate=tower.gelu != "exact")
            h = dense(W).apply({"params": bp["mlp_out"]}, h)
            x = x + h

        x = ln_final.apply({"params": p["ln_final"]}, x)
        w = mask_loc[..., None]
        num = jax.lax.psum(jnp.sum(x * w, axis=1), axis)
        den = jax.lax.psum(jnp.sum(w, axis=1), axis)
        pooled = num / jnp.maximum(den, 1.0)
        return pooled / (
            jnp.linalg.norm(pooled, axis=-1, keepdims=True) + 1e-9
        )

    ba = batch_axis
    sp_tower = shard_map(
        tower_fn,
        mesh=mesh,
        in_specs=(P(), P(ba, axis), P(ba, axis), P(None, axis, None)),
        out_specs=P(ba),
    )
    return sp_tower(params, ids, mask, pos)
