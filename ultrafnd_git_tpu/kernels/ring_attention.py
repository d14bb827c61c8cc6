"""Ring attention core — the sequence-parallel attention recurrence.

This is the one position-mixing op of the sequence-sharded tower
(parallel/sequence.py): each device on the ring holds a local
(B, H, S/N, D) Q/K/V slice, computes its Q block's attention against ALL
keys/values by rotating the local K/V (+ their padding bias) around the
ring with `lax.ppermute` — N-1 neighbor hops that XLA lowers to ICI
transfers — while accumulating the softmax ONLINE (running max m, running
denominator l, running numerator acc), exactly the flash-attention
recurrence. Peak memory per device is O(S/N · S/N) scores + O(S/N) K/V —
the full (S, S) score matrix never exists anywhere, so context length
scales linearly with the ring size.

Lives in kernels/ (next to the Pallas flash kernel it is the multi-chip
analogue of) so `models/transformer.MultiHeadAttention` can select it as
an attention backend (`"ring:<axis>"`) without importing the parallel
package — which imports transformer back (EncoderBlock reuse).

The rotation loop is a static Python unroll over the N ring steps: on
this hardware `lax.scan` bodies compile ~6x slower than unrolled
equivalents for small trip counts (measured, BASELINE.md round-2 notes),
and N is a mesh-axis size (2-8), not a data size.

Exactness: the online-softmax recurrence is algebraically identical to
one-shot softmax; reassociation differences land at f32 rounding (~1e-6),
asserted against the plain tower by `tests/test_sequence.py`. Gradients
flow through `ppermute` and the recurrence (pure jnp ops).

Reference parity target: none — the reference caps context at 256 tokens
on one device (`src/core_blocks/text_blocks.py:40`) and has no sequence
sharding story (SURVEY §5.7).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INIT = -1e30  # running-max seed: finite so exp(m - new_m) is exact 0


def ring_attention_local(
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

    for step in range(n):  # static unroll: n is the mesh-axis size
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
        if step < n - 1:  # N-1 hops: the last rotation would only
            # return K/V/bias to their owners, unused — and collectives
            # are not reliably dead-code-eliminated once lowered
            k = jax.lax.ppermute(k, axis, perm)
            v = jax.lax.ppermute(v, axis, perm)
            bias = jax.lax.ppermute(bias, axis, perm)

    return (acc / l).astype(q.dtype)
