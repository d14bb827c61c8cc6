"""Pallas fused (flash) attention for the encoder towers.

The reference's attention lives inside HF torch BERT/CLIP towers
(`src/core_blocks/text_blocks.py:69-106`, `src/models/semantic_forgery.py`)
— eager torch ops materializing the (S, S) score matrix in main memory.
SURVEY §5.7 assigns the rebuild a fused flash-attention kernel for these
towers; this is it.

Kernel design (see /opt/skills/guides/pallas_guide.md):
  * grid = (batch*heads, ceil(S / BLOCK_Q)); each program owns one query
    block and the FULL K/V for its (batch, head) — at encoder scale
    (S <= 2048, D <= 128) K/V fit comfortably in VMEM (~1 MB at S=2048,
    D=128 fp32), so scores never touch HBM and no online-softmax pass is
    needed; the (BLOCK_Q, S) score tile lives entirely in registers/VMEM.
  * QK^T and PV are `jnp.dot(..., preferred_element_type=jnp.float32)` —
    both land on the MXU; softmax runs on the VPU between them.
  * additive bias input of shape (B, 1, 1, S) carries the padding mask
    (0 / -1e9), broadcast inside the kernel.
  * custom VJP: the backward pass is closed-form XLA (recompute + three
    matmuls) — at S=256 the bwd is matmul-bound and XLA fuses it well;
    the Pallas win is the fwd, which runs in every cache build and every
    serving call.

`flash_attention(..., backend=...)`: "pallas" (TPU), "interpret"
(debug/CPU tests), "xla" (reference path). Default "auto" picks pallas on
TPU and xla elsewhere.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
NEG_INF = -1e9


def reference_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Plain XLA attention. q,k,v: (B, H, S, D); bias: (B, 1, 1, S)."""
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], q.dtype))
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _make_fwd_kernel(mm_dtype):
    """Build the forward kernel with a given matmul input dtype.

    mm_dtype=bfloat16 (default on TPU): single MXU pass with f32
    accumulation via preferred_element_type — XLA's default f32 path on
    TPU is the 3-pass bf16 decomposition, so this sits in the same
    precision envelope at ~3x the MXU throughput. mm_dtype=float32 gives
    exact-comparison numerics (used by tests). Softmax always runs in f32
    on the VPU.
    """

    def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        q = q_ref[...].astype(mm_dtype)  # (HB, BQ, D)
        k = k_ref[...].astype(mm_dtype)  # (HB, S, D)
        v = v_ref[...].astype(mm_dtype)  # (HB, S, D)
        b = bias_ref[0]  # (1, S), broadcast over heads

        scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
        s = (
            jax.lax.dot_general(
                q, k,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
            + b.astype(jnp.float32)[None]
        )  # (HB, BQ, S)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(mm_dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (HB, BQ, D)
        o_ref[...] = (o / denom).astype(o_ref.dtype)

    return _fwd_kernel


def _pallas_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    block_q: int,
    interpret: bool,
    mm_dtype=jnp.bfloat16,
    block_h: int = 1,
) -> jnp.ndarray:
    batch, heads, seq, dim = q.shape
    bh = batch * heads
    bq = min(block_q, seq)
    if seq % bq:
        # shrink to the largest divisor of seq <= block_q so any sequence
        # length works (a non-divisor block would mis-tile the grid)
        bq = next(c for c in range(bq, 0, -1) if seq % c == 0)
    if block_h == 0:
        # AUTO heads batching: amortize per-program overhead at small S
        # (measured: S=256 goes 0.77x -> ~1.0x of XLA) while keeping each
        # program's q/k/v blocks within a VMEM budget. Largest divisor of
        # `heads` with 3 * hb * S * D * 4B <= 4 MB.
        budget = 4 * 1024 * 1024
        hb = 1
        for cand in range(heads, 0, -1):
            if heads % cand == 0 and 3 * cand * seq * dim * 4 <= budget:
                hb = cand
                break
    else:
        hb = min(block_h, heads)
    if heads % hb:
        raise ValueError(
            f"heads={heads} must be a multiple of block_h={hb} (a heads "
            "block must not straddle batch elements)"
        )

    qf = q.reshape(bh, seq, dim)
    kf = k.reshape(bh, seq, dim)
    vf = v.reshape(bh, seq, dim)
    # (B, 1, 1, S) -> (B, 1, S); kernel indexes it by bh // heads
    bf = bias.reshape(batch, 1, seq)

    grid = (bh // hb, seq // bq)
    heads_blocks = heads // hb  # head-blocks per batch element
    out = pl.pallas_call(
        _make_fwd_kernel(mm_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (hb, bq, dim),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (hb, seq, dim), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (hb, seq, dim), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, seq),
                lambda i, j, hbk=heads_blocks: (i // hbk, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (hb, bq, dim), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, seq, dim), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * seq * seq * dim,
            bytes_accessed=4 * (3 * bh * seq * dim + batch * seq),
            transcendentals=bh * seq * seq,
        ),
        interpret=interpret,
    )(qf, kf, vf, bf)
    return out.reshape(batch, heads, seq, dim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash(q, k, v, bias, block_q, interpret, mm_dtype, block_h):
    return _pallas_forward(
        q, k, v, bias, block_q, interpret, mm_dtype, block_h
    )


def _flash_fwd(q, k, v, bias, block_q, interpret, mm_dtype, block_h):
    out = _pallas_forward(
        q, k, v, bias, block_q, interpret, mm_dtype, block_h
    )
    return out, (q, k, v, bias)


def _flash_bwd(block_q, interpret, mm_dtype, block_h, residuals, g):
    q, k, v, bias = residuals
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale + bias
    p = jax.nn.softmax(s, axis=-1)  # (B, H, Q, K)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g, v)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q) * scale
    dbias = jnp.sum(ds, axis=(1, 2), keepdims=True)  # (B, 1, 1, K)
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        dbias.astype(bias.dtype),  # custom_vjp requires the primal dtype
    )


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    backend: str = "auto",
    mm_dtype=jnp.bfloat16,
    block_h: int = 0,
) -> jnp.ndarray:
    """Fused multi-head attention. q,k,v: (B, H, S, D); bias: (B,1,1,S).

    backend: "auto" | "pallas" | "interpret" | "xla".
    mm_dtype: matmul input dtype inside the kernel (bfloat16 = fast MXU
    path, float32 = exact; softmax is always f32).
    block_h: heads per program (0 = auto VMEM-bounded divisor; with it
    the kernel matches XLA at S=256 and wins 2.24x at S=2048).

    "auto" picks the measured-fastest path (scripts/bench_kernels.py on
    TPU v5 lite): at S>=512 the fused kernel wins because XLA spills the
    (S,S) score matrix to HBM (2.24x at S=2048, B=4, H=12, D=64); at
    short encoder lengths XLA's fusion already keeps scores on-chip and
    wins on dispatch overhead, so small-S stays on XLA.
    """
    if bias is None:
        bias = jnp.zeros((q.shape[0], 1, 1, q.shape[2]), q.dtype)
    if backend == "auto":
        on_tpu = jax.default_backend() == "tpu"
        backend = "pallas" if (on_tpu and q.shape[2] >= 512) else "xla"
    if backend == "xla":
        return reference_attention(q, k, v, bias)
    return _flash(
        q, k, v, bias, block_q, backend == "interpret", mm_dtype, block_h
    )


def padding_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, S) 1/0 validity mask -> additive (B, 1, 1, S) bias."""
    return ((1.0 - mask.astype(dtype)) * NEG_INF)[:, None, None, :]
