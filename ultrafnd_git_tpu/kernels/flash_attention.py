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
  * custom VJP with TWO backward paths:
      - "pallas" (default whenever the pallas forward runs): the forward
        also emits the per-row logsumexp; the backward is two Pallas
        kernels — a dQ pass gridded over query blocks and a dK/dV pass
        gridded over key blocks — each recomputing its probability tile
        from (q, k, lse) in VMEM, so no (S, S) matrix ever reaches HBM.
        The XLA closed-form backward materializes three (B, H, S, S)
        tensors (s, p, dp); at the tower's production shape
        (B=256, H=12, S=512) that is ~9.6 GB of temporary HBM, which is
        exactly the regime the flash construction exists for.
      - "xla" closed-form (recompute + three einsums): kept for A/B and
        for the small-S regime where XLA fuses it on-chip anyway.
    delta = rowsum(dO * O) and the final dbias reduction run as plain
    XLA ops (elementwise / small reductions — nothing to fuse by hand).

`flash_attention(..., backend=...)`: "pallas" (TPU), "interpret"
(debug/CPU tests), "xla" (reference path). Default "auto" picks pallas on
TPU and xla elsewhere. `bwd=` picks the backward path ("auto" follows the
forward choice).
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

    Besides the attention output the kernel writes the per-row logsumexp
    (lse = m + log(sum exp(s - m))) — the only residual the flash
    backward needs beyond the primal inputs and output.
    """

    def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref):
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
        # (HB, BQ, 1): trailing singleton keeps the TPU block tiling legal
        lse_ref[...] = m + jnp.log(denom)

    return _fwd_kernel


def _auto_block_h(heads: int, seq: int, dim: int, budget_bytes: int) -> int:
    """Largest divisor of `heads` whose per-program q/k/v footprint fits."""
    for cand in range(heads, 0, -1):
        if heads % cand == 0 and 3 * cand * seq * dim * 4 <= budget_bytes:
            return cand
    return 1


def _pallas_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    block_q: int,
    interpret: bool,
    mm_dtype=jnp.bfloat16,
    block_h: int = 1,
):
    """Returns (out (B,H,S,D), lse (B,H,S) float32)."""
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
        hb = _auto_block_h(heads, seq, dim, 4 * 1024 * 1024)
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
    out, lse = pl.pallas_call(
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
        out_specs=[
            pl.BlockSpec(
                (hb, bq, dim), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (hb, bq, 1), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, seq, dim), q.dtype),
            jax.ShapeDtypeStruct((bh, seq, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * seq * seq * dim,
            bytes_accessed=4 * (3 * bh * seq * dim + batch * seq),
            transcendentals=bh * seq * seq,
        ),
        interpret=interpret,
    )(qf, kf, vf, bf)
    return (
        out.reshape(batch, heads, seq, dim),
        lse.reshape(batch, heads, seq),  # drop the tiling singleton
    )


def _make_bwd_dq_kernel(mm_dtype):
    """dQ pass: one program per (head-block, query-block).

    Holds full K/V for its heads; recomputes its (BQ, S) probability tile
    from (q, k, lse); emits dq and a per-program partial of
    sum_{heads,q} ds (the dbias integrand, reduced outside).
    """

    def _kernel(
        q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
        dq_ref, dbp_ref,
    ):
        q = q_ref[...].astype(mm_dtype)  # (HB, BQ, D)
        k = k_ref[...].astype(mm_dtype)  # (HB, S, D)
        v = v_ref[...].astype(mm_dtype)  # (HB, S, D)
        do = do_ref[...].astype(mm_dtype)  # (HB, BQ, D)
        b = bias_ref[0].astype(jnp.float32)  # (1, S)
        lse = lse_ref[...]  # (HB, BQ, 1) f32
        delta = delta_ref[...]  # (HB, BQ, 1) f32

        scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
        s = (
            jax.lax.dot_general(
                q, k,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
            + b[None]
        )  # (HB, BQ, S)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (HB, BQ, S)
        ds = p * (dp - delta)  # f32
        dq = (
            jax.lax.dot_general(
                ds.astype(mm_dtype), k,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        dq_ref[...] = dq.astype(dq_ref.dtype)
        # (1, 1, 1, S) partial of the dbias integrand
        dbp_ref[...] = jnp.sum(ds, axis=(0, 1))[None, None, None]

    return _kernel


def _make_bwd_dkv_kernel(mm_dtype, bk):
    """dK/dV pass: one program per (head-block, key-block).

    Holds full Q/dO for its heads; recomputes the transposed (BK, S)
    probability tile and emits dk, dv for its key block. The bias ref is
    the FULL (1, 1, S) row (blocking it on the key axis would put BK in
    the last tile dim, which TPU only allows at multiples of 128); the
    kernel slices its BK window with pl.dslice.
    """

    def _kernel(
        k_ref, v_ref, q_ref, do_ref, bias_ref, lse_ref, delta_ref,
        dk_ref, dv_ref,
    ):
        k = k_ref[...].astype(mm_dtype)  # (HB, BK, D)
        v = v_ref[...].astype(mm_dtype)  # (HB, BK, D)
        q = q_ref[...].astype(mm_dtype)  # (HB, S, D)
        do = do_ref[...].astype(mm_dtype)  # (HB, S, D)
        j = pl.program_id(1)
        b = bias_ref[0, 0, pl.dslice(j * bk, bk)].astype(
            jnp.float32
        )  # (BK,)
        lse = lse_ref[..., 0]  # (HB, S) f32
        delta = delta_ref[..., 0]  # (HB, S) f32

        scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
        st = (
            jax.lax.dot_general(
                k, q,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
            + b[None, :, None]
        )  # (HB, BK, S) — transposed scores
        pt = jnp.exp(st - lse[:, None, :])
        dv = jax.lax.dot_general(
            pt.astype(mm_dtype), do,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (HB, BK, D)
        dpt = jax.lax.dot_general(
            v, do,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (HB, BK, S)
        dst = pt * (dpt - delta[:, None, :])
        dk = (
            jax.lax.dot_general(
                dst.astype(mm_dtype), q,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        dk_ref[...] = dk.astype(dk_ref.dtype)
        dv_ref[...] = dv.astype(dv_ref.dtype)

    return _kernel


def _pallas_backward(
    q, k, v, bias, o, lse, g, block_q, interpret, mm_dtype, block_h
):
    batch, heads, seq, dim = q.shape
    bh = batch * heads
    bq = min(block_q, seq)
    if seq % bq:
        bq = next(c for c in range(bq, 0, -1) if seq % c == 0)
    if block_h == 0:
        # the bwd programs hold 4 (hb, S, D) operands plus ~3 (hb, BQ, S)
        # f32 tiles — budget tighter than the forward's
        hb = _auto_block_h(heads, seq, dim, 2 * 1024 * 1024)
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
    gf = g.reshape(bh, seq, dim)
    bf = bias.reshape(batch, 1, seq)
    # trailing singleton keeps (.., bq, 1) / (.., seq, 1) blocks legal
    # under the TPU (8, 128)-or-equal tiling rule
    lsef = lse.reshape(bh, seq, 1)
    # delta_i = dO_i . O_i — tiny elementwise+reduce, stays in XLA
    delta = jnp.sum(
        g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    ).reshape(bh, seq, 1)

    heads_blocks = heads // hb
    grid = (bh // hb, seq // bq)

    row_spec = pl.BlockSpec(
        (hb, bq, dim), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    full_spec = pl.BlockSpec(
        (hb, seq, dim), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    stat_blk_spec = pl.BlockSpec(
        (hb, bq, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    stat_full_spec = pl.BlockSpec(
        (hb, seq, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    bias_full_spec = pl.BlockSpec(
        (1, 1, seq),
        lambda i, j, hbk=heads_blocks: (i // hbk, 0, 0),
        memory_space=pltpu.VMEM,
    )

    dq, dbias_part = pl.pallas_call(
        _make_bwd_dq_kernel(mm_dtype),
        grid=grid,
        in_specs=[
            row_spec,  # q block
            full_spec,  # k
            full_spec,  # v
            bias_full_spec,
            row_spec,  # dO block
            stat_blk_spec,  # lse block
            stat_blk_spec,  # delta block
        ],
        out_specs=[
            row_spec,
            pl.BlockSpec(
                (1, 1, 1, seq), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, seq, dim), q.dtype),
            jax.ShapeDtypeStruct(
                (bh // hb, seq // bq, 1, seq), jnp.float32
            ),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * seq * seq * dim,
            bytes_accessed=4 * (5 * bh * seq * dim + batch * seq),
            transcendentals=bh * seq * seq,
        ),
        interpret=interpret,
    )(qf, kf, vf, bf, gf, lsef, delta)

    dk, dv = pl.pallas_call(
        _make_bwd_dkv_kernel(mm_dtype, bq),
        grid=grid,
        in_specs=[
            row_spec,  # k block
            row_spec,  # v block
            full_spec,  # q
            full_spec,  # dO
            bias_full_spec,  # full bias row; kernel slices its BK window
            stat_full_spec,  # lse
            stat_full_spec,  # delta
        ],
        out_specs=[row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, seq, dim), k.dtype),
            jax.ShapeDtypeStruct((bh, seq, dim), v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * seq * seq * dim,
            bytes_accessed=4 * (6 * bh * seq * dim + batch * seq),
            transcendentals=bh * seq * seq,
        ),
        interpret=interpret,
    )(kf, vf, qf, gf, bf, lsef, delta)

    # dbias: sum ds over heads and query rows -> (B, 1, 1, S)
    dbias = (
        dbias_part.reshape(batch, heads_blocks, seq // bq, seq)
        .sum(axis=(1, 2))[:, None, None, :]
    )  # dbias_part's singleton tiling axis folds into the reshape
    return (
        dq.reshape(batch, heads, seq, dim),
        dk.reshape(batch, heads, seq, dim),
        dv.reshape(batch, heads, seq, dim),
        dbias.astype(bias.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(q, k, v, bias, block_q, interpret, mm_dtype, block_h, bwd):
    out, _ = _pallas_forward(
        q, k, v, bias, block_q, interpret, mm_dtype, block_h
    )
    return out


def _flash_fwd(q, k, v, bias, block_q, interpret, mm_dtype, block_h, bwd):
    out, lse = _pallas_forward(
        q, k, v, bias, block_q, interpret, mm_dtype, block_h
    )
    if bwd == "xla":
        return out, (q, k, v, bias, None, None)
    return out, (q, k, v, bias, out, lse)


def _flash_bwd(
    block_q, interpret, mm_dtype, block_h, bwd, residuals, g
):
    q, k, v, bias, o, lse = residuals
    if bwd != "xla":
        return _pallas_backward(
            q, k, v, bias, o, lse, g, block_q, interpret, mm_dtype,
            block_h,
        )
    # closed-form XLA backward (recompute + three einsums) — materializes
    # (B, H, S, S) tensors; fine at small S where XLA keeps them fused
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
    bwd: str = "auto",
) -> jnp.ndarray:
    """Fused multi-head attention. q,k,v: (B, H, S, D); bias: (B,1,1,S).

    backend: "auto" | "pallas" | "interpret" | "xla".
    mm_dtype: matmul input dtype inside the kernel (bfloat16 = fast MXU
    path, float32 = exact; softmax is always f32).
    block_h: heads per program (0 = auto VMEM-bounded divisor; with it
    the kernel matches XLA at S=256 and wins 2.24x at S=2048).
    bwd: "auto" | "pallas" | "xla" — backward path when the pallas
    forward is differentiated. "auto" = pallas (the flash backward never
    materializes (S, S) in HBM; "xla" keeps the closed-form recompute
    for A/B).

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
    if bwd == "auto":
        bwd = "pallas"
    return _flash(
        q, k, v, bias, block_q, backend == "interpret", mm_dtype, block_h,
        bwd,
    )


def padding_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, S) 1/0 validity mask -> additive (B, 1, 1, S) bias."""
    return ((1.0 - mask.astype(dtype)) * NEG_INF)[:, None, None, :]
