"""Weight-only int8 quantization for serving (TPU memory-bandwidth lever).

Small-batch serving is memory-bound: each scored chunk re-reads every
weight matrix from HBM while the MXU idles. Storing weights as int8 with
per-channel f32 scales quarters those reads; the dequantize
(`q.astype(compute_dtype) * scale`) sits immediately before each matmul,
so XLA fuses it into the consumer and the arrays that actually cross HBM
stay int8. Params-side only — activations stay f32/bf16 (the
`Predictor(bf16=...)` lever composes), so there is no activation
calibration step and accuracy loss is bounded by weight rounding alone
(≤ scale/2 per element, verified in tests/test_quant.py).

Scheme: symmetric linear, zero-point-free.
  * 2-D `kernel` leaves: per-OUTPUT-channel scale (axis 0 reduced) —
    each output column quantizes against its own max.
  * `embedding` leaves: per-ROW scale — a gathered row dequantizes with
    one scalar.
  * everything else (biases, LayerNorm scale/bias, small kernels under
    `min_size`) stays f32: they are O(width) reads, not worth the error.

The reference has no quantization story (its serving is the torch
modules at full precision); this is TPU-rebuild surface. Quantized
leaves are represented IN the params pytree as `{"__int8__": q,
"__scale__": s}` sub-dicts, so the tree remains a valid jit input and
`dequantize_tree` is a pure function usable inside the scoring program.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

QKEY = "__int8__"
SKEY = "__scale__"


def _quantize_leaf(
    w: jnp.ndarray, channel_axis: int
) -> Dict[str, jnp.ndarray]:
    """Symmetric int8 quantization with a scale per `channel_axis` slice."""
    w = jnp.asarray(w, jnp.float32)
    reduce_axes = tuple(i for i in range(w.ndim) if i != channel_axis)
    amax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {QKEY: q, SKEY: scale.astype(jnp.float32)}


def is_quantized_leaf(node: Any) -> bool:
    return isinstance(node, dict) and set(node) == {QKEY, SKEY}


def quantize_tree(
    params: Dict[str, Any], min_size: int = 4096
) -> Tuple[Dict[str, Any], Dict[str, int]]:
    """Quantize eligible weight leaves of a flax params dict.

    Returns `(qparams, stats)` where stats counts quantized/kept leaves.
    Eligible: 2-D arrays under a `kernel` key (per-output-channel scale)
    or `embedding` key (per-row scale) with at least `min_size` elements.
    """
    stats = {"quantized": 0, "kept": 0}

    def walk(node: Any) -> Any:
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = walk(v)
                continue
            arr = jnp.asarray(v)
            if (
                k == "kernel"
                and arr.ndim == 2
                and arr.size >= min_size
            ):
                out[k] = _quantize_leaf(arr, channel_axis=1)
                stats["quantized"] += 1
            elif (
                k == "embedding"
                and arr.ndim == 2
                and arr.size >= min_size
            ):
                out[k] = _quantize_leaf(arr, channel_axis=0)
                stats["quantized"] += 1
            else:
                out[k] = v
                stats["kept"] += 1
        return out

    return walk(params), stats


def dequantize_tree(
    params: Any, dtype: Optional[Any] = None
) -> Any:
    """Materialize f32 (or `dtype`) weights from a quantize_tree output.

    Pure and jit-traceable: called at the top of a scoring program, each
    dequantized leaf is a convert+multiply that XLA fuses into the matmul
    that consumes it — the HBM-resident array stays int8.
    """
    target = dtype or jnp.float32

    def walk(node: Any) -> Any:
        if not isinstance(node, dict):
            return node
        if is_quantized_leaf(node):
            return (node[QKEY].astype(target) * node[SKEY].astype(target))
        return {k: walk(v) for k, v in node.items()}

    return walk(params)


def quantized_bytes(params: Any) -> Tuple[int, int]:
    """(bytes_quantized_form, bytes_f32_form) for reporting."""
    qb = fb = 0
    for leaf in jax.tree.leaves(params):
        arr = np.asarray(leaf)
        qb += arr.nbytes
        fb += arr.size * 4 if arr.dtype == np.int8 else arr.nbytes
    return qb, fb
