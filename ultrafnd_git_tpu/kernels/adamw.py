"""Fused AdamW update as a Pallas TPU kernel.

Why: on the flagship frozen-feature step (batch 512) the AdamW update is
the dominant FIXED cost — measured in isolation, XLA's optax.adamw chain
over the ~13M-param tree runs at ~270 GB/s effective HBM bandwidth
(1.05-1.33 ms/update on 1x v5-lite) out of the chip's ~800 GB/s. The
update is pure elementwise streaming: read p, m, v, g and write p, m, v
(7 x 4 bytes/param). One fused kernel does the whole recurrence in a
single HBM pass per block with in-place aliasing, instead of XLA's
multi-fusion chain.

Numerics: bit-identical to the optax chain
`clip_by_global_norm(c) -> adamw(schedule, wd)` — the kernel replays the
exact f32 op order (clip's `(g / norm) * max_norm` form, scale_by_adam's
bias correction at count+1, add_decayed_weights then
scale_by_learning_rate at schedule(count)). Asserted by
tests/test_fused_adamw.py against real optax on random trees.

The public entry is `FusedAdamW`, an optax-like object with
`init(params)` and a FUSED `apply(params, state, grads) ->
(new_params, new_state)` — fused because returning optax-style `updates`
would force an extra params-sized HBM round trip, defeating the point.
`training/state.TrainState.apply_gradients` dispatches on `apply`'s
presence. Reference parity: the reference's torch AdamW+StepLR+clip
(`src/training/forensic_trainer.py:169-177,295`) has the same semantics
via optax; this kernel changes WHERE the math runs, not what it computes.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# elementwise stream block: 128k f32 = 512 KB per buffer in VMEM; 7
# live buffers (4 in + 3 aliased out) stay well under the 16 MB budget
# with room for double buffering
_BLOCK = 128 * 1024
# leaves smaller than this go through plain jnp (kernel-launch overhead
# would exceed the stream time; XLA fuses small elementwise chains fine)
_MIN_PALLAS = 64 * 1024


def _adamw_kernel(scal_ref, p_ref, m_ref, v_ref, g_ref,
                  po_ref, mo_ref, vo_ref):
    """One fused elementwise pass over a flat block.

    scal: (1, 16) f32 in SMEM — slot layout in FusedAdamW._scalars().
    Op order replays optax exactly (clip -> moments -> divide by
    bias-correction -> add_decayed_weights -> scale_by_schedule -> add).
    """
    # SMEM permits scalar loads only — one indexed read per slot
    gnorm, clip_v = scal_ref[0, 0], scal_ref[0, 1]
    b1, b2 = scal_ref[0, 2], scal_ref[0, 3]
    eps, wd, neg_lr = scal_ref[0, 4], scal_ref[0, 5], scal_ref[0, 6]
    bc1, bc2 = scal_ref[0, 7], scal_ref[0, 8]  # 1 - b**t; optax DIVIDES
    has_clip = scal_ref[0, 9]
    # (1 - b) must arrive PRE-COMPUTED: optax bakes `1 - decay` as a
    # python-f64 constant rounded to f32 (0.099999994 for b1=0.9), while
    # computing 1.0f - 0.9f at runtime gives 0.100000024 — one ulp off,
    # which would break bit-parity
    omb1, omb2 = scal_ref[0, 10], scal_ref[0, 11]

    g = g_ref[...]
    # optax.clip_by_global_norm: select(norm < max, g, (g / norm) * max)
    g_clipped = jnp.where(gnorm < clip_v, g, (g / gnorm) * clip_v)
    g = jnp.where(has_clip > 0.0, g_clipped, g)
    # optax.tree.update_moment(order=1): (1-b1)*g + b1*m
    m = omb1 * g + b1 * m_ref[...]
    # optax.tree.update_moment_per_elem_norm(order=2)
    v = omb2 * (g * g) + b2 * v_ref[...]
    mh = m / bc1
    vh = v / bc2
    u = mh / (jnp.sqrt(vh) + eps)
    p = p_ref[...]
    u = u + wd * p          # add_decayed_weights
    po_ref[...] = p + neg_lr * u  # scale_by_schedule + apply_updates
    mo_ref[...] = m
    vo_ref[...] = v


def _leaf_update(p, m, v, g, scal, interpret: bool):
    """Fused update of one leaf; returns (p', m', v').

    Layout: the leaf is viewed as 2D (rows, trailing) — a free row-major
    reshape — and blocked over rows so each block is ~1 MB. Keeping a
    wide trailing dim preserves (8, 128) tiling; a flat 1D view measured
    0.70x vs XLA (sublane-starved), the 2D view wins.
    """
    shape = p.shape
    if p.dtype != jnp.float32:
        # the kernel's out_shapes are f32 (master-param regime); any
        # exotic leaf dtype takes the identical jnp math instead
        return _jnp_leaf_update(p, m, v, g, scal)
    if p.ndim >= 2:
        rows = shape[0]
        trail = int(np.prod(shape[1:]))
    elif p.size % 1024 == 0:
        rows, trail = p.size // 1024, 1024
    else:
        # big ragged 1D leaf (rare): jnp path rather than a padded copy
        return _jnp_leaf_update(p, m, v, g, scal)
    view = lambda t: t.reshape(rows, trail)  # noqa: E731  free reshape

    # ~256k f32 per block (1 MB); 7 live buffers + double buffering
    # stays well inside VMEM
    br = max(1, min(rows, -(-262144 // max(1, trail))))
    grid = -(-rows // br)

    spec = pl.BlockSpec((br, trail), lambda i: (i, 0))
    out = pl.pallas_call(
        _adamw_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec, spec, spec, spec,
        ],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, trail), jnp.float32),
            jax.ShapeDtypeStruct((rows, trail), jnp.float32),
            jax.ShapeDtypeStruct((rows, trail), jnp.float32),
        ),
        # in-place p, m, v (inputs 1, 2, 3 -> outputs 0, 1, 2)
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
    )(scal, view(p), view(m), view(v), view(g))
    return (
        out[0].reshape(shape), out[1].reshape(shape), out[2].reshape(shape)
    )


def _jnp_leaf_update(p, m, v, g, scal):
    """Same math in plain jnp for small leaves (and the non-TPU path)."""
    s = scal[0]
    gnorm, clip_v = s[0], s[1]
    b1, b2, eps, wd, neg_lr = s[2], s[3], s[4], s[5], s[6]
    bc1, bc2 = s[7], s[8]
    has_clip = s[9]
    omb1, omb2 = s[10], s[11]  # pre-computed 1-b (see kernel note)
    g_clipped = jnp.where(gnorm < clip_v, g, (g / gnorm) * clip_v)
    g = jnp.where(has_clip > 0.0, g_clipped, g)
    m = omb1 * g + b1 * m
    v = omb2 * (g * g) + b2 * v
    u = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
    u = u + wd * p
    return p + neg_lr * u, m, v


class FusedAdamW:
    """clip_by_global_norm + AdamW + LR schedule as one fused pass.

    optax-compatible `init`; the update is exposed as the FUSED
    `apply(params, state, grads)` (see module docstring for why there is
    no optax-style `update`). `frozen_subtrees` names top-level param
    keys that are left untouched (moments AND params — torch grad=None
    semantics, matching training.state.make_optimizer's multi_transform).
    """

    def __init__(
        self,
        schedule: Callable[[jnp.ndarray], jnp.ndarray],
        weight_decay: float,
        grad_clip: float,
        b1: float = 0.9,
        b2: float = 0.999,
        eps: float = 1e-8,
        frozen_subtrees: Tuple[str, ...] = (),
        interpret: Optional[bool] = None,
    ):
        self.schedule = schedule
        self.weight_decay = float(weight_decay)
        self.grad_clip = float(grad_clip)
        self.b1, self.b2, self.eps = float(b1), float(b2), float(eps)
        self.frozen = frozenset(frozen_subtrees)
        self.interpret = interpret

    # -- optax-like surface -------------------------------------------------
    def init(self, params) -> Dict[str, Any]:
        zeros = lambda t: jax.tree.map(jnp.zeros_like, t)  # noqa: E731
        return {
            "count": jnp.zeros((), jnp.int32),
            "mu": zeros(params),
            "nu": zeros(params),
        }

    def _scalars(self, grads, count):
        """(1, 16) f32 scalar block (SMEM input of the kernel).

        Slots: 0 gnorm, 1 clip, 2 b1, 3 b2, 4 eps, 5 wd, 6 -lr,
        7 (1-b1^t), 8 (1-b2^t), 9 has_clip flag; rest zero-padding
        (16 lanes keep the SMEM row aligned).
        """
        if self.frozen:
            # multi_transform parity: the optax "train" chain never sees
            # the frozen subtrees, so clip's global norm excludes them
            grads = {k: v for k, v in grads.items() if k not in self.frozen}
        gnorm = optax_global_norm(grads)
        # optax.tree.bias_correction: 1 - decay**count with count =
        # safe_increment(state.count); power computed on the int count
        bc1 = 1.0 - self.b1 ** (count + 1)
        bc2 = 1.0 - self.b2 ** (count + 1)
        # scale_by_schedule reads schedule(count) PRE-increment and
        # multiplies by -1 (flip_sign)
        neg_lr = -jnp.asarray(self.schedule(count), jnp.float32)
        s = jnp.stack(
            [
                gnorm,
                jnp.float32(self.grad_clip),
                jnp.float32(self.b1),
                jnp.float32(self.b2),
                jnp.float32(self.eps),
                jnp.float32(self.weight_decay),
                neg_lr,
                jnp.asarray(bc1, jnp.float32),
                jnp.asarray(bc2, jnp.float32),
                jnp.float32(1.0 if self.grad_clip > 0 else 0.0),
                jnp.float32(1 - self.b1),  # python-f64 then rounded,
                jnp.float32(1 - self.b2),  # exactly like optax's 1-decay
                *([jnp.float32(0.0)] * 4),
            ]
        )
        return s.reshape(1, 16)

    def apply(self, params, state, grads):
        """Fused optimizer step: (new_params, new_state).

        interpret=None (the default) routes big leaves through the
        Pallas kernel ON TPU ONLY — elsewhere the jnp path runs (same
        math; pallas interpret mode would be needlessly slow for every
        CPU test). interpret=True forces the kernel via the interpreter
        (the kernel-parity test hook); False forces compiled pallas.
        """
        if self.interpret is None:
            use_pallas = jax.default_backend() == "tpu"
            interpret = False
        else:
            use_pallas = True
            interpret = bool(self.interpret)
        scal = self._scalars(grads, state["count"])

        new_p, new_m, new_v = {}, {}, {}
        for key in params:
            if key in self.frozen:
                new_p[key] = params[key]
                new_m[key] = state["mu"][key]
                new_v[key] = state["nu"][key]
                continue

            def upd(p, m, v, g):
                if use_pallas and p.size >= _MIN_PALLAS:
                    return _leaf_update(p, m, v, g, scal, interpret)
                return _jnp_leaf_update(p, m, v, g, scal)

            out = jax.tree.map(
                upd, params[key], state["mu"][key], state["nu"][key],
                grads[key],
            )
            # unzip the per-leaf (p, m, v) triples
            new_p[key] = jax.tree.map(
                lambda t: t[0], out, is_leaf=lambda x: isinstance(x, tuple)
            )
            new_m[key] = jax.tree.map(
                lambda t: t[1], out, is_leaf=lambda x: isinstance(x, tuple)
            )
            new_v[key] = jax.tree.map(
                lambda t: t[2], out, is_leaf=lambda x: isinstance(x, tuple)
            )
        new_state = {
            "count": state["count"] + 1,
            "mu": new_m,
            "nu": new_v,
        }
        return new_p, new_state


def optax_global_norm(grads) -> jnp.ndarray:
    """optax.global_norm, inlined to avoid importing optax here."""
    leaves = jax.tree.leaves(grads)
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x)) for x in leaves)
    )
