"""Train state: params + optimizer + step + PRNG in one pytree.

The reference keeps three torch modules and a torch.optim.AdamW with a
StepLR schedule (`src/training/forensic_trainer.py:169-177`); best-only
checkpoints drop optimizer state (SURVEY §5.4). Here the full training
state is a single functional pytree, so checkpoints capture everything
needed for exact resume (params + AdamW moments + step + PRNG key).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # scalar int32
    params: Dict[str, Any]  # {"fusion": ..., "clf": ..., "gnn": ...}
    opt_state: optax.OptState
    rng: jax.Array

    def apply_gradients(self, grads, tx):
        if hasattr(tx, "apply"):
            # FusedAdamW (kernels/adamw.py): params are updated INSIDE
            # the fused pass — the optax updates-tree round trip through
            # HBM is exactly the traffic the kernel exists to remove
            new_params, new_opt = tx.apply(self.params, self.opt_state,
                                           grads)
        else:
            updates, new_opt = tx.update(grads, self.opt_state, self.params)
            new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt
        )


def make_optimizer(
    lr: float,
    weight_decay: float,
    grad_clip: float,
    steps_per_epoch: int,
    lr_decay_every_epochs: int = 3,
    lr_decay_rate: float = 0.7,
    frozen_subtrees: tuple = (),
    fused: bool = False,
):
    """AdamW + global-norm clipping + epoch-staircase LR decay.

    Mirrors the reference's AdamW(lr, wd) + StepLR(step_size=3, gamma=0.7)
    + clip_grad_norm_(5.0) as one optax chain; the staircase decays every
    `lr_decay_every_epochs * steps_per_epoch` optimizer steps.

    `frozen_subtrees` names top-level param subtrees (e.g. "gnn") whose
    updates are zeroed entirely — matching torch's grad=None semantics
    where AdamW skips the param (no moment update AND no weight decay;
    merely zeroing gradients would still decay the weights).

    `fused=True` returns kernels/adamw.FusedAdamW instead: the same math
    (bit-identical, tests/test_fused_adamw.py) executed as one Pallas
    elementwise pass on TPU — XLA's chain streams the ~13M-param state at
    ~270 GB/s of the chip's ~800, and the update is the flagship step's
    dominant fixed cost. Checkpoint note: the fused opt_state is a
    {count, mu, nu} dict, not the optax chain tuple — the trainer records
    the choice in checkpoint meta and adopts it on resume/eval.
    """
    schedule = optax.exponential_decay(
        init_value=lr,
        transition_steps=max(1, lr_decay_every_epochs * steps_per_epoch),
        decay_rate=lr_decay_rate,
        staircase=True,
    )
    if fused:
        from ultrafnd_git_tpu.kernels.adamw import FusedAdamW

        return FusedAdamW(
            schedule,
            weight_decay=weight_decay,
            grad_clip=grad_clip,
            frozen_subtrees=tuple(frozen_subtrees),
        )
    chain = []
    if grad_clip and grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.adamw(schedule, weight_decay=weight_decay))
    tx = optax.chain(*chain)
    if frozen_subtrees:
        frozen = frozenset(frozen_subtrees)

        def labels(params):
            return {
                k: ("freeze" if k in frozen else "train") for k in params
            }

        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx


def create_train_state(
    params: Dict[str, Any], tx: optax.GradientTransformation, rng: jax.Array
) -> TrainState:
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=rng,
    )
