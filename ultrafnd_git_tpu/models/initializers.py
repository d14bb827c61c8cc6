"""Torch-default Linear initialization for Flax modules.

The reference leaves most Linears on torch's default init —
kaiming_uniform(a=sqrt(5)) weights, i.e. U(+-1/sqrt(fan_in)) (variance
1/(3*fan_in)), and U(+-1/sqrt(fan_in)) biases. Flax's Dense default is
lecun_normal (variance 1/fan_in — 1.73x larger std) with ZERO biases.

Forward parity with transferred weights never sees init, but *training
dynamics* do: on the hard parity fixture the larger flax init fit ~1 epoch
faster and peaked at a lower val AUC than the reference (measured, round
3). These helpers mirror torch's distribution so fresh-training dynamics
match; modules the reference explicitly re-initializes (the classifier's
xavier-uniform weights + zero biases, the NODE zeros) keep those instead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# U(+-sqrt(3*scale/fan_in)) with scale=1/3 -> U(+-1/sqrt(fan_in)),
# exactly torch.nn.Linear's default weight distribution.
torch_kernel = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_bias(fan_in: int):
    """torch.nn.Linear's default bias init: U(+-1/sqrt(fan_in))."""
    bound = float(max(1, fan_in)) ** -0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_dense(features: int, fan_in: int, *, dtype=None, name=None):
    """nn.Dense with torch.nn.Linear's default weight+bias init."""
    return nn.Dense(
        features,
        dtype=dtype,
        name=name,
        kernel_init=torch_kernel,
        bias_init=torch_bias(fan_in),
    )
