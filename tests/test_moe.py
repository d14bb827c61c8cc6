"""Switch-MoE FFN + expert parallelism (models/moe.py).

Correctness anchors: a 1-expert MoE is exactly the dense FFN; in the
no-drop regime the einsum dispatch equals direct per-token expert
application; over-capacity tokens pass through as exact residual zeros;
ep-sharded execution is bit-identical to single-device.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ultrafnd_git_tpu.models.moe import (
    MoEEncoderBlock,
    MoEFFN,
    expert_parallel_specs,
)

B, S, W = 2, 8, 16


def _x(seed=0, b=B, s=S, w=W):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((b, s, w)), jnp.float32
    )


def test_single_expert_equals_dense_ffn():
    x = _x()
    moe = MoEFFN(W, num_experts=1, mlp_ratio=2, capacity_factor=1.0)
    params = moe.init(jax.random.PRNGKey(0), x)["params"]
    y, aux = moe.apply({"params": params}, x)

    w_in = params["w_in"][0]
    b_in = params["b_in"][0, 0]
    w_out = params["w_out"][0]
    b_out = params["b_out"][0, 0]
    h = nn.gelu(x.reshape(-1, W) @ w_in + b_in, approximate=False)
    expect = (h @ w_out + b_out).reshape(B, S, W)
    # gate prob is softmax over one logit == 1.0, so outputs match
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(expect), atol=1e-5, rtol=1e-5
    )
    assert np.isclose(float(aux), 1.0, atol=1e-2)  # E*1*1 + tiny z-loss


def test_no_drop_dispatch_matches_direct():
    x = _x(1)
    E = 4
    # capacity_factor=E => cap >= T: nothing can drop
    moe = MoEFFN(W, num_experts=E, mlp_ratio=2, capacity_factor=float(E))
    params = moe.init(jax.random.PRNGKey(1), x)["params"]
    y, _ = moe.apply({"params": params}, x)

    xt = np.asarray(x.reshape(-1, W))
    logits = xt @ np.asarray(params["router"]["kernel"]) + np.asarray(
        params["router"]["bias"]
    )
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    expect = np.zeros_like(xt)
    for t in range(xt.shape[0]):
        e = int(np.argmax(probs[t]))
        h = np.asarray(
            nn.gelu(
                jnp.asarray(
                    xt[t] @ np.asarray(params["w_in"][e])
                    + np.asarray(params["b_in"][e, 0])
                ),
                approximate=False,
            )
        )
        expect[t] = probs[t, e] * (
            h @ np.asarray(params["w_out"][e])
            + np.asarray(params["b_out"][e, 0])
        )
    np.testing.assert_allclose(
        np.asarray(y).reshape(-1, W), expect, atol=1e-4, rtol=1e-4
    )


def test_overflow_tokens_drop_to_zero():
    x = _x(2, b=1, s=8)
    # 1 expert, capacity_factor tiny => cap = ceil(8*0.125/1) = 1 slot:
    # exactly one token is served, the rest must emit exact zeros
    moe = MoEFFN(W, num_experts=1, mlp_ratio=2, capacity_factor=0.125)
    params = moe.init(jax.random.PRNGKey(2), x)["params"]
    y, _ = moe.apply({"params": params}, x)
    y = np.asarray(y)[0]
    nonzero_rows = np.flatnonzero(np.abs(y).sum(axis=-1) > 0)
    assert nonzero_rows.tolist() == [0]  # first-come slot, static order


@pytest.mark.parametrize("ep", [2, 8])
def test_expert_parallel_matches_single_device(ep):
    x = _x(3)
    E = 8
    moe = MoEFFN(W, num_experts=E, mlp_ratio=2, capacity_factor=2.0)
    params = moe.init(jax.random.PRNGKey(3), x)["params"]
    y_ref, aux_ref = jax.jit(
        lambda p, x: moe.apply({"params": p}, x)
    )(params, x)

    mesh = Mesh(np.array(jax.devices("cpu")[:ep]), ("ep",))
    specs = expert_parallel_specs(params)
    sharded = jax.device_put(
        params, jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    )
    # verify the specs actually shard the expert axis
    assert sharded["w_in"].sharding.spec == P("ep", None, None)
    assert sharded["router"]["kernel"].sharding.spec == P()
    y_ep, aux_ep = jax.jit(
        lambda p, x: moe.apply({"params": p}, x)
    )(sharded, x)
    np.testing.assert_allclose(
        np.asarray(y_ep), np.asarray(y_ref), atol=1e-6, rtol=1e-6
    )
    np.testing.assert_allclose(float(aux_ep), float(aux_ref), rtol=1e-6)


def test_moe_encoder_block_trains():
    x = _x(4)
    mask = jnp.ones((B, S), jnp.float32)
    blk = MoEEncoderBlock(
        W, heads=4, num_experts=4, mlp_ratio=2, attention_backend="xla"
    )
    params = blk.init(jax.random.PRNGKey(4), x, mask)["params"]

    def loss(p):
        y, aux = blk.apply({"params": p}, x, mask, deterministic=True)
        return jnp.sum(y ** 2) + 0.01 * aux

    lval, grads = jax.jit(jax.value_and_grad(loss))(params)
    assert np.isfinite(float(lval))
    # router must receive gradient through the gate probabilities
    gnorm = float(
        sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads["moe"]))
    )
    assert np.isfinite(gnorm) and gnorm > 0
    rnorm = float(
        sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads["moe"]["router"]))
    )
    assert rnorm > 0
