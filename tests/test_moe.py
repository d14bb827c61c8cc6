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
    # MoEFFN's default activation is the tanh-approx GELU (see
    # transformer.EncoderBlock.gelu); gelu="exact" is tested implicitly
    # by the tower restore tests
    h = nn.gelu(x.reshape(-1, W) @ w_in + b_in, approximate=True)
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


def test_tower_moe_forward_and_grads():
    """TextTransformer(moe_experts=4): pooled contract intact, aux
    finite, gradients reach the expert arrays."""
    from ultrafnd_git_tpu.models.transformer import TextTransformer

    B, L, W = 4, 16, 64
    ids = jnp.asarray(np.random.RandomState(0).randint(1, 500, (B, L)))
    mask = jnp.ones((B, L), jnp.float32)
    tower = TextTransformer(
        width=W, depth=2, heads=4, vocab_size=512, max_len=L,
        moe_experts=4,
    )
    params = tower.init(
        jax.random.PRNGKey(0), ids, mask, deterministic=True
    )["params"]
    pooled, aux = tower.apply(
        {"params": params}, ids, mask, deterministic=True, return_aux=True
    )
    assert pooled.shape == (B, W)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pooled), axis=-1), 1.0, atol=1e-4
    )
    assert np.isfinite(float(aux)) and float(aux) >= 1.0 - 1e-3
    # without return_aux the plain contract holds (serving path)
    only = tower.apply({"params": params}, ids, mask, deterministic=True)
    np.testing.assert_array_equal(np.asarray(only), np.asarray(pooled))

    def loss(p):
        out, aux = tower.apply(
            {"params": p}, ids, mask, deterministic=True, return_aux=True
        )
        return (out * out).sum() + 1e-2 * aux

    g = jax.grad(loss)(params)
    gnorm_experts = float(
        jnp.linalg.norm(g["block0"]["moe"]["w_in"])
    )
    assert gnorm_experts > 0.0


def test_tower_moe_remat_exact():
    """remat composes with the MoE blocks (tuple-returning body)."""
    from ultrafnd_git_tpu.models.transformer import TextTransformer

    B, L, W = 4, 16, 64
    ids = jnp.asarray(np.random.RandomState(1).randint(1, 500, (B, L)))
    mask = jnp.ones((B, L), jnp.float32)
    kw = dict(width=W, depth=1, heads=4, vocab_size=512, max_len=L,
              moe_experts=2)
    plain = TextTransformer(**kw)
    remat = TextTransformer(**kw, remat=True)
    params = plain.init(
        jax.random.PRNGKey(0), ids, mask, deterministic=True
    )["params"]
    o_p, a_p = plain.apply(
        {"params": params}, ids, mask, deterministic=True, return_aux=True
    )
    o_r, a_r = remat.apply(
        {"params": params}, ids, mask, deterministic=True, return_aux=True
    )
    np.testing.assert_allclose(
        np.asarray(o_p), np.asarray(o_r), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(float(a_p), float(a_r), rtol=1e-6)


@pytest.mark.slow
def test_trainer_moe_tower_end_to_end(tmp_path):
    """--train_text_tower --moe_experts trains, checkpoints, and
    eval-only adopts the MoE architecture from meta."""
    from pathlib import Path

    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig

    root = str(Path(__file__).resolve().parent / "fixtures" / "fakesv_tiny")
    cfg = TrainConfig(
        data_root=root, out_dir=str(tmp_path), batch_size=8, epochs=1,
        seed=0, train_text_tower=True, text_tower_depth=1,
        text_tower_heads=4, moe_experts=2,
    )
    t = ForensicTrainer(cfg)
    best = t.fit()
    assert np.isfinite(best)
    assert "moe" in t.state.params["text_tower"]["block0"]
    res = t.test()
    assert np.isfinite(res["test_loss"])

    # default-flag eval adopts train_text_tower AND moe_experts from meta
    t2 = ForensicTrainer(
        TrainConfig(
            data_root=root, out_dir=str(tmp_path), batch_size=8,
            epochs=0, seed=0, eval_only=True,
        )
    )
    assert t2.cfg.moe_experts == 2
    res2 = t2.test()
    assert abs(res2["test_auc"] - res["test_auc"]) < 1e-9

    # serving rebuilds the MoE tower from meta (serving.py threads
    # moe_experts into the restore template + featurizer tower)
    from ultrafnd_git_tpu.serving import Predictor

    pred = Predictor(str(tmp_path), batch_size=4)
    out = pred.predict(
        [{"video_id": "q1", "title": "外星人 入侵 地球", "ocr": "危险",
          "comments": ["转发"]}]
    )
    assert len(out) == 1 and 0.0 <= out[0]["prob_fake"] <= 1.0
