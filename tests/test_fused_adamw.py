"""Fused Pallas AdamW (kernels/adamw.py) vs the optax chain.

The contract is BIT-IDENTITY UNDER JIT: the trainer always runs the
optimizer inside a jitted step, and under jit the fused math reproduces
optax's `clip_by_global_norm -> adamw(schedule, wd)` exactly (same f32
op order, pre-baked 1-b constants, division by the bias correction).
Eager-mode comparisons are deliberately NOT asserted — XLA lowers the
division/sqrt chain differently op-by-op than fused, a ~1e-5 artifact
of eager dispatch, not of this kernel.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from ultrafnd_git_tpu.training.state import make_optimizer


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        # >= _MIN_PALLAS leaves (kernel path on TPU) + small leaves
        "fusion": {
            "a": jnp.asarray(rng.normal(size=(700, 150)).astype(np.float32)),
            "b": jnp.asarray(rng.normal(size=(150,)).astype(np.float32)),
        },
        "clf": {
            "w": jnp.asarray(rng.normal(size=(300, 300)).astype(np.float32)),
            "t": jnp.asarray(np.float32(1.0)),
        },
        "gnn": {
            "k": jnp.asarray(rng.normal(size=(416, 256)).astype(np.float32)),
        },
    }


def _run(tx, fused, p0, steps, grad_scale=0.01):
    """`steps` updates with deterministic synthetic grads; jitted."""
    if fused:
        @jax.jit
        def step(p, o, g):
            return tx.apply(p, o, g)
    else:
        @jax.jit
        def step(p, o, g):
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o

    o = tx.init(p0)
    p = p0
    for k in range(steps):
        # grads grow with k so clip_by_global_norm triggers mid-run
        g = jax.tree.map(lambda x: x * (grad_scale * (k + 1)) + 1e-3, p)
        p, o = step(p, o, g)
    return p, o


def test_fused_matches_optax_bitwise_under_jit():
    p0 = _tree()
    # steps_per_epoch=3 puts the LR staircase transition (epoch 3 -> 9
    # optimizer steps) INSIDE the run; growing grads trip the clip
    tx_ref = make_optimizer(2e-4, 1e-4, 5.0, steps_per_epoch=3)
    tx_fus = make_optimizer(2e-4, 1e-4, 5.0, steps_per_epoch=3, fused=True)
    p_ref, o_ref = _run(tx_ref, False, p0, steps=12)
    p_fus, o_fus = _run(tx_fus, True, p0, steps=12)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fus)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # moments too (resume-equivalence, not just endpoint params)
    adam_state = o_ref[1][0]
    for a, b in zip(
        jax.tree.leaves(adam_state.mu), jax.tree.leaves(o_fus["mu"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(adam_state.count) == int(o_fus["count"]) == 12


def test_kernel_interpret_matches_jnp_path():
    """The pallas kernel itself (interpret mode on CPU) reproduces the
    jnp fallback bit for bit — same program the TPU compiles."""
    p0 = _tree(seed=3)
    tx_jnp = make_optimizer(2e-4, 1e-4, 5.0, steps_per_epoch=3, fused=True)
    tx_int = make_optimizer(2e-4, 1e-4, 5.0, steps_per_epoch=3, fused=True)
    tx_int.interpret = True  # force pallas (interpreter) on every big leaf
    p_a, o_a = _run(tx_jnp, True, p0, steps=3)
    p_b, o_b = _run(tx_int, True, p0, steps=3)
    for a, b in zip(jax.tree.leaves(p_a), jax.tree.leaves(p_b)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
        )


def test_frozen_subtree_untouched():
    p0 = _tree(seed=5)
    tx = make_optimizer(
        2e-4, 1e-4, 5.0, steps_per_epoch=3, fused=True,
        frozen_subtrees=("gnn",),
    )
    p1, o1 = _run(tx, True, p0, steps=4)
    np.testing.assert_array_equal(
        np.asarray(p0["gnn"]["k"]), np.asarray(p1["gnn"]["k"])
    )
    assert float(jnp.abs(o1["mu"]["gnn"]["k"]).max()) == 0.0
    assert not np.array_equal(
        np.asarray(p0["fusion"]["a"]), np.asarray(p1["fusion"]["a"])
    )


def test_matches_optax_multi_transform_freeze():
    """Fused frozen semantics == optax multi_transform(set_to_zero)."""
    p0 = _tree(seed=7)
    tx_ref = make_optimizer(
        2e-4, 1e-4, 5.0, steps_per_epoch=3, frozen_subtrees=("gnn",)
    )
    tx_fus = make_optimizer(
        2e-4, 1e-4, 5.0, steps_per_epoch=3, frozen_subtrees=("gnn",),
        fused=True,
    )
    p_ref, _ = _run(tx_ref, False, p0, steps=6)
    p_fus, _ = _run(tx_fus, True, p0, steps=6)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fus)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_trainer_fused_and_optax_agree_end_to_end(tmp_path):
    """One fixture epoch: fused (default) and --no_fused_adamw land on
    identical losses and metrics (CPU: fused takes the jnp path, same
    jitted math), and a fused checkpoint restores for eval."""
    from pathlib import Path

    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig

    root = str(Path(__file__).resolve().parent / "fixtures" / "fakesv_tiny")

    def cfg(sub, **kw):
        base = dict(
            data_root=root, out_dir=str(tmp_path / sub), batch_size=16,
            epochs=1, seed=42,
        )
        base.update(kw)
        return TrainConfig(**base)

    t_fused = ForensicTrainer(cfg("fused", fused_adamw=True))
    assert t_fused.cfg.fused_adamw
    b1 = t_fused.fit()
    t_optax = ForensicTrainer(cfg("optax"))  # default: optax chain
    assert not t_optax.cfg.fused_adamw
    b2 = t_optax.fit()
    assert b1 == b2  # bit-identical training under jit
    r1, r2 = t_fused.test(), t_optax.test()
    for k in r1:
        assert abs(r1[k] - r2[k]) < 1e-12, k

    # eval-only (default flags) on the fused out_dir must ADOPT the
    # fused optimizer kind from meta to restore the {count, mu, nu} slot
    t_eval = ForensicTrainer(cfg("fused", epochs=0, eval_only=True))
    assert t_eval.cfg.fused_adamw  # adopted from meta
    r3 = t_eval.test()
    assert abs(r3["test_auc"] - r1["test_auc"]) < 1e-12

    # resume with the OTHER flag adopts the checkpoint's optimizer kind
    t_res = ForensicTrainer(
        cfg("fused", epochs=2, resume=True, fused_adamw=False)
    )
    assert t_res.cfg.fused_adamw is True
    assert int(t_res.state.step) > 0  # actually restored, not fresh
