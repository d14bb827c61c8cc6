"""Native KernelSHAP: exactness on linear models, axioms, ladder wiring.

For a linear model f(x) = w.x + b the Shapley values have the closed form
phi_i = w_i * (x_i - mean(background_i)); because a linear f is exactly
representable by the regression, the constrained-LS estimator recovers it
to solver precision regardless of which coalitions were sampled. That
makes the linear case a sharp correctness oracle, not a statistical one.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultrafnd_git_tpu.ops.kernel_shap import (
    kernel_shap,
    sample_coalitions,
    solve_kernel_shap,
)
from ultrafnd_git_tpu.training.interpret import explain_shap


def _linear_f(w, b):
    def f(params, x):
        del params
        return x @ w + b

    return f


def test_linear_model_matches_closed_form():
    rng = np.random.default_rng(0)
    n_feat = 12
    w = jnp.asarray(rng.normal(size=(n_feat,)), jnp.float32)
    x = rng.normal(size=(5, n_feat)).astype(np.float32)
    bg = rng.normal(size=(16, n_feat)).astype(np.float32)

    phi, base = kernel_shap(
        _linear_f(w, 0.7), None, x, bg, n_coalitions=512, seed=1
    )
    expected = np.asarray(w) * (x - bg.mean(axis=0))
    np.testing.assert_allclose(np.asarray(phi), expected, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(base), np.full(5, bg.mean(0) @ np.asarray(w) + 0.7),
        atol=1e-4,
    )


def test_additivity_exact_for_nonlinear_model():
    # Efficiency is enforced by elimination, so it holds for ANY model.
    rng = np.random.default_rng(1)
    n_feat = 8
    w1 = jnp.asarray(rng.normal(size=(n_feat, 16)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(16,)), jnp.float32)

    def f(params, x):
        del params
        return jnp.tanh(x @ w1) @ w2

    x = rng.normal(size=(4, n_feat)).astype(np.float32)
    bg = rng.normal(size=(8, n_feat)).astype(np.float32)
    phi, base = kernel_shap(f, None, x, bg, n_coalitions=256, seed=2)
    fx = np.asarray(f(None, jnp.asarray(x)))
    np.testing.assert_allclose(
        np.asarray(base) + np.asarray(phi).sum(axis=1), fx, atol=1e-4
    )


def test_symmetric_features_get_equal_attribution():
    # f = sum(x) is symmetric in every feature; against a zero background
    # and equal inputs all attributions must agree.
    n_feat = 6

    def f(params, x):
        del params
        return x.sum(axis=-1)

    x = np.full((1, n_feat), 2.0, np.float32)
    bg = np.zeros((4, n_feat), np.float32)
    phi, _ = kernel_shap(f, None, x, bg, n_coalitions=256, seed=3)
    np.testing.assert_allclose(np.asarray(phi), 2.0, atol=1e-4)


def test_params_are_traced_not_baked():
    # Same f, different params -> different values without retracing errors.
    def f(params, x):
        return x @ params

    x = np.ones((2, 4), np.float32)
    bg = np.zeros((3, 4), np.float32)
    w1 = jnp.ones((4,), jnp.float32)
    w2 = 2.0 * jnp.ones((4,), jnp.float32)
    phi1, _ = kernel_shap(f, w1, x, bg, n_coalitions=128, seed=0)
    phi2, _ = kernel_shap(f, w2, x, bg, n_coalitions=128, seed=0)
    np.testing.assert_allclose(np.asarray(phi2), 2 * np.asarray(phi1), atol=1e-5)


def test_sample_coalitions_properties():
    z = sample_coalitions(jax.random.PRNGKey(0), 10, 200)
    z_np = np.asarray(z)
    assert z_np.shape == (200, 10)
    assert set(np.unique(z_np)) <= {0.0, 1.0}
    sizes = z_np.sum(axis=1)
    assert sizes.min() >= 1 and sizes.max() <= 9  # never empty/full
    # antithetic pairing: second half is the complement of the first.
    np.testing.assert_allclose(z_np[100:], 1.0 - z_np[:100])


def test_solver_rejects_nothing_but_small_problems_work():
    with pytest.raises(ValueError):
        kernel_shap(_linear_f(jnp.ones(1), 0.0), None,
                    np.ones((1, 1), np.float32), np.zeros((1, 1), np.float32))


def test_solve_kernel_shap_weighted_exactness():
    # Direct solver check: y generated exactly by a linear attribution.
    rng = np.random.default_rng(4)
    n_feat, m = 7, 64
    z = np.asarray(sample_coalitions(jax.random.PRNGKey(5), n_feat, m))
    true_phi = rng.normal(size=(3, n_feat)).astype(np.float32)
    base = 0.3
    fx = base + true_phi.sum(axis=1)
    y = base + true_phi @ z.T  # (3, M)
    phi = solve_kernel_shap(
        jnp.asarray(y), jnp.asarray(z), jnp.asarray(fx), jnp.float32(base)
    )
    np.testing.assert_allclose(np.asarray(phi), true_phi, atol=1e-3)


def test_explain_shap_uses_native_kernel_shap_rung():
    from ultrafnd_git_tpu.models.classifier import DeepTruthClassifier

    model = DeepTruthClassifier(
        hidden=16, use_aux=True, aux_dim=2, node_trees=2, node_depth=2
    )
    fused = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    aux = jax.random.uniform(jax.random.PRNGKey(1), (4, 2))
    params = model.init(jax.random.PRNGKey(2), fused, aux)["params"]

    out = explain_shap(
        model, params, fused, aux, max_samples=4, n_coalitions=128
    )
    # shap isn't in this image, so the native rung must fire — and its
    # additivity must tie out against the model's own probabilities.
    assert out["method"] == "kernel-shap"
    assert out["values"].shape == (4, 18)
    probs = np.asarray(
        model.apply({"params": params}, fused, aux, deterministic=True)[
            "probs"
        ][:, 1]
    )
    np.testing.assert_allclose(
        out["base_values"] + out["values"].sum(axis=1), probs, atol=1e-4
    )
