"""Interpretability transforms (Grad x Input, SmoothGrad, SHAP gate)."""
import jax
import jax.numpy as jnp
import numpy as np

from ultrafnd_git_tpu.models.classifier import DeepTruthClassifier
from ultrafnd_git_tpu.training.interpret import (
    explain_shap,
    feature_importance,
    smooth_grad,
)

B, F, A = 6, 32, 2


def _model_and_params(use_aux=True):
    model = DeepTruthClassifier(
        hidden=16, use_aux=use_aux, aux_dim=A, node_trees=2, node_depth=2
    )
    fused = jax.random.normal(jax.random.PRNGKey(0), (B, F))
    aux = jax.random.uniform(jax.random.PRNGKey(1), (B, A)) if use_aux else None
    params = model.init(jax.random.PRNGKey(2), fused, aux)["params"]
    return model, params, fused, aux


def test_feature_importance_shapes_and_aggregate():
    model, params, fused, aux = _model_and_params()
    imp, agg = feature_importance(model, params, fused, aux)
    assert imp.shape == (B, F + A)
    assert agg.shape == (F + A,)
    assert np.all(imp >= 0.0)
    np.testing.assert_allclose(agg, imp.mean(axis=0), rtol=1e-6)

    imp2, agg2 = feature_importance(model, params, fused, aux, aggregate=False)
    assert agg2 is None and imp2.shape == (B, F + A)


def test_feature_importance_no_aux():
    model, params, fused, _ = _model_and_params(use_aux=False)
    imp, agg = feature_importance(model, params, fused, None)
    assert imp.shape == (B, F) and agg.shape == (F,)


def test_feature_importance_zero_input_gives_zero_gradxinput():
    model, params, fused, aux = _model_and_params()
    imp, _ = feature_importance(
        model, params, jnp.zeros_like(fused), jnp.zeros_like(aux)
    )
    assert np.allclose(imp, 0.0)  # x = 0 -> grad*x = 0


def test_smooth_grad_shape_and_determinism():
    model, params, fused, aux = _model_and_params()
    v1 = smooth_grad(model, params, fused, aux, n_samples=4, seed=3)
    v2 = smooth_grad(model, params, fused, aux, n_samples=4, seed=3)
    assert v1.shape == (B, F + A)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    assert np.all(v1 >= 0.0)


def test_explain_shap_falls_back_and_reports_method():
    model, params, fused, aux = _model_and_params()
    out = explain_shap(model, params, fused, aux, max_samples=4, n_coalitions=128)
    # ladder: shap package -> native kernel-shap -> smooth-grad; in this
    # image (no shap) the native rung must be the one that fires.
    assert out["method"] == "kernel-shap"
    assert out["values"].shape[1] == F + A
    assert out["values"].shape[0] <= 4
