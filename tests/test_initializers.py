"""models/initializers.py: torch-default Linear init, pinned vs torch.

Training-dynamics parity (BASELINE.md round 3) depends on fresh params
drawing from torch.nn.Linear's default distribution, not flax's. These
tests pin the bounds/moments against an ACTUAL torch.nn.Linear draw.
"""
import numpy as np
import pytest

from ultrafnd_git_tpu.models.initializers import (
    torch_bias,
    torch_dense,
    torch_kernel,
)


def test_kernel_matches_torch_default_bounds():
    import jax

    fan_in, fan_out = 48, 96
    w = np.asarray(
        torch_kernel(jax.random.PRNGKey(0), (fan_in, fan_out), np.float32)
    )
    bound = 1.0 / np.sqrt(fan_in)
    assert np.abs(w).max() <= bound + 1e-7
    # uniform moments: var = bound^2/3, near-uniform tails occupied
    assert np.isclose(w.var(), bound**2 / 3, rtol=0.15)
    assert np.abs(w).max() > 0.9 * bound


def test_bias_matches_torch_default_bounds():
    import jax

    fan_in = 48
    b = np.asarray(torch_bias(fan_in)(jax.random.PRNGKey(1), (96,)))
    bound = 1.0 / np.sqrt(fan_in)
    assert np.abs(b).max() <= bound + 1e-7
    assert np.isclose(b.var(), bound**2 / 3, rtol=0.3)


def test_distribution_matches_actual_torch_linear():
    """Same bounds + variance as a real torch.nn.Linear of the same shape
    (distribution equality, not per-element — different RNGs)."""
    torch = pytest.importorskip("torch")
    import jax

    fan_in, fan_out = 64, 4096  # big enough for stable moments
    lin = torch.nn.Linear(fan_in, fan_out)
    tw = lin.weight.detach().numpy()  # torch layout (out, in)
    jw = np.asarray(
        torch_kernel(jax.random.PRNGKey(2), (fan_in, fan_out), np.float32)
    )
    assert np.isclose(np.abs(tw).max(), np.abs(jw).max(), rtol=0.05)
    assert np.isclose(tw.var(), jw.var(), rtol=0.05)
    tb = lin.bias.detach().numpy()
    jb = np.asarray(torch_bias(fan_in)(jax.random.PRNGKey(3), (fan_out,)))
    assert np.isclose(np.abs(tb).max(), np.abs(jb).max(), rtol=0.1)
    assert np.isclose(tb.var(), jb.var(), rtol=0.15)


def test_torch_dense_wires_both_inits():
    import jax
    import jax.numpy as jnp

    d = torch_dense(32, fan_in=16)
    params = d.init(jax.random.PRNGKey(0), jnp.zeros((2, 16)))["params"]
    bound = 1.0 / np.sqrt(16)
    assert np.abs(np.asarray(params["kernel"])).max() <= bound + 1e-7
    assert np.abs(np.asarray(params["bias"])).max() <= bound + 1e-7
    assert np.abs(np.asarray(params["bias"])).max() > 0  # NOT flax zeros
