"""Native KernelSHAP: coalition sampling + Shapley-kernel regression.

Parity target: reference `src/models/fusion/deep_truth_classifier.py:213-272`
(`explain_shap`) calls `shap.KernelExplainer` when the `shap` package is
installed and silently degrades to SmoothGrad otherwise. `shap` is an
*optional* dependency the reference never ships, so in any environment
without it (including this image) the SHAP rung is dead code. This module
makes the rung real: a from-scratch KernelSHAP estimator whose entire
sample-evaluate-solve pipeline is one jitted program.

Algorithm (Lundberg & Lee 2017, the kernel weighting view of SHAP):
for a model f, an explained row x, and a background set B,

  1. draw M coalitions z in {0,1}^F with P(z) proportional to the Shapley
     kernel  w(|z|) = (F-1) / (C(F,|z|) * |z| * (F-|z|)).  Sampling sizes
     s from p(s) ~ 1/(s*(F-s)) and then a uniform size-s subset gives
     exactly that coalition distribution, so an UNWEIGHTED least squares
     over the draws is a consistent estimator of the kernel-weighted
     problem. Antithetic pairs (each z with its complement 1-z) are
     variance-reducing and size-symmetric (w(s) = w(F-s)).
  2. evaluate y(z) = mean_b f(z * x + (1-z) * B_b) over the background.
  3. solve the constrained weighted least squares
        min_phi  sum_z ( y(z) - phi0 - z . phi )^2
        s.t.     phi0 = base = mean_b f(B_b)          (empty coalition)
                 phi0 + sum(phi) = f(x)               (full coalition)
     by eliminating the last feature's coefficient, which bakes the
     efficiency constraint in exactly: additivity holds to float precision
     by construction, not approximately.

TPU-first design:
  * coalitions are drawn once and SHARED by every explained row, so the
    design matrix is factored once (one SVD) and reused for all rows;
  * model evaluations run as `lax.scan` over fixed-size coalition chunks
    with the (rows, chunk, background) product flattened into one batched
    forward per chunk — fixed shapes, one compile, MXU-friendly batches;
  * everything (sampling, evals, factorization, solves) lives inside a
    single jit; no host round-trips between stages.
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def sample_coalitions(
    key: jax.Array, n_features: int, n_coalitions: int
) -> jnp.ndarray:
    """Draw (M, F) 0/1 coalition rows ~ Shapley kernel, antithetic pairs.

    Sizes follow p(s) ~ 1/(s*(F-s)) over s in [1, F-1]; members are a
    uniform subset of that size. M is rounded up to even for pairing.
    """
    if n_features < 2:
        raise ValueError("kernel SHAP needs >= 2 features")
    half = max(1, (n_coalitions + 1) // 2)
    k_size, k_member = jax.random.split(key)
    sizes = jnp.arange(1, n_features)
    logits = -jnp.log(sizes * (n_features - sizes)).astype(jnp.float32)
    s = 1 + jax.random.categorical(k_size, logits, shape=(half,))
    u = jax.random.uniform(k_member, (half, n_features))
    # rank of each entry within its row; the s smallest become members.
    ranks = jnp.argsort(jnp.argsort(u, axis=1), axis=1)
    z = (ranks < s[:, None]).astype(jnp.float32)
    return jnp.concatenate([z, 1.0 - z], axis=0)


def solve_kernel_shap(
    y: jnp.ndarray,
    coalitions: jnp.ndarray,
    fx: jnp.ndarray,
    base: jnp.ndarray,
) -> jnp.ndarray:
    """Constrained LS solve shared across explained rows.

    y:          (R, M) coalition evaluations per explained row
    coalitions: (M, F) shared 0/1 design
    fx:         (R,) full-model outputs f(x_r)
    base:       scalar mean background output
    returns     (R, F) shap values; base + phi.sum(-1) == fx exactly.
    """
    a = coalitions[:, :-1] - coalitions[:, -1:]  # (M, F-1)
    # y - base - z_F * (fx - base), per row
    adj = y - base - coalitions[None, :, -1] * (fx - base)[:, None]
    # SVD minimum-norm least squares, ONE factorization shared by every
    # explained row. A Cholesky of A^T A NaNs out when M < F (coalition
    # budget below the feature count leaves the gram rank-deficient, and
    # no f32-representable ridge separates its nullspace from rounding
    # noise); lstsq handles that case exactly with the minimum-norm
    # solution and is equally accurate when M >> F.
    head = jnp.linalg.lstsq(a, adj.T)[0].T  # (R, F-1)
    last = (fx - base) - head.sum(axis=1)
    return jnp.concatenate([head, last[:, None]], axis=1)


@functools.partial(
    jax.jit, static_argnames=("f", "n_coalitions", "chunk")
)
def _kernel_shap_jit(
    f: Callable[..., jnp.ndarray],
    params,
    x: jnp.ndarray,
    background: jnp.ndarray,
    key: jax.Array,
    n_coalitions: int,
    chunk: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    rows, n_feat = x.shape
    n_bg = background.shape[0]
    z = sample_coalitions(key, n_feat, n_coalitions)
    m = z.shape[0]
    pad = (-m) % chunk
    z_padded = jnp.concatenate([z, jnp.zeros((pad, n_feat), z.dtype)], axis=0)
    n_chunks = z_padded.shape[0] // chunk

    def eval_chunk(_, zc):
        # (rows, chunk, n_bg, F): x masked in, background masked out.
        mixed = (
            zc[None, :, None, :] * x[:, None, None, :]
            + (1.0 - zc)[None, :, None, :] * background[None, None, :, :]
        )
        out = f(params, mixed.reshape(rows * chunk * n_bg, n_feat))
        return None, out.reshape(rows, chunk, n_bg).mean(axis=2)

    _, y_chunks = jax.lax.scan(
        eval_chunk, None, z_padded.reshape(n_chunks, chunk, n_feat)
    )
    y = jnp.moveaxis(y_chunks, 0, 1).reshape(rows, n_chunks * chunk)[:, :m]
    fx = f(params, x)
    base = f(params, background).mean()
    phi = solve_kernel_shap(y, z, fx, base)
    return phi, jnp.full((rows,), base)


def kernel_shap(
    f: Callable[..., jnp.ndarray],
    params,
    x,
    background,
    n_coalitions: int | None = None,
    chunk: int = 256,
    seed: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SHAP values of `f` at rows `x` against `background`.

    f must be a traceable `(params, (N, F)) -> (N,)` function; `params` is
    threaded as a traced pytree so repeated calls with fresh parameters
    share one compiled program (pass None if f ignores it). Returns
    (phi (R, F), base (R,)); phi rows satisfy the SHAP efficiency axiom
    exactly: base + phi.sum() == f(params, x) per row.

    Cost: ~R * M * K forwards of f (R rows, M coalitions, K background
    rows), batched in fixed chunks inside one compiled program.
    """
    x = jnp.asarray(x, jnp.float32)
    background = jnp.asarray(background, jnp.float32)
    if x.ndim != 2 or background.ndim != 2:
        raise ValueError("x and background must be (rows, features)")
    n_feat = x.shape[1]
    if n_coalitions is None:
        # shap's KernelExplainer auto budget, capped for the jit program.
        n_coalitions = min(2 * n_feat + 2048, 4096)
    chunk = max(1, min(chunk, n_coalitions))
    return _kernel_shap_jit(
        f,
        params,
        x,
        background,
        jax.random.PRNGKey(seed),
        int(n_coalitions),
        int(chunk),
    )
