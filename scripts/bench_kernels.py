#!/usr/bin/env python3
"""Kernel microbench: Pallas fused attention vs XLA on the current backend.

Validates numerics of the COMPILED kernel (not interpret mode) against the
XLA reference, then times both at encoder shapes (BERT-base-ish):
B=32, H=12, S=256, D=64 by default.
"""
import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--block_q", type=int, default=128)
    ap.add_argument("--block_h", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--grad",
        action="store_true",
        help="time fwd+bwd (training) instead of fwd-only: pallas "
        "forward with pallas vs xla backward, plus the full-XLA path",
    )
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ultrafnd_git_tpu.kernels.flash_attention import (
        flash_attention,
        padding_bias,
        reference_attention,
    )
    from ultrafnd_git_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    backend = jax.default_backend()
    b, h, s, d = args.batch, args.heads, args.seq, args.dim
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.float32) for kk in ks)
    mask = jnp.asarray(
        np.repeat([[1.0] * (s - s // 4) + [0.0] * (s // 4)], b, axis=0)
    )
    bias = padding_bias(mask)

    pallas_backend = "pallas" if backend == "tpu" else "interpret"
    f_pallas = jax.jit(
        lambda q, k, v: flash_attention(q, k, v, bias=bias,
                                        backend=pallas_backend)
    )
    f_xla = jax.jit(lambda q, k, v: reference_attention(q, k, v, bias=bias))

    # Ground truth at HIGHEST matmul precision (TPU f32 matmuls otherwise
    # run as multi-pass bf16 on the MXU; both backends sit within that
    # precision envelope of the true result).
    with jax.default_matmul_precision("highest"):
        truth = jax.block_until_ready(
            jax.jit(lambda q, k, v: reference_attention(q, k, v, bias=bias))(
                q, k, v
            )
        )
    out_p = jax.block_until_ready(f_pallas(q, k, v))
    out_x = jax.block_until_ready(f_xla(q, k, v))
    err_p = float(jnp.max(jnp.abs(out_p - truth)))
    err_x = float(jnp.max(jnp.abs(out_x - truth)))
    print(
        f"backend={backend} pallas={pallas_backend} "
        f"max|Δ| vs highest-precision truth: pallas={err_p:.2e} xla={err_x:.2e}"
    )
    tol = 1e-2  # default mm_dtype=bf16: single-pass-MXU envelope on any backend
    assert err_p < tol, "compiled kernel diverges beyond precision envelope"

    def bench(attn_fn, name):
        # Chain CHAIN applications inside ONE jit: per-call dispatch (and,
        # on a tunneled TPU, network round-trips) would otherwise dominate.
        chain = args.iters

        @jax.jit
        def run(q):
            def body(carry, _):
                out = attn_fn(carry, k, v)
                return out, ()

            final, _ = jax.lax.scan(body, q, None, length=chain)
            return final

        jax.block_until_ready(run(q))  # compile + warm
        t0 = time.perf_counter()
        jax.block_until_ready(run(q))
        dt = (time.perf_counter() - t0) / chain
        flops = 4 * b * h * s * s * d
        print(f"{name:8s}: {dt*1e6:9.1f} us/call  "
              f"({flops/dt/1e12:.2f} TFLOP/s)")
        return dt

    if args.grad:
        # fwd+bwd: chain grad steps inside one jit; sync by pulling a
        # scalar to host (block_until_ready under-reports on the tunneled
        # backend — measured in BASELINE.md "floors")
        def bench_grad(attn_fn, name):
            def loss(q, k, v):
                return jnp.sum(attn_fn(q, k, v) ** 2)

            gfn = jax.grad(loss, argnums=(0, 1, 2))

            @jax.jit
            def run(q, k, v):
                def body(carry, _):
                    cq, ck, cv = carry
                    gq, gk, gv = gfn(cq, ck, cv)
                    return (
                        cq + 1e-9 * gq, ck + 1e-9 * gk, cv + 1e-9 * gv
                    ), ()

                (fq, fk, fv), _ = jax.lax.scan(
                    body, (q, k, v), None, length=args.iters
                )
                return jnp.sum(fq) + jnp.sum(fk) + jnp.sum(fv)

            float(run(q, k, v))  # compile + warm (host sync)
            t0 = time.perf_counter()
            float(run(q, k, v))
            dt = (time.perf_counter() - t0) / args.iters
            # algorithmic fwd+bwd attention FLOPs: 4 (fwd) + 10 (bwd)
            flops = 14 * b * h * s * s * d
            print(
                f"{name:24s}: {dt*1e6:9.1f} us/step  "
                f"({flops/dt/1e12:.2f} TFLOP/s)"
            )
            return dt

        t_pp = bench_grad(
            lambda q, k, v: flash_attention(
                q, k, v, bias=bias, block_q=args.block_q,
                block_h=args.block_h, backend=pallas_backend,
                bwd="pallas",
            ),
            "pallas fwd + pallas bwd",
        )
        t_px = bench_grad(
            lambda q, k, v: flash_attention(
                q, k, v, bias=bias, block_q=args.block_q,
                block_h=args.block_h, backend=pallas_backend, bwd="xla",
            ),
            "pallas fwd + xla bwd",
        )
        t_xx = bench_grad(
            lambda q, k, v: reference_attention(q, k, v, bias=bias),
            "xla fwd + xla bwd",
        )
        print(
            f"pallas-bwd speedup: {t_px/t_pp:.2f}x vs closed-form, "
            f"{t_xx/t_pp:.2f}x vs full XLA"
        )
        return

    t_p = bench(
        lambda q, k, v: flash_attention(q, k, v, bias=bias,
                                        block_q=args.block_q,
                                        block_h=args.block_h,
                                        backend=pallas_backend),
        "pallas",
    )
    t_x = bench(
        lambda q, k, v: reference_attention(q, k, v, bias=bias), "xla"
    )
    print(f"speedup vs XLA: {t_x/t_p:.2f}x")


if __name__ == "__main__":
    main()
