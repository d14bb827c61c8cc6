"""Pipeline-parallel text-tower demo (parallel/pipeline.py).

Builds a 'pipe' mesh (virtual CPU devices by default, real chips on a
pod), runs the GPipe-scheduled tower forward, checks it against the
sequential tower, and prints per-forward timing.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/demo_pipeline.py --stages 4 --micro 8 --depth 8

On a real TPU pod slice the same code pipelines over ICI; here the point
is the schedule + exactness (virtual devices share one core, so no
speedup is expected on CPU).
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--micro", type=int, default=8)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=64)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (virtual devices)")
    args = ap.parse_args()

    if args.cpu or "xla_force_host_platform_device_count" in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from ultrafnd_git_tpu.models.transformer import TextTransformer
    from ultrafnd_git_tpu.parallel.pipeline import pipelined_tower_apply
    from ultrafnd_git_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    devs = jax.devices()
    if len(devs) < args.stages:
        raise SystemExit(
            f"need {args.stages} devices for {args.stages} stages, have "
            f"{len(devs)} — set XLA_FLAGS=--xla_force_host_platform_"
            f"device_count={args.stages} (or run on a pod slice)"
        )
    mesh = Mesh(np.array(devs[: args.stages]), ("pipe",))

    tower = TextTransformer(
        width=args.width, depth=args.depth, heads=args.heads,
        vocab_size=4096, max_len=args.seq,
    )
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(1, 4096, size=(args.batch, args.seq)), jnp.int32
    )
    mask = jnp.ones((args.batch, args.seq), jnp.float32)
    params = tower.init(jax.random.PRNGKey(0), ids, mask)["params"]

    piped = jax.jit(
        lambda p, i, m: pipelined_tower_apply(
            tower, p, i, m, mesh, microbatches=args.micro
        )
    )
    seq = jax.jit(
        lambda p, i, m: tower.apply(
            {"params": p}, i, m, deterministic=True
        )
    )

    a = np.asarray(piped(params, ids, mask))
    b = np.asarray(seq(params, ids, mask))
    err = float(np.abs(a - b).max())
    print(f"max |pipelined - sequential| = {err:.2e}")
    assert err < 5e-5, "pipelined forward diverged from the tower"

    for name, fn in (("pipelined", piped), ("sequential", seq)):
        fn(params, ids, mask).block_until_ready()  # warm
        t0 = time.perf_counter()
        for _ in range(5):
            fn(params, ids, mask).block_until_ready()
        dt = (time.perf_counter() - t0) / 5
        print(f"{name:>10}: {dt * 1e3:8.2f} ms/forward "
              f"(B={args.batch}, L={args.seq}, depth={args.depth}, "
              f"stages={args.stages if name == 'pipelined' else 1})")
    print("pipeline demo OK")


if __name__ == "__main__":
    main()
