#!/usr/bin/env python3
"""Measure the two HBM levers: --remat_tower and --grad_accum.

Both levers trade compute for live memory; this script makes the trade
measurable on the real chip via XLA's compiled memory analysis
(temp_size = live activation/workspace HBM of one step) plus wall time:

  remat     — tower fwd+bwd+AdamW at an activation-heavy shape
              (depth 4, L 512), plain vs nn.remat blocks.
  grad_accum— same EFFECTIVE batch, one big batch vs A microbatches
              accumulated in a lax.scan (the trainer's _make_grad_fn
              formulation: summed masked-sum grads, one normalize).

Prints one line per variant: temp HBM (MB), p50 ms per step (scanned
timing, dispatch excluded), samples/s at the effective batch.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import numpy as np

WIDTH = 768
HEADS = 12
VOCAB = 32768
DEPTH = 4
SEQ = 512
ITERS = 10
RUNS = 3


def main() -> None:
    from ultrafnd_git_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from ultrafnd_git_tpu.models.transformer import TextTransformer

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    def make_step(tower, tx, accum, batch):
        """Trainer-shaped step: grads (accumulated or not) + adamw."""

        def loss_sum(p, ids, mask, y, key):
            pooled = tower.apply(
                {"params": p}, ids, mask, deterministic=False,
                rngs={"dropout": key},
            )
            logits = pooled @ jnp.zeros((WIDTH, 2), pooled.dtype) + pooled[
                :, :2
            ]  # tiny head: keep the workload tower-dominated
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y
            )
            return (ce * mask[:, 0]).sum()

        gfn = jax.value_and_grad(loss_sum)

        def step(p, o, ids, mask, y, key):
            if accum == 1:
                ls, g = gfn(p, ids, mask, y, key)
                denom = jnp.float32(batch)
            else:
                mb = batch // accum

                def body(carry, xs):
                    gs, l = carry
                    i, m, yy, k = xs
                    ls, g = gfn(p, i, m, yy, jax.random.fold_in(key, k))
                    return (
                        jax.tree.map(jnp.add, gs, g), l + ls
                    ), None

                zeros = jax.tree.map(jnp.zeros_like, p)
                (g, ls), _ = jax.lax.scan(
                    body,
                    (zeros, jnp.zeros((), jnp.float32)),
                    (
                        ids.reshape(accum, mb, SEQ),
                        mask.reshape(accum, mb, SEQ),
                        y.reshape(accum, mb),
                        jnp.arange(accum),
                    ),
                )
                denom = jnp.float32(batch)
            g = jax.tree.map(lambda x: x / denom, g)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o, ls / denom

        return step

    def variant(name, remat, accum, batch):
        tower = TextTransformer(
            width=WIDTH, depth=DEPTH, heads=HEADS, vocab_size=VOCAB,
            max_len=SEQ, dtype=jnp.bfloat16, remat=remat,
        )
        ids = jnp.asarray(
            rng.integers(1, VOCAB, size=(batch, SEQ)).astype(np.int32)
        )
        mask = jnp.ones((batch, SEQ), jnp.float32)
        y = jnp.asarray(rng.integers(0, 2, size=batch).astype(np.int32))
        key = jax.random.PRNGKey(0)
        params = tower.init(
            key, ids[:1], mask[:1], deterministic=True
        )["params"]
        tx = optax.adamw(1e-4)
        opt = tx.init(params)
        step = make_step(tower, tx, accum, batch)

        jitted = jax.jit(step, donate_argnums=(0, 1))
        temp_mb = float("nan")
        try:
            lowered = jitted.lower(params, opt, ids, mask, y, key)
            compiled = lowered.compile()
            ma = compiled.memory_analysis()
            if ma is not None:
                temp_mb = ma.temp_size_in_bytes / 1e6
        except Exception as exc:  # RESOURCE_EXHAUSTED at 16 GB HBM
            msg = str(exc).splitlines()[0][:90]
            print(f"{name:28s} DOES NOT FIT one chip: {msg}")
            return float("inf"), float("nan")

        # timing: scan ITERS steps inside one jit (dispatch excluded);
        # same harness as scripts/bench_tower.py
        @jax.jit
        def run(p, o, ids_all, mask, y, key):
            def body(carry, xs):
                p, o = carry
                i, k = xs
                p, o, ls = step(p, o, i, mask, y,
                                jax.random.fold_in(key, k))
                return (p, o), ls

            return jax.lax.scan(
                body, (p, o), (ids_all, jnp.arange(ITERS))
            )

        ids_all = jnp.asarray(
            np.broadcast_to(np.asarray(ids), (ITERS,) + ids.shape).copy()
        )
        (p, o), losses = run(params, opt, ids_all, mask, y, key)  # warm
        jax.block_until_ready(losses)
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            (p, o), losses = run(p, o, ids_all, mask, y, key)
            jax.block_until_ready(losses)
            times.append((time.perf_counter() - t0) / ITERS)
        ms = sorted(times)[len(times) // 2] * 1e3
        sps = batch / (ms / 1e3)
        print(
            f"{name:28s} temp={temp_mb:9.1f} MB  p50={ms:8.2f} ms/step"
            f"  {sps:9.0f} samples/s"
        )
        return temp_mb, ms

    print(f"\n== remat (depth {DEPTH}, L {SEQ}, batch 256, bf16) ==")
    t_plain, _ = variant("plain", remat=False, accum=1, batch=256)
    t_remat, _ = variant("remat", remat=True, accum=1, batch=256)
    if np.isfinite(t_plain) and np.isfinite(t_remat):
        print(f"remat temp reduction: {t_plain / t_remat:.2f}x")

    print("\n== grad_accum (same effective batch 1024) ==")
    t_big, _ = variant("1 x 1024 (big batch)", remat=False, accum=1,
                       batch=1024)
    t_acc, _ = variant("4 x 256 (grad_accum=4)", remat=False, accum=4,
                       batch=1024)
    if np.isinf(t_big) and np.isfinite(t_acc):
        print(
            f"grad_accum=4 fits the step ({t_acc:.0f} MB temp) that the "
            "single big batch cannot compile at all"
        )
    elif np.isfinite(t_big) and np.isfinite(t_acc):
        print(f"grad_accum temp reduction: {t_big / t_acc:.2f}x")

    print("\n== stacked: remat + grad_accum at effective 1024 ==")
    variant("remat + 4 x 256", remat=True, accum=4, batch=1024)


if __name__ == "__main__":
    main()
