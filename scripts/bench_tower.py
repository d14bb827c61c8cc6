#!/usr/bin/env python3
"""Profile-driven breakdown of the --train_text_tower joint step.

VERDICT r2 item 4: the joint step is the one genuinely FLOP-rich
configuration (~24% MFU f32 in round 2). This script decomposes where the
time goes by timing scan-chained fwd+bwd+AdamW variants of the tower in
isolation (batch 512 x 64 tokens, width 768, depth 2):

  full        — embedding + blocks + pooling, full backward
  frozen_embed— stop_gradient on the token embedding (no (32768, 768)
                scatter-add in backward)
  no_embed    — dense inputs (embedding + its gather excluded entirely)
  attn=xla    — force the XLA attention path (auto picks it at S=64)

plus f32 vs bf16-compute. Prints one line per variant with p50 ms, TF/s
and MFU (XLA cost analysis of the unscanned step).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import numpy as np

BATCH = 512
SEQ = 64
WIDTH = 768
DEPTH = 2
HEADS = 12
VOCAB = 32768
ITERS = 20
RUNS = 3
PEAK = 197e12


def main() -> None:
    from ultrafnd_git_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from ultrafnd_git_tpu.models.transformer import TextTransformer

    rng = np.random.default_rng(0)
    ids_np = rng.integers(1, VOCAB, size=(BATCH, SEQ)).astype(np.int32)
    mask_np = np.ones((BATCH, SEQ), np.float32)
    y_np = rng.integers(0, 2, size=BATCH).astype(np.int32)

    def build(dtype, backend, embed_mode):
        tower = TextTransformer(
            width=WIDTH, depth=DEPTH, heads=HEADS, vocab_size=VOCAB,
            max_len=SEQ, attention_backend=backend, dtype=dtype,
        )
        params = tower.init(
            jax.random.PRNGKey(0),
            jnp.asarray(ids_np), jnp.asarray(mask_np), deterministic=True,
        )["params"]
        head = jax.random.normal(jax.random.PRNGKey(1), (WIDTH, 2)) * 0.02
        tx = optax.adamw(1e-4, weight_decay=1e-4)
        opt = tx.init(params)

        def loss_fn(p, ids, mask, y):
            if embed_mode == "frozen_embed":
                p = {**p, "tok_embed": jax.lax.stop_gradient(p["tok_embed"])}
            pooled = tower.apply(
                {"params": p}, ids, mask, deterministic=True
            )
            logits = pooled @ head
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        def step(p, o, ids, mask, y):
            loss, g = jax.value_and_grad(loss_fn)(p, ids, mask, y)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o, loss

        @jax.jit
        def run(p, o, ids_all, mask, y):
            def body(carry, ids):
                p, o = carry
                p, o, loss = step(p, o, ids, mask, y)
                return (p, o), loss

            return jax.lax.scan(body, (p, o), ids_all)

        # cost analysis of ONE unscanned step
        try:
            compiled = (
                jax.jit(step)
                .lower(params, opt, jnp.asarray(ids_np),
                       jnp.asarray(mask_np), jnp.asarray(y_np))
                .compile()
            )
            an = compiled.cost_analysis()
            if isinstance(an, (list, tuple)):
                an = an[0]
            flops = float(an.get("flops", 0.0))
        except Exception:
            flops = 0.0
        return params, opt, run, flops

    def time_variant(name, dtype, backend="auto", embed_mode="full"):
        import jax
        import jax.numpy as jnp

        params, opt, run, flops = build(dtype, backend, embed_mode)
        ids_all = jnp.asarray(
            np.broadcast_to(ids_np, (ITERS, BATCH, SEQ)).copy()
        )
        mask = jnp.asarray(mask_np)
        y = jnp.asarray(y_np)
        (p, o), losses = run(params, opt, ids_all, mask, y)  # warm
        jax.block_until_ready(losses)
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            (p, o), losses = run(p, o, ids_all, mask, y)
            jax.block_until_ready(losses)
            times.append((time.perf_counter() - t0) / ITERS)
        p50 = float(np.median(times))
        tfs = flops / p50 / 1e12 if flops else 0.0
        print(
            f"{name:28s} p50 {p50*1e3:7.2f} ms  {BATCH/p50:8.0f} samples/s"
            f"  {flops/1e9:7.1f} GF  {tfs:6.1f} TF/s  MFU {tfs*1e12/PEAK:6.1%}",
            flush=True,
        )
        return p50

    import jax.numpy as jnp

    time_variant("f32 full", None)
    time_variant("bf16 full", jnp.bfloat16)
    time_variant("bf16 frozen_embed", jnp.bfloat16, embed_mode="frozen_embed")
    time_variant("bf16 attn=xla", jnp.bfloat16, backend="xla")
    time_variant("bf16 attn=pallas", jnp.bfloat16, backend="pallas")


if __name__ == "__main__":
    main()
