"""Pallas flash-attention kernel: numerics, masking, gradients, tower.

On the CPU test backend the kernel runs in interpret mode (same kernel
code path, executed by the Pallas interpreter); the compiled path is
exercised on real TPU by bench.py / kernel microbenches.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultrafnd_git_tpu.kernels.flash_attention import (
    flash_attention,
    padding_bias,
    reference_attention,
)
from ultrafnd_git_tpu.models.transformer import (
    DeviceTextEncoder,
    TextTransformer,
    hash_tokenize_batch,
)

B, H, S, D = 2, 4, 128, 32


def _qkv(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (B, H, S, D)
    return tuple(jax.random.normal(k, shape, jnp.float32) for k in ks)


class TestKernelNumerics:
    def test_matches_reference_no_mask(self):
        q, k, v = _qkv()
        ours = flash_attention(q, k, v, backend="interpret", mm_dtype=jnp.float32)
        ref = reference_attention(q, k, v)
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)

    def test_matches_reference_with_padding_mask(self):
        q, k, v = _qkv(1)
        mask = jnp.asarray(
            np.repeat([[1.0] * 100 + [0.0] * (S - 100)], B, axis=0)
        )
        bias = padding_bias(mask)
        ours = flash_attention(q, k, v, bias=bias, backend="interpret",
                                mm_dtype=jnp.float32)
        ref = reference_attention(q, k, v, bias=bias)
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)

    def test_padded_keys_do_not_affect_output(self):
        q, k, v = _qkv(2)
        mask = jnp.asarray(
            np.repeat([[1.0] * 64 + [0.0] * (S - 64)], B, axis=0)
        )
        bias = padding_bias(mask)
        out1 = flash_attention(q, k, v, bias=bias, backend="interpret",
                               mm_dtype=jnp.float32)
        # scramble the masked-out keys/values: output must be unchanged
        noise = 100.0 * jax.random.normal(jax.random.PRNGKey(9), k.shape)
        keep = mask[:, None, :, None]
        k2 = k * keep + noise * (1 - keep)
        v2 = v * keep + noise * (1 - keep)
        out2 = flash_attention(q, k2, v2, bias=bias, backend="interpret",
                               mm_dtype=jnp.float32)
        np.testing.assert_allclose(out1, out2, atol=2e-5, rtol=2e-5)

    def test_block_q_tiling_equivalence(self):
        q, k, v = _qkv(3)
        full = flash_attention(q, k, v, block_q=S, backend="interpret",
                               mm_dtype=jnp.float32)
        tiled = flash_attention(q, k, v, block_q=32, backend="interpret",
                                mm_dtype=jnp.float32)
        np.testing.assert_allclose(full, tiled, atol=2e-5, rtol=2e-5)

    def test_bf16_fast_path_within_precision_envelope(self):
        # default mm_dtype=bfloat16: single-pass MXU numerics, ~1e-2 envelope
        q, k, v = _qkv(6)
        fast = flash_attention(q, k, v, backend="interpret")
        ref = reference_attention(q, k, v)
        np.testing.assert_allclose(fast, ref, atol=2e-2, rtol=2e-2)

    def test_non_divisible_block_auto_shrinks(self):
        # block_q that doesn't divide S auto-shrinks to a divisor instead
        # of crashing (towers may use any max_len)
        q, k, v = _qkv(4)
        out = flash_attention(q, k, v, block_q=100, backend="interpret",
                              mm_dtype=jnp.float32)
        ref = reference_attention(q, k, v)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


class TestKernelGradients:
    @pytest.mark.parametrize("bwd", ["xla", "pallas"])
    def test_custom_vjp_matches_reference_grads(self, bwd):
        q, k, v = _qkv(5)
        mask = jnp.ones((B, S))
        bias = padding_bias(mask)

        def loss_ours(q, k, v):
            return jnp.sum(
                flash_attention(q, k, v, bias=bias, backend="interpret",
                                mm_dtype=jnp.float32, bwd=bwd) ** 2
            )

        def loss_ref(q, k, v):
            return jnp.sum(reference_attention(q, k, v, bias=bias) ** 2)

        g_ours = jax.grad(loss_ours, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_ours, g_ref):
            np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-4)

    def test_pallas_bwd_with_padding_mask_and_dbias(self):
        # grads wrt q/k/v AND bias under a real padding mask: the flash
        # backward must agree with the closed-form reference at f32
        q, k, v = _qkv(10)
        mask = jnp.asarray(
            np.repeat([[1.0] * 96 + [0.0] * (S - 96)], B, axis=0)
        )
        bias = padding_bias(mask)

        def loss(fn):
            def _l(q, k, v, bias):
                return jnp.sum(fn(q, k, v, bias) ** 2)

            return _l

        ours = loss(
            lambda q, k, v, b: flash_attention(
                q, k, v, bias=b, backend="interpret",
                mm_dtype=jnp.float32, bwd="pallas",
            )
        )
        ref = loss(reference_attention)
        g_ours = jax.grad(ours, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g_ref = jax.grad(ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b in zip(g_ours, g_ref):
            np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-4)
        # padded keys receive zero dk/dv (their probability is exp(-1e9))
        np.testing.assert_allclose(
            np.asarray(g_ours[1])[:, :, 96:], 0.0, atol=1e-6
        )

    def test_pallas_bwd_tiling_and_heads_blocking_equivalence(self):
        q, k, v = _qkv(11)
        bias = padding_bias(jnp.ones((B, S)))

        def grads(block_q, block_h):
            def _l(q, k, v):
                return jnp.sum(
                    flash_attention(
                        q, k, v, bias=bias, backend="interpret",
                        mm_dtype=jnp.float32, bwd="pallas",
                        block_q=block_q, block_h=block_h,
                    ) ** 2
                )

            return jax.grad(_l, argnums=(0, 1, 2))(q, k, v)

        base = grads(S, 1)
        tiled = grads(32, 4)
        for a, b in zip(base, tiled):
            np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)

    def test_pallas_bwd_bf16_within_envelope(self):
        # default mm_dtype=bfloat16 backward sits in the bf16 envelope
        q, k, v = _qkv(12)
        bias = padding_bias(jnp.ones((B, S)))

        def loss(fn):
            return lambda q, k, v: jnp.sum(fn(q, k, v) ** 2)

        g_fast = jax.grad(
            loss(
                lambda q, k, v: flash_attention(
                    q, k, v, bias=bias, backend="interpret", bwd="pallas"
                )
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
        g_ref = jax.grad(
            loss(lambda q, k, v: reference_attention(q, k, v, bias=bias)),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(g_fast, g_ref):
            np.testing.assert_allclose(a, b, atol=5e-2, rtol=5e-2)


class TestTextTransformer:
    def test_tokenizer_stable_and_padded(self):
        # CJK runs break into single characters (unsegmented Chinese
        # would otherwise hash whole phrases to one-off vocabulary ids,
        # leaving serving-time text on untrained embedding rows)
        ids1, mask1 = hash_tokenize_batch(["你好 世界", ""], max_len=8)
        ids2, _ = hash_tokenize_batch(["你好 世界", ""], max_len=8)
        np.testing.assert_array_equal(ids1, ids2)
        assert ids1.shape == (2, 8)
        assert mask1[0].sum() == 4 and mask1[1].sum() == 0
        assert np.all(ids1[0, 4:] == 0)  # pad id 0
        # character-level: "你好" and "你 好" produce the same ids
        a, _ = hash_tokenize_batch(["你好"], max_len=4)
        b, _ = hash_tokenize_batch(["你 好"], max_len=4)
        np.testing.assert_array_equal(a, b)
        # mixed script: ASCII words stay whole tokens
        c, mc = hash_tokenize_batch(["abc你de"], max_len=4)
        assert mc[0].sum() == 3  # 'abc', '你', 'de'

    def test_tower_contract(self):
        enc = DeviceTextEncoder(
            dim=64, depth=2, heads=4, max_len=16, seed=0,
            attention_backend="xla",
        )
        out = enc.encode_batch(["外星人 入侵", "官方 辟谣 证据", ""])
        assert out.shape == (3, 64)
        np.testing.assert_allclose(
            np.linalg.norm(out[:2], axis=-1), 1.0, atol=1e-4
        )

    def test_tower_deterministic_and_trainable(self):
        a = DeviceTextEncoder(dim=64, depth=1, heads=4, max_len=16, seed=3,
                              attention_backend="xla")
        b = DeviceTextEncoder(dim=64, depth=1, heads=4, max_len=16, seed=3,
                              attention_backend="xla")
        np.testing.assert_allclose(
            a.encode_batch(["hello world"]), b.encode_batch(["hello world"])
        )

        # gradient flows through the tower (trainability)
        model = a.module
        ids, mask = hash_tokenize_batch(["hello world"], max_len=16)

        def loss(p):
            out = model.apply(
                {"params": p}, jnp.asarray(ids), jnp.asarray(mask),
                deterministic=True,
            )
            return jnp.sum(out**2)

        g = jax.grad(loss)(a.params)
        leaf_norms = [
            float(jnp.abs(leaf).sum()) for leaf in jax.tree.leaves(g)
        ]
        assert any(n > 0 for n in leaf_norms)

    def test_pallas_and_xla_towers_agree(self):
        kwargs = dict(dim=64, depth=1, heads=4, max_len=16, seed=7)
        xla = DeviceTextEncoder(attention_backend="xla", **kwargs)
        pallas = DeviceTextEncoder(attention_backend="interpret", **kwargs)
        texts = ["谣言 危险 警告", "科学 证据"]
        # interpret path ships the bf16 MXU numerics -> bf16 envelope
        np.testing.assert_allclose(
            xla.encode_batch(texts),
            pallas.encode_batch(texts),
            atol=2e-2,
            rtol=2e-2,
        )


class TestHeadsBatching:
    def test_block_h_equivalence(self):
        q, k, v = _qkv(7)
        base = flash_attention(q, k, v, backend="interpret",
                               mm_dtype=jnp.float32)
        batched = flash_attention(q, k, v, backend="interpret",
                                  mm_dtype=jnp.float32, block_h=4)
        np.testing.assert_allclose(base, batched, atol=2e-5, rtol=2e-5)

    def test_block_h_must_divide_heads(self):
        q, k, v = _qkv(8)
        with pytest.raises(ValueError, match="multiple of block_h"):
            flash_attention(q, k, v, backend="interpret", block_h=3)
