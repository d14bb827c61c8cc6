"""Device-tower rung of the text-encoder ladder."""
import os

import numpy as np
import pytest

from ultrafnd_git_tpu.models.text import BERTContextEncoder


def test_tower_rung_engages_when_enabled():
    enc = BERTContextEncoder(dim=64, max_length=16, use_device_tower=True)
    assert not enc.use_hf  # HF disabled by conftest -> tower rung active
    out = enc.encode_batch(["外星人 入侵", "", "证据 科学"])
    assert out.shape == (3, 64)
    assert np.all(out[1] == 0.0)  # empty text stays zero
    np.testing.assert_allclose(
        np.linalg.norm(out[[0, 2]], axis=-1), 1.0, atol=1e-4
    )
    # differs from the hash rung
    hash_enc = BERTContextEncoder(dim=64, max_length=16,
                                  use_device_tower=False)
    assert not np.allclose(out, hash_enc.encode_batch(
        ["外星人 入侵", "", "证据 科学"]))


def test_env_var_opt_in(monkeypatch):
    monkeypatch.setenv("ULTRAFND_TEXT_DEVICE", "1")
    enc = BERTContextEncoder(dim=64, max_length=16)
    assert enc._want_device_tower
    monkeypatch.setenv("ULTRAFND_TEXT_DEVICE", "0")
    enc2 = BERTContextEncoder(dim=64, max_length=16)
    assert not enc2._want_device_tower


def test_single_and_batch_agree():
    enc = BERTContextEncoder(dim=64, max_length=16, use_device_tower=True)
    single = enc.encode("谣言 危险")
    batch = enc.encode_batch(["谣言 危险"])[0]
    np.testing.assert_allclose(single, batch, atol=1e-6)


@pytest.mark.slow
def test_from_checkpoint_serves_trained_tower(
    fixture_data_root, tower_ckpt, tmp_path
):
    """DeviceTextEncoder.from_checkpoint restores the jointly-trained
    tower and serves non-random features (closes the fine-tune loop).
    Restores the shared session checkpoint (tests/conftest.py)."""
    from ultrafnd_git_tpu.models.transformer import DeviceTextEncoder
    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig

    enc = DeviceTextEncoder.from_checkpoint(tower_ckpt["out"])
    assert enc.trained  # no untrained-features warning path
    out = enc.encode_batch(["外星人 入侵 警告", "官方 辟谣 证据"])
    assert out.shape == (2, 768)
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.ones(2), atol=1e-4
    )
    # trained params, not the seeded ones
    import jax

    seeded = DeviceTextEncoder(
        dim=768, depth=enc.module.depth, heads=enc.module.heads,
        max_len=enc.max_len, seed=0,
    )
    a = jax.tree.leaves(enc.params)[0]
    b = jax.tree.leaves(seeded.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))

    # non-tower checkpoints are rejected loudly
    cfg2 = TrainConfig(
        data_root=fixture_data_root,
        out_dir=str(tmp_path / "plain"),
        batch_size=8,
        epochs=1,
        seed=0,
        cache_to_disk=False,
        log_metrics_jsonl=False,
    )
    ForensicTrainer(cfg2).fit()
    with pytest.raises(ValueError):
        DeviceTextEncoder.from_checkpoint(str(tmp_path / "plain"))


def test_remat_tower_is_exact():
    """remat=True (jax.checkpoint per block) must be numerically exact:
    same params + same dropout rng -> identical forward output AND
    identical gradients (the recompute replays the same rngs)."""
    import jax
    import jax.numpy as jnp

    from ultrafnd_git_tpu.models.transformer import TextTransformer

    B, L, W = 4, 16, 64
    ids = jnp.asarray(np.random.RandomState(0).randint(1, 1000, (B, L)))
    mask = jnp.ones((B, L), jnp.float32)
    kw = dict(width=W, depth=2, heads=4, vocab_size=1024, max_len=L)
    plain = TextTransformer(**kw)
    remat = TextTransformer(**kw, remat=True)
    params = plain.init(
        jax.random.PRNGKey(0), ids, mask, deterministic=True
    )["params"]

    # forward (train mode, dropout active, shared rng stream)
    rng = {"dropout": jax.random.PRNGKey(7)}
    o_p = plain.apply(
        {"params": params}, ids, mask, deterministic=False, rngs=rng
    )
    o_r = remat.apply(
        {"params": params}, ids, mask, deterministic=False, rngs=rng
    )
    np.testing.assert_allclose(
        np.asarray(o_p), np.asarray(o_r), rtol=1e-6, atol=1e-7
    )

    def loss(p, mod):
        out = mod.apply(
            {"params": p}, ids, mask, deterministic=False, rngs=rng
        )
        return (out * out).sum()

    g_p = jax.grad(lambda p: loss(p, plain))(params)
    g_r = jax.grad(lambda p: loss(p, remat))(params)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        )


def test_tower_gelu_variants():
    """tanh vs exact GELU share params/structure but differ numerically;
    the field threads through EncoderBlock to the actual activation."""
    import jax
    import jax.numpy as jnp

    from ultrafnd_git_tpu.models.transformer import TextTransformer

    kw = dict(width=32, depth=1, heads=4, vocab_size=64, max_len=8)
    ids = jnp.arange(16, dtype=jnp.int32).reshape(2, 8) % 63 + 1
    mask = jnp.ones((2, 8), jnp.float32)

    tanh = TextTransformer(**kw, gelu="tanh")
    exact = TextTransformer(**kw, gelu="exact")
    params = tanh.init(
        jax.random.PRNGKey(0), ids, mask, deterministic=True
    )["params"]
    o_t = np.asarray(
        tanh.apply({"params": params}, ids, mask, deterministic=True)
    )
    o_e = np.asarray(
        exact.apply({"params": params}, ids, mask, deterministic=True)
    )
    assert not np.array_equal(o_t, o_e)  # field actually switches the op
    np.testing.assert_allclose(o_t, o_e, atol=5e-2)  # same function family


@pytest.mark.slow
def test_tower_gelu_recorded_and_adopted(tower_ckpt, tmp_path):
    """Checkpoint meta records tower_gelu; metas that predate the field
    restore as exact-erf (the activation those towers were trained
    with), both via from_checkpoint and via trainer adoption."""
    import json
    import shutil

    from ultrafnd_git_tpu.models.transformer import DeviceTextEncoder
    from ultrafnd_git_tpu.training.trainer import ForensicTrainer, TrainConfig

    # new checkpoints record the production default and restore it
    meta_p = os.path.join(tower_ckpt["out"], "best", "meta.json")
    with open(meta_p, "r", encoding="utf-8") as fh:
        assert fh.read().find('"tower_gelu": "tanh"') >= 0
    enc = DeviceTextEncoder.from_checkpoint(tower_ckpt["out"])
    assert enc.module.gelu == "tanh"

    # a meta WITHOUT the field (pre-field checkpoint) restores exact
    legacy = tmp_path / "legacy_ckpt"
    shutil.copytree(tower_ckpt["out"], legacy)
    lp = legacy / "best" / "meta.json"
    with open(lp, "r", encoding="utf-8") as fh:
        meta = json.load(fh)
    meta["cfg"].pop("tower_gelu", None)
    with open(lp, "w", encoding="utf-8") as fh:
        json.dump(meta, fh)
    enc_legacy = DeviceTextEncoder.from_checkpoint(str(legacy))
    assert enc_legacy.module.gelu == "exact"

    # trainer-side adoption: eval_only on the legacy dir flips the
    # config from the tanh default to the trained exact activation
    cfg = TrainConfig(
        data_root=str(legacy),  # unused for adoption; cache comes below
        out_dir=str(legacy),
        eval_only=True,
        batch_size=8,
        epochs=0,
    )
    # only the __init__ adoption block is under test — skip the heavy
    # construction by reading the adopted field right after mutation
    try:
        ForensicTrainer(cfg)
    except Exception:
        pass  # data_root isn't a real corpus; adoption ran first
    assert cfg.tower_gelu == "exact"
    # architecture fields adopt too — heads is the silent one (attention
    # params are shape-identical for any head count, so a mismatched
    # restore would compute with the wrong head partition); the fixture
    # checkpoint trained depth=1/heads=4 vs the 2/6 defaults
    assert cfg.text_tower_depth == 1
    assert cfg.text_tower_heads == 4
