"""On-device transformer text tower (BERT-shaped) over the flash kernel.

The reference's only transformer towers are frozen HF torch models pulled
at runtime (`src/core_blocks/text_blocks.py:30-106`); offline it degrades
to a bag-of-words hash embedding. This module adds the tier between those
rungs: a BERT-shaped Flax encoder that
  * runs entirely on the TPU (tokenize on host -> one jitted forward for
    the whole corpus),
  * uses the Pallas fused attention kernel on TPU (XLA fallback elsewhere),
  * is trainable (so the text tower can be fine-tuned jointly — something
    the reference architecture never could),
  * produces the same contract as `BERTContextEncoder.encode`: mean-pooled
    masked hidden state, L2-normalized, width `dim` (default 768).

Tokenization is the stable-hash vocabulary (ops/hashing.fnv1a_64 modulo
vocab) — deterministic across processes, no downloaded vocab files.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ultrafnd_git_tpu.kernels.flash_attention import (
    flash_attention,
    padding_bias,
)
from ultrafnd_git_tpu.ops.hashing import fnv1a_64


def _hash_tokens(text: str) -> list:
    """Whitespace tokens, with CJK runs broken into single characters.

    FakeSV text is unsegmented Chinese — a whole title would otherwise
    hash to ONE vocabulary id, so a trained tower would see almost every
    serving-time string as an unseen (untrained-embedding) token.
    Character-level CJK ids make the train/serve vocabularies intersect
    the way subword vocabularies do.
    """
    out = []
    for tok in (text or "").split():
        run = ""
        for ch in tok:
            if "一" <= ch <= "鿿":
                if run:
                    out.append(run)
                    run = ""
                out.append(ch)
            else:
                run += ch
        if run:
            out.append(run)
    return out


def hash_tokenize_batch(
    texts: Sequence[str],
    max_len: int = 256,
    vocab_size: int = 32768,
    salt: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Stable hash ids (see _hash_tokens). Returns (ids, mask), (N, L).

    `salt=None` tokenizes under the process-wide draw (the trainer's
    `--hash_salt`); an explicit salt string pins the draw WITHOUT
    touching process state — used by DeviceTextEncoder.from_checkpoint
    so a tower trained under one salt can serve inside a process whose
    live featurization uses another.
    """
    from ultrafnd_git_tpu.ops.hashing import basis_for_salt

    basis = None if salt is None else basis_for_salt(salt)
    ids = np.zeros((len(texts), max_len), dtype=np.int32)
    mask = np.zeros((len(texts), max_len), dtype=np.float32)
    for i, text in enumerate(texts):
        toks = _hash_tokens(text)[:max_len]
        for j, t in enumerate(toks):
            # id 0 is reserved for padding
            ids[i, j] = 1 + (fnv1a_64(t, basis) % (vocab_size - 1))
        mask[i, : len(toks)] = 1.0
    return ids, mask


def coord_dropout(
    x: jnp.ndarray,
    rate: float,
    key: jax.Array,
    row0,
    pos0,
) -> jnp.ndarray:
    """Dropout whose mask depends only on GLOBAL (row, position) coords.

    mask[b, l, :] = bernoulli(fold_in(fold_in(key, row0+b), pos0+l))
    — a counter-mode draw, so a device that holds rows [row0, row0+B)
    and positions [pos0, pos0+L) of a sharded activation computes
    exactly the slice of the mask an unsharded forward would have drawn.
    This is what makes tower dropout EXACT under sequence/pipeline
    parallelism (parallel/{sequence,pipeline}.py run EncoderBlocks on
    slices inside shard_map, where a plain `nn.Dropout` would draw
    independent local masks per device). Same keep-prob scaling as
    `nn.Dropout`. Cost vs one big draw: the same bit volume plus one
    fold_in per (row, position) pair — O(1/width) relative overhead;
    MEASURED at parity on the real chip (tower depth 2, 512x64x768
    fwd+bwd: coord 66.2 ms p10 vs flax-stream 67.4 — within run noise).
    """
    b, l, w = x.shape
    rows = row0 + jnp.arange(b)
    poss = pos0 + jnp.arange(l)

    def row_masks(r):
        kr = jax.random.fold_in(key, r)
        return jax.vmap(
            lambda p: jax.random.bernoulli(
                jax.random.fold_in(kr, p), 1.0 - rate, (w,)
            )
        )(poss)

    keep = jax.vmap(row_masks)(rows)  # (B, L, W) bool
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


class MultiHeadAttention(nn.Module):
    """Fused-kernel MHA; heads*head_dim == width.

    `attention_backend` additionally accepts `"ring:<axis>"`: the module
    is then being applied INSIDE a shard_map whose sequence dimension is
    sharded over mesh axis `<axis>`, and attention runs as the ring
    recurrence (kernels/ring_attention.py) — `mask` is the LOCAL key
    slice's padding mask and rides the ring as an additive bias. Param
    structure ("qkv"/"out" Dense pair) is identical across backends, so
    the same trained weights serve plain, flash, and ring forwards.
    """

    width: int
    heads: int
    attention_backend: str = "auto"
    dtype: object = None  # bf16-compute lever (params stay f32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        if self.width % self.heads:
            raise ValueError(
                f"width={self.width} not divisible by heads={self.heads}"
            )
        b, s, _ = x.shape
        d = self.width // self.heads
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):
            return t.reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)

        if self.attention_backend.startswith("ring:"):
            from ultrafnd_git_tpu.kernels.ring_attention import (
                ring_attention_local,
            )

            axis = self.attention_backend.split(":", 1)[1]
            kbias = (
                (1.0 - mask.astype(jnp.float32)) * -1e9
            )[:, None, None, :]  # local-KEY padding bias, rides the ring
            out = ring_attention_local(
                heads_first(q), heads_first(k), heads_first(v), kbias, axis
            )
        else:
            out = flash_attention(
                heads_first(q),
                heads_first(k),
                heads_first(v),
                bias=padding_bias(mask, x.dtype),
                backend=self.attention_backend,
            )  # (B, H, S, D)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, self.width)
        return nn.Dense(self.width, dtype=self.dtype, name="out")(out)


class EncoderBlock(nn.Module):
    width: int
    heads: int
    mlp_ratio: int = 4
    dropout: float = 0.1
    attention_backend: str = "auto"
    dtype: object = None
    # MLP activation: "tanh" (default) or "exact". The tanh-approx GELU
    # fuses into the surrounding matmul pipeline on TPU while the exact
    # erf form costs a measured 2.6 ms/step at the tower_512 protocol
    # (BASELINE.md round-3 op ablation); this tower is our own
    # architecture (hash-tokenized), so the approximation is a free
    # design choice — checkpoints record it and restores adopt it, with
    # "exact" assumed for metas that predate the field.
    gelu: str = "tanh"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: jnp.ndarray,
        deterministic: bool = True,
        dropout_key: Optional[jax.Array] = None,
        coords=(0, 0),
    ) -> jnp.ndarray:
        """`dropout_key` selects the COORD dropout scheme: masks are a
        pure function of (key, global row, global position) — see
        coord_dropout — instead of flax's path-hashed 'dropout' rng
        stream. `coords = (row0, pos0)` are this activation slice's
        global offsets (nonzero only inside sequence/pipeline shard_map
        bodies). With dropout_key=None (the default) the original
        nn.Dropout behavior is unchanged — existing checkpoints, replays
        and the plain trainer path are bit-identical to round 3."""

        def drop(h, site):
            if deterministic or self.dropout <= 0.0:
                return h
            if dropout_key is None:
                return nn.Dropout(self.dropout)(h, deterministic=False)
            return coord_dropout(
                h,
                self.dropout,
                jax.random.fold_in(dropout_key, site),
                coords[0],
                coords[1],
            )

        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        h = MultiHeadAttention(
            self.width, self.heads, self.attention_backend,
            dtype=self.dtype, name="attn",
        )(h, mask)
        h = drop(h, 0)
        x = x + h

        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(self.mlp_ratio * self.width, dtype=self.dtype,
                     name="mlp_in")(h)
        h = nn.gelu(h, approximate=self.gelu != "exact")
        h = nn.Dense(self.width, dtype=self.dtype, name="mlp_out")(h)
        h = drop(h, 1)
        return x + h


class TextTransformer(nn.Module):
    """BERT-shaped encoder: ids (B, L) -> pooled (B, width), L2-normed."""

    width: int = 768
    depth: int = 4
    # 6x128 heads, not 12x64 — lane-width head dim, see
    # TrainConfig.text_tower_heads (BASELINE.md round-3 measurement)
    heads: int = 6
    vocab_size: int = 32768
    max_len: int = 256
    dropout: float = 0.1
    attention_backend: str = "auto"
    dtype: object = None  # bf16-compute lever (params stay f32)
    # Rematerialize each encoder block on the backward pass
    # (jax.checkpoint): the (B, L, 4W) MLP activations are recomputed
    # instead of stored, trading one extra forward's FLOPs per block for
    # O(depth * B * L * W) less live HBM — the lever that lets deep/long
    # joint fine-tunes (and grad_accum microbatches) fit one chip.
    # Numerically exact: same dropout rngs replay in the recompute
    # (asserted by tests/test_text_device_tower.py).
    remat: bool = False
    # moe_experts > 0 swaps every block's dense MLP for the switch-MoE
    # FFN (models/moe.py): top-1 routed experts as stacked (E, ...)
    # arrays whose E axis shards over an 'ep' mesh axis — the
    # width-scaling growth path. Pass return_aux=True to receive the
    # Switch aux loss (mean over blocks) alongside the pooled output.
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25
    # MLP activation — see EncoderBlock.gelu
    gelu: str = "tanh"

    @nn.compact
    def __call__(
        self,
        ids: jnp.ndarray,
        mask: jnp.ndarray,
        deterministic: bool = True,
        return_aux: bool = False,
        dropout_key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """`dropout_key` opts the blocks into the COORD dropout scheme
        (see EncoderBlock.__call__): per-block keys are folded from it by
        layer index, so the sequence/pipeline shard_map bodies — which
        apply the same blocks on slices with the same per-layer fold —
        draw the IDENTICAL masks and training under --sp/--pp is exact
        against this tower (tests/test_sequence.py, test_pipeline.py).
        None (default) keeps the flax 'dropout' rng stream — the plain
        path is bit-identical to round 3. Not supported with MoE blocks
        (--sp/--pp exclude --moe_experts at the trainer)."""
        if dropout_key is not None and self.moe_experts > 0:
            raise ValueError(
                "coord dropout (dropout_key) is not supported with MoE "
                "blocks — the trainer excludes --moe_experts under "
                "--sp/--pp"
            )
        x = nn.Embed(
            self.vocab_size, self.width, dtype=self.dtype, name="tok_embed"
        )(ids)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, self.max_len, self.width),
        )
        x = x + pos[:, : ids.shape[1]].astype(x.dtype)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_embed")(x)

        use_moe = self.moe_experts > 0
        if use_moe:
            # imported lazily: moe.py imports MultiHeadAttention from here
            from ultrafnd_git_tpu.models.moe import MoEEncoderBlock

            block_cls = MoEEncoderBlock
        else:
            block_cls = EncoderBlock
        if self.remat:
            # deterministic is arg 3 (static: it selects the dropout
            # branch at trace time); x/mask stay traced
            block_cls = nn.remat(block_cls, static_argnums=(3,))
        aux_total = jnp.zeros((), jnp.float32)
        for i in range(self.depth):
            kw = dict(
                dropout=self.dropout,
                attention_backend=self.attention_backend,
                dtype=self.dtype,
                gelu=self.gelu,
                name=f"block{i}",
            )
            if use_moe:
                kw.update(
                    num_experts=self.moe_experts,
                    capacity_factor=self.moe_capacity_factor,
                )
                out = block_cls(self.width, self.heads, **kw)(
                    x, mask, deterministic
                )
            else:
                out = block_cls(self.width, self.heads, **kw)(
                    x,
                    mask,
                    deterministic,
                    None if dropout_key is None
                    else jax.random.fold_in(dropout_key, i),
                )
            if use_moe:
                x, aux = out
                aux_total = aux_total + aux
            else:
                x = out

        x = nn.LayerNorm(name="ln_final")(x)  # final LN + pooling f32
        # mean-pool with mask, L2-normalize (the encode() contract,
        # reference text_blocks.py:69-106)
        m = mask[..., None]
        pooled = (x * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
        pooled = pooled / (
            jnp.linalg.norm(pooled, axis=-1, keepdims=True) + 1e-9
        )
        if return_aux:
            denom = jnp.float32(max(1, self.depth))
            return pooled, aux_total / denom
        return pooled


class DeviceTextEncoder:
    """Stateful convenience wrapper: corpus-wide jitted encoding.

    EXPERIMENTAL as an *encoder*: seeded params make the untrained tower
    a fixed random-feature map (reproducible, like TemporalSyncNet) — it
    is NOT a pretrained encoding until `load_params()` installs trained
    weights, and it warns once when used untrained. For pretrained
    on-device text encoding use `models/bert_flax.DeviceBertEncoder`
    (real HF weights), which the default ladder already routes through.
    """

    def __init__(
        self,
        dim: int = 768,
        depth: int = 4,
        heads: int = 6,
        max_len: int = 256,
        vocab_size: int = 32768,
        seed: int = 0,
        attention_backend: str = "auto",
        moe_experts: int = 0,
        init_params: bool = True,
        gelu: str = "tanh",
    ):
        self.max_len = max_len
        self.vocab_size = vocab_size
        self.dim = int(dim)
        self.module = TextTransformer(
            width=dim,
            depth=depth,
            heads=heads,
            vocab_size=vocab_size,
            max_len=max_len,
            attention_backend=attention_backend,
            moe_experts=moe_experts,
            gelu=gelu,
        )
        if init_params:
            ids = jnp.zeros((1, max_len), jnp.int32)
            mask = jnp.ones((1, max_len), jnp.float32)
            self.params = self.module.init(
                jax.random.PRNGKey(seed), ids, mask, deterministic=True
            )["params"]
        else:
            # caller installs params via load_params (skips a throwaway
            # random init of the full tower)
            self.params = None
        self.trained = False
        self._warned = False
        # None = tokenize under the process-wide draw; from_checkpoint
        # pins the salt the tower was TRAINED under (never mutates the
        # process-wide salt — other components keep their own draw)
        self.hash_salt: Optional[str] = None
        self._apply = jax.jit(
            lambda p, i, m: self.module.apply(
                {"params": p}, i, m, deterministic=True
            )
        )

    def load_params(self, params) -> None:
        """Install trained tower params (joint fine-tune output)."""
        self.params = params
        self.trained = True

    @classmethod
    def from_checkpoint(
        cls, out_dir: str, checkpoint_name: Optional[str] = None
    ) -> "DeviceTextEncoder":
        """Build an encoder serving the TRAINED tower of a
        `--train_text_tower` checkpoint (closes the fine-tune loop: the
        jointly-trained tower becomes a standalone text-encoder rung).

        Tries the `best` slot then `latest` (save_best=False runs write
        only `latest`). Raises on any failure — this constructor exists
        to serve TRAINED weights; a silent fallback to random features
        would defeat it. (Same-process async saves are barriered; a
        checkpoint mid-write by ANOTHER process can still fail restore —
        it raises here, like any corrupt slot.)
        """
        import json
        from pathlib import Path

        import orbax.checkpoint as ocp

        from ultrafnd_git_tpu.data.cache import TOWER_VOCAB
        from ultrafnd_git_tpu.training import checkpoint as ckpt

        ckpt.wait_for_writes()
        root = Path(out_dir)
        slots = (
            [checkpoint_name] if checkpoint_name else ["best", "latest"]
        )
        meta_path = None
        for slot in slots:
            cand = root / slot / "meta.json"
            if cand.exists():
                meta_path, checkpoint_name = cand, slot
                break
        if meta_path is None:
            raise FileNotFoundError(
                f"no checkpoint slot ({'/'.join(slots)}) under {root}"
            )
        with open(meta_path, "r", encoding="utf-8") as fh:
            meta = json.load(fh)
        saved_cfg = meta.get("cfg", {})
        if not saved_cfg.get("train_text_tower"):
            raise ValueError(
                f"checkpoint at {root} was not trained with "
                "--train_text_tower; nothing to serve"
            )
        restored = ocp.PyTreeCheckpointer().restore(
            str((root / checkpoint_name / "state").resolve())
        )
        tower_params = restored["params"]["text_tower"]
        embed = np.asarray(tower_params["tok_embed"]["embedding"])
        pos = np.asarray(tower_params["pos_embed"])
        enc = cls(
            dim=int(embed.shape[1]),  # trained width, not an assumption
            depth=int(saved_cfg.get("text_tower_depth", 2)),
            heads=int(saved_cfg.get("text_tower_heads", 12)),
            max_len=int(pos.shape[1]),
            vocab_size=int(embed.shape[0]) or TOWER_VOCAB,
            moe_experts=int(saved_cfg.get("moe_experts", 0)),
            init_params=False,  # load_params below installs the real ones
            # metas that predate the field were trained exact-erf
            gelu=str(saved_cfg.get("tower_gelu", "exact")),
        )
        enc.load_params(jax.tree.map(jnp.asarray, tower_params))
        # Tokenize with the hash draw the tower was TRAINED under (token
        # ids come from the salted stable hash) — pinned per-instance so
        # loading a tower never clobbers the process-wide salt mid-build.
        enc.hash_salt = str(saved_cfg.get("hash_salt", ""))
        return enc

    def encode_batch(
        self, texts: Sequence[str], batch_size: int = 512
    ) -> np.ndarray:
        if not self.trained and not self._warned:
            self._warned = True
            print(
                "⚠️  DeviceTextEncoder is serving UNTRAINED (seeded random) "
                "features — experimental rung; use the pretrained device "
                "BERT (default HF rung) or load_params() trained weights"
            )
        def bucket(n: int) -> int:
            # pad every chunk (including the first) up to a power-of-two
            # bucket so novel request sizes reuse a handful of compiled
            # shapes instead of tracing the tower per size
            b = 8
            while b < n:
                b *= 2
            return min(b, batch_size)

        out = []
        for s in range(0, len(texts), batch_size):
            chunk = list(texts[s : s + batch_size])
            pad = bucket(len(chunk)) - len(chunk)
            if pad:
                chunk = chunk + [""] * pad
            ids, mask = hash_tokenize_batch(
                chunk, self.max_len, self.vocab_size, salt=self.hash_salt
            )
            enc = np.asarray(
                self._apply(self.params, jnp.asarray(ids), jnp.asarray(mask))
            )
            out.append(enc[: len(chunk) - pad] if pad else enc)
        return (
            np.concatenate(out)
            if out
            else np.zeros((0, self.dim), np.float32)
        )
