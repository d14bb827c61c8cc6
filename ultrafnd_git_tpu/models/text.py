"""Text encoding with a graceful-degradation ladder.

Parity target: reference `src/core_blocks/text_blocks.py`:
  * BERT mean-pooled-with-mask last hidden state, L2-normed, pad/trunc to
    768 (ref :69-106), falling back to a bag-of-hashed-tokens embedding
    (ref :19-27) when no HF model is available.
  * `encode_fields` averages title + OCR + up to 10 comments (ref :108-128).
  * `SemanticAlignmentLayer` no-op averager (ref :133-141) and
    `MultilingualEmbedding` alias (ref :144-150).

TPU-first differences:
  * every API has a *_batch variant — the cache builder encodes the whole
    corpus in a handful of forwards instead of one forward per string
    (kills reference hot loop #1, SURVEY §3.1).
  * the HF rung itself runs ON the accelerator by default: pretrained
    torch weights are transferred once into the Flax tower in
    models/bert_flax.py (Pallas attention on TPU), with the host torch
    forward kept as the fallback (`ULTRAFND_BERT_DEVICE=0` forces it).
  * the hash fallback uses a stable FNV-1a hash (reproducible).
  * HF weights load with local_files_only=True: cached weights are used,
    a cold cache falls back instantly instead of hitting the network.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ultrafnd_git_tpu.ops.hashing import hash_embed, hash_embed_batch

_DEFAULT_MODEL = "bert-base-uncased"
_DIM = 768


def _fit_dim(vec: np.ndarray, dim: int) -> np.ndarray:
    if vec.shape[-1] == dim:
        return vec
    if vec.shape[-1] > dim:
        return vec[..., :dim]
    out = np.zeros(vec.shape[:-1] + (dim,), dtype=np.float32)
    out[..., : vec.shape[-1]] = vec
    return out


class BERTContextEncoder:
    """768-D text encoder ladder: HF BERT (on-device) -> tower -> hash.

    The HF rung itself runs on the accelerator with REAL pretrained
    weights via models/bert_flax.py (host torch fallback).

    The middle rung (opt-in via `use_device_tower=True` or
    `ULTRAFND_TEXT_DEVICE=1`) is EXPERIMENTAL: the hash-vocab
    `TextTransformer` over the Pallas kernel emits seeded RANDOM features
    until its params are trained by a joint fine-tune (no trainer wires
    them today) — structurally a fixed random-feature map, not a
    pretrained encoding. It warns when engaged untrained; kept opt-in so
    the default offline behavior matches the reference's hash fallback.
    """

    def __init__(
        self,
        model_name: str = _DEFAULT_MODEL,
        dim: int = _DIM,
        max_length: int = 256,
        hf_batch_size: int = 64,
        use_device_tower: Optional[bool] = None,
    ):
        import os

        self.dim = int(dim)
        self.max_length = int(max_length)
        self.hf_batch_size = int(hf_batch_size)
        if use_device_tower is None:
            use_device_tower = (
                os.environ.get("ULTRAFND_TEXT_DEVICE", "0") == "1"
            )
        self._device_tower = None
        self._want_device_tower = bool(use_device_tower)
        from ultrafnd_git_tpu.utils.hf import load_once

        def _loader():
            import torch  # host-side feature extraction only
            from transformers import AutoModel, AutoTokenizer

            tok = AutoTokenizer.from_pretrained(model_name, local_files_only=True)
            model = AutoModel.from_pretrained(model_name, local_files_only=True)
            model.eval()
            return torch, tok, model

        loaded = load_once(f"text:{model_name}", _loader)
        if loaded is not None:
            self._torch, self.tok, self.model = loaded
            self.use_hf = True
        else:
            self.tok = None
            self.model = None
            self.use_hf = False
        # Device-resident pretrained rung (VERDICT r1 item 2): the same HF
        # weights transferred once into the Flax tower; lazily built at
        # first encode, opt-out via ULTRAFND_BERT_DEVICE=0. BERT-shaped
        # checkpoints only — RoBERTa/XLM-R keep the host-torch rung.
        self._device_bert = None
        self._device_bert_tried = not (
            self.use_hf
            and os.environ.get("ULTRAFND_BERT_DEVICE", "1") == "1"
            and getattr(self.model.config, "model_type", "") == "bert"
        )

    # ------------------------------------------------------------------
    def _device_bert_rung(self):
        if not self._device_bert_tried:
            self._device_bert_tried = True
            from ultrafnd_git_tpu.utils.hf import try_build_device_rung

            def _build():
                from ultrafnd_git_tpu.models.bert_flax import (
                    DeviceBertEncoder,
                )

                return DeviceBertEncoder(
                    self.model,
                    self.tok,
                    dim=self.dim,
                    max_length=self.max_length,
                )

            self._device_bert = try_build_device_rung("BERT", _build)
        return self._device_bert

    def _hf_encode_batch(self, texts: Sequence[str]) -> np.ndarray:
        device_bert = self._device_bert_rung()
        if device_bert is not None:
            try:
                return device_bert.encode_batch(texts)
            except Exception as exc:
                print(
                    f"⚠️  device BERT forward failed ({exc!r}); "
                    "falling back to host torch"
                )
                self._device_bert = None
        torch = self._torch
        outs: List[np.ndarray] = []
        with torch.inference_mode():
            for s in range(0, len(texts), self.hf_batch_size):
                chunk = list(texts[s : s + self.hf_batch_size])
                enc = self.tok(
                    chunk,
                    return_tensors="pt",
                    padding=True,
                    truncation=True,
                    max_length=self.max_length,
                )
                hidden = self.model(**enc).last_hidden_state  # [B, L, H]
                mask = enc["attention_mask"].unsqueeze(-1).float()
                rep = (hidden * mask).sum(dim=1) / mask.sum(dim=1).clamp_min(1e-6)
                outs.append(rep.float().numpy())
        vecs = _fit_dim(np.concatenate(outs, axis=0), self.dim)
        norms = np.linalg.norm(vecs, axis=-1, keepdims=True)
        return (vecs / (norms + 1e-9)).astype(np.float32)

    # ------------------------------------------------------------------
    def _tower(self):
        if self._device_tower is None and self._want_device_tower:
            import os

            from ultrafnd_git_tpu.models.transformer import DeviceTextEncoder

            # ULTRAFND_TEXT_DEVICE_CKPT=<out_dir>: serve the TRAINED
            # tower of a --train_text_tower checkpoint instead of the
            # experimental seeded one. Failures RAISE — the user asked
            # for trained weights; silently degrading to random features
            # would poison every downstream cache/score.
            ckpt_dir = os.environ.get("ULTRAFND_TEXT_DEVICE_CKPT")
            if ckpt_dir:
                self._device_tower = DeviceTextEncoder.from_checkpoint(
                    ckpt_dir
                )
                return self._device_tower
            self._device_tower = DeviceTextEncoder(
                dim=self.dim,
                heads=max(1, self.dim // 64),  # 64-wide heads, dim-divisible
                max_len=self.max_length,
                seed=0,
            )
        return self._device_tower

    def encode(self, text: Optional[str]) -> np.ndarray:
        if not text:
            return np.zeros(self.dim, dtype=np.float32)
        if self.use_hf:
            try:
                return self._hf_encode_batch([text])[0]
            except Exception:
                pass
        tower = self._tower()
        if tower is not None:
            return tower.encode_batch([text])[0]
        return hash_embed(text, self.dim)

    def _encode_nonempty(self, texts, row_encoder) -> np.ndarray:
        """Route non-empty rows through `row_encoder`, zeros elsewhere —
        the one copy of the empty-string scatter semantics."""
        nonempty = [i for i, t in enumerate(texts) if t]
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        if nonempty:
            out[nonempty] = row_encoder([texts[i] for i in nonempty])
        return out

    def encode_batch(self, texts: Sequence[str]) -> np.ndarray:
        """Encode many strings at once; empty strings map to zero vectors."""
        import os

        texts = list(texts)
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        # An explicitly-requested TRAINED tower outranks the HF rung —
        # otherwise a cached bert-base would silently shadow the
        # fine-tuned weights the user pointed at.
        if (
            self._want_device_tower
            and os.environ.get("ULTRAFND_TEXT_DEVICE_CKPT")
        ):
            return self._encode_nonempty(texts, self._tower().encode_batch)
        if self.use_hf:
            try:
                return self._encode_nonempty(texts, self._hf_encode_batch)
            except Exception:
                pass
        tower = self._tower()
        if tower is not None:
            return self._encode_nonempty(texts, tower.encode_batch)
        return hash_embed_batch(texts, self.dim)

    def encode_fields(
        self,
        title: Optional[str],
        ocr: Optional[str],
        comments: Optional[List[str]],
    ) -> np.ndarray:
        """Average title + OCR + up to 10 non-empty comments; L2 norm."""
        parts = [t for t in [title, ocr, *(comments or [])[:10]] if t]
        if not parts:
            return np.zeros(self.dim, dtype=np.float32)
        vecs = self.encode_batch(parts)
        v = vecs.mean(axis=0)
        return (v / (np.linalg.norm(v) + 1e-9)).astype(np.float32)

    def encode_fields_batch(self, records: Sequence[Dict]) -> np.ndarray:
        """Corpus-wide `encode_fields`: one encoder pass over all strings.

        records: iterable of dicts with title / ocr / comments keys.
        Returns (N, dim) float32.
        """
        flat: List[str] = []
        owners: List[int] = []
        for i, rec in enumerate(records):
            parts = [
                t
                for t in [
                    rec.get("title"),
                    rec.get("ocr"),
                    *((rec.get("comments") or [])[:10]),
                ]
                if t
            ]
            flat.extend(parts)
            owners.extend([i] * len(parts))

        n = len(records)
        out = np.zeros((n, self.dim), dtype=np.float32)
        if not flat:
            return out
        vecs = self.encode_batch(flat)
        counts = np.zeros((n, 1), dtype=np.float32)
        np.add.at(out, np.asarray(owners), vecs)
        np.add.at(counts, (np.asarray(owners), np.zeros(len(owners), int)), 1.0)
        np.divide(out, counts, out=out, where=counts > 0)
        norms = np.linalg.norm(out, axis=-1, keepdims=True)
        np.divide(out, norms + 1e-9, out=out, where=norms > 0)
        return out.astype(np.float32)


class SemanticAlignmentLayer:
    """Safe no-op baseline: normalized average of two text vectors."""

    def __init__(self, dim: int = _DIM):
        self.dim = dim

    def align(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        if a is None or b is None or a.size == 0 or b.size == 0:
            return np.zeros(self.dim, dtype=np.float32)
        v = 0.5 * (a.astype(np.float32) + b.astype(np.float32))
        return (v / (np.linalg.norm(v) + 1e-9)).astype(np.float32)


class MultilingualEmbedding(BERTContextEncoder):
    """XLM-R alias (requires sentencepiece weights cached locally)."""

    def __init__(
        self,
        model_name: str = "xlm-roberta-base",
        dim: int = _DIM,
        max_length: int = 256,
    ):
        super().__init__(model_name=model_name, dim=dim, max_length=max_length)
