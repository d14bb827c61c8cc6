"""Semantic forgery analysis: text/visual semantic-consistency signals.

Parity target: reference `src/models/semantic_forgery.py` —
`SemanticForgeryAnalyzer(batch{title, ocr}) -> {semantic_text,
semantic_image, semantic_gap}` (ref :119-157): CLIP's text tower encodes
titles and OCR strings (OCR acting as pseudo-vision, ref :110-117), two
projection MLPs (512 -> proj_dim, GELU, dropout 0.3) map them to the fusion
space, and `semantic_gap = l2n(text_proj - image_proj)` is the directional
discrepancy signal.

TPU-first differences:
  * the projector is a proper Flax module (`SemanticProjector`) so it can be
    trained jointly when wired into the fusion stack; the analyzer wrapper
    applies it jitted with seeded params (the reference never trains these
    projections either — they run freshly initialized, ref :73-85);
  * CLIP encoding is batched corpus-wide, and the HF rung runs ON the
    accelerator by default: the pretrained torch weights are transferred
    once into the Flax tower in models/clip_flax.py (host torch forward
    kept as fallback, `ULTRAFND_CLIP_DEVICE=0` forces it) — the same
    device-residency pattern as the BERT rung in models/bert_flax.py;
  * fallback ladder: CLIP text tower (HF, local-only) -> stable hash
    embedding. The reference returns all-zeros when CLIP is missing
    (ref :94-108) which silently zeroes the whole signal; the hash rung
    keeps the gap signal informative offline (set `zeros_fallback=True`
    for bit-compatible reference behavior).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ultrafnd_git_tpu.ops.hashing import hash_embed_batch
from ultrafnd_git_tpu.utils.config import ConfigManager
from ultrafnd_git_tpu.utils.hf import load_once


def l2n(x: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


@dataclass
class SemanticConfig:
    model_name: str = "openai/clip-vit-base-patch32"
    proj_dim: int = 512
    dropout: float = 0.3
    max_length: int = 64
    zeros_fallback: bool = False  # reference-exact offline behavior


class SemanticProjector(nn.Module):
    """Two projection branches + directional gap (trainable Flax module)."""

    proj_dim: int = 512
    dropout: float = 0.3

    @nn.compact
    def __call__(
        self,
        text_feat: jnp.ndarray,
        image_feat: jnp.ndarray,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        def branch(x, name):
            h = nn.Dense(self.proj_dim, name=f"{name}_dense")(x)
            h = nn.gelu(h, approximate=False)
            return nn.Dropout(self.dropout)(h, deterministic=deterministic)

        txt = branch(text_feat, "text")
        img = branch(image_feat, "vision")
        return {
            "semantic_text": l2n(txt),
            "semantic_image": l2n(img),
            "semantic_gap": l2n(txt - img),
        }


class SemanticForgeryAnalyzer:
    """CLIP-text semantic-consistency analyzer with a jitted projector."""

    def __init__(self, cfg: Optional[SemanticConfig] = None, seed: int = 0):
        self.cfg = cfg or SemanticConfig()
        self.module = SemanticProjector(
            proj_dim=self.cfg.proj_dim, dropout=self.cfg.dropout
        )
        # Projector params are initialized LAZILY at the first forward,
        # against the encoder's ACTUAL feature width — CLIP variants are
        # configurable (ViT-L text features are 768-d, not 512) and a
        # hardcoded init width would shape-crash the first apply.
        self._seed = seed
        self.params = None
        self._param_width: Optional[int] = None
        self._apply = jax.jit(
            lambda p, t, v: self.module.apply(p, t, v, deterministic=True)
        )
        self.out_dim = self.cfg.proj_dim
        # state for the build-once device-CLIP rung (models/clip_flax.py)
        self._device_clip = None
        self._device_clip_tried = False

    def _ensure_params(self, width: int) -> None:
        if self.params is None or self._param_width != width:
            dummy = jnp.zeros((1, width), jnp.float32)
            self.params = self.module.init(
                jax.random.PRNGKey(self._seed), dummy, dummy,
                deterministic=True,
            )
            self._param_width = width

    @classmethod
    def from_config(
        cls,
        config_path: str = "configs/model_configs/semantic.yaml",
        seed: int = 0,
    ) -> "SemanticForgeryAnalyzer":
        raw = ConfigManager().load_config(config_path)
        return cls(
            SemanticConfig(
                model_name=str(
                    raw.get("model_name", "openai/clip-vit-base-patch32")
                ),
                proj_dim=int(raw.get("dim", raw.get("proj_dim", 512))),
                dropout=float(raw.get("dropout", 0.3)),
                max_length=int(raw.get("max_length", 64)),
                zeros_fallback=bool(raw.get("zeros_fallback", False)),
            ),
            seed=seed,
        )

    # -- CLIP text tower ---------------------------------------------------
    def _clip(self):
        name = self.cfg.model_name

        def loader():
            import torch
            from transformers import AutoTokenizer, CLIPModel

            tok = AutoTokenizer.from_pretrained(name, local_files_only=True)
            model = CLIPModel.from_pretrained(name, local_files_only=True)
            model.eval()
            return (torch, tok, model)

        return load_once(f"clip:{name}", loader)

    def _device_clip_rung(self, tok, model):
        """Device-resident pretrained rung: HF weights in the Flax tower
        (models/clip_flax.py); lazily built, opt-out ULTRAFND_CLIP_DEVICE=0.
        Same build-once ladder shape as text.py/audio.py (utils.hf helper)."""
        import os

        if not self._device_clip_tried:
            self._device_clip_tried = True
            if os.environ.get("ULTRAFND_CLIP_DEVICE", "1") == "1":
                from ultrafnd_git_tpu.utils.hf import try_build_device_rung

                def _build():
                    from ultrafnd_git_tpu.models.clip_flax import (
                        DeviceClipTextEncoder,
                    )

                    return DeviceClipTextEncoder(
                        model, tok, max_length=self.cfg.max_length
                    )

                self._device_clip = try_build_device_rung("CLIP", _build)
        return self._device_clip

    def encode_text(self, texts: Sequence[str]) -> np.ndarray:
        """Batch of strings -> (B, 512) L2-normalized CLIP-text features."""
        texts = [t or "" for t in texts]
        clip = self._clip()
        if clip is not None:
            torch, tok, model = clip
            device_clip = self._device_clip_rung(tok, model)
            if device_clip is not None:
                try:
                    return device_clip.encode_batch(texts)
                except Exception as exc:
                    print(
                        f"⚠️  device CLIP forward failed ({exc!r}); "
                        "falling back to host torch"
                    )
                    self._device_clip = None
            try:
                with torch.inference_mode():
                    toks = tok(
                        list(texts),
                        padding=True,
                        truncation=True,
                        max_length=self.cfg.max_length,
                        return_tensors="pt",
                    )
                    feats = model.get_text_features(**toks).numpy()
                norms = np.linalg.norm(feats, axis=-1, keepdims=True) + 1e-9
                return (feats / norms).astype(np.float32)
            except Exception:
                pass
        if self.cfg.zeros_fallback:
            return np.zeros((len(texts), 512), dtype=np.float32)
        return hash_embed_batch(texts, 512, max_tokens=512)

    def encode_image_like(self, texts: Sequence[str]) -> np.ndarray:
        """Pseudo-vision features from OCR/title strings (ref :110-117)."""
        return self.encode_text(texts)

    # -- forward -------------------------------------------------------------
    def __call__(self, batch: Dict[str, Any]) -> Dict[str, np.ndarray]:
        return self.forward(batch)

    def forward(self, batch: Dict[str, Any]) -> Dict[str, np.ndarray]:
        """batch{title: list[str], ocr: list[str]} -> three (B, proj_dim)."""
        titles: List[str] = list(batch.get("title") or [])
        ocrs: List[str] = list(batch.get("ocr") or [])
        b = max(len(titles), len(ocrs), 1)
        titles += [""] * (b - len(titles))
        ocrs += [""] * (b - len(ocrs))

        txt = jnp.asarray(self.encode_text(titles))
        img = jnp.asarray(self.encode_image_like(ocrs))
        self._ensure_params(int(txt.shape[-1]))
        out = self._apply(self.params, txt, img)
        return {k: np.asarray(v) for k, v in out.items()}

    def gap_magnitude(
        self, titles: Sequence[str], ocrs: Sequence[str]
    ) -> np.ndarray:
        """Scalar per-sample semantic discrepancy in [0, 1]: half the L2
        distance between the normalized *encoder* features of title vs OCR
        (identical inputs -> 0). The branch projections are deliberately not
        used here — with untrained branches they add a constant offset
        between the two towers that would mask the actual discrepancy."""
        b = max(len(titles), len(ocrs))
        titles = list(titles) + [""] * (b - len(titles))
        ocrs = list(ocrs) + [""] * (b - len(ocrs))
        txt = self.encode_text(titles)  # already L2-normalized rows
        img = self.encode_image_like(ocrs)
        d = np.linalg.norm(txt - img, axis=-1)
        return np.clip(0.5 * d, 0.0, 1.0).astype(np.float32)
