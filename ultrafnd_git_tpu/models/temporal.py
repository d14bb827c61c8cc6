"""Temporal synchronization / cross-modal alignment.

Parity target: reference `src/core_blocks/temporal_blocks.py`:
  * `TemporalSyncNet.align(t, v)` (ref :103-140) — an MLP over the
    interaction features [t, v, t-v, t*v, cos(t,v)] producing an out_dim
    temporal-consistency embedding. The reference runs it one sample at a
    time under inference_mode with randomly initialized weights; here it is
    a Flax module applied to the whole corpus in one jitted batch.
  * optional dilated-TCN sequence path (ref :16-44,145-160).
  * `delay_score(audio_len, video_len)` (ref :166-174).
  * `estimate_av_lag(...)` FFT cross-correlation (ref :177-223).
"""
from __future__ import annotations

from typing import Union, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ultrafnd_git_tpu.models.initializers import torch_dense


def _pad_or_trunc(v: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Pad with zeros / truncate last axis to `dim` (static shapes only)."""
    d = v.shape[-1]
    if d == dim:
        return v
    if d > dim:
        return v[..., :dim]
    pad = [(0, 0)] * (v.ndim - 1) + [(0, dim - d)]
    return jnp.pad(v, pad)


def cosine01(x: jnp.ndarray, y: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Row-wise cosine similarity mapped nowhere — raw in [-1, 1], keepdims."""
    xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)
    yn = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + eps)
    return jnp.sum(xn * yn, axis=-1, keepdims=True)


class TemporalAlignMLP(nn.Module):
    """[t, v, t-v, t*v, cos] -> MLP(4D+1 -> 2*out -> out)."""

    in_dim: int = 768
    out_dim: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self, t: jnp.ndarray, v: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        v = _pad_or_trunc(v, self.in_dim)
        t = _pad_or_trunc(t, self.in_dim)
        feat = jnp.concatenate(
            [t, v, t - v, t * v, cosine01(t, v)], axis=-1
        )  # (B, 4D+1)
        # torch-default init matters doubly here: the reference never
        # trains this MLP, so the init distribution IS the feature map
        # (and the aux delay-proxy statistics downstream of it)
        h = torch_dense(2 * self.out_dim, feat.shape[-1], name="proj_in")(
            feat
        )
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return torch_dense(self.out_dim, h.shape[-1], name="proj_out")(h)


class TinyTCN(nn.Module):
    """Dilated 1-D conv stack for optional sequence inputs (B, T, C)."""

    hid: int = 128
    layers: int = 2
    kernel: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = x
        for i in range(self.layers):
            z = nn.Conv(
                self.hid,
                kernel_size=(self.kernel,),
                kernel_dilation=(2**i,),
                padding="SAME",
                name=f"conv{i}",
            )(h)
            z = nn.LayerNorm(name=f"norm{i}")(z)
            z = nn.gelu(z)
            z = nn.Dropout(self.dropout)(z, deterministic=deterministic)
            h = h + z if z.shape == h.shape else z
        return h  # (B, T, hid)


class TemporalSequenceHead(nn.Module):
    """Sequence-aware path: concat text/visual sequences -> TCN -> pooled head."""

    out_dim: int = 256
    hid: int = 128
    layers: int = 2
    kernel: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        text_seq: jnp.ndarray,
        vis_seq: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = jnp.concatenate([text_seq, vis_seq], axis=-1)  # (B, T, 2D)
        h = TinyTCN(self.hid, self.layers, self.kernel, self.dropout)(
            x, deterministic=deterministic
        )
        pooled = jnp.concatenate([h.mean(axis=1), h.max(axis=1)], axis=-1)
        return nn.Dense(self.out_dim, name="head")(pooled)


class TemporalSyncNet:
    """Stateful convenience wrapper owning deterministic params.

    The reference never trains this module — `align` runs under
    inference_mode on freshly initialized weights — so the cache features are
    a fixed random projection. We make that projection *reproducible* by
    seeding param init, and batched by applying it corpus-wide under jit.
    """

    def __init__(
        self,
        in_dim: int = 768,
        out_dim: int = 256,
        dropout: float = 0.1,
        seed: int = 0,
    ):
        self.in_dim = int(in_dim)
        self.out_dim = int(out_dim)
        self.module = TemporalAlignMLP(self.in_dim, self.out_dim, dropout)
        dummy = jnp.zeros((1, self.in_dim), jnp.float32)
        self.params = self.module.init(
            jax.random.PRNGKey(seed), dummy, dummy, deterministic=True
        )
        # Stays on the DEFAULT backend deliberately: pinning this to the
        # host CPU was tried to dodge the tunnel's ~90 ms dispatch, but
        # at corpus-size batches the (B, 4D+1)->512->256 MLP is ~GFLOPs
        # — seconds on a 1-core host vs sub-ms on the chip (measured:
        # TPU serving dropped 578 -> 300 records/s with the CPU pin).
        self._apply = jax.jit(
            lambda p, t, v: self.module.apply(p, t, v, deterministic=True)
        )

    def align(
        self,
        text_vec: Union[np.ndarray, jnp.ndarray],
        visual_vec: Union[np.ndarray, jnp.ndarray],
    ) -> np.ndarray:
        """Single-pair alignment -> (out_dim,) numpy (reference-shaped API)."""
        t = jnp.asarray(text_vec, jnp.float32)[None, :]
        v = jnp.asarray(visual_vec, jnp.float32)
        v = _pad_or_trunc(v[None, :], self.in_dim)
        return np.asarray(self._apply(self.params, t, v))[0]

    def align_batch(self, T: np.ndarray, V: np.ndarray) -> np.ndarray:
        """Corpus-wide alignment: (N, in_dim) x (N, Dv) -> (N, out_dim)."""
        t = jnp.asarray(T, jnp.float32)
        v = _pad_or_trunc(jnp.asarray(V, jnp.float32), self.in_dim)
        return np.asarray(self._apply(self.params, t, v))

    def align_batch_pair(
        self, T: np.ndarray, V: np.ndarray
    ) -> tuple:
        """(align(T, V), align(T, T)) in ONE device dispatch + fetch.

        The cache builder needs both the text-visual alignment and the
        text-self reference alignment (for the delay proxy). The align
        MLP is row-wise, so batching the two calls as one 2N-row forward
        is exact — and on the tunneled chip it halves the featurizer's
        device round trips, which ARE the serving featurize() floor
        (~90 ms per dispatch; BASELINE.md round-3 serving table).
        """
        t = jnp.asarray(T, jnp.float32)
        v = _pad_or_trunc(jnp.asarray(V, jnp.float32), self.in_dim)
        both = self._apply(
            self.params,
            jnp.concatenate([t, t], axis=0),
            jnp.concatenate([v, t], axis=0),
        )
        both = np.asarray(both)
        n = T.shape[0]
        return both[:n], both[n:]

    @staticmethod
    def delay_score(audio_len: int, video_len: int) -> float:
        """Length-mismatch proxy in [0,1]; 0 = matched."""
        a = float(max(0, audio_len))
        v = float(max(0, video_len))
        m = max(1.0, max(a, v))
        return float(abs(a - v) / m)

    @staticmethod
    def estimate_av_lag(
        audio_envelope: np.ndarray,
        mouth_open: np.ndarray,
        sr: float = 16000.0,
        fps: Optional[float] = None,
        max_lag_s: float = 0.5,
    ) -> float:
        """FFT cross-correlation A/V lag in seconds.

        Sign convention (asserted by tests/test_review_fixes.py and
        tests/test_evidence.py): **positive = the audio arrives LATE**
        (audio delayed relative to the video signal); negative = audio
        leads.

        `fps`: sample rate of `mouth_open` when it is a per-frame video
        signal; it is resampled to `sr` before correlating. None means
        both signals already share rate `sr`. (The reference accepts fps
        but never uses it and silently correlates mismatched rates,
        chronos_guard.py:176-196 — implemented as intended here.)
        """
        a = np.asarray(audio_envelope, dtype=np.float32).ravel()
        m = np.asarray(mouth_open, dtype=np.float32).ravel()
        if fps is not None and fps > 0 and fps != sr and m.size > 1:
            t_m = np.arange(m.size) / float(fps)
            t_target = np.arange(int(t_m[-1] * sr) + 1) / float(sr)
            m = np.interp(t_target, t_m, m).astype(np.float32)
        L = min(len(a), len(m))
        if L < 4:
            return 0.0
        a = (a[:L] - a[:L].mean()) / (a[:L].std() + 1e-9)
        m = (m[:L] - m[:L].mean()) / (m[:L].std() + 1e-9)

        n = 1
        while n < 2 * L:
            n <<= 1
        xc = np.fft.irfft(np.fft.rfft(a, n) * np.conj(np.fft.rfft(m, n)), n)
        xc = np.concatenate([xc[-(L - 1):], xc[:L]])

        max_lag = int(max_lag_s * sr)
        center = len(xc) // 2
        lo = max(0, center - max_lag)
        hi = min(len(xc), center + max_lag + 1)
        lag_samples = (lo + int(np.argmax(xc[lo:hi]))) - center
        return float(lag_samples / sr)
