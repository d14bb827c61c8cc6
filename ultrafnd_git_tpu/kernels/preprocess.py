"""Device-side CV preprocessing stage (SURVEY §7 step 8, second half).

The reference's v1 pipeline decodes media on host and then ALSO computes
every CV feature on host (`src/training/run_train_eval.py:286-421`,
`src/core_blocks/visual_blocks.py:129-258`) — dense optical flow alone is
~0.5 s/clip of single-threaded OpenCV. Here everything AFTER codec decode
runs as ONE jitted program on the accelerator, consuming decoded uint8
frame stacks and producing HBM-resident feature blocks:

  * bilinear resize to the model raster + RGB->grayscale,
  * dense optical flow via coarse-to-fine pyramidal Lucas-Kanade — box
    sums (`lax.reduce_window`), central differences and bilinear warps:
    dense VPU-friendly ops, no OpenCV, fully batched over (clip, pair),
  * the OpticalFlow3DCNN temporal-pyramid statistics (mean/std/max
    magnitude + 8-bin orientation histogram per segment, tiled to dim and
    L2-normalized — same layout as `models/visual.py:_pool_flow`),
  * the ChronosGuard cues: 32-bin density-histogram L1 diffs (scene-cut
    proxy) and per-pair mean flow magnitude (`models/chronos.py:52-94`).

Host keeps codec decode and the JPEG re-encode inside ELA (SURVEY §7
"hard parts": no Pallas ports of codecs). The host cv2 ladder remains the
fallback rung — `ULTRAFND_DEVICE_CV=0` or any device failure routes back
to `OpticalFlow3DCNN`/`ChronosGuard` unchanged.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

RASTER = 256  # model raster (reference resizes every frame to 256x256)


# ----------------------------------------------------------------------
# Color / raster normalization
# ----------------------------------------------------------------------

def gray_resize(frames: jnp.ndarray, size: int = RASTER) -> jnp.ndarray:
    """(B, T, H, W, 3) uint8/float -> (B, T, size, size) float32 grayscale."""
    f = frames.astype(jnp.float32)
    g = 0.2989 * f[..., 0] + 0.5870 * f[..., 1] + 0.1140 * f[..., 2]
    b, t = g.shape[:2]
    if g.shape[2] != size or g.shape[3] != size:
        g = jax.image.resize(g, (b, t, size, size), method="bilinear")
    return g


# ----------------------------------------------------------------------
# Pyramidal Lucas-Kanade dense flow
# ----------------------------------------------------------------------

def _pyr_down(x: jnp.ndarray) -> jnp.ndarray:
    """2x average-pool downsample of (H, W)."""
    return (
        lax.reduce_window(x, 0.0, lax.add, (2, 2), (2, 2), "VALID") * 0.25
    )


def _box(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(2r+1)^2 box sum, SAME padding."""
    w = 2 * r + 1
    return lax.reduce_window(x, 0.0, lax.add, (w, w), (1, 1), "SAME")


def _bilinear(img: jnp.ndarray, yy: jnp.ndarray, xx: jnp.ndarray):
    """Sample (H, W) image at float coords (clamped to the border)."""
    h, w = img.shape
    y0f = jnp.floor(yy)
    x0f = jnp.floor(xx)
    wy = yy - y0f
    wx = xx - x0f
    y0 = jnp.clip(y0f, 0, h - 1).astype(jnp.int32)
    x0 = jnp.clip(x0f, 0, w - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ia = img[y0, x0]
    ib = img[y0, x1]
    ic = img[y1, x0]
    id_ = img[y1, x1]
    return (
        ia * (1 - wy) * (1 - wx)
        + ib * (1 - wy) * wx
        + ic * wy * (1 - wx)
        + id_ * wy * wx
    )


def _lk_refine(
    g0: jnp.ndarray,
    g1: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    r: int,
    iters: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Iterative LK update at one pyramid level.

    Solves the windowed 2x2 normal equations
    [Sxx Sxy; Sxy Syy] [du dv]^T = -[Sxt Syt]^T per pixel.
    """
    h, w = g0.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    ix = (jnp.roll(g0, -1, axis=1) - jnp.roll(g0, 1, axis=1)) * 0.5
    iy = (jnp.roll(g0, -1, axis=0) - jnp.roll(g0, 1, axis=0)) * 0.5
    sxx = _box(ix * ix, r)
    sxy = _box(ix * iy, r)
    syy = _box(iy * iy, r)
    det = sxx * syy - sxy * sxy
    ok = det > 1e-3
    safe_det = jnp.maximum(det, 1e-3)

    for _ in range(iters):
        g1w = _bilinear(g1, yy + v, xx + u)
        it = g1w - g0
        sxt = _box(ix * it, r)
        syt = _box(iy * it, r)
        du = jnp.where(ok, -(syy * sxt - sxy * syt) / safe_det, 0.0)
        dv = jnp.where(ok, -(sxx * syt - sxy * sxt) / safe_det, 0.0)
        u = u + du
        v = v + dv
    return u, v


def lucas_kanade(
    g0: jnp.ndarray,
    g1: jnp.ndarray,
    levels: int = 3,
    win_radius: int = 3,
    iters: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense coarse-to-fine flow for one frame pair: (H, W) -> u, v."""
    p0, p1 = [g0], [g1]
    for _ in range(levels - 1):
        p0.append(_pyr_down(p0[-1]))
        p1.append(_pyr_down(p1[-1]))
    u = jnp.zeros_like(p0[-1])
    v = jnp.zeros_like(p0[-1])
    for lvl in range(levels - 1, -1, -1):
        if lvl < levels - 1:
            u = 2.0 * jax.image.resize(u, p0[lvl].shape, method="bilinear")
            v = 2.0 * jax.image.resize(v, p0[lvl].shape, method="bilinear")
        u, v = _lk_refine(p0[lvl], p1[lvl], u, v, win_radius, iters)
    return u, v


# ----------------------------------------------------------------------
# Pooled statistics (device mirrors of the host feature layouts)
# ----------------------------------------------------------------------

def _segment_bounds(t: int, n_pyr: int):
    """Static (a, b) slices of models/visual.py:_pool_flow's pyramid."""
    bounds = []
    for level in range(n_pyr):
        parts = 2 ** level
        seg = max(1, t // parts)
        for p in range(parts):
            a = p * seg
            b = (p + 1) * seg if p < parts - 1 else t
            bounds.append((a, b))
    return bounds


def flow_stats(
    mag: jnp.ndarray, ang: jnp.ndarray, n_pyr: int = 3, dim: int = 256
) -> jnp.ndarray:
    """(T-1, H, W) magnitude/orientation -> pooled (dim,) feature.

    Identical layout to OpticalFlow3DCNN._pool_flow: per pyramid segment
    [mean, std, max] of the time-averaged magnitude map + the 8-bin
    histogram of the time-averaged orientation map, tiled to `dim` and
    L2-normalized.
    """
    feats = []
    for a, b in _segment_bounds(mag.shape[0], n_pyr):
        m = mag[a:b].mean(axis=0)
        an = ang[a:b].mean(axis=0)
        feats.extend([m.mean(), m.std(), m.max()])
        idx = jnp.clip(jnp.floor(an * 8.0), 0, 7).astype(jnp.int32)
        hist = jnp.stack(
            [(idx == k).sum().astype(jnp.float32) for k in range(8)]
        )
        feats.append(hist)
    flat = jnp.concatenate(
        [f.reshape(-1) if hasattr(f, "reshape") else jnp.array([f])
         for f in map(jnp.asarray, feats)]
    )
    reps = -(-dim // flat.shape[0])  # ceil
    tiled = jnp.tile(flat, reps)[:dim]
    return tiled / (jnp.linalg.norm(tiled) + 1e-9)


def density_histograms(gray: jnp.ndarray, bins: int = 32) -> jnp.ndarray:
    """(T, H, W) grayscale in [0, 255] -> (T, bins) density histograms
    (numpy.histogram(range=(0,255), density=True) semantics)."""
    t, h, w = gray.shape
    width = 255.0 / bins
    idx = jnp.clip(jnp.floor(gray / width), 0, bins - 1).astype(jnp.int32)
    counts = jnp.stack(
        [(idx == k).sum(axis=(-1, -2)).astype(jnp.float32)
         for k in range(bins)],
        axis=-1,
    )  # (T, bins)
    return counts / (h * w * width)


def cut_scores_device(gray: jnp.ndarray, bins: int = 32) -> jnp.ndarray:
    """(T, H, W) -> (T-1,) L1 distance of consecutive density histograms
    (models/chronos.py:cut_scores)."""
    hists = density_histograms(gray, bins)
    return jnp.abs(jnp.diff(hists, axis=0)).sum(axis=-1)


# ----------------------------------------------------------------------
# The fused stage
# ----------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("flow_dim", "n_pyr", "levels", "win_radius",
                              "iters")
)
def device_cv_stage(
    frames: jnp.ndarray,
    flow_dim: int = 256,
    n_pyr: int = 3,
    levels: int = 3,
    win_radius: int = 3,
    iters: int = 2,
) -> Dict[str, jnp.ndarray]:
    """(B, T, H, W, 3) uint8 clips -> HBM-resident CV feature blocks.

    Returns {flow_feat (B, flow_dim), cuts (B, T-1), flow_mags (B, T-1)}.
    """
    gray = gray_resize(frames)  # (B, T, R, R)
    b, t = gray.shape[:2]

    g0 = gray[:, :-1].reshape(b * (t - 1), RASTER, RASTER)
    g1 = gray[:, 1:].reshape(b * (t - 1), RASTER, RASTER)
    u, v = jax.vmap(
        lambda a, c: lucas_kanade(a, c, levels, win_radius, iters)
    )(g0, g1)
    mag = jnp.sqrt(u * u + v * v).reshape(b, t - 1, RASTER, RASTER)
    ang = ((jnp.arctan2(v, u) + jnp.pi) / (2.0 * jnp.pi)).reshape(
        b, t - 1, RASTER, RASTER
    )

    flow_feat = jax.vmap(
        lambda m, a: flow_stats(m, a, n_pyr=n_pyr, dim=flow_dim)
    )(mag, ang)
    cuts = jax.vmap(cut_scores_device)(gray)
    flow_mags = mag.mean(axis=(-1, -2))
    return {"flow_feat": flow_feat, "cuts": cuts, "flow_mags": flow_mags}


class DeviceCVStage:
    """Stateful wrapper: numpy in/out, per-shape jit reuse, availability probe.

    `tamper` is computed host-side from the device cues with the exact
    ChronosGuard combination (0.6 * norm01(cut mean) + 0.4 * norm01(...)),
    so the score semantics match the host ladder.
    """

    def __init__(
        self,
        flow_dim: int = 256,
        n_pyr: int = 3,
        levels: int = 3,
        win_radius: int = 3,
        iters: int = 2,
    ):
        self.flow_dim = int(flow_dim)
        self.n_pyr = int(n_pyr)
        self.levels = int(levels)
        self.win_radius = int(win_radius)
        self.iters = int(iters)

    def __call__(self, frames: np.ndarray) -> Dict[str, np.ndarray]:
        out = device_cv_stage(
            jnp.asarray(frames),
            flow_dim=self.flow_dim,
            n_pyr=self.n_pyr,
            levels=self.levels,
            win_radius=self.win_radius,
            iters=self.iters,
        )
        host = {k: np.asarray(val) for k, val in out.items()}

        from ultrafnd_git_tpu.models.chronos import ChronosGuard

        guard = ChronosGuard.__new__(ChronosGuard)  # combination only
        host["tamper"] = np.asarray(
            [
                ChronosGuard.tamper_score_from_cues(
                    guard, host["cuts"][i], host["flow_mags"][i]
                )
                for i in range(host["cuts"].shape[0])
            ],
            dtype=np.float32,
        )
        return host
