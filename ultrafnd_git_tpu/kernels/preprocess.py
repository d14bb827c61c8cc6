"""Device-side CV preprocessing stage (SURVEY §7 step 8, second half).

The reference's v1 pipeline decodes media on host and then ALSO computes
every CV feature on host (`src/training/run_train_eval.py:286-421`,
`src/core_blocks/visual_blocks.py:129-258`) — dense optical flow alone is
~0.5 s/clip of single-threaded OpenCV. Here everything AFTER codec decode
runs as ONE jitted program on the accelerator, consuming decoded uint8
frame stacks and producing HBM-resident feature blocks:

  * bilinear resize to the model raster + RGB->grayscale,
  * dense optical flow via half-resolution BLOCK MATCHING with subpixel
    refinement — every candidate displacement is a static shifted slice,
    SAD pooling is `lax.reduce_window`, the winner a small argmin: zero
    per-pixel gathers (a pyramidal Lucas-Kanade with bilinear warps was
    measured 27 ms/pair on v5e because TPUs execute scattered gathers
    scalar-ish; block matching is pure VPU/MXU dataflow),
  * the OpticalFlow3DCNN temporal-pyramid statistics (mean/std/max
    magnitude + 8-bin orientation histogram per segment, tiled to dim and
    L2-normalized — same layout as `models/visual.py:_pool_flow`),
  * the ChronosGuard cues: 32-bin density-histogram L1 diffs (scene-cut
    proxy) and per-pair mean flow magnitude (`models/chronos.py:52-94`).

Layout note: a channels-last minor dimension of 3 tiles to (8, 128) TPU
lanes at ~2% occupancy, so the jitted program's FIRST op relayouts
channels-last input to planar (B, T, 3, H, W) in one HBM pass and every
subsequent op runs W-minor. (Transposing on the host instead was
measured at 1.5 s/batch on a 1-core host — don't.)

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
    """(B, T, 3, H, W) planar, (B, T, H, W, 3) channels-last, or already-
    gray (B, T, H, W) uint8/float -> (B, T, size, size) f32 grayscale.

    Channels-last input is relayouted to planar ON DEVICE first — one HBM
    pass; doing this transpose on the host was measured at 1.5 s/batch on
    a 1-core host vs ~10 ms here. Already-gray input skips the color
    stage entirely (the host extracts gray before upload when cv2 is
    present: 3x fewer bytes over a transfer path measured at ~45 MB/s
    once any program has executed).
    """
    if frames.ndim == 4:  # already grayscale
        g = frames.astype(jnp.float32)
    else:
        if frames.shape[-1] == 3 and frames.ndim == 5:
            frames = jnp.transpose(frames, (0, 1, 4, 2, 3))
        f = frames.astype(jnp.float32)
        g = (
            0.2989 * f[:, :, 0] + 0.5870 * f[:, :, 1] + 0.1140 * f[:, :, 2]
        )  # (B, T, H, W), W-minor throughout
    b, t = g.shape[:2]
    if g.shape[2] != size or g.shape[3] != size:
        g = jax.image.resize(g, (b, t, size, size), method="bilinear")
    return g


# ----------------------------------------------------------------------
# Block-matching dense flow (no gathers)
# ----------------------------------------------------------------------

def _pyr_down(x: jnp.ndarray) -> jnp.ndarray:
    """2x average-pool downsample over the last two dims."""
    ones = (1,) * (x.ndim - 2)
    return (
        lax.reduce_window(
            x, 0.0, lax.add, ones + (2, 2), ones + (2, 2), "VALID"
        )
        * 0.25
    )


def block_match_flow(
    g0: jnp.ndarray,
    g1: jnp.ndarray,
    radius: int = 7,
    block: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-block integer+subpixel flow: (P, H, W) -> u, v (P, H/b, W/b).

    Video-codec-style motion search: for each of the (2r+1)^2 candidate
    displacements, the shifted image is a STATIC slice of an edge-padded
    copy, the per-block SAD a `reduce_window` sum; the winning
    displacement an argmin over the candidate axis, refined to subpixel
    by a 1-D parabola fit through the SAD neighbors. Everything is dense
    elementwise/windowed work — the TPU-native formulation of dense flow
    (per-pixel warps would gather).
    """
    p, h, w = g0.shape
    n = 2 * radius + 1
    pad = [(0, 0), (radius, radius), (radius, radius)]
    g1p = jnp.pad(g1, pad, mode="edge")

    sads = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            shifted = lax.slice(
                g1p,
                (0, radius + dy, radius + dx),
                (p, radius + dy + h, radius + dx + w),
            )
            diff = jnp.abs(g0 - shifted)
            sad = lax.reduce_window(
                diff, 0.0, lax.add, (1, block, block), (1, block, block),
                "VALID",
            )  # (P, H/b, W/b)
            # tiny distance penalty: exact SAD ties (static scenes) must
            # resolve to the SMALLEST displacement, not argmin's first
            sads.append(sad + 1e-3 * (abs(dy) + abs(dx)))
    vol = jnp.stack(sads)  # (n*n, P, H/b, W/b)

    best = jnp.argmin(vol, axis=0)  # (P, H/b, W/b) flat displacement idx
    by = best // n - radius  # integer dy
    bx = best % n - radius  # integer dx

    def _subpixel(axis_idx, stride):
        """Parabola fit through SAD at (best - stride, best, best + stride)
        along one displacement axis; clamped to the search border."""
        lo = jnp.take_along_axis(
            vol, jnp.maximum(best - stride, 0)[None], axis=0
        )[0]
        hi = jnp.take_along_axis(
            vol, jnp.minimum(best + stride, n * n - 1)[None], axis=0
        )[0]
        mid = jnp.take_along_axis(vol, best[None], axis=0)[0]
        denom = lo - 2.0 * mid + hi
        frac = jnp.where(
            denom > 1e-6, 0.5 * (lo - hi) / jnp.maximum(denom, 1e-6), 0.0
        )
        # an (near-)exact match at the integer minimum needs no subpixel
        # correction — the parabola fit would otherwise pull the vertex
        # toward whichever neighbor is smaller (spurious flow on static
        # content)
        frac = jnp.where(mid <= 1e-3, 0.0, frac)
        on_border = (axis_idx <= -radius) | (axis_idx >= radius)
        return jnp.where(on_border, 0.0, jnp.clip(frac, -0.5, 0.5))

    v = by.astype(jnp.float32) + _subpixel(by, n)
    u = bx.astype(jnp.float32) + _subpixel(bx, 1)
    return u, v


# ----------------------------------------------------------------------
# Pooled statistics (device mirrors of the host feature layouts)
# ----------------------------------------------------------------------

def _segment_bounds(t: int, n_pyr: int):
    """Static (a, b) slices of models/visual.py:_pool_flow's pyramid.

    Bounds are clamped exactly like the host pooling so short clips
    (t < parts) never produce an empty segment (whose mean is NaN).
    """
    bounds = []
    for level in range(n_pyr):
        parts = 2 ** level
        seg = max(1, t // parts)
        for p in range(parts):
            a = min(p * seg, t - 1)
            b = t if p == parts - 1 else min((p + 1) * seg, t)
            bounds.append((a, max(b, a + 1)))
    return bounds


def flow_stats(
    mag: jnp.ndarray,
    ang: jnp.ndarray,
    n_pyr: int = 3,
    dim: int = 256,
    hist_scale: float = 1.0,
) -> jnp.ndarray:
    """(T-1, H, W) magnitude/orientation -> pooled (dim,) feature.

    Identical layout to OpticalFlow3DCNN._pool_flow: per pyramid segment
    [mean, std, max] of the time-averaged magnitude map + the 8-bin
    histogram of the time-averaged orientation map, tiled to `dim` and
    L2-normalized. `hist_scale` compensates a coarser grid: the host
    ladder histograms over full-raster pixels, so a block-grid caller
    passes (full pixels / grid cells) to keep the counts' relative
    weight against the magnitude stats comparable after the L2 norm.
    """
    feats = []
    for a, b in _segment_bounds(mag.shape[0], n_pyr):
        m = mag[a:b].mean(axis=0)
        an = ang[a:b].mean(axis=0)
        feats.extend([m.mean(), m.std(), m.max()])
        idx = jnp.clip(jnp.floor(an * 8.0), 0, 7).astype(jnp.int32)
        hist = jnp.stack(
            [(idx == k).sum().astype(jnp.float32) for k in range(8)]
        ) * jnp.float32(hist_scale)
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
    jax.jit,
    static_argnames=("flow_dim", "n_pyr", "radius", "block", "input_scale"),
)
def device_cv_stage(
    frames: jnp.ndarray,
    flow_dim: int = 256,
    n_pyr: int = 3,
    radius: int = 7,
    block: int = 8,
    input_scale: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Decoded uint8 clips (planar or channels-last) -> CV features in HBM.

    Every cue definition assumes [0, 255] pixel units (the 32-bin
    histograms bin over (0, 255); the SAD tie/subpixel thresholds are
    tuned to 8-bit magnitudes). `input_scale` restores that range for
    inputs carrying other units — pass 255.0 for the reference's float
    [0, 1] frame contract, 1.0 (default) for uint8.

    Flow runs at HALF raster (one avg-pool level): a +-`radius` search
    there covers +-2*radius px of full-raster motion (Farneback's winsize
    15 envelope) at 1/4 the SAD traffic; block flow is scaled x2 back to
    full-raster pixel units so magnitudes are comparable with the host
    ladder's. Returns {flow_feat (B, flow_dim), cuts (B, T-1),
    flow_mags (B, T-1)}.
    """
    gray = gray_resize(frames)  # (B, T, R, R)
    if input_scale != 1.0:
        gray = gray * jnp.float32(input_scale)
    b, t = gray.shape[:2]

    half = _pyr_down(gray)  # (B, T, R/2, R/2)
    g0 = half[:, :-1].reshape(b * (t - 1), RASTER // 2, RASTER // 2)
    g1 = half[:, 1:].reshape(b * (t - 1), RASTER // 2, RASTER // 2)
    u, v = block_match_flow(g0, g1, radius=radius, block=block)
    u = 2.0 * u  # full-raster pixel units
    v = 2.0 * v
    gh, gw = u.shape[-2:]
    mag = jnp.sqrt(u * u + v * v).reshape(b, t - 1, gh, gw)
    ang = ((jnp.arctan2(v, u) + jnp.pi) / (2.0 * jnp.pi)).reshape(
        b, t - 1, gh, gw
    )

    # grid histograms carry (RASTER^2 / grid cells) weight each so the
    # count-vs-magnitude balance inside the L2-normalized feature matches
    # the host ladder's full-raster histograms (a mismatch would shift
    # the visual-feature distribution between the two rungs)
    hist_scale = float(RASTER * RASTER) / float(gh * gw)
    flow_feat = jax.vmap(
        lambda m, a: flow_stats(
            m, a, n_pyr=n_pyr, dim=flow_dim, hist_scale=hist_scale
        )
    )(mag, ang)
    cuts = jax.vmap(cut_scores_device)(gray)
    flow_mags = mag.mean(axis=(-1, -2))
    return {"flow_feat": flow_feat, "cuts": cuts, "flow_mags": flow_mags}


class DeviceCVStage:
    """Stateful wrapper: numpy in/out, per-shape jit reuse, availability probe.

    Accepts channels-LAST (B, T, H, W, 3) numpy clips (the collate
    contract); the planar relayout is the jitted program's first op —
    see the module layout note. `tamper` is computed host-side from the
    device cues with the exact ChronosGuard combination (0.6 *
    norm01(cut mean) + 0.4 * norm01(...)), so the score semantics match
    the host ladder.
    """

    def __init__(
        self,
        flow_dim: int = 256,
        n_pyr: int = 3,
        radius: int = 7,
        block: int = 8,
    ):
        self.flow_dim = int(flow_dim)
        self.n_pyr = int(n_pyr)
        self.radius = int(radius)
        self.block = int(block)

    def dispatch(self, frames: np.ndarray) -> Dict[str, jnp.ndarray]:
        """Enqueue upload + stage, return device-array futures.

        The upload and the stage execution proceed asynchronously — the
        caller can do host work (the ELA JPEG pass) between `dispatch`
        and `finalize` and the transfer rides along underneath it.

        uint8 input uploads 4x fewer bytes than f32 — decisive here,
        because this environment's host->device transfer path degrades
        to ~45 MB/s once any program has executed (measured; see
        BASELINE.md "transfer degradation"). Float input is assumed to
        be the reference's [0, 1] contract and rescaled ON DEVICE.
        Already-gray (B, T, H, W) input is another 3x smaller again.
        """
        scale = 1.0 if np.asarray(frames).dtype == np.uint8 else 255.0
        return device_cv_stage(
            jnp.asarray(frames),  # channels-last; relayout happens on device
            flow_dim=self.flow_dim,
            n_pyr=self.n_pyr,
            radius=self.radius,
            block=self.block,
            input_scale=scale,
        )

    def finalize(self, out: Dict[str, jnp.ndarray]) -> Dict[str, np.ndarray]:
        """Block on the device futures, add the host-side tamper score."""
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

    def __call__(self, frames: np.ndarray) -> Dict[str, np.ndarray]:
        return self.finalize(self.dispatch(frames))
