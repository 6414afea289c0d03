"""Batched affine warp + crop on device.

TPU-native acceleration of the mouth-ROI extraction geometry
(pipeline/mouth_crop.py): instead of warping each frame to the full 256x256
mean-face canvas on host and then cropping 96x96, compose the similarity
transform with the crop offset and sample ONLY the 96x96 output pixels —
one fused gather-free bilinear sample per frame, vmapped over the clip.

Equivalent to crop_mouth_sequence up to the output-grid composition (the
host path warps to uint8 first, then crops; here the crop box is computed
from the same warped landmarks and sampled directly at full precision, then
truncated to uint8 identically).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_sample(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """img (H, W); xs/ys (h, w) source coords -> (h, w), zeros outside."""
    h, w = img.shape
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    fx = xs - x0
    fy = ys - y0

    def at(yy, xx):
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        vals = img[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
        return jnp.where(valid, vals, 0.0)

    return ((1 - fx) * (1 - fy) * at(y0, x0)
            + fx * (1 - fy) * at(y0, x0 + 1)
            + (1 - fx) * fy * at(y0 + 1, x0)
            + fx * fy * at(y0 + 1, x0 + 1))


@functools.partial(jax.jit, static_argnames=("crop_size",))
def warp_crop_batch(
    frames: jnp.ndarray,      # (T, H, W) float32 source frames
    matrices: jnp.ndarray,    # (T, 3, 3) forward similarity (src -> canvas)
    centers: jnp.ndarray,     # (T, 2) crop centers (x, y) on the canvas
    crop_size: int = 96,
) -> jnp.ndarray:
    """-> (T, crop, crop) float32: canvas[cy-h:cy+h, cx-w:cx+w] per frame."""
    half = crop_size // 2
    grid_y, grid_x = jnp.mgrid[0:crop_size, 0:crop_size]

    def one(frame, m, center):
        # output pixel (r, c) sits at canvas coords (cx - half + c, cy - half + r)
        cx = jnp.round(center[0]).astype(jnp.float32)
        cy = jnp.round(center[1]).astype(jnp.float32)
        canvas_x = cx - half + grid_x.astype(jnp.float32)
        canvas_y = cy - half + grid_y.astype(jnp.float32)
        inv = jnp.linalg.inv(m)
        src_x = inv[0, 0] * canvas_x + inv[0, 1] * canvas_y + inv[0, 2]
        src_y = inv[1, 0] * canvas_x + inv[1, 1] * canvas_y + inv[1, 2]
        return _bilinear_sample(frame, src_x, src_y)

    return jax.vmap(one)(frames, matrices, centers)


def crop_mouth_sequence_device(frames: np.ndarray, landmarks, mean_face: np.ndarray,
                               window_margin: int = 12, start_idx: int = 48,
                               stop_idx: int = 68, crop_size: int = 96) -> np.ndarray:
    """Device-accelerated crop_mouth_sequence: host computes the tiny
    per-frame transforms (Umeyama on 5 points); the per-pixel warp runs
    batched on the accelerator."""
    from lip2speech_tpu.pipeline.mouth_crop import (
        STABLE_POINTS,
        cut_patch,  # noqa: F401  (semantics reference)
        estimate_similarity,
        interpolate_landmarks,
        transform_points,
    )

    lms = interpolate_landmarks(list(landmarks))
    if lms is None:
        raise ValueError("no landmarks detected in any frame")
    t = len(frames)
    margin = min(t, window_margin)
    stable = list(STABLE_POINTS)

    mats = np.zeros((t, 3, 3))
    centers = np.zeros((t, 2))
    last_m = None
    half = crop_size // 2
    h_img = 256
    for i in range(t):
        if i + margin <= t:
            window = np.mean([lms[j] for j in range(i, i + margin)], axis=0)
            last_m = estimate_similarity(window[stable], mean_face[stable])
        mats[i] = last_m
        warped_lm = transform_points(last_m, lms[i])[start_idx:stop_idx]
        cx, cy = warped_lm.mean(axis=0)
        # reference clamp (mouth_crop.cut_patch semantics)
        cx = min(max(cx, half), h_img - half)
        cy = min(max(cy, half), h_img - half)
        centers[i] = (cx, cy)

    out = warp_crop_batch(jnp.asarray(frames, jnp.float32), jnp.asarray(mats),
                          jnp.asarray(centers), crop_size)
    return np.clip(np.asarray(out), 0, 255).astype(np.uint8)
