"""Fused, batched estimator preprocessing on TPU (JAX).

The reference prepares each env's network input with a per-env python loop of
numpy + cv2 calls (mask bbox -> square crop window -> bilinear crop-resize ->
nearest mask resize -> random point sampling -> intrinsic adjustment;
``AdaPose/interface_v5.py:58-170``, ``lib/utils.py:10-38``). Here the whole
pipeline is one jitted batched function: dynamic crop windows become gather
coordinates, the data-dependent point sampling becomes a random-priority sort
with wrap-padding, and everything stays on-device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


def mask_bbox(mask):
    """(H, W) bool -> (y1, x1, y2, x2, valid)."""
    H, W = mask.shape
    ys = jnp.any(mask, axis=1)
    xs = jnp.any(mask, axis=0)
    yi = jnp.arange(H)
    xi = jnp.arange(W)
    y1 = jnp.min(jnp.where(ys, yi, H))
    y2 = jnp.max(jnp.where(ys, yi, 0))
    x1 = jnp.min(jnp.where(xs, xi, W))
    x2 = jnp.max(jnp.where(xs, xi, 0))
    return y1, x1, y2, x2, ys.any()


def square_window(y1, x1, y2, x2, H: int = 480, W: int = 640):
    """Square crop window (reference lib/utils.py:10-38 ``get_bbox``):
    window = 40-quantized max extent (capped 440), centered, shifted inside."""
    size = (jnp.maximum(y2 - y1, x2 - x1) // 40 + 1) * 40
    size = jnp.minimum(size, 440)
    cy = (y1 + y2) // 2
    cx = (x1 + x2) // 2
    rmin = cy - size // 2
    rmax = cy + size // 2
    cmin = cx - size // 2
    cmax = cx + size // 2
    rshift = jnp.maximum(-rmin, 0) - jnp.maximum(rmax - H, 0)
    cshift = jnp.maximum(-cmin, 0) - jnp.maximum(cmax - W, 0)
    return rmin + rshift, rmax + rshift, cmin + cshift, cmax + cshift


def bilinear_sample(img, ys, xs):
    """Sample (H, W, C) at float coords (clamped); ys/xs shape (...)."""
    H, W = img.shape[:2]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0 = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y1c = jnp.clip(y0 + 1, 0, H - 1)
    x1c = jnp.clip(x0 + 1, 0, W - 1)
    v00 = img[y0, x0]
    v01 = img[y0, x1c]
    v10 = img[y1c, x0]
    v11 = img[y1c, x1c]
    wy = wy[..., None]
    wx = wx[..., None]
    return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
            + v10 * wy * (1 - wx) + v11 * wy * wx)


def _prepare_one(rgb, mask, K, key, out_size: int, n_pts: int):
    H, W = mask.shape
    y1, x1, y2, x2, valid = mask_bbox(mask)
    rmin, rmax, cmin, cmax = square_window(y1, x1, y2, x2, H, W)
    h = (rmax - rmin).astype(jnp.float32)
    ratio = out_size / h

    # bilinear crop-resize of rgb (cv2 pixel-center convention)
    ii = jnp.arange(out_size, dtype=jnp.float32)
    src_y = rmin + (ii + 0.5) / ratio - 0.5
    src_x = cmin + (ii + 0.5) / ratio - 0.5
    gy, gx = jnp.meshgrid(src_y, src_x, indexing="ij")
    crop = bilinear_sample(rgb, gy, gx)
    crop = (crop - IMAGENET_MEAN) / IMAGENET_STD

    # nearest crop-resize of mask
    ny = jnp.clip((rmin + ((ii + 0.5) / ratio)).astype(jnp.int32), 0, H - 1)
    nx = jnp.clip((cmin + ((ii + 0.5) / ratio)).astype(jnp.int32), 0, W - 1)
    m_resized = mask[ny][:, nx]

    # random selection of n_pts masked pixels with wrap-padding
    flat = m_resized.reshape(-1)
    count = flat.sum().astype(jnp.int32)
    prio = jax.random.uniform(key, flat.shape) + (1.0 - flat) * 1e6
    order = jnp.argsort(prio)
    take = order[jnp.arange(n_pts) % jnp.maximum(count, 1)]
    choose = take.astype(jnp.int32)

    # original-image pixel coords of the chosen points
    px = (choose % out_size).astype(jnp.float32) / ratio + cmin
    py = (choose // out_size).astype(jnp.float32) / ratio + rmin
    pts2d = jnp.stack([px, py], axis=-1)

    # crop-adjusted intrinsics (reference interface_v5.py:151-169)
    crop_cx = (cmin + cmax) / 2.0
    crop_cy = (rmin + rmax) / 2.0
    size_x = (cmax - cmin + 1).astype(jnp.float32)
    size_y = (rmax - rmin + 1).astype(jnp.float32)
    newK = jnp.array([
        [K[0, 0] * ratio, 0.0, (K[0, 2] - (crop_cx - size_x / 2)) * ratio],
        [0.0, K[1, 1] * ratio, (K[1, 2] - (crop_cy - size_y / 2)) * ratio],
        [0.0, 0.0, 1.0],
    ])
    return crop, choose, pts2d, newK, valid & (count > 0)


@partial(jax.jit, static_argnames=("out_size", "n_pts"))
def prepare_model_input(rgb, mask, K, key, out_size: int = 224, n_pts: int = 1024):
    """Batched preprocessing: rgb (B,H,W,3) in [0,1], mask (B,H,W) bool,
    K (B,3,3) -> (crop (B,S,S,3) normalized, choose (B,n), pts2d (B,n,2),
    newK (B,3,3), valid (B,))."""
    B = rgb.shape[0]
    keys = jax.random.split(key, B)
    return jax.vmap(partial(_prepare_one, out_size=out_size, n_pts=n_pts))(
        rgb.astype(jnp.float32), mask.astype(jnp.float32), K, keys)


def depth_hypotheses(batch: int, d_min: float = 0.1, d_interval: float = 0.1,
                     n: int = 24):
    """Plane-sweep depth hypotheses (reference interface_v5.py:272-277)."""
    vals = d_min + d_interval * jnp.arange(n, dtype=jnp.float32)
    return jnp.broadcast_to(vals, (batch, n))
