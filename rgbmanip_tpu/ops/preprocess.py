"""Fused, batched estimator preprocessing on TPU (JAX).

The reference prepares each env's network input with a per-env python loop of
numpy + cv2 calls (mask bbox -> square crop window -> bilinear crop-resize ->
nearest mask resize -> random point sampling -> intrinsic adjustment;
``AdaPose/interface_v5.py:58-170``, ``lib/utils.py:10-38``). Here the whole
pipeline is one jitted batched function: dynamic crop windows become flat
gather coordinates (see ``ops.gather`` for why vmapped gathers are avoided),
and the data-dependent point sampling becomes a random-priority argsort with
wrap-padding. Everything stays on-device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .gather import flat_gather

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])

# use the fused pallas crop-resize-normalize kernel on TPU (see
# pallas_preprocess.py); the XLA gather path is the portable fallback.
# Resolved per trace: under `with jax.default_device(cpu)` (the estimator
# trainer preps batches host-side to avoid shipping raw 640x480 frames
# through the device tunnel) the trace targets CPU even when the process
# default backend is TPU, and Mosaic kernels must stay out of it. The
# default-device context is part of jit's trace-cache key, so the branch
# re-evaluates whenever the target changes.
def _use_pallas() -> bool:
    d = jax.config.jax_default_device
    plat = d.platform if d is not None else jax.default_backend()
    return plat == "tpu"


def mask_bbox_batched(mask):
    """(B, H, W) -> per-env (y1, x1, y2, x2, valid)."""
    B, H, W = mask.shape
    ys = jnp.any(mask > 0, axis=2)
    xs = jnp.any(mask > 0, axis=1)
    yi = jnp.arange(H)[None]
    xi = jnp.arange(W)[None]
    y1 = jnp.min(jnp.where(ys, yi, H), axis=1)
    y2 = jnp.max(jnp.where(ys, yi, 0), axis=1)
    x1 = jnp.min(jnp.where(xs, xi, W), axis=1)
    x2 = jnp.max(jnp.where(xs, xi, 0), axis=1)
    return y1, x1, y2, x2, ys.any(axis=1)


def square_window_batched(y1, x1, y2, x2, H: int = 480, W: int = 640):
    """Square crop windows (reference lib/utils.py:10-38 ``get_bbox``):
    40-quantized max extent (capped 440), centered, shifted inside the frame."""
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


def bilinear_sample_batched(img, ys, xs):
    """img: (B, H, W, C); ys/xs: (B, ...) float coords (clamped)."""
    B, H, W, C = img.shape
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    wy = (ys - y0f)[..., None]
    wx = (xs - x0f)[..., None]
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
    y1c = jnp.minimum(y0 + 1, H - 1)
    x1c = jnp.minimum(x0 + 1, W - 1)
    flat = img.reshape(B, H * W, C)

    def g(yy, xx):
        return flat_gather(flat, yy * W + xx)

    return (g(y0, x0) * (1 - wy) * (1 - wx) + g(y0, x1c) * (1 - wy) * wx
            + g(y1c, x0) * wy * (1 - wx) + g(y1c, x1c) * wy * wx)


@partial(jax.jit, static_argnames=("out_size", "n_pts"))
def prepare_model_input(rgb, mask, K, key, out_size: int = 224, n_pts: int = 1024):
    """Batched preprocessing: rgb (B,H,W,3) in [0,1], mask (B,H,W) bool,
    K (B,3,3) -> (crop (B,S,S,3) normalized, choose (B,n), pts2d (B,n,2),
    newK (B,3,3), valid (B,))."""
    rgb = rgb.astype(jnp.float32)
    maskf = mask.astype(jnp.float32)
    B, H, W = maskf.shape
    S = out_size

    y1, x1, y2, x2, has_any = mask_bbox_batched(maskf)
    rmin, rmax, cmin, cmax = square_window_batched(y1, x1, y2, x2, H, W)
    h = (rmax - rmin).astype(jnp.float32)
    ratio = S / h                                                  # (B,)

    ii = jnp.arange(S, dtype=jnp.float32)[None]                    # (1, S)
    if _use_pallas():
        from .pallas_preprocess import crop_resize_normalize
        crop = crop_resize_normalize(rgb, rmin.astype(jnp.float32),
                                     cmin.astype(jnp.float32), ratio,
                                     out_size=S, out_dtype=jnp.float32)
    else:
        src_y = rmin[:, None] + (ii + 0.5) / ratio[:, None] - 0.5  # (B, S)
        src_x = cmin[:, None] + (ii + 0.5) / ratio[:, None] - 0.5
        gy = jnp.broadcast_to(src_y[:, :, None], (B, S, S))
        gx = jnp.broadcast_to(src_x[:, None, :], (B, S, S))
        crop = bilinear_sample_batched(rgb, gy, gx)
        crop = (crop - IMAGENET_MEAN) / IMAGENET_STD

    # nearest crop-resize of the mask
    ny = jnp.clip((rmin[:, None] + (ii + 0.5) / ratio[:, None]).astype(jnp.int32),
                  0, H - 1)                                        # (B, S)
    nx = jnp.clip((cmin[:, None] + (ii + 0.5) / ratio[:, None]).astype(jnp.int32),
                  0, W - 1)
    nidx = ny[:, :, None] * W + nx[:, None, :]                     # (B, S, S)
    m_resized = flat_gather(maskf.reshape(B, H * W), nidx)

    # random selection of n_pts masked pixels with wrap-padding. top_k of the
    # random priorities (valid pixels boosted) — a full argsort of S*S keys
    # is far slower on TPU than top_k(n_pts).
    flat = m_resized.reshape(B, S * S)
    count = flat.sum(axis=1).astype(jnp.int32)                     # (B,)
    prio = jax.random.uniform(key, flat.shape) + flat * 1e3        # valid first
    _, order = jax.lax.top_k(prio, n_pts)                          # (B, n) valid-first
    ranks = jnp.arange(n_pts, dtype=jnp.int32)[None] % jnp.maximum(count, 1)[:, None]
    choose = flat_gather(order.astype(jnp.int32), ranks)           # (B, n)

    # original-image pixel coords of the chosen points
    px = (choose % S).astype(jnp.float32) / ratio[:, None] + cmin[:, None]
    py = (choose // S).astype(jnp.float32) / ratio[:, None] + rmin[:, None]
    pts2d = jnp.stack([px, py], axis=-1)

    # crop-adjusted intrinsics (reference interface_v5.py:151-169)
    crop_cx = (cmin + cmax).astype(jnp.float32) / 2.0
    crop_cy = (rmin + rmax).astype(jnp.float32) / 2.0
    size_x = (cmax - cmin + 1).astype(jnp.float32)
    size_y = (rmax - rmin + 1).astype(jnp.float32)
    zeros = jnp.zeros(B)
    ones = jnp.ones(B)
    newK = jnp.stack([
        jnp.stack([K[:, 0, 0] * ratio, zeros,
                   (K[:, 0, 2] - (crop_cx - size_x / 2)) * ratio], axis=-1),
        jnp.stack([zeros, K[:, 1, 1] * ratio,
                   (K[:, 1, 2] - (crop_cy - size_y / 2)) * ratio], axis=-1),
        jnp.stack([zeros, zeros, ones], axis=-1),
    ], axis=1)
    valid = has_any & (count > 0)
    return crop, choose, pts2d, newK, valid


def depth_hypotheses(batch: int, d_min: float = 0.1, d_interval: float = 0.1,
                     n: int = 24):
    """Plane-sweep depth hypotheses (reference interface_v5.py:272-277)."""
    vals = d_min + d_interval * jnp.arange(n, dtype=jnp.float32)
    return jnp.broadcast_to(vals, (batch, n))
