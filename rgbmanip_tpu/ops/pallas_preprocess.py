"""Pallas TPU kernel: fused crop -> bilinear resize -> ImageNet-normalize.

The estimator preprocessing resamples a dynamic square window of each 640x480
frame to 224x224 (reference does this per env with cv2,
``AdaPose/interface_v5.py:146-148``). The bilinear resample is separable, so
the kernel computes ``out = (Wy @ img) @ Wx^T`` per channel on the MXU with
hat-function weight matrices built in VMEM from the per-env window scalars
(rmin, cmin, ratio — scalar-prefetched), then fuses the ImageNet
normalization and the bf16 cast into the same pass. One grid step per image;
the whole frame lives in VMEM (~3.7 MB).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _kernel(rmin, cmin, inv_ratio, img_ref, out_ref, *, out_size: int,
            H: int, W: int):
    ii = jax.lax.broadcasted_iota(jnp.int32, (out_size, 1), 0).astype(jnp.float32)
    src_y = rmin + (ii + 0.5) * inv_ratio - 0.5          # (S, 1)
    src_x = cmin + (ii + 0.5) * inv_ratio - 0.5

    iy = jax.lax.broadcasted_iota(jnp.int32, (1, H), 1).astype(jnp.float32)
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32)
    # hat-function rows: bilinear weights, zero outside support
    Wy = jnp.maximum(0.0, 1.0 - jnp.abs(src_y - iy))     # (S, H)
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(src_x - ix))     # (S, W)
    # edge clamp: renormalize rows that lost mass at the borders
    Wy = Wy / jnp.maximum(Wy.sum(axis=1, keepdims=True), 1e-6)
    Wx = Wx / jnp.maximum(Wx.sum(axis=1, keepdims=True), 1e-6)

    # per-channel separable resample: two MXU matmuls per channel (reshapes
    # or strided writes across a 3-wide minor axis are not layout-legal in
    # Mosaic, so the kernel is channel-planar in and out)
    for c in range(3):
        ch_img = img_ref[0, c]                           # (H, W)
        t = jax.lax.dot_general(Wy, ch_img, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        ch = jax.lax.dot_general(t, Wx, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        out_ref[0, c] = ((ch - IMAGENET_MEAN[c]) / IMAGENET_STD[c]
                         ).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("out_size", "out_dtype", "interpret"))
def crop_resize_normalize(rgb, rmin, cmin, ratio, out_size: int = 224,
                          out_dtype=jnp.bfloat16, interpret: bool = False):
    """rgb (B, H, W, 3) f32 in [0,1]; rmin/cmin/ratio (B,) window params.
    Returns (B, S, S, 3) normalized, cast to ``out_dtype``."""
    B, H, W, _ = rgb.shape
    wins = jnp.stack([rmin.astype(jnp.float32), cmin.astype(jnp.float32),
                      1.0 / ratio.astype(jnp.float32)], axis=-1)  # (B, 3)

    # windows ride the scalar-prefetch path (SMEM, available before the body);
    # images/outputs are channel-planar (B, 3, H, W) for Mosaic layouts
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, H, W), lambda b, wins: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, out_size, out_size),
                               lambda b, wins: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kern = partial(_kernel, out_size=out_size, H=H, W=W)

    def kernel(wins_ref, img_ref, out_ref):
        b = pl.program_id(0)
        kern(wins_ref[b, 0], wins_ref[b, 1], wins_ref[b, 2], img_ref, out_ref)

    planar = jnp.moveaxis(rgb.astype(jnp.float32), -1, 1)  # (B, 3, H, W)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, out_size, out_size), out_dtype),
        interpret=interpret,
    )(wins, planar)
    return jnp.moveaxis(out, 1, -1)                        # (B, S, S, 3)
