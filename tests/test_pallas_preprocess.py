"""Pallas fused crop-resize-normalize kernel vs the XLA reference path
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from rgbmanip_tpu.ops.pallas_preprocess import crop_resize_normalize
from rgbmanip_tpu.ops.preprocess import (IMAGENET_MEAN, IMAGENET_STD,
                                         bilinear_sample_batched)


def xla_reference(rgb, rmin, cmin, ratio, S):
    B = rgb.shape[0]
    ii = jnp.arange(S, dtype=jnp.float32)[None]
    src_y = rmin[:, None] + (ii + 0.5) / ratio[:, None] - 0.5
    src_x = cmin[:, None] + (ii + 0.5) / ratio[:, None] - 0.5
    gy = jnp.broadcast_to(src_y[:, :, None], (B, S, S))
    gx = jnp.broadcast_to(src_x[:, None, :], (B, S, S))
    crop = bilinear_sample_batched(rgb, gy, gx)
    return (crop - IMAGENET_MEAN) / IMAGENET_STD


def test_pallas_matches_xla():
    rng = np.random.default_rng(0)
    B, H, W, S = 2, 96, 128, 32
    rgb = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
    rmin = jnp.asarray([8.0, 20.0])
    cmin = jnp.asarray([16.0, 30.0])
    ratio = jnp.asarray([S / 64.0, S / 48.0])
    ref = xla_reference(rgb, rmin, cmin, ratio, S)
    out = crop_resize_normalize(rgb, rmin, cmin, ratio, out_size=S,
                                out_dtype=jnp.float32, interpret=True)
    # interior must match tightly; edges differ by the clamp-vs-renormalize
    # convention, so compare the interior region
    np.testing.assert_allclose(np.asarray(out)[:, 1:-1, 1:-1],
                               np.asarray(ref)[:, 1:-1, 1:-1], atol=2e-2)
