"""PSPNet feature extractor in flax (reference AdaPose/lib/pspnet.py:33-158).

ResNet-18/34 basic blocks WITHOUT batch norm (the reference's ResNet drops BN
entirely — pspnet.py:11-30), dilated layers 3/4 (stride 1, dilation 2/4), a
pyramid-pooling module with bins (1,2,3,6), and three 2x bilinear upsamples
back to full resolution with a final 1x1 conv to 32 channels.

Layout is NHWC (TPU-native); the checkpoint converter transposes torch's
NCHW/OIHW weights.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.planes, (3, 3), strides=self.stride,
                    kernel_dilation=self.dilation, padding=self.dilation,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), kernel_dilation=self.dilation,
                    padding=self.dilation, use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        if self.has_downsample:
            residual = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="downsample")(x)
        return nn.relu(y + residual)


class ResNetFeats(nn.Module):
    layers: Tuple[int, ...] = (3, 4, 6, 3)  # resnet34
    planes: Tuple[int, ...] = (64, 128, 256, 512)
    stride: int = 8   # net stride of the returned features: 8 = reference
    # (layers 3/4 dilated, pspnet.py:71-76); 16/32 trade dilation back for
    # strides — 4x/16x fewer FLOPs in the two heaviest stages, for the
    # TPU-fast configs. NOTE: stride changes do NOT change parameter shapes
    # — a checkpoint trained at one stride restores silently into another;
    # AdaPoseEstimator stores the knob in checkpoint metadata and validates
    # it at load time
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        def stage(x, planes, blocks, stride, dilation, name):
            in_ch = x.shape[-1]
            x = BasicBlock(planes, stride=stride, dilation=1,
                           has_downsample=(stride != 1 or in_ch != planes),
                           dtype=self.dtype, name=f"{name}_0")(x)
            for i in range(1, blocks):
                x = BasicBlock(planes, dilation=dilation, dtype=self.dtype,
                               name=f"{name}_{i}")(x)
            return x

        strides = {8: (1, 2, 1, 4), 16: (2, 1, 1, 2), 32: (2, 1, 2, 1)}
        if self.stride not in strides:
            raise ValueError(f"backbone stride must be one of "
                             f"{sorted(strides)}, got {self.stride}")
        s3, d3, s4, d4 = strides[self.stride]
        p = self.planes
        x = stage(x, p[0], self.layers[0], 1, 1, "layer1")
        x = stage(x, p[1], self.layers[1], 2, 1, "layer2")
        x = stage(x, p[2], self.layers[2], s3, d3, "layer3")
        x = stage(x, p[3], self.layers[3], s4, d4, "layer4")
        return x


def adaptive_avg_pool(x, out_size: int):
    """Exact torch AdaptiveAvgPool2d semantics via integral images.
    x: (B, H, W, C) -> (B, out, out, C)."""
    B, H, W, C = x.shape
    cs = jnp.cumsum(jnp.cumsum(x, axis=1), axis=2)
    cs = jnp.pad(cs, ((0, 0), (1, 0), (1, 0), (0, 0)))

    def edges(n, s):
        lo = [int(i * n // s) for i in range(s)]
        hi = [int(-((-(i + 1) * n) // s)) for i in range(s)]  # ceil((i+1)n/s)
        return lo, hi

    ylo, yhi = edges(H, out_size)
    xlo, xhi = edges(W, out_size)
    rows = []
    for i in range(out_size):
        cols = []
        for j in range(out_size):
            s = (cs[:, yhi[i], xhi[j]] - cs[:, ylo[i], xhi[j]]
                 - cs[:, yhi[i], xlo[j]] + cs[:, ylo[i], xlo[j]])
            area = (yhi[i] - ylo[i]) * (xhi[j] - xlo[j])
            cols.append(s / area)
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


def upsample_bilinear(x, scale: int = 2, size=None):
    B, H, W, C = x.shape
    new = (B, size or H * scale, size or W * scale, C)
    return jax.image.resize(x, new, method="bilinear")


class PSPModule(nn.Module):
    bins: Sequence[int] = (1, 2, 3, 6)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat_dim = x.shape[-1]
        red = feat_dim // len(self.bins)
        H = x.shape[1]
        outs = [x]
        for bi, size in enumerate(self.bins):
            p = adaptive_avg_pool(x, size)
            p = nn.Conv(red, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"stage{bi}")(p)
            p = nn.relu(p)
            p = jax.image.resize(p, (x.shape[0], H, x.shape[2], red), "bilinear")
            outs.append(p)
        return jnp.concatenate(outs, axis=-1)


class PSPUpsample(nn.Module):
    out_ch: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = upsample_bilinear(x, 2)
        x = nn.Conv(self.out_ch, (self.kernel,) * 2,
                    padding=(self.kernel - 1) // 2, dtype=self.dtype,
                    name="conv")(x)
        alpha = self.param("prelu", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, alpha * x)


class PSPNet(nn.Module):
    backend: str = "resnet34"
    bins: Tuple[int, ...] = (1, 2, 3, 6)
    backbone_stride: int = 8  # 8 = reference; 16/32 = TPU-fast strided
    # variants whose output feature map lands at S/(backbone_stride/8)
    # after the three fixed 2x upsamples
    dtype: jnp.dtype = jnp.float32

    # backend table: (block counts, stage widths, slim head). "resnet10s"
    # is the TPU-fast extractor designed against this chip's measured
    # ceilings: the r18 config runs at ~34 TFLOP/s effective (speed of
    # light for its FLOPs) so the only lever left is FLOPs — one block per
    # stage, 0.75x widths, and a 1x1 up_1 (the 3x3 1024->256 upsample conv
    # was ~20% of the whole backbone).
    _ARCH = {
        "resnet34": ((3, 4, 6, 3), (64, 128, 256, 512), False),
        "resnet18": ((2, 2, 2, 2), (64, 128, 256, 512), False),
        "resnet10s": ((1, 1, 1, 1), (48, 96, 192, 384), True),
    }

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.backend not in self._ARCH:
            raise ValueError(f"backend must be one of "
                             f"{sorted(self._ARCH)}, got {self.backend!r}")
        layers, planes, slim = self._ARCH[self.backend]
        f = ResNetFeats(layers, planes, stride=self.backbone_stride,
                        dtype=self.dtype, name="feats")(x)
        p = PSPModule(self.bins, dtype=self.dtype, name="psp")(f)
        p = PSPUpsample(256, kernel=1 if slim else 3, dtype=self.dtype,
                        name="up_1")(p)
        p = PSPUpsample(64, dtype=self.dtype, name="up_2")(p)
        p = PSPUpsample(64, dtype=self.dtype, name="up_3")(p)
        return nn.Conv(32, (1, 1), dtype=self.dtype, name="final")(p)
