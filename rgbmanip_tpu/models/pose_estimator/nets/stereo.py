"""StereoPoseNet family in flax (reference AdaPose/lib/network_v5.py).

``StereoPoseNetWithDepth`` is the production v5 architecture: per-view PSPNet
features, plane-sweep homography warping over 24 depth hypotheses, cost-volume
regularization with a 3-D U-Net (CostRegNet), per-point NOCS head, softmax
depth regression at the chosen points, and (direct-regression mode)
depth-probability-weighted pose features feeding 6-D rotation / translation /
size heads. ``StereoPoseNet`` (v1, volume_conv fusion) and the no-fusion
baseline are included for the ablation configs.

TPU notes: all tensors NHWC / NDHWC; the homography warp is a batched gather
(bilinear, zero padding) instead of grid_sample; the cost volume stays in the
compute dtype (bf16-capable).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .pspnet import PSPNet


def ortho6d_to_mat(x_raw, y_raw):
    """6-D rotation representation -> rotation matrix (reference
    lib/rotation_utils.py:18-28). Inputs (..., 3) each; returns (..., 3, 3)
    with rows x, y, z (matching the torch cat of row vectors)."""
    x = x_raw / (jnp.linalg.norm(x_raw, axis=-1, keepdims=True) + 1e-8)
    z = jnp.cross(x, y_raw)
    z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-2)


def homo_warp_batched(src_feat, src_proj, ref_proj, depth_values,
                      mode: str = "bilinear", layout: str = "dhw"):
    """Warp src view features into the ref view over depth hypotheses
    (reference network_v5.py:378-416), batched.

    src_feat: (B, H, W, C); src_proj/ref_proj: (B, 4, 4) full projections
    (K@E); depth_values: (B, D). Returns (B, D, H, W, C) for layout="dhw"
    or (B, H, W, D, C) for layout="hwd", zero outside the source image.
    mode: "bilinear" (grid_sample parity, 4 gather taps) or "nearest"
    (1 tap — 4x fewer gather rows; the gather is row-count-bound on TPU).

    layout="hwd" orders the gather rows (pixel, depth) so the volume lands
    channels-dense (B, H, W, D*C) with no transpose — the layout the
    banded-2D cost regularization and the per-point wide-row gathers want.
    Reordering the int32 index array is free relative to the row gather.

    TPU note: the taps run as flat gathers over (B*H*W) rows with per-batch
    index offsets — a vmapped per-sample gather lowers to a slow
    batched-gather loop (measured 140 ms vs <1 ms for the flat form).
    """
    B, H, W, C = src_feat.shape
    D = depth_values.shape[1]
    proj = src_proj @ jnp.linalg.inv(ref_proj)               # (B, 4, 4)
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3]

    y, x = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    xyz = jnp.stack([x.reshape(-1), y.reshape(-1),
                     jnp.ones(H * W, jnp.float32)])          # (3, HW)
    rot_xyz = jnp.einsum("bij,jn->bin", rot, xyz)            # (B, 3, HW)
    proj_xyz = rot_xyz[:, :, None, :] * depth_values[:, None, :, None] \
        + trans[:, :, None, None]                            # (B, 3, D, HW)
    pz = proj_xyz[:, 2]
    px = proj_xyz[:, 0] / (pz + 1e-9)
    py = proj_xyz[:, 1] / (pz + 1e-9)

    inside = (px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1) & (pz > 1e-6)

    dt = src_feat.dtype
    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    # keep tap weights in the feature dtype: f32 weights promote the four
    # (B,D,HW,C) gathered tap tensors to f32 — 4x4.8 GB of intermediates at
    # B=16 bf16, which spills HBM (measured 9.7 s forward / OOM)
    wx = (px - x0f)[..., None].astype(dt)
    wy = (py - y0f)[..., None].astype(dt)
    one = jnp.ones((), dt)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)

    flat = src_feat.reshape(B * H * W, C)
    base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None, None]

    def reorder(a):
        return jnp.swapaxes(a, 1, 2) if layout == "hwd" else a  # (B,HW,D)

    def g(yy, xx):
        idx = reorder(base + yy * W + xx).reshape(-1)
        shp = (B, H * W, D, C) if layout == "hwd" else (B, D, H * W, C)
        return jnp.take(flat, idx, axis=0).reshape(shp)

    if mode == "nearest":
        yn = jnp.clip(jnp.round(py).astype(jnp.int32), 0, H - 1)
        xn = jnp.clip(jnp.round(px).astype(jnp.int32), 0, W - 1)
        out = g(yn, xn)
    else:
        def w(a):  # (B,D,HW) weight -> broadcastable to gather layout
            return reorder(a)[..., None]
        out = g(y0, x0) * w((one - wy[..., 0]) * (one - wx[..., 0]))
        out = out + g(y0, x1) * w((one - wy[..., 0]) * wx[..., 0])
        out = out + g(y1, x0) * w(wy[..., 0] * (one - wx[..., 0]))
        out = out + g(y1, x1) * w(wy[..., 0] * wx[..., 0])
    out = out * reorder(inside)[..., None].astype(dt)
    if layout == "hwd":
        return out.reshape(B, H, W, D, C)
    return out.reshape(B, D, H, W, C)


def homo_warp(src_feat, src_proj, ref_proj, depth_values):
    """Single-sample convenience wrapper around :func:`homo_warp_batched`."""
    return homo_warp_batched(src_feat[None], src_proj[None], ref_proj[None],
                             depth_values[None])[0]


def homo_warp_points(src_feat, src_proj, ref_proj, depth_values, pts_x, pts_y):
    """Plane-sweep warp evaluated only at N chosen ref-view pixels.

    src_feat: (B, H, W, C); pts_x/pts_y: (B, N) integer pixel coords in the
    ref view. Returns (B, N, D, C). Identical math to
    :func:`homo_warp_batched` restricted to the points — used for the pose
    branch so the (B, D, H, W, C) volume need not be re-gathered (the full
    gather measured 83 ms/view at B=16; this is ~50x less data).
    """
    B, H, W, C = src_feat.shape
    D = depth_values.shape[1]
    N = pts_x.shape[1]
    dt = src_feat.dtype
    proj = src_proj @ jnp.linalg.inv(ref_proj)
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3]

    ones = jnp.ones_like(pts_x, jnp.float32)
    xyz = jnp.stack([pts_x.astype(jnp.float32), pts_y.astype(jnp.float32), ones],
                    axis=1)                                  # (B, 3, N)
    rot_xyz = jnp.einsum("bij,bjn->bin", rot, xyz)           # (B, 3, N)
    proj_xyz = rot_xyz[:, :, None, :] * depth_values[:, None, :, None] \
        + trans[:, :, None, None]                            # (B, 3, D, N)
    pz = proj_xyz[:, 2]
    px = proj_xyz[:, 0] / (pz + 1e-9)
    py = proj_xyz[:, 1] / (pz + 1e-9)
    inside = (px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1) & (pz > 1e-6)

    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    wx = (px - x0f)[..., None].astype(dt)
    wy = (py - y0f)[..., None].astype(dt)
    one = jnp.ones((), dt)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)

    flat = src_feat.reshape(B * H * W, C)
    base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None, None]

    def g(yy, xx):
        idx = (base + yy * W + xx).reshape(-1)
        return jnp.take(flat, idx, axis=0).reshape(B, D, N, C)

    out = g(y0, x0) * ((one - wy) * (one - wx))
    out = out + g(y0, x1) * ((one - wy) * wx)
    out = out + g(y1, x0) * (wy * (one - wx))
    out = out + g(y1, x1) * (wy * wx)
    out = out * inside[..., None].astype(dt)
    return jnp.moveaxis(out, 1, 2)                           # (B, N, D, C)


class ConvBnRelu3d(nn.Module):
    out_ch: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_ch, (self.kernel,) * 3, strides=self.stride,
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x) if self.relu else x


class _TorchDeconv3d(nn.Module):
    """Transposed 3-D conv with torch ``ConvTranspose3d(k3, s2, p1, op1)``
    alignment: output o(do) += x(di) * W[kd] at do = 2*di + kd - 1, i.e.
    ``lax.conv_transpose`` with explicit (1, 2) padding and the kernel
    spatially flipped at apply time. The stored kernel keeps the natural
    (D, H, W, I, O) layout (torch (I, O, D, H, W) transposed, unflipped), so
    ``converter.py`` maps released .pth weights bit-correctly and the kernel
    stays interchangeable with the banded-2D plan (same tree path/shape)."""
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, 3, ci, self.out_ch))
        k = k[::-1, ::-1, ::-1].astype(self.dtype)
        return jax.lax.conv_transpose(
            x.astype(self.dtype), k, (2, 2, 2), ((1, 2), (1, 2), (1, 2)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


class DeconvBnRelu3d(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _TorchDeconv3d(self.out_ch, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class CostRegNet(nn.Module):
    """3-D U-Net over the fused volume (reference network_v5.py:260-291)."""
    base: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.base
        c0 = ConvBnRelu3d(b, dtype=self.dtype, name="conv0")(x, train)
        c2 = ConvBnRelu3d(b * 2, dtype=self.dtype, name="conv2")(
            ConvBnRelu3d(b * 2, stride=2, dtype=self.dtype, name="conv1")(c0, train), train)
        c4 = ConvBnRelu3d(b * 4, dtype=self.dtype, name="conv4")(
            ConvBnRelu3d(b * 4, stride=2, dtype=self.dtype, name="conv3")(c2, train), train)
        x = ConvBnRelu3d(b * 8, dtype=self.dtype, name="conv6")(
            ConvBnRelu3d(b * 8, stride=2, dtype=self.dtype, name="conv5")(c4, train), train)
        x = c4 + DeconvBnRelu3d(b * 4, dtype=self.dtype, name="conv7")(x, train)
        x = c2 + DeconvBnRelu3d(b * 2, dtype=self.dtype, name="conv9")(x, train)
        x = c0 + DeconvBnRelu3d(b, dtype=self.dtype, name="conv11")(x, train)
        return nn.Conv(1, (3, 3, 3), padding=1, use_bias=False,
                       dtype=self.dtype, name="prob")(x)


def _band_conv(D_in: int, stride: int):
    """(3, D_out, D_in) selector: forward conv3d depth taps di = s*do+kd-1."""
    import numpy as np
    D_out = (D_in + 2 - 3) // stride + 1
    kd = np.arange(3)[:, None, None]
    do = np.arange(D_out)[None, :, None]
    di = np.arange(D_in)[None, None, :]
    return jnp.asarray((di == stride * do + kd - 1).astype(np.float32))


def _band_deconv(D_in: int):
    """(3, 2*D_in, D_in) selector with torch ConvTranspose3d(k3,s2,p1,op1)
    depth alignment: do = 2*di + kd - 1 (kd indexes the unflipped kernel) —
    matches :class:`_TorchDeconv3d` so banded/3-D checkpoints stay
    interchangeable."""
    import numpy as np
    kd = np.arange(3)[:, None, None]
    do = np.arange(2 * D_in)[None, :, None]
    di = np.arange(D_in)[None, None, :]
    return jnp.asarray((do == 2 * di + kd - 1).astype(np.float32))


class _Kernel3d(nn.Module):
    """Registers only the (3,3,3,Ci,Co) kernel param — same tree path/shape
    as the nn.Conv/nn.ConvTranspose inside the 3-D CostRegNet blocks, so
    checkpoints are interchangeable between reg_impl variants."""
    ci: int
    co: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (3, 3, 3, self.ci, self.co))


class ConvBnRelu3dBanded(nn.Module):
    """3-D conv+BN+ReLU over a channels-dense (B, H, W, D*Ci) volume,
    executed as a 2-D conv with a depth-banded dense weight matrix.

    Math-identical to ConvBnRelu3d/DeconvBnRelu3d on (B, D, H, W, Ci): the
    (3,3,3,Ci,Co) kernel is scattered into a (3,3,D*Ci,D_out*Co) block-banded
    matrix at apply time. On TPU this turns 8-channel 3-D convs (profiled at
    ~6% MXU lane utilization, batch-in-lanes emitter) into lane-dense 2-D
    convs — D/3 more FLOPs at ~10-20x better utilization, and the volume
    never leaves the (H, W, D*C) layout (no relayout copies). BatchNorm runs
    on a (B, H, W*D_out, Co) view so its statistics and (Co,) state match the
    3-D module exactly.
    """
    out_ch: int
    stride: int = 1
    relu: bool = True
    transpose: bool = False
    dtype: jnp.dtype = jnp.float32
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, D: int, train: bool = False):
        B, H, W, DC = x.shape
        ci = DC // D
        co = self.out_ch
        k = _Kernel3d(ci, co, name="conv")()
        band = _band_deconv(D) if self.transpose else _band_conv(D, self.stride)
        D_out = band.shape[1]
        if self.transpose:
            # torch alignment (see _TorchDeconv3d): spatial kernel flipped at
            # apply time; depth handled by the unflipped-kd band
            k = k[:, ::-1, ::-1]
        w2 = jnp.einsum("kde,kyxio->yxeido", band, k)
        w2 = w2.reshape(3, 3, D * ci, D_out * co).astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        if self.transpose:
            y = jax.lax.conv_transpose(x.astype(self.dtype), w2, (2, 2),
                                       ((1, 2), (1, 2)), dimension_numbers=dn)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w2, (self.stride,) * 2,
                ((1, 1), (1, 1)), dimension_numbers=dn)
        Hn, Wn = y.shape[1], y.shape[2]
        if self.use_bn:
            y = y.reshape(B, Hn, Wn * D_out, co)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name="bn")(y)
        if self.relu:
            y = nn.relu(y)
        return y.reshape(B, Hn, Wn, D_out * co), D_out


class CostRegNet2D(nn.Module):
    """Banded-dense execution plan of :class:`CostRegNet` (identical math and
    parameter tree) over channels-dense volumes: (B, H, W, D*C) in ->
    (B, H, W, D) out."""
    base: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, D: int, train: bool = False):
        b = self.base
        dt = self.dtype

        def cbr(name, out_ch, stride=1, transpose=False):
            return ConvBnRelu3dBanded(out_ch, stride=stride, transpose=transpose,
                                      dtype=dt, name=name)

        c0, d0 = cbr("conv0", b)(x, D, train)
        x1, d1 = cbr("conv1", b * 2, stride=2)(c0, d0, train)
        c2, d2 = cbr("conv2", b * 2)(x1, d1, train)
        x3, d3 = cbr("conv3", b * 4, stride=2)(c2, d2, train)
        c4, d4 = cbr("conv4", b * 4)(x3, d3, train)
        x5, d5 = cbr("conv5", b * 8, stride=2)(c4, d4, train)
        x6, d6 = cbr("conv6", b * 8)(x5, d5, train)
        u7, _ = cbr("conv7", b * 4, transpose=True)(x6, d6, train)
        x = c4 + u7
        u9, _ = cbr("conv9", b * 2, transpose=True)(x, d4, train)
        x = c2 + u9
        u11, _ = cbr("conv11", b, transpose=True)(x, d2, train)
        x = c0 + u11
        k = _Kernel3d(b, 1, name="prob")()
        band = _band_conv(D, 1)
        w2 = jnp.einsum("kde,kyxio->yxeido", band, k)
        w2 = w2.reshape(3, 3, D * b, D).astype(dt)
        return jax.lax.conv_general_dilated(
            x.astype(dt), w2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (B, H, W, D)


class MLP1D(nn.Module):
    """Per-point MLP (torch Conv1d k=1 stack) as Dense layers on (..., N, C).
    One instance can be applied to several inputs (shared weights across the
    two views, as in the reference)."""
    widths: Tuple[int, ...]
    final: str = "none"  # none | relu | tanh
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, w in enumerate(self.widths[:-1]):
            x = nn.relu(nn.Dense(w, dtype=self.dtype, name=f"dense_{i}")(x))
        x = nn.Dense(self.widths[-1], dtype=self.dtype,
                     name=f"dense_{len(self.widths) - 1}")(x)
        if self.final == "relu":
            x = nn.relu(x)
        elif self.final == "tanh":
            x = jnp.tanh(x)
        return x


class PoseHeads(nn.Module):
    """Rotation / translation / size heads (reference network_v5.py:341-376)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pose_feat):
        # pose_feat: (B, N, C_in)
        x = MLP1D((128, 128), final="relu", dtype=self.dtype, name="pose_mlp1")(pose_feat)
        g = x.mean(axis=-2, keepdims=True)
        x = jnp.concatenate([x, jnp.broadcast_to(g, x.shape)], axis=-1)
        x = MLP1D((256, 256), final="relu", dtype=self.dtype, name="pose_mlp2")(x)
        x = x.mean(axis=-2)  # AdaptiveAvgPool1d(1)

        def head(name):
            h = nn.relu(nn.Dense(256, dtype=self.dtype, name=f"{name}_0")(x))
            h = nn.relu(nn.Dense(128, dtype=self.dtype, name=f"{name}_1")(h))
            return h

        r6 = nn.Dense(6, dtype=self.dtype, name="rotation_2")(head("rotation"))
        R = ortho6d_to_mat(r6[..., :3], r6[..., 3:])
        t = nn.Dense(3, dtype=self.dtype, name="translation_2")(head("translation"))
        s = nn.Dense(3, dtype=self.dtype, name="size_2")(head("size"))
        return R, t, s


class StereoPoseNetWithDepth(nn.Module):
    """v5 production network (reference network_v5.py:301-519).

    TPU performance knobs (self-consistent — the estimator is trained with
    the same settings it runs with):
      - ``volume_scale``: build the plane-sweep volume + CostRegNet at
        S/volume_scale resolution (1 = reference parity). The big warp
        gathers lower to per-channel loops on TPU, so volume resolution is
        the dominant cost; per-point depth/pose sampling bilinearly reads
        the reduced volume.
      - ``warp_mode``: "bilinear" (parity) or "nearest" (4x fewer taps).
    """
    backend: str = "resnet34"
    regress_pose: bool = True
    volume_scale: int = 1
    backbone_stride: int = 8  # PSPNet net stride: 8 = reference dilated;
                              # 16/32 = strided fast variants, features at
                              # S/(backbone_stride/8). NOCS point sampling
                              # reads the reduced map bilinearly; the volume
                              # path pools by volume_scale/feat_stride.
    warp_mode: str = "bilinear"
    stereo_fusion: bool = True   # False = no-cross-view ablation (reference
                                 # interface_baseline.py / network_baseline.py)
    reg_impl: str = "banded2d"   # "banded2d" (channels-dense, MXU-friendly)
                                 # | "conv3d" (reference-shaped 3-D U-Net);
                                 # identical math and parameter tree
    volume_channels: int = 0     # >0: 1x1-reduce features to this many
                                 # channels before warping (shrinks the warp
                                 # gathers + volume ~C/32x; changes the
                                 # architecture -> train with it on)
    fuse_views: bool = False     # eval-mode option: run the per-view towers
                                 # (PSPNet, NOCS heads, CostRegNet, point
                                 # ops, pose heads) ONCE on the two views
                                 # stacked along batch instead of twice at
                                 # B. Mathematically exact when train=False
                                 # (BatchNorm uses running stats; everything
                                 # else is per-sample) — asserted by
                                 # tests/test_fuse_views.py. Default OFF:
                                 # measured 3.3x SLOWER on the TPU at the
                                 # bench shapes (B=64 -> effective 128:
                                 # 12.35 ms -> 40.89 ms per estimate — the
                                 # doubled batch leaves XLA's good regime
                                 # for these kernels), despite the fewer
                                 # dispatches. Kept as an option for small-B
                                 # serving where per-call overhead dominates.
    realworld_pts: bool = False  # real-demo variant: the pose branch consumes
                                 # an MLP over (px, py, depth) per point —
                                 # original-frame pixel coords + predicted
                                 # metric depth — instead of the depth-
                                 # probability-weighted volume features
                                 # (reference network_realworld.py:42-47,
                                 # 201-215); requires v1_pts2d/v2_pts2d
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, v1_img, v1_choose, v2_img, v2_choose, v1_proj, v2_proj,
                 depth_values, train: bool = False, v1_pts2d=None,
                 v2_pts2d=None):
        B, S = v1_img.shape[0], v1_img.shape[1]
        D = depth_values.shape[1]

        psp = PSPNet(backend=self.backend, backbone_stride=self.backbone_stride,
                     dtype=self.dtype, name="img_extractor")
        fs = self.backbone_stride // 8   # feature-map stride wrt S
        # two-view batching (eval only — see fuse_views)
        fuse2 = self.fuse_views and not train and not self.realworld_pts
        if fuse2:
            f12 = psp(jnp.concatenate([v1_img, v2_img], 0), train)
            f1, f2 = f12[:B], f12[B:]
        else:
            f1 = psp(v1_img, train)   # (B, S/fs, S/fs, 32)
            f2 = psp(v2_img, train)

        vs = self.volume_scale
        if vs % fs != 0:
            raise ValueError(f"volume_scale {vs} must be a multiple of the "
                             f"feature stride {fs} (backbone_stride "
                             f"{self.backbone_stride})")
        pv = vs // fs            # extra pooling from feature res -> volume res
        if pv > 1:
            f1v = nn.avg_pool(f1, (pv, pv), strides=(pv, pv))
            f2v = nn.avg_pool(f2, (pv, pv), strides=(pv, pv))
        else:
            f1v, f2v = f1, f2
        if vs > 1:
            scale_mat = jnp.diag(jnp.array([1.0 / vs, 1.0 / vs, 1.0, 1.0]))
            p1v = jnp.einsum("ij,bjk->bik", scale_mat, v1_proj)
            p2v = jnp.einsum("ij,bjk->bik", scale_mat, v2_proj)
        else:
            p1v, p2v = v1_proj, v2_proj
        Sv = S // vs
        if Sv % 8 != 0:
            raise ValueError(
                f"volume resolution img_size/volume_scale = {Sv} must be "
                f"divisible by 8: the cost-regularization U-Net halves the "
                f"spatial dims three times and its deconvs double exactly, "
                f"so skip connections only line up at multiples of 8")
        if self.volume_channels:
            vol_reduce = nn.Conv(self.volume_channels, (1, 1), use_bias=False,
                                 dtype=self.dtype, name="volume_reduce")
            f1v = vol_reduce(f1v)
            f2v = vol_reduce(f2v)
        C = f1v.shape[-1]

        hwd = self.reg_impl == "banded2d"
        if self.stereo_fusion:
            layout = "hwd" if hwd else "dhw"
            w2 = homo_warp_batched(f2v, p2v, p1v, depth_values, self.warp_mode,
                                   layout)
            w1 = homo_warp_batched(f1v, p1v, p2v, depth_values, self.warp_mode,
                                   layout)
            if hwd:
                fused1 = f1v[:, :, :, None, :] + w2   # (B, Sv, Sv, D, C)
                fused2 = f2v[:, :, :, None, :] + w1
            else:
                fused1 = f1v[:, None] + w2            # (B, D, Sv, Sv, C)
                fused2 = f2v[:, None] + w1
        else:  # ablation: single-view volume, no cross-view warping
            if hwd:
                fused1 = jnp.broadcast_to(f1v[:, :, :, None, :],
                                          (B, Sv, Sv, D, C))
                fused2 = jnp.broadcast_to(f2v[:, :, :, None, :],
                                          (B, Sv, Sv, D, C))
            else:
                fused1 = jnp.broadcast_to(f1v[:, None], (B, D) + f1v.shape[1:])
                fused2 = jnp.broadcast_to(f2v[:, None], (B, D) + f2v.shape[1:])

        # per-point NOCS features at the chosen pixels. One-hot matmul
        # sampling: the MXU runs point gathers ~40x faster than the scalar
        # gather path for N~1K points (see ops.gather).
        from ....ops.gather import flat_gather, point_sample_matmul

        def gather_pts(feat, choose):
            # pixel-center alignment into the strided map (grid_sample
            # align=False semantics): (p + 0.5)/fs - 0.5, not p/fs [ADVICE]
            py = ((choose // S).astype(jnp.float32) + 0.5) / fs - 0.5
            px = ((choose % S).astype(jnp.float32) + 0.5) / fs - 0.5
            return point_sample_matmul(feat, py, px)

        instance_color = MLP1D((64,), final="relu", dtype=self.dtype,
                               name="instance_color")
        nocs_head = MLP1D((128, 64, 3), final="tanh", dtype=self.dtype,
                          name="nocs_head")
        if fuse2:
            ch12 = jnp.concatenate([v1_choose, v2_choose], 0)
            nocs12 = nocs_head(instance_color(
                gather_pts(jnp.concatenate([f1, f2], 0), ch12)))
            nocs1, nocs2 = nocs12[:B], nocs12[B:]
        else:
            nocs1 = nocs_head(instance_color(gather_pts(f1, v1_choose)))
            nocs2 = nocs_head(instance_color(gather_pts(f2, v2_choose)))

        # cost regularization -> (B, Sv, Sv, D) channels-dense cost volume
        if hwd:
            reg = CostRegNet2D(base=8, dtype=self.dtype,
                               name="cost_regularization")
            if fuse2:
                cost12 = reg(jnp.concatenate([fused1, fused2],
                                             0).reshape(2 * B, Sv, Sv, D * C),
                             D, train)
                cost1, cost2 = cost12[:B], cost12[B:]
            else:
                cost1 = reg(fused1.reshape(B, Sv, Sv, D * C), D, train)
                cost2 = reg(fused2.reshape(B, Sv, Sv, D * C), D, train)
        else:
            reg = CostRegNet(base=8, dtype=self.dtype,
                             name="cost_regularization")
            if fuse2:
                cost12 = reg(jnp.concatenate([fused1, fused2], 0), train)
                cost1 = jnp.moveaxis(cost12[:B, ..., 0], 1, -1)
                cost2 = jnp.moveaxis(cost12[B:, ..., 0], 1, -1)
            else:
                cost1 = jnp.moveaxis(reg(fused1, train)[..., 0], 1, -1)
                cost2 = jnp.moveaxis(reg(fused2, train)[..., 0], 1, -1)

        def point_depth(cost, choose, dvals):
            # cost (B, Sv, Sv, D): sample the D-vector at each chosen pixel
            # (full-res coords mapped into the reduced volume) via matmul
            # sampling
            py = ((choose // S).astype(jnp.float32) + 0.5) / vs - 0.5
            px = ((choose % S).astype(jnp.float32) + 0.5) / vs - 0.5
            pts = point_sample_matmul(cost, py, px)                   # (B, N, D)
            prob = jax.nn.softmax(pts.astype(jnp.float32), axis=-1)
            depth = (prob * dvals[:, None, :]).sum(-1)                # (B, N)
            return prob, depth

        if fuse2:
            dv12 = jnp.concatenate([depth_values, depth_values], 0)
            prob12, depth12 = point_depth(cost12 if hwd else
                                          jnp.concatenate([cost1, cost2], 0),
                                          ch12, dv12)
            prob1, prob2 = prob12[:B], prob12[B:]
            depth1, depth2 = depth12[:B], depth12[B:]
        else:
            prob1, depth1 = point_depth(cost1, v1_choose, depth_values)
            prob2, depth2 = point_depth(cost2, v2_choose, depth_values)

        out = {"view1_nocs": nocs1, "view2_nocs": nocs2,
               "view1_depth": depth1, "view2_depth": depth2}

        if self.regress_pose:
            heads = PoseHeads(dtype=self.dtype, name="heads")
            nocs_pts_mlp = MLP1D((32, 64), final="relu", dtype=self.dtype,
                                 name="nocs_pts_mlp")

            if self.realworld_pts:
                # real-demo pose branch (reference network_realworld.py:
                # 201-215): per-point (px, py, depth) through an MLP,
                # concatenated with the NOCS point features
                if v1_pts2d is None or v2_pts2d is None:
                    raise ValueError(
                        "realworld_pts=True requires v1_pts2d/v2_pts2d")
                camera_pts_mlp = MLP1D((32, 64), final="relu",
                                       dtype=self.dtype,
                                       name="camera_pts_mlp")

                def pose_branch_rw(pts2d, depth, nocs):
                    pts3d = jnp.concatenate(
                        [pts2d.astype(self.dtype),
                         depth[..., None].astype(self.dtype)], axis=-1)
                    return jnp.concatenate(
                        [camera_pts_mlp(pts3d),
                         nocs_pts_mlp(nocs).astype(self.dtype)], axis=-1)

                R1, t1, s1 = heads(pose_branch_rw(v1_pts2d, depth1, nocs1))
                R2, t2, s2 = heads(pose_branch_rw(v2_pts2d, depth2, nocs2))
                out.update({"view1_r": R1, "view1_t": t1, "view1_s": s1,
                            "view2_r": R2, "view2_t": t2, "view2_s": s2})
                return out

            def pose_branch(fused, choose, prob, nocs):
                # depth-probability-weighted volume features at chosen points
                # (nearest pixel of the reduced volume). Gather layout: one
                # (D*C)-wide row per point instead of D C-wide rows — TPU
                # gathers pay per row, so 24x fewer/24x bigger rows runs at
                # HBM bandwidth (the (B,N,D)-indexed form profiled ~10 ms/view
                # at B=16). In the channels-dense path the volume is already
                # (B, Sv, Sv, D, C): the wide gather needs no transpose.
                Bp = fused.shape[0]
                py = jnp.clip((choose // S).astype(jnp.int32) // vs, 0, Sv - 1)
                px = jnp.clip((choose % S).astype(jnp.int32) // vs, 0, Sv - 1)
                if hwd:
                    fused_t = fused.reshape(Bp, Sv * Sv, D * C)
                else:
                    fused_t = jnp.moveaxis(fused, 1, 3).reshape(Bp, Sv * Sv, D * C)
                pts = flat_gather(fused_t, py * Sv + px)      # (B, N, D*C)
                pts = pts.reshape(Bp, -1, D, C)
                feat = (pts * prob[..., None].astype(pts.dtype)).sum(2)
                nocs_feat = nocs_pts_mlp(nocs)
                return jnp.concatenate([feat, nocs_feat.astype(pts.dtype)], axis=-1)

            if fuse2:
                fused12 = jnp.concatenate([fused1, fused2], 0)
                R12, t12, s12 = heads(pose_branch(fused12, ch12, prob12, nocs12))
                R1, t1, s1 = R12[:B], t12[:B], s12[:B]
                R2, t2, s2 = R12[B:], t12[B:], s12[B:]
            else:
                R1, t1, s1 = heads(pose_branch(fused1, v1_choose, prob1, nocs1))
                R2, t2, s2 = heads(pose_branch(fused2, v2_choose, prob2, nocs2))
            out.update({"view1_r": R1, "view1_t": t1, "view1_s": s1,
                        "view2_r": R2, "view2_t": t2, "view2_s": s2})
        return out


class StereoPoseNetV1(nn.Module):
    """v1 architecture: volume_conv fusion + fuse_conv residual
    (reference network_v5.py:36-215), kept for the ablation interfaces."""
    backend: str = "resnet34"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, v1_img, v1_choose, v2_img, v2_choose, v1_proj, v2_proj,
                 depth_values, train: bool = False):
        B, S = v1_img.shape[0], v1_img.shape[1]
        D = depth_values.shape[1]
        psp = PSPNet(backend=self.backend, dtype=self.dtype, name="img_extractor")
        f1 = psp(v1_img, train)
        f2 = psp(v2_img, train)
        w2 = homo_warp_batched(f2, v2_proj, v1_proj, depth_values)
        w1 = homo_warp_batched(f1, v1_proj, v2_proj, depth_values)
        fused1 = f1[:, None] + w2
        fused2 = f2[:, None] + w1

        class VolumeConv(nn.Module):
            dtype: jnp.dtype = jnp.float32

            @nn.compact
            def __call__(self, x):
                for i, ch in enumerate((16, 8, 1)):
                    x = nn.Conv(ch, (1, 1, 1), use_bias=False, dtype=self.dtype,
                                name=f"conv_{i}")(x)
                    x = nn.BatchNorm(use_running_average=not train,
                                     dtype=self.dtype, name=f"bn_{i}")(x)
                    x = nn.relu(x)
                return x[..., 0]  # (B, D, S, S)

        volume_conv = VolumeConv(dtype=self.dtype, name="volume_conv")
        fuse_conv = MLP1D((32, 32), dtype=self.dtype, name="fuse_conv")

        g1 = jnp.moveaxis(volume_conv(fused1), 1, -1)  # (B, S, S, D)
        g2 = jnp.moveaxis(volume_conv(fused2), 1, -1)
        f1 = nn.relu(f1 + fuse_conv(g1))
        f2 = nn.relu(f2 + fuse_conv(g2))

        from ....ops.gather import flat_gather

        def gather_pts(feat, choose):
            return flat_gather(feat.reshape(B, S * S, feat.shape[-1]), choose)

        instance_color = MLP1D((64,), final="relu", dtype=self.dtype,
                               name="instance_color")
        nocs_head = MLP1D((128, 64, 3), final="tanh", dtype=self.dtype,
                          name="nocs_head")
        n1 = instance_color(gather_pts(f1, v1_choose))
        n2 = instance_color(gather_pts(f2, v2_choose))
        nocs1, nocs2 = nocs_head(n1), nocs_head(n2)

        heads = PoseHeads(dtype=self.dtype, name="heads")
        nocs_pts_mlp = MLP1D((32, 64), final="relu", dtype=self.dtype,
                             name="nocs_pts_mlp")

        def branch(feat, nocs):
            return jnp.concatenate([feat, nocs_pts_mlp(nocs)], axis=-1)

        R1, t1, s1 = heads(branch(n1, nocs1))
        R2, t2, s2 = heads(branch(n2, nocs2))
        return {"view1_nocs": nocs1, "view2_nocs": nocs2,
                "view1_r": R1, "view1_t": t1, "view1_s": s1,
                "view2_r": R2, "view2_t": t2, "view2_s": s2}
