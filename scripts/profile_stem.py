#!/usr/bin/env python
"""Where does PSPNet r18-s32 time go at B=64/192px, and what would a
TPU-friendly stem buy? Candidates keep the same downsample factor (4x at
the stem) and output channels (64)."""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo")
from perfutil import scan_bench

B, S = 64, 192
dt = jnp.bfloat16
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
img = jnp.asarray(rng.uniform(size=(B, S, S, 3)).astype(np.float32)).astype(dt)
which = sys.argv[1] if len(sys.argv) > 1 else "all"


class Stem7x7(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False, dtype=dt)(x)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class StemS2D(nn.Module):
    """space-to-depth 4x4 -> 1x1-equivalent field via 3x3 conv on 48ch."""
    @nn.compact
    def __call__(self, x):
        B_, H, W, C = x.shape
        x = x.reshape(B_, H // 4, 4, W // 4, 4, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B_, H // 4, W // 4, 48)
        x = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=dt)(x)
        return nn.relu(x)


if which in ("all", "stem"):
    for name, mod in [("stem 7x7+pool", Stem7x7()), ("stem s2d+3x3", StemS2D())]:
        v = mod.init(key, img)
        ms = scan_bench(lambda x, m=mod, vv=v: m.apply(vv, x), img, iters=8, reps=2)
        print(f"{name:18s}: {ms:7.2f} ms", flush=True)

if which in ("all", "layers"):
    from rgbmanip_tpu.models.pose_estimator.nets.pspnet import ResNetFeats
    feats = ResNetFeats(layers=(2, 2, 2, 2), stride=32, dtype=dt)
    v = feats.init(key, img)
    ms = scan_bench(lambda x: feats.apply(v, x), img, iters=8, reps=2)
    print(f"ResNetFeats(whole) : {ms:7.2f} ms", flush=True)

if which in ("all", "head"):
    # PSP head + upsamples operate on the layer4 output; measure on its shape
    from rgbmanip_tpu.models.pose_estimator.nets.pspnet import PSPNet
    psp = PSPNet(backend="resnet18", backbone_stride=32, dtype=dt)
    v = psp.init(key, img)
    ms = scan_bench(lambda x: psp.apply(v, x), img, iters=8, reps=2)
    print(f"PSPNet(total)      : {ms:7.2f} ms", flush=True)
