"""Eval-mode two-view batching (StereoPoseNetWithDepth.fuse_views) must be
mathematically identical to the per-view path: BatchNorm uses running stats
at eval, every other op is per-sample, so stacking the two views along batch
changes scheduling only."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbmanip_tpu.models.pose_estimator.nets.stereo import StereoPoseNetWithDepth
from rgbmanip_tpu.ops.preprocess import depth_hypotheses


@pytest.mark.parametrize("reg_impl", ["banded2d", "conv3d"])
def test_fuse_views_exact(reg_impl):
    B, S, N, D = 2, 32, 64, 8
    key = jax.random.PRNGKey(0)
    kw = dict(backend="resnet18", regress_pose=True, volume_scale=2,
              warp_mode="nearest", reg_impl=reg_impl)
    args = (
        jax.random.uniform(key, (B, S, S, 3)),
        jax.random.randint(key, (B, N), 0, S * S),
        jax.random.uniform(jax.random.PRNGKey(1), (B, S, S, 3)),
        jax.random.randint(jax.random.PRNGKey(2), (B, N), 0, S * S),
        jnp.tile(jnp.eye(4), (B, 1, 1)),
        jnp.tile(jnp.eye(4).at[0, 3].set(0.1), (B, 1, 1)),
        depth_hypotheses(B, n=D),
    )
    fused_model = StereoPoseNetWithDepth(fuse_views=True, **kw)
    vars_ = fused_model.init(key, *args, train=False)
    split_model = StereoPoseNetWithDepth(fuse_views=False, **kw)

    out_f = fused_model.apply(vars_, *args, train=False)
    out_s = split_model.apply(vars_, *args, train=False)
    assert set(out_f) == set(out_s)
    for k in out_s:
        np.testing.assert_allclose(np.asarray(out_f[k], np.float32),
                                   np.asarray(out_s[k], np.float32),
                                   atol=2e-4, rtol=2e-3, err_msg=k)


def test_fuse_views_train_path_unchanged():
    """train=True always takes the per-view path (BN batch statistics must
    not see both views in one batch): outputs with fuse_views on/off are
    identical bitwise in train mode."""
    B, S, N, D = 2, 32, 32, 8
    key = jax.random.PRNGKey(0)
    kw = dict(backend="resnet18", regress_pose=True, volume_scale=2,
              warp_mode="nearest")
    args = (
        jax.random.uniform(key, (B, S, S, 3)),
        jax.random.randint(key, (B, N), 0, S * S),
        jax.random.uniform(key, (B, S, S, 3)),
        jax.random.randint(key, (B, N), 0, S * S),
        jnp.tile(jnp.eye(4), (B, 1, 1)),
        jnp.tile(jnp.eye(4), (B, 1, 1)),
        depth_hypotheses(B, n=D),
    )
    m1 = StereoPoseNetWithDepth(fuse_views=True, **kw)
    vars_ = m1.init(key, *args, train=False)
    m2 = StereoPoseNetWithDepth(fuse_views=False, **kw)
    o1, _ = m1.apply(vars_, *args, train=True, mutable=["batch_stats"])
    o2, _ = m2.apply(vars_, *args, train=True, mutable=["batch_stats"])
    for k in o2:
        np.testing.assert_array_equal(np.asarray(o1[k]), np.asarray(o2[k]),
                                      err_msg=k)
