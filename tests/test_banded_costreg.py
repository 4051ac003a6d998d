"""Equivalence of the banded-dense 2D execution plan vs the 3-D CostRegNet
(same parameter tree, same math), and of the channels-dense full net."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbmanip_tpu.models.pose_estimator.nets.stereo import (
    CostRegNet, CostRegNet2D, StereoPoseNetWithDepth)


def test_costreg_banded_equivalence():
    B, D, Sv, C = 2, 8, 16, 4
    key = jax.random.PRNGKey(0)
    vol_dhw = jax.random.normal(key, (B, D, Sv, Sv, C))
    vol_hwd = jnp.moveaxis(vol_dhw, 1, 3).reshape(B, Sv, Sv, D * C)

    reg2d = CostRegNet2D(base=8)
    v = reg2d.init(jax.random.PRNGKey(1), vol_hwd, D, False)
    reg3d = CostRegNet(base=8)
    # identical parameter tree: apply the 2D-initialized variables to the 3D net
    out3d = reg3d.apply(v, vol_dhw, False)[..., 0]          # (B, D, Sv, Sv)
    out2d = reg2d.apply(v, vol_hwd, D, False)               # (B, Sv, Sv, D)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(out3d, 1, -1)),
                               np.asarray(out2d), rtol=2e-4, atol=2e-4)


def test_costreg_banded_train_mode_stats():
    B, D, Sv, C = 2, 8, 8, 4
    key = jax.random.PRNGKey(0)
    vol_dhw = jax.random.normal(key, (B, D, Sv, Sv, C))
    vol_hwd = jnp.moveaxis(vol_dhw, 1, 3).reshape(B, Sv, Sv, D * C)
    reg2d = CostRegNet2D(base=8)
    v = reg2d.init(jax.random.PRNGKey(1), vol_hwd, D, False)
    reg3d = CostRegNet(base=8)
    o2, m2 = reg2d.apply(v, vol_hwd, D, True, mutable=["batch_stats"])
    o3, m3 = reg3d.apply(v, vol_dhw, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(o3[..., 0], 1, -1)),
                               np.asarray(o2), rtol=2e-4, atol=2e-4)
    # batch-norm running statistics identical (per-Co over B, D, H, W)
    f2 = jax.tree.leaves(m2["batch_stats"])
    f3 = jax.tree.leaves(m3["batch_stats"])
    for a, b in zip(f2, f3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("fusion", [True, False])
def test_full_net_banded_equivalence(fusion):
    B, S, D, N = 2, 32, 8, 16
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (B, S, S, 3))
    choose = jax.random.randint(jax.random.PRNGKey(2), (B, N), 0, S * S)
    proj = jnp.tile(jnp.eye(4), (B, 1, 1))
    proj2 = proj.at[:, 0, 3].set(0.05)
    depths = jnp.tile(jnp.linspace(0.3, 1.5, D)[None], (B, 1))

    kw = dict(backend="resnet18", volume_scale=2, warp_mode="bilinear",
              stereo_fusion=fusion)
    net2 = StereoPoseNetWithDepth(reg_impl="banded2d", **kw)
    net3 = StereoPoseNetWithDepth(reg_impl="conv3d", **kw)
    v = net2.init(jax.random.PRNGKey(1), img, choose, img, choose, proj,
                  proj2, depths, False)
    o2 = net2.apply(v, img, choose, img, choose, proj, proj2, depths, False)
    o3 = net3.apply(v, img, choose, img, choose, proj, proj2, depths, False)
    for k in o2:
        np.testing.assert_allclose(np.asarray(o2[k]), np.asarray(o3[k]),
                                   rtol=5e-3, atol=5e-4, err_msg=k)


def test_volume_channels_knob():
    B, S, D, N = 2, 32, 8, 16
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (B, S, S, 3))
    choose = jax.random.randint(jax.random.PRNGKey(2), (B, N), 0, S * S)
    proj = jnp.tile(jnp.eye(4), (B, 1, 1))
    depths = jnp.tile(jnp.linspace(0.3, 1.5, D)[None], (B, 1))
    net = StereoPoseNetWithDepth(backend="resnet18", volume_scale=2,
                                 volume_channels=8)
    v = net.init(key, img, choose, img, choose, proj, proj, depths, False)
    assert "volume_reduce" in v["params"]
    out = net.apply(v, img, choose, img, choose, proj, proj, depths, False)
    assert out["view1_nocs"].shape == (B, N, 3)
    assert np.isfinite(np.asarray(out["view1_depth"])).all()
