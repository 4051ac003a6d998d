"""AdaPose estimator tests: preprocessing, network forward, full estimate
with a gt-NOCS oracle check, converter mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbmanip_tpu.utils.logger import get_logger

LOG = get_logger()
LOG.setLevel("WARNING")

S = 64       # small img_size for CPU tests
NPTS = 128


def small_cfg(**over):
    cfg = {"name": "adapose_v5", "task_name": "one_door_cabinet", "load": False,
           "checkpoint_path": "", "img_size": S, "use_depth": True,
           "n_pts": NPTS, "direct_regression": True, "real_world": False}
    cfg.update(over)
    return cfg


def test_preprocess_shapes_and_intrinsics():
    from rgbmanip_tpu.ops.preprocess import prepare_model_input

    rng = np.random.default_rng(0)
    B, H, W = 2, 480, 640
    rgb = rng.uniform(size=(B, H, W, 3)).astype(np.float32)
    mask = np.zeros((B, H, W), bool)
    mask[:, 200:280, 300:360] = True
    K = np.tile(np.array([[439.3, 0, 320], [0, 439.3, 240], [0, 0, 1.0]]), (B, 1, 1))
    crop, choose, pts2d, newK, valid = prepare_model_input(
        jnp.array(rgb), jnp.array(mask), jnp.array(K), jax.random.PRNGKey(0),
        out_size=S, n_pts=NPTS)
    assert crop.shape == (B, S, S, 3)
    assert choose.shape == (B, NPTS)
    assert pts2d.shape == (B, NPTS, 2)
    assert bool(valid.all())
    # all chosen pixels land inside the mask bbox in original coords
    p = np.asarray(pts2d)
    assert (p[..., 0] >= 295).all() and (p[..., 0] <= 365).all()
    assert (p[..., 1] >= 195).all() and (p[..., 1] <= 285).all()
    # adjusted K: projecting a point at the window center lands mid-crop.
    # cv2-convention check: resized = (orig - cmin) * ratio
    nk = np.asarray(newK)
    assert abs(nk[0, 0, 0] / K[0, 0, 0] - nk[0, 1, 1] / K[0, 1, 1]) < 1e-5


def test_empty_mask_invalid():
    from rgbmanip_tpu.ops.preprocess import prepare_model_input

    rgb = jnp.zeros((1, 480, 640, 3))
    mask = jnp.zeros((1, 480, 640), bool)
    K = jnp.tile(jnp.eye(3)[None], (1, 1, 1))
    _, _, _, _, valid = prepare_model_input(rgb, mask, K, jax.random.PRNGKey(0),
                                            out_size=S, n_pts=NPTS)
    assert not bool(valid.any())


def test_network_forward_shapes():
    from rgbmanip_tpu.models.pose_estimator.nets.stereo import StereoPoseNetWithDepth
    from rgbmanip_tpu.ops.preprocess import depth_hypotheses

    model = StereoPoseNetWithDepth(backend="resnet18", regress_pose=True)
    B = 1
    k = jax.random.PRNGKey(7)
    args = (jax.random.uniform(k, (B, S, S, 3)),
            jax.random.randint(k, (B, NPTS), 0, S * S),
            jax.random.uniform(k, (B, S, S, 3)),
            jax.random.randint(k, (B, NPTS), 0, S * S),
            jnp.eye(4)[None], jnp.eye(4)[None], depth_hypotheses(B, n=8))
    variables = model.init(jax.random.PRNGKey(0), *args, train=False)
    out = model.apply(variables, *args, train=False)
    assert out["view1_nocs"].shape == (B, NPTS, 3)
    assert out["view1_depth"].shape == (B, NPTS)
    assert out["view1_r"].shape == (B, 3, 3)
    # rotation is orthonormal
    R = np.asarray(out["view1_r"][0])
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # nocs in [-1, 1]
    assert np.abs(np.asarray(out["view1_nocs"])).max() <= 1.0


@pytest.mark.parametrize("bs,vs", [(16, 2), (32, 4)])
def test_network_fast_backbone_strides(bs, vs):
    """The TPU-fast strided backbone variants (backbone_stride 16/32) keep
    the full output contract; NOCS points sample the reduced feature map."""
    from rgbmanip_tpu.models.pose_estimator.nets.stereo import StereoPoseNetWithDepth
    from rgbmanip_tpu.ops.preprocess import depth_hypotheses

    model = StereoPoseNetWithDepth(backend="resnet18", regress_pose=True,
                                   backbone_stride=bs, volume_scale=vs,
                                   warp_mode="nearest")
    B = 1
    k = jax.random.PRNGKey(7)
    args = (jax.random.uniform(k, (B, S, S, 3)),
            jax.random.randint(k, (B, NPTS), 0, S * S),
            jax.random.uniform(k, (B, S, S, 3)),
            jax.random.randint(k, (B, NPTS), 0, S * S),
            jnp.eye(4)[None], jnp.eye(4)[None], depth_hypotheses(B, n=8))
    variables = model.init(jax.random.PRNGKey(0), *args, train=False)
    out = model.apply(variables, *args, train=False)
    assert out["view1_nocs"].shape == (B, NPTS, 3)
    assert out["view1_depth"].shape == (B, NPTS)
    R = np.asarray(out["view1_r"][0])
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.isfinite(np.asarray(out["view1_depth"])).all()
    # volume_scale must stay a multiple of the feature stride
    bad = StereoPoseNetWithDepth(backend="resnet18", backbone_stride=32,
                                 volume_scale=2)
    with pytest.raises(ValueError, match="multiple of the feature stride"):
        bad.init(jax.random.PRNGKey(0), *args, train=False)


def test_estimator_estimate_api():
    from rgbmanip_tpu.models.pose_estimator.adapose import AdaPoseEstimator, DEFAULT_BBOX

    est = AdaPoseEstimator(small_cfg(), LOG)
    rng = np.random.default_rng(1)
    B, H, W = 2, 480, 640
    rgb = rng.uniform(size=(B, H, W, 3)).astype(np.float32)
    mask = np.zeros((B, H, W), bool)
    mask[0, 200:280, 300:360] = True  # env 1 has an empty mask
    K = np.tile(np.array([[439.3, 0, 320], [0, 439.3, 240], [0, 0, 1.0]]), (B, 1, 1))
    ext = np.tile(np.eye(4), (B, 1, 1))
    ext[:, 2, 3] = 1.0
    bbox = est.estimate(K, rgb, mask, ext, rgb, mask, ext)
    assert bbox.shape == (B, 8, 3)
    np.testing.assert_allclose(bbox[1], DEFAULT_BBOX)  # empty mask -> sentinel
    assert np.isfinite(bbox).all()


def test_v1_architecture_estimate():
    """make_estimator('v1') builds the original StereoPoseNet (volume_conv +
    fuse_conv residual, reference lib/network.py:39-215) and solves via
    triangulation+PnP end-to-end."""
    from rgbmanip_tpu.models.pose_estimator.adapose import make_estimator

    est = make_estimator("v1", small_cfg(n_depth=8), LOG)
    assert est.arch == "v1"
    assert type(est.model).__name__ == "StereoPoseNetV1"
    rng = np.random.default_rng(3)
    B, H, W = 2, 480, 640
    rgb = rng.uniform(size=(B, H, W, 3)).astype(np.float32)
    mask = np.zeros((B, H, W), bool)
    mask[:, 200:280, 300:360] = True
    K = np.tile(np.array([[439.3, 0, 320], [0, 439.3, 240], [0, 0, 1.0]]), (B, 1, 1))
    ext1 = np.tile(np.eye(4), (B, 1, 1))
    ext1[:, 2, 3] = 1.0
    ext2 = ext1.copy()
    ext2[:, 0, 3] = 0.1  # second view offset for triangulation
    bbox = est.estimate(K, rgb, mask, ext1, rgb, mask, ext2)
    assert bbox.shape == (B, 8, 3)
    assert np.isfinite(bbox).all()
    # depth-head modes are incompatible with the v1 architecture
    with pytest.raises(ValueError, match="no depth head"):
        make_estimator("v5", small_cfg(arch="v1"), LOG)


def test_solve_oracle_nocs():
    """With oracle NOCS+depth, the use_depth solve path recovers the gt box."""
    from rgbmanip_tpu.ops import geometry as G

    rng = np.random.default_rng(2)
    scale = 0.35
    R = np.eye(3)
    t = np.array([0.05, -0.02, 0.9])
    nocs = rng.uniform(-0.5, 0.5, size=(NPTS, 3))
    cam_pts = scale * nocs @ R.T + t
    s2, R2, t2, ok = G.ransac_umeyama(jnp.array(nocs), jnp.array(cam_pts),
                                      jax.random.PRNGKey(1))
    assert bool(ok)
    np.testing.assert_allclose(float(s2), scale, rtol=0.02)
    half = np.abs(nocs).max(0)
    size = 2 * half * float(s2)
    bbox = np.asarray(G.get_3d_bbox(jnp.array(size)))
    sRT = np.eye(4)
    sRT[:3, :3] = np.asarray(R2)
    sRT[:3, 3] = np.asarray(t2)
    out = np.asarray(G.transform_coordinates_3d(jnp.array(bbox), jnp.array(sRT)))
    expect_center = t
    np.testing.assert_allclose(out.mean(1), expect_center, atol=0.02)


def test_converter_mapping_covers_tree():
    """Synthetic torch state dict -> converted values land at the right
    leaves with the right shapes."""
    from rgbmanip_tpu.models.pose_estimator.adapose import AdaPoseEstimator
    from rgbmanip_tpu.models.pose_estimator.converter import (
        _TRANSFORMS, convert_state_dict, torch_key_map)

    est = AdaPoseEstimator(small_cfg(), LOG)
    kmap = torch_key_map()

    # build a synthetic torch state dict with the inverse transforms
    inverse = {
        "conv2d": lambda w: np.transpose(w, (3, 2, 0, 1)),
        "conv3d": lambda w: np.transpose(w, (4, 3, 0, 1, 2)),
        "deconv3d": lambda w: np.transpose(w, (3, 4, 0, 1, 2)),
        "dense": lambda w: np.transpose(w)[..., None] if False else np.transpose(w),
        "copy": lambda w: w,
        "stats": lambda w: w,
    }

    def get_path(tree, path):
        node = tree
        for k in path:
            if k not in node:
                return None
            node = node[k]
        return node

    params = jax.device_get(est.params)
    stats = jax.device_get(est.batch_stats)
    state = {}
    marker = {}
    for i, (tk, (path, kind)) in enumerate(kmap.items()):
        tree = stats if kind == "stats" else params
        leaf = get_path(tree, path)
        assert leaf is not None, f"flax leaf missing for {tk} -> {path}"
        val = np.full(np.asarray(leaf).shape, float(i % 97), np.float32)
        state["module." + tk] = inverse[kind](val)
        marker[path] = float(i % 97)

    new_params, new_stats, n, unknown = convert_state_dict(state, params, stats)
    assert not unknown
    assert n == len(kmap)
    for path, v in marker.items():
        tree = new_stats if get_path(new_stats, path) is not None and \
            get_path(new_params, path) is None else new_params
        leaf = get_path(tree, path)
        assert leaf is not None
        np.testing.assert_allclose(np.asarray(leaf).ravel()[0], v)
