"""Torch -> flax checkpoint conversion for the AdaPose networks.

The reference ships trained ``.pth`` state dicts (``install.sh:7-10``,
loaded at ``interface_v5.py:56-57`` through an ``nn.DataParallel`` wrapper, so
keys carry a ``module.`` prefix). This module maps those names/layouts onto
our flax ``StereoPoseNetWithDepth`` tree:

  torch Conv2d  OIHW   -> flax Conv  HWIO
  torch Conv3d  OIDHW  -> flax Conv  DHWIO
  torch ConvTranspose3d (I, O, D, H, W) -> flax ConvTranspose (D, H, W, I, O)
  torch Conv1d  (O, I, 1) / Linear (O, I) -> flax Dense (I, O)
  BatchNorm weight/bias/running_mean/running_var -> scale/bias + batch_stats

Transposed convs: ``_TorchDeconv3d``/the banded plan implement torch
``ConvTranspose3d(k3, s2, p1, op1)`` alignment (apply-time spatial flip,
explicit (1, 2) padding), so the plain (D, H, W, I, O) transpose here is
numerically exact. Per-block parity against CPU torch is validated by
``tests/test_converter.py`` (synthetic state dicts — the released .pth files
require network access the build environment does not have).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _t2f_conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def _t2f_conv3d(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _t2f_deconv3d(w):
    return np.transpose(w, (2, 3, 4, 0, 1))


def _t2f_dense(w):
    return np.transpose(np.squeeze(w))  # (O,I,1)->(I,O) or (O,I)->(I,O)


def torch_key_map() -> Dict[str, Tuple[Tuple[str, ...], str]]:
    """Mapping: torch state_dict key (sans 'module.') ->
    ((flax path,), transform-name). Generated for StereoPoseNetWithDepth
    with regress_pose=True, resnet34 backend."""
    m: Dict[str, Tuple[Tuple[str, ...], str]] = {}

    def conv2d(tk, *fp):
        m[tk + ".weight"] = (fp + ("kernel",), "conv2d")

    # --- PSPNet backbone ---
    pe = ("img_extractor",)
    conv2d("img_extractor.feats.conv1", *pe, "feats", "conv1")
    for li, blocks in enumerate([3, 4, 6, 3], start=1):
        for b in range(blocks):
            base = f"img_extractor.feats.layer{li}.{b}"
            fbase = pe + ("feats", f"layer{li}_{b}")
            conv2d(base + ".conv1", *fbase, "conv1")
            conv2d(base + ".conv2", *fbase, "conv2")
            if b == 0 and li > 1:
                conv2d(base + ".downsample.0", *fbase, "downsample")
    for s in range(4):
        conv2d(f"img_extractor.psp.stages.{s}.1", *pe, "psp", f"stage{s}")
    for u in (1, 2, 3):
        m[f"img_extractor.up_{u}.conv.0.weight"] = (pe + (f"up_{u}", "conv", "kernel"), "conv2d")
        m[f"img_extractor.up_{u}.conv.0.bias"] = (pe + (f"up_{u}", "conv", "bias"), "copy")
        m[f"img_extractor.up_{u}.conv.1.weight"] = (pe + (f"up_{u}", "prelu"), "copy")
    m["img_extractor.final.weight"] = (pe + ("final", "kernel"), "conv2d")
    m["img_extractor.final.bias"] = (pe + ("final", "bias"), "copy")

    # --- per-point MLPs (Conv1d stacks -> MLP1D/dense_i) ---
    m["instance_color.0.weight"] = (("instance_color", "dense_0", "kernel"), "dense")
    m["instance_color.0.bias"] = (("instance_color", "dense_0", "bias"), "copy")
    for i, t in enumerate((0, 2, 4)):
        m[f"nocs_head.{t}.weight"] = (("nocs_head", f"dense_{i}", "kernel"), "dense")
        m[f"nocs_head.{t}.bias"] = (("nocs_head", f"dense_{i}", "bias"), "copy")
    for i, t in enumerate((0, 2)):
        m[f"nocs_pts_mlp.{t}.weight"] = (("nocs_pts_mlp", f"dense_{i}", "kernel"), "dense")
        m[f"nocs_pts_mlp.{t}.bias"] = (("nocs_pts_mlp", f"dense_{i}", "bias"), "copy")

    # --- CostRegNet ---
    cr = ("cost_regularization",)
    for name, deconv in [("conv0", False), ("conv1", False), ("conv2", False),
                         ("conv3", False), ("conv4", False), ("conv5", False),
                         ("conv6", False), ("conv7", True), ("conv9", True),
                         ("conv11", True)]:
        kind = "deconv3d" if deconv else "conv3d"
        m[f"cost_regularization.{name}.conv.weight"] = (cr + (name, "conv", "kernel"), kind)
        m[f"cost_regularization.{name}.bn.weight"] = (cr + (name, "bn", "scale"), "copy")
        m[f"cost_regularization.{name}.bn.bias"] = (cr + (name, "bn", "bias"), "copy")
        m[f"cost_regularization.{name}.bn.running_mean"] = (cr + (name, "bn", "mean"), "stats")
        m[f"cost_regularization.{name}.bn.running_var"] = (cr + (name, "bn", "var"), "stats")
    m["cost_regularization.prob.weight"] = (cr + ("prob", "kernel"), "conv3d")

    # --- pose heads ---
    hd = ("heads",)
    for i, t in enumerate((0, 2)):
        m[f"pose_mlp1.{t}.weight"] = (hd + ("pose_mlp1", f"dense_{i}", "kernel"), "dense")
        m[f"pose_mlp1.{t}.bias"] = (hd + ("pose_mlp1", f"dense_{i}", "bias"), "copy")
        m[f"pose_mlp2.{t}.weight"] = (hd + ("pose_mlp2", f"dense_{i}", "kernel"), "dense")
        m[f"pose_mlp2.{t}.bias"] = (hd + ("pose_mlp2", f"dense_{i}", "bias"), "copy")
    for head, fh in [("rotation_estimator", "rotation"),
                     ("translation_estimator", "translation"),
                     ("size_estimator", "size")]:
        for i, t in enumerate((0, 2, 4)):
            m[f"{head}.{t}.weight"] = (hd + (f"{fh}_{i}", "kernel"), "dense")
            m[f"{head}.{t}.bias"] = (hd + (f"{fh}_{i}", "bias"), "copy")
    return m


_TRANSFORMS = {
    "conv2d": _t2f_conv2d,
    "conv3d": _t2f_conv3d,
    "deconv3d": _t2f_deconv3d,
    "dense": _t2f_dense,
    "copy": lambda w: np.asarray(w),
    "stats": lambda w: np.asarray(w),
}


def _set_path(tree: dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def convert_state_dict(state: Dict[str, np.ndarray], params, batch_stats):
    """Apply the key map onto copies of (params, batch_stats). Unknown torch
    keys are reported; missing flax leaves keep their initialization."""
    import jax

    params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
    batch_stats = jax.tree_util.tree_map(np.asarray, jax.device_get(batch_stats))
    kmap = torch_key_map()
    unknown, converted = [], 0
    for tk, w in state.items():
        tk = tk[len("module."):] if tk.startswith("module.") else tk
        if tk.endswith("num_batches_tracked"):
            continue
        if tk not in kmap:
            unknown.append(tk)
            continue
        path, kind = kmap[tk]
        value = _TRANSFORMS[kind](np.asarray(w))
        target = batch_stats if kind == "stats" else params
        _set_path(target, path, value)
        converted += 1
    return params, batch_stats, converted, unknown


def convert_torch_checkpoint(path: str, params, batch_stats):
    """Load a torch .pth and convert. Requires the baked-in CPU torch."""
    import torch

    state = torch.load(path, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    state = {k: v.numpy() for k, v in state.items()}
    params, batch_stats, n, unknown = convert_state_dict(state, params, batch_stats)
    if unknown:
        import warnings
        warnings.warn(f"converter: {len(unknown)} unmapped torch keys, e.g. {unknown[:5]}")
    return params, batch_stats
