"""Determinism: identical seeds must reproduce scene configs and estimates."""

import numpy as np

from rgbmanip_tpu.config import load_config
from rgbmanip_tpu.train import prepare_env
from rgbmanip_tpu.utils.logger import get_logger

LOG = get_logger()
LOG.setLevel("WARNING")


def test_env_reset_deterministic():
    cfg = load_config(["task.num_envs=2"])
    envs = []
    configs = []
    for _ in range(2):
        env = prepare_env(cfg["task"], cfg["dataset"], log=LOG, seed=123)
        env.reset()
        configs.append([dict(c) for c in env.current_obj_config])
        envs.append(env)
    try:
        for a, b in zip(*configs):
            assert a["name"] == b["name"]
            np.testing.assert_allclose(a["pose_7d"], b["pose_7d"])
        # identical observations too
        o1 = envs[0].get_observation(gt=True)
        o2 = envs[1].get_observation(gt=True)
        np.testing.assert_allclose(o1["handle_bbox"], o2["handle_bbox"])
        np.testing.assert_allclose(o1["robot_qpos"], o2["robot_qpos"])
    finally:
        for e in envs:
            e.close()


def test_procedural_assets_deterministic():
    from rgbmanip_tpu.assets import procedural

    a1, m1 = procedural.generate("one_door_cabinet", 42)
    procedural._CACHE.clear()
    a2, m2 = procedural.generate("one_door_cabinet", 42)
    assert len(a1.links) == len(a2.links)
    for l1, l2 in zip(a1.links, a2.links):
        np.testing.assert_allclose(l1.origin, l2.origin)
        for s1, s2 in zip(l1.shapes, l2.shapes):
            np.testing.assert_allclose(s1.params, s2.params)
    assert m1.half_depth == m2.half_depth
