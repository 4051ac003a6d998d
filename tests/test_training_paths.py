"""Training-path integration tests: RL camera-controller PPO iterations with
the gt estimator, and the estimator data/train pipeline on sim labels."""

import numpy as np
import pytest

from rgbmanip_tpu.config import load_config
from rgbmanip_tpu.train import (prepare_controller, prepare_env,
                                prepare_manipulation, prepare_pose_estimator)
from rgbmanip_tpu.utils.logger import get_logger

LOG = get_logger()
LOG.setLevel("WARNING")


def test_rl_controller_ppo_iterations(tmp_path):
    """Two PPO iterations through the full ControlInterface (teleport moves,
    gt estimator) must run and update the policy."""
    import jax

    cfg = load_config([
        "controller=rl", "task.num_envs=2",
        "controller.learn.num_transitions_per_env=5",
        "controller.learn.num_mini_batches=1",
        "controller.learn.num_learning_epochs=2",
        f"controller.learn.save_dir={tmp_path}",
    ])
    env = prepare_env(cfg["task"], cfg["dataset"], log=LOG, seed=0)
    try:
        manip = prepare_manipulation(env, cfg["manipulation"], LOG)
        pe = prepare_pose_estimator(env, cfg["pose_estimator"], LOG)
        ctrl = prepare_controller(env, pe, manip, cfg["controller"], cfg, LOG)
        before = jax.tree_util.tree_leaves(ctrl.controller.params)[0].copy()
        ctrl.train_controller(2, log_interval=100)
        after = jax.tree_util.tree_leaves(ctrl.controller.params)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))
        # eval-style run finishes an episode and calls manipulation
        ctrl.run(eval=True)
    finally:
        env.close()


def test_estimator_data_pipeline():
    """Sim-derived labels are geometrically consistent: back-projecting the
    label depth through the adjusted intrinsics at the chosen points must
    reproduce the world positions that generated the NOCS labels."""
    from rgbmanip_tpu.models.pose_estimator.data import SimViewSampler

    cfg = load_config(["task=open_cabinet_no_dr", "task.num_envs=2"])
    env = prepare_env(cfg["task"], cfg["dataset"], log=LOG, seed=0)
    try:
        sampler = SimViewSampler(env, img_size=64, n_pts=128, seed=0)
        batch = sampler.sample_batch()
        assert batch is not None
        assert batch["img1"].shape == (2, 64, 64, 3)
        assert batch["nocs1"].shape == (2, 128, 3)
        # NOCS labels bounded (part-local coords / diagonal, clipped);
        # the bulk of the points must be well inside the part box
        nocs = np.asarray(batch["nocs1"])
        assert np.abs(nocs).max() <= 1.0 + 1e-5
        valid_envs = np.asarray(batch["valid"])
        assert np.median(np.abs(nocs[valid_envs])) < 0.6
        # depth labels positive and within the sweep range for valid envs
        valid = np.asarray(batch["valid"])
        d = np.asarray(batch["depth1"])[valid]
        assert (d > 0.01).mean() > 0.9
        # rotation labels orthonormal
        R = np.asarray(batch["r1"][0])
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    finally:
        env.close()


def test_wide_view_aug_sampler():
    """view_aug=wide (r5: policy-distribution view augmentation) must keep
    producing geometrically valid labelled batches — correlated pairs,
    lookat jitter and duplicated quasi-mono pairs change only WHERE the
    views come from, never the label math."""
    from rgbmanip_tpu.models.pose_estimator.data import SimViewSampler

    cfg = load_config(["task=open_cabinet_no_dr", "task.num_envs=2"])
    env = prepare_env(cfg["task"], cfg["dataset"], log=LOG, seed=0)
    try:
        sampler = SimViewSampler(env, img_size=64, n_pts=128, seed=0,
                                 reuse=1, view_aug="wide")
        got, dup = 0, 0
        for _ in range(12):
            batch = sampler.sample_batch()
            if batch is None:
                continue
            got += 1
            nocs = np.asarray(batch["nocs1"])
            assert np.abs(nocs).max() <= 1.0 + 1e-5
            R = np.asarray(batch["r1"][0])
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
            if np.allclose(batch["P1"], batch["P2"]):
                dup += 1  # duplicated quasi-mono pair occurs (10%)
        assert got >= 6  # off-center framing may drop some pairs, not most
    finally:
        env.close()


def test_estimator_train_step_decreases_loss():
    import jax
    import jax.numpy as jnp

    from rgbmanip_tpu.models.pose_estimator.nets.stereo import StereoPoseNetWithDepth
    from rgbmanip_tpu.models.pose_estimator.training import (
        EstimatorTrainer, synthetic_batch)

    model = StereoPoseNetWithDepth(backend="resnet18", regress_pose=True)
    batch = synthetic_batch(jax.random.PRNGKey(0), 2, 32, 64, 8)
    variables = model.init(jax.random.PRNGKey(1), batch["img1"], batch["choose1"],
                           batch["img2"], batch["choose2"], batch["P1"],
                           batch["P2"], batch["depth_values"], train=False)
    trainer = EstimatorTrainer(model, variables["params"],
                               variables.get("batch_stats", {}), lr=3e-4)
    losses = [trainer.step(batch)[0] for _ in range(12)]
    assert np.mean(losses[-3:]) < losses[0], losses


def test_replay_buffer_reuses_renders_with_consistent_labels():
    """With reuse>1 the sampler replays buffered renders (no env round-trip)
    and labels stay tied to the render-time scene: a reused batch after an
    env re-randomization must still produce geometrically-bounded NOCS and
    valid depths (frames captured at render time, data.py)."""
    from rgbmanip_tpu.models.pose_estimator.data import SimViewSampler

    cfg = load_config(["task=open_cabinet", "task.num_envs=2"])
    env = prepare_env(cfg["task"], cfg["dataset"], log=LOG, seed=3)
    try:
        sampler = SimViewSampler(env, img_size=64, n_pts=128, seed=3, reuse=4)
        b1 = sampler.sample_batch()
        assert b1 is not None and len(sampler._buffer) == 1
        # scramble the live scene so stale frames would be caught
        env.reset()
        b2 = sampler.sample_batch()       # served from the buffer
        assert b2 is not None and len(sampler._buffer) == 1
        nocs = np.asarray(b2["nocs1"])
        valid = np.asarray(b2["valid"])
        assert np.abs(nocs).max() <= 1.0 + 1e-5
        if valid.any():
            assert np.median(np.abs(nocs[valid])) < 0.6
            d = np.asarray(b2["depth1"])[valid]
            assert (d > 0.01).mean() > 0.9
        # fresh point sampling per reuse: choose indices differ
        assert not np.array_equal(np.asarray(b1["choose1"]),
                                  np.asarray(b2["choose1"]))
        # 5th call re-renders (calls % reuse == 1)
        sampler.sample_batch(); sampler.sample_batch()
        b5 = sampler.sample_batch()
        assert b5 is not None and len(sampler._buffer) == 2
    finally:
        env.close()
