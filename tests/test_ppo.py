"""PPO unit + integration tests."""

import numpy as np
import pytest

from rgbmanip_tpu.utils.logger import get_logger

LOG = get_logger()
LOG.setLevel("WARNING")


def test_gae_matches_reference_loop():
    import jax.numpy as jnp

    from rgbmanip_tpu.algo.ppo import compute_gae

    rng = np.random.default_rng(0)
    T, N = 12, 4
    rewards = rng.normal(size=(T, N)).astype(np.float32)
    dones = (rng.uniform(size=(T, N)) < 0.2).astype(np.float32)
    values = rng.normal(size=(T, N)).astype(np.float32)
    last_value = rng.normal(size=N).astype(np.float32)
    gamma, lam = 0.98, 0.95

    # manual reference loop (reference storage.py:50-64)
    adv = np.zeros((T, N), np.float32)
    next_adv = np.zeros(N, np.float32)
    next_val = last_value
    for t in reversed(range(T)):
        nd = 1.0 - dones[t]
        delta = rewards[t] + gamma * next_val * nd - values[t]
        next_adv = delta + gamma * lam * nd * next_adv
        adv[t] = next_adv
        next_val = values[t]
    returns_ref = adv + values
    adv_ref = (adv - adv.mean()) / (adv.std() + 1e-8)

    returns, advs = compute_gae(jnp.array(rewards), jnp.array(dones),
                                jnp.array(values), jnp.array(last_value),
                                gamma=gamma, lam=lam)
    np.testing.assert_allclose(np.asarray(returns), returns_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(advs), adv_ref, atol=1e-4)


class ToyEnv:
    """Deterministic quadratic-reward env for PPO smoke training."""

    def __init__(self, n=8, obs_dim=6, act_dim=3, horizon=8):
        from rgbmanip_tpu.utils.tools import Box

        self.num_envs = n
        self.horizon = horizon
        self.observation_space = Box(-1, 1, shape=(obs_dim,))
        self.state_space = Box(-1, 1, shape=(obs_dim,))
        self.action_space = Box(-1, 1, shape=(act_dim,))
        self.t = 0
        self.rng = np.random.default_rng(0)
        self.goal = self.rng.normal(size=(n, act_dim)) * 0.3

    def _obs(self):
        out = np.zeros((self.num_envs, self.observation_space.shape[0]), np.float32)
        out[:, :self.goal.shape[1]] = self.goal
        out[:, -1] = self.t / self.horizon
        return out

    def reset(self):
        self.t = 0
        return self._obs()

    def get_state(self):
        return self._obs()

    def step(self, action):
        rew = -np.square(action - self.goal).sum(-1).astype(np.float32)
        self.t += 1
        done = np.full(self.num_envs, self.t >= self.horizon)
        if done.all():
            self.t = 0
        return self._obs(), rew, done, {}

    def get_success(self):
        return np.zeros(self.num_envs, bool)


def make_cfg(tmp):
    return {
        "policy": {"pi_hid_sizes": [32, 32], "vf_hid_sizes": [32, 32],
                   "activation": "elu"},
        "learn": {
            "num_transitions_per_env": 16, "num_learning_epochs": 4,
            "num_mini_batches": 2, "clip_range": 0.2, "gamma": 0.98,
            "lam": 0.95, "init_noise_std": 0.6, "value_loss_coef": 1.0,
            "entropy_coef": 0.0, "learning_rate": 3e-4, "max_grad_norm": 1.0,
            "use_clipped_value_loss": True, "schedule": "adaptive",
            "desired_kl": 0.016, "max_lr": 5e-3, "min_lr": 2e-4,
            "save_dir": str(tmp), "save_interval": 1000,
        },
    }


def test_ppo_improves_on_toy_env(tmp_path):
    from rgbmanip_tpu.algo.ppo import PPO

    env = ToyEnv()
    ppo = PPO(env, make_cfg(tmp_path), seed=0)
    # measure initial vs trained reward under greedy policy
    def greedy_reward():
        obs = env.reset()
        total = 0.0
        for _ in range(env.horizon):
            a = ppo.act_inference(obs)
            obs, r, d, _ = env.step(a)
            total += r.mean()
        return total

    before = greedy_reward()
    ppo.run(30, log_interval=100)
    after = greedy_reward()
    assert after > before + 0.5, (before, after)


def test_ppo_save_load_roundtrip(tmp_path):
    import jax

    from rgbmanip_tpu.algo.ppo import PPO

    env = ToyEnv()
    ppo = PPO(env, make_cfg(tmp_path), seed=0)
    ppo.save(str(tmp_path / "model_42"))
    ppo2 = PPO(ToyEnv(), make_cfg(tmp_path), seed=1)
    ppo2.load(str(tmp_path / "model_42.ckpt"))
    assert ppo2.current_learning_iteration == 42
    for a, b in zip(jax.tree_util.tree_leaves(ppo.params),
                    jax.tree_util.tree_leaves(ppo2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_control_interface_with_gt_estimator():
    """ControlInterface end-to-end: obs/state dims, step, reward terms."""
    from rgbmanip_tpu.config import load_config
    from rgbmanip_tpu.models.controller.rl_pose import ControlInterface
    from rgbmanip_tpu.train import (prepare_env, prepare_manipulation,
                                    prepare_pose_estimator)

    cfg = load_config(["controller=rl", "task.num_envs=2"])
    env = prepare_env(cfg["task"], cfg["dataset"], log=LOG, seed=0)
    try:
        manip = prepare_manipulation(env, cfg["manipulation"], LOG)
        pe = prepare_pose_estimator(env, cfg["pose_estimator"], LOG)
        iface = ControlInterface(env, pe, manip,
                                 {"controller": cfg["controller"], "task": cfg["task"]})
        obs = iface.get_observation()
        assert obs.shape == (2, iface.max_steps * 12)
        state = iface.get_state()
        assert state.shape == (2, iface.max_steps * 15)
        action = np.zeros((2, 7 + iface.max_steps))
        obs, rew, done, info = iface.step(action)
        assert rew.shape == (2,)
        assert "REW:center_rew" in info
        assert not done.any()
        # run until done
        for _ in range(iface.max_steps):
            obs, rew, done, info = iface.step(action)
            if done.any():
                break
        assert done.all()
    finally:
        env.close()
