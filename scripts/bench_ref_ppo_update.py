#!/usr/bin/env python
"""Time the REFERENCE's own PPO update() (torch) at the BASELINE shape
(T=16 transitions x N=64 envs, 8 epochs x 4 minibatches — reference
cfg/train/train.yaml learn block) on this host's CPU, for the
rollout+update throughput comparison in docs/RESULTS.md.

Runs the reference's actual code (/root/reference/algo/ppo/ppo/ppo.py
update(), storage.py mini_batch_generator) — not a re-implementation —
with the sim-only imports stubbed out (sapien/gym/cv2/ipdb are not in
this image and are not touched by the update path). The reference ran
this same code on GPU; this gives its CPU cost on identical hardware to
ours for the host-side comparison, and the per-minibatch Python+torch
dispatch structure (32 sequential optimizer steps per update,
ppo.py:449-534) is hardware-independent.

Usage: python scripts/bench_ppo_iter.py  (see that script for the full
rollout+update figure; this one prints the reference update ms alone).
"""
import sys
import time
import types

REF = "/root/reference"


def _stub_modules():
    ipdb = types.ModuleType("ipdb")
    sys.modules["ipdb"] = ipdb

    gym = types.ModuleType("gym")
    gym_spaces = types.ModuleType("gym.spaces")

    class Space:
        pass

    class Box(Space):
        def __init__(self, low=None, high=None, shape=None, dtype=None):
            self.low, self.high = low, high
            self.shape = tuple(shape) if shape is not None else None

    class Dict(dict):
        pass

    gym_spaces.Space, gym_spaces.Box, gym_spaces.Dict = Space, Box, Dict
    gym.spaces = gym_spaces
    sys.modules["gym"] = gym
    sys.modules["gym.spaces"] = gym_spaces

    sapien = types.ModuleType("sapien")
    sapien_core = types.ModuleType("sapien.core")
    sapien.core = sapien_core
    sys.modules["sapien"] = sapien
    sys.modules["sapien.core"] = sapien_core

    try:
        import cv2  # noqa: F401
    except ImportError:
        sys.modules["cv2"] = types.ModuleType("cv2")

    # env.my_vec_env pulls sapien + gym.vector at import; the update path
    # never touches it (PPO only type-annotates vec_env with it)
    envpkg = types.ModuleType("env")
    envpkg.__path__ = []
    mve = types.ModuleType("env.my_vec_env")

    class MultiVecEnv:
        pass

    mve.MultiVecEnv = MultiVecEnv
    sys.modules["env"] = envpkg
    sys.modules["env.my_vec_env"] = mve
    return Box


def main():
    Box = _stub_modules()
    sys.path.insert(0, REF)

    import torch

    from algo.ppo.ppo.ppo import PPO  # noqa: E402  (reference code)

    T, N = 16, 64
    obs_dim, state_dim, act_dim = 60, 75, 12  # rl.yaml max_steps=4 shapes

    class FakeVecEnv:
        num_envs = N
        observation_space = Box(shape=(obs_dim,))
        state_space = Box(shape=(state_dim,))
        action_space = Box(shape=(act_dim,))

    learn_cfg = {
        "learn": {
            "eval_interval": 64, "eval_round": 16, "eval": False,
            "device": "cpu", "asymmetric": False, "desired_kl": 0.016,
            "max_lr": 0.005, "min_lr": 0.0002, "schedule": "adaptive",
            "learning_rate": 1e-5, "sampler": "sequential", "reset": True,
            "contrastive": False, "clip_range": 0.2,
            "num_learning_epochs": 8, "num_mini_batches": 4,
            "num_transitions_per_env": T, "num_transitions_eval": 512,
            "value_loss_coef": 1.0, "entropy_coef": 0.0, "gamma": 0.98,
            "lam": 0.98, "max_grad_norm": 1.0,
            "use_clipped_value_loss": True, "log_dir": "/tmp/ref_ppo_log",
            "print_log": False, "testing": False, "exp_name": "bench",
            "save_dir": "/tmp/ref_ppo_save", "init_noise_std": 0.6,
        },
        "policy": {
            "actor_critic_class": "ActorCritic",
            "pi_hid_sizes": [96, 96, 32], "vf_hid_sizes": [96, 96, 32],
            "activation": "elu",
        },
        "load": "",
    }

    ppo = PPO(FakeVecEnv(), learn_cfg)

    # fill the rollout storage with a synthetic batch (same shapes the
    # reference's collect loop writes, storage.py add_transitions)
    g = torch.Generator().manual_seed(0)
    s = ppo.storage
    for t in range(T):
        s.add_transitions(
            torch.randn(N, obs_dim, generator=g),
            torch.randn(N, state_dim, generator=g),
            torch.randn(N, act_dim, generator=g),
            torch.randn(N, 1, generator=g),
            torch.zeros(N, 1),
            torch.randn(N, 1, generator=g),
            torch.randn(N, 1, generator=g),
            torch.randn(N, act_dim, generator=g),
            torch.rand(N, act_dim, generator=g) + 0.5,
        )
    s.compute_returns(torch.randn(N, 1, generator=g), ppo.gamma, ppo.lam)

    ppo.update(0)  # warm-up (allocator, autograd graph caches)
    reps = 10
    t0 = time.perf_counter()
    for it in range(reps):
        ppo.update(it)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"reference update() at T={T} N={N}: {ms:.2f} ms "
          f"({T * N / ms * 1e3:.0f} transitions/s)")


if __name__ == "__main__":
    main()
