#!/usr/bin/env python
"""PPO fused-update throughput at the BASELINE shape (T=16, N=64):
8 epochs x 4 minibatches, adaptive-KL LR, one jitted program (algo/ppo.py)."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo")
from perfutil import scan_bench


def main():
    from rgbmanip_tpu.algo.ppo import PPO

    T, N, OBS, ACT = 16, 64, 93, 7
    cfg = {
        "learn": {"num_transitions_per_env": T, "num_learning_epochs": 8,
                  "num_mini_batches": 4, "clip_range": 0.2, "gamma": 0.98,
                  "lam": 0.98, "init_noise_std": 1.0, "value_loss_coef": 1.0,
                  "entropy_coef": 0.0, "learning_rate": 3e-4,
                  "max_grad_norm": 1.0, "desired_kl": 0.008,
                  "schedule": "adaptive", "save_dir": "/tmp/ppo_bench"},
        "policy": {"pi_hid_sizes": [96, 96, 32], "vf_hid_sizes": [96, 96, 32],
                   "activation": "elu"},
    }

    class Box:
        def __init__(self, n):
            self.shape = (n,)

    class FakeEnv:
        num_envs = N
        observation_space = Box(OBS)
        state_space = Box(OBS)
        action_space = Box(ACT)

    ppo = PPO(FakeEnv(), cfg, log_dir=None)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)
    batch = {
        "obs": jax.random.normal(ks[0], (T, N, OBS), jnp.float32),
        "states": jax.random.normal(ks[1], (T, N, OBS), jnp.float32),
        "actions": jax.random.normal(ks[2], (T, N, ACT), jnp.float32),
        "logprobs": jax.random.normal(ks[3], (T, N)),
        "values": jax.random.normal(ks[4], (T, N)),
        "returns": jax.random.normal(ks[5], (T, N)),
        "advantages": jax.random.normal(ks[6], (T, N)),
        "mu": jax.random.normal(ks[7], (T, N, ACT)),
        "sigma": jnp.ones((T, N, ACT)),
    }

    # all tensors (batch, params, opt state) go through jit as parameters:
    # closure captures become HLO constants that XLA can hoist/fold out of
    # the timed scan (perfutil.py defense #4)
    keys = sorted(batch.keys())

    def one_update(obs, params, opt_state, *rest):
        b = dict(zip(keys, rest))
        b["obs"] = obs
        _, _, _, metrics = ppo._update_fn(params, opt_state,
                                          jnp.float32(3e-4), b)
        return metrics

    rest = [batch[k] for k in keys]
    ms = scan_bench(one_update, batch["obs"], ppo.params, ppo.opt_state,
                    *rest, iters=4, reps=3)
    steps = T * N
    print(f"PPO fused update (T={T}, N={N}, 8 epochs x 4 mb): {ms:7.2f} ms "
          f"-> {steps/ms*1e3:9.0f} transitions/s update throughput", flush=True)


if __name__ == "__main__":
    main()
