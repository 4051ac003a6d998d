"""Train the AdaPose estimator on simulator-generated supervision.

The reference trains its estimator offline in a separate torch environment
(``AdaPose/AdaPose.yml``); this is the in-framework TPU equivalent: scenes are
randomized per batch, views rendered by the C++ raycaster, exact labels
derived analytically (see ``data.py``), and the jitted train step runs on
device (optionally dp/tp-sharded).

    python -m rgbmanip_tpu.models.pose_estimator.train_estimator \
        task=open_cabinet dataset=cabinet_train task.num_envs=8 \
        [steps=2000] [img_size=224] [save=saves/estimator.ckpt]
"""

from __future__ import annotations

import sys
import time

import jax.numpy as jnp
import numpy as np

from ...config import load_config
from ...utils.logger import MetricsWriter, get_logger


def train(overrides=None, steps: int = 2000, img_size: int = 224,
          n_pts: int = 1024, lr: float = 1e-4, save_path: str = "saves/estimator.ckpt",
          dtype=jnp.float32, log_every: int = 10, save_every: int = 200,
          env=None, est_overrides: dict | None = None, reuse: int = 8,
          buffer_size: int = 32, resume: str = "", policy_ckpt: str = "",
          policy_mix: float = 0.5, policy_noise: float = 0.15,
          policy_pair: str = "last", view_aug: str = "box"):
    log = get_logger()
    from ...train import prepare_env
    from .adapose import AdaPoseEstimator
    from .data import SimViewSampler
    from .training import EstimatorTrainer

    cfg = load_config(overrides or [])
    if env is None:
        env = prepare_env(cfg["task"], cfg["dataset"], log=log,
                          seed=cfg.get("seed", 0))
    # volume settings default to the production eval configs
    # (cfg/pose_estimator/adapose_*.yaml) so the network trains with the
    # exact architecture it runs with
    est_cfg = {"name": "adapose_v5", "task_name": cfg["task"]["name"],
               "load": False, "checkpoint_path": "", "img_size": img_size,
               "use_depth": True, "n_pts": n_pts, "direct_regression": True,
               "real_world": False, "volume_scale": 2, "warp_mode": "nearest"}
    est_cfg.update(est_overrides or {})
    if resume:
        est_cfg.update(load=True, checkpoint_path=resume)
    est = AdaPoseEstimator(est_cfg, log, dtype=dtype)
    trainer = EstimatorTrainer(est.model, est.params, est.batch_stats, lr=lr)
    sampler_kw = dict(img_size=img_size, n_pts=n_pts,
                      seed=cfg.get("seed", 0), reuse=reuse,
                      buffer_size=buffer_size,
                      d_min=est.d_min, d_interval=est.d_interval,
                      n_depth=est.n_depth, view_aug=view_aug)
    if policy_ckpt:
        # DAgger pass: sample views from the trained RL camera scheduler
        # (requires controller=rl in the overrides for the scheduler cfg)
        from .data import PolicyViewSampler
        log.info(f"policy-view sampling from {policy_ckpt} "
                 f"(mix={policy_mix}, noise={policy_noise}, "
                 f"pair={policy_pair})")
        sampler = PolicyViewSampler(env, cfg, policy_ckpt, mix=policy_mix,
                                    noise=policy_noise, pair_mode=policy_pair,
                                    **sampler_kw)
    else:
        sampler = SimViewSampler(env, **sampler_kw)
    writer = MetricsWriter("logs/estimator")

    t0 = time.time()
    done = 0
    while done < steps:
        batch = sampler.sample_batch()
        if batch is None:
            continue
        total, parts = trainer.step(batch)  # "valid" masks per-env losses
        done += 1
        if done % log_every == 0:
            rate = done / (time.time() - t0)
            log.info(f"step {done}/{steps} loss {total:.4f} "
                     + " ".join(f"{k}={v:.3f}" for k, v in parts.items())
                     + f" ({rate:.2f} it/s)")
            writer.add_scalar("estimator/loss", total, done)
            writer.add_scalars(parts, done, prefix="estimator/")
        if done % save_every == 0 or done == steps:
            est.params = trainer.params
            est.batch_stats = trainer.batch_stats
            est.save(save_path)
    writer.close()
    return est


def main():
    argv = sys.argv[1:]
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    local = ("steps", "img_size", "n_pts", "lr", "save", "log_every", "bf16",
             "volume_scale", "warp_mode", "backend", "n_depth",
             "volume_channels", "backbone_stride", "d_interval", "d_min",
             "reuse", "buffer_size", "resume", "policy_ckpt", "policy_mix",
             "policy_noise", "policy_pair", "view_aug", "save_every")
    overrides = [a for a in argv if "=" in a and a.split("=")[0] not in local]
    est_overrides = {}
    for k in ("volume_scale", "n_depth", "volume_channels", "backbone_stride"):
        if k in kv:
            est_overrides[k] = int(kv[k])
    for k in ("warp_mode", "backend"):
        if k in kv:
            est_overrides[k] = kv[k]
    for k in ("d_interval", "d_min"):
        if k in kv:
            est_overrides[k] = float(kv[k])
    train(overrides=overrides,
          steps=int(kv.get("steps", 2000)),
          img_size=int(kv.get("img_size", 224)),
          n_pts=int(kv.get("n_pts", 1024)),
          lr=float(kv.get("lr", 1e-4)),
          save_path=kv.get("save", "saves/estimator.ckpt"),
          dtype=jnp.bfloat16 if kv.get("bf16", "1") != "0" else jnp.float32,
          est_overrides=est_overrides, reuse=int(kv.get("reuse", 8)),
          buffer_size=int(kv.get("buffer_size", 32)),
          resume=kv.get("resume", ""),
          policy_ckpt=kv.get("policy_ckpt", ""),
          policy_mix=float(kv.get("policy_mix", 0.5)),
          policy_noise=float(kv.get("policy_noise", 0.15)),
          policy_pair=kv.get("policy_pair", "last"),
          view_aug=kv.get("view_aug", "box"),
          save_every=int(kv.get("save_every", 200)),
          log_every=int(kv.get("log_every", 10)))


if __name__ == "__main__":
    main()
