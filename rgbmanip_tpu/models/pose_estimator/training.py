"""AdaPose estimator training on TPU.

The reference trains its estimator offline with a pinned torch environment
(``AdaPose/AdaPose.yml``) on data produced by ``train=collect``; the training
scripts themselves are external to the repo. This module provides the
TPU-native equivalent: supervised losses on NOCS coordinates, per-point
depth, and (direct-regression mode) rotation/translation/size, with a jitted
+ sharded train step (dp over the sample batch, tp over wide channels — see
``parallel.mesh``).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ...ops.preprocess import depth_hypotheses
from .nets.stereo import StereoPoseNetWithDepth


def estimator_loss(pred: Dict, labels: Dict, regress_pose: bool = True):
    """L1 NOCS + smooth-L1 depth + rotation/translation/size regression.

    Per-env ``labels["valid"]`` (when present) masks out samples whose view
    pair failed preparation (empty mask in one env of the batch — their
    labels are degenerate clipped-corner reads, not supervision)."""
    B = pred["view1_nocs"].shape[0]
    v = labels.get("valid")
    w = (jnp.ones(B) if v is None else v.astype(jnp.float32))
    denom = w.sum() + 1e-9

    def wmean(x):
        # x: (B, ...) -> valid-weighted mean over everything
        per = x.reshape(B, -1).mean(axis=1)
        return (per * w).sum() / denom

    losses = {}
    losses["nocs"] = (wmean(jnp.abs(pred["view1_nocs"] - labels["nocs1"]))
                      + wmean(jnp.abs(pred["view2_nocs"] - labels["nocs2"])))
    huber = lambda d: wmean(jnp.where(jnp.abs(d) < 0.1, 0.5 * d ** 2 / 0.1,
                                      jnp.abs(d) - 0.05))
    losses["depth"] = (huber(pred["view1_depth"] - labels["depth1"])
                       + huber(pred["view2_depth"] - labels["depth2"]))
    if regress_pose and "r1" in labels:
        losses["rot"] = (wmean(jnp.abs(pred["view1_r"] - labels["r1"]))
                         + wmean(jnp.abs(pred["view2_r"] - labels["r2"])))
        losses["trans"] = (wmean(jnp.abs(pred["view1_t"] - labels["t1"]))
                           + wmean(jnp.abs(pred["view2_t"] - labels["t2"])))
        losses["size"] = (wmean(jnp.abs(pred["view1_s"] - labels["s1"]))
                          + wmean(jnp.abs(pred["view2_s"] - labels["s2"])))
    total = (losses["nocs"] + losses["depth"]
             + 0.3 * losses.get("rot", 0.0) + losses.get("trans", 0.0)
             + losses.get("size", 0.0))
    return total, losses


class EstimatorTrainer:
    def __init__(self, model: StereoPoseNetWithDepth, params, batch_stats,
                 lr: float = 1e-4, mesh=None):
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(params)
        self.mesh = mesh
        self._step = jax.jit(self.train_step)

    def train_step(self, params, batch_stats, opt_state, batch):
        def loss_fn(p):
            out, updates = self.model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["img1"], batch["choose1"], batch["img2"], batch["choose2"],
                batch["P1"], batch["P2"], batch["depth_values"],
                train=True, mutable=["batch_stats"])
            total, parts = estimator_loss(out, batch, self.model.regress_pose)
            return total, (parts, updates["batch_stats"])

        (total, (parts, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, total, parts

    def step(self, batch):
        (self.params, self.batch_stats, self.opt_state, total,
         parts) = self._step(self.params, self.batch_stats, self.opt_state, batch)
        return float(total), {k: float(v) for k, v in parts.items()}


def synthetic_batch(key, B: int, S: int, N: int, n_depth: int = 24):
    """Random but geometrically consistent batch for smoke/dryrun use."""
    ks = jax.random.split(key, 8)
    return {
        "img1": jax.random.uniform(ks[0], (B, S, S, 3)),
        "img2": jax.random.uniform(ks[1], (B, S, S, 3)),
        "choose1": jax.random.randint(ks[2], (B, N), 0, S * S),
        "choose2": jax.random.randint(ks[3], (B, N), 0, S * S),
        "P1": jnp.tile(jnp.eye(4), (B, 1, 1)),
        "P2": jnp.tile(jnp.eye(4), (B, 1, 1)),
        "depth_values": depth_hypotheses(B, n=n_depth),
        "nocs1": jax.random.uniform(ks[4], (B, N, 3), minval=-0.5, maxval=0.5),
        "nocs2": jax.random.uniform(ks[5], (B, N, 3), minval=-0.5, maxval=0.5),
        "depth1": jax.random.uniform(ks[6], (B, N), minval=0.3, maxval=2.0),
        "depth2": jax.random.uniform(ks[7], (B, N), minval=0.3, maxval=2.0),
        "r1": jnp.tile(jnp.eye(3), (B, 1, 1)),
        "r2": jnp.tile(jnp.eye(3), (B, 1, 1)),
        "t1": jnp.zeros((B, 3)),
        "t2": jnp.zeros((B, 3)),
        "s1": jnp.ones((B, 3)) * 0.3,
        "s2": jnp.ones((B, 3)) * 0.3,
    }
