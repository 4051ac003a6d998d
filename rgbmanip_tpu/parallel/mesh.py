"""Device mesh + sharding utilities.

The reference's entire "distributed backend" is process-parallel envs over
pipes plus single-process ``nn.DataParallel`` (SURVEY.md §2.9). The TPU-native
equivalents here:

  - data parallelism (dp): the env/sample batch axis is sharded across chips;
    gradient all-reduce rides ICI (XLA inserts psums under jit).
  - tensor parallelism (tp): wide estimator channels (Dense kernels / conv
    output channels) shard across the tp axis.

Pipeline/sequence/expert parallelism have no counterpart workload in this
framework (no deep sequential stack, no attention over long sequences, no
MoE — SURVEY.md §5.7 records this); dp x tp is the honest full set.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, tp: int = 1) -> Mesh:
    """(dp, tp) mesh over the first n_devices devices."""
    devices = jax.devices()[: (n_devices or len(jax.devices()))]
    n = len(devices)
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    arr = np.array(devices).reshape(n // tp, tp)
    return Mesh(arr, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/env) axis over dp, replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put a pytree with leading-axis dp sharding."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def param_shardings(params, mesh: Mesh, min_tp_dim: int = 64):
    """Tensor-parallel parameter shardings: kernels whose output dim is both
    large and divisible by the tp size shard that dim over 'tp'; everything
    else replicates. XLA inserts the matching all-gathers/reduce-scatters."""
    tp = mesh.shape["tp"]

    def rule(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if (name == "kernel" and x.ndim >= 2 and x.shape[-1] >= min_tp_dim
                and x.shape[-1] % tp == 0):
            spec = [None] * (x.ndim - 1) + ["tp"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def apply_shardings(tree, shardings):
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
