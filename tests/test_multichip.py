"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_mesh_and_param_shardings():
    import jax
    import jax.numpy as jnp

    from rgbmanip_tpu.parallel.mesh import (
        apply_shardings, make_mesh, param_shardings, shard_batch)

    mesh = make_mesh(8, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    params = {"a": {"kernel": jnp.zeros((32, 128)), "bias": jnp.zeros(128)},
              "b": {"kernel": jnp.zeros((8, 8))}}
    sh = param_shardings(params, mesh)
    placed = apply_shardings(params, sh)
    # large kernel sharded over tp
    assert placed["a"]["kernel"].sharding.spec == jax.sharding.PartitionSpec(None, "tp")
    # small kernel replicated
    assert placed["b"]["kernel"].sharding.spec == jax.sharding.PartitionSpec()
    batch = {"x": jnp.zeros((8, 3))}
    sb = shard_batch(batch, mesh)
    assert sb["x"].sharding.spec == jax.sharding.PartitionSpec("dp")


def test_ppo_update_sharded_matches_replicated():
    """The dp-sharded PPO update must produce the same result as unsharded."""
    import jax
    import jax.numpy as jnp

    from rgbmanip_tpu.algo.ppo import PPO
    from rgbmanip_tpu.parallel.mesh import make_mesh
    from rgbmanip_tpu.utils.tools import Box

    class Spaces:
        num_envs = 8
        observation_space = Box(-1, 1, shape=(12,))
        state_space = Box(-1, 1, shape=(12,))
        action_space = Box(-1, 1, shape=(4,))

    cfg = {"policy": {"pi_hid_sizes": [16], "vf_hid_sizes": [16],
                      "activation": "elu"},
           "learn": {"num_transitions_per_env": 4, "num_learning_epochs": 1,
                     "num_mini_batches": 1, "clip_range": 0.2, "gamma": 0.98,
                     "lam": 0.98, "init_noise_std": 0.6, "value_loss_coef": 1.0,
                     "entropy_coef": 0.0, "learning_rate": 1e-3,
                     "max_grad_norm": 1.0, "use_clipped_value_loss": True,
                     "schedule": "fixed", "desired_kl": 0.016, "max_lr": 5e-3,
                     "min_lr": 2e-4, "save_dir": "/tmp/ppo_shard_test"}}
    rng = np.random.default_rng(0)
    T, N = 4, 8
    batch_np = {
        "obs": rng.normal(size=(T, N, 12)).astype(np.float32),
        "states": rng.normal(size=(T, N, 12)).astype(np.float32),
        "actions": rng.normal(size=(T, N, 4)).astype(np.float32),
        "logprobs": rng.normal(size=(T, N)).astype(np.float32),
        "values": rng.normal(size=(T, N)).astype(np.float32),
        "returns": rng.normal(size=(T, N)).astype(np.float32),
        "advantages": rng.normal(size=(T, N)).astype(np.float32),
        "mu": rng.normal(size=(T, N, 4)).astype(np.float32),
        "sigma": (np.abs(rng.normal(size=(T, N, 4))) + 0.5).astype(np.float32),
    }
    ppo = PPO(Spaces(), cfg, seed=0)
    p_ref, _, _, m_ref = ppo._update_fn(
        ppo.params, ppo.opt_state, jnp.float32(ppo.lr),
        {k: jnp.asarray(v) for k, v in batch_np.items()})

    mesh = make_mesh(8, tp=1)
    sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "dp"))
    batch_sh = {k: jax.device_put(jnp.asarray(v), sharding)
                for k, v in batch_np.items()}
    ppo2 = PPO(Spaces(), cfg, seed=0)
    p_sh, _, _, m_sh = ppo2._update_fn(
        ppo2.params, ppo2.opt_state, jnp.float32(ppo2.lr), batch_sh)
    np.testing.assert_allclose(np.asarray(m_sh), np.asarray(m_ref), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
