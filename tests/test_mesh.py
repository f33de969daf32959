"""Multi-chip sharding (dxk_tpu/parallel/mesh.py) on the virtual 8-device
CPU mesh (conftest sets xla_force_host_platform_device_count=8): the
sharded PPO train step must compile and run with BOTH the reference-exact
"scan" solver and the fused Pallas pipeline (custom_vmap -> pallas_call
under GSPMD partitioning)."""

import jax
import jax.numpy as jnp
import pytest

from dxk_tpu.envs.loco_env import LocoEnv
from dxk_tpu.parallel.mesh import (env_sharding, make_env_mesh,
                                   make_sharded_train_step, shard_env_batch)
from dxk_tpu.train.ppo import PPOConfig

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV, "conftest must provide 8 devices"
    return make_env_mesh(N_DEV)


def test_shard_env_batch_places_shards(mesh):
    x = jnp.zeros((N_DEV * 2, 3))
    sharded = shard_env_batch(mesh, {"x": x})["x"]
    assert sharded.sharding == env_sharding(mesh)
    assert len(sharded.addressable_shards) == N_DEV
    assert sharded.addressable_shards[0].data.shape == (2, 3)


@pytest.mark.parametrize("mode", ["scan", "fused"])
def test_sharded_train_step(mesh, mode):
    env = LocoEnv(solver_iterations=2, max_narrow_pairs=16,
                  solver_mode=mode)
    config = PPOConfig(num_envs=2 * N_DEV, unroll_length=2,
                       num_epochs=1, num_minibatches=2)
    init_fn, train_step = make_sharded_train_step(env, config, mesh)
    with mesh:
        ts = init_fn(jax.random.PRNGKey(0))
        ts, metrics = train_step(ts)
        loss = float(metrics["loss"])
    assert jnp.isfinite(loss)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
