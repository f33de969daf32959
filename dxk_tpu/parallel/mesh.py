"""Device-mesh sharding for multi-chip scaling.

The reference's only scaling axis is 16 OS processes each stepping one env
over a ctypes DLL boundary (learning/util.py:30-37). Here the axis is an
`env` mesh dimension: environment state is sharded over devices with
`jax.sharding`, physics steps are embarrassingly parallel (no cross-device
communication — SURVEY.md §2.7/§5.8), and PPO's gradient reduction is the
only collective, riding ICI via XLA's automatic partitioning.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_env_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("env",))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis = env, sharded over the mesh."""
    return NamedSharding(mesh, P("env"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_batch(mesh: Mesh, tree: Any) -> Any:
    """Place a (num_envs, ...) pytree with the env axis sharded."""
    s = env_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def constrain_env_axis(tree: Any, mesh: Mesh) -> Any:
    s = env_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, s), tree)


def make_sharded_train_step(env, config, mesh: Mesh):
    """Build PPO init/train_step whose env batch is sharded over `mesh`.

    Parameters/optimizer state replicate; the trajectory tensors inherit the
    env sharding through `vmap`, and XLA inserts the psum for gradients.
    """
    from dxk_tpu.train.ppo import make_train

    init_fn, train_step = make_train(env, config)

    def sharded_init(key):
        ts = init_fn(key)
        return ts._replace(
            env_state=shard_env_batch(mesh, ts.env_state),
            obs=jax.device_put(ts.obs, env_sharding(mesh)),
            params=jax.device_put(ts.params, replicated(mesh)),
            opt_state=jax.device_put(ts.opt_state, replicated(mesh)),
        )

    jit_step = jax.jit(train_step)
    return sharded_init, jit_step
