"""Policy / value networks — the reference's SB3 MlpPolicy
(learning/learn_locomotion.py:71-72: net_arch pi=[128,128], vf=[128,128],
tanh activations) and the engine-side compiled-in inference MLP
(learned_locomotion.cpp:11-27, 44-68: 66 -> tanh(128) -> tanh(128) -> 27).

The weight-export-to-C-header step (convert_model_to_c++.py) is unnecessary
here: `policy_apply` IS the deployable inference function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class MLP(nn.Module):
    out_dim: int
    hidden: int = 128
    # tiny action-head init mirrors learn_locomotion.py:97-102
    out_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        x = nn.tanh(nn.Dense(self.hidden)(x))
        x = nn.tanh(nn.Dense(self.hidden)(x))
        return nn.Dense(
            self.out_dim,
            kernel_init=nn.initializers.uniform(scale=0.01 * self.out_scale)
            if self.out_scale != 1.0 else nn.initializers.lecun_normal())(x)


class ActorCritic(nn.Module):
    action_dim: int
    hidden: int = 128

    @nn.compact
    def __call__(self, obs):
        mean = MLP(self.action_dim, self.hidden, out_scale=0.01,
                   name="pi")(obs)
        value = MLP(1, self.hidden, name="vf")(obs)[..., 0]
        log_std = self.param("log_std", nn.initializers.zeros,
                             (self.action_dim,))
        return mean, log_std, value


def make_policy(action_dim: int, obs_dim: int, key):
    net = ActorCritic(action_dim=action_dim)
    params = net.init(key, jnp.zeros((obs_dim,)))
    return net, params


def policy_apply(net, params, obs):
    """Deterministic inference (the engine-side update path,
    learned_locomotion.cpp:44-68)."""
    mean, _, _ = net.apply(params, obs)
    return mean
