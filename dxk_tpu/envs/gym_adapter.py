"""Gym-style host adapter for LocoEnv — the API surface of the reference's
Python env (learning/loco_env.py:51-94: Box spaces from DLL-reported limits,
reset() -> obs, step(action) -> (obs, reward, done, info)), plus a vectorized
variant replacing SubprocVecEnv (learning/util.py:30-37).

These adapters are for interop (e.g. plugging into SB3-style trainers or
evaluation scripts); the native fast path is the pure-JAX
`LocoEnv.reset/step` under jit/vmap.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dxk_tpu.envs.loco_env import ACTION_SIZE, OBS_SIZE, LocoEnv


class Box:
    """Minimal gym.spaces.Box stand-in (gym isn't a dependency)."""

    def __init__(self, low, high, shape, dtype=np.float32):
        self.low = np.broadcast_to(np.asarray(low, dtype), shape).copy()
        self.high = np.broadcast_to(np.asarray(high, dtype), shape).copy()
        self.shape = tuple(shape)
        self.dtype = dtype

    def sample(self, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        lo = np.where(np.isfinite(self.low), self.low, -1.0)
        hi = np.where(np.isfinite(self.high), self.high, 1.0)
        return rng.uniform(lo, hi).astype(self.dtype)


class GymLocoEnv:
    """Single-env, host-API wrapper (loco_env.py:51-80 equivalent)."""

    def __init__(self, seed: int = 0, **env_kwargs):
        self.env = LocoEnv(**env_kwargs)
        self.observation_space = Box(-np.inf, np.inf, (OBS_SIZE,))
        self.action_space = Box(np.asarray(self.env.action_min),
                                np.asarray(self.env.action_max),
                                (ACTION_SIZE,))
        self._reset_fn = jax.jit(self.env.reset)
        self._step_fn = jax.jit(self.env.step)
        self._rng = jax.random.PRNGKey(seed)
        self._state = None

    def reset(self):
        self._rng, key = jax.random.split(self._rng)
        self._state, obs = self._reset_fn(key)
        return np.asarray(obs)

    def step(self, action):
        self._state, obs, reward, done = self._step_fn(
            self._state, jnp.asarray(action, jnp.float32))
        return np.asarray(obs), float(reward), bool(done), {}


class VecLocoEnv:
    """Vectorized host API — what SubprocVecEnv x16 becomes: one jitted
    vmapped step over `num_envs` environments on one device."""

    def __init__(self, num_envs: int = 16, seed: int = 0, **env_kwargs):
        self.env = LocoEnv(**env_kwargs)
        self.num_envs = num_envs
        self.observation_space = Box(-np.inf, np.inf, (OBS_SIZE,))
        self.action_space = Box(np.asarray(self.env.action_min),
                                np.asarray(self.env.action_max),
                                (ACTION_SIZE,))
        self._reset_fn = jax.jit(jax.vmap(self.env.reset))
        self._step_fn = jax.jit(jax.vmap(self.env.step))
        self._keys = jax.random.split(jax.random.PRNGKey(seed), num_envs)
        self._state = None

    def reset(self):
        self._state, obs = self._reset_fn(self._keys)
        return np.asarray(obs)

    def step(self, actions):
        self._state, obs, rewards, dones = self._step_fn(
            self._state, jnp.asarray(actions, jnp.float32))
        return (np.asarray(obs), np.asarray(rewards), np.asarray(dones),
                [{}] * self.num_envs)
