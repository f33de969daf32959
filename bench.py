#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric (BASELINE.json): env-steps/sec for parallel ragdoll
locomotion envs (target 500k/s on v5e-8 => ~62.5k/s per chip). Also measures
body-steps/sec on a 1k-box stack drop (target 10M/s per chip) and reports it
as an extra field.

Run on the real TPU (default env) or CPU (JAX_PLATFORMS=cpu, reduced sizes).
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(tree):
    """Force host materialization — block_until_ready is unreliable through
    the axon TPU tunnel (see CLAUDE.md)."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def bench_loco(num_envs, steps, iters_timed, solver_mode, solver_iterations):
    from dxk_tpu.envs.loco_env import LocoEnv

    env = LocoEnv(solver_iterations=solver_iterations,
                  solver_mode=solver_mode, max_narrow_pairs=32,
                  enable_pokes=True,
                  narrow_caps={(1, 1): 24, (1, 3): 20, (3, 3): 3})
    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    st, obs = jax.jit(jax.vmap(env.reset))(keys)

    def n_steps(st0, actions):
        def body(carry, _):
            s = carry
            s, o, r, d = jax.vmap(env.step)(s, actions)
            return s, r

        st1, rewards = jax.lax.scan(body, st0, None, length=steps)
        return st1, rewards.sum()

    run = jax.jit(n_steps)
    actions = jnp.zeros((num_envs, 27))
    t_c0 = time.time()
    st2, _ = run(st, actions)
    _sync(st2.physics.pos)
    compile_s = time.time() - t_c0

    # best of 3 windows: single-window numbers jitter ~5% through the
    # tunnel; peak throughput is the stable quantity
    best_dt = float("inf")
    for _w in range(3):
        t0 = time.time()
        for _ in range(iters_timed):
            st, r = run(st, actions)
        _sync(st.physics.pos)
        best_dt = min(best_dt, time.time() - t0)
    total_env_steps = num_envs * steps * iters_timed
    return total_env_steps / best_dt, compile_s


def bench_box_stack(num_boxes, batch, steps, iters_timed, solver_iterations,
                    solver_mode="colored"):
    from dxk_tpu.physics import PhysicsSettings, physics_step
    from dxk_tpu.scene import SceneBuilder

    b = SceneBuilder()
    ground = b.add_static()
    b.add_box_collider(ground, (0, -1, 0), (200, 1, 200))
    per_tower = 16
    towers = num_boxes // per_tower
    side = int(np.ceil(np.sqrt(towers)))
    n = 0
    for t in range(towers):
        x = (t % side) * 3.0
        z = (t // side) * 3.0
        for i in range(per_tower):
            body = b.add_body(position=(x, 0.5 + 1.001 * i, z))
            b.add_box_collider(body, (0, 0, 0), (0.5, 0.5, 0.5))
            n += 1
    scene = b.finalize(max_narrow_pairs_per_group=2 * num_boxes)
    settings = PhysicsSettings(num_rigid_solver_iterations=solver_iterations,
                               solver_mode=solver_mode)

    base = scene.initial_state()
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch, *x.shape)).copy(), base)

    def n_steps(s):
        def body(carry, _):
            s = carry
            s, _ = jax.vmap(
                lambda st: physics_step(scene, st, settings, 1 / 120))(s)
            return s, None

        s, _ = jax.lax.scan(body, s, None, length=steps)
        return s

    run = jax.jit(n_steps)
    t_c0 = time.time()
    s2 = run(state)
    _sync(s2.pos)
    compile_s = time.time() - t_c0

    best_dt = float("inf")
    for _w in range(3):
        t0 = time.time()
        for _ in range(iters_timed):
            state = run(state)
        _sync(state.pos)
        best_dt = min(best_dt, time.time() - t0)
    body_steps = n * batch * steps * iters_timed
    return body_steps / best_dt, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=None)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--boxes", type=int, default=None)
    ap.add_argument("--box-batch", type=int, default=None)
    ap.add_argument("--solver-mode", default="jacobi")
    ap.add_argument("--box-solver-mode", default="colored")
    ap.add_argument("--solver-iterations", type=int, default=30)
    ap.add_argument("--skip-box", action="store_true")
    ap.add_argument("--skip-loco", action="store_true")
    args = ap.parse_args()

    on_tpu = jax.devices()[0].platform != "cpu"
    # N=1024 sits below the current HBM scaling cliff (docs/PERF_NOTES.md);
    # raise via --envs when benchmarking multi-chip or after the cliff fix
    num_envs = args.envs or (1024 if on_tpu else 32)
    num_boxes = args.boxes or (1024 if on_tpu else 64)
    box_batch = args.box_batch or (8 if on_tpu else 1)

    extras = {"platform": jax.devices()[0].platform,
              "device": str(jax.devices()[0])}

    loco_rate = None
    if not args.skip_loco:
        loco_rate, c = bench_loco(num_envs, args.steps, args.iters,
                                  args.solver_mode, args.solver_iterations)
        extras["loco_num_envs"] = num_envs
        extras["loco_compile_s"] = round(c, 1)

    if not args.skip_box:
        box_rate, c = bench_box_stack(num_boxes, box_batch, args.steps,
                                      args.iters, args.solver_iterations,
                                      args.box_solver_mode)
        extras["box_solver_mode"] = args.box_solver_mode
        extras["box_body_steps_per_s"] = round(box_rate)
        extras["box_num_boxes"] = num_boxes
        extras["box_batch"] = box_batch
        extras["box_compile_s"] = round(c, 1)
        extras["box_vs_baseline"] = round(box_rate / 10e6, 3)

    if loco_rate is not None:
        value = loco_rate
        # target: 500k env-steps/s on v5e-8 => 62.5k per chip
        vs = loco_rate / 62500.0
        metric = "ragdoll-env-steps/sec/chip"
        unit = "env-steps/s"
    else:
        value = extras["box_body_steps_per_s"]
        vs = value / 10e6
        metric = "box-stack-body-steps/sec/chip"
        unit = "body-steps/s"

    print(json.dumps({"metric": metric, "value": round(float(value)),
                      "unit": unit, "vs_baseline": round(vs, 3), **extras}))


if __name__ == "__main__":
    main()
