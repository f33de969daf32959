#!/usr/bin/env python
"""Multi-chip scaling evidence on the virtual device mesh (VERDICT r4 #7).

Measures the sharded physics/env step at fixed envs-per-device over
1/2/4/8 devices. On REAL multi-chip hardware the interesting number is
`weak_scaling_x` (aggregate env-steps/s at 8 devices / 1 device; the step
has no collectives, so the ideal is 8.0). This container exposes ONE
physical core, so 8 virtual CPU devices timeshare it and wall-clock
speedup is physically impossible; the honest single-core invariant is
NON-REPLICATION: stepping N total envs sharded over 8 devices must cost
about the same as N envs on 1 device (accidental replication would do
8x the work and show ~8x the time). `replication_check` captures that
ratio; the test gate lives in tests/test_weak_scaling.py.

Wall-clock on a timeshared core is noisy, so the load-bearing evidence is
`cost_analysis`: XLA's exact per-device FLOP count for the compiled SPMD
step. At fixed envs/device it must stay ~constant as devices grow (each
device compiles a program for only its shard — weak scaling by
construction); at fixed TOTAL envs it must drop ~1/D (no replication).
This is deterministic compiler output, not a measurement.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     XLA_FLAGS='--xla_force_host_platform_device_count=8 \
                --xla_disable_hlo_passes=fusion' \
     python tools/weak_scaling.py [--out FILE]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs-per-dev", type=int, default=16)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dxk_tpu.envs.loco_env import LocoEnv
    from dxk_tpu.parallel.mesh import make_env_mesh, shard_env_batch

    n_dev = len(jax.devices())
    assert n_dev >= 8, f"need 8 (virtual) devices, have {n_dev}"

    # jacobi: the XLA solver path (interpret-mode Pallas is minutes/step on
    # CPU); same program the sharding-equality test pins
    env = LocoEnv(solver_iterations=8, solver_mode="jacobi",
                  max_narrow_pairs=16, enable_pokes=False)

    def bench(n_devices, num_envs):
        mesh = make_env_mesh(n_devices)
        keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
        st, _ = jax.jit(jax.vmap(env.reset))(keys)
        st = shard_env_batch(mesh, st)
        actions = jnp.zeros((num_envs, 27))

        def n_steps(s):
            def body(c, _):
                c, _o, r, _d = jax.vmap(env.step)(c, actions)
                return c, r
            s, rs = jax.lax.scan(body, s, None, length=args.steps)
            return s, rs.sum()

        with mesh:
            run = jax.jit(n_steps)
            st, _ = run(st)           # compile + first exec
            jax.block_until_ready(st.physics.pos)
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.time()
                st, r = run(st)
                jax.block_until_ready(st.physics.pos)
                best = min(best, time.time() - t0)
        return num_envs * args.steps / best

    results = {"envs_per_dev": args.envs_per_dev, "steps": args.steps,
               "physical_cores": os.cpu_count(),
               "platform": jax.devices()[0].platform}

    # Exact per-device FLOPs from the compiled SPMD program (see module
    # docstring: deterministic, unlike single-core wall clock).
    def per_device_flops(n_devices, num_envs):
        mesh = make_env_mesh(n_devices)
        keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
        st, _ = jax.jit(jax.vmap(env.reset))(keys)
        st = shard_env_batch(mesh, st)
        actions = jnp.zeros((num_envs, 27))

        def one(s):
            c, _o, _r, _d = jax.vmap(env.step)(s, actions)
            return c

        with mesh:
            ca = jax.jit(one).lower(st).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca["flops"])

    weak_flops = {d: per_device_flops(d, d * args.envs_per_dev)
                  for d in (1, 2, 4, 8)}
    total = 8 * args.envs_per_dev
    mono_flops = per_device_flops(1, total)
    shard_flops = per_device_flops(8, total)
    results["cost_analysis"] = {
        "per_device_flops_fixed_envs_per_dev":
            {str(d): round(f) for d, f in weak_flops.items()},
        "weak_flops_overhead_8dev_vs_1dev":
            round(weak_flops[8] / weak_flops[1], 4),
        "fixed_total_envs": total,
        "per_device_flops_1dev": round(mono_flops),
        "per_device_flops_8dev": round(shard_flops),
        "shard_fraction_8dev": round(shard_flops / mono_flops, 4),
    }
    print(f"cost analysis: per-device flops 1dev={weak_flops[1]:,.0f} "
          f"8dev={weak_flops[8]:,.0f} (x{weak_flops[8]/weak_flops[1]:.3f}); "
          f"fixed-total shard fraction {shard_flops/mono_flops:.4f} "
          f"(ideal 0.125)", file=sys.stderr)

    # weak scaling: fixed envs/device
    rates = {}
    for d in (1, 2, 4, 8):
        rates[d] = bench(d, d * args.envs_per_dev)
        print(f"devices={d} envs={d * args.envs_per_dev}: "
              f"{rates[d]:,.0f} env-steps/s aggregate", file=sys.stderr)
    results["weak_rates"] = {str(d): round(r) for d, r in rates.items()}
    results["weak_scaling_x"] = round(rates[8] / rates[1], 3)

    # non-replication invariant (meaningful on ANY core count): same total
    # envs, monolithic vs sharded-over-8 — ratio ~1 means each device
    # stepped only its shard; ~1/8 means the batch was replicated
    total = 8 * args.envs_per_dev
    mono = bench(1, total)
    sharded = rates[8]
    results["replication_check"] = {
        "total_envs": total,
        "monolithic_1dev_rate": round(mono),
        "sharded_8dev_rate": round(sharded),
        "ratio_sharded_over_mono": round(sharded / mono, 3),
    }
    print(f"non-replication ratio (sharded/mono, ~1 good, ~0.125 broken): "
          f"{sharded / mono:.3f}", file=sys.stderr)

    line = json.dumps(results)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
