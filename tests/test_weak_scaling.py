"""Sharded-step non-replication gate (VERDICT r4 #7).

The physics/env step has NO collectives, so sharding the env axis over D
devices must not duplicate work: stepping N total envs sharded over D
devices costs about the same total compute as N envs on one device. On
this single-core container wall-clock weak scaling is physically
meaningless (8 virtual devices timeshare 1 core), but accidental
replication WOULD show up as a ~Dx slowdown of the sharded run — that is
the regression this test pins. tools/weak_scaling.py emits the full
1/2/4/8 curve (docs/weak_scaling_r5.json); on real multi-chip hardware
its `weak_scaling_x` is the headline number.
"""

import time

import jax
import jax.numpy as jnp
import pytest

from dxk_tpu.envs.loco_env import LocoEnv
from dxk_tpu.parallel.mesh import make_env_mesh, shard_env_batch


@pytest.mark.slow
def test_sharded_step_does_not_replicate_work():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    env = LocoEnv(solver_iterations=4, solver_mode="jacobi",
                  max_narrow_pairs=16, enable_pokes=False)
    total = 64
    actions = jnp.zeros((total, 27))

    def bench(n_devices):
        mesh = make_env_mesh(n_devices)
        keys = jax.random.split(jax.random.PRNGKey(0), total)
        st, _ = jax.jit(jax.vmap(env.reset))(keys)
        st = shard_env_batch(mesh, st)

        def n_steps(s):
            def body(c, _):
                c, _o, r, _d = jax.vmap(env.step)(c, actions)
                return c, r
            s, rs = jax.lax.scan(body, s, None, length=4)
            return s, rs.sum()

        with mesh:
            run = jax.jit(n_steps)
            st, _ = run(st)
            jax.block_until_ready(st.physics.pos)
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                st, _ = run(st)
                jax.block_until_ready(st.physics.pos)
                best = min(best, time.time() - t0)
        return best

    t_mono = bench(1)
    t_shard = bench(8)
    # replication would cost ~8x; allow generous partitioning overhead
    assert t_shard < 3.0 * t_mono, (
        f"sharded step {t_shard:.3f}s vs monolithic {t_mono:.3f}s at the "
        "same total batch — work is being replicated across the mesh")
