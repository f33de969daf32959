"""fused_seq: the reference-exact sequential-impulse solve inside the
fused pipeline (solver_mode="fused_seq", ops/pallas/fused_step.py
sequential=True) — the TPU-speed fidelity mode (SURVEY §4; the goldens'
"scan" semantics batched on vector lanes).

The unbatched path must reproduce mode="scan" BIT-EXACTLY on the first
step (identical operation order; only the narrowphase/prep arithmetic
differs at float-noise level), and stay within chaos-bounded drift over
short horizons."""

import jax
import jax.numpy as jnp
import pytest

from dxk_tpu.physics import PhysicsSettings, physics_step
from dxk_tpu.scene import SceneBuilder


def _mixed_scene():
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
    for i in range(3):
        bd = b.add_body(position=(0.02 * i, 0.5 + 1.001 * i, -0.01 * i))
        b.add_box_collider(bd, (0, 0, 0), (0.5, 0.5, 0.5))
    s = b.add_body(position=(2.0, 1.0, 0.0))
    b.add_sphere_collider(s, (0, 0, 0), 0.5)
    c = b.add_body(position=(-2.0, 1.0, 0.0))
    b.add_capsule_collider(c, (0, -0.3, 0), (0, 0.3, 0), 0.2)
    b.add_ball_constraint(g, c, (-2.0, 2.0, 0.0))
    return b.finalize()


def _step(scene, mode):
    settings = PhysicsSettings(solver_mode=mode)
    return jax.jit(lambda s: physics_step(scene, s, settings, 1 / 120)[0])


def test_first_step_bit_exact():
    scene = _mixed_scene()
    s0 = scene.initial_state()
    a = _step(scene, "scan")(s0)
    b = _step(scene, "fused_seq")(s0)
    assert float(jnp.abs(a.lin_vel - b.lin_vel).max()) == 0.0
    assert float(jnp.abs(a.pos - b.pos).max()) == 0.0


def test_short_horizon_matches_scan():
    scene = _mixed_scene()
    sa = scene.initial_state()
    sb = scene.initial_state()
    fa, fb = _step(scene, "scan"), _step(scene, "fused_seq")
    for _ in range(50):
        sa, sb = fa(sa), fb(sb)
    assert float(jnp.abs(sa.pos - sb.pos).max()) < 5e-3
    assert bool(jnp.isfinite(sb.pos).all())


@pytest.mark.slow
def test_batched_matches_unbatched():
    """vmapped fused_seq (interpret-mode Pallas kernel on CPU) must agree
    with the unbatched XLA path."""
    scene = _mixed_scene()
    settings = PhysicsSettings(solver_mode="fused_seq",
                               num_rigid_solver_iterations=8)
    s0 = scene.initial_state()
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (4, *x.shape)).copy(), s0)
    sb = jax.jit(jax.vmap(
        lambda s: physics_step(scene, s, settings, 1 / 120)[0]))(batch)
    su = jax.jit(
        lambda s: physics_step(scene, s, settings, 1 / 120)[0])(s0)
    err = float(jnp.abs(sb.lin_vel[0] - su.lin_vel).max())
    assert err < 1e-5, err
