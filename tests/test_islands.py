"""Island decomposition (dxk_tpu/scene/islands.py): island-space stepping
must reproduce full-scene stepping, because islands are exact (no contacts
or joints cross island boundaries once candidate_margin pruning holds)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.physics import PhysicsSettings, physics_step
from dxk_tpu.scene import SceneBuilder
from dxk_tpu.scene.islands import NotIslandizable, islandize


def _towers_scene(n_towers=4, height=4, phases=4, margin=1.0,
                  base=0.4995, spacing=0.9995):
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (60, 1, 60))
    for t in range(n_towers):
        x = t * 3.0
        for i in range(height):
            bd = b.add_body(position=(x, base + spacing * i, 0.0))
            b.add_box_collider(bd, (0, 0, 0), (0.5, 0.5, 0.5))
    return b.finalize(contact_phases=phases, candidate_margin=margin)


def test_islandize_structure():
    scene = _towers_scene()
    im = islandize(scene)
    assert im.num_islands == 4
    assert im.body_map.shape == (4, 4)
    sub = im.sub_scene
    assert sub.num_bodies == 4
    # each island: 4 box colliders + the shared ground replica
    assert int(sub.colliders.ctype.shape[0]) == 5
    total_pairs = sum(int(g.pairs.shape[0]) for g in sub.pair_groups)
    assert total_pairs >= 3 + 1     # 3 chain contacts + >=1 ground contact


def test_island_step_matches_full_scene():
    scene = _towers_scene()
    im = islandize(scene)
    settings = PhysicsSettings(num_rigid_solver_iterations=10,
                               solver_mode="colored")

    full = scene.initial_state()
    isl = im.gather(scene.initial_state())

    step_full = jax.jit(lambda s: physics_step(scene, s, settings,
                                               1 / 120.0)[0])
    step_isl = jax.jit(jax.vmap(
        lambda s: physics_step(im.sub_scene, s, settings, 1 / 120.0)[0]))
    for _ in range(3):
        full = step_full(full)
        isl = step_isl(isl)

    back = im.scatter(isl, scene.initial_state())
    err_p = float(jnp.abs(back.pos[:-1] - full.pos[:-1]).max())
    err_v = float(jnp.abs(back.lin_vel[:-1] - full.lin_vel[:-1]).max())
    assert err_p < 1e-5, err_p
    assert err_v < 1e-4, err_v


@pytest.mark.slow
def test_island_step_fused_mode():
    """The island sub-scene is fused-pipeline eligible (static pruned
    tables, phases in-kernel) and the fused step stays finite and close to
    the XLA path.

    slow: XLA:CPU fusion-duplication explodes the box_box_cm select chains
    (11k HLO -> 245k post-opt, ~20 min single-core compile); the compiled
    program is cached (conftest) so re-runs are cheap. On TPU the kernel
    compiles through Mosaic instead."""
    from dxk_tpu.ops.pallas.fused_step import fused2_eligible
    scene = _towers_scene()
    im = islandize(scene)
    assert fused2_eligible(im.sub_scene)

    isl0 = im.gather(scene.initial_state())
    # pad islands to a full lane batch like the bench does
    reps = 128 // im.num_islands
    isl = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * reps, axis=0), isl0)

    for mode in ("colored", "fused"):
        settings = PhysicsSettings(num_rigid_solver_iterations=10,
                                   solver_mode=mode)
        step = jax.jit(jax.vmap(
            lambda s: physics_step(im.sub_scene, s, settings, 1 / 120.0)[0]))
        st = isl
        for _ in range(2):
            st = step(st)
        if mode == "colored":
            want = st
    got = st
    assert bool(jnp.isfinite(got.pos).all())
    assert float(jnp.abs(got.pos - want.pos).max()) < 1e-5
    assert float(jnp.abs(got.lin_vel - want.lin_vel).max()) < 1e-4


@pytest.mark.slow
def test_island_towers_stand_at_bench_tuning():
    """The bench's tuned box-stack settings (contact_phases=2,
    candidate_margin=0.25 — the round-3 on-chip sweep winner at 19.2M
    body-steps/s) must keep towers standing: 600 fused steps at the
    bench's exact spawn (0.5 + 1.001*i gaps) and dt (1/120), no box may
    leave its column or fall below its start height band. This is the
    standing-tower invariant that licenses margin 0.25's pruning of
    next-nearest intra-tower pairs (bench.py docstring).

    slow: same box_box_cm XLA:CPU compile cost as
    test_island_step_fused_mode; cached after the first run."""
    scene = _towers_scene(n_towers=4, height=16, phases=2, margin=0.25,
                          base=0.5, spacing=1.001)
    im = islandize(scene)
    settings = PhysicsSettings(num_rigid_solver_iterations=30,
                               solver_mode="fused")
    isl0 = im.gather(scene.initial_state())
    step = jax.jit(jax.vmap(
        lambda s: physics_step(im.sub_scene, s, settings, 1 / 120.0)[0]))
    st = isl0
    for _ in range(600):
        st = step(st)
    assert bool(jnp.isfinite(st.pos).all())
    top0 = float(jnp.max(isl0.pos[..., 1]))
    top = float(jnp.max(st.pos[..., 1]))
    # top box of every 16-high tower stays up (settles slightly as the
    # 1.001 spawn gaps close: 16 * 0.001 + contact slop)
    assert top > top0 - 0.15, (top0, top)
    # nothing tipped sideways out of its column
    dx = jnp.abs(st.pos[:, :-1, 0] - isl0.pos[:, :-1, 0])
    dz = jnp.abs(st.pos[:, :-1, 2] - isl0.pos[:, :-1, 2])
    assert float(jnp.maximum(dx, dz).max()) < 0.25


def test_non_uniform_scene_raises():
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (60, 1, 60))
    for i in range(3):
        bd = b.add_body(position=(0.0, 0.5 + i, 0.0))
        b.add_box_collider(bd, (0, 0, 0), (0.5, 0.5, 0.5))
    bd = b.add_body(position=(5.0, 0.4, 0.0))
    b.add_sphere_collider(bd, (0, 0, 0), 0.4)
    scene = b.finalize(candidate_margin=1.0)
    with pytest.raises(NotIslandizable):
        islandize(scene)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_island_controls_carried():
    """gather must slice the caller's MotorControls into island space (not
    silently reset to defaults)."""
    b = SceneBuilder()
    for t in range(3):
        x = t * 4.0
        anchor = b.add_body(position=(x, 3, 0), kinematic=True)
        arm = b.add_body(position=(x + 0.5, 3, 0))
        b.add_capsule_collider(arm, (-0.3, 0, 0), (0.3, 0, 0), 0.1)
        b.add_hinge_constraint(anchor, arm, (x, 3, 0), (0, 0, 1))
    scene = b.finalize(candidate_margin=0.5)
    im = islandize(scene)
    assert im.hinge_ctrl_map is not None
    assert im.hinge_ctrl_map.shape == (3, 1)

    # velocity-drive each hinge with a DIFFERENT target
    c = scene.default_controls
    c = c.replace(hinge_motor_type=jnp.zeros_like(c.hinge_motor_type),
                  hinge_target=jnp.asarray([1.0, -2.0, 3.0]),
                  hinge_max_torque=jnp.full_like(c.hinge_max_torque, 500.0))
    full = scene.initial_state().replace(controls=c)
    isl = im.gather(full)
    assert isl.controls.hinge_target.shape == (3, 1)
    np.testing.assert_allclose(np.asarray(isl.controls.hinge_target),
                               [[1.0], [-2.0], [3.0]])

    settings = PhysicsSettings(num_rigid_solver_iterations=10,
                               solver_mode="jacobi")
    step_full = jax.jit(lambda s: physics_step(scene, s, settings,
                                               1 / 120.0)[0])
    step_isl = jax.jit(jax.vmap(
        lambda s: physics_step(im.sub_scene, s, settings, 1 / 120.0)[0]))
    for _ in range(5):
        full = step_full(full)
        isl = step_isl(isl)
    back = im.scatter(isl, scene.initial_state())
    err = float(jnp.abs(back.ang_vel[:-1] - full.ang_vel[:-1]).max())
    assert err < 1e-5, err
    # the three arms must spin differently (controls actually applied)
    w = np.asarray(isl.ang_vel[:, 0, 2])   # island body 0 = the arm
    assert not np.allclose(w[0], w[1])
