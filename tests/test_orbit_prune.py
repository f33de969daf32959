"""finalize(orbit_margin=...) — rotation-safe build-time pair pruning.

The vehicle's gear teeth sweep full circles, so the initial-center prune
(candidate_margin) would drop tooth pairs that mesh half a revolution
later; orbit_margin bounds each collider by the spherical shell it sweeps
when its body rotates about its own COM (builder.finalize docstring).
VERDICT r4 #1: the unpruned cloth+vehicle+heightfield scene spills 137 M
to a 128 M VMEM in the fused kernel; orbit pruning is what keeps BASELINE
config 4 fused-eligible."""

import numpy as np
import pytest

from dxk_tpu.scene import SceneBuilder


def _counts(scene):
    return {(int(g.type_a), int(g.type_b)): g.pairs.shape[0]
            for g in scene.pair_groups}


def _build_rotor(orbit_margin):
    """One spinning rotor with an arm-tip sphere pointing AWAY from a
    nearby free sphere, plus a far-away sphere: the tip can sweep around
    to reach the near sphere (must be kept) but never the far one (must
    be pruned)."""
    b = SceneBuilder()
    rotor = b.add_body(position=(0.0, 5.0, 0.0))
    # heavy hub keeps the COM at the body origin; the arm tip orbits r=1
    b.add_sphere_collider(rotor, (0.0, 0.0, 0.0), 0.3, density=5000.0)
    b.add_sphere_collider(rotor, (-1.0, 0.0, 0.0), 0.1, density=1.0)
    near = b.add_body(position=(1.2, 5.0, 0.0))      # tip reaches at phase pi
    b.add_sphere_collider(near, (0.0, 0.0, 0.0), 0.1)
    far = b.add_body(position=(4.0, 5.0, 0.0))       # beyond any sweep
    b.add_sphere_collider(far, (0.0, 0.0, 0.0), 0.1)
    return b.finalize(orbit_margin=orbit_margin), rotor, near, far


def test_orbit_keeps_sweepable_pair_that_center_prune_drops():
    scene, _, _, _ = _build_rotor(orbit_margin=0.1)
    kept = {tuple(p) for g in scene.pair_groups
            for p in np.asarray(g.pairs)}
    # collider ids: 0 hub, 1 arm tip, 2 near sphere, 3 far sphere
    assert (1, 2) in kept or (2, 1) in kept, \
        "arm tip can sweep into the near sphere - pair must survive"
    assert not ({(1, 3), (3, 1)} & kept), \
        "far sphere is beyond the swept shell - pair must be pruned"
    # the initial-center prune at the same margin WOULD drop the tip-near
    # pair (centers 2.2 apart, brads 0.1+0.1): that is the bug orbit_margin
    # exists to avoid
    b2 = SceneBuilder()
    r2 = b2.add_body(position=(0.0, 5.0, 0.0))
    b2.add_sphere_collider(r2, (0.0, 0.0, 0.0), 0.3, density=5000.0)
    b2.add_sphere_collider(r2, (-1.0, 0.0, 0.0), 0.1, density=1.0)
    n2 = b2.add_body(position=(1.2, 5.0, 0.0))
    b2.add_sphere_collider(n2, (0.0, 0.0, 0.0), 0.1)
    f2 = b2.add_body(position=(4.0, 5.0, 0.0))
    b2.add_sphere_collider(f2, (0.0, 0.0, 0.0), 0.1)
    sc2 = b2.finalize(candidate_margin=0.1)
    kept2 = {tuple(p) for g in sc2.pair_groups for p in np.asarray(g.pairs)}
    assert not ({(1, 2), (2, 1)} & kept2)


def test_statics_use_plain_bounding_sphere():
    """A static collider never rotates: it must pair with a dynamic body
    only if the dynamic body's shell reaches the static's own sphere."""
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
    s = b.add_body(position=(0.0, 2.0, 0.0))
    b.add_sphere_collider(s, (0, 0, 0), 0.5)
    scene = b.finalize(orbit_margin=0.5)
    assert sum(g2.pairs.shape[0] for g2 in scene.pair_groups) == 1


def _vehicle_scene(**kw):
    from dxk_tpu.models.vehicle import add_vehicle

    b = SceneBuilder()
    hx, hz = 33, 33
    xs, zs = np.meshgrid(np.arange(hx), np.arange(hz), indexing="ij")
    H = (0.4 * np.sin(xs * 0.4) * np.cos(zs * 0.4)).astype(np.float32)
    b.set_heightfield(H, cell_size=1.0, min_corner=(-16.0, 0.0, -16.0),
                      friction=1.0)
    veh = add_vehicle(b, initial_position=(0.0, 1.6, 0.0))
    b.add_cloth(width=2.0, height=2.0, grid_x=12, grid_y=12,
                total_mass=1.0, transform_pos=(6.0, 3.0, 0.0))
    scene = b.finalize(**kw)
    c = scene.default_controls
    c = c.replace(
        hinge_motor_type=c.hinge_motor_type.at[veh.motor_hinge].set(0),
        hinge_target=c.hinge_target.at[veh.motor_hinge].set(3.0),
        hinge_max_torque=c.hinge_max_torque.at[veh.motor_hinge].set(500.0))
    return scene.replace(default_controls=c)


def test_vehicle_scene_under_fused_budget():
    """BASELINE config 4 must be fused-eligible after orbit pruning and
    keep every gear-mesh candidate (all tooth pairs of gears whose swept
    circles overlap)."""
    from dxk_tpu.ops.pallas.fused_step import (FUSED_MAX_PAIR_ROWS,
                                               fused2_eligible)

    pruned = _vehicle_scene(orbit_margin=0.5)
    total = sum(g.pairs.shape[0] for g in pruned.pair_groups)
    assert total <= FUSED_MAX_PAIR_ROWS, total
    assert fused2_eligible(pruned)
    # the unpruned scene must be REFUSED by the VMEM budget guard (this is
    # the round-2..4 compiler-crash class the guard exists to catch)
    unpruned = _vehicle_scene()
    assert sum(g.pairs.shape[0] for g in unpruned.pair_groups) > \
        FUSED_MAX_PAIR_ROWS
    with pytest.warns(UserWarning, match="fused pipeline refused"):
        assert not fused2_eligible(unpruned)


@pytest.mark.slow
def test_vehicle_trajectory_unchanged_by_orbit_prune():
    """Pruning only ever removes pairs that never collide: the motorized
    vehicle-on-heightfield trajectory must be IDENTICAL (same solver
    order, bitwise) with and without orbit_margin. 240 steps covers
    multiple gear revolutions at the motor target (verified 0.0 deviation
    when recorded)."""
    import jax

    from dxk_tpu.physics import PhysicsSettings, physics_step

    settings = PhysicsSettings(num_rigid_solver_iterations=30,
                               solver_mode="scan")
    outs = []
    for kw in ({}, {"orbit_margin": 0.5}):
        scene = _vehicle_scene(**kw)
        st = scene.initial_state()
        step = jax.jit(
            lambda s, sc=scene: physics_step(sc, s, settings, 1 / 120)[0])
        for _ in range(240):
            st = step(st)
        outs.append((np.asarray(st.pos), np.asarray(st.rot)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
