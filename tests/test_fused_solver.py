"""Fused batched solver kernel (ops/pallas/batched_solver.py) vs the XLA
jacobi path: same semantics, one kernel.

The kernel runs in interpret mode on CPU; on TPU it is the Mosaic kernel.
Comparisons use short horizons — the update is identical up to fp
reassociation (measured 1e-12 after one step), which contact dynamics then
amplify chaotically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.physics import PhysicsSettings, physics_step
from dxk_tpu.scene import SceneBuilder

B = 128   # kernel env-chunk size


def _scene():
    """Boxes, spheres and capsules in contact + hinge and cone-twist
    chain: native cm recipes (sphere-sphere/box, capsule-capsule/box),
    the prep-passed fallback (box-box), and both joint types."""
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
    for i in range(3):
        bd = b.add_body(position=(0, 0.4995 + 0.9995 * i, 0))
        b.add_box_collider(bd, (0, 0, 0), (0.5, 0.5, 0.5))
    s1 = b.add_body(position=(-1.5, 0.35, 0))
    b.add_sphere_collider(s1, (0, 0, 0), 0.35)
    s2 = b.add_body(position=(-1.5, 1.0, 0.05))
    b.add_sphere_collider(s2, (0, 0, 0), 0.3)
    anchor = b.add_body(position=(3, 3, 0), kinematic=True)
    l1 = b.add_body(position=(3.1, 2.5, 0))
    b.add_capsule_collider(l1, (0, -0.2, 0), (0, 0.2, 0), 0.1)
    b.add_hinge_constraint(anchor, l1, (3, 3, 0), (1, 0, 0),
                           min_limit=-1.0, max_limit=1.0)
    l2 = b.add_body(position=(3.2, 1.9, 0))
    b.add_capsule_collider(l2, (0, -0.2, 0), (0, 0.2, 0), 0.1)
    b.add_cone_twist_constraint(l1, l2, (3.1, 2.2, 0), (0, -1, 0),
                                swing_limit=0.7, twist_limit=0.4)
    return b.finalize()          # uncapped tables -> fused-eligible


def _batched_state(scene):
    base = scene.initial_state()
    st = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B, *x.shape)).copy(), base)
    key = jax.random.PRNGKey(0)
    return st.replace(lin_vel=st.lin_vel + 0.01 * jax.random.normal(
        key, st.lin_vel.shape))


def _run(scene, state, mode, steps, iters):
    settings = PhysicsSettings(num_rigid_solver_iterations=iters,
                               solver_mode=mode)
    step = jax.jit(jax.vmap(lambda s: physics_step(scene, s, settings,
                                                   1 / 120.0)[0]))
    for _ in range(steps):
        state = step(state)
    return state


class TestFusedMatchesJacobi:
    def test_one_step_exact(self):
        scene = _scene()
        st = _batched_state(scene)
        ja = _run(scene, st, "jacobi", 1, 10)
        fu = _run(scene, st, "fused", 1, 10)
        assert float(jnp.abs(ja.pos - fu.pos).max()) < 1e-7
        assert float(jnp.abs(ja.lin_vel - fu.lin_vel).max()) < 1e-6
        assert float(jnp.abs(ja.ang_vel - fu.ang_vel).max()) < 1e-6

    def test_short_horizon_close(self):
        scene = _scene()
        st = _batched_state(scene)
        ja = _run(scene, st, "jacobi", 3, 10)
        fu = _run(scene, st, "fused", 3, 10)
        assert float(jnp.abs(ja.pos - fu.pos).max()) < 1e-6
        assert float(jnp.abs(ja.lin_vel - fu.lin_vel).max()) < 1e-4

    def test_cylinder_cap_ring_not_truncated(self):
        """Cylinder pairs emit 4-point cap rings; TYPE_MAX_POINTS must
        reserve 4 prep-passed rows or fused mode silently drops half the
        ring (_pack_passed packs only K slots) and an upright cylinder
        tips where jacobi keeps it standing."""
        from dxk_tpu.ops.pallas.batched_solver import TYPE_MAX_POINTS
        assert TYPE_MAX_POINTS[(2, 3)] == 4
        assert TYPE_MAX_POINTS[(2, 2)] == 4
        assert TYPE_MAX_POINTS[(4, 4)] == 4
        b = SceneBuilder()
        g = b.add_static()
        b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
        cyl = b.add_body(position=(0, 0.62, 0))
        b.add_cylinder_collider(cyl, (0, -0.6, 0), (0, 0.6, 0), 0.4)
        scene = b.finalize()
        st = _batched_state(scene)
        ja = _run(scene, st, "jacobi", 1, 10)
        fu = _run(scene, st, "fused", 1, 10)
        assert float(jnp.abs(ja.lin_vel - fu.lin_vel).max()) < 1e-6
        assert float(jnp.abs(ja.ang_vel - fu.ang_vel).max()) < 1e-6

    def test_unbatched_falls_back(self):
        """Unbatched call must work (custom_vmap fallback = jacobi)."""
        scene = _scene()
        settings = PhysicsSettings(num_rigid_solver_iterations=5,
                                   solver_mode="fused")
        st = scene.initial_state()
        st2, _ = jax.jit(lambda s: physics_step(scene, s, settings,
                                                1 / 120.0))(st)
        assert bool(jnp.isfinite(st2.pos).all())

    def test_ineligible_scene_falls_back(self):
        """A kselect-broadphase scene (dynamic pair compaction) must
        silently use the XLA path under solver_mode='fused'."""
        from dxk_tpu.ops.pallas.fused_step import fused2_eligible
        b = SceneBuilder()
        g = b.add_static()
        b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
        for i in range(3):
            bd = b.add_body(position=(0, 0.4995 + 0.9995 * i, 0))
            b.add_box_collider(bd, (0, 0, 0), (0.5, 0.5, 0.5))
        scene = b.finalize(max_narrow_pairs_per_group=4,
                           broadphase="kselect", broadphase_k=4)
        assert not fused2_eligible(scene)
        st = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B, *x.shape)).copy(),
            scene.initial_state())
        settings = PhysicsSettings(num_rigid_solver_iterations=5,
                                   solver_mode="fused")
        step = jax.jit(jax.vmap(lambda s: physics_step(scene, s, settings,
                                                       1 / 120.0)[0]))
        out = step(st)
        assert bool(jnp.isfinite(out.pos).all())

    def test_phased_scene_matches_colored(self):
        """A phased tower (contact_phases=4): the in-kernel phase slices
        must reproduce the XLA phased pass ('colored' mode) exactly."""
        from dxk_tpu.ops.pallas.fused_step import fused2_eligible
        b = SceneBuilder()
        g = b.add_static()
        b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
        for i in range(5):
            bd = b.add_body(position=(0, 0.4995 + 0.9995 * i, 0))
            b.add_box_collider(bd, (0, 0, 0), (0.5, 0.5, 0.5))
        s1 = b.add_body(position=(-2.0, 0.35, 0))
        b.add_sphere_collider(s1, (0, 0, 0), 0.35)
        scene = b.finalize(contact_phases=4)
        assert fused2_eligible(scene)
        st = _batched_state(scene)
        co = _run(scene, st, "colored", 2, 10)
        fu = _run(scene, st, "fused", 2, 10)
        assert float(jnp.abs(co.pos - fu.pos).max()) < 1e-6
        assert float(jnp.abs(co.lin_vel - fu.lin_vel).max()) < 1e-4

    def test_odd_batch_size_pads(self):
        """Batch sizes that are not a CB multiple route through the
        repeat-padding path (advisor r2) and match the jacobi XLA path."""
        scene = _scene()
        st = _batched_state(scene)
        st = jax.tree_util.tree_map(lambda x: x[:5], st)
        ja = _run(scene, st, "jacobi", 1, 5)
        fu = _run(scene, st, "fused", 1, 5)
        assert ja.pos.shape[0] == 5
        assert float(jnp.abs(ja.pos - fu.pos).max()) < 1e-6


def _all_joints_scene():
    """Every joint type (distance/ball/fixed/hinge/cone-twist/slider) in
    one chain + ground contacts: pins the round-3 all-types in-kernel
    solve (reference SIMD paths constraints.cpp:189-3306) against the XLA
    jacobi path."""
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (30, 1, 30))
    top = b.add_body(position=(0, 7, 0), kinematic=True)
    prev, y = top, 7.0
    kinds = ("distance", "ball", "fixed", "hinge", "cone_twist", "slider")
    for kind in kinds:
        y -= 1.0
        link = b.add_body(position=(0, y, 0))
        b.add_capsule_collider(link, (0, -0.3, 0), (0, 0.3, 0), 0.12)
        anchor = (0, y + 0.5, 0)
        if kind == "distance":
            b.add_distance_constraint(prev, link, (0, y + 0.8, 0), anchor)
        elif kind == "ball":
            b.add_ball_constraint(prev, link, anchor)
        elif kind == "fixed":
            b.add_fixed_constraint(prev, link, anchor)
        elif kind == "hinge":
            b.add_hinge_constraint(prev, link, anchor, (1, 0, 0),
                                   min_limit=-1.0, max_limit=1.0)
        elif kind == "cone_twist":
            b.add_cone_twist_constraint(prev, link, anchor, (0, -1, 0),
                                        swing_limit=0.8, twist_limit=0.5)
        else:
            b.add_slider_constraint(prev, link, anchor, (0, 1, 0),
                                    min_limit=-0.4, max_limit=0.4)
        prev = link
    # a contact pair so the contact path runs too
    s1 = b.add_body(position=(2.0, 0.35, 0))
    b.add_sphere_collider(s1, (0, 0, 0), 0.35)
    scene = b.finalize()
    # drive the hinge (position motor) and slider (velocity motor) so the
    # motor rows execute
    c = scene.default_controls
    c = c.replace(
        hinge_motor_type=jnp.ones_like(c.hinge_motor_type),
        hinge_target=jnp.full_like(c.hinge_target, 0.5),
        hinge_max_torque=jnp.full_like(c.hinge_max_torque, 50.0),
        slider_motor_type=jnp.zeros_like(c.slider_motor_type),
        slider_target=jnp.full_like(c.slider_target, 0.2),
        slider_max_force=jnp.full_like(c.slider_max_force, 80.0),
    )
    return scene.replace(default_controls=c)


class TestFusedAllJointTypes:
    def test_eligible(self):
        from dxk_tpu.ops.pallas.fused_step import fused2_eligible
        assert fused2_eligible(_all_joints_scene())

    def test_one_step_exact(self):
        scene = _all_joints_scene()
        st = _batched_state(scene)
        ja = _run(scene, st, "jacobi", 1, 10)
        fu = _run(scene, st, "fused", 1, 10)
        assert float(jnp.abs(ja.pos - fu.pos).max()) < 1e-7
        assert float(jnp.abs(ja.lin_vel - fu.lin_vel).max()) < 1e-6
        assert float(jnp.abs(ja.ang_vel - fu.ang_vel).max()) < 1e-6

    def test_short_horizon_close(self):
        scene = _all_joints_scene()
        st = _batched_state(scene)
        ja = _run(scene, st, "jacobi", 3, 10)
        fu = _run(scene, st, "fused", 3, 10)
        assert float(jnp.abs(ja.pos - fu.pos).max()) < 1e-6
        assert float(jnp.abs(ja.lin_vel - fu.lin_vel).max()) < 1e-4


def test_loco_env_fused_smoke():
    """LocoEnv with the fused solver: finite rollout, reward in range."""
    from dxk_tpu.envs.loco_env import LocoEnv
    env = LocoEnv(solver_iterations=10, solver_mode="fused",
                  enable_pokes=False)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    st, obs = jax.jit(jax.vmap(env.reset))(keys)
    act = jnp.zeros((B, 27))
    step = jax.jit(jax.vmap(env.step))
    for _ in range(3):
        st, obs, rew, done = step(st, act)
    assert bool(jnp.isfinite(obs).all())
    assert bool(jnp.isfinite(rew).all())
    assert float(rew.min()) >= 0.0


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


@pytest.mark.slow
def test_heightfield_scene_fused_matches_jacobi():
    """Terrain contacts ride the prep-passed pseudo-group (round 3):
    fused must reproduce the XLA jacobi path on a heightfield scene."""
    import numpy as np
    from dxk_tpu.ops.pallas.fused_step import fused2_eligible

    b = SceneBuilder()
    hx, hz = 9, 9
    xs, zs = np.meshgrid(np.arange(hx), np.arange(hz), indexing="ij")
    H = (0.3 * np.sin(xs * 0.5) * np.cos(zs * 0.5)).astype(np.float32)
    b.set_heightfield(H, cell_size=1.0, min_corner=(-4.0, 0.0, -4.0),
                      friction=1.0)
    s = b.add_body(position=(0.0, 1.5, 0.0))
    b.add_sphere_collider(s, (0, 0, 0), 0.4)
    c = b.add_body(position=(1.0, 2.0, 0.5))
    b.add_capsule_collider(c, (0, -0.25, 0), (0, 0.25, 0), 0.2)
    scene = b.finalize()
    assert fused2_eligible(scene)

    sj = PhysicsSettings(num_rigid_solver_iterations=10,
                         solver_mode="jacobi")
    sf = PhysicsSettings(num_rigid_solver_iterations=10,
                         solver_mode="fused")
    stj = scene.initial_state()
    stf = scene.initial_state()
    stepj = jax.jit(lambda s: physics_step(scene, s, sj, 1 / 120)[0])
    stepf = jax.jit(lambda s: physics_step(scene, s, sf, 1 / 120)[0])
    for _ in range(60):
        stj = stepj(stj)
        stf = stepf(stf)
    assert float(jnp.abs(stj.pos - stf.pos).max()) < 1e-4
    assert bool(jnp.isfinite(stf.pos).all())


def test_cylinder_box_native_matches_jacobi():
    """Round 3: (2,3) is a native cm recipe — a cylinder scene covering all
    three manifold structures (upright cap ring, lying tube clip, tilted
    single point) must match the XLA path through the kernel. Tolerances
    allow the alternating-projection fp dust the two compilations carry on
    grazing configs (same feature; divergence would be >=1e-2)."""
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
    up = b.add_body(position=(0, 0.58, 0))           # cap ring on ground
    b.add_cylinder_collider(up, (0, -0.6, 0), (0, 0.6, 0), 0.4)
    ly = b.add_body(position=(3, 0.38, 0))           # lying: tube clip
    b.add_cylinder_collider(ly, (-0.7, 0, 0), (0.7, 0, 0), 0.4)
    tl = b.add_body(position=(-3, 0.75, 0),
                    rotation=(0.2588, 0.0, 0.0, 0.9659))  # 30deg tilt
    b.add_cylinder_collider(tl, (0, -0.5, 0), (0, 0.5, 0), 0.35)
    scene = b.finalize()
    from dxk_tpu.ops.pallas.fused_step import CM_RECIPES, fused2_eligible
    assert (2, 3) in CM_RECIPES and fused2_eligible(scene)

    st = _batched_state(scene)
    ja = _run(scene, st, "jacobi", 2, 10)
    fu = _run(scene, st, "fused", 2, 10)
    assert float(jnp.abs(ja.pos - fu.pos).max()) < 1e-5
    assert float(jnp.abs(ja.lin_vel - fu.lin_vel).max()) < 1e-4
    assert float(jnp.abs(ja.ang_vel - fu.ang_vel).max()) < 1e-4


def test_cylinder_cylinder_native_matches_jacobi():
    """Round 3: (2,2) is a native cm recipe — coaxial stack (cap ring) +
    crossing tubes (non-parallel single point) must match the XLA path
    through the kernel."""
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
    c1 = b.add_body(position=(0, 0.48, 0))
    b.add_cylinder_collider(c1, (0, -0.5, 0), (0, 0.5, 0), 0.4)
    c2 = b.add_body(position=(0.03, 1.46, 0.02))        # stacked coaxial
    b.add_cylinder_collider(c2, (0, -0.5, 0), (0, 0.5, 0), 0.35)
    c3 = b.add_body(position=(3, 0.38, 0))              # lying
    b.add_cylinder_collider(c3, (-0.7, 0, 0), (0.7, 0, 0), 0.4)
    c4 = b.add_body(position=(3, 1.14, 0))              # crossing on top
    b.add_cylinder_collider(c4, (0, 0, -0.7), (0, 0, 0.7), 0.38)
    scene = b.finalize()
    from dxk_tpu.ops.pallas.fused_step import CM_RECIPES, fused2_eligible
    assert (2, 2) in CM_RECIPES and fused2_eligible(scene)

    st = _batched_state(scene)
    ja = _run(scene, st, "jacobi", 2, 10)
    fu = _run(scene, st, "fused", 2, 10)
    assert float(jnp.abs(ja.pos - fu.pos).max()) < 1e-5
    assert float(jnp.abs(ja.lin_vel - fu.lin_vel).max()) < 1e-4
    assert float(jnp.abs(ja.ang_vel - fu.ang_vel).max()) < 1e-4


def test_hull_native_matches_jacobi():
    """Round 3: (0,4)/(1,4) are native cm recipes (distance-GJK + face
    MTV) — a sphere+capsule-on-hull scene must match the XLA path through
    the kernel (same shared cores, so fp-epsilon agreement)."""
    import numpy as _np
    rng = _np.random.default_rng(2)
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
    pts = rng.normal(size=(10, 3)).astype(_np.float32) * 0.35
    hid = b.add_hull_geometry_from_mesh(pts)
    h = b.add_body(position=(0, 0.6, 0))
    b.add_hull_collider(h, hid)
    s = b.add_body(position=(0.1, 1.6, 0.05))
    b.add_sphere_collider(s, (0, 0, 0), 0.3)
    c = b.add_body(position=(-0.1, 2.4, 0.0))
    b.add_capsule_collider(c, (-0.3, 0, 0), (0.3, 0, 0), 0.2)
    scene = b.finalize()
    from dxk_tpu.ops.pallas.fused_step import CM_RECIPES, fused2_eligible
    assert (0, 4) in CM_RECIPES and (1, 4) in CM_RECIPES
    assert fused2_eligible(scene)

    st = _batched_state(scene)
    ja = _run(scene, st, "jacobi", 2, 10)
    fu = _run(scene, st, "fused", 2, 10)
    assert float(jnp.abs(ja.pos - fu.pos).max()) < 1e-5
    assert float(jnp.abs(ja.lin_vel - fu.lin_vel).max()) < 1e-4
    assert float(jnp.abs(ja.ang_vel - fu.ang_vel).max()) < 1e-4
