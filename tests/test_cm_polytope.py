"""cm_polytope SAT+clip contact recipes (box-hull, hull-hull,
cylinder-hull): analytic oracles, GJK+EPA random-soup cross-checks, and
the fused-kernel route.

The reference resolves these pairs with GJK+EPA single contacts
(collision_narrow.cpp:1045-1073, 1150-1178, 1558-1584); the rebuild's
exact SAT over build-time topology (scene/hull_topology.py) must agree
with the EPA oracle on hit booleans and depth (to EPA's own tolerance)
while producing stable multi-point manifolds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.physics import PhysicsSettings, physics_step
from dxk_tpu.scene import SceneBuilder


def _hull_tabs_from_scene(scene, hid):
    H = scene.hulls
    return tuple(jnp.asarray(t[hid]) for t in (
        H.vertices, H.vertex_mask, H.poly_normals, H.poly_offsets,
        H.poly_mask, H.loop_pts, H.loop_len, H.edge_dirs, H.edge_mask))


def _hull_scene(points):
    b = SceneBuilder()
    hid = b.add_hull_geometry_from_mesh(np.asarray(points, np.float64))
    bd = b.add_body()
    b.add_hull_collider(bd, hid)
    return b.finalize(), hid


def _cube_tabs(h=0.4):
    cube = np.array([[sx * h, sy * h, sz * h] for sx in (-1, 1)
                     for sy in (-1, 1) for sz in (-1, 1)])
    scene, hid = _hull_scene(cube)
    return _hull_tabs_from_scene(scene, hid)


def _rand_hull_tabs(seed, n=7, scale=0.4):
    rng = np.random.default_rng(seed)
    scene, hid = _hull_scene(rng.normal(size=(n, 3)) * scale)
    return _hull_tabs_from_scene(scene, hid)


IDQ = jnp.asarray([0.0, 0.0, 0.0, 1.0])


class TestAnalytic:
    def test_box_on_cube_hull_face_manifold(self):
        """Box resting on a cube hull, 0.1 overlap: 4-point manifold,
        exact +y normal and depth (the SAT MTV is exact for polytopes —
        stronger than the reference's EPA approximation)."""
        from dxk_tpu.ops.narrowphase import box_hull_contact
        tabs = _cube_tabs(0.4)
        pts, dps, nrm, cnt, hit = box_hull_contact(
            jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray([0.5, 0.4, 0.5]),
            IDQ, jnp.asarray([0.0, 0.3, 0.0]), IDQ, *tabs)
        assert bool(hit) and int(cnt) == 4
        # normal points box -> hull (hull below): -y
        assert float(nrm[1]) < -0.999
        np.testing.assert_allclose(np.asarray(dps), 0.1, atol=1e-5)

    def test_box_hull_separated(self):
        from dxk_tpu.ops.narrowphase import box_hull_contact
        tabs = _cube_tabs(0.4)
        _, _, _, cnt, hit = box_hull_contact(
            jnp.asarray([0.0, 2.0, 0.0]), jnp.asarray([0.5, 0.4, 0.5]),
            IDQ, jnp.asarray([0.0, 0.3, 0.0]), IDQ, *tabs)
        assert not bool(hit) and int(cnt) == 0

    def test_cylinder_rests_on_cube_hull_face(self):
        """Cylinder lying on a cube hull's top face: depth and normal are
        analytic (lateral surface on a plane)."""
        from dxk_tpu.ops.narrowphase import cylinder_hull_contact
        tabs = _cube_tabs(0.4)
        # hull top at y = 0.4; cylinder axis along x at height 0.62,
        # radius 0.25 -> lowest lateral point at 0.37 -> depth 0.03
        pts, dps, nrm, cnt, hit = cylinder_hull_contact(
            jnp.asarray([-0.3, 0.62, 0.0]), jnp.asarray([0.3, 0.62, 0.0]),
            jnp.float32(0.25), jnp.asarray([0.0, 0.0, 0.0]), IDQ, *tabs)
        assert bool(hit) and int(cnt) == 1
        assert float(nrm[1]) < -0.999
        assert abs(float(dps[0]) - 0.03) < 1e-4

    def test_hull_hull_edge_cross(self):
        """Cube hulls crossed at 45 degrees, edge over edge: 1 contact at
        the crossing with the SAT edge-axis depth."""
        from dxk_tpu.core.maths import quat_from_axis_angle
        from dxk_tpu.ops.narrowphase import hull_hull_contact
        tabs = _cube_tabs(0.4)
        qy = quat_from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]),
                                  jnp.float32(np.pi / 4))
        qx = quat_from_axis_angle(jnp.asarray([1.0, 0.0, 0.0]),
                                  jnp.float32(np.pi / 4))
        from dxk_tpu.core.maths import quat_mul
        q = quat_mul(qy, qx)
        # B rotated so an edge runs diagonally above A's top edge
        pts, dps, nrm, cnt, hit = hull_hull_contact(
            jnp.asarray([0.0, 0.0, 0.0]), IDQ, *tabs,
            jnp.asarray([0.38, 0.9, 0.0]), q, *tabs)
        assert bool(hit)
        assert np.isfinite(np.asarray(pts)).all()
        assert float(dps[0]) > 0.0


@pytest.mark.slow
class TestOracleSoups:
    """Random-pose soups pinned against the reference-style GJK+EPA
    (hit booleans agree except near-tangency; SAT depth is never deeper
    than EPA beyond tolerance — EPA's inscribed polytope LOWER-bounds the
    true depth, the SAT candidate set upper-bounds it).

    Slow tier: the unrolled SAT traces are multi-minute XLA:CPU compiles
    cold (~2.5 min warm); the default tier keeps TestAnalytic +
    TestFusedRoute as the fast pins for the same recipes."""

    def _poses(self, seed, N):
        rng = np.random.default_rng(seed)
        p = rng.normal(size=(N, 3)) * 0.5
        q = rng.normal(size=(N, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        return jnp.asarray(p, jnp.float32), jnp.asarray(q, jnp.float32)

    def _check(self, h1, d1, h2, d2, tang=0.02, tol=0.06):
        h1 = np.asarray(h1)
        h2 = np.asarray(h2)
        d1 = np.asarray(d1)[:, 0]
        d2 = np.asarray(d2)[:, 0]
        for t in range(len(h1)):
            if bool(h1[t]) != bool(h2[t]):
                dref = d1[t] if h1[t] else d2[t]
                assert abs(dref) < tang, (t, h1[t], h2[t], dref)
            elif h1[t]:
                assert d2[t] > d1[t] - tol, (t, d1[t], d2[t])
        assert int(h1.sum()) > 5    # soup actually exercises contacts

    def test_box_hull_soup(self):
        import dxk_tpu.ops.narrowphase as NB
        from dxk_tpu.ops.gjk import support_box, support_hull
        from dxk_tpu.ops.narrowphase import _gjk_epa_point
        tabs = _rand_hull_tabs(0)
        N = 128
        hp, hq = self._poses(1, N)
        bc, bq = self._poses(2, N)
        rng = np.random.default_rng(3)
        bh = jnp.asarray(rng.uniform(0.2, 0.6, (N, 3)), jnp.float32)
        p1, d1, n1, c1, h1 = jax.jit(jax.vmap(
            lambda bc, bh, bq, hp, hq: NB.box_hull_contact(
                bc, bh, bq, hp, hq, *tabs)))(bc, bh, bq, hp, hq)
        p2, d2, n2, c2, h2 = jax.jit(jax.vmap(
            lambda bc, bh, bq, hp, hq: _gjk_epa_point(
                support_box, support_hull, (bc, bh, bq),
                (hp, hq, tabs[0], tabs[1]))))(bc, bh, bq, hp, hq)
        self._check(h1, d1, h2, d2)

    def test_hull_hull_soup(self):
        import dxk_tpu.ops.narrowphase as NB
        from dxk_tpu.ops.gjk import support_hull
        from dxk_tpu.ops.narrowphase import _gjk_epa_point
        ta = _rand_hull_tabs(4)
        tb = _rand_hull_tabs(5)
        N = 128
        ap, aq = self._poses(6, N)
        bp, bq = self._poses(7, N)
        p1, d1, n1, c1, h1 = jax.jit(jax.vmap(
            lambda ap, aq, bp, bq: NB.hull_hull_contact(
                ap, aq, *ta, bp, bq, *tb)))(ap, aq, bp, bq)
        p2, d2, n2, c2, h2 = jax.jit(jax.vmap(
            lambda ap, aq, bp, bq: _gjk_epa_point(
                support_hull, support_hull, (ap, aq, ta[0], ta[1]),
                (bp, bq, tb[0], tb[1]))))(ap, aq, bp, bq)
        self._check(h1, d1, h2, d2)

    def test_cylinder_hull_soup(self):
        import dxk_tpu.ops.narrowphase as NB
        from dxk_tpu.ops.gjk import support_cylinder, support_hull
        from dxk_tpu.ops.narrowphase import _gjk_epa_point
        tb = _rand_hull_tabs(8)
        N = 128
        bp, bq = self._poses(9, N)
        rng = np.random.default_rng(10)
        ca = rng.normal(size=(N, 3)) * 0.5
        ax = rng.normal(size=(N, 3))
        ax /= np.linalg.norm(ax, axis=1, keepdims=True)
        hl = rng.uniform(0.2, 0.5, (N, 1))
        cb = jnp.asarray(ca + ax * 2 * hl, jnp.float32)
        ca = jnp.asarray(ca, jnp.float32)
        cr = jnp.asarray(rng.uniform(0.1, 0.35, N), jnp.float32)
        p1, d1, n1, c1, h1 = jax.jit(jax.vmap(
            lambda a, b2, r, bp, bq: NB.cylinder_hull_contact(
                a, b2, r, bp, bq, *tb)))(ca, cb, cr, bp, bq)
        p2, d2, n2, c2, h2 = jax.jit(jax.vmap(
            lambda a, b2, r, bp, bq: _gjk_epa_point(
                support_cylinder, support_hull, (a, b2, r),
                (bp, bq, tb[0], tb[1]))))(ca, cb, cr, bp, bq)
        # the cylinder CSO is smooth: EPA lower-bounds the true depth and
        # the candidate SAT upper-bounds it — allow the documented slack
        self._check(h1, d1, h2, d2, tang=0.035, tol=0.1)


def _hull_stack_scene():
    """Cube-hull stack + box + cylinder: exercises box-hull, hull-hull and
    cylinder-hull pair groups in one fused-eligible scene."""
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (6, 1, 6))
    cube = np.array([[x, y, z] for x in (-0.4, 0.4) for y in (-0.4, 0.4)
                     for z in (-0.4, 0.4)])
    hid = b.add_hull_geometry_from_mesh(cube)
    h1 = b.add_body(position=(0, 0.45, 0))
    b.add_hull_collider(h1, hid)
    h2 = b.add_body(position=(0.1, 1.3, 0.05))
    b.add_hull_collider(h2, hid)
    cyl = b.add_body(position=(0.0, 2.2, 0.0))
    b.add_cylinder_collider(cyl, (-0.3, 0, 0), (0.3, 0, 0), 0.22)
    return b.finalize()


class TestFusedRoute:
    """The hull recipes run INSIDE the fused kernel (all 15 type-pair
    buckets are CM_RECIPES now): the vmapped kernel route must match the
    XLA jacobi path bit-for-bit (shared _fused_core)."""

    def test_eligible_and_native(self):
        from dxk_tpu.ops.pallas.fused_step import (_group_static,
                                                   fused2_eligible)
        scene = _hull_stack_scene()
        assert fused2_eligible(scene)
        metas = _group_static(scene)
        assert all(m["native"] for m in metas)
        keys = {(min(m["ta"], m["tb"]), max(m["ta"], m["tb"]))
                for m in metas}
        assert {(3, 4), (4, 4), (2, 4)} <= keys

    @pytest.mark.slow
    def test_one_step_exact_vs_jacobi(self):
        scene = _hull_stack_scene()
        base = scene.initial_state()
        B = 128
        st = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B, *x.shape)).copy(), base)
        st = st.replace(lin_vel=st.lin_vel + 0.01 * jax.random.normal(
            jax.random.PRNGKey(0), st.lin_vel.shape))

        def run(mode):
            settings = PhysicsSettings(num_rigid_solver_iterations=10,
                                       solver_mode=mode)
            step = jax.jit(jax.vmap(lambda s: physics_step(
                scene, s, settings, 1 / 120.0)[0]))
            return step(st)

        ja = run("jacobi")
        fu = run("fused")
        assert float(jnp.abs(ja.pos - fu.pos).max()) < 1e-7
        assert float(jnp.abs(ja.lin_vel - fu.lin_vel).max()) < 1e-6
        assert float(jnp.abs(ja.ang_vel - fu.ang_vel).max()) < 1e-6
