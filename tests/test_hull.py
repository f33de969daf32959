"""Convex hull geometry tests: fromMesh faceting + covariance-method inertia
(physics.cpp:1520-1580) + hull collision behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.physics import PhysicsSettings, physics_step
from dxk_tpu.scene import SceneBuilder


def cube_points(h=0.5, jitter=False):
    pts = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                    for z in (-h, h)])
    if jitter:
        # interior points must be discarded by the hull
        pts = np.vstack([pts, np.random.default_rng(0).uniform(-h * 0.5,
                                                               h * 0.5, (10, 3))])
    return pts


class TestHullGeometry:
    def test_cube_hull_mass_matches_box(self):
        """Hull inertia via the covariance method must match the analytic
        box inertia for a cube."""
        b = SceneBuilder()
        hid = b.add_hull_geometry_from_mesh(cube_points(0.5, jitter=True))
        body = b.add_body()
        b.add_hull_collider(body, hid, density=1000.0)

        b2 = SceneBuilder()
        body2 = b2.add_body()
        b2.add_box_collider(body2, (0, 0, 0), (0.5, 0.5, 0.5), density=1000.0)

        s1 = b.finalize()
        s2 = b2.finalize()
        m1 = 1.0 / float(s1.body_params.inv_mass[body])
        m2 = 1.0 / float(s2.body_params.inv_mass[body2])
        assert abs(m1 - m2) / m2 < 1e-3         # 1000 kg cube
        I1 = np.asarray(s1.body_params.inv_inertia[body])
        I2 = np.asarray(s2.body_params.inv_inertia[body2])
        assert np.allclose(I1, I2, rtol=1e-3)

    def test_hull_vertex_count(self):
        b = SceneBuilder()
        hid = b.add_hull_geometry_from_mesh(cube_points(0.5, jitter=True))
        body = b.add_body()
        b.add_hull_collider(body, hid)
        scene = b.finalize()
        assert int(scene.hulls.vertex_mask.sum()) == 8   # interior discarded

    def test_hull_drops_onto_ground(self):
        """An octahedron hull dropped on the ground settles above it
        (sphere-hull / box-hull contact paths via GJK+EPA)."""
        b = SceneBuilder()
        g = b.add_static()
        b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
        octa = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                         [0, 0, 1], [0, 0, -1]], np.float64) * 0.5
        hid = b.add_hull_geometry_from_mesh(octa)
        body = b.add_body(position=(0, 2.0, 0))
        b.add_hull_collider(body, hid, density=500.0)
        scene = b.finalize()
        state = scene.initial_state()
        step = jax.jit(lambda s: physics_step(scene, s, PhysicsSettings(),
                                              1 / 120)[0])
        for _ in range(360):
            state = step(state)
        p = np.asarray(state.pos[body])
        assert np.all(np.isfinite(p))
        # settled on the ground: a 0.5-radius octahedron rests with its
        # center between a face-down (~0.29) and vertex-down (0.5) height
        assert 0.2 < p[1] < 0.6, p
        assert float(jnp.linalg.norm(state.lin_vel[body])) < 0.2


def test_ray_hull_exact():
    """Exact ray-vs-hull (face plane slab): octahedron |x|+|y|+|z| <= 0.5."""
    from dxk_tpu.ops.raycast import ray_hull
    b = SceneBuilder()
    octa = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                     [0, 0, 1], [0, 0, -1]], np.float64) * 0.5
    hid = b.add_hull_geometry_from_mesh(octa)
    body = b.add_body()
    b.add_hull_collider(body, hid)
    scene = b.finalize()
    h = scene.hulls
    idq = jnp.array([0.0, 0, 0, 1.0])
    o = jnp.array([2.0, 0.0, 0.0])
    d = jnp.array([-1.0, 0.0, 0.0])
    t, hit = ray_hull(o, d, jnp.zeros(3), idq, h.vertices[0], h.vertex_mask[0],
                      h.face_normals[0], h.face_offsets[0], h.face_mask[0])
    assert bool(hit) and abs(float(t) - 1.5) < 1e-4   # hits vertex at x=0.5
    # ray that misses the octahedron corner but would hit its AABB
    o2 = jnp.array([2.0, 0.4, 0.4])
    t2, hit2 = ray_hull(o2, d, jnp.zeros(3), idq, h.vertices[0],
                        h.vertex_mask[0], h.face_normals[0],
                        h.face_offsets[0], h.face_mask[0])
    assert not bool(hit2)


def test_hull_hull_multicontact_flat_faces():
    """Two cube hulls stacked face-on-face must produce a >=2-point
    manifold (exceeds the reference, whose hull-hull emits one EPA point
    and leaves the manifold as a TODO, collision_narrow.cpp:1558-1584)."""
    from dxk_tpu.ops.narrowphase import hull_hull_contact

    cube = np.array([[sx * 0.5, sy * 0.5, sz * 0.5]
                     for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                    np.float32)
    Vmax = 8
    verts = jnp.asarray(cube)
    mask = jnp.ones((Vmax,), bool)
    idq = jnp.asarray([0.0, 0.0, 0.0, 1.0])

    # B sits on top of A with 2 cm penetration, slight xz offset
    pts, dps, nrm, cnt, hit = hull_hull_contact(
        jnp.asarray([0.0, 0.0, 0.0]), idq, verts, mask,
        jnp.asarray([0.12, 0.98, 0.07]), idq, verts, mask)
    assert bool(hit)
    assert int(cnt) >= 2, int(cnt)
    # normal along +y (A -> B), contact points near the interface plane
    assert abs(float(nrm[1])) > 0.95
    live = np.asarray(pts)[:int(cnt)]
    assert np.all(np.abs(live[:, 1] - 0.5) < 0.05)
    # manifold spans an area (not coincident points)
    assert np.ptp(live[:, 0]) > 0.2 or np.ptp(live[:, 2]) > 0.2


def test_hull_hull_vertex_contact_stays_single():
    """Corner-on-face contact keeps the single EPA point."""
    from dxk_tpu.core.maths import quat_from_axis_angle
    from dxk_tpu.ops.narrowphase import hull_hull_contact

    cube = np.array([[sx * 0.5, sy * 0.5, sz * 0.5]
                     for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                    np.float32)
    verts = jnp.asarray(cube)
    mask = jnp.ones((8,), bool)
    idq = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    # rotate B 45 deg about x and z so a corner points down
    qx = quat_from_axis_angle(jnp.asarray([1.0, 0.0, 0.0]), 0.955)
    qz = quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), 0.785)
    from dxk_tpu.core.maths import quat_mul
    q = quat_mul(qz, qx)
    pts, dps, nrm, cnt, hit = hull_hull_contact(
        jnp.asarray([0.0, 0.0, 0.0]), idq, verts, mask,
        jnp.asarray([0.0, 1.30, 0.0]), q, verts, mask)
    assert bool(hit)
    assert int(cnt) == 1, int(cnt)
