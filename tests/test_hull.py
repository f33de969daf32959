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


def _cube_hull_tabs(h=0.5):
    """Per-hull contact tables (verts + topology) for a cube hull, via the
    builder's bake path."""
    cube = np.array([[sx * h, sy * h, sz * h]
                     for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                    np.float64)
    b = SceneBuilder()
    hid = b.add_hull_geometry_from_mesh(cube)
    bd = b.add_body()
    b.add_hull_collider(bd, hid)
    H = b.finalize().hulls
    return tuple(jnp.asarray(t[hid]) for t in (
        H.vertices, H.vertex_mask, H.poly_normals, H.poly_offsets,
        H.poly_mask, H.loop_pts, H.loop_len, H.edge_dirs, H.edge_mask))


def test_hull_hull_multicontact_flat_faces():
    """Two cube hulls stacked face-on-face must produce a >=2-point
    manifold (exceeds the reference, whose hull-hull emits one EPA point
    and leaves the manifold as a TODO, collision_narrow.cpp:1558-1584)."""
    from dxk_tpu.ops.narrowphase import hull_hull_contact

    tabs = _cube_hull_tabs()
    idq = jnp.asarray([0.0, 0.0, 0.0, 1.0])

    # B sits on top of A with 2 cm penetration, slight xz offset
    pts, dps, nrm, cnt, hit = hull_hull_contact(
        jnp.asarray([0.0, 0.0, 0.0]), idq, *tabs,
        jnp.asarray([0.12, 0.98, 0.07]), idq, *tabs)
    assert bool(hit)
    assert int(cnt) >= 2, int(cnt)
    # normal along +y (A -> B), contact points near the interface plane
    assert abs(float(nrm[1])) > 0.95
    live = np.asarray(pts)[:int(cnt)]
    assert np.all(np.abs(live[:, 1] - 0.5) < 0.05)
    # manifold spans an area (not coincident points)
    assert np.ptp(live[:, 0]) > 0.2 or np.ptp(live[:, 2]) > 0.2


def test_hull_hull_vertex_contact_stays_few_points():
    """Corner-on-face contact emits a small manifold concentrated at the
    corner (the clip + depth filter discards the rest of the incident
    face)."""
    from dxk_tpu.core.maths import quat_from_axis_angle, quat_mul
    from dxk_tpu.ops.narrowphase import hull_hull_contact

    tabs = _cube_hull_tabs()
    idq = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    # rotate B 45 deg about x and z so a corner points down
    qx = quat_from_axis_angle(jnp.asarray([1.0, 0.0, 0.0]), 0.955)
    qz = quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), 0.785)
    q = quat_mul(qz, qx)
    pts, dps, nrm, cnt, hit = hull_hull_contact(
        jnp.asarray([0.0, 0.0, 0.0]), idq, *tabs,
        jnp.asarray([0.0, 1.30, 0.0]), q, *tabs)
    assert bool(hit)
    assert 1 <= int(cnt) <= 3, int(cnt)
    # every live point is near the penetrating corner region
    live = np.asarray(pts)[:int(cnt)]
    assert np.all(np.abs(live[:, 1] - 0.5) < 0.1), live


class TestMarginGJKHullContacts:
    """Round 3: sphere-hull and capsule-hull replace GJK+EPA with
    distance-GJK on the ball-swept core (EXACT for these pairs) plus a
    face-plane MTV for core-inside-hull. Pinned against the EPA reference
    on a random soup (hit booleans must agree exactly; depth/normal to
    EPA's own tolerance)."""

    def _hull(self):
        rng = np.random.default_rng(1)
        b = SceneBuilder()
        pts = rng.normal(size=(12, 3)).astype(np.float32) * 0.4
        hid = b.add_hull_geometry_from_mesh(pts)
        bd = b.add_body(position=(0, 5, 0))
        b.add_hull_collider(bd, hid)
        scene = b.finalize()
        H = scene.hulls
        return (jnp.asarray(H.vertices[hid]), jnp.asarray(H.vertex_mask[hid]),
                jnp.asarray(H.face_normals[hid]),
                jnp.asarray(H.face_offsets[hid]),
                jnp.asarray(H.face_mask[hid]))

    def test_sphere_hull_vs_epa(self):
        from dxk_tpu.ops import narrowphase as NB
        from dxk_tpu.ops.gjk import support_hull, support_sphere
        from dxk_tpu.ops.narrowphase import _gjk_epa_point

        hv, hm, fn, fo, fm = self._hull()
        N = 256
        ks = jax.random.split(jax.random.PRNGKey(0), 6)
        hp = jnp.zeros((N, 3))
        hq = jax.random.uniform(ks[5], (N, 4), jnp.float32, -1, 1)
        hq = hq / jnp.linalg.norm(hq, axis=-1, keepdims=True)
        sc = jax.random.uniform(ks[0], (N, 3), jnp.float32, -1.0, 1.0)
        sr = jax.random.uniform(ks[1], (N,), jnp.float32, 0.1, 0.5)
        bcast = lambda x: jnp.broadcast_to(x, (N,) + x.shape)

        pts, dps, nrm, cnt, hit = jax.vmap(NB.sphere_hull_contact)(
            sc, sr, hp, hq, bcast(hv), bcast(hm), bcast(fn), bcast(fo),
            bcast(fm))
        rpts, rdps, rnrm, rcnt, rhit = jax.vmap(
            lambda s, r, p, q, v, m: _gjk_epa_point(
                support_sphere, support_hull, (s, r), (p, q, v, m)))(
            sc, sr, hp, hq, bcast(hv), bcast(hm))

        hit = np.asarray(hit)
        assert np.array_equal(hit, np.asarray(rhit))
        both = hit & (np.asarray(rdps)[:, 0] < 0.3)
        nd = (np.asarray(nrm) * np.asarray(rnrm)).sum(-1)
        dd = np.abs(np.asarray(dps)[:, 0] - np.asarray(rdps)[:, 0])
        assert ((nd > 0.9) | (dd < 0.01))[both].mean() > 0.95
        assert dd[both].max() < 0.05

    def test_capsule_hull_vs_epa(self):
        from dxk_tpu.ops import narrowphase as NB
        from dxk_tpu.ops.gjk import support_capsule, support_hull
        from dxk_tpu.ops.narrowphase import _gjk_epa_point

        hv, hm, fn, fo, fm = self._hull()
        N = 256
        ks = jax.random.split(jax.random.PRNGKey(2), 6)
        hp = jnp.zeros((N, 3))
        hq = jax.random.uniform(ks[5], (N, 4), jnp.float32, -1, 1)
        hq = hq / jnp.linalg.norm(hq, axis=-1, keepdims=True)
        aa = jax.random.uniform(ks[0], (N, 3), jnp.float32, -1.2, 1.2)
        ab = aa + jax.random.uniform(ks[1], (N, 3), jnp.float32, -1.0, 1.0)
        ar = jax.random.uniform(ks[2], (N,), jnp.float32, 0.1, 0.4)
        bcast = lambda x: jnp.broadcast_to(x, (N,) + x.shape)

        pts, dps, nrm, cnt, hit = jax.vmap(NB.capsule_hull_contact)(
            aa, ab, ar, hp, hq, bcast(hv), bcast(hm), bcast(fn), bcast(fo),
            bcast(fm))
        rpts, rdps, rnrm, rcnt, rhit = jax.vmap(
            lambda a, b2, r, p, q, v, m: _gjk_epa_point(
                support_capsule, support_hull, (a, b2, r), (p, q, v, m)))(
            aa, ab, ar, hp, hq, bcast(hv), bcast(hm))

        hit = np.asarray(hit)
        assert (hit == np.asarray(rhit)).mean() >= 0.99
        both = hit & np.asarray(rhit)
        nd = (np.asarray(nrm) * np.asarray(rnrm)).sum(-1)
        dd = np.abs(np.asarray(dps)[:, 0] - np.asarray(rdps)[:, 0])
        # exact tier: depth < radius means the segment core is OUTSIDE the
        # hull, where distance-GJK is provably exact (EPA is the
        # approximation there, tolerance = its 0.01 convergence threshold)
        exact = both & (np.asarray(rdps)[:, 0] < np.asarray(ar) * 0.9)
        assert ((nd > 0.9) | (dd < 0.01))[exact].mean() > 0.95
        assert np.percentile(dd[exact], 95) < 0.02
        # deep tier (segment inside the hull): sampled face-MTV fallback,
        # bounded but approximate
        deep = both & ~exact
        if deep.any():
            assert dd[deep].max() < 0.25


def test_hull_on_huge_ground_box_stable_scan():
    """Regression (round 3): with a huge ground slab (20x1x20) against a
    small hull, the 20-iteration-capped EPA can return a wildly wrong MTV
    (measured: depth 20.4 along +x for a true 5e-4 along +y), whose
    Baumgarte bias launched the hull at 100+ m/s in scan mode. The
    face-axis SAT sanity guard in box_hull_contact must keep the resting
    cube pinned."""
    cube = np.array([[x, y, z] for x in (-0.4, 0.4) for y in (-0.4, 0.4)
                     for z in (-0.4, 0.4)], np.float32)
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (20, 1, 20), friction=1.0)
    hid = b.add_hull_geometry_from_mesh(cube)
    h = b.add_body(position=(0, 0.45, 0))
    b.add_hull_collider(h, hid, friction=1.0)
    # a capsule dropped onto the cube perturbs it (the trajectory that
    # exposed the EPA divergence)
    c2 = b.add_body(position=(0.0, 2.0, -0.05))
    b.add_capsule_collider(c2, (-0.25, 0, 0), (0.25, 0, 0), 0.18)
    scene = b.finalize()
    st = scene.initial_state()
    step = jax.jit(lambda s: physics_step(
        scene, s, PhysicsSettings(solver_mode="scan"), 1 / 120)[0])
    for _ in range(480):
        st = step(st)
        assert float(jnp.abs(st.lin_vel).max()) < 20.0
    p = np.asarray(st.pos)
    assert np.isfinite(p).all()
    assert abs(p[1, 1] - 0.4) < 0.05          # cube still resting


def test_obj_loader_feeds_hull_geometry():
    """asset/obj.cpp slice: v/f records -> fromMesh hull baking."""
    import io
    from dxk_tpu.scene.obj_loader import load_obj
    from dxk_tpu.scene import SceneBuilder

    obj = io.StringIO("""
# unit cube
v -1 -1 -1
v  1 -1 -1
v  1  1 -1
v -1  1 -1
v -1 -1  1
v  1 -1  1
v  1  1  1
v -1  1  1
f 1 2 3 4
f 5 8 7 6
f 1/1 5/2/3 6//4 2
f 2 6 7 3
f 3 7 8 4
f -8 -5 -1 -4
""")
    v, f = load_obj(obj)
    assert v.shape == (8, 3)
    assert f.shape == (12, 3)                     # 6 quads fan -> 12 tris
    assert f.min() >= 0 and f.max() == 7          # incl. negative indices

    b = SceneBuilder()
    hid = b.add_hull_geometry_from_mesh(v)
    body = b.add_body(position=(0, 3.0, 0))
    b.add_hull_collider(body, hid)
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (10, 1, 10))
    scene = b.finalize()
    assert scene.hulls.vertices.shape[1] >= 8


def test_ply_dump_load_roundtrip():
    """asset/ply.cpp slice: testDumpToPLY record layout + re-load."""
    import io
    import numpy as np
    from dxk_tpu.scene.ply import dump_ply, load_ply

    v = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                  for z in (-1, 1)], np.float32)
    f = np.array([[0, 1, 2], [1, 3, 2], [4, 6, 5], [5, 6, 7],
                  [0, 4, 1], [1, 4, 5], [2, 3, 6], [3, 7, 6],
                  [0, 2, 4], [2, 6, 4], [1, 5, 3], [3, 5, 7]], np.int32)
    n = v / np.linalg.norm(v, axis=1, keepdims=True)
    buf = io.BytesIO()
    dump_ply(buf, v, f, normals=n, color=(10, 200, 30))
    raw = buf.getvalue()
    # reference layout: per-vertex 3f pos + 3f normal + 4B rgba, per-face
    # uchar 3 + 3x int32 (ply.cpp:66-85)
    body = raw[raw.index(b"end_header") + len(b"end_header\n"):]
    assert len(body) == 8 * (12 + 12 + 4) + 12 * (1 + 12)
    assert body[24:28] == bytes([10, 200, 30, 255])

    v2, f2 = load_ply(io.BytesIO(raw))
    assert np.allclose(v2, v) and np.array_equal(f2, f)


def test_ply_ascii_feeds_hull_geometry():
    import io
    import numpy as np
    from dxk_tpu.scene.ply import load_ply
    from dxk_tpu.scene import SceneBuilder

    ply = io.BytesIO(b"""ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
0 1 0
0 0 1
4 0 1 2 3
""")
    v, f = load_ply(ply)
    assert v.shape == (4, 3)
    assert f.shape == (2, 3)                       # quad fan -> 2 tris
    b = SceneBuilder()
    hid = b.add_hull_geometry_from_mesh(v)
    body = b.add_body(position=(0, 2.0, 0))
    b.add_hull_collider(body, hid)
    scene = b.finalize()
    assert scene.hulls.vertex_mask[hid].sum() == 4
