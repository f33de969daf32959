"""Narrowphase contact generation — branchless TPU versions of the
reference's per-type-pair `intersection()` routines
(/root/reference/src/physics/collision_narrow.cpp; recipe table in
SURVEY.md §2.1b).

Each `*_contact` function handles ONE world-space pair and returns a fixed
4-slot manifold `(points (4,3), depths (4,), normal (3,), count (), hit ())`;
the dispatcher in `physics.py` vmaps them over each static type-pair bucket.
Normals point from collider A to collider B. All branches are evaluated and
mask-selected; separating pairs return hit=False and are masked out of the
solver.
"""

from __future__ import annotations

import jax.numpy as jnp

from dxk_tpu.core.maths import (cross, dot, get_tangents, length, lerp,
                                normalize, quat_conj, quat_inv_rotate,
                                quat_rotate, quat_to_mat3, squared_length)
from dxk_tpu.ops.geometry import (closest_point_point_aabb,
                                  closest_point_point_segment,
                                  closest_point_segment_segment)
from dxk_tpu.ops.manifold import (POLY_SLOTS, make_plane, project_and_filter,
                                  reduce_manifold, signed_distance,
                                  sutherland_hodgman)

EPSILON = 1e-6  # math.h:22
# Minimum RELATIVE improvement for a later SAT candidate to replace the
# current winner in box_box_contact (and its component-major Pallas port):
# a candidate must beat the incumbent by SAT_TIE_TOL * (|best| + |cand|).
# Ties at this scale are physically equivalent (contact sets differ only
# by a depth-sized shift along the normal); breaking them
# deterministically keeps the AoS and CM paths in exact agreement, and the
# relative form stays scale-invariant (mm-sized geometry included).
SAT_TIE_TOL = 1e-4

_UP = jnp.array([0.0, 1.0, 0.0], jnp.float32)


def _empty_manifold(dtype=jnp.float32):
    return (jnp.zeros((4, 3), dtype), jnp.zeros((4,), dtype),
            jnp.array([0.0, 1.0, 0.0], dtype), jnp.int32(0), jnp.bool_(False))


def _one_point(point, depth, normal, hit):
    pts = jnp.zeros((4, 3), point.dtype).at[0].set(point)
    dps = jnp.zeros((4,), point.dtype).at[0].set(depth)
    return pts, dps, normal, jnp.where(hit, 1, 0).astype(jnp.int32), hit


# ---------------------------------------------------------------------------
# sphere family (collision_narrow.cpp:374-495)


def sphere_sphere_contact(c1, r1, c2, r2):
    n = c2 - c1
    radius_sum = r1 + r2
    sq = squared_length(n)
    hit = sq <= radius_sum * radius_sum
    degenerate = sq == 0.0
    dist = jnp.sqrt(jnp.maximum(sq, 0.0))
    normal = jnp.where(degenerate, _UP, n / jnp.maximum(dist, 1e-30))
    depth = radius_sum - jnp.where(degenerate, 0.0, dist)
    point = 0.5 * (c1 + r1 * normal + c2 - r2 * normal)
    return _one_point(point, depth, normal, hit)


def sphere_capsule_contact(sc, sr, ca, cb, cr):
    closest = closest_point_point_segment(sc, ca, cb)
    return sphere_sphere_contact(sc, sr, closest, cr)


def sphere_cylinder_contact(sc, sr, ca, cb, cr):
    """collision_narrow.cpp:408-450: lateral body behaves like a sphere on
    the axis; beyond the caps, closest point on the cap disk rim/face."""
    ab = cb - ca
    t = dot(sc - ca, ab) / jnp.maximum(squared_length(ab), 1e-12)
    inside = (t >= 0.0) & (t <= 1.0)

    # lateral case
    lat = sphere_sphere_contact(sc, sr, lerp(ca, cb, t[..., None]), cr)

    # cap case
    p = jnp.where(t <= 0.0, ca, cb)
    up = jnp.where(t <= 0.0, -ab, ab)
    proj = cross(cross(up, sc - p), up)
    proj = proj / jnp.maximum(length(proj), 1e-30)
    end_a = p + proj * cr
    end_b = p - proj * cr
    closest = closest_point_point_segment(sc, end_a, end_b)
    nvec = closest - sc
    sq = squared_length(nvec)
    cap_hit = sq <= sr * sr
    degenerate = sq == 0.0
    dist = jnp.sqrt(jnp.maximum(sq, 0.0))
    normal = jnp.where(degenerate, -normalize(up), nvec / jnp.maximum(dist, 1e-30))
    depth = sr - jnp.where(degenerate, 0.0, dist)
    point = closest + 0.5 * depth * nvec
    cap = _one_point(point, depth, normal, cap_hit)

    return tuple(jnp.where(inside, l, c) for l, c in zip(lat, cap))


def sphere_box_contact(sc, sr, bc, bh, bq):
    """Sphere vs OBB via rotate-to-box-local sphere-vs-AABB
    (collision_narrow.cpp:451-494)."""
    sc_l = quat_inv_rotate(bq, sc - bc)
    p = closest_point_point_aabb(sc_l, -bh, bh)
    n = p - sc_l
    sq = squared_length(n)
    hit = sq <= sr * sr
    dist = jnp.sqrt(jnp.maximum(sq, 0.0))
    n = jnp.where(sq > 0.0, n / jnp.maximum(dist, 1e-30), _UP)
    depth = sr - jnp.where(sq > 0.0, dist, 0.0)
    point_l = 0.5 * (p + sc_l + n * sr)
    normal = quat_rotate(bq, n)
    point = quat_rotate(bq, point_l) + bc
    return _one_point(point, depth, normal, hit)


# ---------------------------------------------------------------------------
# capsule family (collision_narrow.cpp:523-704)


def capsule_capsule_contact(aa, ab, ar, ba, bb, br):
    a_dir = ab - aa
    a_len = length(a_dir)
    a_dir = a_dir / jnp.maximum(a_len, 1e-30)
    b_dir = normalize(bb - ba)
    par = dot(a_dir, b_dir)
    is_parallel = jnp.abs(par) > 0.99

    # ---- parallel: 2-contact manifold by 1D interval overlap (523-604)
    p_ba = jnp.where(par < 0.0, bb, ba)
    p_bb = jnp.where(par < 0.0, ba, bb)
    b0 = dot(a_dir, p_ba - aa)
    b1 = dot(a_dir, p_bb - aa)
    left = jnp.maximum(0.0, b0)
    right = jnp.minimum(a_len, b1)
    overlaps = right >= left

    # interval overlap manifold
    ca0 = aa + left[..., None] * a_dir
    ca1 = aa + right[..., None] * a_dir
    cb0 = closest_point_point_segment(ca0, p_ba, p_bb)
    cb1 = cb0 + (right - left)[..., None] * a_dir
    nvec = cb0 - ca0
    d = length(nvec)
    degen = d < EPSILON
    normal = jnp.where(degen, _UP, nvec / jnp.maximum(d, 1e-30))
    pen = (ar + br) - jnp.where(degen, 0.0, d)
    two_hit = overlaps & (pen >= 0.0)
    pts2 = jnp.zeros((4, 3), aa.dtype).at[0].set((ca0 + cb0) * 0.5).at[1].set((ca1 + cb1) * 0.5)
    dps2 = jnp.zeros((4,), aa.dtype).at[0].set(pen).at[1].set(pen)
    two = (pts2, dps2, normal, jnp.where(two_hit, 2, 0).astype(jnp.int32), two_hit)

    # disjoint intervals -> end-sphere vs end-sphere (560-568)
    use_a0 = 0.0 > b1  # a's interval entirely right of b's
    s_a = jnp.where(use_a0, aa, ab)
    s_b = jnp.where(use_a0, p_bb, p_ba)
    ends = sphere_sphere_contact(s_a, ar, s_b, br)
    par_res = tuple(jnp.where(overlaps, t, e) for t, e in zip(two, ends))

    # ---- non-parallel: closest points -> sphere-sphere (606-611)
    c1, c2, _ = closest_point_segment_segment(aa, ab, ba, bb)
    gen = sphere_sphere_contact(c1, ar, c2, br)

    return tuple(jnp.where(is_parallel, p, g) for p, g in zip(par_res, gen))


def capsule_cylinder_contact(aa, ab, ar, ba, bb, br):
    """collision_narrow.cpp:614-704: parallel -> 2-point manifold along the
    overlap; otherwise segment-segment closest point -> sphere-cylinder."""
    a_dir = ab - aa
    a_len = length(a_dir)
    a_dir = a_dir / jnp.maximum(a_len, 1e-30)
    b_dir = normalize(bb - ba)
    par = dot(a_dir, b_dir)
    is_parallel = jnp.abs(par) > 0.99

    p_ba = jnp.where(par < 0.0, bb, ba)
    p_bb = jnp.where(par < 0.0, ba, bb)
    b0 = dot(a_dir, p_ba - aa)
    b1 = dot(a_dir, p_bb - aa)
    left = jnp.maximum(0.0, b0)
    right = jnp.minimum(a_len, b1)
    overlaps = right >= left

    ca0 = aa + left[..., None] * a_dir
    ca1 = aa + right[..., None] * a_dir
    cb0 = closest_point_point_segment(ca0, p_ba, p_bb)
    cb1 = cb0 + (right - left)[..., None] * a_dir
    nvec = cb0 - ca0
    d = length(nvec)
    degen = d < EPSILON
    normal = jnp.where(degen, _UP, nvec / jnp.maximum(d, 1e-30))
    pen = (ar + br) - jnp.where(degen, 0.0, d)
    two_hit = overlaps & (pen >= 0.0)
    pts2 = jnp.zeros((4, 3), aa.dtype).at[0].set((ca0 + cb0) * 0.5).at[1].set((ca1 + cb1) * 0.5)
    dps2 = jnp.zeros((4,), aa.dtype).at[0].set(pen).at[1].set(pen)
    two = (pts2, dps2, normal, jnp.where(two_hit, 2, 0).astype(jnp.int32), two_hit)

    # parallel but no axial overlap: capsule end sphere vs cylinder
    use_a0 = 0.0 > b1
    s_end = jnp.where(use_a0, aa, ab)
    ends = sphere_cylinder_contact(s_end, ar, ba, bb, br)
    par_res = tuple(jnp.where(overlaps, t, e) for t, e in zip(two, ends))

    c1, _, _ = closest_point_segment_segment(aa, ab, ba, bb)
    gen = sphere_cylinder_contact(c1, ar, ba, bb, br)
    return tuple(jnp.where(is_parallel, p, g) for p, g in zip(par_res, gen))


# ---------------------------------------------------------------------------
# box-box: 15-axis SAT + reference-face clipping / edge-edge closest point
# (collision_narrow.cpp:1179-1527)


def _one_hot3(i, dtype):
    return (jnp.arange(3) == i).astype(dtype)


def _aabb_clip_planes_local(h, n_local):
    """getAABBClippingPlanes (collision_narrow.cpp:225-254): 4 side planes of
    the face most aligned with n_local, in box-local space.
    Returns (points (4,3), normals (4,3))."""
    p = jnp.abs(n_local)
    m = jnp.argmax(p)
    a0 = (m + 1) % 3
    a1 = (m + 2) % 3
    e0 = _one_hot3(a0, h.dtype)
    e1 = _one_hot3(a1, h.dtype)
    normals = jnp.stack([e0, e1, -e0, -e1])
    points = jnp.stack([-h, -h, h, h])
    return points, normals


def _aabb_incident_vertices_local(h, n_local):
    """getAABBIncidentVertices (collision_narrow.cpp:257-289): the 4 corners
    of the face pointing *against* n_local, box-local."""
    p = jnp.abs(n_local)
    m = jnp.argmax(p)
    a0 = (m + 1) % 3
    a1 = (m + 2) % 3
    s = jnp.where(n_local[m] < 0.0, 1.0, -1.0)
    em = _one_hot3(m, h.dtype)
    e0 = _one_hot3(a0, h.dtype)
    e1 = _one_hot3(a1, h.dtype)
    d = h[m] * s
    r0, r1 = h[a0], h[a1]
    base = em * d
    return jnp.stack([
        base - e0 * r0 - e1 * r1,
        base + e0 * r0 - e1 * r1,
        base + e0 * r0 + e1 * r1,
        base - e0 * r0 + e1 * r1,
    ])


def _aabb_incident_edge_local(h, n_local):
    """getAABBIncidentEdge (collision_narrow.cpp:301-336)."""
    p = jnp.abs(n_local)
    out_a = h
    b_xy = jnp.array([1.0, 1.0, -1.0], h.dtype) * h  # flip z
    b_xz = jnp.array([1.0, -1.0, 1.0], h.dtype) * h  # flip y
    b_yz = jnp.array([-1.0, 1.0, 1.0], h.dtype) * h  # flip x
    out_b = jnp.where(p[0] > p[1],
                      jnp.where(p[1] > p[2], b_xy, b_xz),
                      jnp.where(p[0] > p[2], b_xy, b_yz))
    s = jnp.where(n_local < 0.0, -1.0, 1.0)
    return out_a * s, out_b * s


def _obb_support(c, h, q, n):
    """Support point of an OBB along world direction n."""
    nl = quat_inv_rotate(q, n)
    return c + quat_rotate(q, jnp.where(nl >= 0.0, h, -h))


def box_box_contact(ca, ha, qa, cb, hb, qb):
    dtype = ca.dtype
    Ra = quat_to_mat3(qa)   # columns = world axes of A
    Rb = quat_to_mat3(qb)
    R = Ra.T @ Rb           # r[i][j] = dot(axisA_i, axisB_j)
    tw = cb - ca
    t = quat_inv_rotate(qa, tw)

    absR = jnp.abs(R) + EPSILON
    parallel = jnp.any(absR >= 0.99)

    # --- face tests (6)
    pen_face_a = ha + absR @ hb - jnp.abs(t)                    # (3,)
    pen_face_b = absR.T @ ha + hb - jnp.abs(R.T @ t)            # (3,)

    # --- edge tests (9): axis = e_i x R[:, j] in A-local
    eye = jnp.eye(3, dtype=dtype)

    def edge_case(i, j):
        axis = cross(eye[i], R[:, j])
        k1, k2 = (i + 1) % 3, (i + 2) % 3
        # ra uses absR entries exactly like the reference's per-case formulas
        ra = ha[k1] * absR[k2, j] + ha[k2] * absR[k1, j]
        l1, l2 = (j + 1) % 3, (j + 2) % 3
        rb = hb[l1] * absR[i, l2] + hb[l2] * absR[i, l1]
        dist = jnp.abs(dot(t, axis))
        pen_raw = ra + rb - dist
        inv_len = 1.0 / jnp.maximum(length(axis), 1e-30)
        return pen_raw, pen_raw * inv_len, axis * inv_len

    edge_raw, edge_pen, edge_axes = [], [], []
    for i in range(3):
        for j in range(3):
            praw, p, ax = edge_case(i, j)
            edge_raw.append(praw)
            edge_pen.append(p)
            edge_axes.append(ax)
    edge_raw = jnp.stack(edge_raw)
    edge_pen = jnp.stack(edge_pen)
    edge_axes = jnp.stack(edge_axes)

    separated = (jnp.any(pen_face_a < 0.0) | jnp.any(pen_face_b < 0.0)
                 | (~parallel & jnp.any(edge_raw < 0.0)))
    hit = ~separated

    big = jnp.float32(3.4e38)
    scores = jnp.concatenate([
        pen_face_a, pen_face_b,
        jnp.where(parallel, big, edge_pen),
    ])
    # Deterministic tie-break: the reference's sequential `<` keeps the
    # earliest candidate on exact ties, but the +EPSILON terms make
    # face-A-vs-face-B penetrations differ only at arithmetic-noise level
    # in stacked/parallel configs — so a plain argmin is decided by
    # summation order and disagrees between this path and the
    # component-major Pallas port. Require a real improvement
    # (SAT_TIE_TOL) before switching to a later candidate; both paths
    # share the candidate order, so they pick the same winner.
    best = scores[0]
    winner = jnp.int32(0)
    for k in range(1, 15):
        margin = SAT_TIE_TOL * (jnp.abs(best) + jnp.abs(scores[k])) + 1e-9
        upd = scores[k] < best - margin
        best = jnp.where(upd, scores[k], best)
        winner = jnp.where(upd, k, winner)
    is_face_a = winner < 3
    is_face_b = (winner >= 3) & (winner < 6)
    is_edge = winner >= 6

    # normal in A-local space
    n_face_a = eye[jnp.minimum(winner, 2)]
    n_face_b = R[:, jnp.clip(winner - 3, 0, 2)]
    n_edge = edge_axes[jnp.clip(winner - 6, 0, 8)]
    n_local = jnp.where(is_face_a, n_face_a,
                        jnp.where(is_face_b, n_face_b, n_edge))
    normal = quat_rotate(qa, n_local)
    normal = jnp.where(dot(normal, tw) < 0.0, -normal, normal)

    # ---- face case: reference-face clipping (1438-1495)
    ref_c = jnp.where(is_face_b, cb, ca)
    ref_h = jnp.where(is_face_b, hb, ha)
    ref_q = jnp.where(is_face_b, qb, qa)
    inc_c = jnp.where(is_face_b, ca, cb)
    inc_h = jnp.where(is_face_b, ha, hb)
    inc_q = jnp.where(is_face_b, qa, qb)
    ref_n = jnp.where(is_face_b, -normal, normal)

    cp_pts_l, cp_nrm_l = _aabb_clip_planes_local(ref_h, quat_inv_rotate(ref_q, ref_n))
    inc_v_l = _aabb_incident_vertices_local(inc_h, quat_inv_rotate(inc_q, ref_n))
    cp_pts = quat_rotate(ref_q[None, :], cp_pts_l) + ref_c
    cp_nrm = quat_rotate(ref_q[None, :], cp_nrm_l)
    inc_v = quat_rotate(inc_q[None, :], inc_v_l) + inc_c

    ref_plane = make_plane(_obb_support(ref_c, ref_h, ref_q, ref_n), ref_n)
    clip_planes = jnp.concatenate([cp_nrm, -jnp.sum(cp_nrm * cp_pts, axis=-1,
                                                    keepdims=True)], axis=-1)

    poly_v = jnp.zeros((POLY_SLOTS, 3), dtype).at[:4].set(inc_v)
    poly_d = jnp.zeros((POLY_SLOTS,), dtype).at[:4].set(
        -signed_distance(inc_v, ref_plane))
    poly_v, poly_d, n_pts = sutherland_hodgman(poly_v, poly_d, jnp.int32(4),
                                               clip_planes)
    poly_v, poly_d, n_pts = project_and_filter(poly_v, poly_d, n_pts, ref_plane)
    face_pts, face_dps, face_count = reduce_manifold(poly_v, poly_d, n_pts, normal)
    face_hit = n_pts > 0

    # ---- edge case: closest point between the two incident edges (1496-1518)
    a0l, a1l = _aabb_incident_edge_local(ha, quat_inv_rotate(qa, normal))
    b0l, b1l = _aabb_incident_edge_local(hb, quat_inv_rotate(qb, -normal))
    a0 = quat_rotate(qa, a0l) + ca
    a1 = quat_rotate(qa, a1l) + ca
    b0 = quat_rotate(qb, b0l) + cb
    b1 = quat_rotate(qb, b1l) + cb
    pa, pb, sq = closest_point_segment_segment(a0, a1, b0, b1)
    edge_pts = jnp.zeros((4, 3), dtype).at[0].set((pa + pb) * 0.5)
    edge_dps = jnp.zeros((4,), dtype).at[0].set(jnp.sqrt(jnp.maximum(sq, 0.0)))

    pts = jnp.where(is_edge, edge_pts, face_pts)
    dps = jnp.where(is_edge, edge_dps, face_dps)
    count = jnp.where(is_edge, 1, face_count).astype(jnp.int32)
    hit = hit & jnp.where(is_edge, True, face_hit)
    count = jnp.where(hit, count, 0)
    return pts, dps, normal, count, hit


# ---------------------------------------------------------------------------
# boolean overlap tests for triggers / force fields (overlapCheck,
# collision_narrow.cpp:1593-1689). Round-1: reuse the contact tests.


def shapes_overlap(manifold):
    return manifold[4]


# ---------------------------------------------------------------------------
# GJK/EPA-based pairs (capsule/cylinder vs box, cylinder-cylinder, hulls)
# (collision_narrow.cpp:705-1071, 1150-1584)

from dxk_tpu.ops.gjk import (gjk_intersection, support_box, support_capsule,  # noqa: E402
                             support_cylinder, support_hull, support_sphere)
from dxk_tpu.ops.epa import epa  # noqa: E402

# Iteration budgets: primitive pairs converge fast (the reference caps EPA at
# 20 for everything, collision_epa.h:97, but smooth-primitive-vs-box needs
# ~6-8 expansions); hulls keep the full budget. These are static costs on
# TPU — the scan always runs its full length — so they directly set the
# narrowphase price.
PRIM_GJK_ITERS = 24
PRIM_EPA_ITERS = 10

_IDQ = jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)


def _gjk_epa_point(sup_a, sup_b, pa, pb, max_iterations=20):
    """Generic 1-contact GJK+EPA pair (e.g. sphere-hull,
    collision_narrow.cpp:496-520). Like the reference, EPA's best
    approximation is used even if it did not fully converge."""
    hit, simplex = gjk_intersection(sup_a, sup_b, pa, pb)
    point, normal, depth = epa(sup_a, sup_b, pa, pb, simplex,
                               max_iterations=max_iterations)
    return _one_point(point, depth, normal, hit)


def _aabb_face_clip_segment(seg_a, seg_b, radius, bh, normal, base):
    """Shared capsule/cylinder vs box-face manifold enrichment
    (collision_narrow.cpp:731-765, 979-1014): clip the shifted axis segment
    against the side planes of the box face opposing `normal`. All in
    box-local space with the box centered at origin. Returns
    (points (4,3), depths (4,), count ())."""
    aabb_normal = -normal
    # reference plane: corner components selected by aabb_normal sign
    ref_point = jnp.where(aabb_normal < 0.0, -bh, bh)
    ref_plane = make_plane(ref_point, aabb_normal)

    pa = seg_a + normal * radius
    pb = seg_b + normal * radius
    poly_v = jnp.zeros((POLY_SLOTS, 3), seg_a.dtype).at[0].set(pa).at[1].set(pb)
    poly_d = jnp.zeros((POLY_SLOTS,), seg_a.dtype)
    poly_d = poly_d.at[0].set(-signed_distance(pa, ref_plane))
    poly_d = poly_d.at[1].set(-signed_distance(pb, ref_plane))

    from dxk_tpu.ops.narrowphase import _aabb_clip_planes_local
    cp_pts, cp_nrm = _aabb_clip_planes_local(bh, aabb_normal)
    planes = jnp.concatenate(
        [cp_nrm, -jnp.sum(cp_nrm * cp_pts, axis=-1, keepdims=True)], axis=-1)

    v, dps, n = sutherland_hodgman(poly_v, poly_d, jnp.int32(2), planes)
    v, dps, n = project_and_filter(v, dps, n, ref_plane)
    pts, dps, count = reduce_manifold(v, dps, n, base)
    return pts, dps, count


def _segment_box_closest(la, lb, bh, iters=8):
    """Closest point pair between segment [la, lb] and the solid AABB
    [-bh, bh] by alternating projection between the two convex sets
    (converges monotonically). Returns (s on segment, q in box)."""
    s = 0.5 * (la + lb)
    for _ in range(iters):
        q = jnp.clip(s, -bh, bh)
        s = closest_point_point_segment(q, la, lb)
    q = jnp.clip(s, -bh, bh)
    return s, q


def capsule_box_contact(aa, ab, ar, bc, bh, bq):
    """Capsule vs box (collision_narrow.cpp:705-790 behavior): contact
    normal/point for the closest feature, then if the capsule lies parallel
    to a box face, a 2-point manifold by clipping the capsule axis against
    the face side planes. Done in box-local space (OBB path, 771-790).

    TPU redesign: the reference finds the normal with GJK+EPA; here an
    analytic segment-vs-solid-box closest-point (alternating projection)
    plus a min-translation deep-penetration fallback gives the same
    normal/point to within EPA's own 0.01 tolerance at a tiny fraction of
    the cost (GJK+EPA dominated the ragdoll env step)."""
    la = quat_inv_rotate(bq, aa - bc)
    lb = quat_inv_rotate(bq, ab - bc)

    s, q = _segment_box_closest(la, lb, bh)
    delta = q - s
    d2 = squared_length(delta)
    inside = d2 <= 1e-12          # segment touches/penetrates the box

    # shallow case: sphere-at-closest-point vs surface point
    dist = jnp.sqrt(jnp.maximum(d2, 1e-30))
    n_shallow = delta / dist[..., None]
    depth_shallow = ar - dist
    point_shallow = 0.5 * (s + n_shallow * ar + q)

    # deep case: min-translation face of the deeper-inside segment point
    def face_pen(p):
        return bh - jnp.abs(p)    # per-axis distance to the nearest face
    pen_a = jnp.min(face_pen(jnp.clip(la, -bh, bh)), axis=-1)
    pen_b = jnp.min(face_pen(jnp.clip(lb, -bh, bh)), axis=-1)
    in_a = jnp.all(jnp.abs(la) <= bh, axis=-1)
    in_b = jnp.all(jnp.abs(lb) <= bh, axis=-1)
    # prefer the deeper inside endpoint; fall back to s
    p_deep = jnp.where((in_a & (~in_b | (pen_a >= pen_b)))[..., None], la,
                       jnp.where(in_b[..., None], lb, s))
    fp = face_pen(p_deep)
    k = jnp.argmin(fp)
    e_k = (jnp.arange(3) == k).astype(la.dtype)
    sign = jnp.where(p_deep[k] >= 0.0, 1.0, -1.0)
    n_deep = -sign * e_k
    depth_deep = ar + fp[k]
    point_deep = p_deep

    normal = jnp.where(inside[..., None], n_deep, n_shallow)
    depth = jnp.where(inside, depth_deep, depth_shallow)
    point = jnp.where(inside[..., None], point_deep, point_shallow)
    hit = inside | (depth_shallow >= 0.0)

    # parallel-to-face manifold enrichment (705-765)
    is_face = jnp.any(jnp.abs(normal) > 0.99)
    axis = normalize(lb - la)
    parallel = jnp.abs(dot(normal, axis)) < 0.01
    enrich = is_face & parallel

    e_pts, e_dps, e_count = _aabb_face_clip_segment(la, lb, ar, bh, normal, normal)
    use = enrich & (e_count > 0)

    pts1, dps1, nrm1, cnt1, _ = _one_point(point, depth, normal, hit)
    pts = jnp.where(use, e_pts, pts1)
    dps = jnp.where(use, e_dps, dps1)
    cnt = jnp.where(use, e_count, cnt1)

    # back to world
    pts = quat_rotate(bq[None, :], pts) + bc
    nrm = quat_rotate(bq, normal)
    cnt = jnp.where(hit, cnt, 0).astype(jnp.int32)
    return pts, dps, nrm, cnt, hit


def _aabb_face_clip_interval(la, lb, radius, bh, normal):
    """Parameter-interval clip of the radius-shifted axis segment against
    the side planes of the box face opposing `normal` (box-local, AABB at
    origin). AoS twin of cm_narrowphase._face_clip_segment_cm — same
    construction so the fused kernel and the XLA path agree exactly.
    Returns (e0p, e1p, dp_e0, dp_e1, m_e0, m_e1, clip_ok): face-projected
    endpoints, depths, live masks, interval validity."""
    absn = jnp.abs(normal)
    fk0 = absn[0] > 0.99
    fk1 = ~fk0 & (absn[1] > 0.99)
    pa = la + normal * radius
    pb = lb + normal * radius

    def sel(i0, i1, i2, v):
        return jnp.where(fk0, v[i0], jnp.where(fk1, v[i1], v[i2]))

    pa_u = sel(1, 0, 0, pa)
    pa_v = sel(2, 2, 1, pa)
    d_u = sel(1, 0, 0, pb) - pa_u
    d_v = sel(2, 2, 1, pb) - pa_v
    h_u = sel(1, 0, 0, bh)
    h_v = sel(2, 2, 1, bh)

    t0 = jnp.zeros_like(pa_u)
    t1 = jnp.ones_like(pa_u)

    def clip(t0, t1, p, d, h):
        big = 1e30
        for sign in (1.0, -1.0):
            num = sign * h - p
            tcross = num / jnp.where(d == 0.0, big, d)
            dpos = (d * sign) > 0.0
            viol = (sign * p) > h
            t1 = jnp.where(dpos, jnp.minimum(t1, tcross), t1)
            t0 = jnp.where(~dpos & (d != 0.0), jnp.maximum(t0, tcross), t0)
            t1 = jnp.where((d == 0.0) & viol, -1.0, t1)
        return t0, t1

    t0, t1 = clip(t0, t1, pa_u, d_u, h_u)
    t0, t1 = clip(t0, t1, pa_v, d_v, h_v)
    clip_ok = t1 >= t0

    seg_d = pb - pa
    e0 = pa + seg_d * t0
    e1 = pa + seg_d * t1
    face_h = sel(0, 1, 2, bh)
    n_k = sel(0, 1, 2, normal)
    p0_k = sel(0, 1, 2, e0)
    p1_k = sel(0, 1, 2, e1)
    dp_e0 = n_k * p0_k + face_h
    dp_e1 = n_k * p1_k + face_h
    ref_k = -n_k * face_h

    def project(p):
        mask0 = jnp.array([1.0, 0.0, 0.0], p.dtype)
        mask1 = jnp.array([0.0, 1.0, 0.0], p.dtype)
        mask2 = jnp.array([0.0, 0.0, 1.0], p.dtype)
        m = jnp.where(fk0, mask0, jnp.where(fk1, mask1, mask2))
        return p * (1.0 - m) + ref_k * m

    return (project(e0), project(e1), dp_e0, dp_e1,
            dp_e0 >= 0.0, dp_e1 >= 0.0, clip_ok)


def _snap_sign(x):
    """sign(x) with fp dust snapped to 0: sub-1e-6 components of a support
    direction are numerical noise (e.g. dot(u, u x e) on an edge-cross SAT
    winner), and their raw sign flips with compilation/fusion choices —
    the witness point must not jump a whole cap/face over that."""
    return jnp.sign(jnp.where(jnp.abs(x) < 1e-6, 0.0, x))


def _cyl_support_local(c, u, hl, r, d):
    """Support point of cylinder (center c, unit axis u, half-length hl,
    radius r) along direction d, all box-local (collision_gjk.h cylinder
    support semantics, closed form). Degenerate axial/radial components
    resolve to the feature midpoint (snapped sign)."""
    cap = c + u * (hl * _snap_sign(dot(u, d)))[..., None]
    radial = d - dot(d, u)[..., None] * u
    rl = length(radial)
    rad = jnp.where(rl > EPSILON,
                    radial / jnp.maximum(rl, 1e-30)[..., None] * r, 0.0)
    return cap + rad


def cylinder_box_contact(aa, ab, ar, bc, bh, bq):
    """collision_narrow.cpp:953-1043 behavior: contact normal/point for the
    closest feature, then face-clip / cap-ring manifold enrichment. The
    reference's cap-face case is a single EPA contact with a stability TODO
    (1015-1018); here it gets a 4-point ring on the cap rim.

    TPU redesign (same rationale as capsule_box_contact): the reference
    finds normal/depth with GJK+EPA; here everything is closed-form —
      * boolean: the cylinder is contained in its capsule, so axis-box
        distance > r separates exactly; a perpendicular closest feature is
        the exact tube case; otherwise solid-cylinder-vs-box alternating
        projection decides;
      * tube contacts (closest feature on the lateral surface): exact
        capsule formula;
      * cap/deep contacts: SAT minimum-translation over the cylinder-box
        candidate axes {3 box faces, cylinder axis, 3 axis x box-edge
        crosses, the lateral closest-point direction} — validated against
        GJK+EPA to EPA's own tolerance (tests/test_gjk_epa.py)."""
    la = quat_inv_rotate(bq, aa - bc)
    lb = quat_inv_rotate(bq, ab - bc)

    axis_v = lb - la
    alen = length(axis_v)
    u = axis_v / jnp.maximum(alen, 1e-30)
    hl = 0.5 * alen
    cc = 0.5 * (la + lb)

    # ---- exact boolean ----------------------------------------------------
    s, q = _segment_box_closest(la, lb, bh)
    delta = q - s
    d2 = squared_length(delta)
    dist_axis = jnp.sqrt(jnp.maximum(d2, 1e-30))
    # threshold well above alternating-projection fp dust: with the axis
    # on/inside the box the closest-pair delta is noise, and a knife-edge
    # have_dir would let the AoS and CM paths pick different witness points
    dir_thr = jnp.maximum(1e-3 * ar, 1e-6)
    have_dir = d2 > dir_thr * dir_thr
    tube_case = have_dir & (jnp.abs(dot(delta, u)) <= 1e-4 * dist_axis)

    # solid-cylinder / box alternating projection (both projections are
    # closed-form; converges monotonically for convex sets — linear rate,
    # measured ~0.75/iter on grazing configs, hence the 32-iter budget)
    p = cc
    for _ in range(32):
        qq = jnp.clip(p, -bh, bh)
        w = qq - cc
        t = jnp.clip(dot(w, u), -hl, hl)
        rad = w - dot(w, u)[..., None] * u
        rl = length(rad)
        scale = jnp.minimum(1.0, ar / jnp.maximum(rl, 1e-30))
        p = cc + t[..., None] * u + rad * scale[..., None]
    qq = jnp.clip(p, -bh, bh)
    d_cb2 = squared_length(qq - p)
    touch = jnp.maximum(1e-3 * ar, 1e-5)
    cap_hit = d_cb2 <= touch * touch

    # ---- tube contact: exact (the capsule formula) -------------------------
    n_tube = jnp.where(have_dir[..., None], delta / dist_axis[..., None], _UP)
    depth_tube = ar - dist_axis
    point_tube = 0.5 * (s + n_tube * ar + q)

    # ---- cap/deep contact: SAT-MTV over the candidate axes -----------------
    def overlap(n):
        rb = jnp.sum(bh * jnp.abs(n), axis=-1)
        un = dot(u, n)
        rc = hl * jnp.abs(un) + ar * jnp.sqrt(jnp.maximum(1.0 - un * un, 0.0))
        return rb + rc - jnp.abs(dot(cc, n))

    _BIGF = 3.4e38
    best_ov = jnp.full_like(ar, _BIGF)
    best_n = _UP
    best_id = jnp.int32(-1)

    def consider(best_ov, best_n, best_id, n, valid, cid):
        # relative tie tolerance (SAT_TIE_TOL, see box_box_contact): a
        # later candidate must beat the incumbent by a scale-invariant
        # margin, so fp dust never flips the winner between the AoS and
        # CM compilations
        ov = jnp.where(valid, overlap(n), _BIGF)
        take = ov < best_ov - SAT_TIE_TOL * (jnp.abs(ov) + jnp.abs(best_ov))
        return (jnp.where(take, ov, best_ov), jnp.where(take, n, best_n),
                jnp.where(take, cid, best_id))

    eye = jnp.eye(3, dtype=la.dtype)
    for i in range(3):                                    # box faces
        best_ov, best_n, best_id = consider(
            best_ov, best_n, best_id, eye[i], jnp.bool_(True), i)
    best_ov, best_n, best_id = consider(                  # cylinder axis
        best_ov, best_n, best_id, u, alen > EPSILON, 3)
    for i in range(3):                                    # u x box edges
        wax = cross(u, eye[i])
        wl = length(wax)
        wn = wax / jnp.maximum(wl, 1e-30)[..., None]
        best_ov, best_n, best_id = consider(
            best_ov, best_n, best_id, wn, wl > 1e-6, 4 + i)
    best_ov, best_n, best_id = consider(                  # lateral closest
        best_ov, best_n, best_id, n_tube, have_dir, 7)

    sgn = jnp.where(dot(cc, best_n) >= 0.0, 1.0, -1.0)
    n_sat = -sgn[..., None] * best_n                      # points cyl -> box
    depth_sat = best_ov

    # witness point by winning feature (snapped signs: see _snap_sign)
    pa_face = _cyl_support_local(cc, u, hl, ar, n_sat)
    pt_face = pa_face - 0.5 * depth_sat[..., None] * n_sat
    pb_u = _snap_sign(-n_sat) * bh
    pt_u = pb_u + 0.5 * depth_sat[..., None] * n_sat
    pt_mid = 0.5 * (pa_face + pb_u)
    pt_lat = jnp.where(have_dir[..., None],
                       0.5 * (s + n_sat * ar + q), pt_mid)
    point_sat = jnp.where((best_id < 3)[..., None], pt_face,
                jnp.where((best_id == 3)[..., None], pt_u, pt_lat))

    # tube direction wins only when it is the smaller pushout (an
    # overhanging cylinder can touch a side wall while its cap's face
    # overlap is the true MTV — match EPA's global minimum)
    use_tube = tube_case & (depth_tube <= depth_sat)
    normal = jnp.where(use_tube[..., None], n_tube, n_sat)
    depth = jnp.where(use_tube, depth_tube, depth_sat)
    point = jnp.where(use_tube[..., None], point_tube, point_sat)

    # hit: capsule containment rejects (dist > r); a negative candidate
    # overlap is a separation certificate; otherwise the exact tube case
    # or the projection boolean decides
    hit = (dist_axis <= ar) & (depth_sat >= 0.0) & (tube_case | cap_hit)

    is_face = jnp.any(jnp.abs(normal) > 0.99)
    axis = normalize(lb - la)
    cos_angle = jnp.abs(dot(normal, axis))
    enrich = is_face & (cos_angle < 0.01)

    # parameter-interval clip of the shifted axis segment against the face
    # window (same construction as the fused kernel's cm recipe — exact
    # cross-mode agreement, and no Sutherland-Hodgman duplicate points)
    e0p, e1p, dp_e0, dp_e1, m_e0, m_e1, clip_ok = _aabb_face_clip_interval(
        la, lb, ar, bh, normal)
    use = enrich & clip_ok & (m_e0 | m_e1)

    pts1, dps1, nrm1, cnt1, _ = _one_point(point, depth, normal, hit)
    first = jnp.where(m_e0[..., None], e0p, e1p)
    e_pts = (jnp.zeros((4, 3), la.dtype).at[0].set(first).at[1].set(e1p))
    e_dps = (jnp.zeros((4,), la.dtype)
             .at[0].set(jnp.where(m_e0, dp_e0, dp_e1)).at[1].set(dp_e1))
    e_count = jnp.where(m_e0 & m_e1, 2, 1)
    pts = jnp.where(use, e_pts, pts1)
    dps = jnp.where(use, e_dps, dps1)
    cnt = jnp.where(use, e_count, cnt1)

    # cap flat on a box face: 4-point rim ring (one EPA point lets an
    # upright cylinder tip through the floor — reference TODO 1015-1018)
    cap_case = is_face & (cos_angle > 0.99)
    cap_c = jnp.where(dot(la, normal) > dot(lb, normal), la, lb)
    t1c, t2c = get_tangents(normal)
    rr = ar * 0.95
    ring = (jnp.zeros((4, 3), la.dtype)
            .at[0].set(cap_c + t1c * rr)
            .at[1].set(cap_c - t1c * rr)
            .at[2].set(cap_c + t2c * rr)
            .at[3].set(cap_c - t2c * rr))
    pts = jnp.where(cap_case, ring, pts)
    dps = jnp.where(cap_case, jnp.full((4,), 1.0, la.dtype) * depth, dps)
    cnt = jnp.where(cap_case, 4, cnt)

    pts = quat_rotate(bq[None, :], pts) + bc
    nrm = quat_rotate(bq, normal)
    cnt = jnp.where(hit, cnt, 0).astype(jnp.int32)
    return pts, dps, nrm, cnt, hit


def cylinder_cylinder_contact(aa, ab, ar, ba, bb, br):
    """collision_narrow.cpp:821-951: parallel -> cap-to-cap (1 contact) or
    tube-to-tube (2 contacts); otherwise GJK+EPA single contact."""
    a_dir = ab - aa
    a_len = length(a_dir)
    a_dir = a_dir / jnp.maximum(a_len, 1e-30)
    b_dir = normalize(bb - ba)
    par = dot(a_dir, b_dir)
    is_parallel = jnp.abs(par) > 0.99

    p_ba = jnp.where(par < 0.0, bb, ba)
    p_bb = jnp.where(par < 0.0, ba, bb)
    b0 = dot(a_dir, p_ba - aa)
    b1 = dot(a_dir, p_bb - aa)
    left = jnp.maximum(0.0, b0)
    right = jnp.minimum(a_len, b1)
    overlaps = right >= left

    ca0 = aa + left[..., None] * a_dir
    ca1 = aa + right[..., None] * a_dir
    cb0 = closest_point_point_segment(ca0, p_ba, p_bb)
    cb1 = cb0 + (right - left)[..., None] * a_dir
    nvec = cb0 - ca0
    d = length(nvec)
    pen = (ar + br) - d
    radial_hit = pen >= 0.0

    cap_pen = right - left
    cap_first = cap_pen < pen
    b_right = b0 > 0.0
    cap_normal = jnp.where(b_right, a_dir, -a_dir)
    # reference: point = a.positionB - capPenetration*0.5 (componentwise
    # subtraction of a scalar — a quirk; we subtract along the axis instead)
    cap_point = jnp.where(b_right, ab - 0.5 * cap_pen[..., None] * a_dir,
                          aa + 0.5 * cap_pen[..., None] * a_dir)

    degen = d < EPSILON
    t_normal = jnp.where(degen, _UP, nvec / jnp.maximum(d, 1e-30))

    # tube-to-tube 2-point manifold
    pts2 = jnp.zeros((4, 3), aa.dtype).at[0].set((ca0 + cb0) * 0.5).at[1].set((ca1 + cb1) * 0.5)
    dps2 = jnp.zeros((4,), aa.dtype).at[0].set(pen).at[1].set(pen)

    # cap-to-cap: 4-point ring on the inscribed circle of the cap-disk
    # intersection lens (the reference emits ONE point and leaves a
    # "TODO: Find stable contact manifold", collision_narrow.cpp:883 —
    # a single cap contact lets stacked cylinders tip through each other)
    lat = nvec - dot(nvec, a_dir)[..., None] * a_dir
    dl = length(lat)
    lat_dir = jnp.where(dl[..., None] > EPSILON,
                        lat / jnp.maximum(dl, 1e-30)[..., None],
                        get_tangents(a_dir)[0])
    # disk-intersection chord along the center line: [lo, hi] from A's
    # cap center; ring = circle on its midpoint (exact for concentric and
    # crossing disks; transversally conservative like the rim bias)
    lo = jnp.maximum(-ar, dl - br)
    hi = jnp.minimum(ar, dl + br)
    re = jnp.maximum(0.5 * (hi - lo), 0.0)
    c_off = 0.5 * (lo + hi)
    ring_c = cap_point + lat_dir * c_off[..., None]
    t1 = lat_dir
    t2 = cross(cap_normal, t1)
    pts1c = (jnp.zeros((4, 3), aa.dtype)
             .at[0].set(ring_c + t1 * re)
             .at[1].set(ring_c - t1 * re)
             .at[2].set(ring_c + t2 * re)
             .at[3].set(ring_c - t2 * re))
    dps1c = jnp.full((4,), 1.0, aa.dtype) * cap_pen
    ring_ok = re > EPSILON
    pts1c = jnp.where(ring_ok, pts1c,
                      jnp.zeros((4, 3), aa.dtype).at[0].set(cap_point))
    dps1c = jnp.where(ring_ok, dps1c,
                      jnp.zeros((4,), aa.dtype).at[0].set(cap_pen))
    cap_cnt = jnp.where(ring_ok, 4, 1)

    par_hit = overlaps & radial_hit
    p_pts = jnp.where(cap_first, pts1c, pts2)
    p_dps = jnp.where(cap_first, dps1c, dps2)
    p_nrm = jnp.where(cap_first, cap_normal, t_normal)
    p_cnt = jnp.where(cap_first, cap_cnt, 2)
    p_cnt = jnp.where(par_hit, p_cnt, 0)

    # non-parallel: analytic (round 3, replaces GJK+EPA — same design as
    # cylinder_box_contact: exact boolean via capsule containment +
    # solid-solid alternating projection, exact tube-tube contacts,
    # SAT-MTV candidates {axis_a, axis_b, axis cross, lateral closest} for
    # cap-involved/deep contacts; validated vs EPA in tests/test_gjk_epa.py)
    ca_c = 0.5 * (aa + ab)
    cb_c = 0.5 * (ba + bb)
    a_hl = 0.5 * a_len
    b_lenv = bb - ba
    b_len = length(b_lenv)
    b_hl = 0.5 * b_len
    rsum = ar + br

    c1, c2, dsq = closest_point_segment_segment(aa, ab, ba, bb)
    gdelta = c2 - c1
    gdist = jnp.sqrt(jnp.maximum(dsq, 1e-30))
    g_thr = jnp.maximum(1e-3 * jnp.maximum(ar, br), 1e-6)
    g_have = dsq > g_thr * g_thr
    # both closest features on the tubes: delta perpendicular to both axes
    perp = g_have & (jnp.abs(dot(gdelta, a_dir)) <= 1e-4 * gdist) \
        & (jnp.abs(dot(gdelta, b_dir)) <= 1e-4 * gdist)
    n_tt = jnp.where(g_have[..., None], gdelta / gdist[..., None], _UP)
    depth_tt = rsum - gdist
    point_tt = 0.5 * (c1 + n_tt * ar + c2 - n_tt * br)

    def _proj_cyl(x, c, uax, hl, r):
        w = x - c
        t = jnp.clip(dot(w, uax), -hl, hl)
        rad = w - dot(w, uax)[..., None] * uax
        rl = length(rad)
        scale = jnp.minimum(1.0, r / jnp.maximum(rl, 1e-30))
        return c + t[..., None] * uax + rad * scale[..., None]

    p = ca_c
    for _ in range(32):
        qq = _proj_cyl(p, cb_c, b_dir, b_hl, br)
        p = _proj_cyl(qq, ca_c, a_dir, a_hl, ar)
    qq = _proj_cyl(p, cb_c, b_dir, b_hl, br)
    d_cc2 = squared_length(qq - p)
    g_touch = jnp.maximum(1e-3 * jnp.maximum(ar, br), 1e-5)
    g_caphit = d_cc2 <= g_touch * g_touch

    def cyl_radius_on(n, uax, hl, r):
        un = dot(uax, n)
        return hl * jnp.abs(un) + r * jnp.sqrt(
            jnp.maximum(1.0 - un * un, 0.0))

    dc = cb_c - ca_c

    def g_overlap(n):
        return (cyl_radius_on(n, a_dir, a_hl, ar)
                + cyl_radius_on(n, b_dir, b_hl, br) - jnp.abs(dot(dc, n)))

    _BIGF = 3.4e38
    g_bo = jnp.full_like(ar, _BIGF)
    g_bn = _UP
    g_bi = jnp.int32(-1)

    def g_consider(bo, bn, bi, n, valid, cid):
        ov = jnp.where(valid, g_overlap(n), _BIGF)
        take = ov < bo - SAT_TIE_TOL * (jnp.abs(ov) + jnp.abs(bo))
        return (jnp.where(take, ov, bo), jnp.where(take, n, bn),
                jnp.where(take, cid, bi))

    g_bo, g_bn, g_bi = g_consider(g_bo, g_bn, g_bi, a_dir,
                                  a_len > EPSILON, 0)
    g_bo, g_bn, g_bi = g_consider(g_bo, g_bn, g_bi, b_dir,
                                  b_len > EPSILON, 1)
    xax = cross(a_dir, b_dir)
    xl = length(xax)
    g_bo, g_bn, g_bi = g_consider(
        g_bo, g_bn, g_bi, xax / jnp.maximum(xl, 1e-30)[..., None],
        xl > 1e-6, 2)
    g_bo, g_bn, g_bi = g_consider(g_bo, g_bn, g_bi, n_tt, g_have, 3)

    g_sgn = jnp.where(dot(dc, g_bn) >= 0.0, 1.0, -1.0)
    n_gsat = g_sgn[..., None] * g_bn                       # points A -> B
    depth_gsat = g_bo

    pb_sup = _cyl_support_local(cb_c, b_dir, b_hl, br, -n_gsat)  # B into A
    pa_sup = _cyl_support_local(ca_c, a_dir, a_hl, ar, n_gsat)   # A into B
    pt_capa = pb_sup + 0.5 * depth_gsat[..., None] * n_gsat
    pt_capb = pa_sup - 0.5 * depth_gsat[..., None] * n_gsat
    pt_glat = jnp.where(g_have[..., None],
                        0.5 * (c1 + n_gsat * ar + c2 - n_gsat * br),
                        0.5 * (pa_sup + pb_sup))
    point_gsat = jnp.where((g_bi == 0)[..., None], pt_capa,
                 jnp.where((g_bi == 1)[..., None], pt_capb, pt_glat))

    use_tt = perp & (depth_tt <= depth_gsat)
    g_nrm = jnp.where(use_tt[..., None], n_tt, n_gsat)
    g_depth = jnp.where(use_tt, depth_tt, depth_gsat)
    g_point = jnp.where(use_tt[..., None], point_tt, point_gsat)
    g_hit = (gdist <= rsum) & (depth_gsat >= 0.0) & (perp | g_caphit)
    g_pts, g_dps, g_nrm, g_cnt, g_hit = _one_point(
        g_point, g_depth, g_nrm, g_hit)

    pts = jnp.where(is_parallel, p_pts, g_pts)
    dps = jnp.where(is_parallel, p_dps, g_dps)
    nrm = jnp.where(is_parallel, p_nrm, g_nrm)
    cnt = jnp.where(is_parallel, p_cnt, g_cnt).astype(jnp.int32)
    hit = jnp.where(is_parallel, par_hit, g_hit)
    return pts, dps, nrm, cnt, hit


def _hull_local_lists(verts, fnorm, foff, fmask):
    """Static vert/plane lists for the cm hull cores (padded verts
    duplicate vertex 0 — harmless for a support argmax)."""
    V = verts.shape[0]
    vlist = [(verts[i, 0], verts[i, 1], verts[i, 2]) for i in range(V)]
    F = fnorm.shape[0]
    planes = [((fnorm[i, 0], fnorm[i, 1], fnorm[i, 2]), foff[i])
              for i in range(F)]
    pvalid = [fmask[i] for i in range(F)]
    return vlist, planes, pvalid


def sphere_hull_contact(sc, sr, hp, hq, verts, vmask, fnorm, foff, fmask):
    """collision_narrow.cpp:496-522 behavior; round-3 redesign: the EPA is
    replaced by distance-GJK on (center point, hull) — exact because a
    sphere is its center Minkowski-swept by a ball — plus an exact
    face-plane MTV for center-inside-hull (ops/pallas/cm_hull.py)."""
    from dxk_tpu.ops.pallas.cm_hull import sphere_hull_core
    p_l = quat_inv_rotate(hq, sc - hp)
    vlist, planes, pvalid = _hull_local_lists(verts, fnorm, foff, fmask)
    pt, depth, nrm, hit = sphere_hull_core(
        (p_l[0], p_l[1], p_l[2]), sr, vlist, planes, pvalid)
    point = quat_rotate(hq, jnp.stack(pt)) + hp
    normal = quat_rotate(hq, jnp.stack(nrm))
    return _one_point(point, depth, normal, hit)


def capsule_hull_contact(aa, ab, ar, hp, hq, verts, vmask, fnorm, foff,
                         fmask):
    """collision_narrow.cpp:792-820 behavior; round-3 redesign like
    sphere_hull_contact (segment swept by a ball — exact)."""
    from dxk_tpu.ops.pallas.cm_hull import capsule_hull_core
    a_l = quat_inv_rotate(hq, aa - hp)
    b_l = quat_inv_rotate(hq, ab - hp)
    vlist, planes, pvalid = _hull_local_lists(verts, fnorm, foff, fmask)
    pt, depth, nrm, hit = capsule_hull_core(
        (a_l[0], a_l[1], a_l[2]), (b_l[0], b_l[1], b_l[2]), ar,
        vlist, planes, pvalid)
    point = quat_rotate(hq, jnp.stack(pt)) + hp
    normal = quat_rotate(hq, jnp.stack(nrm))
    return _one_point(point, depth, normal, hit)


def _hull_world_topo(hp, hq, verts, pn, po, pm, lp, ll, ed, em, LM):
    """World-space polytope lists (cm_polytope contract) from per-pair
    hull tables (scene/hull_topology.py fields gathered per pair). Loops
    are padded to LM (>= the table's LM) by repeating the last point."""
    from dxk_tpu.ops.pallas import cm_polytope as cp
    V, FU, LMh, EU = verts.shape[0], pn.shape[0], lp.shape[1], ed.shape[0]
    hpt = (hp[0], hp[1], hp[2])
    hqt = (hq[0], hq[1], hq[2], hq[3])
    vlist = [(verts[i, 0], verts[i, 1], verts[i, 2]) for i in range(V)]
    flist = [((pn[f, 0], pn[f, 1], pn[f, 2]), pm[f]) for f in range(FU)]
    llist, llens = [], []
    for f in range(FU):
        pts = [(lp[f, l, 0], lp[f, l, 1], lp[f, l, 2]) for l in range(LMh)]
        while len(pts) < LM:
            pts.append(pts[-1])
        llist.append(tuple(pts))
        llens.append(ll[f])
    elist = [((ed[e, 0], ed[e, 1], ed[e, 2]), em[e]) for e in range(EU)]
    return cp.hull_topology_world(hpt, hqt, vlist, flist, llist, llens,
                                  elist)


def _stack_manifold(pts, dps, nrm, masks):
    """cm_polytope output -> the AoS (pts (4,3), dps (4,), nrm (3,), cnt,
    hit) contract."""
    cnt = masks[0].astype(jnp.int32)
    for m in masks[1:]:
        cnt = cnt + m.astype(jnp.int32)
    hit = cnt > 0
    return (jnp.stack([jnp.stack(p) for p in pts]), jnp.stack(dps),
            jnp.stack(nrm), cnt, hit)


def cylinder_hull_contact(aa, ab, ar, hp, hq, verts, vmask, pn, po, pm,
                          lp, ll, ed, em):
    """collision_narrow.cpp:1045-1073 behavior (GJK+EPA single contact);
    round-3 redesign: candidate-axis SAT with exact cylinder projection
    intervals (ops/pallas/cm_polytope.py cylinder_hull_cm) — arithmetic
    only, so it also runs inside the fused Pallas kernel."""
    from dxk_tpu.ops.pallas.cm_polytope import cylinder_hull_cm
    hw = _hull_world_topo(hp, hq, verts, pn, po, pm, lp, ll, ed, em,
                          lp.shape[1])
    pts, dps, nrm, hits = cylinder_hull_cm(
        (aa[0], aa[1], aa[2]), (ab[0], ab[1], ab[2]), ar, hw)
    return _one_point(jnp.stack(pts[0]), dps[0], jnp.stack(nrm), hits[0])


def box_hull_contact(bc, bh, bq, hp, hq, verts, vmask, pn, po, pm,
                     lp, ll, ed, em):
    """collision_narrow.cpp:1150-1178 behavior; round-3 redesign: the
    GJK+EPA single contact (whose 20-iteration cap diverged
    catastrophically on high-aspect CSOs — docs/PERF_NOTES.md) is replaced
    by the EXACT complete SAT over {box faces, hull faces, edge crosses}
    plus a clipped <=4-point manifold (ops/pallas/cm_polytope.py) — both
    stronger than the reference (exact MTV, stable flat-on-flat stacks)
    and kernel-runnable."""
    from dxk_tpu.ops.pallas.cm_polytope import box_hull_cm
    LM = max(4, lp.shape[1])
    hw = _hull_world_topo(hp, hq, verts, pn, po, pm, lp, ll, ed, em, LM)
    out = box_hull_cm((bc[0], bc[1], bc[2]), (bh[0], bh[1], bh[2]),
                      (bq[0], bq[1], bq[2], bq[3]), hw, LM)
    return _stack_manifold(*out)


def hull_hull_contact(ap, aq, averts, amask, apn, apo, apm, alp, all_, aed,
                      aem, bp, bq, bverts, bmask, bpn, bpo, bpm, blp, bll,
                      bed, bem):
    """collision_narrow.cpp:1558-1584 behavior (where the multi-contact
    manifold is an explicit reference TODO); round-3 redesign: exact
    complete SAT over {faces of A, faces of B, edge crosses} + a clipped
    <=4-point manifold from the build-time face loops
    (ops/pallas/cm_polytope.py) — replaces the earlier GJK+EPA +
    support-polygon-argsort path with one that is exact, stronger than
    the reference, and kernel-runnable."""
    from dxk_tpu.ops.pallas.cm_polytope import hull_hull_cm
    LM = max(alp.shape[1], blp.shape[1])
    hwa = _hull_world_topo(ap, aq, averts, apn, apo, apm, alp, all_, aed,
                           aem, LM)
    hwb = _hull_world_topo(bp, bq, bverts, bpn, bpo, bpm, blp, bll, bed,
                           bem, LM)
    return _stack_manifold(*hull_hull_cm(hwa, hwb))
