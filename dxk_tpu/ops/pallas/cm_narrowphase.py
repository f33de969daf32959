"""Component-major (SoA-lane) narrowphase recipes for Pallas kernels.

Ports of ops/narrowphase.py contact functions to the layout Pallas TPU
kernels want: every vec3 is a tuple of 3 same-shaped arrays whose shape is
(pairs, env-lanes) — the reference's math_simd.h wN_vec3 struct-of-lanes
(see core/soa.py), with the env batch on the vector lanes.

Each recipe is the SAME math as its array-of-structs sibling (cited there
against collision_narrow.cpp); unit tests pin them against each other
elementwise (tests/test_cm_narrowphase.py). Used by the fused batched
physics kernel (batched_solver.py) so narrowphase + prep + solve run in
one kernel with nothing but collider params crossing HBM.

Returns per recipe: (points, depths, normal, hit) where points is a list
of K v3 tuples, depths a list of K arrays (already masked: depth slots
beyond the live count carry hit=False semantics via the per-point mask),
normal one v3, and mask a list of K boolean arrays (point k live)."""

from __future__ import annotations

import jax.numpy as jnp

EPSILON = 1e-6


# ---- v3 helpers (soa.py, local to avoid cross-module kernel imports) ----

def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _muls(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _where(c, a, b):
    return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]))


def _clamp01(x):
    return jnp.clip(x, 0.0, 1.0)


def _sqlen(a):
    return _dot(a, a)


def quat_rotate_cm(q, v):
    """q: 4-tuple (x,y,z,w), v: v3 — maths.py quat_rotate port."""
    qv = (q[0], q[1], q[2])
    t = _muls(_cross(qv, v), 2.0)
    return _add(_add(v, _muls(t, q[3])), _cross(qv, t))


def quat_inv_rotate_cm(q, v):
    return quat_rotate_cm((-q[0], -q[1], -q[2], q[3]), v)


def closest_point_point_segment_cm(q, a, b):
    ab = _sub(b, a)
    t = _clamp01(_dot(_sub(q, a), ab)
                 / jnp.maximum(_sqlen(ab), 1e-12))
    return _add(a, _muls(ab, t))


def closest_point_segment_segment_cm(p1, q1, p2, q2):
    """geometry.py:closest_point_segment_segment (Ericson 5.1.9)."""
    d1 = _sub(q1, p1)
    d2 = _sub(q2, p2)
    r = _sub(p1, p2)
    a = _sqlen(d1)
    e = _sqlen(d2)
    f = _dot(d2, r)
    c = _dot(d1, r)
    b = _dot(d1, d2)
    denom = a * e - b * b

    s = jnp.where(denom > 1e-12,
                  _clamp01((b * f - c * e)
                           / jnp.where(denom > 1e-12, denom, 1.0)), 0.0)
    t = (b * s + f) / jnp.maximum(e, 1e-12)
    s = jnp.where(t < 0.0, _clamp01(-c / jnp.maximum(a, 1e-12)),
                  jnp.where(t > 1.0, _clamp01((b - c) / jnp.maximum(a, 1e-12)),
                            s))
    t = _clamp01(t)
    both = (a <= 1e-12) & (e <= 1e-12)
    s = jnp.where(both, 0.0, jnp.where(a <= 1e-12, 0.0, s))
    t = jnp.where(both, 0.0, jnp.where(e <= 1e-12, 0.0, t))
    c1 = _add(p1, _muls(d1, s))
    c2 = _add(p2, _muls(d2, t))
    return c1, c2


def _normalize_or_up(n):
    """n / |n|, or +Y when degenerate (narrowphase _UP convention)."""
    sq = _sqlen(n)
    dist = jnp.sqrt(jnp.maximum(sq, 0.0))
    inv = 1.0 / jnp.maximum(dist, 1e-30)
    deg = sq == 0.0
    return (_where(deg, (jnp.zeros_like(sq), jnp.ones_like(sq),
                         jnp.zeros_like(sq)), _muls(n, inv)),
            dist, deg)


def sphere_sphere_cm(c1, r1, c2, r2):
    """narrowphase.sphere_sphere_contact: single point."""
    n = _sub(c2, c1)
    rs = r1 + r2
    sq = _sqlen(n)
    hit = sq <= rs * rs
    normal, dist, deg = _normalize_or_up(n)
    depth = rs - jnp.where(deg, 0.0, dist)
    point = _muls(_add(_add(c1, _muls(normal, r1)),
                       _sub(c2, _muls(normal, r2))), 0.5)
    return point, depth, normal, hit


def capsule_capsule_cm(aa, ab, ar, ba, bb, br):
    """narrowphase.capsule_capsule_contact (collision_narrow.cpp:523-611):
    K=2 points. Returns (pts[2], dps[2], normal, mask[2])."""
    a_dirv = _sub(ab, aa)
    a_len = jnp.sqrt(jnp.maximum(_sqlen(a_dirv), 0.0))
    a_dir = _muls(a_dirv, 1.0 / jnp.maximum(a_len, 1e-30))
    b_dirv = _sub(bb, ba)
    b_len = jnp.sqrt(jnp.maximum(_sqlen(b_dirv), 0.0))
    b_dir = _muls(b_dirv, 1.0 / jnp.maximum(b_len, 1e-30))
    par = _dot(a_dir, b_dir)
    is_parallel = jnp.abs(par) > 0.99

    # parallel: interval-overlap 2-point manifold
    swap = par < 0.0
    p_ba = _where(swap, bb, ba)
    p_bb = _where(swap, ba, bb)
    b0 = _dot(a_dir, _sub(p_ba, aa))
    b1 = _dot(a_dir, _sub(p_bb, aa))
    left = jnp.maximum(0.0, b0)
    right = jnp.minimum(a_len, b1)
    overlaps = right >= left

    ca0 = _add(aa, _muls(a_dir, left))
    ca1 = _add(aa, _muls(a_dir, right))
    cb0 = closest_point_point_segment_cm(ca0, p_ba, p_bb)
    cb1 = _add(cb0, _muls(a_dir, right - left))
    nvec = _sub(cb0, ca0)
    normal2, d, deg = _normalize_or_up(nvec)
    deg = d < EPSILON
    normal2 = _where(deg, (jnp.zeros_like(d), jnp.ones_like(d),
                           jnp.zeros_like(d)), normal2)
    pen = (ar + br) - jnp.where(deg, 0.0, d)
    two_hit = overlaps & (pen >= 0.0)
    p2_0 = _muls(_add(ca0, cb0), 0.5)
    p2_1 = _muls(_add(ca1, cb1), 0.5)

    # disjoint parallel intervals: end-sphere vs end-sphere
    use_a0 = 0.0 > b1
    s_a = _where(use_a0, aa, ab)
    s_b = _where(use_a0, p_bb, p_ba)
    e_pt, e_dp, e_n, e_hit = sphere_sphere_cm(s_a, ar, s_b, br)

    # non-parallel: closest points -> sphere-sphere
    c1, c2 = closest_point_segment_segment_cm(aa, ab, ba, bb)
    g_pt, g_dp, g_n, g_hit = sphere_sphere_cm(c1, ar, c2, br)

    # merge: parallel&overlap -> 2 pts; parallel&disjoint -> end spheres;
    # non-parallel -> general
    one_pt = _where(is_parallel, e_pt, g_pt)
    one_dp = jnp.where(is_parallel, e_dp, g_dp)
    one_n = _where(is_parallel, e_n, g_n)
    # boolean selects as and/or: a bool-valued jnp.where lowers to an
    # i8->i1 trunci Mosaic rejects
    one_hit = (is_parallel & e_hit) | (~is_parallel & g_hit)

    use2 = is_parallel & overlaps
    pt0 = _where(use2, p2_0, one_pt)
    dp0 = jnp.where(use2, pen, one_dp)
    normal = _where(use2, normal2, one_n)
    m0 = (use2 & two_hit) | (~use2 & one_hit)
    pt1 = p2_1
    dp1 = pen
    m1 = use2 & two_hit
    return [pt0, pt1], [dp0, dp1], normal, [m0, m1]


def _segment_box_closest_cm(la, lb, bh, iters=8):
    """narrowphase._segment_box_closest: alternating projection."""
    s = _muls(_add(la, lb), 0.5)
    for _ in range(iters):
        q = tuple(jnp.clip(s[i], -bh[i], bh[i]) for i in range(3))
        s = closest_point_point_segment_cm(q, la, lb)
    q = tuple(jnp.clip(s[i], -bh[i], bh[i]) for i in range(3))
    return s, q


def capsule_box_cm(aa, ab, ar, bc, bh, bq):
    """narrowphase.capsule_box_contact (collision_narrow.cpp:705-790
    behavior): K=2. bh: v3 of half-extents; bq: 4-tuple quat.
    Returns (pts[2], dps[2], normal, mask[2]) in WORLD space."""
    la = quat_inv_rotate_cm(bq, _sub(aa, bc))
    lb = quat_inv_rotate_cm(bq, _sub(ab, bc))

    s, q = _segment_box_closest_cm(la, lb, bh)
    delta = _sub(q, s)
    d2 = _sqlen(delta)
    inside = d2 <= 1e-12

    dist = jnp.sqrt(jnp.maximum(d2, 1e-30))
    n_shallow = _muls(delta, 1.0 / dist)
    depth_shallow = ar - dist
    point_shallow = _muls(_add(_add(s, _muls(n_shallow, ar)), q), 0.5)

    # deep: min-translation face of the deeper-inside endpoint
    def face_pen(p):
        fp = tuple(bh[i] - jnp.abs(jnp.clip(p[i], -bh[i], bh[i]))
                   for i in range(3))
        return fp

    def fp_min(p):
        fp = face_pen(p)
        return jnp.minimum(fp[0], jnp.minimum(fp[1], fp[2]))

    in_a = ((jnp.abs(la[0]) <= bh[0]) & (jnp.abs(la[1]) <= bh[1])
            & (jnp.abs(la[2]) <= bh[2]))
    in_b = ((jnp.abs(lb[0]) <= bh[0]) & (jnp.abs(lb[1]) <= bh[1])
            & (jnp.abs(lb[2]) <= bh[2]))
    pen_a = fp_min(la)
    pen_b = fp_min(lb)
    pick_a = in_a & (~in_b | (pen_a >= pen_b))
    p_deep = _where(pick_a, la, _where(in_b, lb, s))

    fp = tuple(bh[i] - jnp.abs(p_deep[i]) for i in range(3))
    # argmin over the 3 face distances
    k0 = (fp[0] <= fp[1]) & (fp[0] <= fp[2])
    k1 = ~k0 & (fp[1] <= fp[2])
    k2 = ~k0 & ~k1
    fmin = jnp.where(k0, fp[0], jnp.where(k1, fp[1], fp[2]))
    sgn = [jnp.where(p_deep[i] >= 0.0, 1.0, -1.0) for i in range(3)]
    n_deep = (-jnp.where(k0, sgn[0], 0.0), -jnp.where(k1, sgn[1], 0.0),
              -jnp.where(k2, sgn[2], 0.0))
    depth_deep = ar + fmin

    normal = _where(inside, n_deep, n_shallow)
    depth = jnp.where(inside, depth_deep, depth_shallow)
    point = _where(inside, p_deep, point_shallow)
    hit = inside | (depth_shallow >= 0.0)

    # parallel-to-face 2-point manifold (the segment clipped to the face
    # window; collision_narrow.cpp:731-765 via _aabb_face_clip_segment)
    absn = (jnp.abs(normal[0]), jnp.abs(normal[1]), jnp.abs(normal[2]))
    is_face = (absn[0] > 0.99) | (absn[1] > 0.99) | (absn[2] > 0.99)
    axisv = _sub(lb, la)
    axis = _muls(axisv, 1.0 / jnp.maximum(
        jnp.sqrt(jnp.maximum(_sqlen(axisv), 0.0)), 1e-30))
    parallel = jnp.abs(_dot(normal, axis)) < 0.01
    enrich = is_face & parallel

    # face axis k = argmax |normal|; clip the shifted segment's param
    # interval against the two side-plane pairs
    fk0 = absn[0] > 0.99
    fk1 = ~fk0 & (absn[1] > 0.99)
    # shifted segment
    pa = _add(la, _muls(normal, ar))
    pb = _add(lb, _muls(normal, ar))

    def sel(i0, i1, i2, v):
        """component along axis index chosen by face flags: fk0->i0 etc."""
        return jnp.where(fk0, v[i0], jnp.where(fk1, v[i1], v[i2]))

    # side axes (u, v) for face k: (1,2), (0,2), (0,1)
    pa_u = sel(1, 0, 0, pa)
    pa_v = sel(2, 2, 1, pa)
    d_u = sel(1, 0, 0, pb) - pa_u
    d_v = sel(2, 2, 1, pb) - pa_v
    h_u = sel(1, 0, 0, bh)
    h_v = sel(2, 2, 1, bh)

    t0 = jnp.zeros_like(pa_u)
    t1 = jnp.ones_like(pa_u)

    def clip(t0, t1, p, d, h):
        # p + t*d <= h  and  >= -h
        big = 1e30
        for sign in (1.0, -1.0):
            num = sign * h - p
            tcross = num / jnp.where(d == 0.0, big, d)
            dpos = (d * sign) > 0.0
            viol = (sign * p) > h
            # entering: d moves toward violation -> upper bound; else lower
            t1 = jnp.where(dpos, jnp.minimum(t1, tcross), t1)
            t0 = jnp.where(~dpos & (d != 0.0), jnp.maximum(t0, tcross), t0)
            # degenerate: no motion along axis and already outside
            t1 = jnp.where((d == 0.0) & viol, -1.0, t1)
        return t0, t1

    t0, t1 = clip(t0, t1, pa_u, d_u, h_u)
    t0, t1 = clip(t0, t1, pa_v, d_v, h_v)
    clip_ok = t1 >= t0

    seg_d = _sub(pb, pa)
    e0 = _add(pa, _muls(seg_d, t0))
    e1 = _add(pa, _muls(seg_d, t1))
    # depth along the face plane: -(signed distance to the face), with
    # aabb_normal = -normal and ref corner selected by its sign
    face_h = sel(0, 1, 2, bh)
    n_k = sel(0, 1, 2, normal)
    # signed distance of p to plane {x_k = sign * h} along aabb normal
    # (-normal): depth = -( (-n_k)*p_k - (-n_k)*(-n_k*h) )
    p0_k = sel(0, 1, 2, e0)
    p1_k = sel(0, 1, 2, e1)
    dp_e0 = n_k * p0_k + face_h
    dp_e1 = n_k * p1_k + face_h
    # project the points back onto the face plane
    ref_k = -n_k * face_h

    def project(p, pk):
        return _where(fk0, (jnp.full_like(pk, 0.0) + ref_k, p[1], p[2]),
                      _where(fk1, (p[0], ref_k, p[2]), (p[0], p[1], ref_k)))

    e0p = project(e0, p0_k)
    e1p = project(e1, p1_k)
    m_e0 = dp_e0 >= 0.0
    m_e1 = dp_e1 >= 0.0
    use = enrich & clip_ok & (m_e0 | m_e1)

    pt0 = _where(use, _where(m_e0, e0p, e1p), point)
    dp0 = jnp.where(use, jnp.where(m_e0, dp_e0, dp_e1), depth)
    m0 = (use & (m_e0 | m_e1)) | (~use & hit)    # bool-where -> and/or
    pt1 = e1p
    dp1 = dp_e1
    m1 = use & m_e0 & m_e1

    # world space
    def to_world(p):
        return _add(quat_rotate_cm(bq, p), bc)

    nrm_w = quat_rotate_cm(bq, normal)
    m0 = m0 & hit
    m1 = m1 & hit
    return ([to_world(pt0), to_world(pt1)], [dp0, dp1], nrm_w, [m0, m1])


def sphere_capsule_cm(sc, sr, ca, cb, cr):
    """narrowphase.sphere_capsule_contact: sphere vs closest axis point."""
    closest = closest_point_point_segment_cm(sc, ca, cb)
    return sphere_sphere_cm(sc, sr, closest, cr)


def sphere_box_cm(sc, sr, bc, bh, bq):
    """narrowphase.sphere_box_contact: rotate-to-local sphere-vs-AABB
    (collision_narrow.cpp:451-494)."""
    sc_l = quat_inv_rotate_cm(bq, _sub(sc, bc))
    p = tuple(jnp.clip(sc_l[i], -bh[i], bh[i]) for i in range(3))
    n = _sub(p, sc_l)
    sq = _sqlen(n)
    hit = sq <= sr * sr
    dist = jnp.sqrt(jnp.maximum(sq, 0.0))
    pos = sq > 0.0
    inv = 1.0 / jnp.maximum(dist, 1e-30)
    up = (jnp.zeros_like(sq), jnp.ones_like(sq), jnp.zeros_like(sq))
    n = _where(pos, _muls(n, inv), up)
    depth = sr - jnp.where(pos, dist, 0.0)
    point_l = _muls(_add(_add(p, sc_l), _muls(n, sr)), 0.5)
    normal = quat_rotate_cm(bq, n)
    point = _add(quat_rotate_cm(bq, point_l), bc)
    return point, depth, normal, hit
