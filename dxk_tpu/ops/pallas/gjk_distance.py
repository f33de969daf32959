"""Distance GJK on component-major lane tuples.

Computes the distance and closest-point witnesses between two SEPARATED
convex shapes from their support functions — the algorithmic complement
of the boolean-intersection GJK in ops/gjk.py (reference:
gjkIntersectionTest, collision_gjk.h:183-238, which only answers yes/no).

Usage (the margin trick): contacts between shapes A and B are generated
by running distance GJK on A and B SHRUNK by margins (da, db); while the
real shapes' penetration is below da+db the shrunk shapes stay separated,
so distance d and witnesses are exact, and

    depth  = (da + db) - d
    normal = (qb - qa) / d          (points A -> B)
    point  = midpoint of the real-surface witnesses

This replaces EPA for shallow contacts with pure arithmetic (no per-lane
polytope soup / top_k — EPA does not map to component-major lanes), at
the cost of rounding sharp corners by the margin. Deep penetration
(> da+db, shrunk shapes overlap) degrades to a centroid-direction pushout
capped at da+db — consistent, conservative, and transient.

Everything is a tuple-of-arrays "v3" (cm_narrowphase conventions): the
SAME code runs per-lane inside the fused Pallas kernel and, with 0-d/1-d
arrays, as the array-of-structs narrowphase path — bit-identical results
on both, which is what the cross-path fidelity tests pin.

The simplex is 4 fixed slots of (wA, wB, w = wA - wB) with validity
masks; the per-iteration closest point on the simplex is computed
branchlessly over all sub-features (vertices / edges / triangle faces /
interior, Ericson ch. 5 formulations) and the new support replaces the
slot with the smallest barycentric weight.
"""

from __future__ import annotations

import jax.numpy as jnp

from dxk_tpu.ops.pallas.cm_narrowphase import (_add, _cross, _dot, _muls,
                                               _sub, _sqlen, _where)

_BIG = 3.4e38


def _closest_pt_triangle(p0, a, b, c):
    """Closest point to the origin-equivalent query p0 on triangle abc
    (Ericson 5.1.5, all branches mask-selected). Returns (q, (u, v, w))
    with q = u*a + v*b + w*c."""
    ab = _sub(b, a)
    ac = _sub(c, a)
    ap = _sub(p0, a)
    d1 = _dot(ab, ap)
    d2 = _dot(ac, ap)
    bp = _sub(p0, b)
    d3 = _dot(ab, bp)
    d4 = _dot(ac, bp)
    cp = _sub(p0, c)
    d5 = _dot(ab, cp)
    d6 = _dot(ac, cp)

    # region masks, in Ericson's order (first hit wins)
    in_a = (d1 <= 0.0) & (d2 <= 0.0)
    in_b = (d3 >= 0.0) & (d4 <= d3)
    vc = d1 * d4 - d3 * d2
    on_ab = (vc <= 0.0) & (d1 >= 0.0) & (d3 <= 0.0)
    in_c = (d6 >= 0.0) & (d5 <= d6)
    vb = d5 * d2 - d1 * d6
    on_ac = (vb <= 0.0) & (d2 >= 0.0) & (d6 <= 0.0)
    va = d3 * d6 - d5 * d4
    on_bc = (va <= 0.0) & (d4 - d3 >= 0.0) & (d5 - d6 >= 0.0)

    def nz(x):
        return jnp.where(jnp.abs(x) > 1e-30, x, 1e-30)

    t_ab = d1 / nz(d1 - d3)
    t_ac = d2 / nz(d2 - d6)
    t_bc = (d4 - d3) / nz((d4 - d3) + (d5 - d6))
    denom = 1.0 / nz(va + vb + vc)
    v_in = vb * denom
    w_in = vc * denom

    one = jnp.ones_like(d1)
    zero = jnp.zeros_like(d1)

    # priority select: a, b, ab, c, ac, bc, interior
    sel_a = in_a
    sel_b = ~sel_a & in_b
    sel_ab = ~sel_a & ~sel_b & on_ab
    sel_c = ~sel_a & ~sel_b & ~sel_ab & in_c
    sel_ac = ~sel_a & ~sel_b & ~sel_ab & ~sel_c & on_ac
    sel_bc = ~sel_a & ~sel_b & ~sel_ab & ~sel_c & ~sel_ac & on_bc
    sel_in = (~sel_a & ~sel_b & ~sel_ab & ~sel_c & ~sel_ac & ~sel_bc)

    u = (jnp.where(sel_a, one, zero)
         + jnp.where(sel_ab, 1.0 - t_ab, zero)
         + jnp.where(sel_ac, 1.0 - t_ac, zero)
         + jnp.where(sel_in, 1.0 - v_in - w_in, zero))
    v = (jnp.where(sel_b, one, zero)
         + jnp.where(sel_ab, t_ab, zero)
         + jnp.where(sel_bc, 1.0 - t_bc, zero)
         + jnp.where(sel_in, v_in, zero))
    w = (jnp.where(sel_c, one, zero)
         + jnp.where(sel_ac, t_ac, zero)
         + jnp.where(sel_bc, t_bc, zero)
         + jnp.where(sel_in, w_in, zero))

    q = _add(_add(_muls(a, u), _muls(b, v)), _muls(c, w))
    return q, (u, v, w)


def _origin_in_tetra(ws, ext2):
    """True where the origin is strictly inside the (non-degenerate)
    tetrahedron spanned by the 4 slots. The volume threshold is RELATIVE
    to the simplex extent: planar CSOs (e.g. segment vs segment) produce
    fp-dust-volume tetras whose face tests all pass within noise — an
    absolute epsilon misfires there and collapses a correct answer to
    overlap."""
    a, b, c, d = ws
    vol = _dot(_cross(_sub(b, a), _sub(c, a)), _sub(d, a))
    nondeg = vol * vol > 1e-10 * ext2 * ext2 * ext2

    def same_side(p1, p2, p3, p4):
        n = _cross(_sub(p2, p1), _sub(p3, p1))
        s4 = _dot(n, _sub(p4, p1))
        s0 = -_dot(n, p1)                     # dot(n, origin - p1)
        return s4 * s0 >= 0.0

    return (nondeg & same_side(a, b, c, d) & same_side(a, b, d, c)
            & same_side(a, c, d, b) & same_side(b, c, d, a))


def _simplex_closest(ws):
    """Closest point to the ORIGIN on the simplex spanned by the 4 slots
    of ws (list of 4 v3). Returns (q v3, lambdas (4,)) with
    sum(lambdas) == 1.

    Branchless strategy: every slot is always populated (unused slots
    duplicate a used one), so the closest point over all C(4,3) = 4
    triangles is the closest point on the simplex boundary — degenerate
    duplicate triangles collapse to their sub-features via the triangle
    routine's region masks. If the origin is inside the tetrahedron (the
    shrunk shapes overlap), q snaps to zero and the caller's degeneracy
    branch flags overlap."""
    zero3 = (jnp.zeros_like(ws[0][0]),) * 3

    best_d = jnp.full_like(ws[0][0], _BIG)
    best_q = zero3
    best_l = [jnp.zeros_like(ws[0][0]) for _ in range(4)]

    tris = ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3))
    for (i, j, k) in tris:
        q, (u, v, w) = _closest_pt_triangle(zero3, ws[i], ws[j], ws[k])
        d = _sqlen(q)
        take = d < best_d
        best_d = jnp.where(take, d, best_d)
        best_q = _where(take, q, best_q)
        lam = [jnp.zeros_like(u) for _ in range(4)]
        lam[i] = u
        lam[j] = v
        lam[k] = w
        best_l = [jnp.where(take, ln, bo) for ln, bo in zip(lam, best_l)]

    ext2 = jnp.maximum(jnp.maximum(_sqlen(ws[0]), _sqlen(ws[1])),
                       jnp.maximum(_sqlen(ws[2]), _sqlen(ws[3])))
    inside = _origin_in_tetra(ws, ext2)
    best_q = _where(inside, zero3, best_q)
    return best_q, best_l


def gjk_distance(support_a, support_b, a_params, b_params,
                 max_iterations=24):
    """Distance + witnesses between two convex shapes given cm-style
    support functions `support(params, d v3) -> v3`.

    Returns (dist, qa v3, qb v3, overlap_flag):
      dist    — the separation distance (>= 0; ~0 when overlapping),
      qa, qb  — closest-point witnesses on A and B,
      overlap — True where the shapes (numerically) intersect, i.e. the
                simplex drove the closest point to the origin.
    """
    def sup_pair(d):
        pa = support_a(a_params, d)
        pb = support_b(b_params, (-d[0], -d[1], -d[2]))
        return pa, pb, _sub(pa, pb)

    # initial direction: fixed, like the boolean GJK (collision_gjk.h:190)
    shape_probe = support_a(a_params, (1.0, 0.0, 0.0))
    onel = jnp.ones_like(shape_probe[0])
    zerol = jnp.zeros_like(shape_probe[0])
    dir0 = (onel, 0.1 * onel, -0.2 * onel)

    pa0, pb0, w0 = sup_pair(dir0)
    was = [pa0, pa0, pa0, pa0]
    wbs = [pb0, pb0, pb0, pb0]
    ws = [w0, w0, w0, w0]
    valid = [onel > 0.0, onel < 0.0, onel < 0.0, onel < 0.0]
    nvalid = onel                       # number of valid slots (float)

    q = w0
    lams = [onel, zerol, zerol, zerol]
    overlap = jnp.zeros_like(onel, bool)
    done = jnp.zeros_like(onel, bool)

    ext2 = _sqlen(w0)
    for _ in range(max_iterations):
        # new support toward the origin
        d2q = _sqlen(q)
        deg = d2q <= 1e-12 * (ext2 + 1e-12)   # at the origin: overlapping
        overlap = overlap | (~done & deg)
        done = done | deg

        nd = _muls(q, -1.0 / jnp.sqrt(jnp.maximum(d2q, 1e-30)))
        pa, pb, w = sup_pair(nd)
        ext2 = jnp.maximum(ext2, _sqlen(w))

        # convergence: no meaningful RELATIVE progress toward the origin
        # (q.w >= |q|^2 - eps  <=>  the new support does not get closer)
        prog = d2q - _dot(q, w)
        no_prog = prog <= 1e-6 * d2q + 1e-12 * ext2
        done = done | no_prog

        # replace the slot with the smallest barycentric weight among
        # valid slots (or the first invalid slot) — skip when done
        scores = [jnp.where(valid[i], lams[i], -1.0) for i in range(4)]
        m01 = scores[0] <= scores[1]
        i01 = jnp.where(m01, 0, 1)
        s01 = jnp.where(m01, scores[0], scores[1])
        m23 = scores[2] <= scores[3]
        i23 = jnp.where(m23, 2, 3)
        s23 = jnp.where(m23, scores[2], scores[3])
        repl = jnp.where(s01 <= s23, i01, i23)

        upd = ~done
        for i in range(4):
            sel = upd & (repl == i)
            was[i] = _where(sel, pa, was[i])
            wbs[i] = _where(sel, pb, wbs[i])
            ws[i] = _where(sel, w, ws[i])
            valid[i] = valid[i] | sel

        q, lams = _simplex_closest(ws)

    dist = jnp.sqrt(jnp.maximum(_sqlen(q), 0.0))
    overlap = overlap | (dist <= 1e-9)

    qa = (zerol,) * 3
    qb = (zerol,) * 3
    for i in range(4):
        qa = _add(qa, _muls(was[i], lams[i]))
        qb = _add(qb, _muls(wbs[i], lams[i]))
    return dist, qa, qb, overlap
