"""Branchless fixed-iteration GJK boolean-intersection test.

Rebuild of the reference's gjkIntersectionTest + updateGJKSimplex
(/root/reference/src/physics/collision_gjk.h:183-238, collision_gjk.cpp:6-212)
for TPU: the same simplex-update decision tree, but every branch is computed
and mask-selected, and the unbounded `while` becomes a fixed iteration count
with a done flag (the reference's `gjk_unexpected_error` becomes
"no intersection", matching its graceful-degradation semantics).

Support points carry (pointA, pointB, minkowski) triples like
gjk_support_point (collision_gjk.h:138-154) so EPA can recover witness
points. The simplex is a (4, 3, 3) array: rows a/b/c/d, columns
[shapeA point, shapeB point, minkowski].

Support functions take a world-space direction and shape params and return
the farthest point; they mirror collision_gjk.h:6-135.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dxk_tpu.core.maths import (cross, dot, noz, normalize, quat_inv_rotate,
                                quat_rotate, squared_length)

GJK_MAX_ITERATIONS = 32


# ---------------------------------------------------------------------------
# support functions (collision_gjk.h:6-135)


def support_sphere(params, d):
    center, radius = params
    return normalize(d) * radius + center


def support_capsule(params, d):
    a, b, radius = params
    farther = jnp.where(dot(d, a) > dot(d, b), a, b)
    return normalize(d) * radius + farther


def support_cylinder(params, d):
    a, b, radius = params
    farther = jnp.where(dot(d, a) > dot(d, b), a, b)
    n = a - b
    proj = noz(cross(cross(n, d), n))
    return farther + proj * radius


def support_box(params, d):
    center, half, q = params
    dl = quat_inv_rotate(q, d)
    r = jnp.where(dl < 0.0, -half, half)
    return center + quat_rotate(q, r)


def support_hull(params, d):
    pos, q, verts, mask = params
    dl = quat_inv_rotate(q, d)
    scores = jnp.where(mask, verts @ dl, -3.4e38)
    best = verts[jnp.argmax(scores)]
    return pos + quat_rotate(q, best)


def support_extruded_triangle(params, d):
    """extruded_triangle_support_fn (collision_gjk.h:102-135): a triangle
    plus its copy extruded downward, used by heightmap collision."""
    pts = params  # (6, 3)
    return pts[jnp.argmax(pts @ d)]


def _sp(support_a, support_b, a_params, b_params, d):
    """One Minkowski support point triple (pA, pB, pA-pB)."""
    pa = support_a(a_params, d)
    pb = support_b(b_params, -d)
    return jnp.stack([pa, pb, pa - pb])


def _cross_aba(a, b):
    return cross(cross(a, b), a)


def gjk_intersection(support_a, support_b, a_params, b_params,
                     max_iterations=GJK_MAX_ITERATIONS):
    """Returns (hit (), simplex (4,3,3)). The simplex rows are the
    tetrahedron a/b/c/d when hit is True (same layout as gjk_simplex with
    numPoints == 4)."""
    dtype = jnp.float32
    dir0 = jnp.array([1.0, 0.1, -0.2], dtype)  # collision_gjk.h:190

    c = _sp(support_a, support_b, a_params, b_params, dir0)
    fail0 = dot(c[2], dir0) < 0.0

    d1 = -c[2]
    b = _sp(support_a, support_b, a_params, b_params, d1)
    fail1 = dot(b[2], d1) < 0.0

    dirv = _cross_aba(c[2] - b[2], -b[2])

    zero_pt = jnp.zeros((3, 3), dtype)

    def body(carry, _):
        b, c, d, num, dirv, a_out, done, hit, failed = carry

        small = squared_length(dirv) < 0.0001
        a = _sp(support_a, support_b, a_params, b_params, dirv)
        behind = dot(a[2], dirv) < 0.0
        fail_now = (~done) & (small | behind)

        # ---- triangle case (numPoints == 2): collision_gjk.cpp:8-53
        ao = -a[2]
        ab = b[2] - a[2]
        ac = c[2] - a[2]
        abc = cross(ab, ac)
        abp = cross(ab, abc)
        acp = cross(abc, ac)
        t_over_ab = dot(ao, abp) > 0.0
        t_over_ac = dot(ao, acp) > 0.0
        t_front = dot(ao, abc) >= 0.0
        t_back = dot(ao, -abc) >= 0.0

        # outcomes for the triangle case
        #   over ab: c = a, stay 2 pts, dir = crossABA(ab, ao)
        #   over ac: b = a, stay 2 pts, dir = crossABA(ac, ao)
        #   front:   d = b, b = a, 3 pts, dir = abc
        #   back:    d = c, c = b, b = a, 3 pts, dir = -abc
        tri_err = ~(t_over_ab | t_over_ac | t_front | t_back)
        tb2, tc2, td2 = b, c, d
        tnum2 = num
        tdir2 = dirv
        # priority: over_ab, then over_ac, then front, then back
        sel_ab = t_over_ab
        sel_ac = (~t_over_ab) & t_over_ac
        sel_fr = (~t_over_ab) & (~t_over_ac) & t_front
        sel_bk = (~t_over_ab) & (~t_over_ac) & (~t_front) & t_back

        def w3(cond, new, cur):
            return jnp.where(cond, new, cur)

        tb2 = w3(sel_ab, tb2, tb2)            # b unchanged
        tc2 = w3(sel_ab, a, tc2)
        tdir2 = w3(sel_ab, _cross_aba(ab, ao), tdir2)

        tb2 = w3(sel_ac, a, tb2)
        tdir2 = w3(sel_ac, _cross_aba(ac, ao), tdir2)

        td2 = w3(sel_fr, b, td2)
        tb2 = w3(sel_fr, a, tb2)
        tnum2 = jnp.where(sel_fr, 3, tnum2)
        tdir2 = w3(sel_fr, abc, tdir2)

        td2 = w3(sel_bk, c, td2)
        tc2 = w3(sel_bk, b, tc2)
        tb2 = w3(sel_bk, a, tb2)
        tnum2 = jnp.where(sel_bk, 3, tnum2)
        tdir2 = w3(sel_bk, -abc, tdir2)

        # ---- tetrahedron case (numPoints == 3): collision_gjk.cpp:54-207
        ad = d[2] - a[2]
        abc3 = cross(ac, ab)
        abd3 = cross(ab, ad)
        adc3 = cross(ad, ac)
        over_abc = dot(abc3, ao) > 0.0
        over_abd = dot(abd3, ao) > 0.0
        over_adc = dot(adc3, ao) > 0.0
        flags = (over_abc.astype(jnp.int32)
                 + 2 * over_abd.astype(jnp.int32)
                 + 4 * over_adc.astype(jnp.int32))
        stop = flags == 0
        tet_err = flags == 7

        # edge-plane tests reused across the goto chains
        abc_ab = dot(cross(abc3, ab), ao) > 0.0   # overABC1 condition
        ac_abc = dot(cross(ac, abc3), ao) > 0.0   # overABC2 condition
        abd_ad = dot(cross(abd3, ad), ao) > 0.0   # overABD1 condition
        ab_abd = dot(cross(ab, abd3), ao) > 0.0   # overABD2 condition
        adc_ac = dot(cross(adc3, ac), ao) > 0.0   # overADC1 condition
        ad_adc = dot(cross(ad, adc3), ao) > 0.0   # overADC2 condition

        # terminal actions encoded as ids:
        # 0: line (b, a)      dir crossABA(ab, ao)   ["new line ab"]
        # 1: line (a, c)      dir crossABA(ac, ao)   ["new line ac"]
        # 2: line (d, a)      dir crossABA(ad, ao)   ["new line ad"]
        # 3: tri  (b, c, a)   dir abc3               ["stay bca"]
        # 4: tri  (b, a, d)   dir abd3               ["stay bad"]
        # 5: tri  (a, c, d)   dir adc3               ["stay acd"]
        def over_abc_chain1():   # overABC1 -> overABC2 -> bca
            return jnp.where(abc_ab, 0, jnp.where(ac_abc, 1, 3))

        def over_abc_chain2():   # overABC2 -> bca
            return jnp.where(ac_abc, 1, 3)

        def over_abd_chain1():   # overABD1 -> overABD2 -> bad
            return jnp.where(abd_ad, 2, jnp.where(ab_abd, 0, 4))

        def over_abd_chain2():   # overABD2 -> bad
            return jnp.where(ab_abd, 0, 4)

        def over_adc_chain1():   # overADC1 -> overADC2 -> acd
            return jnp.where(adc_ac, 1, jnp.where(ad_adc, 2, 5))

        def over_adc_chain2():   # overADC2 -> acd
            return jnp.where(ad_adc, 2, 5)

        action = jnp.where(
            flags == 1, over_abc_chain1(),
            jnp.where(flags == 2, over_abd_chain1(),
            jnp.where(flags == 4, over_adc_chain1(),
            jnp.where(flags == 3,
                      jnp.where(abc_ab, over_abd_chain1(), over_abc_chain2()),
            jnp.where(flags == 6,
                      jnp.where(abd_ad, over_adc_chain1(), over_abd_chain2()),
            jnp.where(flags == 5,
                      jnp.where(adc_ac, over_abc_chain1(), over_adc_chain2()),
                      0))))))

        is_line0 = action == 0
        is_line1 = action == 1
        is_line2 = action == 2
        is_tri3 = action == 3
        is_tri4 = action == 4
        is_tri5 = action == 5

        qb = jnp.where(is_line0, b,
             jnp.where(is_line1, a,
             jnp.where(is_line2, d,
             jnp.where(is_tri3, b,
             jnp.where(is_tri4, b, a)))))
        qc = jnp.where(is_line0, a,
             jnp.where(is_line1, c,
             jnp.where(is_line2, a,
             jnp.where(is_tri3, c,
             jnp.where(is_tri4, a, c)))))
        qd = jnp.where(is_tri3, a, jnp.where(is_tri4 | is_tri5, d, d))
        qd = jnp.where(is_tri3, a, qd)
        qnum = jnp.where(action < 3, 2, 3)
        qdir = jnp.where(is_line0, _cross_aba(ab, ao),
               jnp.where(is_line1, _cross_aba(ac, ao),
               jnp.where(is_line2, _cross_aba(ad, ao),
               jnp.where(is_tri3, abc3,
               jnp.where(is_tri4, abd3, adc3)))))

        # select triangle- or tetrahedron-case outcome
        in_tri = num == 2
        nb = jnp.where(in_tri, tb2, qb)
        nc = jnp.where(in_tri, tc2, qc)
        nd = jnp.where(in_tri, td2, qd)
        nnum = jnp.where(in_tri, tnum2, qnum)
        ndir = jnp.where(in_tri, tdir2, qdir)
        err = jnp.where(in_tri, tri_err, tet_err)
        got_hit = (~in_tri) & stop

        # apply only if not already done/failed this lane; on convergence
        # (stop) the b/c/d rows stay and `a` completes the tetrahedron
        act = ~done & ~fail_now
        upd = act & ~got_hit
        b = jnp.where(upd, nb, b)
        c = jnp.where(upd, nc, c)
        d = jnp.where(upd, nd, d)
        num = jnp.where(upd, nnum, num)
        dirv = jnp.where(upd, ndir, dirv)
        a_out = jnp.where(act & got_hit, a, a_out)
        hit = hit | (act & got_hit)
        failed = failed | fail_now | (act & err)
        done = done | fail_now | (act & (got_hit | err))
        return (b, c, d, num, dirv, a_out, done, hit, failed), None

    init = (b, c, d := zero_pt, jnp.int32(2), dirv, zero_pt,
            fail0 | fail1, jnp.bool_(False), fail0 | fail1)
    (b, c, d, num, dirv, a_out, done, hit, failed), _ = jax.lax.scan(
        body, init, None, length=max_iterations)

    hit = hit & ~(fail0 | fail1)
    simplex = jnp.stack([a_out, b, c, d])  # (4 points, 3 fields, 3)
    return hit, simplex
