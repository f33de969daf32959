"""Sphere-hull and capsule-hull contacts on component-major lane tuples.

EXACT replacements for the GJK+EPA single-point contacts the reference
uses for these pairs (collision_narrow.cpp:496-522 sphere-hull,
792-820 capsule-hull): a sphere/capsule is a point/segment Minkowski-swept
by a ball of its radius, so

    contact  <=>  dist(point_or_segment, hull) <= radius
    depth     =   radius - dist          (exact)
    normal    =   (hull witness - core witness) / dist   (exact MTV)

with dist/witnesses from the distance GJK (gjk_distance.py) — arithmetic
only, so unlike EPA this runs inside the fused Pallas kernel. When the
core itself enters the hull (penetration beyond the radius), the fallback
is the exact point-in-hull MTV from the hull's face planes.

All in HULL-LOCAL space; callers rotate in/out. Vertices arrive as a
static list of V v3 tuples (padded verts duplicate the first vertex —
harmless for a support argmax); faces as lists of (normal v3, offset)
with a parallel validity list (padded faces masked out of the max).

The same code is the array-of-structs narrowphase path (0-d arrays) and
the fused kernel's cm recipe (lane arrays) — bit-identical, which the
cross-path tests pin.
"""

from __future__ import annotations

import jax.numpy as jnp

from dxk_tpu.ops.pallas.cm_narrowphase import (_add, _dot, _muls, _sub,
                                               _where)
from dxk_tpu.ops.pallas.gjk_distance import gjk_distance

_BIG = 3.4e38


def sup_point(p, d):
    return p


def sup_segment(ab, d):
    a, b = ab
    return _where(_dot(d, a) > _dot(d, b), a, b)


def sup_verts(verts_list, d):
    """Branchless support over a static list of v3 vertices."""
    best = verts_list[0]
    bs = _dot(best, d)
    for v in verts_list[1:]:
        s = _dot(v, d)
        take = s > bs
        bs = jnp.where(take, s, bs)
        best = _where(take, v, best)
    return best


def _face_mtv(p, planes, plane_valid):
    """Exact MTV for a point INSIDE the hull: the face with the largest
    signed distance n.p + off (all negative inside). Returns
    (sd, n_out v3)."""
    best_sd = jnp.full_like(p[0], -_BIG)
    best_n = (jnp.zeros_like(p[0]), jnp.ones_like(p[0]),
              jnp.zeros_like(p[0]))
    for (n, off), ok in zip(planes, plane_valid):
        sd = _dot(n, p) + off
        sd = jnp.where(ok, sd, -_BIG)
        take = sd > best_sd
        best_sd = jnp.where(take, sd, best_sd)
        best_n = _where(take, n, best_n)
    return best_sd, best_n


def sphere_hull_core(sc, sr, verts_list, planes, plane_valid):
    """Sphere (center sc, radius sr) vs local hull. Returns
    (point, depth, normal, hit) — single contact, hull-local frame,
    normal pointing sphere -> hull (collider A -> B)."""
    dist, qa, qb, overlap = gjk_distance(sup_point, sup_verts,
                                         sc, verts_list)
    # shallow/exact: center outside the hull
    inv_d = 1.0 / jnp.maximum(dist, 1e-30)
    n_s = _muls(_sub(qb, qa), inv_d)
    depth_s = sr - dist
    point_s = _muls(_add(_add(sc, _muls(n_s, sr)), qb), 0.5)

    # deep: center inside -> face-plane MTV (sd < 0; continuous with the
    # shallow branch: near a face, n_s ~= -n_face and depth -> sr - 0)
    sd, n_f = _face_mtv(sc, planes, plane_valid)
    n_d = _muls(n_f, -1.0)
    depth_d = sr - sd
    point_d = _add(sc, _muls(n_f, -0.5 * sd))

    normal = _where(overlap, n_d, n_s)
    depth = jnp.where(overlap, depth_d, depth_s)
    point = _where(overlap, point_d, point_s)
    hit = overlap | (depth_s >= 0.0)
    return point, depth, normal, hit


def capsule_hull_core(ca, cb, cr, verts_list, planes, plane_valid):
    """Capsule (segment ca-cb, radius cr) vs local hull. Returns
    (point, depth, normal, hit) — single contact like the reference
    (collision_narrow.cpp:792-820), hull-local frame."""
    dist, qa, qb, overlap = gjk_distance(sup_segment, sup_verts,
                                         (ca, cb), verts_list)
    inv_d = 1.0 / jnp.maximum(dist, 1e-30)
    n_s = _muls(_sub(qb, qa), inv_d)
    depth_s = cr - dist
    point_s = _muls(_add(_add(qa, _muls(n_s, cr)), qb), 0.5)

    # deep: the segment reaches into the hull — face-plane MTV of the
    # deepest of 5 segment samples (per-point depth is concave
    # piecewise-linear along the segment, so its max can be interior;
    # sampling bounds the underestimate)
    sd = None
    n_f = None
    p_deep = None
    for t in (0.0, 0.25, 0.5, 0.75, 1.0):
        p = _add(_muls(ca, 1.0 - t), _muls(cb, t))
        sd_t, n_t = _face_mtv(p, planes, plane_valid)
        if sd is None:
            sd, n_f, p_deep = sd_t, n_t, p
        else:
            deeper = sd_t < sd                 # deeper = more negative
            sd = jnp.where(deeper, sd_t, sd)
            n_f = _where(deeper, n_t, n_f)
            p_deep = _where(deeper, p, p_deep)
    n_d = _muls(n_f, -1.0)
    depth_d = cr - sd
    point_d = _add(p_deep, _muls(n_f, -0.5 * sd))

    normal = _where(overlap, n_d, n_s)
    depth = jnp.where(overlap, depth_d, depth_s)
    point = _where(overlap, point_d, point_s)
    hit = overlap | (depth_s >= 0.0)
    return point, depth, normal, hit
