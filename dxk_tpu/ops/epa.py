"""Fixed-iteration EPA (expanding polytope algorithm).

Rebuild of epaCollisionInfo (/root/reference/src/physics/collision_epa.h:96-168,
collision_epa.cpp) for TPU. The reference maintains a half-edge polytope with
dynamic arrays capped at 1024 slots and 20 iterations; here the polytope is a
fixed-size triangle soup with an active mask:

  - per iteration, triangle normals/distances are recomputed from the point
    array (cheaper than bookkeeping adjacency on TPU),
  - the horizon of the new support point is found by matching directed edges
    of removed (visible) triangles against each other,
  - new triangles are scattered into inactive slots.

Like the reference, the function always returns its best approximation
(closest face) even when the iteration cap is hit (collision_epa.h:94-96).

Point rows are (pA, pB, minkowski) triples so the contact point is recovered
via barycentric coordinates on the closest face (collision_epa.h:154-167).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dxk_tpu.core.maths import cross, dot, normalize, squared_length

_BIG = 3.4e38


def _triangle_info(mink, tris):
    """Normals (pointing away from origin) + distance to origin for all
    triangle slots (epa_simplex::getTriangleInfo)."""
    a = mink[tris[:, 0]]
    b = mink[tris[:, 1]]
    c = mink[tris[:, 2]]
    n = cross(b - a, c - a)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    d = dot(n, a)
    flip = d < 0.0
    n = jnp.where(flip[:, None], -n, n)
    d = jnp.abs(d)
    return n, d


def epa(support_a, support_b, a_params, b_params, simplex,
        max_iterations=20):
    """simplex: (4, 3, 3) from gjk_intersection (rows a/b/c/d, fields
    pA/pB/minkowski). Returns (point (3,), normal (3,), depth ())."""
    P = 4 + max_iterations                 # point capacity
    T = 4 + 3 * max_iterations             # triangle slot capacity
    dtype = simplex.dtype

    pts = jnp.zeros((P, 3, 3), dtype).at[:4].set(simplex)
    n_pts = jnp.int32(4)

    # initial tetrahedron faces (indices into pts; orientation fixed by
    # _triangle_info's away-from-origin normalization)
    tris = jnp.zeros((T, 3), jnp.int32)
    tris = tris.at[0].set(jnp.array([0, 1, 3]))
    tris = tris.at[1].set(jnp.array([1, 2, 3]))
    tris = tris.at[2].set(jnp.array([2, 0, 3]))
    tris = tris.at[3].set(jnp.array([0, 2, 1]))
    active = jnp.zeros((T,), bool).at[:4].set(True)

    def body(carry, _):
        pts, n_pts, tris, active, done = carry
        mink = pts[:, 2]

        normals, dists = _triangle_info(mink, tris)
        scores = jnp.where(active, dists, _BIG)
        closest = jnp.argmin(scores)
        n_c = normals[closest]

        pa = support_a(a_params, n_c)
        pb = support_b(b_params, -n_c)
        w = pa - pb
        improve = dot(w, n_c) - dists[closest]
        converged = improve < 0.01

        step = ~done & ~converged

        # visible faces from w
        visible = active & (dot(normals, w[None, :]) > dists) & step

        # directed edges of visible triangles: (3T, 2)
        e01 = tris[:, [0, 1]]
        e12 = tris[:, [1, 2]]
        e20 = tris[:, [2, 0]]
        edges = jnp.concatenate([e01, e12, e20], axis=0)
        edge_vis = jnp.concatenate([visible, visible, visible])

        # horizon edge: a visible directed edge whose reverse is not among
        # the visible edges
        u, v = edges[:, 0], edges[:, 1]
        rev_present = jnp.any(
            edge_vis[None, :] & (u[:, None] == v[None, :])
            & (v[:, None] == u[None, :]), axis=1)
        horizon = edge_vis & ~rev_present

        # free slots after removing visible triangles
        active_after = active & ~visible
        # place new triangles (u, v, new_point) into free slots
        rank = jnp.cumsum(horizon.astype(jnp.int32)) - 1   # rank among horizon
        free_order = jnp.argsort(active_after.astype(jnp.int32),
                                 stable=True)              # inactive first
        n_free = jnp.sum(~active_after)
        ok = horizon & (rank < n_free) & (n_pts < P)
        target = jnp.where(ok, free_order[jnp.clip(rank, 0, T - 1)], T)

        new_tri = jnp.stack([u, v, jnp.full_like(u, 0)], axis=-1)
        new_tri = new_tri.at[:, 2].set(n_pts)
        tris2 = jnp.zeros((T + 1, 3), jnp.int32).at[:T].set(tris)
        tris2 = tris2.at[target].set(new_tri, mode="drop")
        tris_n = tris2[:T]
        active_n = jnp.zeros((T + 1,), bool).at[:T].set(active_after)
        active_n = active_n.at[target].set(ok, mode="drop")
        active_n = active_n[:T]

        added_any = jnp.any(ok)
        pts_n = pts.at[jnp.minimum(n_pts, P - 1)].set(
            jnp.where(step & added_any, jnp.stack([pa, pb, w]),
                      pts[jnp.minimum(n_pts, P - 1)]))
        n_pts_n = jnp.where(step & added_any, n_pts + 1, n_pts)

        # if nothing could be added (out of memory / degenerate), stop
        done_n = done | converged | (step & ~added_any)

        tris = jnp.where(step, tris_n, tris)
        active = jnp.where(step, active_n, active)
        return (pts_n, n_pts_n, tris, active, done_n), None

    init = (pts, n_pts, tris, active, jnp.bool_(False))
    (pts, n_pts, tris, active, done), _ = jax.lax.scan(
        body, init, None, length=max_iterations)

    mink = pts[:, 2]
    normals, dists = _triangle_info(mink, tris)
    closest = jnp.argmin(jnp.where(active, dists, _BIG))
    tri = tris[closest]
    n = normals[closest]
    depth = dists[closest]

    # barycentric coordinates of the projection of the origin onto the face
    # (getBarycentricCoordinates, math.cpp:1374-1398)
    a, b, c = mink[tri[0]], mink[tri[1]], mink[tri[2]]
    p = n * depth
    v0, v1, v2 = b - a, c - a, p - a
    d00 = dot(v0, v0)
    d01 = dot(v0, v1)
    d11 = dot(v1, v1)
    d20 = dot(v2, v0)
    d21 = dot(v2, v1)
    denom = d00 * d11 - d01 * d01
    denom = jnp.where(jnp.abs(denom) < 1e-6, 1.0, denom)
    bv = (d11 * d20 - d01 * d21) / denom
    bw = (d00 * d21 - d01 * d20) / denom
    bu = 1.0 - bv - bw

    pa = bu * pts[tri[0], 0] + bv * pts[tri[1], 0] + bw * pts[tri[2], 0]
    pb = bu * pts[tri[0], 1] + bv * pts[tri[1], 1] + bw * pts[tri[2], 1]
    point = 0.5 * (pa + pb)
    return point, n, depth
