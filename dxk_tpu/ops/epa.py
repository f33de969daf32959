"""Fixed-iteration EPA (expanding polytope algorithm).

Rebuild of epaCollisionInfo (/root/reference/src/physics/collision_epa.h:96-168,
collision_epa.cpp) for TPU. The reference maintains a half-edge polytope with
dynamic arrays capped at 1024 slots and 20 iterations; here the polytope is a
fixed-size triangle soup with an active mask, updated with TPU-friendly dense
ops only (no scatters, no argsort — both lower poorly on TPU):

  - per iteration, triangle normals/distances are recomputed from the point
    array (cheaper than bookkeeping adjacency),
  - the horizon of the new support point is the set of directed edges of
    removed (visible) triangles whose reverse edge is not also removed,
    found with one (3T x 3T) masked comparison,
  - the next triangle list = top_k over [surviving old triangles ++ horizon
    fan triangles], a dense compaction instead of free-slot scatters.

Like the reference, the function always returns its best approximation
(closest face) even when the iteration cap is hit (collision_epa.h:94-96).

Point rows are (pA, pB, minkowski) triples so the contact point is recovered
via barycentric coordinates on the closest face (collision_epa.h:154-167).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dxk_tpu.core.maths import cross, dot
from dxk_tpu.ops.tpu_gather import (onehot_gather, onehot_gather_1d,
                                    onehot_gather_int, onehot_select_row)

_BIG = 3.4e38


def _triangle_info(mink, tris, active):
    """Normals (pointing away from origin) + distance to origin for all
    triangle slots (epa_simplex::getTriangleInfo)."""
    g = onehot_gather(mink, tris)            # (T, 3, 3)
    a, b, c = g[:, 0], g[:, 1], g[:, 2]
    n = cross(b - a, c - a)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    d = dot(n, a)
    flip = d < 0.0
    n = jnp.where(flip[:, None], -n, n)
    return n, jnp.abs(d)


def epa(support_a, support_b, a_params, b_params, simplex,
        max_iterations=20):
    """simplex: (4, 3, 3) from gjk_intersection (rows a/b/c/d, fields
    pA/pB/minkowski). Returns (point (3,), normal (3,), depth ())."""
    P = 4 + max_iterations                 # point capacity
    T = 4 + 2 * max_iterations + 4         # triangle slots (EPA adds 2/point)
    dtype = simplex.dtype

    pts = jnp.zeros((P, 3, 3), dtype).at[:4].set(simplex)
    n_pts = jnp.int32(4)

    tris = jnp.zeros((T, 3), jnp.int32)
    tris = tris.at[0].set(jnp.array([0, 1, 3]))
    tris = tris.at[1].set(jnp.array([1, 2, 3]))
    tris = tris.at[2].set(jnp.array([2, 0, 3]))
    tris = tris.at[3].set(jnp.array([0, 2, 1]))
    active = jnp.zeros((T,), bool).at[:4].set(True)

    def body(carry, _):
        pts, n_pts, tris, active, done = carry
        mink = pts[:, 2]

        normals, dists = _triangle_info(mink, tris, active)
        scores = jnp.where(active, dists, _BIG)
        closest = jnp.argmin(scores)
        n_c = onehot_select_row(normals, closest)

        pa = support_a(a_params, n_c)
        pb = support_b(b_params, -n_c)
        w = pa - pb
        converged = (dot(w, n_c)
                     - onehot_select_row(dists, closest)) < 0.01
        step = ~done & ~converged

        # faces visible from w get removed
        visible = active & (dot(normals, w[None, :]) > dists)

        # directed edges of all triangle slots, flagged if their tri is
        # visible; horizon = visible edge whose reverse is not visible.
        # The reverse-edge lookup goes through a (P, P) point-incidence
        # matrix built with one-hot matmuls (MXU) instead of a (3T, 3T)
        # comparison matrix — far smaller intermediates at large batches.
        edges = jnp.concatenate([tris[:, [0, 1]], tris[:, [1, 2]],
                                 tris[:, [2, 0]]], axis=0)        # (3T, 2)
        eflag = jnp.concatenate([visible, visible, visible])
        u, v = edges[:, 0], edges[:, 1]
        U = jax.nn.one_hot(u, P, dtype=jnp.float32)               # (3T, P)
        V = jax.nn.one_hot(v, P, dtype=jnp.float32)
        M = jnp.einsum("e,ep,eq->pq", eflag.astype(jnp.float32), U, V)
        rev_present = jnp.einsum("ep,eq,pq->e", V, U, M) > 0.5
        horizon = eflag & ~rev_present

        # candidate triangle list: survivors ++ horizon fans (u, v, new)
        new_tris = jnp.stack([u, v, jnp.full_like(u, n_pts)], axis=-1)
        cand_tris = jnp.concatenate([tris, new_tris])             # (4T, 3)
        cand_flag = jnp.concatenate([active & ~visible, horizon])

        # dense compaction to T slots, preserving order (old tris first)
        n4 = cand_flag.shape[0]
        order_score = jnp.where(cand_flag, n4 - jnp.arange(n4), -jnp.arange(n4))
        _, sel = jax.lax.top_k(order_score, T)
        tris_n = onehot_gather_int(cand_tris, sel)
        active_n = onehot_gather_1d(cand_flag.astype(jnp.float32), sel) > 0.5

        overflow = jnp.sum(cand_flag) > T
        added_any = jnp.any(horizon) & (n_pts < P) & ~overflow

        # masked write instead of dynamic-update-slice (slow batched on TPU)
        write = (jnp.arange(P) == n_pts) & step & added_any
        pts_n = jnp.where(write[:, None, None],
                          jnp.stack([pa, pb, w])[None], pts)
        n_pts_n = jnp.where(step & added_any, n_pts + 1, n_pts)

        done_n = done | converged | (step & ~added_any)
        tris = jnp.where(step & added_any, tris_n, tris)
        active = jnp.where(step & added_any, active_n, active)
        return (pts_n, n_pts_n, tris, active, done_n), None

    init = (pts, n_pts, tris, active, jnp.bool_(False))
    (pts, n_pts, tris, active, done), _ = jax.lax.scan(
        body, init, None, length=max_iterations)

    mink = pts[:, 2]
    normals, dists = _triangle_info(mink, tris, active)
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
