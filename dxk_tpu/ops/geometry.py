"""Closest-point primitives (reference bounding_volumes.cpp) — batched,
branchless versions used by the narrowphase."""

from __future__ import annotations

import jax.numpy as jnp

from dxk_tpu.core.maths import clamp01, dot, squared_length


def closest_point_point_segment(q, a, b):
    """Closest point on segment [a, b] to point q."""
    ab = b - a
    t = clamp01(dot(q - a, ab) / jnp.maximum(squared_length(ab), 1e-12))
    return a + t[..., None] * ab


def closest_point_point_aabb(q, min_corner, max_corner):
    return jnp.clip(q, min_corner, max_corner)


def closest_point_segment_segment(p1, q1, p2, q2):
    """Closest points between segments [p1,q1] and [p2,q2] (Ericson 5.1.9,
    as used by the reference's closestPoint_SegmentSegment,
    bounding_volumes.cpp:1251). Returns (c1, c2, sq_distance)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = squared_length(d1)
    e = squared_length(d2)
    f = dot(d2, r)
    c = dot(d1, r)
    b = dot(d1, d2)
    denom = a * e - b * b

    s = jnp.where(denom > 1e-12, clamp01((b * f - c * e) /
                                         jnp.where(denom > 1e-12, denom, 1.0)), 0.0)
    t = (b * s + f) / jnp.maximum(e, 1e-12)

    s = jnp.where(t < 0.0, clamp01(-c / jnp.maximum(a, 1e-12)),
                  jnp.where(t > 1.0, clamp01((b - c) / jnp.maximum(a, 1e-12)), s))
    t = clamp01(t)

    # degenerate segments
    both_pts = (a <= 1e-12) & (e <= 1e-12)
    s = jnp.where(both_pts, 0.0, jnp.where(a <= 1e-12, 0.0, s))
    t = jnp.where(both_pts, 0.0, jnp.where(e <= 1e-12, 0.0, t))

    c1 = p1 + s[..., None] * d1
    c2 = p2 + t[..., None] * d2
    return c1, c2, squared_length(c1 - c2)
