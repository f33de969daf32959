"""Ray vs shape intersection — used by the poke interaction
(testPhysicsInteraction, /root/reference/src/physics/physics.cpp:555-629)
and the debug rasterizer. Mirrors the ray suite in bounding_volumes.cpp.

All functions return (t (), hit ()) with t >= 0 along the (not necessarily
normalized in the caller's sense — we assume normalized) direction.
"""

from __future__ import annotations

import jax.numpy as jnp

from dxk_tpu.core.maths import (cross, dot, normalize, noz, quat_inv_rotate,
                                squared_length)

_INF = 3.4e38


def ray_sphere(o, d, center, radius):
    m = o - center
    b = dot(m, d)
    c = dot(m, m) - radius * radius
    disc = b * b - c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = -b - sq
    t = jnp.where(t < 0.0, -b + sq, t)   # inside: exit point
    hit = ok & (t >= 0.0) & ~((c > 0.0) & (b > 0.0))
    return jnp.where(hit, t, _INF), hit


def ray_aabb(o, d, mn, mx):
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)
    t1 = (mn - o) * inv
    t2 = (mx - o) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0))
    t = jnp.where(tmin >= 0.0, tmin, tmax)
    return jnp.where(hit, t, _INF), hit


def ray_box(o, d, center, half, q):
    ol = quat_inv_rotate(q, o - center)
    dl = quat_inv_rotate(q, d)
    return ray_aabb(ol, dl, -half, half)


def _ray_infinite_cylinder(o, d, pa, axis, radius):
    """t for infinite cylinder around `axis` through pa; also returns the
    axial parameter s of the hit."""
    m = o - pa
    md = m - dot(m, axis)[..., None] * axis
    dd = d - dot(d, axis)[..., None] * axis
    a = squared_length(dd)
    b = dot(md, dd)
    c = squared_length(md) - radius * radius
    disc = b * b - a * c
    ok = (disc >= 0.0) & (a > 1e-12)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-b - sq) / jnp.maximum(a, 1e-12)
    t = jnp.where(t < 0.0, (-b + sq) / jnp.maximum(a, 1e-12), t)
    ok = ok & (t >= 0.0)
    return jnp.where(ok, t, _INF), ok


def ray_capsule(o, d, pa, pb, radius):
    axis_v = pb - pa
    ln = jnp.sqrt(jnp.maximum(squared_length(axis_v), 1e-12))
    axis = axis_v / ln[..., None]
    t_cyl, ok_cyl = _ray_infinite_cylinder(o, d, pa, axis, radius)
    s = dot(o + t_cyl[..., None] * d - pa, axis)
    ok_cyl = ok_cyl & (s >= 0.0) & (s <= ln)
    t1, h1 = ray_sphere(o, d, pa, radius)
    t2, h2 = ray_sphere(o, d, pb, radius)
    t = jnp.minimum(jnp.where(ok_cyl, t_cyl, _INF),
                    jnp.minimum(jnp.where(h1, t1, _INF),
                                jnp.where(h2, t2, _INF)))
    return t, t < _INF


def ray_cylinder(o, d, pa, pb, radius):
    axis_v = pb - pa
    ln = jnp.sqrt(jnp.maximum(squared_length(axis_v), 1e-12))
    axis = axis_v / ln[..., None]
    t_cyl, ok_cyl = _ray_infinite_cylinder(o, d, pa, axis, radius)
    s = dot(o + t_cyl[..., None] * d - pa, axis)
    ok_side = ok_cyl & (s >= 0.0) & (s <= ln)

    # caps: ray vs the two disk planes
    def cap(p, n):
        dn = dot(d, n)
        t = dot(p - o, n) / jnp.where(jnp.abs(dn) < 1e-12, 1e-12, dn)
        hitp = o + t[..., None] * d
        inside = squared_length(hitp - p) <= radius * radius
        ok = (t >= 0.0) & inside & (jnp.abs(dn) > 1e-12)
        return jnp.where(ok, t, _INF)

    t = jnp.minimum(jnp.where(ok_side, t_cyl, _INF),
                    jnp.minimum(cap(pa, axis), cap(pb, axis)))
    return t, t < _INF


def ray_hull(o, d, pos, q, verts, vmask, face_normals=None,
             face_offsets=None, face_mask=None):
    """Ray vs convex hull. With face planes: exact slab test over the faces
    (ray::intersectHull semantics); otherwise conservative AABB."""
    ol = quat_inv_rotate(q, o - pos)
    dl = quat_inv_rotate(q, d)
    big = 3.4e38
    if face_normals is None:
        mn = jnp.min(jnp.where(vmask[..., None], verts, big), axis=-2)
        mx = jnp.max(jnp.where(vmask[..., None], verts, -big), axis=-2)
        return ray_aabb(ol, dl, mn, mx)
    # entry = max t over faces the ray enters; exit = min t over faces it
    # leaves; hit if entry <= exit
    nd = jnp.sum(face_normals * dl[..., None, :], axis=-1)       # (..., F)
    no = jnp.sum(face_normals * ol[..., None, :], axis=-1) + face_offsets
    t = -no / jnp.where(jnp.abs(nd) < 1e-12,
                        jnp.where(nd >= 0, 1e-12, -1e-12), nd)
    entering = nd < 0.0
    t_in = jnp.where(face_mask & entering, t, -big)
    t_out = jnp.where(face_mask & ~entering, t, big)
    # parallel & outside a face plane -> miss
    outside_parallel = jnp.any(face_mask & (jnp.abs(nd) < 1e-12) & (no > 0.0),
                               axis=-1)
    t_enter = jnp.max(t_in, axis=-1)
    t_exit = jnp.min(t_out, axis=-1)
    hit = (t_enter <= t_exit) & (t_exit >= 0.0) & ~outside_parallel
    tt = jnp.where(t_enter >= 0.0, t_enter, t_exit)
    return jnp.where(hit, tt, big), hit


# -- editor-picking extras (ray::intersectPlane/Disk/Rectangle/Triangle/
# Torus, bounding_volumes.cpp:197-213, 249-265 and the disk/rect/torus
# suite) — completes the reference's ray-vs-bounding-volume set.


def ray_plane(o, d, normal, point):
    """ray::intersectPlane (bounding_volumes.cpp:197-213). Note the
    reference returns t even when negative (behind the origin); `hit` here
    additionally requires t >= 0 like the rest of this module."""
    dn = dot(d, normal)
    safe = jnp.where(jnp.abs(dn) < 1e-6, jnp.where(dn >= 0, 1e-6, -1e-6), dn)
    t = dot(point - o, normal) / safe
    hit = (jnp.abs(dn) >= 1e-6) & (t >= 0.0)
    return jnp.where(hit, t, _INF), hit


def ray_disk(o, d, pos, normal, radius):
    """ray::intersectDisk: plane hit within `radius` of `pos`."""
    t, hit = ray_plane(o, d, normal, pos)
    p = o + jnp.where(hit, t, 0.0)[..., None] * d
    hit = hit & (squared_length(p - pos) <= radius * radius)
    return jnp.where(hit, t, _INF), hit


def ray_rect(o, d, pos, tangent, bitangent, radius2):
    """ray::intersectRectangle: plane hit with |projection| within the
    half-extents `radius2` (2,) along tangent/bitangent."""
    n = cross(tangent, bitangent)
    t, hit = ray_plane(o, d, n, pos)
    off = o + jnp.where(hit, t, 0.0)[..., None] * d - pos
    px = jnp.abs(dot(off, tangent))
    py = jnp.abs(dot(off, bitangent))
    hit = hit & (px <= radius2[..., 0]) & (py <= radius2[..., 1])
    return jnp.where(hit, t, _INF), hit


def ray_triangle(o, d, a, b, c):
    """ray::intersectTriangle (bounding_volumes.cpp:249-265). Returns
    (t, hit, front_facing)."""
    n = noz(cross(b - a, c - a))
    t, hit = ray_plane(o, d, n, a)
    q = o + jnp.where(hit, t, 0.0)[..., None] * d
    # barycentric point-in-triangle
    v0, v1, v2 = c - a, b - a, q - a
    d00, d01 = dot(v0, v0), dot(v0, v1)
    d11 = dot(v1, v1)
    d20, d21 = dot(v2, v0), dot(v2, v1)
    denom = d00 * d11 - d01 * d01
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    u = (d11 * d20 - d01 * d21) / denom
    v = (d00 * d21 - d01 * d20) / denom
    hit = hit & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    front = dot(d, n) < 0.0
    return jnp.where(hit, t, _INF), hit, front


def ray_torus(o, d, pos, up_axis, major_radius, tube_radius, steps=96):
    """ray::intersectTorus. The reference solves the quartic analytically
    (solve4); on TPU a fixed-iteration sphere trace of the exact torus SDF
    is branchless and compiler-friendly (editor picking only — never on
    the physics hot path). Accuracy ~1e-3 of the trace range."""
    # rotate so the torus axis is +y (rotateFromTo in the reference)
    axis = normalize(up_axis, 1e-12)
    yhat = jnp.asarray([0.0, 1.0, 0.0])
    # quaternion-free frame change: build an orthonormal basis around axis
    h = axis + yhat
    hh = squared_length(h)
    # reflection mapping axis->y (Householder twice); degenerate when
    # axis == -y, handled by the fallback flip
    def to_local(v):
        refl = v - 2.0 * dot(v, h)[..., None] * h / jnp.maximum(hh, 1e-12)
        flipped = jnp.stack([v[..., 0], -v[..., 1], -v[..., 2]], axis=-1)
        return jnp.where(hh[..., None] > 1e-6, -refl, flipped)

    ol = to_local(o - pos)
    dl = to_local(d)

    def sdf(p):
        qx = jnp.sqrt(p[..., 0] ** 2 + p[..., 2] ** 2) - major_radius
        return jnp.sqrt(qx * qx + p[..., 1] ** 2) - tube_radius

    t = jnp.zeros(jnp.shape(dot(o, d)))
    max_t = 2.0 * (jnp.sqrt(squared_length(ol)) + major_radius + tube_radius)
    for _ in range(steps):
        p = ol + t[..., None] * dl
        t = jnp.minimum(t + sdf(p), max_t)
    hit = sdf(ol + t[..., None] * dl) < 1e-3 * jnp.maximum(
        major_radius + tube_radius, 1.0)
    hit = hit & (t >= 0.0) & (t < max_t)
    return jnp.where(hit, t, _INF), hit
