"""Minimal on-device debug renderer.

The reference ships a full D3D12 Forward+ renderer (src/rendering/,
src/dx/ — render build only). Per the rebuild's scope (SURVEY.md preamble,
BASELINE.json north star), that is replaced by a small JAX depth/RGB
ray-caster over the physics collider primitives: enough to visually debug
scenes and to serve as a pixel observation source for learning, fully
on-device and batchable with vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dxk_tpu.core.maths import cross, dot, normalize, quat_inv_rotate, quat_rotate
from dxk_tpu.ops import raycast as rc
from dxk_tpu.ops.geometry import closest_point_point_segment
from dxk_tpu.ops.shapes import world_colliders
from dxk_tpu.scene.scene import Scene, State

_INF = 3.4e38


def camera_rays(eye, target, up=(0.0, 1.0, 0.0), fov_deg=60.0,
                width=128, height=128):
    """Pinhole camera ray grid. Returns (origin (3,), dirs (H, W, 3))."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = normalize(target - eye)
    right = normalize(cross(fwd, up))
    cam_up = cross(right, fwd)

    aspect = width / height
    tan_h = jnp.tan(jnp.deg2rad(fov_deg) * 0.5)
    ys = jnp.linspace(tan_h, -tan_h, height)
    xs = jnp.linspace(-tan_h * aspect, tan_h * aspect, width)
    dirs = (fwd[None, None]
            + xs[None, :, None] * right[None, None]
            + ys[:, None, None] * cam_up[None, None])
    return eye, dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)


def _hit_all_colliders(scene: Scene, w, origin, direction):
    """Closest hit over all colliders for one ray. Returns (t, collider)."""
    o = jnp.broadcast_to(origin, w.a.shape)
    d = jnp.broadcast_to(direction, w.a.shape)

    t_sph, _ = rc.ray_sphere(o, d, w.a, w.r)
    t_cap, _ = rc.ray_capsule(o, d, w.a, w.b, w.r)
    t_cyl, _ = rc.ray_cylinder(o, d, w.a, w.b, w.r)
    t_box, _ = rc.ray_box(o, d, w.a, w.b, w.rot)
    if scene.hulls is not None:
        t_hull, _ = rc.ray_hull(o, d, w.a, w.rot,
                                scene.hulls.vertices[w.hull_id],
                                scene.hulls.vertex_mask[w.hull_id],
                                scene.hulls.face_normals[w.hull_id],
                                scene.hulls.face_offsets[w.hull_id],
                                scene.hulls.face_mask[w.hull_id])
    else:
        t_hull = jnp.full_like(t_sph, _INF)

    t = jnp.where(w.ctype == 0, t_sph,
        jnp.where(w.ctype == 1, t_cap,
        jnp.where(w.ctype == 2, t_cyl,
        jnp.where(w.ctype == 3, t_box, t_hull))))
    ci = jnp.argmin(t)
    return t[ci], ci


def _surface_normal(w, ci, p):
    """Analytic outward normal of collider `ci` at surface point `p`."""
    a = w.a[ci]
    b = w.b[ci]
    r = w.r[ci]
    q = w.rot[ci]
    ctype = w.ctype[ci]

    n_sphere = normalize(p - a + 1e-9)
    n_capsule = normalize(p - closest_point_point_segment(p, a, b) + 1e-9)

    axis = normalize(b - a + 1e-9)
    s = dot(p - a, axis)
    ln = jnp.linalg.norm(b - a)
    lateral = normalize(p - (a + s * axis) + 1e-9)
    n_cyl = jnp.where(s < 1e-4, -axis, jnp.where(s > ln - 1e-4, axis, lateral))

    pl = quat_inv_rotate(q, p - a) / jnp.maximum(b, 1e-9)
    face = jnp.argmax(jnp.abs(pl))
    n_box_l = jnp.sign(pl) * (jnp.arange(3) == face)
    n_box = quat_rotate(q, n_box_l)

    return jnp.where(ctype == 0, n_sphere,
           jnp.where(ctype == 1, n_capsule,
           jnp.where(ctype == 2, n_cyl,
           jnp.where(ctype == 3, n_box, n_sphere))))


def render(scene: Scene, state: State, eye, target, width=128, height=128,
           fov_deg=60.0, light_dir=(0.4, -0.8, 0.3)):
    """Render an (H, W, 3) RGB image + (H, W) depth of the physics scene.
    Jittable; vmap over states for batched env rendering."""
    w = world_colliders(scene, state.pos, state.rot)
    origin, dirs = camera_rays(eye, target, fov_deg=fov_deg,
                               width=width, height=height)
    light = -normalize(jnp.asarray(light_dir, jnp.float32))

    # per-body color from a low-discrepancy hue sequence
    n1 = scene.num_bodies + 1
    hues = jnp.mod(jnp.arange(n1 + 1) * 0.61803398875, 1.0)
    palette = _hsv_to_rgb(hues, 0.6, 0.95)         # (n1+1, 3)

    def shade(direction):
        t, ci = _hit_all_colliders(scene, w, origin, direction)
        hit = t < 1e9
        p = origin + t * direction
        n = _surface_normal(w, ci, p)
        lambert = 0.25 + 0.75 * jnp.maximum(dot(n, light), 0.0)
        body = w.body[ci]
        color = palette[jnp.where(hit, body, n1)] * lambert
        sky = jnp.array([0.05, 0.07, 0.12])
        return jnp.where(hit, color, sky), jnp.where(hit, t, 0.0)

    flat = dirs.reshape(-1, 3)
    rgb, depth = jax.vmap(shade)(flat)
    return rgb.reshape(height, width, 3), depth.reshape(height, width)


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    vv = jnp.full_like(h, v)
    pp = jnp.full_like(h, p)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [vv, q, pp, pp, t, vv])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, vv, vv, q, pp, pp])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [pp, pp, t, vv, vv, q])
    return jnp.stack([r, g, b], axis=-1)
