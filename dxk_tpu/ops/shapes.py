"""World-space collider flattening and AABB computation — the TPU version of
getWorldSpaceColliders (/root/reference/src/physics/physics.cpp:631-756).

The reference walks the ECS once per substep, transforming each collider to
world space and computing its AABB with a per-type switch. Here the same math
runs for all colliders at once, branchlessly: every type's world parameters
and AABB formula is evaluated and the right one selected by mask. Collider
counts are small relative to pair counts, so the redundancy is noise.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from dxk_tpu.core.maths import quat_mul, quat_rotate
from dxk_tpu.ops.tpu_gather import gather_rows
from dxk_tpu.scene.scene import (SHAPE_BOX, SHAPE_CAPSULE, SHAPE_CYLINDER,
                                 SHAPE_SPHERE, Scene)


@struct.dataclass
class WorldColliders:
    """World-space collider parameters, same field semantics as
    `Colliders` but with `a`, `b`, `rot` transformed to world space
    (for boxes, `b` remains half-extents)."""

    ctype: jnp.ndarray
    a: jnp.ndarray
    b: jnp.ndarray
    r: jnp.ndarray
    rot: jnp.ndarray
    friction: jnp.ndarray
    restitution: jnp.ndarray
    body: jnp.ndarray
    hull_id: jnp.ndarray


def world_colliders(scene: Scene, pos, rot) -> WorldColliders:
    """Transform all colliders by their owning body's transform."""
    c = scene.colliders
    bpos = gather_rows(pos, c.body)
    brot = gather_rows(rot, c.body)

    a_w = quat_rotate(brot, c.a) + bpos
    b_seg = quat_rotate(brot, c.b) + bpos      # capsule/cylinder endpoint
    rot_w = quat_mul(brot, c.rot)              # box/hull orientation

    is_seg = (c.ctype == SHAPE_CAPSULE) | (c.ctype == SHAPE_CYLINDER)
    b_w = jnp.where(is_seg[:, None], b_seg, c.b)  # boxes keep half-extents

    return WorldColliders(
        ctype=c.ctype, a=a_w, b=b_w, r=c.r, rot=rot_w,
        friction=c.friction, restitution=c.restitution,
        body=c.body, hull_id=c.hull_id)


def collider_aabbs(scene: Scene, w: WorldColliders):
    """Per-collider world AABBs (physics.cpp:673-754). Returns
    (min (C,3), max (C,3))."""
    big = jnp.float32(3.4e38)

    # sphere: center +- r
    sph_min = w.a - w.r[:, None]
    sph_max = w.a + w.r[:, None]

    # capsule: box around both sphere ends (physics.cpp:682-697)
    cap_min = jnp.minimum(w.a, w.b) - w.r[:, None]
    cap_max = jnp.maximum(w.a, w.b) + w.r[:, None]

    # cylinder: exact per-axis extents (physics.cpp:699-720)
    axis = w.b - w.a
    aa = jnp.maximum(jnp.sum(axis * axis, axis=-1, keepdims=True), 1e-12)
    e = w.r[:, None] * jnp.sqrt(jnp.maximum(0.0, 1.0 - axis * axis / aa))
    cyl_min = jnp.minimum(w.a - e, w.b - e)
    cyl_max = jnp.maximum(w.a + e, w.b + e)

    # box: |R| * half_extents around center (obb.transformToAABB)
    from dxk_tpu.core.maths import quat_to_mat3
    R = quat_to_mat3(w.rot)
    ext = jnp.einsum("cij,cj->ci", jnp.abs(R), w.b)
    box_min = w.a - ext
    box_max = w.a + ext

    # hull: rotate padded vertices, masked min/max
    if scene.hulls is not None:
        verts = scene.hulls.vertices[w.hull_id]          # (C, Vmax, 3)
        mask = scene.hulls.vertex_mask[w.hull_id]        # (C, Vmax)
        vw = quat_rotate(w.rot[:, None, :], verts) + w.a[:, None, :]
        hull_min = jnp.min(jnp.where(mask[..., None], vw, big), axis=1)
        hull_max = jnp.max(jnp.where(mask[..., None], vw, -big), axis=1)
    else:
        hull_min = sph_min
        hull_max = sph_max

    t = w.ctype[:, None]
    mn = jnp.where(t == SHAPE_SPHERE, sph_min,
         jnp.where(t == SHAPE_CAPSULE, cap_min,
         jnp.where(t == SHAPE_CYLINDER, cyl_min,
         jnp.where(t == SHAPE_BOX, box_min, hull_min))))
    mx = jnp.where(t == SHAPE_SPHERE, sph_max,
         jnp.where(t == SHAPE_CAPSULE, cap_max,
         jnp.where(t == SHAPE_CYLINDER, cyl_max,
         jnp.where(t == SHAPE_BOX, box_max, hull_max))))
    return mn, mx
