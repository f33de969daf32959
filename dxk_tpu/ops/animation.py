"""Skeletal animation: clip sampling, pose blending, hierarchy
composition, skinning matrices, root-motion instances.

Rebuilds the live half of the reference's animation stack
(src/animation/animation.cpp):

- samplePosition/Rotation/Scale (animation.cpp:~220-330): per-channel
  keyframe search + lerp (rotations sign-fixed then NLERP — the
  reference's quat lerp normalizes, math.h:673). Here every joint's
  channels live in ONE padded (J, K) table and the search is a
  branchless mask-sum — all joints sample in parallel, and the whole
  thing vmaps over time/instances/envs.
- sampleAnimation root-motion extraction + bake flags
  (animation.cpp:333-396).
- blendLocalTransforms (403-410): trs nlerp per joint. NOTE the
  reference does NOT hemisphere-fix in blend (only in sampleRotation);
  we mirror that exactly.
- getSkinningMatricesFromLocalTransforms (412-455): parent-chain
  composition. The reference walks joints in index order relying on
  i > parentID; we unroll the same order at trace time (parents are a
  static numpy array), so there is NO dynamic gather on device.
- animation_instance::update (570-594): time advance, loop wrap,
  delta-root-motion = invert(lastRootMotion) * rootMotion.

The GPU skinning path (skinning.cpp) is render-build-only; `skin_points`
provides the same linear-blend-skinning math for debug rendering and
cloth anchoring. animation_blend_tree_1d is `#if 0` dead code in the
reference and is intentionally not rebuilt.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from dxk_tpu.core.maths import (quat_conj, quat_mul, quat_normalize,
                                quat_rotate, quat_to_mat3)

INF = np.float32(np.inf)


# ---------------------------------------------------------------------------
# trs algebra with scale (math.cpp:477-505; the physics core ignores scale
# like the reference DLL, so these live here with the animation code)


@struct.dataclass
class Trs:
    pos: jnp.ndarray     # (..., 3)
    rot: jnp.ndarray     # (..., 4) xyzw
    scale: jnp.ndarray   # (..., 3)


def trs_identity(batch_shape=()):
    return Trs(pos=jnp.zeros(batch_shape + (3,), jnp.float32),
               rot=jnp.broadcast_to(
                   jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
                   batch_shape + (4,)),
               scale=jnp.ones(batch_shape + (3,), jnp.float32))


def trs_mul(a: Trs, b: Trs) -> Trs:
    """operator*(trs, trs) (math.cpp:477-488)."""
    return Trs(pos=quat_rotate(a.rot, a.scale * b.pos) + a.pos,
               rot=quat_mul(a.rot, b.rot),
               scale=a.scale * b.scale)


def trs_invert(t: Trs) -> Trs:
    """invert(trs) (math.cpp:491-505)."""
    inv_rot = quat_conj(t.rot)
    inv_scale = 1.0 / t.scale
    return Trs(pos=quat_rotate(inv_rot, inv_scale * -t.pos),
               rot=inv_rot, scale=inv_scale)


def trs_lerp(a: Trs, b: Trs, t) -> Trs:
    """lerp(trs) (math.h:675-681): component lerp, quat NLERP, no
    hemisphere fix — exactly the reference."""
    t = jnp.asarray(t, jnp.float32)[..., None]
    return Trs(pos=a.pos + (b.pos - a.pos) * t,
               rot=quat_normalize(a.rot + (b.rot - a.rot) * t),
               scale=a.scale + (b.scale - a.scale) * t)


def trs_to_mat4(t: Trs) -> jnp.ndarray:
    """trsToMat4: rotation*scale in the upper 3x3, translation column."""
    m3 = quat_to_mat3(t.rot) * t.scale[..., None, :]
    top = jnp.concatenate([m3, t.pos[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
                              t.pos.shape[:-1] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# clips: padded per-joint channel tables


@struct.dataclass
class Channel:
    """One keyframe channel for every joint: timestamps padded with +inf
    (so the branchless search never selects a padded slot), values padded
    by repeating the last real keyframe."""
    ts: jnp.ndarray      # (J, K)
    vals: jnp.ndarray    # (J, K, D)
    count: jnp.ndarray   # (J,) int32


@struct.dataclass
class AnimationClip:
    """animation_clip (animation.h:71-97) with channels flattened into
    fixed-shape tables; the root-motion joint is the trailing row of each
    channel (index J)."""
    pos: Channel         # D=3, rows 0..J-1 joints, row J root motion
    rot: Channel         # D=4
    scale: Channel       # D=3
    animated: jnp.ndarray        # (J+1,) bool (row J = rootMotionJoint)
    length: jnp.ndarray          # () f32
    looping: bool = struct.field(pytree_node=False, default=True)
    bake_root_rotation: bool = struct.field(pytree_node=False, default=False)
    bake_root_xz: bool = struct.field(pytree_node=False, default=False)
    bake_root_y: bool = struct.field(pytree_node=False, default=False)


def _pack_channel(tracks, dim, default):
    """tracks: list of (ts list, vals list) per joint (empty = unanimated)."""
    k = max(1, max((len(t) for t, _ in tracks), default=1))
    J = len(tracks)
    ts = np.full((J, k), INF, np.float32)
    vals = np.tile(np.asarray(default, np.float32), (J, k, 1))
    count = np.zeros((J,), np.int32)
    for j, (t, v) in enumerate(tracks):
        n = len(t)
        count[j] = n
        if n:
            ts[j, :n] = np.asarray(t, np.float32)
            vv = np.asarray(v, np.float32).reshape(n, dim)
            vals[j, :n] = vv
            vals[j, n:] = vv[-1]
    return Channel(ts=jnp.asarray(ts), vals=jnp.asarray(vals),
                   count=jnp.asarray(count))


def make_clip(pos_tracks, rot_tracks, scale_tracks, length,
              root_pos=None, root_rot=None, root_scale=None,
              looping=True, bake_root_rotation=False,
              bake_root_xz=False, bake_root_y=False) -> AnimationClip:
    """Build a clip from per-joint (timestamps, values) track lists (the
    assimp-import path, animation.cpp loadAnimation); the optional root_*
    tracks become the rootMotionJoint row."""
    empty = ([], [])
    pos_tracks = list(pos_tracks) + [root_pos or empty]
    rot_tracks = list(rot_tracks) + [root_rot or empty]
    scale_tracks = list(scale_tracks) + [root_scale or empty]
    animated = np.array([len(t) > 0 or len(r) > 0 or len(s) > 0
                         for (t, _), (r, __), (s, ___)
                         in zip(pos_tracks, rot_tracks, scale_tracks)])
    return AnimationClip(
        pos=_pack_channel(pos_tracks, 3, (0.0, 0.0, 0.0)),
        rot=_pack_channel(rot_tracks, 4, (0.0, 0.0, 0.0, 1.0)),
        scale=_pack_channel(scale_tracks, 3, (1.0, 1.0, 1.0)),
        animated=jnp.asarray(animated),
        length=jnp.asarray(length, jnp.float32),
        looping=looping, bake_root_rotation=bake_root_rotation,
        bake_root_xz=bake_root_xz, bake_root_y=bake_root_y)


def _sample_channel(ch: Channel, time, length, hemi_fix=False):
    """samplePosition/Rotation/Scale (animation.cpp:220-330), all joints
    at once. time: scalar. Returns (J_rows, D)."""
    k = ch.ts.shape[1]
    last = jnp.take_along_axis(
        ch.vals, jnp.maximum(ch.count - 1, 0)[:, None, None], axis=1)[:, 0]
    if k == 1:
        return last
    # first j with time < ts[j+1]  ==  #{jj in [1, count-1] : ts[jj] <= time}
    # (padding is +inf so jj >= count never counts); clamp to count-2
    jj = jnp.arange(k)[None, :]
    idx = jnp.sum(((jj >= 1) & (jj <= ch.count[:, None] - 1)
                   & (ch.ts <= time)).astype(jnp.int32), axis=1)
    idx = jnp.minimum(idx, jnp.maximum(ch.count - 2, 0))
    oh_a = (jj == idx[:, None]).astype(ch.vals.dtype)
    oh_b = (jj == (idx + 1)[:, None]).astype(ch.vals.dtype)
    # select, don't multiply: 0 * inf (the ts padding) would make NaN
    t0 = jnp.sum(jnp.where(oh_a > 0, ch.ts, 0.0), axis=1)
    t1 = jnp.sum(jnp.where(oh_b > 0, ch.ts, 0.0), axis=1)
    a = jnp.einsum("jk,jkd->jd", oh_a, ch.vals)
    b = jnp.einsum("jk,jkd->jd", oh_b, ch.vals)
    if hemi_fix:  # sampleRotation's dot < 0 flip (animation.cpp:292-295)
        s = jnp.where(jnp.sum(a * b, -1) < 0.0, -1.0, 1.0)
        b = b * s[:, None]
    t = (time - t0) / jnp.where(t1 == t0, 1.0, t1 - t0)
    out = a + (b - a) * t[:, None]
    if hemi_fix:  # quat lerp normalizes (math.h:673)
        out = quat_normalize(out)
    # count==1 or time >= length -> last keyframe
    deg = (ch.count <= 1) | (time >= length)
    return jnp.where(deg[:, None], last, out)


def sample_clip(clip: AnimationClip, time):
    """sampleAnimation (animation.cpp:333-396). Returns (locals: Trs over
    J joints, root_motion: Trs) with the bake flags applied. Unanimated
    joints get identity (incl. an unanimated root row)."""
    time = jnp.clip(jnp.asarray(time, jnp.float32), 0.0, clip.length)
    pos = _sample_channel(clip.pos, time, clip.length)
    rot = _sample_channel(clip.rot, time, clip.length, hemi_fix=True)
    scale = _sample_channel(clip.scale, time, clip.length)
    ident = trs_identity((pos.shape[0],))
    an = clip.animated[:, None]
    all_t = Trs(pos=jnp.where(an, pos, ident.pos),
                rot=jnp.where(an, rot, ident.rot),
                scale=jnp.where(an, scale, ident.scale))
    loc = Trs(pos=all_t.pos[:-1], rot=all_t.rot[:-1], scale=all_t.scale[:-1])
    root = Trs(pos=all_t.pos[-1], rot=all_t.rot[-1], scale=all_t.scale[-1])
    if clip.bake_root_rotation:
        r0 = Trs(pos=jnp.zeros(3), rot=root.rot, scale=jnp.ones(3))
        j0 = trs_mul(r0, Trs(pos=loc.pos[0], rot=loc.rot[0],
                             scale=loc.scale[0]))
        loc = Trs(pos=loc.pos.at[0].set(j0.pos),
                  rot=loc.rot.at[0].set(j0.rot),
                  scale=loc.scale.at[0].set(j0.scale))
        root = root.replace(rot=jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32))
    if clip.bake_root_xz:
        loc = loc.replace(pos=loc.pos.at[0, 0].add(root.pos[0])
                          .at[0, 2].add(root.pos[2]))
        root = root.replace(pos=root.pos * jnp.array([0.0, 1.0, 0.0]))
    if clip.bake_root_y:
        loc = loc.replace(pos=loc.pos.at[0, 1].add(root.pos[1]))
        root = root.replace(pos=root.pos * jnp.array([1.0, 0.0, 1.0]))
    return loc, root


def blend_local(l1: Trs, l2: Trs, t) -> Trs:
    """blendLocalTransforms (animation.cpp:403-410)."""
    return trs_lerp(l1, l2, jnp.clip(t, 0.0, 1.0))


def _edge_root_transform(clip: AnimationClip, first: bool) -> Trs:
    """getFirst/LastRootTransform (animation.cpp:502-556)."""
    j = clip.pos.ts.shape[0] - 1
    if first:
        ip = ir = is_ = jnp.zeros((), jnp.int32)
    else:
        ip = jnp.maximum(clip.pos.count[j] - 1, 0)
        ir = jnp.maximum(clip.rot.count[j] - 1, 0)
        is_ = jnp.maximum(clip.scale.count[j] - 1, 0)
    pos = clip.pos.vals[j, ip]
    rot = clip.rot.vals[j, ir]
    scale = clip.scale.vals[j, is_]
    animated = clip.animated[j]
    ident = trs_identity()
    t = Trs(pos=jnp.where(animated, pos, ident.pos),
            rot=jnp.where(animated, rot, ident.rot),
            scale=jnp.where(animated, scale, ident.scale))
    if clip.bake_root_rotation:
        t = t.replace(rot=ident.rot)
    if clip.bake_root_xz:
        t = t.replace(pos=t.pos * jnp.array([0.0, 1.0, 0.0]))
    if clip.bake_root_y:
        t = t.replace(pos=t.pos * jnp.array([1.0, 0.0, 1.0]))
    return t


def first_root_transform(clip):
    return _edge_root_transform(clip, True)


def last_root_transform(clip):
    return _edge_root_transform(clip, False)


# ---------------------------------------------------------------------------
# hierarchy composition + skinning


def global_transforms(parents, local: Trs, world: Trs = None) -> Trs:
    """getSkinningMatricesFromLocalTransforms' parent walk
    (animation.cpp:434-455). `parents` is a STATIC numpy int array
    (-1 = root), joints topologically sorted (i > parents[i], same
    invariant the reference asserts); the walk unrolls at trace time so
    the device sees pure arithmetic, no gathers."""
    parents = np.asarray(parents)
    if world is None:
        world = trs_identity()
    out = []
    for i in range(parents.shape[0]):
        li = Trs(pos=local.pos[i], rot=local.rot[i], scale=local.scale[i])
        parent = world if parents[i] < 0 else out[parents[i]]
        out.append(trs_mul(parent, li))
    return Trs(pos=jnp.stack([t.pos for t in out]),
               rot=jnp.stack([t.rot for t in out]),
               scale=jnp.stack([t.scale for t in out]))


def skinning_matrices(global_t: Trs, inv_bind) -> jnp.ndarray:
    """trsToMat4(global) * invBindTransform (animation.cpp:430,452).
    inv_bind: (J, 4, 4)."""
    return trs_to_mat4(global_t) @ jnp.asarray(inv_bind, jnp.float32)


def skin_points(mats, points, joint_ids, weights):
    """Linear-blend skinning (the DLL-side analog of skinning.cpp's GPU
    path; also anchors cloth to skeletons like skinCloth, cloth.cpp:365).
    mats (J,4,4), points (V,3), joint_ids (V,W) int, weights (V,W)."""
    p4 = jnp.concatenate([points, jnp.ones_like(points[:, :1])], axis=-1)
    m = jnp.take(mats, joint_ids, axis=0)            # (V, W, 4, 4)
    skinned = jnp.einsum("vwij,vj->vwi", m, p4)      # (V, W, 4)
    return jnp.sum(skinned * weights[..., None], axis=1)[:, :3]


# ---------------------------------------------------------------------------
# instances (time + root-motion tracking)


@struct.dataclass
class AnimationInstance:
    """animation_instance (animation.h:135-152)."""
    time: jnp.ndarray        # ()
    last_root: Trs


def instance_init(clip: AnimationClip, start_time=0.0) -> AnimationInstance:
    return AnimationInstance(time=jnp.asarray(start_time, jnp.float32),
                             last_root=first_root_transform(clip))


def instance_update(clip: AnimationClip, inst: AnimationInstance, dt):
    """animation_instance::update (animation.cpp:570-594): advance time,
    wrap (loop) or clamp, sample, and return the DELTA root motion
    invert(lastRootMotion) * rootMotion. Returns (inst', locals, delta)."""
    time = inst.time + dt
    wrapped = time >= clip.length
    if clip.looping:
        time = jnp.where(wrapped, jnp.mod(time, clip.length), time)
        first = first_root_transform(clip)
        last_root = jax.tree_util.tree_map(
            lambda a, b: jnp.where(wrapped, a, b), first, inst.last_root)
    else:
        time = jnp.minimum(time, clip.length)
        last_root = inst.last_root
    loc, root = sample_clip(clip, time)
    delta = trs_mul(trs_invert(last_root), root)
    return AnimationInstance(time=time, last_root=root), loc, delta
