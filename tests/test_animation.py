"""Skeletal animation (ops/animation.py) vs animation.cpp semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.core.maths import quat_from_axis_angle, quat_mul, quat_rotate
from dxk_tpu.ops.animation import (AnimationClip, Trs, blend_local,
                                   first_root_transform, global_transforms,
                                   instance_init, instance_update,
                                   last_root_transform, make_clip,
                                   sample_clip, skin_points,
                                   skinning_matrices, trs_identity,
                                   trs_invert, trs_mul, trs_to_mat4)


def _q(axis, ang):
    return np.asarray(quat_from_axis_angle(jnp.asarray(axis, jnp.float32),
                                           float(ang)))


def _simple_clip(**kw):
    """2 joints: j0 translates, j1 rotates about z; root motion along x."""
    qz = [_q((0, 0, 1), a) for a in (0.0, 0.5, 1.2)]
    return make_clip(
        pos_tracks=[([0.0, 1.0, 2.0], [(0, 0, 0), (0, 1, 0), (0, 3, 0)]),
                    ([], [])],
        rot_tracks=[([], []),
                    ([0.0, 0.5, 2.0], qz)],
        scale_tracks=[([0.0, 2.0], [(1, 1, 1), (2, 2, 2)]), ([], [])],
        length=2.0,
        root_pos=([0.0, 2.0], [(0, 0, 0), (4, 0, 0)]),
        **kw)


# ---------------------------------------------------------------------------
# channel sampling vs a scalar transcription of animation.cpp:220-330


def _ref_sample(ts, vals, length, time, is_quat=False):
    vals = np.asarray(vals, np.float32)
    n = len(ts)
    if time >= length:
        return vals[n - 1]
    if n == 1:
        return vals[0]
    first = None
    for i in range(n - 1):
        if time < ts[i + 1]:
            first = i
            break
    t = (time - ts[first]) / (ts[first + 1] - ts[first])
    a, b = vals[first], vals[first + 1]
    if is_quat and float(np.dot(a, b)) < 0.0:
        b = -b
    out = a + (b - a) * t
    if is_quat:
        out = out / np.linalg.norm(out)
    return out


def test_position_sampling_matches_reference():
    clip = _simple_clip()
    ts = [0.0, 1.0, 2.0]
    vals = [(0, 0, 0), (0, 1, 0), (0, 3, 0)]
    for time in (0.0, 0.3, 1.0, 1.5, 1.999, 2.0, 5.0):
        loc, _ = sample_clip(clip, time)
        ref = _ref_sample(ts, vals, 2.0, min(time, 2.0))
        np.testing.assert_allclose(np.asarray(loc.pos[0]), ref, atol=1e-6)


def test_rotation_sampling_nlerp_and_hemisphere():
    qz = [_q((0, 0, 1), a) for a in (0.0, 0.5, 1.2)]
    # force a hemisphere flip on the second segment
    qz[2] = -qz[2]
    clip = make_clip(
        pos_tracks=[([], [])], rot_tracks=[([0.0, 0.5, 2.0], qz)],
        scale_tracks=[([], [])], length=2.0)
    for time in (0.1, 0.5, 0.7, 1.4):
        loc, _ = sample_clip(clip, time)
        ref = _ref_sample([0.0, 0.5, 2.0], qz, 2.0, time, is_quat=True)
        got = np.asarray(loc.rot[0])
        if np.dot(got, ref) < 0:
            ref = -ref
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_single_keyframe_and_unanimated():
    clip = make_clip(
        pos_tracks=[([0.5], [(1, 2, 3)]), ([], [])],
        rot_tracks=[([], []), ([], [])],
        scale_tracks=[([], []), ([], [])], length=2.0)
    loc, root = sample_clip(clip, 1.3)
    np.testing.assert_allclose(np.asarray(loc.pos[0]), (1, 2, 3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(loc.pos[1]), (0, 0, 0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(loc.rot[1]), (0, 0, 0, 1),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(root.pos), 0.0, atol=1e-6)


def test_root_motion_and_bake_xz():
    clip = _simple_clip()
    _, root = sample_clip(clip, 1.0)
    np.testing.assert_allclose(np.asarray(root.pos), (2, 0, 0), atol=1e-6)
    baked = _simple_clip(bake_root_xz=True)
    loc_b, root_b = sample_clip(baked, 1.0)
    np.testing.assert_allclose(np.asarray(root_b.pos), (0, 0, 0), atol=1e-6)
    # the xz root translation moved into joint 0's local pose
    np.testing.assert_allclose(np.asarray(loc_b.pos[0]), (2, 1, 0),
                               atol=1e-6)


# ---------------------------------------------------------------------------
# hierarchy + skinning


def test_global_transforms_compose_parent_chain():
    parents = np.array([-1, 0, 1])
    rot1 = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), np.pi / 2)
    local = Trs(
        pos=jnp.array([[1.0, 0, 0], [1.0, 0, 0], [1.0, 0, 0]]),
        rot=jnp.stack([jnp.array([0.0, 0, 0, 1]), rot1,
                       jnp.array([0.0, 0, 0, 1])]),
        scale=jnp.ones((3, 3)))
    g = global_transforms(parents, local)
    np.testing.assert_allclose(np.asarray(g.pos[0]), (1, 0, 0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.pos[1]), (2, 0, 0), atol=1e-6)
    # joint 1 rotated z90: its child's +x offset becomes +y
    np.testing.assert_allclose(np.asarray(g.pos[2]), (2, 1, 0), atol=1e-6)


def test_scale_propagates_like_reference_trs():
    parents = np.array([-1, 0])
    local = Trs(pos=jnp.array([[0.0, 0, 0], [1.0, 0, 0]]),
                rot=jnp.tile(jnp.array([[0.0, 0, 0, 1.0]]), (2, 1)),
                scale=jnp.array([[2.0, 2, 2], [1.0, 1, 1]]))
    g = global_transforms(parents, local)
    # a.rotation * (a.scale * b.position) + a.position (math.cpp:486)
    np.testing.assert_allclose(np.asarray(g.pos[1]), (2, 0, 0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.scale[1]), (2, 2, 2), atol=1e-6)


def test_bind_pose_gives_identity_skinning():
    # bind pose: j0 at origin, j1 at (0, 1, 0)
    parents = np.array([-1, 0])
    local = Trs(pos=jnp.array([[0.0, 0, 0], [0.0, 1, 0]]),
                rot=jnp.tile(jnp.array([[0.0, 0, 0, 1.0]]), (2, 1)),
                scale=jnp.ones((2, 3)))
    g = global_transforms(parents, local)
    bind = np.asarray(jax.vmap(trs_to_mat4)(g))
    inv_bind = np.linalg.inv(bind)
    mats = np.asarray(skinning_matrices(g, inv_bind))
    np.testing.assert_allclose(mats, np.tile(np.eye(4), (2, 1, 1)),
                               atol=1e-6)
    # skinning any point by identity mats is a no-op
    pts = jnp.array([[0.3, 0.7, 0.0], [0.0, 1.5, 0.2]])
    ids = jnp.array([[0, 1], [1, 0]])
    w = jnp.array([[0.5, 0.5], [1.0, 0.0]])
    out = skin_points(jnp.asarray(mats), pts, ids, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-6)


def test_skinning_follows_joint_motion():
    parents = np.array([-1])
    bind_local = Trs(pos=jnp.zeros((1, 3)),
                     rot=jnp.array([[0.0, 0, 0, 1.0]]),
                     scale=jnp.ones((1, 3)))
    g0 = global_transforms(parents, bind_local)
    inv_bind = np.linalg.inv(np.asarray(jax.vmap(trs_to_mat4)(g0)))
    moved = bind_local.replace(pos=jnp.array([[3.0, 0, 0]]))
    g1 = global_transforms(parents, moved)
    mats = skinning_matrices(g1, inv_bind)
    out = skin_points(mats, jnp.array([[1.0, 2.0, 3.0]]),
                      jnp.array([[0]]), jnp.array([[1.0]]))
    np.testing.assert_allclose(np.asarray(out[0]), (4.0, 2.0, 3.0),
                               atol=1e-6)


# ---------------------------------------------------------------------------
# blending + instances


def test_blend_local_is_reference_trs_lerp():
    a = trs_identity((2,))
    b = Trs(pos=jnp.array([[2.0, 0, 0], [0.0, 4, 0]]),
            rot=jnp.tile(
                quat_from_axis_angle(jnp.array([0.0, 0, 1.0]), 1.0)[None],
                (2, 1)),
            scale=jnp.full((2, 3), 3.0))
    m = blend_local(a, b, 0.5)
    np.testing.assert_allclose(np.asarray(m.pos[0]), (1, 0, 0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.scale[0]), 2.0, atol=1e-6)
    nrm = np.linalg.norm(np.asarray(m.rot), axis=-1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-6)   # NLERP normalizes
    m2 = blend_local(a, b, 2.0)                       # clamped to 1
    np.testing.assert_allclose(np.asarray(m2.pos[0]), (2, 0, 0), atol=1e-6)


def test_instance_delta_root_motion_accumulates_clip_displacement():
    # non-looping: the deltas integrate the clip's full root displacement
    # exactly (a looping clip wraps at t==length and, reference-exact,
    # resets lastRootMotion — dropping the final sub-step)
    clip = _simple_clip(looping=False)                # root: x 0 -> 4 over 2 s
    inst = instance_init(clip)
    step = jax.jit(lambda i: instance_update(clip, i, 0.1))
    total = np.zeros(3)
    for _ in range(20):                               # exactly one clip length
        inst, _, delta = step(inst)
        total += np.asarray(delta.pos)
    np.testing.assert_allclose(total, (4.0, 0, 0), atol=1e-4)


def test_instance_loop_wrap_keeps_delta_continuous():
    clip = _simple_clip()
    inst = instance_init(clip)
    step = jax.jit(lambda i: instance_update(clip, i, 0.3))
    deltas = []
    for _ in range(14):                               # crosses the 2 s wrap
        inst, _, delta = step(inst)
        deltas.append(float(delta.pos[0]))
    d = np.asarray(deltas)
    assert d.max() < 1.0                              # no 4-unit jump at wrap
    assert d.min() > -0.5
    # reference-exact: each wrap resets lastRootMotion to the FIRST root
    # transform (animation.cpp:578-582), dropping the unsampled tail —
    # 3.6 + 0.2 (wrap at 2.1->0.1) + 3.6 + 0.4 (wrap at 2.2->0.2) = 7.8
    np.testing.assert_allclose(d.sum(), 7.8, atol=1e-4)


def test_instance_non_looping_clamps():
    clip = _simple_clip(looping=False)
    inst = instance_init(clip)
    step = jax.jit(lambda i: instance_update(clip, i, 0.5))
    for _ in range(10):
        inst, loc, delta = step(inst)
    assert float(inst.time) == pytest.approx(2.0)
    np.testing.assert_allclose(np.asarray(delta.pos), 0.0, atol=1e-6)


def test_first_last_root_transforms():
    clip = _simple_clip()
    np.testing.assert_allclose(np.asarray(first_root_transform(clip).pos),
                               (0, 0, 0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(last_root_transform(clip).pos),
                               (4, 0, 0), atol=1e-6)


def test_sampling_vmaps_over_time():
    clip = _simple_clip()
    times = jnp.linspace(0.0, 2.0, 16)
    loc, root = jax.vmap(lambda t: sample_clip(clip, t))(times)
    assert loc.pos.shape == (16, 2, 3)
    assert root.pos.shape == (16, 3)
    # monotone root x
    assert np.all(np.diff(np.asarray(root.pos[:, 0])) >= -1e-6)


def test_trs_invert_mul_roundtrip():
    t = Trs(pos=jnp.array([1.0, 2, 3]),
            rot=quat_from_axis_angle(jnp.array([0.0, 1.0, 0]), 0.7),
            scale=jnp.array([2.0, 2.0, 2.0]))
    r = trs_mul(trs_invert(t), t)
    np.testing.assert_allclose(np.asarray(r.pos), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.rot), (0, 0, 0, 1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.scale), 1.0, atol=1e-6)
