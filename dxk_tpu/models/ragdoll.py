"""Humanoid ragdoll — constants ported 1:1 from
/root/reference/src/physics/ragdoll.cpp:10-169: 14 bodies, 17 colliders
(capsules + 2 box feet), 7 cone-twist + 6 hinge joints, density 985 kg/m^3,
global scale 0.42.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List

import numpy as np

from dxk_tpu.scene.builder import (SceneBuilder, _np_quat_from_axis_angle,
                                   _np_quat_rotate)

SCALE = 0.42                  # ragdoll.cpp:12
DENSITY = 985.0               # ragdoll.cpp:16
FRICTION = 1.0                # ragdoll.cpp:17
RESTITUTION = 0.2             # ragdoll.cpp:19

BODY_PART_NAMES = [
    "torso", "head", "left_upper_arm", "left_lower_arm", "right_upper_arm",
    "right_lower_arm", "left_upper_leg", "left_lower_leg", "left_foot",
    "left_toes", "right_upper_leg", "right_lower_leg", "right_foot",
    "right_toes",
]

# parent table (ragdoll.cpp:156-169); -1 = none
BODY_PART_PARENTS = [-1, 0, 0, 2, 0, 4, 0, 6, 7, 8, 0, 10, 11, 12]


def _d2r(d):
    return math.radians(d)


@dataclass
class Ragdoll:
    """Handle struct mirroring humanoid_ragdoll (ragdoll.h:6-82)."""

    bodies: Dict[str, int]
    body_ids: List[int]               # in BODY_PART_NAMES order
    parent_ids: List[int]             # parent body index or -1
    cone_twist_ids: List[int]         # 7, order ragdoll.h:61-67
    hinge_ids: List[int]              # 6, order ragdoll.h:69-74


def add_ragdoll(b: SceneBuilder, initial_hip_position=(0.0, 0.0, 0.0),
                initial_rotation=0.0) -> Ragdoll:
    """Add the ragdoll to a SceneBuilder. `initial_hip_position` /
    `initial_rotation` (about y) match humanoid_ragdoll::initialize
    (ragdoll.cpp:10, 126-134)."""
    s = SCALE
    rot_q = _np_quat_from_axis_angle([0.0, 1.0, 0.0], initial_rotation)
    hip = np.asarray(initial_hip_position, np.float64)

    def z_rot(deg):
        return _np_quat_from_axis_angle([0.0, 0.0, 1.0], _d2r(deg))

    ident = np.array([0.0, 0.0, 0.0, 1.0])

    # transforms (ragdoll.cpp:21-34)
    transforms = {
        "torso": (s * np.array([0.0, 0.0, 0.0]), ident),
        "head": (s * np.array([0.0, 1.45, 0.0]), ident),
        "left_upper_arm": (s * np.array([-0.6, 0.75, 0.0]), z_rot(-30)),
        "left_lower_arm": (s * np.array([-0.884, 0.044, -0.043]), z_rot(-20)),
        "right_upper_arm": (s * np.array([0.6, 0.75, 0.0]), z_rot(30)),
        "right_lower_arm": (s * np.array([0.884, 0.044, -0.043]), z_rot(20)),
        "left_upper_leg": (s * np.array([-0.371, -0.812, 0.0]), z_rot(-10)),
        "left_lower_leg": (s * np.array([-0.452, -1.955, 0.0]), z_rot(-3.5)),
        "left_foot": (s * np.array([-0.498, -2.585, -0.18]), ident),
        "left_toes": (s * np.array([-0.498, -2.585, -0.637]), ident),
        "right_upper_leg": (s * np.array([0.371, -0.812, 0.0]), z_rot(10)),
        "right_lower_leg": (s * np.array([0.452, -1.955, 0.0]), z_rot(3.5)),
        "right_foot": (s * np.array([0.498, -2.585, -0.18]), ident),
        "right_toes": (s * np.array([0.498, -2.585, -0.637]), ident),
    }

    # apply initial rotation + hip offset (ragdoll.cpp:126-134)
    placed = {}
    for name, (pos, rot) in transforms.items():
        new_rot = _quat_mul_np(rot_q, rot)
        new_pos = _np_quat_rotate(rot_q, pos) + hip
        placed[name] = (new_pos, new_rot)

    bodies = {}
    for name in BODY_PART_NAMES:
        pos, rot = placed[name]
        bodies[name] = b.add_body(position=pos, rotation=rot,
                                  kinematic=False, gravity_factor=1.0)

    def cap(name, a, bb, r):
        b.add_capsule_collider(bodies[name], s * np.asarray(a, np.float64),
                               s * np.asarray(bb, np.float64), s * r,
                               friction=FRICTION, restitution=RESTITUTION,
                               density=DENSITY)

    # colliders (ragdoll.cpp:36-107)
    cap("torso", [-0.2, 0.0, 0.0], [0.2, 0.0, 0.0], 0.25)
    cap("torso", [-0.16, 0.32, 0.0], [0.16, 0.32, 0.0], 0.2)
    cap("torso", [-0.14, 0.62, 0.0], [0.14, 0.62, 0.0], 0.22)
    cap("torso", [-0.14, 0.92, 0.0], [0.14, 0.92, 0.0], 0.2)
    cap("head", [0.0, -0.075, 0.0], [0.0, 0.075, 0.0], 0.25)
    for arm in ("left_upper_arm", "left_lower_arm", "right_upper_arm",
                "right_lower_arm"):
        cap(arm, [0.0, -0.2, 0.0], [0.0, 0.2, 0.0], 0.15)
    for leg in ("left_upper_leg", "right_upper_leg"):
        cap(leg, [0.0, -0.3, 0.0], [0.0, 0.3, 0.0], 0.25)
    for leg in ("left_lower_leg", "right_lower_leg"):
        cap(leg, [0.0, -0.3, 0.0], [0.0, 0.3, 0.0], 0.18)
    for foot in ("left_foot", "right_foot"):
        b.add_box_collider(bodies[foot], (0.0, 0.0, 0.0),
                           s * np.array([0.1587, 0.1, 0.3424]),
                           friction=FRICTION, restitution=RESTITUTION,
                           density=DENSITY)
    cap("left_toes", [-0.0587, 0.0, 0.0], [0.0587, 0.0, 0.0], 0.1)
    cap("right_toes", [-0.0587, 0.0, 0.0], [0.0587, 0.0, 0.0], 0.1)

    # joints (ragdoll.cpp:109-123). Anchors/axes are specified in the
    # *pre-placement* frame and the builder computes local anchors from the
    # already-placed bodies, so transform them by (rot_q, hip) too.
    def tp(base_name, local):
        pos, _ = transforms[base_name]
        p = pos + _np_quat_rotate(transforms[base_name][1], s * np.asarray(local, np.float64))
        return _np_quat_rotate(rot_q, p) + hip

    def td(base_name, local):
        d = _np_quat_rotate(transforms[base_name][1], np.asarray(local, np.float64))
        return _np_quat_rotate(rot_q, d)

    def gd(v):
        return _np_quat_rotate(rot_q, np.asarray(v, np.float64))

    B = bodies
    ct = []
    hg = []
    # neck
    ct.append(b.add_cone_twist_constraint(
        B["torso"], B["head"], tp("torso", [0, 1.2, 0]), gd([0, 1, 0]),
        _d2r(50), _d2r(90)))
    # left shoulder
    ct.append(b.add_cone_twist_constraint(
        B["torso"], B["left_upper_arm"], tp("torso", [-0.4, 1.0, 0]),
        gd([-1, 0, 0]), _d2r(130), _d2r(90)))
    # right shoulder
    ct.append(b.add_cone_twist_constraint(
        B["torso"], B["right_upper_arm"], tp("torso", [0.4, 1.0, 0]),
        gd([1, 0, 0]), _d2r(130), _d2r(90)))
    # left hip (swing limit disabled: -1)
    ct.append(b.add_cone_twist_constraint(
        B["torso"], B["left_upper_leg"], tp("torso", [-0.3, -0.25, 0]),
        td("left_upper_leg", [0, -1, 0]), -1.0, _d2r(30)))
    # left ankle
    ct.append(b.add_cone_twist_constraint(
        B["left_lower_leg"], B["left_foot"],
        tp("left_lower_leg", [0, -0.52, 0]),
        td("left_lower_leg", [0, -1, 0]), _d2r(75), _d2r(20)))
    # right hip
    ct.append(b.add_cone_twist_constraint(
        B["torso"], B["right_upper_leg"], tp("torso", [0.3, -0.25, 0]),
        td("right_upper_leg", [0, -1, 0]), -1.0, _d2r(30)))
    # right ankle
    ct.append(b.add_cone_twist_constraint(
        B["right_lower_leg"], B["right_foot"],
        tp("right_lower_leg", [0, -0.52, 0]),
        td("right_lower_leg", [0, -1, 0]), _d2r(75), _d2r(20)))

    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    # left elbow
    hg.append(b.add_hinge_constraint(
        B["left_upper_arm"], B["left_lower_arm"],
        tp("left_upper_arm", [0, -0.42, 0]),
        gd([inv_sqrt2, 0.0, inv_sqrt2]), _d2r(-5), _d2r(85)))
    # right elbow
    hg.append(b.add_hinge_constraint(
        B["right_upper_arm"], B["right_lower_arm"],
        tp("right_upper_arm", [0, -0.42, 0]),
        gd([inv_sqrt2, 0.0, -inv_sqrt2]), _d2r(-5), _d2r(85)))
    # left knee
    hg.append(b.add_hinge_constraint(
        B["left_upper_leg"], B["left_lower_leg"],
        tp("left_upper_leg", [0, -0.6, 0]), gd([1, 0, 0]),
        _d2r(-90), _d2r(5)))
    # left toes
    hg.append(b.add_hinge_constraint(
        B["left_foot"], B["left_toes"], tp("left_foot", [0, 0, -0.36]),
        gd([1, 0, 0]), _d2r(-45), _d2r(45)))
    # right knee
    hg.append(b.add_hinge_constraint(
        B["right_upper_leg"], B["right_lower_leg"],
        tp("right_upper_leg", [0, -0.6, 0]), gd([1, 0, 0]),
        _d2r(-90), _d2r(5)))
    # right toes
    hg.append(b.add_hinge_constraint(
        B["right_foot"], B["right_toes"], tp("right_foot", [0, 0, -0.36]),
        gd([1, 0, 0]), _d2r(-45), _d2r(45)))

    body_ids = [bodies[n] for n in BODY_PART_NAMES]
    parent_ids = [(body_ids[p] if p >= 0 else -1) for p in BODY_PART_PARENTS]
    return Ragdoll(bodies=bodies, body_ids=body_ids, parent_ids=parent_ids,
                   cone_twist_ids=ct, hinge_ids=hg)


def _quat_mul_np(a, b):
    av, aw = np.asarray(a[:3]), a[3]
    bv, bw = np.asarray(b[:3]), b[3]
    w = aw * bw - np.dot(av, bv)
    v = av * bw + bv * aw + np.cross(av, bv)
    return np.array([*v, w])
