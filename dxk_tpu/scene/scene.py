"""Scene and state pytrees — the TPU-native replacement for the reference's
entt ECS (/root/reference/src/scene/scene.h) and per-frame arena state
(/root/reference/src/physics/physics.cpp:1205-1230).

Design: a `Scene` is the *static* description (collider shapes, joint wiring,
masses, candidate collision pairs) produced once by `SceneBuilder`; a `State`
is the dynamic struct-of-arrays pytree that `physics_step` maps to a new
`State`. This mirrors the reference's own SoA solver layout
(rigid_body.h:6-16 "Don't change the order — required by the SIMD code"),
generalized from 8-wide lanes to full arrays.

Conventions:
  - `num_bodies` real bodies; index `num_bodies` is the static "dummy" body
    (invMass = 0, identity rotation), exactly like the reference's
    dummyRigidBodyIndex (physics.cpp:1214, 1279). All body arrays have length
    num_bodies + 1.
  - Colliders with no rigid body map to the dummy body.
  - Quaternions are (x, y, z, w).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

# Shape type ids. The reference distinguishes AABB and OBB
# (physics.h:59-70); here both are BOX with a local rotation offset, since
# the reference itself promotes AABB -> OBB whenever the body rotates
# (physics.cpp:722-734).
SHAPE_SPHERE = 0
SHAPE_CAPSULE = 1
SHAPE_CYLINDER = 2
SHAPE_BOX = 3
SHAPE_HULL = 4
SHAPE_TYPE_NAMES = ("sphere", "capsule", "cylinder", "box", "hull")

# Owner types (physics.h:49-57).
OWNER_RIGID_BODY = 0
OWNER_STATIC = 1
OWNER_FORCE_FIELD = 2
OWNER_TRIGGER = 3


@struct.dataclass
class Colliders:
    """SoA collider table (reference collider_union, physics.h:84-106).

    Field meaning by shape type:
      sphere:   a = local center, r = radius
      capsule:  a, b = local segment endpoints, r = radius
      cylinder: a, b = local cap centers, r = radius
      box:      a = local center, b = half extents, rot = local rotation
      hull:     a = local position, rot = local rotation, hull_id = geometry
    """

    ctype: jnp.ndarray      # (C,) int32
    a: jnp.ndarray          # (C, 3) f32
    b: jnp.ndarray          # (C, 3) f32
    r: jnp.ndarray          # (C,) f32
    rot: jnp.ndarray        # (C, 4) f32
    friction: jnp.ndarray   # (C,) f32
    restitution: jnp.ndarray  # (C,) f32
    body: jnp.ndarray       # (C,) int32 — owning body (num_bodies = none)
    owner_type: jnp.ndarray  # (C,) int32
    owner_index: jnp.ndarray  # (C,) int32 — FF/trigger slot for non-RB owners
    hull_id: jnp.ndarray    # (C,) int32


@struct.dataclass
class HullGeometry:
    """Padded convex hull vertex/face soup shared by hull colliders
    (reference bounding_hull_geometry, bounding_volumes.h:208-218). Face
    planes (outward normals + offsets) serve exact ray casts
    (ray::intersectHull)."""

    vertices: jnp.ndarray    # (H, Vmax, 3) f32, padded with first vertex
    vertex_mask: jnp.ndarray  # (H, Vmax) bool
    face_normals: jnp.ndarray = None   # (H, Fmax, 3) outward unit normals
    face_offsets: jnp.ndarray = None   # (H, Fmax) plane d: n.x + d = 0 form
    face_mask: jnp.ndarray = None      # (H, Fmax) bool
    # merged-polygon topology for the SAT/clip contact paths
    # (scene/hull_topology.py): unique face normals, ordered vertex loops
    # (as local positions), unique edge directions
    poly_normals: jnp.ndarray = None   # (H, FU, 3)
    poly_offsets: jnp.ndarray = None   # (H, FU)
    poly_mask: jnp.ndarray = None      # (H, FU) bool
    loop_pts: jnp.ndarray = None       # (H, FU, LM, 3) local positions
    loop_len: jnp.ndarray = None       # (H, FU) int32
    edge_dirs: jnp.ndarray = None      # (H, EU, 3) unit, sign-deduped
    edge_mask: jnp.ndarray = None      # (H, EU) bool


@struct.dataclass
class BodyParams:
    """Static per-body parameters (reference rigid_body_component,
    rigid_body.h:18-46). Arrays sized (N+1,) with the dummy at index N."""

    inv_mass: jnp.ndarray          # (N+1,)
    inv_inertia: jnp.ndarray       # (N+1, 3, 3) local-space inverse inertia
    local_cog: jnp.ndarray         # (N+1, 3)
    gravity_factor: jnp.ndarray    # (N+1,)
    linear_damping: jnp.ndarray    # (N+1,)
    angular_damping: jnp.ndarray   # (N+1,)


@struct.dataclass
class PairGroup:
    """A static candidate-pair table for one (typeA, typeB) bucket — the
    TPU replacement for the reference's runtime 6x6 type matrix bucketing
    (collision_narrow.cpp:2343-2453). Pairs are pre-pruned and pre-oriented
    (colliderA.type <= colliderB.type) at build time, since collider types
    and ownership are static."""

    type_a: int = struct.field(pytree_node=False)
    type_b: int = struct.field(pytree_node=False)
    pairs: jnp.ndarray = None        # (P, 2) int32 collider indices
    max_narrow: int = struct.field(pytree_node=False, default=0)
    # max_narrow: how many overlapping pairs proceed to narrowphase (fixed
    # capacity; overflow is counted, mirroring the reference's conservative
    # arena sizing physics.cpp:1212-1228).
    # contact solver phase (builder contact_phases=K splits each bucket so
    # pairs in the same phase rarely share a dynamic body; the solver runs
    # phases as sequential Gauss-Seidel slices — the build-time analog of
    # scheduleConstraintsSIMD's conflict-free batching, constraints.cpp:51-184)
    phase: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class JointsOfType:
    """Static parameters for one joint type, SoA. Fields not applicable to a
    type are zero-sized or ignored. Layouts follow constraints.h."""

    body_a: jnp.ndarray           # (J,) int32
    body_b: jnp.ndarray           # (J,) int32
    local_anchor_a: jnp.ndarray   # (J, 3)
    local_anchor_b: jnp.ndarray   # (J, 3)
    # distance
    length: jnp.ndarray = None            # (J,)
    # fixed / slider
    initial_inv_rotation_difference: jnp.ndarray = None  # (J, 4)
    # hinge
    local_axis_a: jnp.ndarray = None      # (J, 3) hinge/cone-twist/slider axis
    local_axis_b: jnp.ndarray = None      # (J, 3)
    local_tangent_a: jnp.ndarray = None   # (J, 3)
    local_bitangent_a: jnp.ndarray = None  # (J, 3)
    local_tangent_b: jnp.ndarray = None   # (J, 3)
    # limits: hinge (min,max rotation), cone-twist (swing, twist),
    # slider (neg,pos distance). Disabled limits use the reference's
    # sentinel convention (hinge: min>0 / max<0 disables, physics.h:225-230).
    limit_min: jnp.ndarray = None         # (J,)
    limit_max: jnp.ndarray = None         # (J,)
    # conflict-free coloring for the "colored" Gauss-Seidel solver mode
    # (build-time analog of scheduleConstraintsSIMD, constraints.cpp:51-184)
    color: jnp.ndarray = None             # (J,) int32
    num_colors: int = struct.field(pytree_node=False, default=1)


@struct.dataclass
class MotorControls:
    """Dynamic motor parameters for the actuated joint types. The reference
    mutates constraint components per step (learned_locomotion.cpp:73-91);
    here controls are data carried in `State` and consumed by the solver.

    motor_type: 0 = velocity motor, 1 = position motor (constraints.h:41-45).
    `target` means velocity for velocity motors, angle/distance for position
    motors. max_torque <= 0 disables a motor.
    """

    hinge_motor_type: jnp.ndarray      # (Jh,) int32
    hinge_target: jnp.ndarray          # (Jh,)
    hinge_max_torque: jnp.ndarray      # (Jh,)

    ct_swing_motor_type: jnp.ndarray   # (Jc,) int32
    ct_swing_target: jnp.ndarray       # (Jc,)
    ct_swing_axis_angle: jnp.ndarray   # (Jc,) swing motor axis angle
    ct_swing_max_torque: jnp.ndarray   # (Jc,)
    ct_twist_motor_type: jnp.ndarray   # (Jc,) int32
    ct_twist_target: jnp.ndarray       # (Jc,)
    ct_twist_max_torque: jnp.ndarray   # (Jc,)

    slider_motor_type: jnp.ndarray     # (Js,) int32
    slider_target: jnp.ndarray         # (Js,)
    slider_max_force: jnp.ndarray      # (Js,)


@struct.dataclass
class ClothParams:
    """Static cloth description (reference cloth_component,
    cloth.h / cloth.cpp:7-80): a grid of particles with
    stretch/shear/bend distance constraints."""

    # ((num_x, num_y, particle_offset), ...) per cloth — N cloths bake
    # into one flat particle/constraint system (cloths never interact, so
    # one fused solve == the reference's per-component loop,
    # physics.cpp:1354-1358)
    grids: tuple = struct.field(pytree_node=False, default=())
    inv_masses: jnp.ndarray = None       # (P,)
    constraints: jnp.ndarray = None      # (K, 2) int32 particle pairs
    rest_lengths: jnp.ndarray = None     # (K,)
    inv_mass_sums: jnp.ndarray = None    # (K,) (wA+wB)/stiffness
    init_positions: jnp.ndarray = None   # (P, 3)
    triangles: jnp.ndarray = None        # (T, 3) int32 for wind force
    gravity_factor: jnp.ndarray = None   # (P,) per-particle (per cloth)
    damping: jnp.ndarray = None          # (P,)
    # particle collision radius vs rigid colliders + heightfield; 0 = no
    # collision (cloth-vs-rigid is absent in the reference — cloth.cpp has
    # no collider queries — this exceeds parity; one-way coupling)
    thickness: jnp.ndarray = None        # (P,)


@struct.dataclass
class Scene:
    """Full static scene description."""

    num_bodies: int = struct.field(pytree_node=False)
    body_params: BodyParams = None
    colliders: Colliders = None
    hulls: Optional[HullGeometry] = None
    # broadphase candidate tables, one per active type bucket
    pair_groups: tuple = struct.field(default=())        # tuple[PairGroup]
    # contact solver phases (builder contact_phases) and fused-broadphase
    # K-select width (0 = masked-table broadphase)
    num_contact_phases: int = struct.field(pytree_node=False, default=1)
    broadphase_k: int = struct.field(pytree_node=False, default=0)
    # dynamic-broadphase algorithm when broadphase_k > 0: "kselect" sweeps
    # the O(C^2) pair space in tiles; "sap" sorts by x-min and sweeps a
    # sap_window-tile band (ops/pallas/sap_broadphase.py) with the
    # sap_broad colliders (huge statics, e.g. the ground) in a dense side
    # pass — the TPU answer to collision_broad.cpp's sort-and-sweep
    broadphase_kind: str = struct.field(pytree_node=False, default="kselect")
    sap_window: int = struct.field(pytree_node=False, default=4)
    sap_broad: tuple = struct.field(pytree_node=False, default=())
    overlap_groups: tuple = struct.field(default=())     # tuple[PairGroup]
    overlap_pairs: jnp.ndarray = None   # (Q, 2) int32 trigger/FF pairs
    # joints
    distance: Optional[JointsOfType] = None
    ball: Optional[JointsOfType] = None
    fixed: Optional[JointsOfType] = None
    hinge: Optional[JointsOfType] = None
    cone_twist: Optional[JointsOfType] = None
    slider: Optional[JointsOfType] = None
    default_controls: Optional[MotorControls] = None
    # force fields: net force of all global (collider-less) force fields
    global_ff_force: jnp.ndarray = None      # (3,)
    ff_forces: jnp.ndarray = None            # (F, 3) localized FF forces
    cloth: Optional[ClothParams] = None
    heightfield: Any = None   # Optional[dxk_tpu.ops.heightmap.Heightfield]
    # initial dynamic state snapshot
    init_pos: jnp.ndarray = None
    init_rot: jnp.ndarray = None

    @property
    def dummy_body(self) -> int:
        return self.num_bodies

    def initial_state(self) -> "State":
        n1 = self.num_bodies + 1
        cloth = None
        if self.cloth is not None:
            p = self.cloth.init_positions
            cloth = ClothState(positions=p, prev_positions=p,
                               velocities=jnp.zeros_like(p),
                               forces=jnp.zeros_like(p))
        return State(
            pos=self.init_pos,
            rot=self.init_rot,
            lin_vel=jnp.zeros((n1, 3), jnp.float32),
            ang_vel=jnp.zeros((n1, 3), jnp.float32),
            force_acc=jnp.zeros((n1, 3), jnp.float32),
            torque_acc=jnp.zeros((n1, 3), jnp.float32),
            controls=self.default_controls,
            cloth=cloth,
        )


@struct.dataclass
class ClothState:
    positions: jnp.ndarray       # (P, 3)
    prev_positions: jnp.ndarray  # (P, 3)
    velocities: jnp.ndarray      # (P, 3)
    forces: jnp.ndarray          # (P, 3)


@struct.dataclass
class State:
    """Dynamic body state. Arrays sized (N+1, ...), dummy last.

    `pos`/`rot` are the entity transform (like the reference's
    physics_transform1_component); velocities live at the COG
    (rigid_body.h:40-45). `force_acc`/`torque_acc` are cleared by
    `physics_step` after integration, so external pokes write into them
    between steps (physics.cpp:624-628)."""

    pos: jnp.ndarray        # (N+1, 3)
    rot: jnp.ndarray        # (N+1, 4)
    lin_vel: jnp.ndarray    # (N+1, 3)
    ang_vel: jnp.ndarray    # (N+1, 3)
    force_acc: jnp.ndarray  # (N+1, 3)
    torque_acc: jnp.ndarray  # (N+1, 3)
    controls: Optional[MotorControls] = None
    cloth: Optional[ClothState] = None


@struct.dataclass
class StepInfo:
    """Per-step observability — the reference's profiler stats
    (physics.cpp:1258-1262) and event callbacks (physics.cpp:952-1178)
    expressed as data."""

    num_broadphase_overlaps: jnp.ndarray   # () int32
    num_contacts: jnp.ndarray              # () int32
    broadphase_overflow: jnp.ndarray       # () int32 pairs dropped at capacity
    trigger_overlap: jnp.ndarray = None    # (Q,) bool per static overlap pair
    # collision events as data (handleCollisionCallbacks,
    # physics.cpp:1037-1178): the solved contact-pair slots this step, with
    # per-pair summed normal impulse. Frame-over-frame begin/end diffing
    # lives in dxk_tpu.events (the sorted-merge of physics.cpp:1100-1152).
    contact_pairs: jnp.ndarray = None      # (P, 2) int32 collider ids (-1 hf)
    contact_mask: jnp.ndarray = None       # (P,) bool pair has live points
    contact_impulse: jnp.ndarray = None    # (P,) f32 summed normal impulse
    # first non-finite pipeline stage (utils/validate.STAGE_NAMES index) or
    # -1; only populated with PhysicsSettings.validate=True (VALIDATE analog,
    # physics.cpp:807-926)
    validate_stage: jnp.ndarray = None     # () int32
