"""Ragdoll locomotion environment — pure-JAX rebuild of the reference's
learning stack (/root/reference/src/learning/learned_locomotion.cpp and
learning/loco_env.py): 66-float observation, 27-float action with EMA
smoothing (beta=0.1) driving position motors (max torque 200), DReCon-style
standing reward, head-height fall termination, 2%-per-step random pokes.

Where the reference steps ONE env per ctypes DLL call across 16 OS processes,
`LocoEnv.reset/step` are jit/vmap-friendly pure functions: thousands of
environments step in one XLA program (SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from dxk_tpu.core.maths import quat_conj, quat_mul, quat_rotate
from dxk_tpu.scene.builder import _np_quat_rotate as _np_rot
from dxk_tpu.models.ragdoll import BODY_PART_PARENTS, add_ragdoll
from dxk_tpu.physics import PhysicsSettings, apply_ray_impulse, physics_step
from dxk_tpu.scene import SceneBuilder
from dxk_tpu.scene.scene import Scene, State

NUM_BODY_PARTS = 14
NUM_CONE_TWIST = 7
NUM_HINGE = 6
ACTION_SIZE = NUM_CONE_TWIST * 3 + NUM_HINGE       # 27
OBS_SIZE = 3 + 6 * 6 + ACTION_SIZE                 # 66
MOTOR_TORQUE = 200.0                               # learned_locomotion.cpp:76,84-85
ACTION_EMA_BETA = 0.1                              # learned_locomotion.cpp:95
POKE_PROBABILITY = 0.02                            # learned_locomotion.cpp:458
POKE_STRENGTH = 1000.0                             # physics.h:404 default
DT = 1.0 / 60.0                                    # learned_locomotion.cpp:470-472
FALL_HEAD_HEIGHT = 1.0                             # learned_locomotion.cpp:152

# Procedural gait reference (the DReCon kinematic-clip stand-in: the
# reference engine tracks mocap walking clips via rp/rv/rlocal,
# learned_locomotion.cpp:329-357; we synthesize the clip analytically).
GAIT_FREQUENCY = 1.4          # Hz, one full left+right cycle
GAIT_LEG_LENGTH = 0.9         # m, hip-to-ground at ragdoll SCALE 0.42
GAIT_KNEE_RATIO = 1.4         # knee flexion amplitude / hip swing amplitude
GAIT_KNEE_PHASE = 0.4         # rad, knee flexion lags the forward hip swing
# Early termination on tracking failure (gait mode only): end the episode
# when the torso falls this far behind the gliding reference root. DReCon /
# DeepMimic-style — without it "stand still and collect rvcm=e^-1 forever"
# is a stable local optimum (measured round 4: 100% survival, vx 0.165 m/s
# at a 1.0 m/s target); with it a stander's episode ends after
# TRACK_FAIL_DIST / |v_target| seconds and walking strictly dominates.
TRACK_FAIL_DIST = 1.25        # m, horizontal torso-vs-reference-root error


@struct.dataclass
class EnvState:
    physics: State
    smoothed_action: jnp.ndarray     # (27,)
    rng: jnp.ndarray                 # PRNG key
    steps: jnp.ndarray               # () int32 episode step counter


class LocoEnv:
    """Build once; `reset`/`step` are pure functions of (state, action, key).

    Scene: ground AABB (center (0,-4), radius (20,4,20), friction 1,
    restitution 0.1) + ragdoll at hip (0, 1.25, 0) — resetPhysics
    (learned_locomotion.cpp:440-446)."""

    def __init__(self, solver_iterations: int = 30, solver_mode: str = "scan",
                 max_narrow_pairs: int = 48, enable_pokes: bool = True,
                 narrow_caps: dict = None,
                 torso_velocity_target=(0.0, 0.0, 0.0),
                 gait: bool = None):
        # torso_velocity_target: the DReCon-style walking target subtracted
        # in the vcm reward term (learned_locomotion.cpp:345 vcmError;
        # default vec3(0) = standing, learned_locomotion.cpp:41)
        self.torso_velocity_target = jnp.asarray(torso_velocity_target,
                                                 jnp.float32)
        # gait=True enables the procedural walking reference: leg joints of
        # the kinematic target pose oscillate at GAIT_FREQUENCY with hip
        # amplitude matched to the commanded speed, and the observation
        # gains sin/cos phase + reference-root tracking-error features
        # (obs_size 71). None = auto
        # (enabled iff the walk target is non-zero). Pass gait=True
        # explicitly in a curriculum so the obs size is stable across
        # stages (amplitude scales with each stage's target, reaching 0
        # amplitude == the standing reference at target 0).
        v_norm = float(np.linalg.norm(np.asarray(torso_velocity_target,
                                                 np.float64)))
        self.gait_enabled = bool(gait) if gait is not None else v_norm > 0.0
        # +2 phase features (sin/cos) and +3 reference-root tracking error:
        # the reward's rp term tracks a WORLD-frame drifting reference, and
        # the 66-float obs is torso-local — without the error the reward is
        # partially unobservable (DReCon feeds reference-relative state for
        # the same reason)
        self.obs_size = OBS_SIZE + (5 if self.gait_enabled else 0)
        # hip swing amplitude so foot ground-speed ~= commanded speed:
        # v = 2 * L * sin(A) * f  =>  A = asin(v / (2 L f))
        self.gait_hip_amp = float(np.arcsin(np.clip(
            v_norm / (2.0 * GAIT_LEG_LENGTH * GAIT_FREQUENCY), 0.0, 0.95)))
        self.gait_knee_amp = GAIT_KNEE_RATIO * self.gait_hip_amp
        b = SceneBuilder()
        ground = b.add_static(position=(0.0, -4.0, 0.0))
        b.add_box_collider(ground, (0, 0, 0), (20.0, 4.0, 20.0),
                           friction=1.0, restitution=0.1)
        self.ragdoll = add_ragdoll(b, initial_hip_position=(0.0, 1.25, 0.0))
        if solver_mode in ("fused", "fused_seq"):
            # the fused batched solver kernel requires static pair tables
            # (cap == table size): liveness arrives as masked prep, and the
            # solve itself is ~free, so uncapped tables trade a bigger
            # narrowphase for a 30-iteration solve fused into one kernel
            max_narrow_pairs = None
            narrow_caps = None
        self.scene: Scene = b.finalize(max_narrow_pairs_per_group=max_narrow_pairs)
        if narrow_caps:
            # per-(typeA,typeB) narrowphase capacity override, e.g.
            # {(1, 3): 16} to cap capsule-box slots (GJK/EPA cost is
            # proportional to capacity, not to live contacts)
            groups = tuple(
                g.replace(max_narrow=min(narrow_caps.get(
                    (g.type_a, g.type_b), g.max_narrow), g.pairs.shape[0]))
                for g in self.scene.pair_groups)
            self.scene = self.scene.replace(pair_groups=groups)
        self.settings = PhysicsSettings(
            num_rigid_solver_iterations=solver_iterations,
            solver_mode=solver_mode)
        self.enable_pokes = enable_pokes

        rag = self.ragdoll
        self.body_ids = jnp.asarray(np.array(rag.body_ids, np.int32))
        self.parent_ids = np.array(rag.parent_ids, np.int32)

        # observation body parts (learning_state order,
        # learned_locomotion.h:42-63): leftToes, rightToes, torso, head,
        # leftLowerArm, rightLowerArm
        name_to_id = rag.bodies
        self.obs_parts = jnp.asarray(np.array([
            name_to_id["left_toes"], name_to_id["right_toes"],
            name_to_id["torso"], name_to_id["head"],
            name_to_id["left_lower_arm"], name_to_id["right_lower_arm"],
        ], np.int32))
        self.torso_id = name_to_id["torso"]
        self.head_id = name_to_id["head"]

        # per-part 6 local feature points from the collider-union AABB
        # (getLocalPositions, learned_locomotion.cpp:195-253)
        self.local_points = jnp.asarray(self._compute_local_points())  # (14,6,3)

        # reward targets from the initial standing pose (training reset,
        # learned_locomotion.cpp:304-315): world positions/velocities of the
        # 6 points per part + local rotation relative to the parent
        init = self.scene.initial_state()
        tp, tv, tr = self._body_part_targets(init)
        self.target_positions = tp        # (14, 6, 3)
        self.target_velocities = tv       # (14, 6, 3)
        self.target_local_rotations = tr  # (14, 4)
        self.head_target_height = float(init.pos[self.head_id, 1])

        # gait-reference forward kinematics constants: world-space joint
        # anchors of hips/knees/ankles at the base (standing) pose, plus the
        # base world rotations per part. The reference pose is the base pose
        # with each leg chain rotated about the lateral (+x) axis at these
        # anchors (see _gait_pose).
        if self.gait_enabled:
            ct_ids = rag.cone_twist_ids
            hg_ids = rag.hinge_ids
            pos0 = np.asarray(init.pos)
            rot0 = np.asarray(init.rot)

            def world_anchor(arrs, j):
                a = int(np.asarray(arrs.body_a)[j])
                la = np.asarray(arrs.local_anchor_a)[j]
                return pos0[a] + _np_rot(rot0[a], la)

            jct, jh = self.scene.cone_twist, self.scene.hinge
            # ct order (ragdoll.h:61-67): neck, l/r shoulder, L hip, L ankle,
            # R hip, R ankle; hinge order: l/r elbow, L knee, L toes, R knee,
            # R toes (models/ragdoll.py)
            self._gait_anchors = jnp.asarray(np.stack([
                world_anchor(jct, ct_ids[3]),   # left hip
                world_anchor(jh, hg_ids[2]),    # left knee
                world_anchor(jct, ct_ids[4]),   # left ankle
                world_anchor(jct, ct_ids[5]),   # right hip
                world_anchor(jh, hg_ids[4]),    # right knee
                world_anchor(jct, ct_ids[6]),   # right ankle
            ]), jnp.float32)
            self._base_rot = jnp.asarray(rot0[np.asarray(rag.body_ids)],
                                         jnp.float32)  # (14, 4)
            bp = self.scene.body_params
            self._init_torso_cog = jnp.asarray(
                pos0[self.torso_id]
                + _np_rot(rot0[self.torso_id],
                          np.asarray(bp.local_cog)[self.torso_id]),
                jnp.float32)

        # action ranges (getPhysicsRanges, learned_locomotion.cpp:398-427)
        self.action_min, self.action_max = self._action_ranges()

    # -- build-time helpers ------------------------------------------------

    def _compute_local_points(self):
        c = self.scene.colliders
        ctype = np.asarray(c.ctype)
        a = np.asarray(c.a)
        bb = np.asarray(c.b)
        r = np.asarray(c.r)
        body = np.asarray(c.body)
        pts = np.zeros((NUM_BODY_PARTS, 6, 3), np.float32)
        for pi, bid in enumerate(np.asarray(self.body_ids)):
            mn = np.full(3, np.inf)
            mx = np.full(3, -np.inf)
            for ci in np.nonzero(body == bid)[0]:
                if ctype[ci] == 0:      # sphere
                    mn = np.minimum(mn, a[ci] - r[ci])
                    mx = np.maximum(mx, a[ci] + r[ci])
                elif ctype[ci] == 1:    # capsule
                    mn = np.minimum(mn, np.minimum(a[ci], bb[ci]) - r[ci])
                    mx = np.maximum(mx, np.maximum(a[ci], bb[ci]) + r[ci])
                elif ctype[ci] == 3:    # box (identity local rotation here)
                    mn = np.minimum(mn, a[ci] - bb[ci])
                    mx = np.maximum(mx, a[ci] + bb[ci])
                else:
                    raise NotImplementedError
            ctr = (mn + mx) * 0.5
            rad = (mx - mn) * 0.5
            for axis in range(3):
                e = np.zeros(3)
                e[axis] = rad[axis]
                pts[pi, axis] = ctr - e
                pts[pi, axis + 3] = ctr + e
        return pts

    def _body_part_targets(self, state: State):
        """getBodyPartTarget for all parts (learned_locomotion.cpp:255-274):
        world positions + point velocities of the 6 points, and rotation
        relative to the parent body."""
        ids = self.body_ids
        pos = state.pos[ids]
        rot = state.rot[ids]
        pts_w = quat_rotate(rot[:, None, :], self.local_points) + pos[:, None, :]

        # point velocity: v + w x (p - cog_world)
        bp = self.scene.body_params
        cog_w = pos + quat_rotate(rot, bp.local_cog[ids])
        v = state.lin_vel[ids][:, None, :]
        w = state.ang_vel[ids][:, None, :]
        vel_w = v + jnp.cross(w, pts_w - cog_w[:, None, :])

        parent = jnp.asarray(self.parent_ids)
        parent_rot = jnp.where((parent >= 0)[:, None],
                               state.rot[jnp.maximum(parent, 0)],
                               jnp.array([0.0, 0.0, 0.0, 1.0]))
        local_rot = quat_mul(rot, quat_conj(parent_rot))
        return pts_w, vel_w, local_rot

    def _action_ranges(self):
        j_ct = self.scene.cone_twist
        j_h = self.scene.hinge
        mins, maxs = [], []
        ct_order = self.ragdoll.cone_twist_ids
        for i in ct_order:
            swing = float(j_ct.limit_min[i])
            twist = float(j_ct.limit_max[i])
            mins += [-twist if twist >= 0 else -np.pi,
                     -swing if swing >= 0 else -np.pi, -np.pi]
            maxs += [twist if twist >= 0 else np.pi,
                     swing if swing >= 0 else np.pi, np.pi]
        for i in self.ragdoll.hinge_ids:
            mn = float(j_h.limit_min[i])
            mx = float(j_h.limit_max[i])
            mins.append(mn if mn <= 0 else -np.pi)
            maxs.append(mx if mx >= 0 else np.pi)
        return (jnp.asarray(np.array(mins, np.float32)),
                jnp.asarray(np.array(maxs, np.float32)))

    # -- controls ----------------------------------------------------------

    def _controls_from_action(self, smoothed):
        """applyAction -> updateConstraint (learned_locomotion.cpp:73-112):
        position motors with max torque 200 on all 13 joints."""
        ct = smoothed[:NUM_CONE_TWIST * 3].reshape(NUM_CONE_TWIST, 3)
        hinge_t = smoothed[NUM_CONE_TWIST * 3:]
        ct_ids = jnp.asarray(np.array(self.ragdoll.cone_twist_ids, np.int32))
        h_ids = jnp.asarray(np.array(self.ragdoll.hinge_ids, np.int32))

        c = self.scene.default_controls
        n_ct = c.ct_swing_target.shape[0]
        n_h = c.hinge_target.shape[0]
        ones_ct = jnp.ones((n_ct,), jnp.float32)
        ones_h = jnp.ones((n_h,), jnp.float32)
        return c.replace(
            hinge_motor_type=jnp.ones((n_h,), jnp.int32),
            hinge_target=jnp.zeros((n_h,)).at[h_ids].set(hinge_t),
            hinge_max_torque=ones_h * MOTOR_TORQUE,
            ct_swing_motor_type=jnp.ones((n_ct,), jnp.int32),
            ct_swing_target=jnp.zeros((n_ct,)).at[ct_ids].set(ct[:, 1]),
            ct_swing_axis_angle=jnp.zeros((n_ct,)).at[ct_ids].set(ct[:, 2]),
            ct_swing_max_torque=ones_ct * MOTOR_TORQUE,
            ct_twist_motor_type=jnp.ones((n_ct,), jnp.int32),
            ct_twist_target=jnp.zeros((n_ct,)).at[ct_ids].set(ct[:, 0]),
            ct_twist_max_torque=ones_ct * MOTOR_TORQUE,
        )

    # -- observation / reward ------------------------------------------------

    def _observe(self, state: State, smoothed, t=0.0) -> jnp.ndarray:
        """getState (learned_locomotion.cpp:133-148): everything in the
        torso-ground frame (identity rotation, origin = torso COG with
        y zeroed, getCoordinateSystem 114-122). With gait enabled, five
        features are appended: gait phase (sin, cos) — the policy must
        know where in the cycle the kinematic reference is — and the
        3-float reference-root tracking error (DReCon feeds the policy
        reference-relative state the same way)."""
        bp = self.scene.body_params
        torso_cog = (state.pos[self.torso_id]
                     + quat_rotate(state.rot[self.torso_id],
                                   bp.local_cog[self.torso_id]))
        origin = torso_cog * jnp.array([1.0, 0.0, 1.0])

        ids = self.obs_parts
        cog_w = state.pos[ids] + quat_rotate(state.rot[ids], bp.local_cog[ids])
        rel_pos = cog_w - origin
        vel = state.lin_vel[ids]

        cog_velocity = state.lin_vel[self.torso_id]
        parts = jnp.concatenate([rel_pos, vel], axis=-1).reshape(-1)
        obs = jnp.concatenate([cog_velocity, parts, smoothed])
        if self.gait_enabled:
            phase = (2.0 * jnp.pi * GAIT_FREQUENCY) * jnp.asarray(
                t, jnp.float32)
            # reference-root tracking error: where the drifting reference
            # root is relative to the torso COG (clipped — a far-blown-away
            # ragdoll shouldn't see unbounded features)
            drift = self.torso_velocity_target * jnp.asarray(t, jnp.float32)
            err = jnp.clip(self._init_torso_cog + drift - torso_cog,
                           -2.0, 2.0)
            obs = jnp.concatenate(
                [obs, jnp.stack([jnp.sin(phase), jnp.cos(phase)]), err])
        return obs

    def _head_height(self, state: State):
        return state.pos[self.head_id, 1]

    def has_fallen(self, state: State):
        return self._head_height(state) < FALL_HEAD_HEIGHT

    def tracking_failed(self, state: State, t):
        """Gait-mode early termination: horizontal torso-COG distance from
        the gliding reference root exceeds TRACK_FAIL_DIST (see constant
        comment; standing-task envs never terminate on this)."""
        bp = self.scene.body_params
        torso_cog = (state.pos[self.torso_id]
                     + quat_rotate(state.rot[self.torso_id],
                                   bp.local_cog[self.torso_id]))
        drift = self.torso_velocity_target * jnp.asarray(t, jnp.float32)
        err = (self._init_torso_cog + drift - torso_cog) * jnp.array(
            [1.0, 0.0, 1.0])
        return jnp.sum(err * err) > TRACK_FAIL_DIST ** 2

    def _gait_pose(self, t):
        """Kinematic walking-reference pose at episode time `t`: per-part
        rigid transforms (rot (14,4), trans (14,3)) mapping the base
        standing pose to the gait pose (before the forward drift).

        Each leg chain rotates about the lateral (+x) axis at its base-pose
        joint anchors: hips swing sinusoidally in antiphase, knees flex
        during the swing phase (hinge range is -90..5 deg so flexion is
        negative, ragdoll.cpp:118-121), ankles counter-rotate so the feet
        stay level. This is the procedural stand-in for the mocap clips the
        reference's DReCon setup tracks (learned_locomotion.cpp:329-357);
        amplitude 0 (walk target 0) is exactly the standing reference."""
        phase = (2.0 * jnp.pi * GAIT_FREQUENCY) * t
        ident = (jnp.zeros((4,)).at[3].set(1.0), jnp.zeros((3,)))

        def rot_about(theta, anchor):
            # rotation by theta about +x through `anchor`:
            # x -> q(x - A) + A  ==  (q, A - q(A))
            half = 0.5 * theta
            q = jnp.stack([jnp.sin(half), 0.0 * half, 0.0 * half,
                           jnp.cos(half)])
            return q, anchor - quat_rotate(q, anchor)

        def compose(outer, inner):
            # x -> outer(inner(x))
            qo, to = outer
            qi, ti = inner
            return quat_mul(qo, qi), quat_rotate(qo, ti) + to

        def leg(ph, a_hip, a_knee, a_ankle):
            th_hip = self.gait_hip_amp * jnp.sin(ph)
            th_knee = -self.gait_knee_amp * jnp.maximum(
                0.0, jnp.sin(ph + GAIT_KNEE_PHASE))
            m_hip = rot_about(th_hip, a_hip)
            m_knee = compose(m_hip, rot_about(th_knee, a_knee))
            # ankle counter-rotation keeps the foot level through the cycle
            m_foot = compose(m_knee, rot_about(-(th_hip + th_knee), a_ankle))
            return m_hip, m_knee, m_foot

        a = self._gait_anchors
        l_hip, l_knee, l_foot = leg(phase, a[0], a[1], a[2])
        r_hip, r_knee, r_foot = leg(phase + jnp.pi, a[3], a[4], a[5])
        # BODY_PART_NAMES order: torso, head, l/r arms (4), then
        # l_u_leg, l_l_leg, l_foot, l_toes, r_u_leg, r_l_leg, r_foot, r_toes
        per_part = [ident] * 6 + [l_hip, l_knee, l_foot, l_foot,
                                  r_hip, r_knee, r_foot, r_foot]
        rots = jnp.stack([p[0] for p in per_part])     # (14, 4)
        trans = jnp.stack([p[1] for p in per_part])    # (14, 3)
        return rots, trans

    def _gait_targets(self, t):
        """Gait-reference (positions (14,6,3), local rotations (14,4)) at
        time t, before drift."""
        rots, trans = self._gait_pose(t)
        tp = (quat_rotate(rots[:, None, :], self.target_positions)
              + trans[:, None, :])
        q_ref = quat_mul(rots, self._base_rot)
        # part-index parents (NOT body ids — q_ref is (14,) part-indexed)
        parent = jnp.asarray(np.array(BODY_PART_PARENTS, np.int32))
        parent_q = jnp.where((parent >= 0)[:, None],
                             q_ref[jnp.maximum(parent, 0)],
                             jnp.array([0.0, 0.0, 0.0, 1.0]))
        tr = quat_mul(q_ref, quat_conj(parent_q))
        return tp, tr

    def reward(self, state: State, t=0.0) -> jnp.ndarray:
        """getReward (learned_locomotion.cpp:329-357).

        `t` is the episode time in seconds. With a non-zero walk target the
        reference pose GLIDES forward at the target velocity (DReCon's clip
        root motion: the kinematic reference translates with the locomotion
        command; the reference engine gets this from its mocap clips). The
        world-anchored standing targets otherwise pin the policy in place —
        pos_err grows without bound for any policy that actually walks, so
        standing always dominates. With t*v_target translation, rp/rv reward
        *following* the moving reference; gait emerges because feet cannot
        glide on a friction ground. With gait enabled the reference
        additionally steps its legs (_gait_pose), giving rp/rv/rlocal a
        walking clip to track instead of a glide. Exactly the standing
        reward when torso_velocity_target == 0 (t * 0 == 0)."""
        tp, tv, tr = self._body_part_targets(state)
        drift = self.torso_velocity_target * t
        if self.gait_enabled:
            ref_p, ref_r = self._gait_targets(t)
            prev_p, _ = self._gait_targets(t - DT)
            target_positions = ref_p + drift
            # reference point velocities by finite difference over one
            # control step (drift contributes the walk target exactly)
            target_velocities = ((ref_p - prev_p) / DT
                                 + self.torso_velocity_target)
            target_local_rotations = ref_r
        else:
            target_positions = self.target_positions + drift
            target_velocities = (self.target_velocities
                                 + self.torso_velocity_target)
            target_local_rotations = self.target_local_rotations
        pos_err = jnp.sum(jnp.linalg.norm(tp - target_positions, axis=-1))
        vel_err = jnp.sum(jnp.linalg.norm(tv - target_velocities, axis=-1))
        rot_diff = quat_mul(target_local_rotations, quat_conj(tr))
        rot_err = jnp.sum(2.0 * jnp.arccos(jnp.clip(rot_diff[..., 3], -1.0, 1.0)))

        vcm_err = jnp.linalg.norm(state.lin_vel[self.torso_id]
                                  - self.torso_velocity_target)

        rp = jnp.exp(-10.0 / NUM_BODY_PARTS * pos_err)
        rv = jnp.exp(-1.0 / NUM_BODY_PARTS * vel_err)
        rlocal = jnp.exp(-10.0 / NUM_BODY_PARTS * rot_err)
        rvcm = jnp.exp(-vcm_err)

        fall = jnp.clip(1.3 - 1.4 * (self.head_target_height
                                     - self._head_height(state)), 0.0, 1.0)
        return fall * (rp + rv + rlocal + rvcm)

    # -- gym-like API --------------------------------------------------------

    def reset(self, rng) -> Tuple[EnvState, jnp.ndarray]:
        state = self.scene.initial_state()
        smoothed = jnp.zeros((ACTION_SIZE,), jnp.float32)
        state = state.replace(controls=self._controls_from_action(smoothed))
        env = EnvState(physics=state, smoothed_action=smoothed, rng=rng,
                       steps=jnp.int32(0))
        return env, self._observe(state, smoothed)

    def step(self, env: EnvState, action) -> Tuple[EnvState, jnp.ndarray,
                                                   jnp.ndarray, jnp.ndarray]:
        """One 60 Hz control step (updatePhysics,
        learned_locomotion.cpp:452-489). Returns (env', obs, reward, done).
        Auto-reset on done (the vmapped-env replacement for SB3's VecEnv
        semantics)."""
        rng, k_poke, k_part, k_dir = jax.random.split(env.rng, 4)

        smoothed = env.smoothed_action + (action - env.smoothed_action) * ACTION_EMA_BETA
        state = env.physics.replace(controls=self._controls_from_action(smoothed))

        if self.enable_pokes:
            part = jax.random.randint(k_part, (), 0, NUM_BODY_PARTS)
            d2 = jax.random.uniform(k_dir, (2,), minval=-1.0, maxval=1.0)
            direction = jnp.array([d2[0], 0.0, d2[1]])
            direction = direction / jnp.maximum(jnp.linalg.norm(direction), 1e-6)
            origin = (state.pos[self.body_ids[part]]
                      + jnp.array([0.0, 0.2, 0.0]) - direction * 5.0)
            poked = apply_ray_impulse(self.scene, state, origin, direction,
                                      POKE_STRENGTH)
            do_poke = jax.random.uniform(k_poke) < POKE_PROBABILITY
            state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(do_poke, a, b), poked, state)

        state, _ = physics_step(self.scene, state, self.settings, DT)

        t = (env.steps + 1).astype(jnp.float32) * DT
        obs = self._observe(state, smoothed, t)
        done = self.has_fallen(state)
        if self.gait_enabled:
            done = done | self.tracking_failed(state, t)
        reward = jnp.where(done, 0.0, self.reward(state, t))

        next_env = EnvState(physics=state, smoothed_action=smoothed, rng=rng,
                            steps=env.steps + 1)
        # auto-reset
        reset_env, reset_obs = self.reset(rng)
        env_out = jax.tree_util.tree_map(
            lambda r, n: jnp.where(done, r, n), reset_env, next_env)
        obs_out = jnp.where(done, reset_obs, obs)
        return env_out, obs_out, reward, done
