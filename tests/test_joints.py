"""Constraint-zoo tests: each joint type on a small analytic scene
(BASELINE config 2). Mirrors the behaviors defined by
/root/reference/src/physics/constraints.cpp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.physics import PhysicsSettings, physics_step
from dxk_tpu.scene import SceneBuilder

DT = 1.0 / 120.0


def run(scene, state, steps, settings=None):
    settings = settings or PhysicsSettings()
    step = jax.jit(lambda s: physics_step(scene, s, settings, DT)[0])
    for _ in range(steps):
        state = step(state)
    return state


def anchor_body(b, pos=(0, 4, 0)):
    # NB: no collider — the reference does not filter collisions between
    # jointed bodies, so an anchor collider would fight the joint.
    return b.add_body(position=pos, kinematic=True)


class TestDistance:
    def test_pendulum_keeps_length(self):
        b = SceneBuilder()
        top = anchor_body(b)
        bob = b.add_body(position=(1.0, 4.0, 0))
        b.add_sphere_collider(bob, (0, 0, 0), 0.2)
        b.add_distance_constraint(top, bob, (0, 4, 0), (1.0, 4.0, 0))
        scene = b.finalize()
        state = run(scene, scene.initial_state(), 240)
        d = float(jnp.linalg.norm(state.pos[bob] - state.pos[top]))
        assert abs(d - 1.0) < 0.05
        # it swung down
        assert float(state.pos[bob, 1]) < 4.0


class TestBall:
    def test_ball_joint_pins_anchor(self):
        b = SceneBuilder()
        top = anchor_body(b)
        arm = b.add_body(position=(0.5, 4.0, 0))
        b.add_box_collider(arm, (0, 0, 0), (0.5, 0.05, 0.05))
        b.add_ball_constraint(top, arm, (0, 4, 0))
        scene = b.finalize()
        state = run(scene, scene.initial_state(), 240)
        # the arm's local anchor (-0.5,0,0) stays at the pivot
        from dxk_tpu.core.maths import quat_rotate
        anchor_world = state.pos[arm] + quat_rotate(state.rot[arm],
                                                    jnp.array([-0.5, 0, 0]))
        assert float(jnp.linalg.norm(anchor_world - jnp.array([0, 4, 0]))) < 0.03
        # arm hangs downward
        assert float(state.pos[arm, 1]) < 4.0 - 0.3


class TestFixed:
    def test_fixed_weld_preserves_relative_pose(self):
        b = SceneBuilder()
        top = anchor_body(b)
        box = b.add_body(position=(0, 3.0, 0))
        b.add_box_collider(box, (0, 0, 0), (0.3, 0.3, 0.3))
        b.add_fixed_constraint(top, box, (0, 3.5, 0))
        scene = b.finalize()
        state = run(scene, scene.initial_state(), 240)
        assert float(jnp.linalg.norm(
            state.pos[box] - jnp.array([0, 3.0, 0]))) < 0.02
        # no rotation accumulated
        assert float(jnp.abs(state.rot[box, 3])) > 0.9995


class TestHinge:
    def build_door(self, min_limit=1.0, max_limit=-1.0):
        b = SceneBuilder()
        post = anchor_body(b, (0, 2, 0))
        door = b.add_body(position=(0.5, 2.0, 0))
        b.add_box_collider(door, (0, 0, 0), (0.5, 0.4, 0.02))
        h = b.add_hinge_constraint(post, door, (0, 2, 0), (0, 1, 0),
                                   min_limit, max_limit)
        return b, post, door, h

    def test_hinge_constrains_axis(self):
        """Door under gravity must not rotate about anything but the hinge
        axis and must not translate away from the post."""
        b, post, door, _ = self.build_door()
        scene = b.finalize()
        state = scene.initial_state()
        # give it a push about the hinge axis
        state = state.replace(ang_vel=state.ang_vel.at[door, 1].set(3.0))
        state = run(scene, state, 240)
        from dxk_tpu.core.maths import quat_rotate
        anchor_world = state.pos[door] + quat_rotate(state.rot[door],
                                                     jnp.array([-0.5, 0, 0]))
        assert float(jnp.linalg.norm(anchor_world - jnp.array([0, 2, 0]))) < 0.03
        # rotation axis stays y: x/z components of rotated y-axis ~ y
        y_w = quat_rotate(state.rot[door], jnp.array([0.0, 1.0, 0.0]))
        assert float(jnp.abs(y_w[1])) > 0.995

    def test_hinge_limits(self):
        """With +-30 degree limits, a pushed door stops near the limit."""
        lim = np.deg2rad(30.0)
        b, post, door, _ = self.build_door(-lim, lim)
        scene = b.finalize()
        state = scene.initial_state()
        state = state.replace(ang_vel=state.ang_vel.at[door, 1].set(6.0))
        state = run(scene, state, 240)
        from dxk_tpu.core.maths import quat_rotate, get_axis_rotation
        axis, angle = get_axis_rotation(state.rot[door])
        signed = float(angle) * float(jnp.sign(axis[1]))
        assert abs(signed) < lim + 0.1

    def test_hinge_velocity_motor(self):
        b, post, door, h = self.build_door()
        scene = b.finalize()
        state = scene.initial_state()
        controls = scene.default_controls.replace(
            hinge_motor_type=jnp.array([0]),
            hinge_target=jnp.array([2.0]),        # rad/s
            hinge_max_torque=jnp.array([500.0]))
        state = state.replace(controls=controls)
        state = run(scene, state, 120)
        # spinning about hinge axis at ~2 rad/s
        assert abs(float(state.ang_vel[door, 1]) - 2.0) < 0.2

    def test_hinge_position_motor(self):
        """Position motor drives the door to the target angle and holds it —
        the actuator the RL policy depends on (constraints.cpp:1189-1197)."""
        target = 0.7
        b, post, door, h = self.build_door()
        scene = b.finalize()
        state = scene.initial_state()
        controls = scene.default_controls.replace(
            hinge_motor_type=jnp.array([1]),
            hinge_target=jnp.array([target]),
            hinge_max_torque=jnp.array([200.0]))
        state = state.replace(controls=controls)
        state = run(scene, state, 360)
        from dxk_tpu.core.maths import get_axis_rotation
        axis, angle = get_axis_rotation(state.rot[door])
        signed = float(angle) * float(jnp.sign(axis[1]))
        assert abs(signed - target) < 0.08, f"angle={signed}"


class TestConeTwist:
    def test_swing_limit_holds_pendulum(self):
        """A rod on a cone-twist joint with a 20 degree swing limit must not
        swing past ~the limit under gravity."""
        lim = np.deg2rad(20.0)
        b = SceneBuilder()
        top = anchor_body(b, (0, 3, 0))
        rod = b.add_body(position=(0, 2.5, 0))
        b.add_capsule_collider(rod, (0, -0.4, 0), (0, 0.4, 0), 0.05)
        b.add_cone_twist_constraint(top, rod, (0, 3, 0), (0, -1, 0),
                                    lim, np.deg2rad(45.0))
        scene = b.finalize()
        state = scene.initial_state()
        # sideways shove
        state = state.replace(lin_vel=state.lin_vel.at[rod, 0].set(3.0))
        state = run(scene, state, 300)
        # the rod's -y axis (from anchor toward tip) must stay within
        # ~limit of straight down
        from dxk_tpu.core.maths import quat_rotate
        down_w = quat_rotate(state.rot[rod], jnp.array([0.0, -1.0, 0.0]))
        angle = float(jnp.arccos(jnp.clip(-down_w[1], -1, 1)))
        assert angle < lim + 0.15, f"swing angle {angle}"

    def test_twist_motor_spins_rod(self):
        b = SceneBuilder()
        top = anchor_body(b, (0, 3, 0))
        rod = b.add_body(position=(0, 2.5, 0))
        b.add_capsule_collider(rod, (0, -0.4, 0), (0, 0.4, 0), 0.05)
        b.add_cone_twist_constraint(top, rod, (0, 3, 0), (0, -1, 0),
                                    -1.0, -1.0)  # no limits
        scene = b.finalize()
        state = scene.initial_state()
        controls = scene.default_controls.replace(
            ct_twist_motor_type=jnp.array([0]),
            ct_twist_target=jnp.array([3.0]),
            ct_twist_max_torque=jnp.array([200.0]))
        state = state.replace(controls=controls)
        state = run(scene, state, 120)
        # twist axis is -y (from a); rod should spin about y at ~-3 rad/s
        assert abs(abs(float(state.ang_vel[rod, 1])) - 3.0) < 0.3


class TestSlider:
    def test_slider_allows_only_axis_translation(self):
        b = SceneBuilder()
        rail = anchor_body(b, (0, 2, 0))
        block = b.add_body(position=(0.5, 2, 0))
        b.add_box_collider(block, (0, 0, 0), (0.2, 0.2, 0.2))
        b.add_slider_constraint(rail, block, (0, 2, 0), (1, 0, 0))
        scene = b.finalize()
        state = scene.initial_state()
        state = state.replace(lin_vel=state.lin_vel.at[block].set(
            jnp.array([1.0, 2.0, 2.0])))
        state = run(scene, state, 120)
        p = np.asarray(state.pos[block])
        assert abs(p[1] - 2.0) < 0.02 and abs(p[2]) < 0.02
        assert p[0] > 0.6  # slid along x

    def test_slider_limits(self):
        b = SceneBuilder()
        rail = anchor_body(b, (0, 2, 0))
        block = b.add_body(position=(0.0, 2, 0))
        b.add_box_collider(block, (0, 0, 0), (0.2, 0.2, 0.2))
        b.add_slider_constraint(rail, block, (0, 2, 0), (1, 0, 0),
                                min_limit=-0.5, max_limit=0.5)
        scene = b.finalize()
        state = scene.initial_state()
        state = state.replace(lin_vel=state.lin_vel.at[block, 0].set(4.0))
        state = run(scene, state, 240)
        assert float(state.pos[block, 0]) < 0.6

    def test_slider_position_motor(self):
        b = SceneBuilder()
        rail = anchor_body(b, (0, 2, 0))
        block = b.add_body(position=(0.0, 2, 0))
        b.add_box_collider(block, (0, 0, 0), (0.2, 0.2, 0.2))
        b.add_slider_constraint(rail, block, (0, 2, 0), (1, 0, 0))
        scene = b.finalize()
        state = scene.initial_state()
        # a force-limited position motor is bang-bang (reference
        # constraints.cpp:2743-2751) and oscillates if the budget is small
        # relative to the mass; give it enough force to settle
        controls = scene.default_controls.replace(
            slider_motor_type=jnp.array([1]),
            slider_target=jnp.array([0.8]),
            slider_max_force=jnp.array([20000.0]))
        state = state.replace(controls=controls)
        state = run(scene, state, 240)
        assert abs(float(state.pos[block, 0]) - 0.8) < 0.05


class TestChain:
    def test_ball_chain_hangs(self):
        """5-link chain of ball joints settles hanging below the anchor."""
        b = SceneBuilder()
        top = anchor_body(b, (0, 5, 0))
        prev = top
        links = []
        for i in range(5):
            link = b.add_body(position=(0.4 * (i + 1), 5.0, 0))
            b.add_capsule_collider(link, (-0.15, 0, 0), (0.15, 0, 0), 0.05)
            b.add_ball_constraint(prev, link, (0.4 * i + 0.2, 5.0, 0))
            links.append(link)
            prev = link
        scene = b.finalize()
        state = run(scene, scene.initial_state(), 600)
        # last link is below the anchor, roughly at -chain length
        tip = np.asarray(state.pos[links[-1]])
        assert tip[1] < 4.0
        assert np.all(np.isfinite(np.asarray(state.pos)))


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestColoredSolver:
    def test_colored_matches_scan_on_chain(self):
        """Colored Gauss-Seidel (build-time graph coloring) matches the
        sequential scan mode closely on a joint-only scene."""
        def build():
            b = SceneBuilder()
            top = anchor_body(b, (0, 5, 0))
            prev = top
            for i in range(5):
                link = b.add_body(position=(0.4 * (i + 1), 5.0, 0))
                # short capsules: adjacent links must NOT touch, so the test
                # isolates joint handling from contact handling
                b.add_capsule_collider(link, (-0.1, 0, 0), (0.1, 0, 0), 0.05)
                b.add_ball_constraint(prev, link, (0.4 * i + 0.2, 5.0, 0))
                prev = link
            return b.finalize()

        scene = build()
        assert scene.ball.num_colors >= 2   # chain needs alternating colors

        results = {}
        for mode in ("scan", "colored"):
            state = scene.initial_state()
            settings = PhysicsSettings(solver_mode=mode)
            step = jax.jit(lambda s, st=settings: physics_step(
                scene, s, st, DT)[0])
            for _ in range(60):
                state = step(state)
            results[mode] = np.asarray(state.pos)
        assert np.allclose(results["scan"], results["colored"], atol=2e-2)
