"""End-to-end physics tests against analytic results: free fall, resting
contact, restitution bounce, box stacking. These mirror the reference's
implicit oracles (SURVEY.md §4): analytic-scene sanity + finiteness sweeps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.physics import PhysicsSettings, physics_step
from dxk_tpu.scene import SceneBuilder

DT = 1.0 / 120.0


def run(scene, state, steps, settings=None, dt=DT):
    settings = settings or PhysicsSettings()
    step = jax.jit(lambda s: physics_step(scene, s, settings, dt)[0])
    for _ in range(steps):
        state = step(state)
    return state


class TestFreeFall:
    def test_gravity_with_damping(self):
        """Velocity after n steps follows semi-implicit Euler with the
        reference's 1/(1+dt*damping) damping (rigid_body.cpp:113-118)."""
        b = SceneBuilder()
        body = b.add_body(position=(0, 100, 0))
        b.add_sphere_collider(body, (0, 0, 0), 0.5)
        scene = b.finalize()
        state = scene.initial_state()

        n = 24
        state = run(scene, state, n)

        v = 0.0
        y = 100.0
        for _ in range(n):
            v += -9.81 * DT
            v /= 1.0 + DT * 0.4
            y += v * DT
        assert np.allclose(state.lin_vel[0, 1], v, atol=1e-4)
        assert np.allclose(state.pos[0, 1], y, atol=1e-3)

    def test_kinematic_body_does_not_fall(self):
        b = SceneBuilder()
        body = b.add_body(position=(0, 5, 0), kinematic=True)
        b.add_sphere_collider(body, (0, 0, 0), 0.5)
        scene = b.finalize()
        state = run(scene, scene.initial_state(), 30)
        assert np.allclose(state.pos[0], [0, 5, 0], atol=1e-6)

    def test_zero_gravity_factor(self):
        b = SceneBuilder()
        body = b.add_body(position=(0, 5, 0), gravity_factor=0.0)
        b.add_sphere_collider(body, (0, 0, 0), 0.5)
        scene = b.finalize()
        state = run(scene, scene.initial_state(), 30)
        assert np.allclose(state.pos[0], [0, 5, 0], atol=1e-6)


def make_ground(b, friction=1.0, restitution=0.0):
    g = b.add_static(position=(0, 0, 0))
    b.add_box_collider(g, center=(0, -1, 0), half_extents=(20, 1, 20),
                       friction=friction, restitution=restitution)
    return g


class TestRestingContact:
    @pytest.mark.parametrize("mode", ["scan", "jacobi"])
    def test_sphere_rests_on_ground(self, mode):
        b = SceneBuilder()
        make_ground(b)
        ball = b.add_body(position=(0, 0.55, 0))
        b.add_sphere_collider(ball, (0, 0, 0), 0.5, restitution=0.0)
        scene = b.finalize()
        settings = PhysicsSettings(solver_mode=mode)
        state = run(scene, scene.initial_state(), 240, settings)
        # rests at y ~= 0.5 (slop allows ~1mm sink)
        assert abs(float(state.pos[ball, 1]) - 0.5) < 0.01
        assert float(jnp.linalg.norm(state.lin_vel[ball])) < 0.05

    def test_box_rests_on_ground(self):
        b = SceneBuilder()
        make_ground(b)
        box = b.add_body(position=(0, 0.55, 0))
        b.add_box_collider(box, center=(0, 0, 0), half_extents=(0.5, 0.5, 0.5))
        scene = b.finalize()
        state = run(scene, scene.initial_state(), 240)
        assert abs(float(state.pos[box, 1]) - 0.5) < 0.01
        assert float(jnp.linalg.norm(state.lin_vel[box])) < 0.05
        # stays upright
        assert float(jnp.abs(state.rot[box, 3])) > 0.999

    def test_bounce_restitution(self):
        """A bouncy sphere leaves the ground with ~e * impact speed."""
        b = SceneBuilder()
        make_ground(b, restitution=0.8)
        ball = b.add_body(position=(0, 2.0, 0), linear_damping=0.0,
                          angular_damping=0.0)
        b.add_sphere_collider(ball, (0, 0, 0), 0.5, restitution=0.8)
        BALL = ball
        scene = b.finalize()
        state = scene.initial_state()
        settings = PhysicsSettings()
        step = jax.jit(lambda s: physics_step(scene, s, settings, DT)[0])
        max_up = 0.0
        impact = 0.0
        for _ in range(240):
            state = step(state)
            vy = float(state.lin_vel[BALL, 1])
            impact = min(impact, vy)
            max_up = max(max_up, vy)
        assert max_up > 0.6 * abs(impact)

    def test_finite_after_many_steps(self):
        """NaN/Inf sweep — the reference's VALIDATE oracle
        (physics.cpp:807-926)."""
        b = SceneBuilder()
        make_ground(b)
        for i in range(5):
            body = b.add_body(position=(0.01 * i, 0.6 + 1.05 * i, 0))
            b.add_box_collider(body, (0, 0, 0), (0.5, 0.5, 0.5))
        scene = b.finalize()
        state = run(scene, scene.initial_state(), 300)
        for leaf in jax.tree_util.tree_leaves(
                (state.pos, state.rot, state.lin_vel, state.ang_vel)):
            assert np.all(np.isfinite(np.asarray(leaf)))


class TestStack:
    def test_small_box_stack_settles(self):
        """5-box stack stays standing after 2.5 simulated seconds —
        miniature of BASELINE config 1."""
        b = SceneBuilder()
        make_ground(b)
        n = 5
        ids = []
        for i in range(n):
            body = b.add_body(position=(0, 0.5 + i * 1.001, 0))
            b.add_box_collider(body, (0, 0, 0), (0.5, 0.5, 0.5))
            ids.append(body)
        scene = b.finalize()
        state = run(scene, scene.initial_state(), 300)
        for i, bid in enumerate(ids):
            y = float(state.pos[bid, 1])
            assert abs(y - (0.5 + i)) < 0.08, f"box {i} at y={y}"
            assert float(jnp.linalg.norm(state.lin_vel[bid])) < 0.1

    def test_vmap_envs(self):
        """Batched envs: the reference's 16-process SubprocVecEnv axis
        becomes vmap (SURVEY.md §2.7)."""
        b = SceneBuilder()
        make_ground(b)
        body = b.add_body(position=(0, 2, 0))
        b.add_sphere_collider(body, (0, 0, 0), 0.5)
        BID = body
        scene = b.finalize()
        settings = PhysicsSettings()

        base = scene.initial_state()
        n_env = 8
        heights = jnp.linspace(5.0, 8.0, n_env)
        batched = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n_env, *x.shape)), base)
        batched = batched.replace(pos=batched.pos.at[:, BID, 1].set(heights))

        step = jax.jit(jax.vmap(
            lambda s: physics_step(scene, s, settings, DT)[0]))
        s = batched
        for _ in range(30):
            s = step(s)
        # none has hit the ground yet: all envs fell by the same offset
        drop = heights - s.pos[:, BID, 1]
        assert np.allclose(drop, drop[0], atol=1e-4)
        assert float(drop[0]) > 0.2


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestTallStack:
    def test_16_box_tower_colored_solver(self):
        """Tall towers need Gauss-Seidel-like convergence: build-time
        contact phases (finalize(contact_phases=K)) hold a 16-box tower
        where plain averaged Jacobi collapses (docs/PERF_NOTES.md; the
        build-time analog of scheduleConstraintsSIMD's conflict-free
        batching, constraints.cpp:51-184)."""
        b = SceneBuilder()
        make_ground(b)
        ids = []
        for i in range(16):
            body = b.add_body(position=(0, 0.5 + i * 1.001, 0))
            b.add_box_collider(body, (0, 0, 0), (0.5, 0.5, 0.5))
            ids.append(body)
        scene = b.finalize(contact_phases=4)
        settings = PhysicsSettings(solver_mode="colored",
                                   num_rigid_solver_iterations=30)
        state = run(scene, scene.initial_state(), 480, settings)
        ys = np.asarray(state.pos[np.asarray(ids)][:, 1])
        err = np.abs(ys - (0.5 + np.arange(16))).max()
        assert err < 0.4, err
