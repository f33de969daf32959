"""Locomotion environment conformance tests (mirrors the reference's
gym-API surface, loco_env.py:82-94 smoke main + learned_locomotion.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.envs.loco_env import (ACTION_SIZE, OBS_SIZE, LocoEnv)


@pytest.fixture(scope="module")
def env():
    return LocoEnv(solver_iterations=15)  # fewer iters: faster CPU tests


class TestLocoEnv:
    def test_obs_action_sizes(self, env):
        assert ACTION_SIZE == 27 and OBS_SIZE == 66
        st, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (66,)
        assert env.action_min.shape == (27,)
        assert np.all(np.asarray(env.action_min) <= np.asarray(env.action_max))

    def test_initial_reward_is_high(self, env):
        """At the reset pose every error is 0 -> reward = fall * 4 = 4
        (learned_locomotion.cpp:347-356)."""
        st, _ = env.reset(jax.random.PRNGKey(0))
        r = float(env.reward(st.physics))
        assert abs(r - 4.0) < 2e-2

    def test_step_runs_and_reward_positive(self, env):
        st, obs = env.reset(jax.random.PRNGKey(1))
        step = jax.jit(env.step)
        zero = jnp.zeros((27,))
        total = 0.0
        for _ in range(30):   # 0.5 s standing with zero action
            st, obs, r, done = step(st, zero)
            total += float(r)
        assert np.isfinite(total)
        assert total > 30 * 1.0   # standing keeps most of the 4.0 reward
        assert not bool(done)
        assert np.all(np.isfinite(np.asarray(obs)))

    def test_obs_layout(self, env):
        """cogVelocity is the torso linear velocity; head relative position
        appears at the documented offset (learning_state layout)."""
        st, obs = env.reset(jax.random.PRNGKey(2))
        obs = np.asarray(obs)
        assert np.allclose(obs[:3], 0.0)                # at rest
        # head slot is part index 3 -> offset 3 + 3*6 = 21..23, y ~ 1.86
        head_rel = obs[3 + 3 * 6: 6 + 3 * 6]
        assert abs(head_rel[1] - env.head_target_height) < 0.05
        # last 27 entries are the smoothed action (zero at reset)
        assert np.allclose(obs[-27:], 0.0)

    def test_ema_smoothing(self, env):
        st, _ = env.reset(jax.random.PRNGKey(3))
        a = jnp.ones((27,))
        st, obs, _, _ = jax.jit(env.step)(st, a)
        assert np.allclose(np.asarray(st.smoothed_action), 0.1, atol=1e-6)
        assert np.allclose(np.asarray(obs[-27:]), 0.1, atol=1e-6)

    def test_falls_when_shoved(self, env):
        """Strong persistent sideways velocity on the torso fells the
        ragdoll -> done + auto-reset."""
        st, _ = env.reset(jax.random.PRNGKey(4))
        phys = st.physics
        phys = phys.replace(lin_vel=phys.lin_vel.at[env.torso_id].set(
            jnp.array([8.0, 0.0, 0.0])))
        st = st.replace(physics=phys)
        step = jax.jit(env.step)
        zero = jnp.zeros((27,))
        fell = False
        for _ in range(120):
            st, obs, r, done = step(st, zero)
            if bool(done):
                fell = True
                break
        assert fell
        # auto-reset: next state is back at the spawn pose
        assert abs(float(st.physics.pos[env.head_id, 1])
                   - env.head_target_height) < 0.05

    def test_vmapped_envs(self, env):
        n = 4
        keys = jax.random.split(jax.random.PRNGKey(5), n)
        reset = jax.jit(jax.vmap(env.reset))
        step = jax.jit(jax.vmap(env.step))
        st, obs = reset(keys)
        assert obs.shape == (n, 66)
        actions = jnp.zeros((n, 27))
        for _ in range(5):
            st, obs, r, done = step(st, actions)
        assert r.shape == (n,)
        assert np.all(np.isfinite(np.asarray(obs)))


class TestWalkTarget:
    def test_gliding_reference_decays_for_standing(self):
        """With a walk target the reference pose glides at the target
        velocity (DReCon root motion), so a policy that stands still must
        see decaying reward — the world-anchored variant rewarded standing
        forever, which is why --walk-target converged to a stand."""
        env = LocoEnv(solver_iterations=8, solver_mode="jacobi",
                      enable_pokes=False,
                      torso_velocity_target=(1.0, 0.0, 0.0))
        st, _ = env.reset(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        rs = []
        for _ in range(12):
            st, _, r, _ = step(st, jnp.zeros((27,)))
            rs.append(float(r))
        assert all(np.isfinite(rs))
        assert rs[-1] < rs[1] - 0.2     # gliding targets leave a stander

    def test_zero_target_exactly_standing_reward(self):
        """torso_velocity_target=0 must reproduce the reference's standing
        reward bit-for-bit (t * 0 == 0 drift)."""
        env = LocoEnv(solver_iterations=8, solver_mode="jacobi",
                      enable_pokes=False)
        st, _ = env.reset(jax.random.PRNGKey(0))
        r0 = float(env.reward(st.physics))
        r_t = float(env.reward(st.physics, t=7.5))
        assert r0 == r_t


class TestGaitReference:
    """Procedural walking reference (_gait_pose/_gait_targets): the DReCon
    kinematic-clip stand-in (learned_locomotion.cpp:329-357 tracks mocap
    clips; the rebuild synthesizes the clip analytically)."""

    def test_amp_zero_is_exactly_standing(self):
        """gait=True with walk target 0 has amplitude 0: identical reward
        to the standing env at any t; obs gains only the 5 gait floats
        (sin/cos phase + 3 tracking error)."""
        e0 = LocoEnv(solver_iterations=8, solver_mode="jacobi",
                     enable_pokes=False)
        e1 = LocoEnv(solver_iterations=8, solver_mode="jacobi",
                     enable_pokes=False, gait=True)
        assert (e0.obs_size, e1.obs_size) == (66, 71)
        st0, o0 = e0.reset(jax.random.PRNGKey(0))
        st1, o1 = e1.reset(jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1[:66]))
        assert float(e0.reward(st0.physics, 0.5)) == pytest.approx(
            float(e1.reward(st1.physics, 0.5)), abs=1e-6)

    def test_gait_targets_oscillate_and_feet_stay_level(self):
        env = LocoEnv(solver_iterations=8, solver_mode="jacobi",
                      enable_pokes=False,
                      torso_velocity_target=(1.0, 0.0, 0.0))
        assert env.gait_enabled and env.gait_hip_amp > 0.2
        tp1, tr1 = env._gait_targets(0.1)
        tp2, tr2 = env._gait_targets(0.3)
        assert bool(jnp.all(jnp.isfinite(tp1)) & jnp.all(jnp.isfinite(tr1)))
        # leg targets move through the cycle
        assert float(jnp.max(jnp.abs(tp1 - tp2))) > 0.02
        # ankle counter-rotation: foot/toes world delta rotation ~identity
        rots, _ = env._gait_pose(0.2)
        for part in (8, 9, 12, 13):   # feet + toes
            assert float(jnp.abs(rots[part, 3])) > 1.0 - 1e-5
        # legs antiphase: left hip delta == right hip delta half a cycle on
        rots_l, _ = env._gait_pose(0.2)
        from dxk_tpu.envs.loco_env import GAIT_FREQUENCY
        rots_r, _ = env._gait_pose(0.2 + 0.5 / GAIT_FREQUENCY)
        np.testing.assert_allclose(np.asarray(rots_l[6]),
                                   np.asarray(rots_r[10]), atol=1e-5)

    def test_phase_obs_and_step(self):
        env = LocoEnv(solver_iterations=8, solver_mode="jacobi",
                      enable_pokes=False,
                      torso_velocity_target=(1.0, 0.0, 0.0))
        st, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (71,)
        # at t=0 the phase features are (sin 0, cos 0) = (0, 1) and the
        # tracking error is 0 (reference root == torso COG at reset)
        np.testing.assert_allclose(np.asarray(obs[66:68]), [0.0, 1.0],
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(obs[68:]), 0.0, atol=1e-6)
        step = jax.jit(env.step)
        st, obs, r, d = step(st, jnp.zeros((27,)))
        assert bool(jnp.all(jnp.isfinite(obs))) and np.isfinite(float(r))
        # phase advanced by one control step
        from dxk_tpu.envs.loco_env import DT, GAIT_FREQUENCY
        ph = 2 * np.pi * GAIT_FREQUENCY * DT
        np.testing.assert_allclose(np.asarray(obs[66:68]),
                                   [np.sin(ph), np.cos(ph)], atol=1e-5)


def test_tracking_termination_gait_only():
    """Gait-mode early termination (loco_env.TRACK_FAIL_DIST): a torso at
    its spawn pose is within tolerance of the reference root at t=0 but
    fails once the reference has glided past TRACK_FAIL_DIST; the standing
    task (no gait) never terminates on tracking."""
    from dxk_tpu.envs.loco_env import TRACK_FAIL_DIST

    env = LocoEnv(solver_mode="scan", torso_velocity_target=(1.0, 0.0, 0.0))
    assert env.gait_enabled
    st = env.scene.initial_state()
    assert not bool(env.tracking_failed(st, 0.0))
    # drift 1.0 m < 1.25 m threshold: still tracking
    assert not bool(env.tracking_failed(st, TRACK_FAIL_DIST - 0.3))
    # drift beyond the threshold: terminated
    assert bool(env.tracking_failed(st, TRACK_FAIL_DIST + 0.3))
    # standing env: step() must not wire tracking_failed in at all (its
    # reference never moves; also keeps the standing task's jit graph free
    # of the extra gather)
    stand = LocoEnv(solver_mode="scan")
    assert not stand.gait_enabled


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
