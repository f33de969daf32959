"""Gym-adapter conformance (the reference's loco_env.py smoke main,
loco_env.py:82-94)."""

import numpy as np


def test_single_env_api():
    from dxk_tpu.envs.gym_adapter import GymLocoEnv
    env = GymLocoEnv(solver_iterations=8)
    obs = env.reset()
    assert obs.shape == (66,)
    total = 0.0
    for _ in range(5):
        a = np.zeros(27, np.float32)
        obs, r, done, info = env.step(a)
        total += r
    assert np.isfinite(total) and total > 0


def test_vec_env_api():
    from dxk_tpu.envs.gym_adapter import VecLocoEnv
    env = VecLocoEnv(num_envs=4, solver_iterations=8)
    obs = env.reset()
    assert obs.shape == (4, 66)
    obs, r, d, infos = env.step(np.zeros((4, 27), np.float32))
    assert r.shape == (4,) and len(infos) == 4
