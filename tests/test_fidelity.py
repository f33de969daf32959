"""Analytic fidelity oracles + per-joint-type cross-mode equivalence
(docs/FIDELITY.md legs 2 and 4; BASELINE trajectory-fidelity row).

Closed-form physics any correct engine must reproduce, independent of
implementation — the strongest oracle available given the reference binary
cannot run here (Windows-only DLL)."""

import jax
import numpy as np
import pytest

from dxk_tpu.physics import PhysicsSettings, physics_step
from dxk_tpu.scene import SceneBuilder

DT = 1.0 / 120.0


def _run(scene, steps, mode="scan", iters=30, record=lambda s: None):
    settings = PhysicsSettings(num_rigid_solver_iterations=iters,
                               solver_mode=mode)
    state = scene.initial_state()
    step = jax.jit(lambda s: physics_step(scene, s, settings, DT)[0])
    out = []
    for _ in range(steps):
        state = step(state)
        out.append(record(state))
    return state, out


class TestAnalyticOracles:
    def test_pendulum_period(self):
        """Ball-joint pendulum at small amplitude: T = 2*pi*sqrt(L/g)
        (physical-pendulum correction for the small bob is <0.5%)."""
        L = 1.0
        theta0 = 0.12
        b = SceneBuilder()
        anchor = b.add_body(position=(0, 2, 0), kinematic=True)
        bob = b.add_body(position=(L * np.sin(theta0),
                                   2 - L * np.cos(theta0), 0),
                         linear_damping=0.0, angular_damping=0.0)
        b.add_sphere_collider(bob, (0, 0, 0), 0.08, density=5000.0)
        b.add_ball_constraint(anchor, bob, (0, 2, 0))
        scene = b.finalize()

        xs = _run(scene, 800, record=lambda s: float(s.pos[1, 0]))[1]
        xs = np.asarray(xs)
        # period from successive rising zero crossings
        crossings = np.where((xs[:-1] < 0) & (xs[1:] >= 0))[0]
        assert len(crossings) >= 2, "pendulum did not oscillate"
        periods = np.diff(crossings) * DT
        T_meas = periods.mean()
        T_expect = 2 * np.pi * np.sqrt(L / 9.81)
        assert abs(T_meas - T_expect) / T_expect < 0.03, (T_meas, T_expect)

    def test_resting_stack_stays_put(self):
        """3-box stack initialized at rest, 1000 steps (8.3 s): the stack
        must stay standing with bounded micro-creep. The solver family being
        mirrored zeroes accumulated impulses every step (no warm starting —
        constraints.cpp:3324-3325) and solves a manifold's points
        sequentially, so a resting stack exhibits mm/s-scale tangential
        creep by design; the oracle is therefore *bounded* drift (< 2.5 cm
        over 8 s, not accelerating), not absolute stillness."""
        b = SceneBuilder()
        g = b.add_static()
        b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
        for i in range(3):
            bd = b.add_body(position=(0, 0.4995 + 0.9995 * i, 0))
            b.add_box_collider(bd, (0, 0, 0), (0.5, 0.5, 0.5))
        scene = b.finalize()
        init = np.asarray(scene.initial_state().pos).copy()

        st, _ = _run(scene, 1000)
        pos = np.asarray(st.pos)[1:4]
        drift = np.abs(pos - init[1:4])
        assert drift.max() < 2.5e-2, drift.max()
        # stack is intact: heights preserved to ~penetration slop x3
        assert np.abs(drift[:, 1]).max() < 5e-3, drift[:, 1]
        # creep is not accelerating: residual velocities stay at mm/s scale
        speed = np.abs(np.asarray(st.lin_vel)[1:4]).max()
        assert speed < 2e-2, speed

    def test_restitution_bounce_ratio(self):
        """Sphere with restitution e: successive apex heights above rest
        scale by ~e^2 (Baumgarte adds a small positive bias, so allow a
        generous one-sided band)."""
        e = 0.5
        b = SceneBuilder()
        g = b.add_static()
        b.add_box_collider(g, (0, -1, 0), (20, 1, 20), restitution=e)
        s = b.add_body(position=(0, 2.0, 0),
                       linear_damping=0.0, angular_damping=0.0)
        b.add_sphere_collider(s, (0, 0, 0), 0.5, restitution=e)
        scene = b.finalize()

        ys = np.asarray(_run(scene, 600,
                             record=lambda st: float(st.pos[1, 1]))[1])
        h = ys - 0.5                      # height above rest contact
        # apexes: local maxima after the drop
        apex = [h[i] for i in range(1, len(h) - 1)
                if h[i] >= h[i - 1] and h[i] > h[i + 1] and h[i] > 0.02]
        assert len(apex) >= 2, "no bounces detected"
        ratio = apex[1] / apex[0] if len(apex) < 3 else apex[2] / apex[1]
        assert 0.5 * e * e < ratio < 2.0 * e * e, (ratio, e * e)


class TestChainStability:
    def test_distance_chain_settles(self):
        """3-link distance-constraint chain must settle, not explode.
        Guards the deliberate deviation from the reference's double-cross
        impulseToAngularVelocity (constraints.cpp:232-233/367-368 — see
        ops/solver.py:prep_distance and docs/FIDELITY.md): with the
        reference's formula this chain reaches |w| ~ 1e3 rad/s by step 300
        and NaN by ~900; with the correct torque arm it hangs quietly."""
        b = SceneBuilder()
        top = b.add_body(position=(0, 8, 0), kinematic=True)
        prev, y = top, 8.0
        for _ in range(3):
            y -= 1.0
            link = b.add_body(position=(0.05, y, -0.02))
            b.add_capsule_collider(link, (0, -0.3, 0), (0, 0.3, 0), 0.12)
            b.add_distance_constraint(prev, link, (0, y + 0.8, 0),
                                      (0, y + 0.5, 0))
            prev = link
        scene = b.finalize()
        st, _ = _run(scene, 600)
        assert np.isfinite(np.asarray(st.pos)).all()
        assert np.abs(np.asarray(st.ang_vel)).max() < 1.0
        assert np.abs(np.asarray(st.lin_vel)).max() < 0.5


JOINT_SCENES = {}


def _joint_scene(kind):
    b = SceneBuilder()
    anchor = b.add_body(position=(0, 3, 0), kinematic=True)
    link = b.add_body(position=(0.35, 2.6, -0.1))
    b.add_capsule_collider(link, (0, -0.3, 0), (0, 0.3, 0), 0.1)
    a = (0, 3, 0)
    if kind == "distance":
        b.add_distance_constraint(anchor, link, a, (0.35, 2.9, -0.1))
    elif kind == "ball":
        b.add_ball_constraint(anchor, link, a)
    elif kind == "fixed":
        b.add_fixed_constraint(anchor, link, a)
    elif kind == "hinge":
        b.add_hinge_constraint(anchor, link, a, (1, 0, 0),
                               min_limit=-1.2, max_limit=0.9)
    elif kind == "cone_twist":
        b.add_cone_twist_constraint(anchor, link, a, (0, -1, 0),
                                    swing_limit=0.7, twist_limit=0.4)
    elif kind == "slider":
        b.add_slider_constraint(anchor, link, a, (0, 1, 0),
                                min_limit=-0.5, max_limit=0.3)
    return b.finalize()


@pytest.mark.parametrize("kind", ["distance", "ball", "fixed", "hinge",
                                  "cone_twist", "slider"])
def test_scan_vs_parallel_modes_per_joint(kind):
    """The reference's scalar/SIMD dual-path oracle per joint type
    (physics.h:394-396): with a single constraint, scan (sequential GS),
    colored GS, and averaged Jacobi perform the same update, so
    trajectories must agree tightly over a real horizon."""
    scene = _joint_scene(kind)
    ref, _ = _run(scene, 120, mode="scan")
    for mode in ("colored", "jacobi"):
        got, _ = _run(scene, 120, mode=mode)
        err = float(abs(got.pos - ref.pos).max())
        err_r = float(abs(got.rot - ref.rot).max())
        assert max(err, err_r) < 1e-4, (kind, mode, err, err_r)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
