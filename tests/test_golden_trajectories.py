"""Golden trajectory regression tests (SURVEY.md §4 implication (d);
BASELINE trajectory-fidelity oracle).

The reference has no automated tests; its implicit oracle is dual-path
scalar/SIMD equivalence. Here the "scan" solver mode is the canonical
sequential-impulse path; these tests (a) pin its trajectories against
recorded goldens so solver/collision changes that alter physics are caught
at 1e-3, and (b) assert scan-vs-jacobi cross-mode agreement on short
horizons (the scalar-vs-SIMD toggle equivalence, physics.h:394-396).

Goldens regenerate with: python tests/test_golden_trajectories.py --record
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.physics import PhysicsSettings, physics_step
from dxk_tpu.scene import SceneBuilder

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
DT = 1.0 / 120.0


GOLDEN_STEPS = 1000       # BASELINE fidelity row: 1e-3 over 1k steps
GOLDEN_EVERY = 25


def scenes():
    # 1: sphere drop + bounce
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (20, 1, 20), restitution=0.3)
    s = b.add_body(position=(0.1, 2.0, -0.05))
    b.add_sphere_collider(s, (0, 0, 0), 0.5, restitution=0.3)
    yield "sphere_bounce", b

    # 2: 3-box stack
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
    for i in range(3):
        bd = b.add_body(position=(0.02 * i, 0.5 + 1.001 * i, -0.01 * i))
        b.add_box_collider(bd, (0, 0, 0), (0.5, 0.5, 0.5))
    yield "box_stack", b

    # 3: double pendulum on ball joints
    b = SceneBuilder()
    anchor = b.add_body(position=(0, 3, 0), kinematic=True)
    l1 = b.add_body(position=(0.5, 3, 0))
    b.add_capsule_collider(l1, (-0.2, 0, 0), (0.2, 0, 0), 0.05)
    l2 = b.add_body(position=(1.2, 3, 0))
    b.add_capsule_collider(l2, (-0.2, 0, 0), (0.2, 0, 0), 0.05)
    b.add_ball_constraint(anchor, l1, (0, 3, 0))
    b.add_ball_constraint(l1, l2, (0.8, 3, 0))
    yield "double_pendulum", b

    # 4: constraint-zoo chain — all joint types with limits in one chain
    b = SceneBuilder()
    top = b.add_body(position=(0, 8, 0), kinematic=True)
    prev, y = top, 8.0
    for kind in ("distance", "ball", "fixed", "hinge", "cone_twist",
                 "slider"):
        y -= 1.0
        link = b.add_body(position=(0.05, y, -0.02))
        b.add_capsule_collider(link, (0, -0.3, 0), (0, 0.3, 0), 0.12)
        anchor = (0, y + 0.5, 0)
        if kind == "distance":
            b.add_distance_constraint(prev, link, (0, y + 0.8, 0), anchor)
        elif kind == "ball":
            b.add_ball_constraint(prev, link, anchor)
        elif kind == "fixed":
            b.add_fixed_constraint(prev, link, anchor)
        elif kind == "hinge":
            b.add_hinge_constraint(prev, link, anchor, (1, 0, 0),
                                   min_limit=-1.0, max_limit=1.0)
        elif kind == "cone_twist":
            b.add_cone_twist_constraint(prev, link, anchor, (0, -1, 0),
                                        swing_limit=0.8, twist_limit=0.5)
        else:
            b.add_slider_constraint(prev, link, anchor, (0, 1, 0),
                                    min_limit=-0.4, max_limit=0.4)
        prev = link
    yield "constraint_zoo", b

    # 5: ragdoll drop-and-settle (ragdoll.cpp constants)
    from dxk_tpu.models.ragdoll import add_ragdoll
    b = SceneBuilder()
    g = b.add_static(position=(0, -4.0, 0))
    b.add_box_collider(g, (0, 0, 0), (20, 4, 20), friction=1.0)
    add_ragdoll(b, initial_hip_position=(0.0, 1.5, 0.0))
    yield "ragdoll_settle", b

    # 6: mixed-shape drop: hull + cylinder + capsule onto a box ramp
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
    b.add_box_collider(g, (0, 0.3, 0), (2.0, 0.3, 2.0),
                       rotation=(0.13, 0, 0, 0.9915))
    verts = np.array([[0.4, 0, 0], [-0.3, 0.25, 0.1], [0, -0.2, 0.35],
                      [-0.1, -0.15, -0.3], [0.1, 0.3, -0.2]])
    hid = b.add_hull_geometry_from_mesh(verts)
    h = b.add_body(position=(0.3, 2.2, 0.1))
    b.add_hull_collider(h, hid)
    cy = b.add_body(position=(-0.5, 3.0, -0.3))
    b.add_cylinder_collider(cy, (0, -0.25, 0), (0, 0.25, 0), 0.3)
    ca = b.add_body(position=(0.2, 4.0, 0.4))
    b.add_capsule_collider(ca, (0, -0.2, 0), (0, 0.2, 0), 0.25)
    yield "mixed_shape_drop", b


def rollout(scene, steps=GOLDEN_STEPS, mode="scan", every=GOLDEN_EVERY):
    settings = PhysicsSettings(solver_mode=mode)
    state = scene.initial_state()
    step = jax.jit(lambda s: physics_step(scene, s, settings, DT)[0])
    traj = []
    for i in range(steps):
        state = step(state)
        if i % every == every - 1:
            traj.append(np.concatenate([np.asarray(state.pos).ravel(),
                                        np.asarray(state.rot).ravel()]))
    return np.stack(traj)


# the three multi-minute scenes run in the slow tier only; the default
# suite keeps the fast goldens (sphere/box/pendulum) as the fidelity pin
_SLOW_GOLDENS = {"ragdoll_settle", "constraint_zoo", "mixed_shape_drop"}


@pytest.mark.parametrize(
    "name_builder",
    [pytest.param(nb, marks=pytest.mark.slow) if nb[0] in _SLOW_GOLDENS
     else nb for nb in scenes()],
    ids=[n for n, _ in scenes()])
def test_golden(name_builder):
    name, b = name_builder
    path = os.path.join(GOLDEN_DIR, f"{name}.npy")
    scene = b.finalize()
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not recorded")
    traj = rollout(scene)
    golden = np.load(path)
    err = np.abs(traj - golden).max()
    assert err < 1e-3, f"{name}: max deviation {err}"


@pytest.mark.parametrize("name_builder", list(scenes())[:1],
                         ids=[n for n, _ in scenes()][:1])
def test_scan_vs_jacobi_short_horizon(name_builder):
    """Cross-mode equivalence over a short horizon (before chaotic
    divergence), mirroring the reference's scalar/SIMD toggles."""
    name, b = name_builder
    scene = b.finalize()
    t_scan = rollout(scene, steps=30, mode="scan")
    t_jac = rollout(scene, steps=30, mode="jacobi")
    assert np.abs(t_scan - t_jac).max() < 5e-2


if __name__ == "__main__":
    if "--record" in sys.argv:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, b in scenes():
            scene = b.finalize()
            traj = rollout(scene)
            np.save(os.path.join(GOLDEN_DIR, f"{name}.npy"), traj)
            print(f"recorded {name}: {traj.shape}")
    else:
        pytest.main([__file__, "-x", "-q"])
