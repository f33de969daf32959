"""Regression: bodies must not sink when candidate pairs >> actual contacts.

Invalid (non-hit) contact slots used to count toward the per-body degree in
the jacobi/colored averaging; with a full O(C^2) pair table the 1/degree
scaling collapsed the effective impulse and a field of boxes sank through
the ground at near-gravity rate (physics.py contact-slot dummy redirect).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dxk_tpu.physics import PhysicsSettings, physics_step
from dxk_tpu.scene import SceneBuilder


def test_box_field_settles_colored():
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (40, 1, 40))
    ids = []
    for ix in range(7):
        for iz in range(7):
            bd = b.add_body(position=(ix * 1.5 - 4.5, 1.0, iz * 1.5 - 4.5))
            b.add_box_collider(bd, (0, 0, 0), (0.4, 0.4, 0.4))
            ids.append(bd)
    scene = b.finalize()
    state = scene.initial_state()
    st = PhysicsSettings(solver_mode="colored")
    step = jax.jit(lambda s: physics_step(scene, s, st, 1 / 60)[0])
    for _ in range(150):
        state = step(state)
    y = np.asarray(state.pos)[ids, 1]
    assert np.isfinite(y).all()
    # every box rests on the ground plane (y ~= half extent 0.4)
    assert (np.abs(y - 0.4) < 0.02).all(), y
