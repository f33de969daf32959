"""Cloth tests (reference cloth.cpp behavior): pinned top row, constraint
lengths preserved, wind pushes the sheet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.physics import PhysicsSettings, physics_step
from dxk_tpu.scene import SceneBuilder


def build(gx=8, gy=8, **kw):
    b = SceneBuilder()
    b.add_cloth(width=2.0, height=2.0, grid_x=gx, grid_y=gy, total_mass=1.0,
                transform_pos=(0, 3, 0), **kw)
    return b.finalize()


class TestCloth:
    def test_hangs_from_pinned_row(self):
        scene = build()
        state = scene.initial_state()
        step = jax.jit(lambda s: physics_step(scene, s, PhysicsSettings(), 1 / 120)[0])
        top_before = np.asarray(state.cloth.positions[:8])
        for _ in range(240):
            state = step(state)
        p = np.asarray(state.cloth.positions)
        assert np.all(np.isfinite(p))
        # top row pinned exactly
        assert np.allclose(p[:8], top_before, atol=1e-6)
        # bottom row fell below the top row
        assert p[-8:, 1].max() < p[:8, 1].min() - 1.0

    def test_constraint_lengths_preserved(self):
        scene = build()
        state = scene.initial_state()
        step = jax.jit(lambda s: physics_step(scene, s, PhysicsSettings(), 1 / 120)[0])
        for _ in range(300):
            state = step(state)
        p = np.asarray(state.cloth.positions)
        cons = np.asarray(scene.cloth.constraints)
        rest = np.asarray(scene.cloth.rest_lengths)
        cur = np.linalg.norm(p[cons[:, 0]] - p[cons[:, 1]], axis=-1)
        # PBD with 1 iteration leaves some stretch; structural constraints
        # should be within ~15%
        assert np.median(np.abs(cur - rest) / np.maximum(rest, 1e-6)) < 0.15

    def test_wind_pushes_sheet(self):
        b = SceneBuilder()
        b.add_cloth(width=2.0, height=2.0, grid_x=8, grid_y=8, total_mass=1.0,
                    transform_pos=(0, 3, 0))
        b.add_force_field((0.0, 0.0, 30.0))   # global wind +z
        scene = b.finalize()
        state = scene.initial_state()
        step = jax.jit(lambda s: physics_step(scene, s, PhysicsSettings(), 1 / 120)[0])
        for _ in range(240):
            state = step(state)
        p = np.asarray(state.cloth.positions)
        # unpinned rows blown toward +z
        assert p[8:, 2].mean() > 0.05


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
