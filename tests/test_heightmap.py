"""Heightfield terrain collision tests (ops/heightmap.py; reference
heightmap_collision.cpp + heightmap_collider.h behaviors)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.physics import PhysicsSettings, physics_step
from dxk_tpu.scene import SceneBuilder


def slope_scene(extra=None):
    b = SceneBuilder()
    H = np.fromfunction(lambda z, x: 0.2 * x, (32, 32), dtype=np.float32)
    b.set_heightfield(H, cell_size=1.0, min_corner=(0, 0, 0), friction=0.2)
    return b, H


class TestHeightfield:
    def test_height_at(self):
        from dxk_tpu.ops.heightmap import height_at
        b, H = slope_scene()
        scene = b.finalize()
        hf = scene.heightfield
        # slope h = 0.2x sampled mid-cell
        assert abs(float(height_at(hf, 10.5, 7.3)) - 0.2 * 10.5) < 1e-3

    def test_sphere_rests_on_slope(self):
        b, H = slope_scene()
        ball = b.add_body(position=(20.0, 4.8, 16.0))
        b.add_sphere_collider(ball, (0, 0, 0), 0.5, friction=0.2)
        scene = b.finalize()
        state = scene.initial_state()
        step = jax.jit(lambda s: physics_step(scene, s, PhysicsSettings(),
                                              1 / 120)[0])
        for _ in range(300):
            state = step(state)
        p = np.asarray(state.pos[ball])
        assert np.all(np.isfinite(p))
        # rests ~radius above the local terrain height and rolled downhill
        assert abs(p[1] - 0.2 * p[0] - 0.5) < 0.05
        assert p[0] < 20.0

    def test_box_rests_on_slope(self):
        b, H = slope_scene()
        box = b.add_body(position=(10.0, 2.9, 10.0))
        b.add_box_collider(box, (0, 0, 0), (0.4, 0.4, 0.4), friction=0.8)
        scene = b.finalize()
        state = scene.initial_state()
        step = jax.jit(lambda s: physics_step(scene, s, PhysicsSettings(),
                                              1 / 120)[0])
        for _ in range(300):
            state = step(state)
        p = np.asarray(state.pos[box])
        assert np.all(np.isfinite(p))
        # sits on the surface (between ~0.4 and 0.58 above terrain when tilted)
        h = p[1] - 0.2 * p[0]
        assert 0.3 < h < 0.7, h

    def test_capsule_safety_contact(self):
        """A capsule spawned below the surface is pushed out by the safety
        contact (heightmap_collision.cpp:537-570)."""
        b, H = slope_scene()
        cap = b.add_body(position=(10.0, 1.0, 10.0))  # terrain height = 2.0
        b.add_capsule_collider(cap, (-0.3, 0, 0), (0.3, 0, 0), 0.2)
        scene = b.finalize()
        state = scene.initial_state()
        step = jax.jit(lambda s: physics_step(scene, s, PhysicsSettings(),
                                              1 / 120)[0])
        for _ in range(300):
            state = step(state)
        p = np.asarray(state.pos[cap])
        assert np.all(np.isfinite(p))
        assert p[1] > 0.2 * p[0]  # above the surface


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
