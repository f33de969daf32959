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


class TestMultiCloth:
    """N cloths bake into one flat system (add_cloth docstring;
    physics.cpp:1354-1358 iterates cloth components)."""

    def _single(self, pos, damping):
        b = SceneBuilder()
        b.add_cloth(width=2.0, height=2.0, grid_x=6, grid_y=6,
                    total_mass=1.0, damping=damping, transform_pos=pos)
        return b.finalize()

    def test_two_cloths_match_two_scenes(self):
        b = SceneBuilder()
        i0 = b.add_cloth(width=2.0, height=2.0, grid_x=6, grid_y=6,
                         total_mass=1.0, damping=0.5,
                         transform_pos=(0, 3, 0))
        i1 = b.add_cloth(width=2.0, height=2.0, grid_x=6, grid_y=6,
                         total_mass=1.0, damping=0.9,
                         transform_pos=(5, 4, 0))
        scene = b.finalize()
        assert (i0, i1) == (0, 1)
        assert scene.cloth.grids == ((6, 6, 0), (6, 6, 36))

        s = scene.initial_state()
        step = jax.jit(
            lambda st: physics_step(scene, st, PhysicsSettings(), 1 / 120)[0])
        for _ in range(60):
            s = step(s)

        for k, (pos, damping) in enumerate((((0, 3, 0), 0.5),
                                            ((5, 4, 0), 0.9))):
            ref = self._single(pos, damping)
            rs = ref.initial_state()
            rstep = jax.jit(lambda st, _r=ref: physics_step(
                _r, st, PhysicsSettings(), 1 / 120)[0])
            for _ in range(60):
                rs = rstep(rs)
            off = scene.cloth.grids[k][2]
            got = np.asarray(s.cloth.positions)[off:off + 36]
            want = np.asarray(rs.cloth.positions)
            assert np.abs(got - want).max() < 1e-5


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestClothRigidCollision:
    """Cloth-vs-rigid pushout (collide_particles). The reference has NO
    cloth-rigid collision (cloth.cpp never queries colliders) — this
    exceeds parity, so the oracle is geometric: particles with thickness
    stay outside colliders where the zero-thickness cloth passes through."""

    def _scene(self, thickness):
        b = SceneBuilder()
        g = b.add_static(position=(0.0, 1.5, 0.0))
        b.add_sphere_collider(g, (0, 0, 0), 0.8)
        b.add_cloth(width=2.0, height=2.0, grid_x=8, grid_y=8,
                    total_mass=1.0, transform_pos=(0, 3, 0),
                    thickness=thickness)
        return b.finalize()

    def _drape_dmin(self, scene, steps=600):
        """Min distance of any free particle to the sphere center over the
        whole trajectory (the hanging sheet swings like a pendulum, so a
        single-step snapshot is flaky)."""
        state = scene.initial_state()
        step = jax.jit(lambda s: physics_step(scene, s, PhysicsSettings(),
                                              1 / 120)[0])
        c = np.array([0.0, 1.5, 0.0])
        dmin = np.inf
        for i in range(steps):
            state = step(state)
            if i % 10 == 0:
                p = np.asarray(state.cloth.positions)
                assert np.all(np.isfinite(p))
                d = np.linalg.norm(p[8:] - c, axis=-1)   # top row pinned
                dmin = min(dmin, float(d.min()))
        return dmin

    def test_drapes_on_sphere(self):
        dmin = self._drape_dmin(self._scene(thickness=0.05))
        # nothing ever inside the sphere (+thickness shell, solver tol)
        assert dmin > 0.8 + 0.05 - 0.02

    def test_zero_thickness_passes_through(self):
        dmin = self._drape_dmin(self._scene(thickness=0.0))
        assert dmin < 0.75                # swings straight through


class TestTwoWayCoupling:
    """Two-way cloth-rigid coupling (round 3): the momentum the pushout
    removes from particles is applied back to the colliding body. Oracle:
    a free gravity-less sphere touched only by the swinging sheet acquires
    velocity iff coupling is on (it interacts with nothing else, so its
    velocity is exactly zero one-way)."""

    def _scene(self):
        b = SceneBuilder()
        sp = b.add_body(position=(0.0, 1.5, 0.0), gravity_factor=0.0)
        b.add_sphere_collider(sp, (0, 0, 0), 0.8)
        b.add_cloth(width=2.0, height=2.0, grid_x=8, grid_y=8,
                    total_mass=2.0, transform_pos=(0, 3, 0),
                    thickness=0.05)
        return b.finalize()

    def _run(self, two_way, steps=300):
        scene = self._scene()
        settings = PhysicsSettings(cloth_two_way=two_way)
        state = scene.initial_state()
        step = jax.jit(lambda s: physics_step(scene, s, settings,
                                              1 / 120)[0])
        for _ in range(steps):
            state = step(state)
        assert np.all(np.isfinite(np.asarray(state.pos)))
        assert np.all(np.isfinite(np.asarray(state.cloth.positions)))
        return float(np.abs(np.asarray(state.lin_vel[0])).max()), state

    def test_body_feels_cloth(self):
        v_on, st_on = self._run(True)
        v_off, _ = self._run(False)
        assert v_off == 0.0                  # one-way: untouched
        assert v_on > 1e-4                   # two-way: momentum transferred
