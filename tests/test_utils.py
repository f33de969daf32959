"""Tests for the aux subsystems: fixed-timestep driver, serialization,
checkpointing, stats logging (SURVEY.md §5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.physics import PhysicsSettings, physics_step
from dxk_tpu.scene import SceneBuilder


def simple_scene():
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
    ball = b.add_body(position=(0, 3, 0))
    b.add_sphere_collider(ball, (0, 0, 0), 0.5)
    return b, ball


class TestFixedTimestep:
    def test_frame_driver_matches_manual_substeps(self):
        from dxk_tpu.utils.timestep import frame, init_frame_state
        b, ball = simple_scene()
        scene = b.finalize()
        settings = PhysicsSettings()

        fs = init_frame_state(scene.initial_state())
        f = jax.jit(lambda fs: frame(scene, fs, settings, 1 / 60.0,
                                     frame_rate=120))
        for _ in range(30):   # 0.5 s at 60 fps -> 60 substeps at 120 Hz
            fs, rpos, rrot = f(fs)

        manual = scene.initial_state()
        step = jax.jit(lambda s: physics_step(scene, s, settings, 1 / 120)[0])
        for _ in range(60):
            manual = step(manual)
        assert np.allclose(np.asarray(fs.state.pos[ball]),
                           np.asarray(manual.pos[ball]), atol=1e-4)

    def test_interpolation_bounded(self):
        from dxk_tpu.utils.timestep import frame, init_frame_state
        b, ball = simple_scene()
        scene = b.finalize()
        settings = PhysicsSettings()
        fs = init_frame_state(scene.initial_state())
        f = jax.jit(lambda fs: frame(scene, fs, settings, 0.013,
                                     frame_rate=120))
        for _ in range(20):
            fs, rpos, rrot = f(fs)
            # interpolated transform lies between prev and current
            lo = np.minimum(np.asarray(fs.prev_pos[ball]),
                            np.asarray(fs.state.pos[ball]))
            hi = np.maximum(np.asarray(fs.prev_pos[ball]),
                            np.asarray(fs.state.pos[ball]))
            assert np.all(np.asarray(rpos[ball]) >= lo - 1e-5)
            assert np.all(np.asarray(rpos[ball]) <= hi + 1e-5)


class TestSerialization:
    def test_scene_roundtrip(self, tmp_path):
        from dxk_tpu.scene.serialization import load_scene, save_scene
        b, ball = simple_scene()
        b.add_hinge_constraint(0, ball, (0, 3, 0), (0, 1, 0))
        path = str(tmp_path / "scene.json")
        save_scene(path, b)
        b2 = load_scene(path)
        s1 = b.finalize()
        s2 = b2.finalize()
        assert np.allclose(np.asarray(s1.init_pos), np.asarray(s2.init_pos))
        assert np.allclose(np.asarray(s1.body_params.inv_mass),
                           np.asarray(s2.body_params.inv_mass))
        assert np.allclose(np.asarray(s1.hinge.local_anchor_a),
                           np.asarray(s2.hinge.local_anchor_a))

    def test_state_roundtrip(self, tmp_path):
        from dxk_tpu.scene.serialization import load_state, save_state
        b, ball = simple_scene()
        scene = b.finalize()
        state = scene.initial_state()
        step = jax.jit(lambda s: physics_step(scene, s, PhysicsSettings(),
                                              1 / 120)[0])
        for _ in range(10):
            state = step(state)
        path = str(tmp_path / "state.npz")
        save_state(path, state)
        restored = load_state(path, scene.initial_state())
        assert np.allclose(np.asarray(restored.pos), np.asarray(state.pos))


class TestCheckpoint:
    def test_save_restore_best_tracker(self, tmp_path):
        from dxk_tpu.utils.checkpoint import BestModelTracker, Checkpointer
        ckpt = Checkpointer(str(tmp_path / "ckpt"))
        tracker = BestModelTracker(ckpt)
        state = {"w": jnp.arange(4.0), "step": jnp.int32(1)}
        assert tracker.update(1, 1.0, state)
        assert not tracker.update(2, 0.5, state)      # no improvement
        state2 = {"w": jnp.arange(4.0) * 2, "step": jnp.int32(3)}
        assert tracker.update(3, 2.0, state2)
        restored = ckpt.restore(template=state)
        assert np.allclose(np.asarray(restored["w"]), np.arange(4.0) * 2)


class TestStats:
    def test_logger_csv(self, tmp_path):
        from dxk_tpu.utils.profiling import StatsLogger
        path = str(tmp_path / "stats.csv")
        log = StatsLogger(path)
        log.log(0, {"contacts": jnp.int32(5), "reward": 1.5})
        log.log(1, {"contacts": jnp.int32(7), "reward": 2.5})
        log.flush()
        text = open(path).read()
        assert "contacts" in text and "2.5" in text


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestKNN:
    def test_knn_matches_numpy(self):
        from dxk_tpu.utils.knn import knn, nearest
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        q = rng.normal(size=(5, 3)).astype(np.float32)
        idx, sq = knn(jnp.asarray(pts), jnp.asarray(q), 3)
        ref = np.argsort(((q[:, None] - pts[None]) ** 2).sum(-1), axis=1)[:, :3]
        assert np.array_equal(np.asarray(idx), ref)
        i, d = nearest(jnp.asarray(pts), jnp.asarray(q[0]))
        assert int(i) == ref[0, 0]


class TestHullSerialization:
    def test_hull_scene_roundtrip_identical_trajectory(self, tmp_path):
        """Hull vertices + face planes + mass properties all persist
        (exceeding serialization_yaml.cpp:74-278, which skips hulls):
        a reloaded hull scene must produce the identical trajectory."""
        import jax
        import numpy as np
        from dxk_tpu.physics import PhysicsSettings, physics_step
        from dxk_tpu.scene import SceneBuilder
        from dxk_tpu.scene.serialization import load_scene, save_scene

        def build():
            b = SceneBuilder()
            g = b.add_static()
            b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
            # irregular tetrahedron-ish hull (asymmetric inertia)
            verts = np.array([[0.4, 0, 0], [-0.3, 0.25, 0.1],
                              [0, -0.2, 0.35], [-0.1, -0.15, -0.3],
                              [0.1, 0.3, -0.2]])
            hid = b.add_hull_geometry_from_mesh(verts)
            body = b.add_body(position=(0, 1.0, 0), rotation=(0.2, 0.1, 0, 0.97))
            b.add_hull_collider(body, hid)
            return b

        b1 = build()
        path = str(tmp_path / "scene.json")
        save_scene(path, b1)
        b2 = load_scene(path)

        settings = PhysicsSettings(num_rigid_solver_iterations=10,
                                   solver_mode="scan")

        def run(builder):
            scene = builder.finalize()
            st = scene.initial_state()
            step = jax.jit(lambda s: physics_step(scene, s, settings, 1 / 120))
            for _ in range(120):
                st, _ = step(st)
            return np.asarray(st.pos), np.asarray(st.rot)

        p1, r1 = run(b1)
        p2, r2 = run(b2)
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(r1, r2)
