"""Ragdoll drop-and-settle (BASELINE config 3): the 14-body humanoid from
ragdoll.cpp dropped onto the training ground box from resetPhysics
(learned_locomotion.cpp:440-446)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.models.ragdoll import add_ragdoll, SCALE
from dxk_tpu.physics import PhysicsSettings, physics_step
from dxk_tpu.scene import SceneBuilder


def build_training_scene(hip=(0.0, 1.25, 0.0)):
    """Ground AABB + ragdoll, as in resetPhysics (learned_locomotion.cpp)."""
    b = SceneBuilder()
    ground = b.add_static(position=(0, -4.0, 0))
    b.add_box_collider(ground, (0, 0, 0), (20, 4, 20),
                       friction=1.0, restitution=0.1)
    rag = add_ragdoll(b, initial_hip_position=hip)
    return b, rag


class TestRagdoll:
    def test_mass_properties(self):
        """Total ragdoll mass should be human-plausible (the reference's
        density 985 with these capsule volumes gives ~70-90 kg)."""
        b, rag = build_training_scene()
        scene = b.finalize()
        inv_m = np.asarray(scene.body_params.inv_mass)
        masses = 1.0 / inv_m[rag.body_ids]
        total = masses.sum()
        assert 40.0 < total < 120.0, f"total mass {total}"
        # torso is the heaviest part
        assert masses[0] == masses.max()

    @pytest.mark.slow
    def test_drop_and_settle(self):
        b, rag = build_training_scene()
        scene = b.finalize(max_narrow_pairs_per_group=64)
        settings = PhysicsSettings()
        state = scene.initial_state()
        step = jax.jit(lambda s: physics_step(scene, s, settings, 1 / 120)[0])
        for _ in range(360):   # 3 s
            state = step(state)

        ids = np.asarray(rag.body_ids)
        pos = np.asarray(state.pos[ids])
        vel = np.asarray(state.lin_vel[ids])
        assert np.all(np.isfinite(pos)) and np.all(np.isfinite(vel))
        # nothing fell through the ground or launched
        assert np.all(pos[:, 1] > -0.5), pos[:, 1]
        assert np.all(pos[:, 1] < 2.0), pos[:, 1]
        # it settled
        assert np.all(np.linalg.norm(vel, axis=-1) < 1.0)

        # joints held: head stays within anatomical distance of torso
        torso = np.asarray(state.pos[rag.bodies["torso"]])
        head = np.asarray(state.pos[rag.bodies["head"]])
        assert np.linalg.norm(head - torso) < 2.0 * SCALE

        # knees: lower legs near upper legs
        for side in ("left", "right"):
            u = np.asarray(state.pos[rag.bodies[f"{side}_upper_leg"]])
            l = np.asarray(state.pos[rag.bodies[f"{side}_lower_leg"]])
            assert np.linalg.norm(u - l) < 2.0 * SCALE


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
