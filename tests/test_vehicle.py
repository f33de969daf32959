"""Vehicle (BASELINE config 4, constraint-zoo stress test): drop on ground,
drive the motor, check the drivetrain spins and nothing explodes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.models.vehicle import add_vehicle
from dxk_tpu.physics import PhysicsSettings, physics_step
from dxk_tpu.scene import SceneBuilder


class TestVehicle:
    @pytest.mark.slow
    def test_drop_and_drive(self):
        b = SceneBuilder()
        ground = b.add_static(position=(0, -4.0, 0))
        b.add_box_collider(ground, (0, 0, 0), (50, 4, 50), friction=1.0)
        veh = add_vehicle(b, initial_position=(0.0, 1.1, 0.0))
        scene = b.finalize(max_narrow_pairs_per_group=96)
        settings = PhysicsSettings(num_rigid_solver_iterations=30)

        state = scene.initial_state()
        # drive the motor with a velocity motor (vehicle.cpp:366-370)
        controls = scene.default_controls
        controls = controls.replace(
            hinge_motor_type=controls.hinge_motor_type.at[veh.motor_hinge].set(0),
            hinge_target=controls.hinge_target.at[veh.motor_hinge].set(3.0),
            hinge_max_torque=controls.hinge_max_torque.at[veh.motor_hinge].set(500.0),
        )
        state = state.replace(controls=controls)

        step = jax.jit(lambda s: physics_step(scene, s, settings, 1 / 120)[0])
        for _ in range(180):
            state = step(state)

        ids = np.array(sorted(veh.parts.values()))
        pos = np.asarray(state.pos[ids])
        vel = np.asarray(state.lin_vel[ids])
        assert np.all(np.isfinite(pos)) and np.all(np.isfinite(vel))
        # vehicle stays together near the spawn
        motor = veh.parts["motor"]
        spread = np.linalg.norm(pos - np.asarray(state.pos[motor]), axis=-1)
        assert np.all(spread < 5.0), spread.max()
        # nothing fell through the ground
        assert np.all(pos[:, 1] > -1.0)
        # the motor gear is spinning up about its (vertical) hinge axis.
        # The full drivetrain (interlocked gear teeth -> differential ->
        # wheels on friction-1 ground) loads the 500 N*m motor heavily, so
        # after 1.5 s only a slow creep is physical; just require motion.
        mg = veh.parts["motor_gear"]
        assert abs(float(state.ang_vel[mg, 1])) > 0.05


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
