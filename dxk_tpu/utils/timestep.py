"""Fixed-timestep frame driver with transform interpolation — the engine-side
physicsStep semantics (/root/reference/src/physics/physics.cpp:1364-1413):
accumulate frame time, run up to `max_iterations` fixed 1/frame_rate substeps,
drop time beyond that ("Dropping physics frames", physics.cpp:1387-1394), and
expose render transforms interpolated between the previous and current
physics state.

Jittable: the substep loop is a static-length masked `lax.scan` over
`max_iterations`, so one `frame()` call handles any dt <= max_iterations/rate.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from dxk_tpu.core.maths import lerp, quat_normalize
from dxk_tpu.physics import PhysicsSettings, physics_step
from dxk_tpu.scene.scene import Scene, State


@struct.dataclass
class FrameState:
    """Carries the physics state pair (transform0/transform1 components,
    rigid_body.h:48-58) and the substep timer."""

    state: State            # current physics state (transform1)
    prev_pos: jnp.ndarray   # previous substep transforms (transform0)
    prev_rot: jnp.ndarray
    timer: jnp.ndarray      # () accumulated time


def init_frame_state(state: State) -> FrameState:
    return FrameState(state=state, prev_pos=state.pos, prev_rot=state.rot,
                      timer=jnp.float32(0.0))


def frame(scene: Scene, fs: FrameState, settings: PhysicsSettings, dt,
          frame_rate: int = 120, max_iterations: int = 4
          ) -> Tuple[FrameState, jnp.ndarray, jnp.ndarray]:
    """Advance one render frame by `dt`. Returns (FrameState, render_pos,
    render_rot) with transforms interpolated by timer/fixed_dt
    (physics.cpp:1396-1402)."""
    fixed_dt = 1.0 / frame_rate
    timer = fs.timer + dt

    will_step = timer >= fixed_dt
    prev_pos = jnp.where(will_step, fs.state.pos, fs.prev_pos)
    prev_rot = jnp.where(will_step, fs.state.rot, fs.prev_rot)

    def substep(carry, _):
        state, timer = carry
        do = timer >= fixed_dt
        new_state, _ = physics_step(scene, state, settings, fixed_dt)
        state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(do, n, o), new_state, state)
        timer = jnp.where(do, timer - fixed_dt, timer)
        return (state, timer), None

    (state, timer), _ = jax.lax.scan(substep, (fs.state, timer), None,
                                     length=max_iterations)
    # drop excess time (the reference logs "Dropping physics frames")
    timer = jnp.where(timer >= fixed_dt, jnp.mod(timer, fixed_dt), timer)

    t = timer / fixed_dt
    render_pos = lerp(prev_pos, state.pos, t)
    render_rot = quat_normalize(lerp(prev_rot, state.rot, t))
    return (FrameState(state=state, prev_pos=prev_pos, prev_rot=prev_rot,
                       timer=timer), render_pos, render_rot)
