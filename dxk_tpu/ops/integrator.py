"""Rigid-body force/velocity integration — batched versions of
rigid_body_component::applyGravityAndIntegrateForces and ::integrateVelocity
(/root/reference/src/physics/rigid_body.cpp:95-142).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from dxk_tpu.core.maths import mat3_T, quat_mul, quat_normalize, quat_rotate, quat_to_mat3
from dxk_tpu.scene.scene import Scene, State

GRAVITY = -9.81  # physics.h:11


def _mat3_mul(A, B):
    """Batched (..., 3, 3) @ (..., 3, 3) as broadcast-multiply-sum.

    Deliberately NOT jnp.matmul/einsum: tiny batched matmuls ride the MXU,
    where DEFAULT f32 precision bf16-truncates the inertia tensors and
    HIGHEST costs 6 passes (the round-5 box bench lost ~20% to exactly
    this under physics_step's float32 matmul context). Elementwise
    component math is exact f32 on the VPU and cheaper than either."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def _mat3_vec(M, v):
    """Batched (..., 3, 3) @ (..., 3) via broadcast-multiply-sum (see
    _mat3_mul for why this avoids the MXU)."""
    return jnp.sum(M * v[..., None, :], axis=-1)


@struct.dataclass
class SolverBodies:
    """The reference's rigid_body_global_state (rigid_body.h:6-16), SoA over
    all bodies (+ dummy): world-space COG position, rotation, world inverse
    inertia, and velocities mutated by the solver."""

    rot: jnp.ndarray        # (N+1, 4)
    local_cog: jnp.ndarray  # (N+1, 3)
    pos_cog: jnp.ndarray    # (N+1, 3) world COG position
    inv_inertia: jnp.ndarray  # (N+1, 3, 3) world-space
    inv_mass: jnp.ndarray   # (N+1,)
    v: jnp.ndarray          # (N+1, 3) linear velocity
    w: jnp.ndarray          # (N+1, 3) angular velocity


def integrate_forces(scene: Scene, state: State, dt) -> SolverBodies:
    """applyGravityAndIntegrateForces (rigid_body.cpp:95-124): gravity into
    the force accumulator, semi-implicit Euler velocity update, then
    1/(1+dt*damping) velocity damping. Also applies the net global force
    field (physics.cpp:1273)."""
    bp = scene.body_params
    rot = state.rot
    pos_cog = state.pos + quat_rotate(rot, bp.local_cog)

    R = quat_to_mat3(rot)
    inv_inertia_w = _mat3_mul(_mat3_mul(R, bp.inv_inertia), mat3_T(R))

    force = state.force_acc + scene.global_ff_force
    # gravity: F.y += g / invMass * gravityFactor for dynamic bodies
    dyn = bp.inv_mass > 0.0
    g_force = jnp.where(dyn, GRAVITY / jnp.where(dyn, bp.inv_mass, 1.0)
                        * bp.gravity_factor, 0.0)
    force = force.at[:, 1].add(g_force)

    lin_acc = force * bp.inv_mass[:, None]
    ang_acc = _mat3_vec(inv_inertia_w, state.torque_acc)

    v = state.lin_vel + lin_acc * dt
    w = state.ang_vel + ang_acc * dt
    v = v / (1.0 + dt * bp.linear_damping[:, None])
    w = w / (1.0 + dt * bp.angular_damping[:, None])

    # dummy body stays pinned (physics.cpp:1279)
    n = scene.num_bodies
    v = v.at[n].set(0.0)
    w = w.at[n].set(0.0)
    inv_inertia_w = inv_inertia_w.at[n].set(0.0)

    return SolverBodies(rot=rot, local_cog=bp.local_cog, pos_cog=pos_cog,
                        inv_inertia=inv_inertia_w,
                        inv_mass=bp.inv_mass.at[n].set(0.0), v=v, w=w)


def integrate_velocities(scene: Scene, bodies: SolverBodies, state: State, dt) -> State:
    """integrateVelocity (rigid_body.cpp:126-142): quaternion-derivative
    rotation update, COG position update, accumulator reset."""
    w = bodies.w
    delta = quat_mul(jnp.concatenate([0.5 * w, jnp.zeros_like(w[:, :1])], -1),
                     bodies.rot)
    rot = quat_normalize(bodies.rot + delta * dt)
    pos_cog = bodies.pos_cog + bodies.v * dt
    pos = pos_cog - quat_rotate(rot, bodies.local_cog)

    # kinematic/static bodies don't move (invMass == 0 leaves v/w untouched,
    # but the transform should also stay exactly fixed for them only if their
    # velocity is zero — kinematic bodies may be moved via velocity, like the
    # reference, so we integrate everyone except the dummy)
    n = scene.num_bodies
    pos = pos.at[n].set(state.pos[n])
    rot = rot.at[n].set(state.rot[n])

    return state.replace(pos=pos, rot=rot, lin_vel=bodies.v, ang_vel=bodies.w,
                         force_acc=jnp.zeros_like(state.force_acc),
                         torque_acc=jnp.zeros_like(state.torque_acc))
