"""PBD grid cloth — batched version of cloth_component::simulate
(/root/reference/src/physics/cloth.cpp:137-318): Verlet-style integration,
then velocity- / position- (XPBD-like) / drift-solve passes over distance
constraints, then 1/(1+dt*damping) damping. Wind force is per-triangle
(cloth.cpp:137-172).

The reference iterates constraints sequentially (Gauss-Seidel on positions);
constraint counts per cloth are small (~6 per particle), so a `lax.scan`
keeps the exact semantics and vmaps across envs. A Jacobi variant can be
added for giant cloths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dxk_tpu.core.maths import cross, dot, normalize, squared_length
from dxk_tpu.scene.scene import ClothParams, ClothState

GRAVITY = -9.81


def apply_wind_force(params: ClothParams, state: ClothState, force):
    """applyWindForce (cloth.cpp:137-172): each grid quad's two triangles
    push 1/3 of the normal-projected force onto their vertices."""
    tris = params.triangles
    p = state.positions
    a, b, c = p[tris[:, 0]], p[tris[:, 1]], p[tris[:, 2]]
    normal = cross(b - a, c - a)
    f = normal * dot(normalize(normal + 1e-30), force)[:, None] * (1.0 / 3.0)
    forces = state.forces
    for k in range(3):
        forces = forces.at[tris[:, k]].add(f)
    return state.replace(forces=forces)


def _solve_positions_scan(params, positions):
    """solvePositions (cloth.cpp:300-318), sequential like the reference."""
    cons = params.constraints
    rest_sq = params.rest_lengths ** 2
    inv_mass = params.inv_masses
    ims = params.inv_mass_sums

    def body(pos, i):
        ia, ib = cons[i, 0], cons[i, 1]
        delta = pos[ib] - pos[ia]
        ln = squared_length(delta)
        sq = rest_sq[i]
        active = (ims[i] > 0.0) & (sq + ln > 1e-5)
        k = jnp.where(active, (sq - ln) / jnp.maximum(ims[i] * (sq + ln), 1e-30), 0.0)
        pos = pos.at[ia].add(-delta * (k * inv_mass[ia]))
        pos = pos.at[ib].add(delta * (k * inv_mass[ib]))
        return pos, None

    positions, _ = jax.lax.scan(body, positions, jnp.arange(cons.shape[0]))
    return positions


def _solve_velocities_scan(params, velocities, gradients, inv_scaled_grad_sq):
    """solveVelocities (cloth.cpp:288-298)."""
    cons = params.constraints
    inv_mass = params.inv_masses

    def body(vel, i):
        ia, ib = cons[i, 0], cons[i, 1]
        g = gradients[i]
        j = -dot(g, vel[ia] - vel[ib]) * inv_scaled_grad_sq[i]
        vel = vel.at[ia].add(g * (j * inv_mass[ia]))
        vel = vel.at[ib].add(-g * (j * inv_mass[ib]))
        return vel, None

    velocities, _ = jax.lax.scan(body, velocities, jnp.arange(cons.shape[0]))
    return velocities


def cloth_step(params: ClothParams, state: ClothState, settings,
               wind_force, dt) -> ClothState:
    """simulate (cloth.cpp:180-286)."""
    state = apply_wind_force(params, state, wind_force)

    inv_mass = params.inv_masses
    gravity_v = GRAVITY * dt * params.gravity_factor

    vel = state.velocities
    vel = vel.at[:, 1].add(jnp.where(inv_mass > 0.0, gravity_v, 0.0))
    vel = vel + state.forces * (inv_mass * dt)[:, None]
    prev = state.positions
    pos = prev + vel * dt

    inv_dt = jnp.where(dt > 1e-5, 1.0 / dt, 1.0)

    if settings.num_cloth_velocity_iterations > 0:
        cons = params.constraints
        grad = prev[cons[:, 1]] - prev[cons[:, 0]]
        denom = squared_length(grad) * params.inv_mass_sums
        inv_sgsq = jnp.where(params.inv_mass_sums == 0.0, 0.0,
                             1.0 / jnp.maximum(denom, 1e-30))
        for _ in range(settings.num_cloth_velocity_iterations):
            vel = _solve_velocities_scan(params, vel, grad, inv_sgsq)
        pos = prev + vel * dt

    if settings.num_cloth_position_iterations > 0:
        for _ in range(settings.num_cloth_position_iterations):
            pos = _solve_positions_scan(params, pos)
        vel = (pos - prev) * inv_dt

    if settings.num_cloth_drift_iterations > 0:
        drift_prev = pos
        for _ in range(settings.num_cloth_drift_iterations):
            pos = _solve_positions_scan(params, pos)
        vel = vel + (pos - drift_prev) * inv_dt

    vel = vel * (1.0 / (1.0 + dt * params.damping))[:, None]
    return ClothState(positions=pos, prev_positions=prev, velocities=vel,
                      forces=jnp.zeros_like(state.forces))
