"""TPU-native particle systems — fire / smoke / boid / debris.

Rebuilds the reference's GPU particle stack (src/particles/particles.cpp:
fixed pool + dead/alive index lists + indirect dispatch; per-system emit/
sim compute shaders in shaders/particle_systems/*.hlsli) as one fused,
vmappable XLA program per step:

- The dead/alive index lists and atomic counters become a fixed-capacity
  SoA pool with `alive = life > 0`. Emission picks dead slots by
  prefix-sum rank — the order-free analog of popping the dead list
  (particle_emit.hlsli:25-35); which dead slot revives is semantically
  irrelevant.
- Fractional emission accumulates exactly like particle_start_cs.hlsl:
  26-30: `accum += emit_rate*dt; n = min(floor(accum), num_dead);
  accum -= n`. Newly emitted particles are simulated the same frame
  (the emit shader appends to currentAliveList before the sim pass).
- Behaviors transcribe the HLSL `emitParticle`/`simulateParticle` pairs
  (fire/smoke/boid: shaders/particle_systems/{fire,smoke,boid}_particle_
  system.hlsli; constants inline there and in src/particles/*.cpp).
- Debris collision: the reference bounces particles off the SCREEN-SPACE
  depth/normal buffers (debris_particle_system.hlsli:100-116) — a
  camera-dependent hack. Here debris collides against the actual scene
  SDF (ops/cloth._particle_collider_sdf + heightfield), with the same
  reflect * 0.5 response; strictly more correct, camera-free.
- The back-to-front render sort (bitonicSortFloat, particles.cpp:188)
  becomes `render_order` (jnp.argsort on camera distance) — render-path
  only, never in the sim step.

Everything is shape-static: jit once, vmap over envs, scan over frames.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from dxk_tpu.core.maths import evaluate_spline, normalize

TWO_PI = 2.0 * np.pi


@struct.dataclass
class ParticleState:
    """Fixed-capacity particle pool (one system). Slot i is alive iff
    life[i] > 0. `rot` is the billboard (sin, cos) the reference packs
    into sinAngle_cosAngle."""
    pos: jnp.ndarray        # (N, 3)
    vel: jnp.ndarray        # (N, 3)
    life: jnp.ndarray       # (N,)
    max_life: jnp.ndarray   # (N,)
    rot: jnp.ndarray        # (N, 2)
    emit_accum: jnp.ndarray  # () f32 — particle_start_cs emitRateAccum
    key: jnp.ndarray        # PRNG key


def init_particles(capacity: int, seed: int = 0) -> ParticleState:
    z3 = jnp.zeros((capacity, 3), jnp.float32)
    z1 = jnp.zeros((capacity,), jnp.float32)
    return ParticleState(
        pos=z3, vel=z3, life=z1, max_life=jnp.ones_like(z1),
        rot=jnp.tile(jnp.array([[0.0, 1.0]], jnp.float32), (capacity, 1)),
        emit_accum=jnp.zeros((), jnp.float32),
        key=jax.random.PRNGKey(seed))


def alive_count(state: ParticleState) -> jnp.ndarray:
    return jnp.sum((state.life > 0.0).astype(jnp.int32))


# ---------------------------------------------------------------------------
# per-system parameter packs (defaults = the reference's inline constants)


@struct.dataclass
class FireParams:
    """fire_particle_system.hlsli:50-72 emit, 75-105 sim."""
    emit_position: jnp.ndarray                   # (3,)
    emit_rate: jnp.ndarray                       # () particles/s
    dir_disk_radius: jnp.ndarray                 # radiusAtDistanceOne
    axial_speed: jnp.ndarray                     # velocity.x *= 4
    buoyancy: jnp.ndarray                        # velocity.y += 5*dt
    life_min: jnp.ndarray
    life_max: jnp.ndarray


def fire_params(emit_position=(0.0, 0.0, 0.0), emit_rate=150.0):
    f = lambda v: jnp.asarray(v, jnp.float32)
    return FireParams(emit_position=f(emit_position), emit_rate=f(emit_rate),
                      dir_disk_radius=f(0.1), axial_speed=f(4.0),
                      buoyancy=f(5.0), life_min=f(1.3), life_max=f(1.8))


@struct.dataclass
class SmokeParams:
    """smoke_particle_system.hlsli:55-82 emit, 85-110 sim; the
    life-scale-from-distance spline ships with the system settings
    (smoke_particle_system.cpp:40-70)."""
    emit_position: jnp.ndarray
    emit_rate: jnp.ndarray
    radius: jnp.ndarray
    gravity: jnp.ndarray                         # -1 (weak sink)
    life_spline_ts: jnp.ndarray                  # (8,)
    life_spline_vals: jnp.ndarray                # (8,)


def smoke_params(emit_position=(0.0, 0.0, 0.0), emit_rate=60.0):
    f = lambda v: jnp.asarray(v, jnp.float32)
    # default spline: identity-ish falloff (full life at center, shorter
    # at the rim) — the reference's editable default is linear 1 -> 1
    ts = jnp.array([0.0, 1.0] + [-1.0] * 6, jnp.float32)
    vals = jnp.array([1.0, 0.4] + [0.0] * 6, jnp.float32)
    return SmokeParams(emit_position=f(emit_position), emit_rate=f(emit_rate),
                       radius=f(4.0), gravity=f(-1.0),
                       life_spline_ts=ts, life_spline_vals=vals)


@struct.dataclass
class BoidParams:
    """boid_particle_system.hlsli:35-84: ballistic hop with a floor
    clamp at the emit height (settings.radius = 15,
    boid_particle_system.cpp:45)."""
    emit_position: jnp.ndarray
    emit_rate: jnp.ndarray
    radius: jnp.ndarray
    gravity: jnp.ndarray                         # -9.81


def boid_params(emit_position=(0.0, 0.0, 0.0), emit_rate=50.0, radius=15.0):
    f = lambda v: jnp.asarray(v, jnp.float32)
    return BoidParams(emit_position=f(emit_position), emit_rate=f(emit_rate),
                      radius=f(radius), gravity=f(-9.81))


@struct.dataclass
class DebrisParams:
    """debris_particle_system.hlsli:52-129: radial burst from up to 4
    emit points, gravity + per-frame drag multiply (frame-rate-bound in
    the reference too — kept for parity), bounce = reflect * 0.5."""
    emit_positions: jnp.ndarray                  # (E, 3)
    emit_mask: jnp.ndarray                       # (E,) which rows are live
    emit_rate: jnp.ndarray
    drag: jnp.ndarray                            # per-frame velocity scale
    restitution: jnp.ndarray                     # 0.5 (reflect * 0.5)
    contact_radius: jnp.ndarray                  # SDF shell thickness
    max_life: jnp.ndarray                        # 5.5


def debris_params(emit_positions, emit_rate=200.0, drag=0.995):
    ep = jnp.atleast_2d(jnp.asarray(emit_positions, jnp.float32))
    f = lambda v: jnp.asarray(v, jnp.float32)
    return DebrisParams(emit_positions=ep,
                        emit_mask=jnp.ones((ep.shape[0],), jnp.float32),
                        emit_rate=f(emit_rate), drag=f(drag),
                        restitution=f(0.5), contact_radius=f(0.05),
                        max_life=f(5.5))


# ---------------------------------------------------------------------------
# emit rules: uniforms u (N, 6) in [0, 1) -> full per-slot field set


def _disk(u0, u1, radius):
    """getRandomPointOnDisk: uniform over the disk area."""
    r = jnp.sqrt(u0) * radius
    a = u1 * TWO_PI
    return r * jnp.cos(a), r * jnp.sin(a)


def _emit_fire(p: FireParams, u):
    dx, dy = _disk(u[:, 0], u[:, 1], p.dir_disk_radius)
    vel = normalize(jnp.stack([jnp.ones_like(dx), dx, dy], -1))
    vel = vel.at[:, 0].mul(p.axial_speed)        # velocity.x *= 4
    pos = jnp.broadcast_to(p.emit_position, vel.shape)
    maxl = p.life_min + u[:, 2] * (p.life_max - p.life_min)
    ang = u[:, 3] * TWO_PI
    rot = jnp.stack([jnp.sin(ang), jnp.cos(ang)], -1)
    return pos, vel, maxl, rot


def _emit_smoke(p: SmokeParams, u):
    ox, oz = _disk(u[:, 0], u[:, 1], p.radius)
    off = jnp.stack([ox, u[:, 2] * 0.5, oz], -1)
    pos = p.emit_position + off
    vel = jnp.stack([u[:, 3], u[:, 4] * 3.0 + 4.0, u[:, 5]], -1)
    dist = jnp.clip(jnp.sqrt(ox * ox + oz * oz) / p.radius, 0.0, 1.0)
    scale = evaluate_spline(p.life_spline_ts, p.life_spline_vals, dist)
    maxl = u[:, 2] * 5.0 * scale + 3.0
    ang = u[:, 4] * TWO_PI
    rot = jnp.stack([jnp.sin(ang), jnp.cos(ang)], -1)
    return pos, vel, maxl, rot


def _emit_boid(p: BoidParams, u):
    ox, oz = _disk(u[:, 0], u[:, 1], p.radius)
    h = u[:, 2] * 2.0 + 3.0
    pos = p.emit_position + jnp.stack([ox, h, oz], -1)
    maxl = u[:, 3] + 4.5
    vx, vz = _disk(u[:, 4], u[:, 5], 1.0)       # point ON the unit disk
    speed = 5.0 + u[:, 3] * 1.5
    vel = jnp.stack([vx * speed, jnp.zeros_like(vx), vz * speed], -1)
    rot = jnp.tile(jnp.array([[0.0, 1.0]], jnp.float32), (u.shape[0], 1))
    return pos, vel, maxl, rot


def _emit_debris(p: DebrisParams, u):
    dx, dz = _disk(u[:, 0], u[:, 1], 0.3)
    off = jnp.stack([dx, jnp.zeros_like(dx), dz], -1)
    vel = normalize(off)
    # emitIndex / 256 picks the batch; here: uniform over live emit rows
    ne = p.emit_positions.shape[0]
    idx = jnp.minimum((u[:, 2] * jnp.sum(p.emit_mask)).astype(jnp.int32),
                      ne - 1)
    oh = (jnp.arange(ne)[None, :] == idx[:, None]).astype(jnp.float32)
    base = oh @ p.emit_positions                 # (N, 3) one-hot gather
    pos = base + off
    maxl = jnp.full((u.shape[0],), p.max_life)
    ang = u[:, 3] * TWO_PI
    rot = jnp.stack([jnp.sin(ang), jnp.cos(ang)], -1)
    return pos, vel, maxl, rot


# ---------------------------------------------------------------------------
# sim rules: (pos, vel, life, max_life, dt) -> (pos, vel)


def _sim_fire(p: FireParams, pos, vel, dt):
    vel = vel + jnp.array([0.0, 1.0, 0.0]) * (p.buoyancy * dt)
    return pos + vel * dt, vel


def _sim_smoke(p: SmokeParams, pos, vel, dt):
    g = jnp.array([0.0, 1.0, 0.0]) * (p.gravity * dt)
    pos = pos + 0.5 * g * dt + vel * dt
    return pos, vel + g


def _sim_boid(p: BoidParams, pos, vel, dt):
    g = jnp.array([0.0, 1.0, 0.0]) * (p.gravity * dt)
    pos = pos + 0.5 * g * dt + vel * dt
    vel = vel + g
    floor = p.emit_position[1]
    below = pos[:, 1] <= floor
    pos = pos.at[:, 1].set(jnp.where(below, floor, pos[:, 1]))
    vel = vel.at[:, 1].set(jnp.where(below, 0.0, vel[:, 1]))
    return pos, vel


def _sim_debris(p: DebrisParams, pos, vel, dt, world, hulls, heightfield):
    vel = vel + jnp.array([0.0, 1.0, 0.0]) * (-9.81 * dt)
    vel = vel * p.drag
    # scene-SDF bounce (replaces the reference's screen-space depth test)
    n = None
    sd = None
    if world is not None and world.a.shape[0] > 0:
        from dxk_tpu.ops.cloth import _particle_collider_sdf
        sdc, nc = _particle_collider_sdf(world, hulls, pos)
        ci = jnp.argmin(sdc, axis=0)
        sd = jnp.min(sdc, axis=0)
        n = jnp.take_along_axis(nc, ci[None, :, None], axis=0)[0]
    if heightfield is not None:
        from dxk_tpu.ops.heightmap import height_at
        hsd = pos[:, 1] - height_at(heightfield, pos[:, 0], pos[:, 2])
        up = jnp.zeros_like(pos).at[:, 1].set(1.0)
        if sd is None:
            sd, n = hsd, up
        else:
            use_h = hsd < sd
            sd = jnp.where(use_h, hsd, sd)
            n = jnp.where(use_h[:, None], up, n)
    if sd is not None:
        vn = jnp.sum(vel * n, -1)
        hit = (sd < p.contact_radius) & (vn < 0.0)
        refl = (vel - 2.0 * vn[:, None] * n) * p.restitution
        vel = jnp.where(hit[:, None], refl, vel)
    return pos + vel * dt, vel


_EMIT = {FireParams: _emit_fire, SmokeParams: _emit_smoke,
         BoidParams: _emit_boid, DebrisParams: _emit_debris}


# ---------------------------------------------------------------------------
# the per-frame update (start + emit + simulate in one XLA program)


def particle_step(params, state: ParticleState, dt,
                  world=None, hulls=None, heightfield=None) -> ParticleState:
    """One frame: fractional-rate emission into dead slots, then the
    behavior sim over every alive particle (incl. the new ones, like the
    reference's emit-then-simulate dispatch order).

    `world`/`hulls`/`heightfield` (from ops.shapes.world_colliders /
    scene.hulls / scene.heightfield) are only read by debris systems."""
    n = state.pos.shape[0]
    key, k_emit = jax.random.split(state.key)

    # ---- START: emission budget (particle_start_cs.hlsl:26-30) ----------
    dead = state.life <= 0.0
    num_dead = jnp.sum(dead.astype(jnp.int32))
    accum = state.emit_accum + params.emit_rate * dt
    n_emit = jnp.minimum(accum.astype(jnp.int32), num_dead)
    accum = accum - n_emit.astype(jnp.float32)

    # ---- EMIT: revive the first n_emit dead slots ------------------------
    rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
    spawn = dead & (rank < n_emit)
    u = jax.random.uniform(k_emit, (n, 6))
    epos, evel, emaxl, erot = _EMIT[type(params)](params, u)
    w = spawn[:, None]
    pos = jnp.where(w, epos, state.pos)
    vel = jnp.where(w, evel, state.vel)
    max_life = jnp.where(spawn, emaxl, state.max_life)
    life = jnp.where(spawn, emaxl, state.life)
    rot = jnp.where(w, erot, state.rot)

    # ---- SIMULATE: age + behavior over alive slots -----------------------
    life = jnp.where(life > 0.0, life - dt, life)
    alive = life > 0.0
    if isinstance(params, DebrisParams):
        npos, nvel = _sim_debris(params, pos, vel, dt,
                                 world, hulls, heightfield)
    elif isinstance(params, FireParams):
        npos, nvel = _sim_fire(params, pos, vel, dt)
    elif isinstance(params, SmokeParams):
        npos, nvel = _sim_smoke(params, pos, vel, dt)
    else:
        npos, nvel = _sim_boid(params, pos, vel, dt)
    pos = jnp.where(alive[:, None], npos, pos)
    vel = jnp.where(alive[:, None], nvel, vel)

    return ParticleState(pos=pos, vel=vel, life=life, max_life=max_life,
                         rot=rot, emit_accum=accum, key=key)


# ---------------------------------------------------------------------------
# render glue (the bitonic-sort + billboard analog; not on the sim path)


def render_order(state: ParticleState, camera_position,
                 front_to_back: bool = False):
    """Draw order for alpha blending — bitonicSortFloat over camera
    distance^2 (particles.cpp:188, REQUIRES_SORTING systems). Returns
    (order (N,), alive_sorted (N,) bool): iterate order, skip dead."""
    v = state.pos - jnp.asarray(camera_position, jnp.float32)
    key = jnp.sum(v * v, -1)
    alive = state.life > 0.0
    big = jnp.float32(np.inf)
    key = jnp.where(alive, key if front_to_back else -key, big)
    order = jnp.argsort(key)
    return order, jnp.take(alive, order)


def rel_life(state: ParticleState):
    """getRelLife: 0 (born) -> 1 (dead); feeds the over-lifetime splines
    (size/intensity/atlas progression) on the render side."""
    return jnp.clip(1.0 - state.life / jnp.maximum(state.max_life, 1e-6),
                    0.0, 1.0)
