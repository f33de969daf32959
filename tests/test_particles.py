"""Particle systems (ops/particles.py) vs the reference's GPU particle
semantics (particles.cpp, particle_start_cs.hlsl, *_particle_system.hlsli)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.core.maths import evaluate_spline
from dxk_tpu.ops.particles import (alive_count, boid_params, debris_params,
                                   fire_params, init_particles, particle_step,
                                   render_order, rel_life, smoke_params)


def _run(params, capacity, steps, dt=1 / 60, seed=0, **kw):
    state = init_particles(capacity, seed)
    step = jax.jit(lambda s: particle_step(params, s, dt, **kw))
    for _ in range(steps):
        state = step(state)
    return state


# ---------------------------------------------------------------------------
# emission accounting (particle_start_cs.hlsl:26-30)


def test_emission_rate_accumulates():
    # 90 particles/s at 60 Hz = 1.5/frame: alternating 1 and 2 emits
    p = fire_params(emit_rate=90.0)
    state = init_particles(256)
    counts = []
    for _ in range(8):
        before = int(alive_count(state))
        state = particle_step(p, state, 1 / 60)
        counts.append(int(alive_count(state)) - before)
    assert counts == [1, 2, 1, 2, 1, 2, 1, 2]


def test_emission_capped_by_dead_space():
    p = fire_params(emit_rate=1e6)
    state = _run(p, 64, 3)
    assert int(alive_count(state)) == 64
    # saturated pool: accum keeps the unspent request (reference TODO
    # notes it can run to infinity; we mirror the semantics)
    assert float(state.emit_accum) > 0.0


def test_life_countdown_kills():
    p = fire_params(emit_rate=120.0)
    state = _run(p, 512, 30)                     # 0.5 s: none expired yet
    n_mid = int(alive_count(state))
    assert n_mid == 60
    step = jax.jit(lambda s: particle_step(
        fire_params(emit_rate=0.0), s, 1 / 60))
    for _ in range(120):                         # 2 s > life_max 1.8
        state = step(state)
    assert int(alive_count(state)) == 0


def test_dead_slots_are_reused():
    p = fire_params(emit_rate=30.0)
    state = _run(p, 8, 600)                      # rate*life ~ 0.9 < 8
    assert int(alive_count(state)) <= 8
    assert int(alive_count(state)) > 0


# ---------------------------------------------------------------------------
# behaviors


def test_fire_rises_and_streams_axially():
    p = fire_params(emit_position=(1.0, 2.0, 3.0), emit_rate=600.0)
    state = _run(p, 1024, 60)
    alive = np.asarray(state.life > 0)
    pos = np.asarray(state.pos)[alive]
    vel = np.asarray(state.vel)[alive]
    assert pos.shape[0] > 0
    assert np.all(pos[:, 0] > 1.0)               # axial +x jet
    assert np.mean(vel[:, 1]) > 1.0              # buoyancy accumulated


def test_smoke_disk_emission_and_drift():
    p = smoke_params(emit_position=(0.0, 0.0, 0.0), emit_rate=600.0)
    state = _run(p, 2048, 120)
    alive = np.asarray(state.life > 0)
    pos = np.asarray(state.pos)[alive]
    assert pos.shape[0] > 0
    assert np.all(pos[:, 1] > 0.0)               # rises (vy in [4, 7])
    r = np.sqrt(pos[:, 0] ** 2 + pos[:, 2] ** 2)
    assert r.max() > 1.0                         # spread over the disk


def test_smoke_life_scale_spline_shortens_rim_life():
    p = smoke_params(emit_rate=600.0)
    state = _run(p, 4096, 2)
    alive = np.asarray(state.life > 0)
    pos = np.asarray(state.pos)[alive]
    maxl = np.asarray(state.max_life)[alive]
    r = np.sqrt(pos[:, 0] ** 2 + pos[:, 2] ** 2) / 4.0
    inner, outer = maxl[r < 0.3], maxl[r > 0.8]
    assert inner.mean() > outer.mean()           # spline 1 -> 0.4


def test_boid_floor_clamp():
    p = boid_params(emit_position=(0.0, 5.0, 0.0), emit_rate=300.0)
    state = _run(p, 1024, 240)                   # 4 s: everything landed
    alive = np.asarray(state.life > 0)
    pos = np.asarray(state.pos)[alive]
    vel = np.asarray(state.vel)[alive]
    assert pos.shape[0] > 0
    assert np.all(pos[:, 1] >= 5.0 - 1e-4)       # clamped at emit height
    landed = pos[:, 1] <= 5.0 + 1e-4
    assert landed.any()
    assert np.all(np.abs(vel[landed, 1]) < 1e-5)


def test_debris_radial_burst_and_gravity():
    p = debris_params([(0.0, 3.0, 0.0)], emit_rate=600.0)
    state = _run(p, 512, 30)
    alive = np.asarray(state.life > 0)
    vel = np.asarray(state.vel)[alive]
    assert vel.shape[0] > 0
    assert np.mean(vel[:, 1]) < -1.0             # gravity accumulated


def test_debris_bounces_off_scene_sdf():
    from dxk_tpu.ops.shapes import world_colliders
    from dxk_tpu.scene import SceneBuilder

    b = SceneBuilder()
    g = b.add_static(position=(0.0, -1.0, 0.0))
    b.add_box_collider(g, (0, 0, 0), (10.0, 1.0, 10.0))
    scene = b.finalize()
    st = scene.initial_state()
    w = world_colliders(scene, st.pos, st.rot)

    p = debris_params([(0.0, 1.5, 0.0)], emit_rate=600.0, drag=1.0)
    state = init_particles(256)
    step = jax.jit(lambda s: particle_step(p, s, 1 / 60, world=w,
                                           hulls=scene.hulls))
    bounced = False
    for _ in range(180):
        state = step(state)
        vy = np.asarray(state.vel[:, 1])
        al = np.asarray(state.life > 0)
        if (vy[al] > 0.1).any():
            bounced = True
    assert bounced                               # reflect * 0.5 fired
    alive = np.asarray(state.life > 0)
    assert np.asarray(state.pos)[alive, 1].min() > -0.5  # not through floor


# ---------------------------------------------------------------------------
# harness properties


def test_vmap_batches_systems():
    p = fire_params(emit_rate=120.0)
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    states = jax.vmap(lambda k: init_particles(64).replace(key=k))(keys)
    step = jax.jit(jax.vmap(lambda s: particle_step(p, s, 1 / 60)))
    for _ in range(10):
        states = step(states)
    counts = jax.vmap(alive_count)(states)
    assert np.all(np.asarray(counts) == 20)
    # distinct keys -> distinct particle clouds
    pos = np.asarray(states.pos)
    assert not np.allclose(pos[0], pos[1])


def test_scan_over_frames():
    p = smoke_params(emit_rate=120.0)

    def body(s, _):
        return particle_step(p, s, 1 / 60), alive_count(s)

    _, counts = jax.lax.scan(body, init_particles(128), None, length=30)
    assert int(counts[-1]) == 58                 # 29 frames aged, 2/frame


def test_render_order_back_to_front():
    p = fire_params(emit_rate=300.0)
    state = _run(p, 256, 30)
    order, alive_sorted = render_order(state, (10.0, 0.0, 0.0))
    n_alive = int(alive_count(state))
    assert bool(alive_sorted[:n_alive].all())    # alive first
    d = np.asarray(jnp.sum(
        (state.pos[order] - jnp.array([10.0, 0.0, 0.0])) ** 2, -1))
    d_alive = d[:n_alive]
    assert np.all(np.diff(d_alive) <= 1e-5)      # far -> near? no: b2f
    rl = np.asarray(rel_life(state))
    assert rl.min() >= 0.0 and rl.max() <= 1.0


def test_render_order_is_back_to_front_decreasing():
    state = init_particles(4).replace(
        pos=jnp.array([[1.0, 0, 0], [5.0, 0, 0], [3.0, 0, 0], [0, 0, 0]]),
        life=jnp.array([1.0, 1.0, 1.0, 0.0]))
    order, alive_sorted = render_order(state, (0.0, 0.0, 0.0))
    assert list(np.asarray(order[:3])) == [1, 2, 0]   # farthest first
    assert not bool(alive_sorted[3])


def test_spline_matches_reference_walk():
    # scalar reference transcription of evaluateSpline (math.h:1048-1090)
    def ref_eval(ts, vals, num, t):
        k = 0
        while k < num - 1 and ts[k + 1] >= 0 and ts[k] < t:
            k += 1
        if k + 1 < len(ts) and ts[k + 1] < 0:
            num = k + 1
        h1 = np.clip((t - ts[k - 1]) / (ts[k] - ts[k - 1]), 0, 1)
        h2, h3 = h1 * h1, h1 * h1 * h1
        h = np.array([h3, h2, h1, 1.0])
        m = num - 1
        r = (vals[np.clip(k - 2, 0, m)] * np.dot([-1, 2, -1, 0], h)
             + vals[k - 1] * np.dot([3, -5, 0, 2], h)
             + vals[k] * np.dot([-3, 4, 1, 0], h)
             + vals[np.clip(k + 1, 0, m)] * np.dot([1, -1, 0, 0], h))
        return r * 0.5

    ts = np.array([0.0, 0.1, 0.25, 1.0], np.float32)
    vals = np.array([0.0, 0.8, 0.9, 1.0], np.float32)  # fire intensity
    for t in (0.01, 0.05, 0.2, 0.5, 0.99):
        assert float(evaluate_spline(ts, vals, t)) == pytest.approx(
            ref_eval(ts, vals, 4, t), abs=1e-5)
    ts2 = np.array([0.0, 1.0, -1.0, -1.0], np.float32)  # sentinel default
    v2 = np.array([0.0, 1.0, 7.0, 7.0], np.float32)
    for t in (0.01, 0.3, 0.77, 0.99):
        assert float(evaluate_spline(ts2, v2, t)) == pytest.approx(
            ref_eval(ts2, v2, 4, t), abs=1e-5)


def test_param_packs_are_pytrees():
    import jax.tree_util as jtu
    for p in (fire_params(), smoke_params(), boid_params(),
              debris_params([(0, 0, 0)])):
        leaves = jtu.tree_leaves(p)
        assert all(hasattr(l, "dtype") for l in leaves)
