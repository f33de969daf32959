"""Collision begin/end + trigger enter/leave events and the VALIDATE-style
finiteness sweeps (reference: physics.cpp:952-1178 event diffing,
physics.cpp:807-926 VALIDATE)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.events import collision_events, trigger_events
from dxk_tpu.physics import PhysicsSettings, physics_step
from dxk_tpu.scene import SceneBuilder
from dxk_tpu.utils.validate import STAGE_ID


def _drop_scene(y=0.499):
    """Box starting in (just-touching) resting contact with the ground —
    a deterministic persistent contact, unlike a drop, which micro-bounces
    while Baumgarte settles it (the reference behaves the same way and its
    begin/end callbacks fire on every such flicker)."""
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
    body = b.add_body(position=(0, y, 0))
    b.add_box_collider(body, (0, 0, 0), (0.5, 0.5, 0.5))
    return b.finalize(), body


def test_collision_begin_persist_end():
    scene, body = _drop_scene()
    st = scene.initial_state()
    settings = PhysicsSettings(num_rigid_solver_iterations=10,
                               solver_mode="scan")
    step = jax.jit(lambda s: physics_step(scene, s, settings, 1 / 120))

    infos = []
    for _ in range(120):
        st, info = step(st)
        infos.append(info)

    begins_seen, ends_seen = [], []
    prev = None
    for info in infos:
        b_, e_ = collision_events(scene, prev, info)
        begins_seen.extend(b_)
        ends_seen.extend(e_)
        prev = info
    # resting box: exactly one begin (box vs ground, first frame), carrying
    # a positive impulse; contact persists -> no end events
    assert len(begins_seen) == 1
    ev = begins_seen[0]
    assert {ev.body_a, ev.body_b} == {body, scene.dummy_body}
    assert ev.impulse > 0.0
    assert len(ends_seen) == 0

    # teleport the box far above the ground -> one end event
    st = st.replace(pos=st.pos.at[body, 1].set(50.0))
    st2, info = step(st)
    _, ends = collision_events(scene, prev, info)
    assert len(ends) == 1
    assert {ends[0].body_a, ends[0].body_b} == {body, scene.dummy_body}
    begins2, _ = collision_events(scene, prev, info)
    assert len(begins2) == 0


def test_trigger_enter_leave():
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
    trig = b.add_static(position=(0, 3.0, 0))
    b.add_box_collider(trig, (0, 0, 0), (1.0, 0.5, 1.0))
    b.mark_trigger(trig)
    body = b.add_body(position=(0, 6.0, 0))
    b.add_sphere_collider(body, (0, 0, 0), 0.4)
    scene = b.finalize()
    st = scene.initial_state()
    settings = PhysicsSettings(num_rigid_solver_iterations=10,
                               solver_mode="scan")
    step = jax.jit(lambda s: physics_step(scene, s, settings, 1 / 120))

    prev_overlap = jnp.zeros_like(scene.overlap_pairs[:, 0], bool)
    n_enter = n_leave = 0
    for _ in range(240):
        st, info = step(st)
        enter, leave = trigger_events(prev_overlap, info.trigger_overlap)
        n_enter += int(enter.sum())
        n_leave += int(leave.sum())
        prev_overlap = info.trigger_overlap
    # sphere falls through the trigger box: exactly one enter + one leave
    assert n_enter == 1
    assert n_leave == 1
    # and it ends up resting below, outside the trigger
    assert float(st.pos[body, 1]) < 1.0
    assert not bool(prev_overlap.any())


@pytest.mark.parametrize("field,stage", [
    ("pos", "world_colliders"),
    ("lin_vel", "body_velocities"),
])
def test_validate_reports_first_bad_stage(field, stage):
    scene, body = _drop_scene()
    st = scene.initial_state()
    settings = PhysicsSettings(num_rigid_solver_iterations=4,
                               solver_mode="scan", validate=True)
    step = jax.jit(lambda s: physics_step(scene, s, settings, 1 / 120))

    _, info = step(st)
    assert int(info.validate_stage) == -1

    bad = st.replace(**{field: getattr(st, field).at[body, 1].set(jnp.nan)})
    _, info = step(bad)
    assert int(info.validate_stage) == STAGE_ID[stage]


def test_collision_events_batched():
    """Batched event diffing: one (begins, ends) per vmapped env; envs with
    different trajectories get different events."""
    from dxk_tpu.events import collision_events_batched

    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
    s = b.add_body(position=(0, 1.2, 0))
    b.add_sphere_collider(s, (0, 0, 0), 0.5)
    scene = b.finalize()

    base = scene.initial_state()
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (2, *x.shape)).copy(), base)
    # env 1 starts high enough not to touch within the horizon
    batch = batch.replace(pos=batch.pos.at[1, s, 1].set(8.0))

    settings = PhysicsSettings()
    step = jax.jit(jax.vmap(
        lambda st: physics_step(scene, st, settings, 1 / 120)))
    info = None
    events_seen = [[], []]
    st = batch
    for _ in range(60):
        prev = info
        st, info = step(st)
        for i, (begins, ends) in enumerate(
                collision_events_batched(scene, prev, info)):
            events_seen[i].extend(begins)
    assert len(events_seen[0]) >= 1      # env 0's sphere lands
    assert len(events_seen[1]) == 0      # env 1 still falling


def test_trigger_events_vmapped():
    """trigger_events is pure mask algebra over the static trigger-pair
    list, so it vmaps over env batches unchanged (the batched analog of
    the reference's per-scene trigger callbacks)."""
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
    trig = b.add_static(position=(0, 3.0, 0))
    b.add_box_collider(trig, (0, 0, 0), (1.0, 0.5, 1.0))
    b.mark_trigger(trig)
    body = b.add_body(position=(0, 6.0, 0))
    b.add_sphere_collider(body, (0, 0, 0), 0.4)
    scene = b.finalize()
    settings = PhysicsSettings(num_rigid_solver_iterations=10,
                               solver_mode="jacobi")

    n = 4
    base = scene.initial_state()
    st = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n, *x.shape)).copy(), base)
    # stagger drop heights so enters happen on different steps per env
    st = st.replace(pos=st.pos.at[:, body, 1].add(jnp.arange(n) * 0.7))

    step = jax.jit(jax.vmap(lambda s: physics_step(scene, s, settings,
                                                   1 / 120)))
    ev = jax.jit(jax.vmap(trigger_events))

    prev = jnp.zeros((n, scene.overlap_pairs.shape[0]), bool)
    n_enter = np.zeros(n, np.int64)
    n_leave = np.zeros(n, np.int64)
    enter_step = np.full(n, -1)
    for i in range(300):
        st, info = step(st)
        enter, leave = ev(prev, info.trigger_overlap)
        e = np.asarray(enter.sum(-1))
        n_enter += e
        n_leave += np.asarray(leave.sum(-1))
        enter_step[(e > 0) & (enter_step < 0)] = i
        prev = info.trigger_overlap
    assert np.all(n_enter == 1) and np.all(n_leave == 1)
    # staggered heights -> strictly increasing enter steps across envs
    assert np.all(np.diff(enter_step) > 0)


def test_collision_sound_triggers():
    """application.cpp:192-201 demo hook: begins -> (pitch, volume)."""
    from dxk_tpu.utils.sound import collision_sound_triggers

    # a REAL drop (impact dv >> 0.2 m/s min_speed) — the resting
    # _drop_scene begin is inaudible by design (dv ~ 0.08)
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
    body = b.add_body(position=(0, 1.5, 0))
    b.add_box_collider(body, (0, 0, 0), (0.5, 0.5, 0.5), density=8.0)
    scene = b.finalize()
    st = scene.initial_state()
    settings = PhysicsSettings(num_rigid_solver_iterations=10,
                               solver_mode="scan")
    step = jax.jit(lambda s: physics_step(scene, s, settings, 1 / 120))
    prev = None
    triggers = []
    for _ in range(120):
        st, info = step(st)
        begins, _ = collision_events(scene, prev, info)
        triggers.extend(collision_sound_triggers(scene, begins))
        prev = info
    # the impact is audible; settle flickers fall below min_speed and are
    # gated out (exactly what the volume remap is for)
    assert len(triggers) >= 1
    t = triggers[0]
    assert t["sound_id"] == "Collision"
    assert 0.5 <= t["pitch"] <= 1.5
    assert 0.0 < t["volume"] <= 1.0
    # a featherweight impulse maps below min_speed -> dropped (inaudible)
    from dxk_tpu.events import CollisionEvent
    quiet = [CollisionEvent(0, 0, body, scene.dummy_body, 1e-6)]
    assert collision_sound_triggers(scene, quiet) == []
