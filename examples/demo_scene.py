"""The reference's demo scene, physics parts
(/root/reference/src/application.cpp:79-330): a big ground box, falling
spheres, a trigger volume, procedural terrain with a heightfield collider,
and an optional ball-joint chain. Renders frames with the debug ray-caster.

Also wires the demo's physics-adjacent hooks: collision-begin events map
to 3D sound triggers (application.cpp:192-201's collisionBeginCallback ->
pitch/volume, utils/sound.py), a fire+smoke particle pair burns at a
fixed torch (application.cpp:366-367 initialize the same systems), and
the first sphere impact bursts debris particles that bounce off the real
scene colliders (application.cpp:519-524's keypress burst; ours is
event-driven).

Run:  python examples/demo_scene.py   (from the repo root; writes /tmp/demo_*.ppm)
"""

from __future__ import annotations

import os
import sys

# make the repo importable when run as a script; do NOT set PYTHONPATH for
# this (it would shadow the container's /root/.axon_site sitecustomize and
# break TPU registration — see CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_demo_scene(with_chain=True, with_terrain=True):
    from dxk_tpu.scene import SceneBuilder
    from dxk_tpu.utils.noise import terrain_heightfield

    b = SceneBuilder()

    # ground box (application.cpp:155-156 mesh + implicit static collider
    # at the editor demo; physics ground like the trainer's)
    ground = b.add_static(position=(25.0, -4.0, -5.0))
    b.add_box_collider(ground, (0, 0, 0), (30.0, 4.0, 30.0),
                       friction=1.0, restitution=0.1)

    # three falling spheres (application.cpp:158-181)
    spheres = []
    for i in range(3):
        s = b.add_body(position=(25.0, 10.0 + i * 3.0, -5.0))
        b.add_sphere_collider(s, (0, 0, 0), 1.0, friction=0.5,
                              restitution=0.1, density=1.0)
        spheres.append(s)

    # trigger volume (application.cpp:186-188)
    trig = b.add_static(position=(25.0, 1.0, -5.0))
    b.add_box_collider(trig, (0, 0, 0), (5.0, 1.0, 5.0))
    b.mark_trigger(trig)

    # terrain + heightfield collider (application.cpp:269-297 terrain setup)
    if with_terrain:
        h = np.asarray(terrain_heightfield(size=48, cell_size=2.0,
                                           height_scale=4.0, seed=3))
        b.set_heightfield(h, cell_size=2.0, min_corner=(-60.0, -2.0, -60.0),
                          friction=0.8)
        t = b.add_body(position=(-40.0, 8.0, -40.0))
        b.add_box_collider(t, (0, 0, 0), (0.8, 0.8, 0.8), density=300.0)

    # ball-joint chain (the optional chain, application.cpp:207-230)
    if with_chain:
        anchor = b.add_body(position=(20.0, 8.0, 0.0), kinematic=True)
        prev = anchor
        for i in range(6):
            link = b.add_body(position=(20.0, 7.4 - i * 0.6, 0.0))
            b.add_capsule_collider(link, (0, -0.2, 0), (0, 0.2, 0), 0.08,
                                   density=500.0)
            b.add_ball_constraint(prev, link, (20.0, 7.7 - i * 0.6, 0.0))
            prev = link

    return b, spheres


def main():
    import jax
    import jax.numpy as jnp
    from dxk_tpu.events import collision_events
    from dxk_tpu.ops.particles import (alive_count, debris_params,
                                       fire_params, init_particles,
                                       particle_step, smoke_params)
    from dxk_tpu.ops.shapes import world_colliders
    from dxk_tpu.physics import PhysicsSettings, physics_step
    from dxk_tpu.render.raster import render
    from dxk_tpu.utils.sound import collision_sound_triggers

    builder, spheres = build_demo_scene()
    scene = builder.finalize(max_narrow_pairs_per_group=64)
    state = scene.initial_state()
    settings = PhysicsSettings()
    step = jax.jit(lambda s: physics_step(scene, s, settings, 1 / 120))

    # particle systems (application.cpp:366-369; capacities demo-sized)
    torch = (25.0, 0.5, -5.0)
    fire = (fire_params(emit_position=torch, emit_rate=150.0),
            init_particles(256, seed=1))
    smoke = (smoke_params(emit_position=(torch[0], torch[1] + 1.0, torch[2]),
                          emit_rate=40.0), init_particles(256, seed=2))
    debris = [debris_params(emit_positions=np.zeros((1, 3)), emit_rate=0.0),
              init_particles(256, seed=3)]
    psys = {"fire": fire, "smoke": smoke}
    pstep = jax.jit(particle_step, static_argnames=())
    # scene is closed over so collider types stay static under jit
    dstep = jax.jit(lambda p, ps, s: particle_step(
        p, ps, 0.5, world=world_colliders(scene, s.pos, s.rot),
        hulls=scene.hulls, heightfield=scene.heightfield))

    prev_info = None
    rng = np.random.default_rng(519431)       # demo's sound-pitch seed
    for frame_i in range(6):
        for _ in range(60):
            state, info = step(state)
        # particle systems tick at the frame rate like the reference's
        # render-loop updateParticleSystem calls; debris collides with the
        # CURRENT world colliders
        for name, (p, ps) in list(psys.items()):
            psys[name] = (p, pstep(p, ps, 0.5))
        debris[1] = dstep(debris[0], debris[1], state)
        debris[0] = debris[0].replace(emit_rate=0.0)   # one-frame bursts

        # collision begin events -> sound triggers + a debris burst
        begins, _ends = collision_events(scene, prev_info, info,
                                         min_impulse=1e-3)
        prev_info = info
        for trig in collision_sound_triggers(scene, begins, rng=rng):
            print(f"  sound {trig['sound_id']}: bodies "
                  f"({trig['body_a']},{trig['body_b']}) "
                  f"pitch={trig['pitch']:.2f} volume={trig['volume']:.2f}")
        if begins:
            at = np.asarray(state.pos[begins[0].body_a])
            debris[0] = debris_params(emit_positions=at[None, :],
                                      emit_rate=400.0)

        rgb, _ = jax.jit(lambda s: render(
            scene, s, eye=(38.0, 8.0, 10.0), target=(22.0, 2.0, -5.0),
            width=160, height=120))(state)
        img = (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)
        path = f"/tmp/demo_{frame_i}.ppm"
        with open(path, "wb") as f:
            f.write(b"P6 160 120 255\n" + img.tobytes())
        print(f"t={0.5 * (frame_i + 1):.1f}s wrote {path}; "
              f"trigger={np.asarray(info.trigger_overlap)}, "
              f"contacts={int(info.num_contacts)}, particles alive "
              f"fire={int(alive_count(psys['fire'][1]))} "
              f"smoke={int(alive_count(psys['smoke'][1]))} "
              f"debris={int(alive_count(debris[1]))}")

    ys = [float(state.pos[s, 1]) for s in spheres]
    print("sphere heights:", [round(y, 2) for y in ys])


if __name__ == "__main__":
    main()
