#!/usr/bin/env python
"""Stage attribution for BASELINE config 4 (cloth + vehicle + heightfield).

Batch 64 -> 128 only bought +11% (47.3k body-steps/s) even though both
sizes run ONE 128-lane kernel chunk — so the config is NOT bound by the
fused contact kernel's lanes; the per-env XLA stages around it (cloth
PBD, heightfield prep, broadphase, integration) must carry real cost.
This script times ablated variants to attribute it:

  full@30 / full@1   — solver-iteration cost inside the kernel
  no_cloth@30        — cloth PBD + coupling cost
  no_hf@30           — heightfield contact prep cost (flat plane instead)
  jacobi@30          — the XLA solver path for reference

Run on the real chip:  python tools/profile_cv.py
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build(cloth=True, heightfield=True):
    import numpy as _np

    from dxk_tpu.models.vehicle import add_vehicle
    from dxk_tpu.scene import SceneBuilder

    b = SceneBuilder()
    if heightfield:
        hx, hz = 33, 33
        xs, zs = _np.meshgrid(_np.arange(hx), _np.arange(hz), indexing="ij")
        H = (0.4 * _np.sin(xs * 0.4) * _np.cos(zs * 0.4)).astype(_np.float32)
        b.set_heightfield(H, cell_size=1.0, min_corner=(-16.0, 0.0, -16.0),
                          friction=1.0)
    else:
        g = b.add_static(position=(0.0, -1.0, 0.0))
        b.add_box_collider(g, (0.0, 0.0, 0.0), (16.0, 1.0, 16.0))
    veh = add_vehicle(b, initial_position=(0.0, 1.6, 0.0))
    if cloth:
        b.add_cloth(width=2.0, height=2.0, grid_x=12, grid_y=12,
                    total_mass=1.0, transform_pos=(6.0, 3.0, 0.0))
    scene = b.finalize(orbit_margin=0.5)
    c = scene.default_controls
    c = c.replace(
        hinge_motor_type=c.hinge_motor_type.at[veh.motor_hinge].set(0),
        hinge_target=c.hinge_target.at[veh.motor_hinge].set(3.0),
        hinge_max_torque=c.hinge_max_torque.at[veh.motor_hinge].set(500.0))
    return scene.replace(default_controls=c)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/dxk_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    import bench
    from dxk_tpu.physics import PhysicsSettings

    batch = int(os.environ.get("CV_BATCH", 128))
    steps, iters = 20, 3

    print("device:", jax.devices()[0], flush=True)
    float(jnp.sum(jax.jit(lambda x: x + 1.0)(jnp.zeros(8, jnp.float32))))

    variants = [
        ("full@30", dict(cloth=True, heightfield=True), "fused", 30),
        ("full@1", dict(cloth=True, heightfield=True), "fused", 1),
        ("no_cloth@30", dict(cloth=False, heightfield=True), "fused", 30),
        ("no_hf@30", dict(cloth=True, heightfield=False), "fused", 30),
        ("jacobi@30", dict(cloth=True, heightfield=True), "jacobi", 30),
    ]
    results = {}
    for name, kw, mode, si in variants:
        try:
            scene = build(**kw)
            settings = PhysicsSettings(num_rigid_solver_iterations=si,
                                       solver_mode=mode,
                                       cloth_solver_mode="colored")
            state = bench._broadcast_state(scene, batch)
            t0 = time.time()
            r, c = bench._time_batched_steps(scene, settings, state,
                                             steps, iters, 16)
            ms = 16 * batch * steps * iters / r / (steps * iters) * 1e3
            results[name] = (r, ms, c)
            print(f"{name:13s}: {r:10,.0f} body-steps/s  "
                  f"{ms:7.2f} ms/batched-step  compile {c:5.1f}s  "
                  f"(total {time.time() - t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — keep profiling
            print(f"{name:13s}: FAILED {type(e).__name__}: {e}", flush=True)
    if "full@30" in results and "full@1" in results:
        t30, t1 = results["full@30"][1], results["full@1"][1]
        print(f"solver 29 extra iters: {t30 - t1:.2f} ms "
              f"({(t30 - t1) / t30 * 100:.0f}% of step)")
    for k, base in (("no_cloth@30", "cloth"), ("no_hf@30", "heightfield")):
        if k in results and "full@30" in results:
            d = results["full@30"][1] - results[k][1]
            print(f"{base} cost: {d:.2f} ms "
                  f"({d / results['full@30'][1] * 100:.0f}% of step)")


if __name__ == "__main__":
    main()
