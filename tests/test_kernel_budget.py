"""Fused-kernel size regression guard (VERDICT r4 #6).

Round 3 and 4 both lost a bench config to silent kernel growth: the
fused kernel's unrolled live ranges spill to VMEM at ~53 KB per candidate
pair row (docs/PERF_NOTES.md round 5), and a scene that drifts past the
128 M capacity dies inside tpu_compile_helper where no Python test sees
it. Two layers pin this at build time, CPU-only:

1. every bench scene's candidate-row total must stay under the kernel's
   own refusal budget (FUSED_MAX_PAIR_ROWS) with margin;
2. the traced step's TOTAL jaxpr equation count (including the Pallas
   kernel bodies embedded in pallas_call params — the quantity Mosaic
   actually has to register-allocate) must stay within 25% of the
   committed snapshot (tests/kernel_budget_snapshot.json).

Regenerate the snapshot after INTENTIONAL kernel growth:
    PALLAS_AXON_POOL_IPS= python tests/test_kernel_budget.py --record
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import pytest

SNAPSHOT = os.path.join(os.path.dirname(__file__),
                        "kernel_budget_snapshot.json")
GROWTH_TOLERANCE = 1.25


def count_eqns(jaxpr):
    """Equations in a jaxpr, recursing into sub-jaxprs (scan/cond bodies,
    pallas_call kernels)."""
    n = 0
    for eq in jaxpr.eqns:
        n += 1
        for v in eq.params.values():
            vals = v if isinstance(v, (list, tuple)) else [v]
            for x in vals:
                if hasattr(x, "jaxpr"):
                    n += count_eqns(x.jaxpr)
                elif type(x).__name__ == "Jaxpr":
                    n += count_eqns(x)
    return n


def bench_scene_stats():
    """(name -> {pair_rows, eqns}) for the fused bench configs. Scenes are
    built exactly as bench.py builds them (imported from it — no copies
    to drift)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    from dxk_tpu.physics import PhysicsSettings, physics_step

    out = {}

    def add(name, scene, settings, state):
        rows = sum(int(g.pairs.shape[0]) for g in scene.pair_groups)
        jx = jax.make_jaxpr(
            lambda s: physics_step(scene, s, settings, 1 / 120)[0])(state)
        out[name] = {"pair_rows": rows, "eqns": count_eqns(jx.jaxpr)}

    fused30 = PhysicsSettings(num_rigid_solver_iterations=30,
                              solver_mode="fused")

    # loco (the env builds its own scene)
    from dxk_tpu.envs.loco_env import LocoEnv
    env = LocoEnv(solver_iterations=30, solver_mode="fused")
    add("loco", env.scene, env.settings, env.scene.initial_state())

    # box islands sub-scene
    from dxk_tpu.scene.islands import islandize
    b, _ = bench._box_towers(256)
    scene = b.finalize(contact_phases=2, candidate_margin=0.25)
    im = islandize(scene)
    isl_state = im.gather(scene.initial_state())
    add("box_islands", im.sub_scene, fused30,
        jax.tree_util.tree_map(lambda x: x[0], isl_state))

    # settle / zoo / cloth_vehicle: reuse the bench builders' scenes by
    # intercepting _time_batched_steps? simpler: rebuild via the public
    # builders the bench functions call
    import numpy as np
    from dxk_tpu.models.ragdoll import add_ragdoll
    from dxk_tpu.scene import SceneBuilder
    b = SceneBuilder()
    g = b.add_static(position=(0, -4.0, 0))
    b.add_box_collider(g, (0, 0, 0), (20, 4, 20), friction=1.0)
    add_ragdoll(b, initial_hip_position=(0.0, 1.6, 0.0))
    cube = np.array([[x, y, z] for x in (-0.12, 0.12)
                     for y in (-0.12, 0.12) for z in (-0.12, 0.12)])
    hid = b.add_hull_geometry_from_mesh(cube)
    debris = b.add_body(position=(0.45, 1.2, 0.1))
    b.add_hull_collider(debris, hid, friction=0.8)
    scene = b.finalize()
    add("ragdoll_settle", scene, fused30, scene.initial_state())

    from tests.test_orbit_prune import _vehicle_scene
    scene = _vehicle_scene(orbit_margin=0.5)
    add("cloth_vehicle_hf", scene, fused30, scene.initial_state())

    return out


@pytest.mark.slow
def test_kernel_budget_snapshot():
    from dxk_tpu.ops.pallas.fused_step import FUSED_MAX_PAIR_ROWS

    stats = bench_scene_stats()
    assert os.path.exists(SNAPSHOT), \
        "record the snapshot: python tests/test_kernel_budget.py --record"
    with open(SNAPSHOT) as f:
        snap = json.load(f)
    problems = []
    for name, s in stats.items():
        if s["pair_rows"] > 0.9 * FUSED_MAX_PAIR_ROWS:
            problems.append(
                f"{name}: {s['pair_rows']} pair rows is within 10% of the "
                f"fused refusal budget ({FUSED_MAX_PAIR_ROWS})")
        if name in snap:
            for k in ("pair_rows", "eqns"):
                if s[k] > snap[name][k] * GROWTH_TOLERANCE:
                    problems.append(
                        f"{name}.{k} grew {s[k]} vs snapshot "
                        f"{snap[name][k]} (> {GROWTH_TOLERANCE}x) — "
                        "re-measure VMEM headroom on-chip, then --record")
        else:
            problems.append(f"{name} missing from snapshot — --record")
    assert not problems, "\n".join(problems)


if __name__ == "__main__":
    if "--record" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        stats = bench_scene_stats()
        with open(SNAPSHOT, "w") as f:
            json.dump(stats, f, indent=1, sort_keys=True)
        print(json.dumps(stats, indent=1, sort_keys=True))
    else:
        pytest.main([__file__, "-x", "-q", "-m", "slow"])
