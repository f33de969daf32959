#!/usr/bin/env python
"""Per-stage TPU profiling for the box-stack benchmark: isolates broadphase
mask, pair compaction, narrowphase, contact prep, and per-iteration solver
cost. Run on the real chip: python tools/profile_box.py"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.time() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.3f} ms")
    return out


def main():
    from dxk_tpu.physics import PhysicsSettings, physics_step
    from dxk_tpu.scene import SceneBuilder
    from dxk_tpu.ops.shapes import collider_aabbs, world_colliders
    from dxk_tpu.ops.broadphase import aabb_overlap_mask, compact_pairs
    from dxk_tpu.ops import narrowphase as np_ops

    num_boxes = int(os.environ.get("BOXES", "1024"))
    batch = int(os.environ.get("BATCH", "8"))
    phases = int(os.environ.get("PHASES", "4"))

    b = SceneBuilder()
    ground = b.add_static()
    b.add_box_collider(ground, (0, -1, 0), (200, 1, 200))
    per_tower = 16
    towers = num_boxes // per_tower
    side = int(np.ceil(np.sqrt(towers)))
    for t in range(towers):
        x = (t % side) * 3.0
        z = (t // side) * 3.0
        for i in range(per_tower):
            body = b.add_body(position=(x, 0.5 + 1.001 * i, z))
            b.add_box_collider(body, (0, 0, 0), (0.5, 0.5, 0.5))
    cap = int(os.environ.get("CAP", str(2 * num_boxes)))
    bp = os.environ.get("BROADPHASE", "kselect")
    scene = b.finalize(max_narrow_pairs_per_group=cap // max(phases, 1),
                       contact_phases=phases, broadphase=bp,
                       broadphase_k=int(os.environ.get("KSEL", "8")))
    print("groups:", [(g.type_a, g.type_b, g.phase, g.pairs.shape[0],
                       g.max_narrow) for g in scene.pair_groups])

    base = scene.initial_state()
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch, *x.shape)).copy(), base)

    # stage 1: world colliders + AABBs
    @jax.jit
    def stage_aabbs(st):
        def f(pos, rot):
            w = world_colliders(scene, pos, rot)
            return collider_aabbs(scene, w)
        return jax.vmap(f)(st.pos, st.rot)

    mn, mx = timeit("world colliders + AABBs", stage_aabbs, state)

    # stage 2: broadphase masks only
    @jax.jit
    def stage_mask(mn, mx):
        def f(mn, mx):
            return [aabb_overlap_mask(mn, mx, g.pairs)
                    for g in scene.pair_groups]
        return jax.vmap(f)(mn, mx)

    masks = timeit("broadphase overlap masks", stage_mask, mn, mx)

    # stage 3: masks + compaction
    @jax.jit
    def stage_compact(mn, mx):
        def f(mn, mx):
            outs = []
            for g in scene.pair_groups:
                m = aabb_overlap_mask(mn, mx, g.pairs)
                outs.append(compact_pairs(g.pairs, m, g.max_narrow)[:2])
            return outs
        return jax.vmap(f)(mn, mx)

    timeit("broadphase + compaction", stage_compact, mn, mx)

    if scene.broadphase_k > 0:
        from dxk_tpu.ops.broadphase import kselect_group_pairs

        @jax.jit
        def stage_kselect(mn, mx):
            return jax.vmap(
                lambda mn, mx: kselect_group_pairs(scene, mn, mx))(mn, mx)

        timeit("kselect broadphase (kernel+buckets)", stage_kselect, mn, mx)

    # stage 4: narrowphase on fixed pairs
    g0 = scene.pair_groups[0]
    fixed_pairs = jnp.broadcast_to(g0.pairs[:g0.max_narrow],
                                   (batch, g0.max_narrow, 2))

    @jax.jit
    def stage_narrow(st, pairs):
        def f(pos, rot, pairs):
            w = world_colliders(scene, pos, rot)
            ia, ib = pairs[:, 0], pairs[:, 1]
            from dxk_tpu.physics import _pair_params
            a_a, a_b, a_r, a_q, _ = _pair_params(w, ia)
            b_a, b_b, b_r, b_q, _ = _pair_params(w, ib)
            return jax.vmap(np_ops.box_box_contact)(a_a, a_b, a_q,
                                                    b_a, b_b, b_q)
        return jax.vmap(f)(st.pos, st.rot, pairs)

    timeit(f"narrowphase box-box x{g0.max_narrow} (1 grp)",
           stage_narrow, state, fixed_pairs)

    # stage 5: full step at various iteration counts
    for iters, mode in ((0, "colored"), (1, "colored"), (30, "colored"),
                        (30, "jacobi")):
        settings = PhysicsSettings(num_rigid_solver_iterations=iters,
                                   solver_mode=mode)

        @jax.jit
        def stage_step(st, settings=settings):
            st, info = jax.vmap(
                lambda s: physics_step(scene, s, settings, 1 / 120))(st)
            return st

        timeit(f"full step {mode} iters={iters}", stage_step, state, iters=10)

    # stage 6: 20-step scan (amortized dispatch) = bench configuration
    settings = PhysicsSettings(num_rigid_solver_iterations=30,
                               solver_mode="colored")

    @jax.jit
    def scan20(st):
        def body(c, _):
            c, _i = jax.vmap(
                lambda s: physics_step(scene, s, settings, 1 / 120))(c)
            return c, None
        st, _ = jax.lax.scan(body, st, None, length=20)
        return st

    t0 = time.time()
    out = scan20(state)
    _sync(out.pos)
    print(f"scan20 compile: {time.time()-t0:.1f}s")
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(3):
            out = scan20(out)
        _sync(out.pos)
        best = min(best, (time.time() - t0) / 3)
    rate = num_boxes * batch * 20 / best
    print(f"scan20: {best*1e3/20:.2f} ms/step, {rate:,.0f} body-steps/s "
          f"({rate/10e6:.3f}x of 10M target)")
    # sanity: towers still standing?
    h = np.asarray(out.pos[0, 1:num_boxes + 1, 1])
    exp = np.tile(0.5 + 1.001 * np.arange(per_tower), towers)
    print(f"height err: max {np.abs(h - exp).max():.3f} (settled drift ok)")


if __name__ == "__main__":
    main()
