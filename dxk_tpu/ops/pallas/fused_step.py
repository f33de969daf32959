"""Fused contact pipeline: narrowphase + prep + 30-iteration solve with
nothing but collider params and body state crossing HBM.

Motivation (docs/PERF_NOTES.md round 2): at 1024 envs the XLA
narrowphase+prep for the locomotion scene costs ~12 ms capped / ~28 ms at
the static tables the fused solver kernel needs — 4-40x the cost of the
fused solve itself (0.7 ms). The fix is to move narrowphase and prep INTO
the kernel: world collider params (a few KB per env) go in, solved
velocities come out, and every (B, P, 4, 3) intermediate disappears.

Architecture: `_fused_core` is a pure-jnp function over component-major
arrays (pairs on sublanes, env lanes minor — math_simd.h's struct-of-lanes
layout). It runs
unchanged in two places:

  - inside the Pallas kernel (one 128-env chunk per grid step), where its
    inputs are VMEM blocks — this is the fast path;
  - as the plain-XLA unbatched fallback of the custom_vmap wrapper.

Contact recipes come from cm_narrowphase.py (tested against the canonical
AoS narrowphase). Pair groups whose shape pair has no cm recipe fall back
to XLA narrowphase+prep per group, passed in packed (the loco scene's 3
box-box pairs ride this path while its 144 capsule pairs are in-kernel).

Solve semantics = solver_mode "jacobi" (see batched_solver.py docstring);
the solve functions are shared with it.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dxk_tpu.ops.pallas import cm_narrowphase as cm
from dxk_tpu.ops.pallas.batched_solver import (
    CB, JOINT_ORDER, JOINT_SPECS, TYPE_MAX_POINTS, _mxu_t, _round128,
    _contact_point, _solve_joint_type, _sub, joint_rows, pack_joint_type,
    scene_joint_ab, static_joint_invdeg)

# collider param pack: 11 floats per collider, param-major columns
# [a(3) | b(3) | r | rot(4)]  (WorldColliders fields; b = endpoint for
# capsules, half-extents for boxes)
COL_PARAMS = 11

# sphere-sphere/capsule/cylinder/box, capsule-capsule/cylinder/box,
# cylinder-cylinder/box (analytic, round 3), box-box, sphere/capsule-hull
# (distance-GJK + face-plane MTV, round 3), cylinder/box-hull + hull-hull
# (SAT + clipped manifolds over build-time topology, round 3) —
# ALL 15 type-pair buckets are in-kernel
CM_RECIPES = {(0, 0), (0, 1), (0, 2), (0, 3), (0, 4),
              (1, 1), (1, 2), (1, 3), (1, 4),
              (2, 2), (2, 3), (2, 4), (3, 3), (3, 4), (4, 4)}

# native hull recipes need static per-row hull tables: vert/plane tables
# for the distance-GJK recipes, polytope-topology packs (cm_polytope) for
# the SAT recipes, both sides' tables for hull-hull
HULL_RECIPES = {(0, 4), (1, 4), (2, 4), (3, 4), (4, 4)}


# Mosaic's register allocator spills the unrolled narrowphase+prep live
# ranges to VMEM at ~53-60 KB per candidate pair row (measured on v5e:
# unpruned zoo, 4560 rows -> 242 M demand; unpruned cloth+vehicle, 2591
# rows -> 137 M; orbit-pruned cloth+vehicle, 1079 rows -> 64.94 M of
# scoped stack — all crashes in tpu_compile_helper as "HTTP 500" until
# the scoped limit below covered them, rounds 2-5). Refuse to emit a
# fused kernel past a budgeted row count and degrade to the XLA solver
# path instead: a slower number beats a dead compiler. ~1600 rows x
# 60 KB ~ 96 M against the 100 M scoped limit set in pallas_call below.
FUSED_MAX_PAIR_ROWS = int(os.environ.get("DXK_FUSED_MAX_PAIRS", "1600"))


def fused2_eligible(scene) -> bool:
    """Fused-pipeline eligibility: static (uncapped) pair tables, no
    dynamic kselect broadphase, and a total candidate-row count under the
    VMEM spill budget (FUSED_MAX_PAIR_ROWS). Groups without a cm recipe
    and heightfield terrain contacts are fine — they ride the prep-passed
    path."""
    if scene.broadphase_k > 0:
        return False
    if not scene.pair_groups:
        return False
    rows = 0
    for g in scene.pair_groups:
        if g.max_narrow != g.pairs.shape[0]:
            return False
        rows += int(g.pairs.shape[0])
    if rows > FUSED_MAX_PAIR_ROWS:
        import warnings
        warnings.warn(
            f"fused pipeline refused: {rows} candidate pair rows > "
            f"{FUSED_MAX_PAIR_ROWS} (est. ~{rows * 53 / 1024:.0f} M VMEM "
            "spill vs 128 M capacity) — degrading to the XLA solver path. "
            "Prune the tables (finalize(candidate_margin=...) or "
            "orbit_margin=... for scenes with spinning parts) to stay "
            "fused.", stacklevel=3)
        return False
    return True


def _group_static(scene):
    """Per-group static info: pair count, K, collider and body indices,
    type pair, native?, friction/restitution constants."""
    body_of = np.asarray(scene.colliders.body)
    fric = np.asarray(scene.colliders.friction)
    rest = np.asarray(scene.colliders.restitution)
    out = []
    for gi in sorted(range(len(scene.pair_groups)),
                     key=lambda i: scene.pair_groups[i].phase):
        g = scene.pair_groups[gi]
        pairs = np.asarray(g.pairs)
        ta, tb = int(g.type_a), int(g.type_b)
        key = (min(ta, tb), max(ta, tb))
        k = TYPE_MAX_POINTS.get(key, 4)
        ca, cb2 = pairs[:, 0], pairs[:, 1]
        pf = np.clip(np.sqrt(fric[ca] * fric[cb2]), 0.0, 1.0)
        pr = np.clip(np.maximum(rest[ca], rest[cb2]), 0.0, 1.0)
        hull_tabs = hull_dims = None
        if key in HULL_RECIPES:
            h = scene.hulls
            hull_dims = (int(h.vertices.shape[1]),
                         int(h.face_normals.shape[1]),
                         int(h.poly_normals.shape[1]),
                         int(h.loop_pts.shape[2]),
                         int(h.edge_dirs.shape[1]))        # V, F, FU, LM, EU

            def vert_tab(cols):
                """(3V, Pg) comp-minor local vertex rows."""
                hid = np.asarray(scene.colliders.hull_id)[cols]
                hv = np.asarray(h.vertices)[hid]              # (Pg, V, 3)
                return np.ascontiguousarray(
                    hv.transpose(1, 2, 0).reshape(-1, len(cols))
                ).astype(np.float32)

            def plane_tab(cols):
                """(5F, Pg) triangle-plane rows [nx, ny, nz, off, mask]."""
                hid = np.asarray(scene.colliders.hull_id)[cols]
                hn = np.asarray(h.face_normals)[hid]
                ho = np.asarray(h.face_offsets)[hid]
                hm = np.asarray(h.face_mask)[hid]
                pp = np.concatenate(
                    [hn, ho[..., None], hm[..., None].astype(np.float32)],
                    axis=2)                                   # (Pg, F, 5)
                return np.ascontiguousarray(
                    pp.transpose(1, 2, 0).reshape(-1, len(cols))
                ).astype(np.float32)

            def topo_tab(cols):
                """Polytope-topology pack for the SAT recipes: rows =
                [pn (3FU) | po (FU) | pm (FU) | loop_pts (3*FU*LM) |
                loop_len (FU) | edge_dirs (3EU) | edge_mask (EU)]."""
                hid = np.asarray(scene.colliders.hull_id)[cols]
                P = len(cols)

                def cm(x):   # (P, ..., c) -> comp-minor rows (rows, P)
                    return np.ascontiguousarray(
                        np.asarray(x).reshape(P, -1).T).astype(np.float32)
                parts = [
                    cm(np.asarray(h.poly_normals)[hid]),       # (3FU, P)
                    cm(np.asarray(h.poly_offsets)[hid]),       # (FU, P)
                    cm(np.asarray(h.poly_mask)[hid]
                       .astype(np.float32)),                   # (FU, P)
                    cm(np.asarray(h.loop_pts)[hid]),           # (3FU*LM, P)
                    cm(np.asarray(h.loop_len)[hid]
                       .astype(np.float32)),                   # (FU, P)
                    cm(np.asarray(h.edge_dirs)[hid]),          # (3EU, P)
                    cm(np.asarray(h.edge_mask)[hid]
                       .astype(np.float32)),                   # (EU, P)
                ]
                return np.concatenate(parts, axis=0)

            if key in {(0, 4), (1, 4)}:
                hull_tabs = [vert_tab(cb2), plane_tab(cb2)]
            elif key in {(2, 4), (3, 4)}:
                hull_tabs = [vert_tab(cb2), topo_tab(cb2)]
            else:                                             # hull-hull
                hull_tabs = [vert_tab(ca), topo_tab(ca),
                             vert_tab(cb2), topo_tab(cb2)]
        out.append(dict(
            pg=pairs.shape[0], k=k, ta=ta, tb=tb, native=key in CM_RECIPES,
            col_a=ca.tolist(), col_b=cb2.tolist(),
            body_a=body_of[ca].tolist(), body_b=body_of[cb2].tolist(),
            fric=pf.astype(np.float32), rest=pr.astype(np.float32),
            hull_tabs=hull_tabs, hull_dims=hull_dims,
            phase=int(g.phase)))
    # heightfield terrain contacts enter as a prep-passed pseudo-group:
    # one row per collider x 4 points, body_a = the collider's owner
    # (static wiring), body_b = dummy — its own trailing phase slice, same
    # as the XLA path's hf block (physics.py; heightmapCollision,
    # physics.cpp:1238-1248)
    if scene.heightfield is not None:
        body_list = body_of.tolist()
        cC = len(body_list)
        max_ph = max((m["phase"] for m in out), default=0)
        out.append(dict(
            pg=cC, k=4, ta=-1, tb=-1, native=False,
            col_a=[], col_b=[],
            body_a=body_list, body_b=[scene.num_bodies] * cC,
            fric=None, rest=None, hull_tabs=None, hull_dims=None,
            phase=max_ph + 1))
    return out


# ===========================================================================
# the shared core (pure jnp, comp-major, lanes minor)


def _gather_params(onehot, cols_tab, L, prec=None):
    """(Pg, C) @ (C, 11L) -> per-param (Pg, L) views."""
    g = jax.lax.dot_general(onehot, cols_tab,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    return [g[:, i * L:(i + 1) * L] for i in range(COL_PARAMS)]


def _narrow_native(meta, pa, pb, hulls=None):
    """Dispatch a cm recipe. pa/pb: 11-param lists (a3, b3, r, q4) per
    side, ordered so side a has the LOWER shape type (the builder's
    bucketing guarantee). hulls: (verts (3V, Pg), planes (5F, Pg)) static
    tables for hull recipes. Returns (pts[K] v3, dps[K], normal,
    mask[K])."""
    ta, tb = meta["ta"], meta["tb"]
    a3 = tuple(pa[0:3])
    b3a = tuple(pa[3:6])
    ra = pa[6]
    qa = tuple(pa[7:11])
    a3b = tuple(pb[0:3])
    b3b = tuple(pb[3:6])
    rb = pb[6]
    qb = tuple(pb[7:11])
    key = (min(ta, tb), max(ta, tb))
    if key == (0, 0):
        p, d, n, h = cm.sphere_sphere_cm(a3, ra, a3b, rb)
        return [p], [d], n, [h]
    if key == (0, 1):
        p, d, n, h = cm.sphere_capsule_cm(a3, ra, a3b, b3b, rb)
        return [p], [d], n, [h]
    if key == (0, 2):
        p, d, n, h = cm.sphere_cylinder_cm(a3, ra, a3b, b3b, rb)
        return [p], [d], n, [h]
    if key == (0, 3):
        p, d, n, h = cm.sphere_box_cm(a3, ra, a3b, b3b, qb)
        return [p], [d], n, [h]
    if key == (1, 1):
        return cm.capsule_capsule_cm(a3, b3a, ra, a3b, b3b, rb)
    if key == (1, 2):
        return cm.capsule_cylinder_cm(a3, b3a, ra, a3b, b3b, rb)
    if key == (1, 3):
        return cm.capsule_box_cm(a3, b3a, ra, a3b, b3b, qb)
    if key == (2, 2):
        return cm.cylinder_cylinder_cm(a3, b3a, ra, a3b, b3b, rb)
    if key == (2, 3):
        return cm.cylinder_box_cm(a3, b3a, ra, a3b, b3b, qb)
    if key == (3, 3):
        return cm.box_box_cm(a3, b3a, qa, a3b, b3b, qb)
    if key in HULL_RECIPES:
        dims = meta["hull_dims"]

        def row(t, r):
            return jnp.transpose(t[r:r + 1, :], (1, 0))     # (Pg, 1)

        def vlist_of(hv):
            V = hv.shape[0] // 3
            return [(row(hv, 3 * i), row(hv, 3 * i + 1), row(hv, 3 * i + 2))
                    for i in range(V)]

        if key in {(0, 4), (1, 4)}:
            from dxk_tpu.ops.pallas.cm_hull import (capsule_hull_core,
                                                    sphere_hull_core)
            hv, hp = hulls
            F = hp.shape[0] // 5
            vlist = vlist_of(hv)
            planes = [((row(hp, 5 * f), row(hp, 5 * f + 1),
                        row(hp, 5 * f + 2)), row(hp, 5 * f + 3))
                      for f in range(F)]
            pvalid = [row(hp, 5 * f + 4) > 0.5 for f in range(F)]

            # hull-local frame (hull = side b: position a3b, rotation qb)
            def to_local(p):
                return cm.quat_inv_rotate_cm(qb, cm._sub(p, a3b))

            if key == (0, 4):
                pt, dp, nrm, hit = sphere_hull_core(
                    to_local(a3), ra, vlist, planes, pvalid)
            else:
                pt, dp, nrm, hit = capsule_hull_core(
                    to_local(a3), to_local(b3a), ra, vlist, planes, pvalid)
            point = cm._add(cm.quat_rotate_cm(qb, pt), a3b)
            normal = cm.quat_rotate_cm(qb, nrm)
            return [point], [dp], normal, [hit]

        # SAT recipes over build-time polytope topology (cm_polytope)
        from dxk_tpu.ops.pallas import cm_polytope as cp
        LM_h = dims[3]
        LM = max(4, LM_h) if key == (3, 4) else LM_h

        def world_side(hv_tab, topo_tab, pos, quat):
            vlist = vlist_of(hv_tab)
            flist, loops, llens, elist = _topo_lists(topo_tab, dims, row)
            if LM > LM_h:           # pad loops to the common LM
                loops = [tuple(loop) + (loop[-1],) * (LM - LM_h)
                         for loop in loops]
            return cp.hull_topology_world(pos, quat, vlist, flist,
                                          list(loops), llens, elist)

        if key == (4, 4):
            hwa = world_side(hulls[0], hulls[1], a3, qa)
            hwb = world_side(hulls[2], hulls[3], a3b, qb)
            return cp.hull_hull_cm(hwa, hwb)
        hwb = world_side(hulls[0], hulls[1], a3b, qb)
        if key == (2, 4):
            return cp.cylinder_hull_cm(a3, b3a, ra, hwb)
        return cp.box_hull_cm(a3, b3a, qa, hwb, LM)
    raise AssertionError(f"no cm recipe for {key}")


def _topo_lists(tab, dims, row):
    """Unpack a _group_static topo_tab (rows, Pg) into hull-LOCAL lists in
    the cm_polytope contract: (faces, loops, loop_lens, edges)."""
    _V, _F, FU, LM, EU = dims
    off = 0
    pn = [(row(tab, 3 * f), row(tab, 3 * f + 1), row(tab, 3 * f + 2))
          for f in range(FU)]
    off = 3 * FU + FU                      # skip offsets (unused: overlaps
    pm = [row(tab, off + f) > 0.5 for f in range(FU)]  # come from verts)
    off += FU
    loops = []
    for f in range(FU):
        base = off + f * LM * 3
        loops.append(tuple(
            (row(tab, base + l * 3), row(tab, base + l * 3 + 1),
             row(tab, base + l * 3 + 2)) for l in range(LM)))
    off += 3 * FU * LM
    llens = [row(tab, off + f).astype(jnp.int32) for f in range(FU)]
    off += FU
    ed = [(row(tab, off + 3 * e), row(tab, off + 3 * e + 1),
           row(tab, off + 3 * e + 2)) for e in range(EU)]
    off += 3 * EU
    em = [row(tab, off + e) > 0.5 for e in range(EU)]
    return list(zip(pn, pm)), loops, llens, list(zip(ed, em))


def _prep_points(pts, dps, normal, masks, meta, gat, pos_tab, invI_tab,
                 invm_tab, vw, nbody, L, inv_dt, fric_c, rest_c, prec=None):
    """Port of solver.prep_contacts to comp-major rows. fric_c/rest_c:
    (Pg, 1) static per-pair material constants. Returns the per-point field
    tuples the shared contact solve consumes + the pair inv masses."""
    pg = meta["pg"]

    # per-side body data, gathered once (static incidence matmul)
    def gmm(tab):
        return jax.lax.dot_general(
            gat, tab, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    pos = gmm(pos_tab)               # (2Pg, 3L)
    vwp = gmm(vw)                    # (2Pg, 6L)
    inert = gmm(invI_tab)            # (2Pg, 9L)
    invm2 = gmm(invm_tab)            # (2Pg, L)

    def comps(x, s, ncomp):
        blk = x[s * pg:(s + 1) * pg]
        return tuple(blk[:, c * L:(c + 1) * L] for c in range(ncomp))

    pa = comps(pos, 0, 3)
    pb = comps(pos, 1, 3)
    va = comps(vwp, 0, 6)[0:3]
    wa = tuple(comps(vwp, 0, 6)[3:6])
    vb = comps(vwp, 1, 6)[0:3]
    wb = tuple(comps(vwp, 1, 6)[3:6])
    ia = comps(inert, 0, 9)
    ib = comps(inert, 1, 9)
    inv_ma = invm2[0 * pg:1 * pg]
    inv_mb = invm2[1 * pg:2 * pg]

    def matvec(m, v):
        return (m[0]*v[0] + m[1]*v[1] + m[2]*v[2],
                m[3]*v[0] + m[4]*v[1] + m[5]*v[2],
                m[6]*v[0] + m[7]*v[1] + m[8]*v[2])

    out = []
    imp_shape = None
    for k in range(meta["k"]):
        point = pts[k]
        depth = dps[k]
        mask = masks[k].astype(jnp.float32)
        rel_a = cm._sub(point, pa)
        rel_b = cm._sub(point, pb)
        av = cm._add(tuple(va), cm._cross(wa, rel_a))
        bv = cm._add(tuple(vb), cm._cross(wb, rel_b))
        rel_v = cm._sub(bv, av)
        vn0 = cm._dot(normal, rel_v)
        t_raw = cm._sub(rel_v, cm._muls(normal, vn0))
        # noz (maths.py): zero vector below epsilon, else normalized
        tl = jnp.sqrt(jnp.maximum(cm._sqlen(t_raw), 0.0))
        ok = tl > 1e-6
        tangent = tuple(jnp.where(ok, c / jnp.maximum(tl, 1e-30), 0.0)
                        for c in t_raw)

        cr_at = cm._cross(rel_a, tangent)
        cr_bt = cm._cross(rel_b, tangent)
        im_t = (inv_ma + inv_mb + cm._dot(cr_at, matvec(ia, cr_at))
                + cm._dot(cr_bt, matvec(ib, cr_bt)))
        eff_t = jnp.where(im_t != 0.0,
                          1.0 / jnp.where(im_t != 0.0, im_t, 1.0),
                          0.0) * mask

        cr_an = cm._cross(rel_a, normal)
        cr_bn = cm._cross(rel_b, normal)
        im_n = (inv_ma + inv_mb + cm._dot(cr_an, matvec(ia, cr_an))
                + cm._dot(cr_bn, matvec(ib, cr_bn)))
        eff_n = jnp.where(im_n != 0.0,
                          1.0 / jnp.where(im_n != 0.0, im_n, 1.0),
                          0.0) * mask

        slop = -0.001
        # dt <= DT_THRESHOLD (1e-5) <=> inv_dt >= 1e5: zero the whole bias,
        # matching prep_contacts' guard (solver.py) for degenerate dt
        active = (-depth < slop) & (vn0 < 0.0) & (inv_dt < 1e5)
        bias = jnp.where(active,
                         -rest_c * vn0 - 0.1 * (-depth - slop) * inv_dt,
                         0.0)

        cv = (rel_a, rel_b, normal, tangent,
              matvec(ia, cr_an), matvec(ib, cr_bn),
              matvec(ia, cr_at), matvec(ib, cr_bt))
        cs = (eff_n, eff_t, bias, fric_c * mask)
        out.append((cv, cs))
        imp_shape = eff_n.shape
    return out, inv_ma, inv_mb, imp_shape


def _fused_core(metas, joints, nbody, L, num_iterations, omega,
                inv_dt,
                vw0, invm_t, invI_t, pos_t, idg_joint,
                cols_tab, group_onehots, group_incidence, group_fricrest,
                passed_preps, joint_ts, group_hull=None, sequential=False,
                jp=None):
    """The whole contact pipeline on comp-major arrays with L env lanes.

    sequential=True runs the solve in reference-exact sequential-impulse
    order (solver.py mode='scan' semantics: per-joint and per-pair
    Gauss-Seidel with immediate write-back, groups in scene order) instead
    of phased averaged updates — the TPU-speed fidelity mode.

    vw0 (NB, 6L); invm_t (NB, L); invI_t (9NB, L); pos_t (3NB, L);
    joints: [(name, [(a, b), ...])] in reference solve order;
    idg_joint[i]: (NB, L) inverse degrees for joints[i];
    joint_ts[i]: (J*ROWS, L) packed fields for joints[i];
    cols_tab (C, 11L);
    group_onehots[g] = (Ga (Pg,C), Gb (Pg,C)) or None for passed groups;
    group_incidence[g] = (gat (2Pg, NB), sca (NB, 2Pg));
    passed_preps[g] = per-point ((cv, cs)) list + (inv_ma, inv_mb) or None.

    Returns (vw (NB, 6L), imp_n per group list[K of (Pg, L)],
    live per group (Pg, L) bool)."""

    # Matmul precision split (round 5): the TPU's DEFAULT f32 matmul
    # truncates inputs to bf16 (~2.5e-3 relative; see _mxu_t). The
    # fidelity mode (sequential=True, solver_mode 'fused_seq') pays the
    # 6-pass HIGHEST cost on its once-per-step value gathers so the
    # in-kernel pipeline is arithmetic-faithful to the XLA 'scan' path;
    # the production mode (averaged/phased solve) pins DEFAULT explicitly
    # — the enclosing physics_step traces under
    # default_matmul_precision('float32') and inheriting it cost 24% of
    # loco throughput and +70% zoo compile time (round-5 job 08). The
    # kernel-boundary _mxu_t transposes stay HIGHEST unconditionally,
    # which alone makes zero-contact (free-flight) steps bit-exact in
    # BOTH modes: masked contact rows contribute exact-zero deltas even
    # at bf16.
    prec = (jax.lax.Precision.HIGHEST if sequential
            else jax.lax.Precision.DEFAULT)

    # body tables in matmul form: (NB, xL), comp-major lanes
    invI_tab = jnp.concatenate(
        [invI_t[i * nbody:(i + 1) * nbody] for i in range(9)], axis=1)
    pos_tab = jnp.concatenate(
        [pos_t[i * nbody:(i + 1) * nbody] for i in range(3)], axis=1)
    invm_tab = invm_t

    # ---- joint prep IN-KERNEL (cm_joint_prep): jp = (rot_t (4NB, L),
    # jp_static per type, jp_ctl per type per joint, dt lane). Static
    # joint params are baked into the trace; only body state and motor
    # controls are data. Produces the same packed row lists the
    # _*_field_rows readers consume, so the solve below is unchanged.
    if jp is not None:
        from dxk_tpu.ops.pallas.cm_joint_prep import ROW_BUILDERS
        rot_t, jp_static, jp_ctl, dtl = jp
        joint_ts = []
        for ji, (name, ab) in enumerate(joints):
            rows_all = []
            for j, (a, b) in enumerate(ab):
                bd = dict(
                    qa=tuple(rot_t[c * nbody + a] for c in range(4)),
                    qb=tuple(rot_t[c * nbody + b] for c in range(4)),
                    pa=tuple(pos_t[c * nbody + a] for c in range(3)),
                    pb=tuple(pos_t[c * nbody + b] for c in range(3)),
                    ia=tuple(invI_t[c * nbody + a] for c in range(9)),
                    ib=tuple(invI_t[c * nbody + b] for c in range(9)),
                    inv_ma=invm_t[a], inv_mb=invm_t[b])
                rows_all.extend(ROW_BUILDERS[name](
                    jp_static[ji][j], jp_ctl[ji][j], bd, dtl, inv_dt))
            joint_ts.append(rows_all)

    # ---- narrowphase per TYPE bucket (once per step) ----------------------
    # Phase splitting can turn one shape pair into up to num_phases groups;
    # instantiating a recipe graph (box_box_cm is ~5k ops) per GROUP blows
    # up trace/compile time ~linearly in phases. Run each recipe ONCE over
    # the concatenated pairs of all its groups, slice results back per
    # group. Identical math; bigger sublane extents for the vregs too.
    buckets = {}
    for g, meta in enumerate(metas):
        if meta["native"]:
            key = (min(meta["ta"], meta["tb"]), max(meta["ta"], meta["tb"]))
            buckets.setdefault(key, []).append(g)
    native_out = {}
    for key, gl in sorted(buckets.items()):
        ga = jnp.concatenate([group_onehots[g][0] for g in gl], axis=0)
        gb = jnp.concatenate([group_onehots[g][1] for g in gl], axis=0)
        pa = _gather_params(ga, cols_tab, L, prec)
        pb = _gather_params(gb, cols_tab, L, prec)
        hulls = None
        if key in HULL_RECIPES:
            n_tabs = len(group_hull[gl[0]])
            hulls = [jnp.concatenate([group_hull[g][t] for g in gl], axis=1)
                     for t in range(n_tabs)]
        pts, dps, normal, masks = _narrow_native(metas[gl[0]], pa, pb, hulls)
        off = 0
        for g in gl:
            sl = slice(off, off + metas[g]["pg"])
            native_out[g] = ([tuple(c[sl] for c in p) for p in pts],
                             [d[sl] for d in dps],
                             tuple(c[sl] for c in normal),
                             [m[sl] for m in masks])
            off += metas[g]["pg"]

    # ---- prep per group ---------------------------------------------------
    group_fields = []
    group_live = []
    for g, meta in enumerate(metas):
        gat, _sca = group_incidence[g]
        if meta["native"]:
            pts, dps, normal, masks = native_out[g]
            fr, re = group_fricrest[g]
            fields, inv_ma, inv_mb, _ = _prep_points(
                pts, dps, normal, masks, meta, gat, pos_tab, invI_tab,
                invm_tab, vw0, nbody, L, inv_dt, fr, re, prec)
            live = masks[0]
            for m in masks[1:]:
                live = live | m
        else:
            fields, inv_ma, inv_mb, live = passed_preps[g]
        group_fields.append((fields, inv_ma, inv_mb))
        group_live.append(live)

    # ---- contact inverse degrees from live pairs, per phase slice ---------
    from dxk_tpu.ops.pallas.batched_solver import phase_partition
    phase_groups = phase_partition([m["phase"] for m in metas])
    inv_deg_con = []
    for glist in phase_groups:
        deg = jnp.zeros((nbody, L), jnp.float32)
        for g in glist:
            _gat, sca = group_incidence[g]
            lv = group_live[g].astype(jnp.float32)
            both = jnp.concatenate([lv, lv], axis=0)      # (2Pg, L)
            # 0/1 x 0/1 product: exact at any precision — pin DEFAULT
            deg = deg + jax.lax.dot_general(
                sca, both, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        inv_deg_con.append(jnp.concatenate(
            [1.0 / jnp.maximum(deg, 1.0)] * 6, axis=1))   # (NB, 6L)
    inv_deg_joint = [jnp.concatenate([idg] * 6, axis=1)
                     for idg in idg_joint]

    from dxk_tpu.ops.pallas.batched_solver import _write_body_row

    def one_iteration(_i, carry):
        vw, con_imps, joint_imps = carry

        # ---- joint passes in reference type order -----------------------
        new_joint_imps = []
        for ji, (name, ab) in enumerate(joints):
            vw, accs = _solve_joint_type(
                name, ab, joint_ts[ji], vw, invm_t, invI_t, nbody, L,
                inv_deg_joint[ji], omega, joint_imps[ji],
                sequential=sequential)
            new_joint_imps.append(accs)
        joint_imps = tuple(new_joint_imps)

        if sequential:
            # ---- reference-exact contacts: groups in ascending phase
            # order (matching physics_step's prep concatenation), pairs in
            # table order, <=4 points in order, immediate write-back
            # (solver.py _contact_gs_pass / constraints.cpp:3381-3448)
            new_con_imps = [None] * len(metas)
            g_order = sorted(range(len(metas)),
                             key=lambda gi: metas[gi]["phase"])
            for g in g_order:
                meta = metas[g]
                pg = meta["pg"]
                fields, inv_ma, inv_mb = group_fields[g]
                imp_n = [x for x in con_imps[g][0]]
                imp_t = [x for x in con_imps[g][1]]
                for p in range(pg):
                    a = meta["body_a"][p]
                    b = meta["body_b"][p]
                    ra = [vw[a, c * L:(c + 1) * L] for c in range(6)]
                    rb = [vw[b, c * L:(c + 1) * L] for c in range(6)]
                    va, wa = tuple(ra[0:3]), tuple(ra[3:6])
                    vb, wb = tuple(rb[0:3]), tuple(rb[3:6])
                    for k in range(meta["k"]):
                        cv, cs = fields[k]
                        cv_p = tuple(tuple(c[p] for c in v) for v in cv)
                        cs_p = tuple(c[p] for c in cs)
                        va, wa, vb, wb, ik_n, ik_t = _contact_point(
                            cv_p, cs_p, inv_ma[p], inv_mb[p],
                            va, wa, vb, wb, imp_n[k][p], imp_t[k][p])
                        # one-hot multiplicative row write: .at[p].set
                        # emits a scatter (Mosaic-unlowerable even for
                        # static p) and an iota-mask select trips a libtpu
                        # layout CHECK; oh is exactly 0/1 so the update is
                        # bit-exact (see batched_solver._write_body_row)
                        ohp = (jax.lax.broadcasted_iota(
                            jnp.int32, (imp_n[k].shape[0], 1), 0)
                            == p).astype(imp_n[k].dtype)
                        imp_n[k] = (imp_n[k] * (1.0 - ohp)
                                    + ohp * ik_n[None, :])
                        imp_t[k] = (imp_t[k] * (1.0 - ohp)
                                    + ohp * ik_t[None, :])
                    vw = _write_body_row(vw, a, tuple(va) + tuple(wa))
                    vw = _write_body_row(vw, b, tuple(vb) + tuple(wb))
                new_con_imps[g] = (imp_n, imp_t)
            return vw, tuple(new_con_imps), joint_imps

        new_con_imps = [None] * len(metas)
        for pi, glist in enumerate(phase_groups):
          all_deltas = jnp.zeros_like(vw)
          for g in glist:
            meta = metas[g]
            pg = meta["pg"]
            gat, sca = group_incidence[g]
            fields, inv_ma, inv_mb = group_fields[g]
            u = jax.lax.dot_general(
                gat, vw, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)         # (2Pg, 6L)

            def comp(x, c):
                return x[:, c * L:(c + 1) * L]

            va = tuple(comp(u[:pg], c) for c in range(3))
            wa = tuple(comp(u[:pg], c + 3) for c in range(3))
            vb = tuple(comp(u[pg:], c) for c in range(3))
            wb = tuple(comp(u[pg:], c + 3) for c in range(3))
            va0, wa0, vb0, wb0 = va, wa, vb, wb
            imp_n, imp_t = con_imps[g]
            nn, tt = [], []
            for k in range(meta["k"]):
                cv, cs = fields[k]
                va, wa, vb, wb, ik_n, ik_t = _contact_point(
                    cv, cs, inv_ma, inv_mb, va, wa, vb, wb,
                    imp_n[k], imp_t[k])
                nn.append(ik_n)
                tt.append(ik_t)
            new_con_imps[g] = (nn, tt)
            da = list(_sub(va, va0)) + list(_sub(wa, wa0))
            db = list(_sub(vb, vb0)) + list(_sub(wb, wb0))
            d = jnp.concatenate(
                [jnp.concatenate(da, axis=1),
                 jnp.concatenate(db, axis=1)], axis=0)       # (2Pg, 6L)
            all_deltas = all_deltas + jax.lax.dot_general(
                sca, d, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
          vw = vw + all_deltas * (omega * inv_deg_con[pi])
        return vw, tuple(new_con_imps), joint_imps

    zero = jnp.zeros((L,), jnp.float32)
    con0 = tuple(
        ([jnp.zeros((m["pg"], L), jnp.float32) for _ in range(m["k"])],
         [jnp.zeros((m["pg"], L), jnp.float32) for _ in range(m["k"])])
        for m in metas)
    joints0 = tuple(
        tuple([zero for _ in ab] for _ in range(JOINT_SPECS[name][6]))
        for name, ab in joints)

    vw, con_imps, _j = jax.lax.fori_loop(
        0, num_iterations, one_iteration, (vw0, con0, joints0))
    imp_out = [con_imps[g][0] for g in range(len(metas))]
    return vw, imp_out, group_live


# ===========================================================================
# kernel + packing + custom_vmap


def _np_onehot(idx, n):
    oh = np.zeros((len(idx), n), np.float32)
    oh[np.arange(len(idx)), idx] = 1.0
    return oh


def _incidence(m, nb):
    pg = m["pg"]
    gat = np.zeros((2 * pg, nb), np.float32)
    gat[np.arange(pg), m["body_a"]] = 1.0
    gat[pg + np.arange(pg), m["body_b"]] = 1.0
    return gat, gat.T.copy()


def _ctl_layout(joints):
    """Controls-pack row layout [(name, J, fields)] + total row count."""
    from dxk_tpu.ops.pallas.cm_joint_prep import CTL_FIELDS
    layout = []
    R = 0
    for name, ab in joints:
        fields = CTL_FIELDS[name]
        layout.append((name, len(ab), fields))
        R += len(ab) * len(fields)
    return layout, R


def _ctl_dicts(layout, row):
    """Per-type per-joint control-lane dicts from a row accessor."""
    out = []
    r = 0
    for name, J, fields in layout:
        per_type = []
        for _j in range(J):
            d = {}
            for f in fields:
                d[f] = row(r)
                r += 1
            per_type.append(d)
        out.append(per_type)
    return out


def make_fused_step_solver(scene, num_iterations, omega=1.0,
                           sequential=False, joint_prep_in_kernel=False):
    """Returns fn(bodies, w_pack, joint_preps, passed, inv_dt) ->
    (v, w, imp_n (Ptot, 4), live (Ptot,)) per env, as a custom_vmap: the
    vmapped call launches the fused kernel on the whole batch; the
    unbatched call runs the identical `_fused_core` as plain XLA with one
    env lane.

    w_pack: (11, C) world collider params, param-major (see COL_PARAMS);
    joint_preps: tuple of prep structs for the scene's joint types, in
    scene_joint_ab order — OR, when joint_prep_in_kernel=True, the
    (R+1,) controls pack (motor-control rows per cm_joint_prep.CTL_FIELDS
    order, dt in the last row) and prep runs INSIDE the kernel from
    bodies.rot + static joint params; passed: tuple of ContactPrep slices
    for non-native groups, in group order (empty tuple when all groups are
    native); inv_dt: () scalar."""
    metas = _group_static(scene)
    joints = scene_joint_ab(scene)
    jp_static = None
    ctl_layout = None
    if joint_prep_in_kernel:
        from dxk_tpu.ops.pallas.cm_joint_prep import static_params
        jp_static = [static_params(scene, name) for name, _ab in joints]
        ctl_layout, _R = _ctl_layout(joints)

    @jax.custom_batching.custom_vmap
    def fused(bodies, w_pack, joint_preps, passed, inv_dt):
        # ---- unbatched: _fused_core with one env lane (plain XLA)
        nbl = bodies.v.shape[0]
        ncol = w_pack.shape[1]
        idg_np = static_joint_invdeg(scene, nbl)
        idg_joint = [jnp.asarray(idg_np[JOINT_ORDER.index(name)])[:, None]
                     for name, _ab in joints]

        vw0 = jnp.concatenate([bodies.v, bodies.w], axis=1)       # (NB, 6)
        invm_t = bodies.inv_mass[:, None]
        invI_t = jnp.concatenate(
            [bodies.inv_inertia[:, i // 3, i % 3][:, None]
             for i in range(9)], axis=0)
        pos_t = jnp.concatenate(
            [bodies.pos_cog[:, i][:, None] for i in range(3)], axis=0)
        cols_tab = jnp.transpose(w_pack, (1, 0))                  # (C, 11)

        onehots, incidence = [], []
        for m in metas:
            gat, sca = _incidence(m, nbl)
            incidence.append((jnp.asarray(gat), jnp.asarray(sca)))
            onehots.append(
                (jnp.asarray(_np_onehot(m["col_a"], ncol)),
                 jnp.asarray(_np_onehot(m["col_b"], ncol)))
                if m["native"] else None)
        passed_fields = _passed_fields_unbatched(metas, passed)
        fricrest = [
            (jnp.asarray(m["fric"])[:, None], jnp.asarray(m["rest"])[:, None])
            if m["native"] else None for m in metas]
        hull_tabs = [
            [jnp.asarray(t) for t in m["hull_tabs"]]
            if m.get("hull_tabs") is not None else None for m in metas]
        if joint_prep_in_kernel:
            joint_ts = None
            ctl = joint_preps                       # (R+1,) controls pack
            rot_t = jnp.concatenate(
                [bodies.rot[:, c][:, None] for c in range(4)], axis=0)
            jp = (rot_t, jp_static,
                  _ctl_dicts(ctl_layout, lambda r: ctl[r]),
                  ctl[ctl.shape[0] - 1])
        else:
            jp = None
            joint_ts = [
                jnp.transpose(pack_joint_type(
                    name, jax.tree_util.tree_map(lambda x: x[None], prep)),
                    (1, 0))
                for (name, _ab), prep in zip(joints, joint_preps)]

        vw, imp_out, live = _fused_core(
            metas, joints, nbl, 1, num_iterations, omega, inv_dt,
            vw0, invm_t, invI_t, pos_t, idg_joint,
            cols_tab, onehots, incidence, fricrest, passed_fields,
            joint_ts, group_hull=hull_tabs, sequential=sequential, jp=jp)
        v_new = vw[:, 0:3]
        w_new = vw[:, 3:6]
        imps = []
        for g, m in enumerate(metas):
            x = jnp.stack([imp_out[g][k][:, 0] for k in range(m["k"])], -1)
            if m["k"] < 4:
                x = jnp.pad(x, ((0, 0), (0, 4 - m["k"])))
            imps.append(x)
        live_cat = jnp.concatenate([l[:, 0] for l in live], axis=0)
        return v_new, w_new, jnp.concatenate(imps, axis=0), live_cat

    @fused.def_vmap
    def _vmap(axis_size, in_batched, bodies, w_pack, joint_preps,
              passed, inv_dt):
        def bc(x, b):
            return x if b else jnp.broadcast_to(
                jnp.asarray(x), (axis_size, *jnp.shape(x)))
        bodies = jax.tree_util.tree_map(bc, bodies, in_batched[0])
        w_pack = jax.tree_util.tree_map(bc, w_pack, in_batched[1])
        joint_preps = jax.tree_util.tree_map(bc, joint_preps, in_batched[2])
        passed = jax.tree_util.tree_map(bc, passed, in_batched[3])
        # inv_dt stays a scalar (it is closed-over static data per step)
        out = _fused_step_batched(scene, metas, joints, bodies,
                                  w_pack, joint_preps, passed,
                                  num_iterations, omega, inv_dt,
                                  sequential=sequential,
                                  jp_static=jp_static,
                                  ctl_layout=ctl_layout)
        return out, (True, True, True, True)

    return fused


def _passed_fields_unbatched(metas, passed):
    out = [None] * len(metas)
    pi = 0
    for g, m in enumerate(metas):
        if m["native"]:
            continue
        c = passed[pi]
        pi += 1
        fields = []
        for k in range(m["k"]):
            cv = tuple(
                tuple(getattr(c, f)[:, k, ci][:, None] for ci in range(3))
                for f in ("rel_a", "rel_b", "normal", "tangent",
                          "n_to_wa", "n_to_wb", "t_to_wa", "t_to_wb"))
            cs = tuple(getattr(c, f)[:, k][:, None]
                       for f in ("eff_mass_n", "eff_mass_t", "bias",
                                 "friction"))
            fields.append((cv, cs))
        inv_ma = c.inv_ma[:, None]
        inv_mb = c.inv_mb[:, None]
        live = fields[0][1][0] > 0.0
        for k in range(1, m["k"]):
            live = live | (fields[k][1][0] > 0.0)
        out[g] = (fields, inv_ma, inv_mb, live)
    return out


def _pack_passed(prep_slice, pg, kg):
    """(B, S*Pg)-packed prep for one prep-passed group: (k, field, comp)-
    major rows, pair minor (the layout _scratch_reader unpacks)."""
    from dxk_tpu.ops.pallas.batched_solver import SCAL_FIELDS, VEC_FIELDS
    c = prep_slice
    parts = []
    for k in range(kg):
        for f in VEC_FIELDS:
            v = getattr(c, f)
            for ci in range(3):
                parts.append(v[:, :, k, ci])
    for k in range(kg):
        for f in SCAL_FIELDS:
            parts.append(getattr(c, f)[:, :, k])
    parts.append(c.inv_ma)
    parts.append(c.inv_mb)
    t = jnp.stack(parts, axis=1)
    t = t.reshape(t.shape[0], -1)
    pad = _round128(t.shape[1]) - t.shape[1]
    if pad:
        t = jnp.pad(t, ((0, 0), (0, pad)))
    return t


def _scratch_reader(sc, meta):
    """Rebuild the passed-prep field structure from a packed scratch."""
    pg, kg = meta["pg"], meta["k"]
    nvec = kg * 8 * 3
    fields = []
    for k in range(kg):
        cv = []
        for fi in range(8):
            base = (k * 8 + fi) * 3
            cv.append(tuple(sc[(base + c) * pg:(base + c + 1) * pg, :]
                            for c in range(3)))
        cs = tuple(sc[(nvec + k * 4 + si) * pg:(nvec + k * 4 + si + 1) * pg,
                      :] for si in range(4))
        fields.append((tuple(cv), cs))
    inv_ma = sc[(nvec + kg * 4) * pg:(nvec + kg * 4 + 1) * pg, :]
    inv_mb = sc[(nvec + kg * 4 + 1) * pg:(nvec + kg * 4 + 2) * pg, :]
    live = fields[0][1][0] > 0.0
    for k in range(1, kg):
        live = live | (fields[k][1][0] > 0.0)
    return (fields, inv_ma, inv_mb, live)


def _make_kernel2(metas, joints, nb, ncol, num_iterations, omega,
                  sequential=False, jp_static=None, ctl_layout=None):
    n_groups = len(metas)
    n_passed = sum(1 for m in metas if not m["native"])
    jp_mode = jp_static is not None

    def kernel(*refs):
        it = iter(refs)
        invdt_ref = next(it)                   # (1, 1) SMEM
        vw_ref = next(it)                      # (CB, 6N)
        invm_ref = next(it)                    # (CB, N)
        invI_ref = next(it)                    # (CB, 9N)
        pos_ref = next(it)                     # (CB, 3N)
        rot_ref = next(it) if jp_mode else None  # (CB, 4N)
        ctl_ref = next(it) if jp_mode else None  # (CB, R+1)
        col_ref = next(it)                     # (CB, 11C)
        idg_ref = next(it)                     # (6, NB) const
        g_gat, g_sca, g_oh, g_fr, g_hbm, g_hull = [], [], [], [], [], []
        for m in metas:
            g_gat.append(next(it))
            g_sca.append(next(it))
            if m["native"]:
                g_oh.append((next(it), next(it)))
                g_fr.append(next(it))          # (2, Pg) const
                if m["hull_tabs"] is not None:
                    g_hull.append([next(it)
                                   for _ in range(len(m["hull_tabs"]))])
                else:
                    g_hull.append(None)
                g_hbm.append(None)
            else:
                g_oh.append(None)
                g_fr.append(None)
                g_hull.append(None)
                g_hbm.append(next(it))
        joint_refs = [] if jp_mode else [next(it) for _ in joints]
        vw_out = next(it)
        imp_outs = [next(it) for _ in range(n_groups)]
        live_outs = [next(it) for _ in range(n_groups)]
        scratches = [next(it) for _ in range(n_passed)]
        bounce = next(it) if n_passed else None
        sem = next(it) if n_passed else None

        chunk = pl.program_id(0)
        inv_dt = invdt_ref[0, 0]

        # velocity boundary transposes are ALWAYS exact (free-flight
        # bodies must pass through the kernel bit-identically); the
        # param/table/prep transposes follow the mode — HIGHEST in
        # fidelity (fused_seq), DEFAULT in the production averaged solve
        # where bf16 param rounding is within solver tolerance and
        # 6-pass transposes cost ~20% runtime and 2-3x compile (r5
        # job 10)
        tprec = (jax.lax.Precision.HIGHEST if sequential
                 else jax.lax.Precision.DEFAULT)

        pi = 0
        passed_read = [None] * n_groups
        for g, m in enumerate(metas):
            if m["native"]:
                continue
            cols_p = scratches[pi].shape[0]
            cp = pltpu.make_async_copy(
                g_hbm[g].at[pl.ds(chunk * CB, CB), :],
                bounce.at[:, pl.ds(0, cols_p)], sem)
            cp.start()
            cp.wait()
            scratches[pi][:, :] = _mxu_t(bounce[:, :cols_p], tprec)
            passed_read[g] = _scratch_reader(scratches[pi], m)
            pi += 1

        vw_t = _mxu_t(vw_ref[:, :])
        invm_t = _mxu_t(invm_ref[:, :], tprec)
        invI_t = _mxu_t(invI_ref[:, :], tprec)
        pos_t = _mxu_t(pos_ref[:, :], tprec)
        col_t = _mxu_t(col_ref[:, :], tprec)
        if jp_mode:
            joint_ts = None
            rot_t = _mxu_t(rot_ref[:, :], tprec)        # (4N, CB)
            ctl_t = _mxu_t(ctl_ref[:, :], tprec)        # (R+1, CB)
            jp = (rot_t, jp_static,
                  _ctl_dicts(ctl_layout, lambda r: ctl_t[r]),
                  ctl_t[ctl_t.shape[0] - 1])
        else:
            jp = None
            joint_ts = [_mxu_t(r[:, :], tprec) for r in joint_refs]

        vw0 = jnp.concatenate(
            [vw_t[c * nb:(c + 1) * nb] for c in range(6)], axis=1)
        cols_tab = jnp.concatenate(
            [col_t[i * ncol:(i + 1) * ncol] for i in range(COL_PARAMS)],
            axis=1)

        idg_joint = [
            jnp.broadcast_to(
                idg_ref[JOINT_ORDER.index(name), :][:, None], (nb, CB))
            for name, _ab in joints]

        onehots = [(g_oh[g][0][:, :], g_oh[g][1][:, :])
                   if m["native"] else None for g, m in enumerate(metas)]
        incidence = [(g_gat[g][:, :], g_sca[g][:, :])
                     for g in range(n_groups)]
        fricrest = [
            (jnp.transpose(g_fr[g][0:1, :], (1, 0)),
             jnp.transpose(g_fr[g][1:2, :], (1, 0)))
            if m["native"] else None for g, m in enumerate(metas)]
        hull_tabs = [
            [r[:, :] for r in g_hull[g]]
            if g_hull[g] is not None else None for g in range(n_groups)]

        vw, imp_out, live = _fused_core(
            metas, joints, nb, CB, num_iterations, omega, inv_dt,
            vw0, invm_t, invI_t, pos_t, idg_joint,
            cols_tab, onehots, incidence, fricrest, passed_read,
            joint_ts, group_hull=hull_tabs, sequential=sequential, jp=jp)

        out_rows = jnp.concatenate(
            [vw[:, c * CB:(c + 1) * CB] for c in range(6)], axis=0)
        vw_out[:, :] = _mxu_t(out_rows)
        for g, m in enumerate(metas):
            rows = jnp.concatenate(imp_out[g], axis=0)
            imp_outs[g][:, :] = _mxu_t(rows, tprec)
            live_outs[g][:, :] = _mxu_t(live[g].astype(jnp.float32), tprec)

    return kernel


def _fused_step_batched(scene, metas, joints, bodies, w_pack,
                        joint_preps, passed, num_iterations, omega,
                        inv_dt, sequential=False, jp_static=None,
                        ctl_layout=None):
    """Batched path: pack batch-major tensors and launch the kernel."""
    jp_mode = jp_static is not None
    B0 = bodies.v.shape[0]
    from dxk_tpu.ops.pallas.batched_solver import _pad_batch_to_cb
    bodies, w_pack, joint_preps, passed = _pad_batch_to_cb(
        (bodies, w_pack, joint_preps, passed), B0)
    B = bodies.v.shape[0]
    nb0 = bodies.v.shape[1]
    ncol = w_pack.shape[-1]
    pad_c = (-ncol) % 8
    if pad_c:
        # cols_tab assembly lane-concats row-slices strided by ncol; Mosaic
        # requires equal sublane offsets across concat operands
        w_pack = jnp.pad(w_pack, ((0, 0), (0, 0), (0, pad_c)))
        ncol = ncol + pad_c
    # same constraint on the BODY axis: vw0 assembly lane-concats row-
    # slices strided by nb (zoo at 113 bodies died in tpu.concatenate with
    # mismatched sublane offsets). Pad bodies to x8 with inert rows
    # (inv_mass/inv_inertia = 0); joint/pair indices are unaffected.
    pad_b = (-nb0) % 8
    if pad_b:
        def _padb(x):
            return jnp.pad(x, ((0, 0), (0, pad_b)) +
                           ((0, 0),) * (x.ndim - 2))
        bodies = bodies.replace(
            v=_padb(bodies.v), w=_padb(bodies.w),
            inv_mass=_padb(bodies.inv_mass),
            inv_inertia=_padb(bodies.inv_inertia),
            pos_cog=_padb(bodies.pos_cog),
            rot=_padb(bodies.rot))
    nb = nb0 + pad_b
    n_chunks = B // CB

    vw = jnp.concatenate([bodies.v, bodies.w], axis=-1)
    vw = jnp.transpose(vw, (0, 2, 1)).reshape(B, 6 * nb)
    invm = bodies.inv_mass
    invI = jnp.transpose(bodies.inv_inertia.reshape(B, nb, 9),
                         (0, 2, 1)).reshape(B, 9 * nb)
    pos = jnp.transpose(bodies.pos_cog, (0, 2, 1)).reshape(B, 3 * nb)
    colpack = w_pack.reshape(B, COL_PARAMS * ncol)

    inputs = [jnp.reshape(inv_dt.astype(jnp.float32), (1, 1))]
    in_specs = [pl.BlockSpec((1, 1), (lambda ch: (0, 0)),
                             memory_space=pltpu.SMEM)]

    def bspec(cols):
        return pl.BlockSpec((CB, cols), (lambda ch: (ch, 0)),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda ch, _nd=nd: (0,) * _nd),
                            memory_space=pltpu.VMEM)

    inputs += [vw, invm, invI, pos]
    in_specs += [bspec(6 * nb), bspec(nb), bspec(9 * nb), bspec(3 * nb)]
    if jp_mode:
        rotp = jnp.transpose(bodies.rot, (0, 2, 1)).reshape(B, 4 * nb)
        ctl = joint_preps                        # (B, R+1) controls pack
        inputs += [rotp, ctl]
        in_specs += [bspec(4 * nb), bspec(ctl.shape[1])]
    inputs += [colpack, jnp.asarray(static_joint_invdeg(scene, nb))]
    in_specs += [bspec(COL_PARAMS * ncol),
                 const_spec((len(JOINT_ORDER), nb))]

    scratch_cols = []
    pi = 0
    for g, m in enumerate(metas):
        gat, sca = _incidence(m, nb)
        inputs += [jnp.asarray(gat), jnp.asarray(sca)]
        in_specs += [const_spec(gat.shape), const_spec(sca.shape)]
        if m["native"]:
            inputs += [jnp.asarray(_np_onehot(m["col_a"], ncol)),
                       jnp.asarray(_np_onehot(m["col_b"], ncol)),
                       jnp.stack([jnp.asarray(m["fric"]),
                                  jnp.asarray(m["rest"])], axis=0)]
            in_specs += [const_spec((m["pg"], ncol)),
                         const_spec((m["pg"], ncol)),
                         const_spec((2, m["pg"]))]
            if m["hull_tabs"] is not None:
                for t in m["hull_tabs"]:
                    inputs.append(jnp.asarray(t))
                    in_specs.append(const_spec(t.shape))
        else:
            t = _pack_passed(passed[pi], m["pg"], m["k"])
            pi += 1
            inputs.append(t)
            in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
            scratch_cols.append(t.shape[1])
    if not jp_mode:
        for (name, ab), prep in zip(joints, joint_preps):
            inputs.append(pack_joint_type(name, prep))
            in_specs.append(bspec(len(ab) * joint_rows(name)))

    out_shapes = [jax.ShapeDtypeStruct((B, 6 * nb), jnp.float32)]
    out_specs = [bspec(6 * nb)]
    for m in metas:
        out_shapes.append(
            jax.ShapeDtypeStruct((B, m["k"] * m["pg"]), jnp.float32))
        out_specs.append(bspec(m["k"] * m["pg"]))
    for m in metas:
        out_shapes.append(jax.ShapeDtypeStruct((B, m["pg"]), jnp.float32))
        out_specs.append(bspec(m["pg"]))

    scratch_shapes = [pltpu.VMEM((cols, CB), jnp.float32)
                      for cols in scratch_cols]
    if scratch_cols:
        scratch_shapes.append(pltpu.VMEM((CB, max(scratch_cols)),
                                         jnp.float32))
        scratch_shapes.append(pltpu.SemaphoreType.DMA)

    kernel = _make_kernel2(metas, joints, nb, ncol,
                           num_iterations, omega, sequential=sequential,
                           jp_static=jp_static, ctl_layout=ctl_layout)

    interpret = jax.default_backend() != "tpu"
    outs = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        out_shape=tuple(out_shapes),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the AOT compiler's default scoped-vmem limit is 16M; the
            # constraint-zoo scene's kernel needs 20.35M of stack (measured
            # on v5e, round 4) and the orbit-pruned cloth+vehicle scene
            # 64.94M (measured round 5 — 959K past the old 64M limit, the
            # r2-r4 'HTTP 500' crash) — raise the LIMIT (not the estimate;
            # see docs/PERF_NOTES.md scoped-vmem lessons). v5e VMEM is
            # 128M; 100M still leaves room for the block operands.
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)

    vw_out = outs[0].reshape(B, 6, nb)
    vw_out = jnp.transpose(vw_out, (0, 2, 1))[:, :nb0]
    v_new, w_new = vw_out[..., :3], vw_out[..., 3:]

    imps, lives = [], []
    for g, m in enumerate(metas):
        x = outs[1 + g].reshape(B, m["k"], m["pg"])
        x = jnp.transpose(x, (0, 2, 1))
        if m["k"] < 4:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 4 - m["k"])))
        imps.append(x)
        lives.append(outs[1 + len(metas) + g] > 0.5)
    imp_cat = jnp.concatenate(imps, axis=1)
    live_cat = jnp.concatenate(lives, axis=1)
    if B0 != B:
        return v_new[:B0], w_new[:B0], imp_cat[:B0], live_cat[:B0]
    return v_new, w_new, imp_cat, live_cat
