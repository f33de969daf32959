"""Top-level physics step — the TPU rebuild of physicsStep /
physicsStepInternal (/root/reference/src/physics/physics.cpp:1180-1413).

Pipeline per substep (same order as the reference):
  1. world-space collider flattening + AABBs      (physics.cpp:631-756)
  2. broadphase: masked AABB overlap over static pair buckets
  3. narrowphase: per-bucket contact manifolds    (collision_narrow.cpp)
  4. trigger / force-field overlap interactions   (physics.cpp:952-1035)
  5. integrate forces (gravity, damping)          (rigid_body.cpp:95-124)
  6. constraint solve: N iterations over 7 types  (constraints.cpp)
  7. integrate velocities                         (rigid_body.cpp:126-142)
  8. cloth simulation                             (cloth.cpp:180-318)

Everything is one jittable pure function `physics_step(scene, state, settings,
dt) -> (state, StepInfo)`; batch over environments with `jax.vmap` (replacing
the reference's 16 OS processes, learning/util.py:30-37).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from dxk_tpu.ops import narrowphase as np_ops
from dxk_tpu.ops.broadphase import aabb_overlap_mask, compact_pairs
from dxk_tpu.ops.integrator import integrate_forces, integrate_velocities
from dxk_tpu.ops.shapes import collider_aabbs, world_colliders
from dxk_tpu.ops.solver import (Prepped, prep_ball, prep_cone_twist,
                                prep_contacts, prep_distance, prep_fixed,
                                prep_hinge, prep_slider, solve_constraints)
from dxk_tpu.scene.scene import (SHAPE_BOX, SHAPE_CAPSULE, SHAPE_CYLINDER,
                                 SHAPE_HULL, SHAPE_SPHERE, Scene, State,
                                 StepInfo)


@struct.dataclass
class PhysicsSettings:
    """Mirror of physics_settings (physics.h:382-400). `solver_mode` replaces
    the reference's scalar/SIMD toggles: "scan" = reference-exact sequential
    impulses; "jacobi" = parallel averaged-Jacobi; "colored" = build-time
    graph-colored Gauss-Seidel for joints (exact GS convergence, parallel
    within colors) with jacobi contacts."""

    num_rigid_solver_iterations: int = struct.field(pytree_node=False, default=30)
    num_cloth_velocity_iterations: int = struct.field(pytree_node=False, default=0)
    num_cloth_position_iterations: int = struct.field(pytree_node=False, default=1)
    num_cloth_drift_iterations: int = struct.field(pytree_node=False, default=0)
    # "scan" = the reference's sequential constraint sweep (exact);
    # "colored" = build-time conflict-free color batches solved via
    # constant one-hot MXU matmuls — no per-constraint scan/scatter ops,
    # same fixed point, order-divergent trajectories (ops/cloth.py)
    cloth_solver_mode: str = struct.field(pytree_node=False, default="scan")
    solver_mode: str = struct.field(pytree_node=False, default="scan")
    sor_omega: float = struct.field(pytree_node=False, default=1.0)
    # debug-mode NaN/Inf stage sweeps (VALIDATE analog, physics.cpp:807-926);
    # reports the first offending stage in StepInfo.validate_stage
    validate: bool = struct.field(pytree_node=False, default=False)
    # two-way cloth-rigid coupling: the momentum the cloth pushout removes
    # from particles is applied back to the colliding rigid bodies
    # (ops/cloth.collide_particles). The reference has NO cloth-rigid
    # collision at all — one-way pushout and this coupling both exceed it.
    cloth_two_way: bool = struct.field(pytree_node=False, default=True)
    # fused mode only: run joint constraint prep INSIDE the Pallas kernel
    # (ops/pallas/cm_joint_prep.py) instead of as ~0.5 ms of tiny XLA ops
    # at 4096 envs. Static joint params bake into the kernel; only motor
    # controls + body rotations cross HBM. fused_seq ignores this (its
    # fidelity contract is bit-exactness vs "scan", which preps in XLA).
    joint_prep_in_kernel: bool = struct.field(pytree_node=False,
                                              default=True)


def _cloth_substep(scene, new_state, state, settings, dt, w, bodies):
    """Cloth step + optional two-way coupling: the impulse/torque sums the
    pushout takes from the particles are applied to the post-solve rigid
    velocities (cloth runs last, physics.cpp:1354-1358 order)."""
    from dxk_tpu.ops.cloth import cloth_step

    two_way = settings.cloth_two_way
    cl, imp = cloth_step(
        scene.cloth, state.cloth, settings, scene.global_ff_force, dt,
        world=w, hulls=scene.hulls, heightfield=scene.heightfield,
        bodies=bodies if two_way else None,
        colbody=scene.colliders.body if two_way else None)
    new_state = new_state.replace(cloth=cl)
    if imp is not None:
        jsum, tsum = imp
        dv = jsum * bodies.inv_mass[:, None]
        dw = jnp.einsum("nij,nj->ni", bodies.inv_inertia, tsum)
        new_state = new_state.replace(lin_vel=new_state.lin_vel + dv,
                                      ang_vel=new_state.ang_vel + dw)
    return new_state


def _pair_params(w, idx):
    """Gather world shape params for one side of a pair list."""
    from dxk_tpu.ops.tpu_gather import gather_rows, onehot_gather_1d
    return (gather_rows(w.a, idx), gather_rows(w.b, idx),
            onehot_gather_1d(w.r, idx), gather_rows(w.rot, idx),
            w.hull_id[idx])


def _contacts_for_group(scene, w, group, pairs, mask):
    """Dispatch the right vmapped contact function for a (typeA,typeB)
    bucket. Returns (points (P,4,3), depths (P,4), normal (P,3),
    count (P,), hit (P,))."""
    ta, tb = group.type_a, group.type_b
    ia, ib = pairs[:, 0], pairs[:, 1]
    a_a, a_b, a_r, a_q, _ = _pair_params(w, ia)
    b_a, b_b, b_r, b_q, _ = _pair_params(w, ib)

    v = jax.vmap
    if (ta, tb) == (SHAPE_SPHERE, SHAPE_SPHERE):
        out = v(np_ops.sphere_sphere_contact)(a_a, a_r, b_a, b_r)
    elif (ta, tb) == (SHAPE_SPHERE, SHAPE_CAPSULE):
        out = v(np_ops.sphere_capsule_contact)(a_a, a_r, b_a, b_b, b_r)
    elif (ta, tb) == (SHAPE_SPHERE, SHAPE_CYLINDER):
        out = v(np_ops.sphere_cylinder_contact)(a_a, a_r, b_a, b_b, b_r)
    elif (ta, tb) == (SHAPE_SPHERE, SHAPE_BOX):
        out = v(np_ops.sphere_box_contact)(a_a, a_r, b_a, b_b, b_q)
    elif (ta, tb) == (SHAPE_CAPSULE, SHAPE_CAPSULE):
        out = v(np_ops.capsule_capsule_contact)(a_a, a_b, a_r, b_a, b_b, b_r)
    elif (ta, tb) == (SHAPE_CAPSULE, SHAPE_CYLINDER):
        out = v(np_ops.capsule_cylinder_contact)(a_a, a_b, a_r, b_a, b_b, b_r)
    elif (ta, tb) == (SHAPE_CAPSULE, SHAPE_BOX):
        out = v(np_ops.capsule_box_contact)(a_a, a_b, a_r, b_a, b_b, b_q)
    elif (ta, tb) == (SHAPE_CYLINDER, SHAPE_CYLINDER):
        out = v(np_ops.cylinder_cylinder_contact)(a_a, a_b, a_r, b_a, b_b, b_r)
    elif (ta, tb) == (SHAPE_CYLINDER, SHAPE_BOX):
        out = v(np_ops.cylinder_box_contact)(a_a, a_b, a_r, b_a, b_b, b_q)
    elif (ta, tb) == (SHAPE_BOX, SHAPE_BOX):
        out = v(np_ops.box_box_contact)(a_a, a_b, a_q, b_a, b_b, b_q)
    elif tb == SHAPE_HULL:
        def htabs(idx):
            h = scene.hulls
            return tuple(t[w.hull_id[idx]] for t in (
                h.vertices, h.vertex_mask, h.poly_normals, h.poly_offsets,
                h.poly_mask, h.loop_pts, h.loop_len, h.edge_dirs,
                h.edge_mask))
        hv, hm, *_ = tb_tabs = htabs(ib)
        hfn = scene.hulls.face_normals[w.hull_id[ib]]
        hfo = scene.hulls.face_offsets[w.hull_id[ib]]
        hfm = scene.hulls.face_mask[w.hull_id[ib]]
        if ta == SHAPE_SPHERE:
            out = v(np_ops.sphere_hull_contact)(a_a, a_r, b_a, b_q, hv, hm,
                                                hfn, hfo, hfm)
        elif ta == SHAPE_CAPSULE:
            out = v(np_ops.capsule_hull_contact)(a_a, a_b, a_r, b_a, b_q,
                                                 hv, hm, hfn, hfo, hfm)
        elif ta == SHAPE_CYLINDER:
            out = v(np_ops.cylinder_hull_contact)(a_a, a_b, a_r, b_a, b_q,
                                                  *tb_tabs)
        elif ta == SHAPE_BOX:
            out = v(np_ops.box_hull_contact)(a_a, a_b, a_q, b_a, b_q,
                                             *tb_tabs)
        else:  # hull-hull
            out = v(np_ops.hull_hull_contact)(a_a, a_q, *htabs(ia),
                                              b_a, b_q, *tb_tabs)
    else:
        raise NotImplementedError(f"contact pair ({ta}, {tb}) not implemented")
    pts, dps, nrm, cnt, hit = out
    hit = hit & mask
    cnt = jnp.where(hit, cnt, 0)
    return pts, dps, nrm, cnt, hit


def physics_step(scene: Scene, state: State, settings: PhysicsSettings,
                 dt: float) -> Tuple[State, StepInfo]:
    """One fixed substep. For the reference's fixed-timestep frame loop with
    interpolation, see `FixedTimestepDriver` in dxk_tpu/utils/timestep.py.

    Traced under matmul precision "float32": the engine leans on the MXU
    for gathers/scatters/layout transposes of *state values* (one-hot
    matmuls, MXU-identity transposes), and the TPU's DEFAULT f32 matmul
    truncates inputs to bf16 (~2.5e-3 relative — measured round 5, job
    06). That truncation injected a per-step velocity perturbation that
    drifted free-flying bodies ~1e-2 over 50 steps. HIGHEST-precision
    matmul is bit-exact for these 0/1- and identity-operand products and
    the physics kernels are VPU-bound, so exactness here is ~free; RL
    network matmuls outside physics_step keep the fast default."""
    with jax.default_matmul_precision("float32"):
        return _physics_step_p(scene, state, settings, dt)


def _physics_step_p(scene, state, settings, dt):
    dt = jnp.float32(dt)
    controls = state.controls if state.controls is not None \
        else scene.default_controls
    tracker = None
    if settings.validate:
        from dxk_tpu.utils.validate import StageTracker
        tracker = StageTracker()

    if settings.solver_mode in ("fused", "fused_seq"):
        from dxk_tpu.ops.pallas.fused_step import fused2_eligible
        if fused2_eligible(scene):
            return _physics_step_fused(
                scene, state, settings, dt, controls, tracker,
                sequential=settings.solver_mode == "fused_seq")

    # 1-2: colliders -> AABBs -> candidate overlaps
    w = world_colliders(scene, state.pos, state.rot)
    mn, mx = collider_aabbs(scene, w)
    if tracker is not None:
        tracker.check("world_colliders", w)
        tracker.check("aabbs", (mn, mx))

    # Groups are consumed in ascending contact-phase order so the
    # concatenated pair-major contact arrays are phase-contiguous and the
    # solver can run static Gauss-Seidel phase slices (see
    # solver._contact_phased_pass; phases assigned at build time).
    order = sorted(range(len(scene.pair_groups)),
                   key=lambda gi: scene.pair_groups[gi].phase)
    all_pts, all_dps, all_nrm = [], [], []
    all_cnt, all_hit, all_cpairs = [], [], []
    all_body_a, all_body_b, all_fric, all_rest = [], [], [], []
    phase_sizes = {}
    num_overlaps = jnp.int32(0)
    num_dropped = jnp.int32(0)

    kselect = None
    if scene.broadphase_k > 0:
        from dxk_tpu.ops.broadphase import kselect_group_pairs
        kselect, num_overlaps, row_dropped = kselect_group_pairs(scene, mn, mx)
        num_dropped = num_dropped + row_dropped

    selected = []
    for gi in order:
        group = scene.pair_groups[gi]
        if kselect is not None:
            pairs, mask, dropped = kselect[gi]
        else:
            mask = aabb_overlap_mask(mn, mx, group.pairs)
            num_overlaps = num_overlaps + jnp.sum(mask.astype(jnp.int32))
            pairs, mask, dropped = compact_pairs(group.pairs, mask,
                                                 group.max_narrow)
        num_dropped = num_dropped + dropped
        selected.append((gi, group, pairs, mask))

    # ONE narrowphase launch per (typeA, typeB) bucket: same-type groups
    # (the contact-phase splits of one bucket) are concatenated for the
    # contact kernels and split back after — phases only matter to the
    # SOLVER's slice order, not to narrowphase, and K phase-sized launches
    # of the same kernel waste dispatch latency vs one K-times-larger one.
    buckets = {}
    for item in selected:
        buckets.setdefault((item[1].type_a, item[1].type_b), []).append(item)
    narrow = {}
    from dxk_tpu.ops.tpu_gather import onehot_gather_1d as _og1
    for (ta, tb), items in buckets.items():
        cat_pairs = (items[0][2] if len(items) == 1
                     else jnp.concatenate([it[2] for it in items]))
        cat_mask = (items[0][3] if len(items) == 1
                    else jnp.concatenate([it[3] for it in items]))
        out = _contacts_for_group(scene, w, items[0][1], cat_pairs, cat_mask)
        ia, ib = cat_pairs[:, 0], cat_pairs[:, 1]
        # friction/restitution combine (collision_narrow.cpp:2234-2237)
        fric = jnp.clip(jnp.sqrt(_og1(w.friction, ia) * _og1(w.friction, ib)),
                        0.0, 1.0)
        rest = jnp.clip(jnp.maximum(_og1(w.restitution, ia),
                                    _og1(w.restitution, ib)), 0.0, 1.0)
        body_a = _og1(w.body, ia)
        body_b = _og1(w.body, ib)
        fields = (*out, body_a, body_b, fric, rest)
        off = 0
        for gi, _g, p, _m in items:
            n = p.shape[0]
            narrow[gi] = tuple(x[off:off + n] for x in fields)
            off += n

    for gi, group, pairs, mask in selected:
        pts, dps, nrm, cnt, hit, body_a, body_b, fric, rest = narrow[gi]
        all_pts.append(pts)
        all_dps.append(dps)
        all_nrm.append(nrm)
        all_cnt.append(cnt)
        all_hit.append(hit)
        all_cpairs.append(pairs)
        all_body_a.append(body_a)
        all_body_b.append(body_b)
        all_fric.append(fric)
        all_rest.append(rest)
        phase_sizes[group.phase] = (phase_sizes.get(group.phase, 0)
                                    + pairs.shape[0])

    # 3b: heightfield terrain contacts (heightmapCollision,
    # physics.cpp:1238-1248)
    hf_contacts = None
    if scene.heightfield is not None:
        from dxk_tpu.ops.heightmap import heightfield_contacts, heightfield_plan
        hf_contacts = heightfield_contacts(
            scene.heightfield, w, w.body, mn, mx, scene.num_bodies,
            plan=heightfield_plan(scene))

    # 4: trigger / force-field overlaps -> interactions
    trigger_overlap = None
    ff_force_per_body = None
    if scene.overlap_pairs is not None and scene.overlap_pairs.shape[0] > 0:
        trigger_overlap, ff_force_per_body = _overlap_interactions(
            scene, w, mn, mx)

    # apply localized force-field forces before integration (physics.cpp:963-967)
    if ff_force_per_body is not None:
        state = state.replace(force_acc=state.force_acc + ff_force_per_body)

    # 5: integrate forces
    bodies = integrate_forces(scene, state, dt)

    # assemble pair-major contact manifolds: (P, 4) points per pair, phases
    # contiguous, heightfield block as its own trailing phase slice
    prepped_contacts = None
    contact_pairs = None
    contact_mask = None
    total_contacts = jnp.int32(0)
    if all_pts or hf_contacts is not None:
        parts = []
        if all_pts:
            pts = jnp.concatenate(all_pts)                     # (P, 4, 3)
            dps = jnp.concatenate(all_dps)                     # (P, 4)
            nrm = jnp.repeat(jnp.concatenate(all_nrm)[:, None, :], 4, axis=1)
            cnt = jnp.concatenate(all_cnt)
            hit = jnp.concatenate(all_hit)
            cmask = hit[:, None] & (jnp.arange(4)[None, :] < cnt[:, None])
            body_a = jnp.concatenate(all_body_a)
            body_b = jnp.concatenate(all_body_b)
            fric = jnp.concatenate(all_fric)
            rest = jnp.concatenate(all_rest)
            # Dead pairs point at the dummy static body: masked points give
            # zero impulses, but live body indices would still inflate the
            # per-body degree averaging (1/degree), which collapses the
            # effective impulse once candidate pairs >> hits.
            dummy = jnp.int32(scene.num_bodies)
            live = cmask.any(axis=1)
            body_a = jnp.where(live, body_a, dummy)
            body_b = jnp.where(live, body_b, dummy)
            parts.append((pts, nrm, dps, body_a, body_b, fric, rest, cmask))
        if hf_contacts is not None:
            parts.append(hf_contacts)
        pts, nrm, dps, body_a, body_b, fric, rest, cmask = (
            tuple(jnp.concatenate([p[i] for p in parts]) for i in range(8)))
        sizes = tuple(phase_sizes[p] for p in sorted(phase_sizes))
        if hf_contacts is not None:
            sizes = sizes + (hf_contacts[0].shape[0],)
        total_contacts = jnp.sum(cmask.astype(jnp.int32))
        contact_mask = cmask.any(axis=1)
        if all_cpairs:
            hf_rows = hf_contacts[0].shape[0] if hf_contacts is not None else 0
            contact_pairs = jnp.concatenate(
                all_cpairs + ([jnp.full((hf_rows, 2), -1, jnp.int32)]
                              if hf_rows else []))
        if tracker is not None:
            tracker.check("contacts", (pts, nrm, dps))
        prepped_contacts = prep_contacts(
            bodies, body_a, body_b, pts, nrm, dps, fric, rest,
            cmask.astype(pts.dtype), dt, phase_sizes=sizes)

    # 6: constraint prep + solve
    prepped = Prepped(
        contacts=prepped_contacts,
        distance=prep_distance(bodies, scene.distance, dt)
        if scene.distance is not None else None,
        ball=prep_ball(bodies, scene.ball, dt)
        if scene.ball is not None else None,
        fixed=prep_fixed(bodies, scene.fixed, dt)
        if scene.fixed is not None else None,
        hinge=prep_hinge(bodies, scene.hinge, controls, dt)
        if scene.hinge is not None else None,
        cone_twist=prep_cone_twist(bodies, scene.cone_twist, controls, dt)
        if scene.cone_twist is not None else None,
        slider=prep_slider(bodies, scene.slider, controls, dt)
        if scene.slider is not None else None,
    )
    if tracker is not None:
        tracker.check("body_velocities", (bodies.v, bodies.w))
        tracker.check("constraint_prep", prepped)
    # "fused"/"fused_seq" on an ineligible scene (kselect/capped tables)
    # degrade to their XLA-semantics equivalents; the eligible case
    # returned through _physics_step_fused above
    mode = {"fused": "jacobi", "fused_seq": "scan"}.get(
        settings.solver_mode, settings.solver_mode)
    if (mode == "colored" and scene.pair_groups
            and scene.num_contact_phases <= 1):
        import warnings
        warnings.warn(
            "solver_mode='colored' on a scene finalized without "
            "contact_phases>1: contacts degrade to averaged Jacobi. "
            "Pass contact_phases=4 (or more) to SceneBuilder.finalize "
            "for conflict-free Gauss-Seidel contact slices.",
            stacklevel=2)
    bodies, contact_imp_n = solve_constraints(
        bodies, prepped, settings.num_rigid_solver_iterations,
        mode, settings.sor_omega)
    if tracker is not None:
        tracker.check("solved_velocities", (bodies.v, bodies.w))

    # 7: integrate velocities
    new_state = integrate_velocities(scene, bodies, state, dt)
    if tracker is not None:
        tracker.check("integrated_state", (new_state.pos, new_state.rot))

    # 8: cloth (w = this step's world colliders for cloth-vs-rigid pushout)
    if scene.cloth is not None and state.cloth is not None:
        new_state = _cloth_substep(scene, new_state, state, settings, dt, w,
                                   bodies)

    info = StepInfo(
        num_broadphase_overlaps=num_overlaps,
        num_contacts=total_contacts,
        broadphase_overflow=num_dropped,
        trigger_overlap=trigger_overlap,
        contact_pairs=contact_pairs,
        contact_mask=contact_mask,
        contact_impulse=(jnp.sum(contact_imp_n, axis=-1)
                         if contact_imp_n is not None else None),
        validate_stage=(tracker.first_bad() if tracker is not None else None),
    )
    return new_state, info


def _physics_step_fused(scene, state, settings, dt, controls, tracker,
                        sequential=False):
    """Fused-pipeline step (ops/pallas/fused_step.py): narrowphase + prep +
    solve run inside one Pallas kernel for the pair groups with a
    component-major recipe; other groups get XLA narrowphase+prep passed in
    packed. Same ordering as the main path (physicsStep,
    physics.cpp:1180-1362); solve semantics = solver_mode \"jacobi\" when
    sequential=False, reference-exact \"scan\" when sequential=True
    (solver_mode \"fused_seq\")."""
    from dxk_tpu.ops.pallas.fused_step import (CM_RECIPES, COL_PARAMS,
                                               make_fused_step_solver)
    from dxk_tpu.ops.solver import prep_contacts
    from dxk_tpu.ops.tpu_gather import onehot_gather_1d as _og1

    # 1-2: colliders -> AABBs (AABBs feed trigger overlaps only here; the
    # kernel's narrowphase subsumes the per-pair AABB pre-filter)
    w = world_colliders(scene, state.pos, state.rot)
    mn, mx = collider_aabbs(scene, w)
    if tracker is not None:
        tracker.check("world_colliders", w)
        tracker.check("aabbs", (mn, mx))

    # trigger / force-field overlaps (unchanged)
    trigger_overlap = None
    ff_force_per_body = None
    if scene.overlap_pairs is not None and scene.overlap_pairs.shape[0] > 0:
        trigger_overlap, ff_force_per_body = _overlap_interactions(
            scene, w, mn, mx)
    if ff_force_per_body is not None:
        state = state.replace(force_acc=state.force_acc + ff_force_per_body)

    # integrate forces
    bodies = integrate_forces(scene, state, dt)

    # XLA narrowphase + prep ONLY for groups without a cm recipe
    order = sorted(range(len(scene.pair_groups)),
                   key=lambda gi: scene.pair_groups[gi].phase)
    passed = []
    static_pairs = []
    for gi in order:
        group = scene.pair_groups[gi]
        key = (min(group.type_a, group.type_b),
               max(group.type_a, group.type_b))
        static_pairs.append(group.pairs)
        if key in CM_RECIPES:
            continue
        mask = aabb_overlap_mask(mn, mx, group.pairs)
        pts, dps, nrm, cnt, hit = _contacts_for_group(
            scene, w, group, group.pairs, mask)
        ia, ib = group.pairs[:, 0], group.pairs[:, 1]
        fric = jnp.clip(jnp.sqrt(_og1(w.friction, ia) * _og1(w.friction, ib)),
                        0.0, 1.0)
        rest = jnp.clip(jnp.maximum(_og1(w.restitution, ia),
                                    _og1(w.restitution, ib)), 0.0, 1.0)
        cmask = hit[:, None] & (jnp.arange(4)[None, :] < cnt[:, None])
        prep = prep_contacts(
            bodies, _og1(w.body, ia), _og1(w.body, ib), pts,
            jnp.repeat(nrm[:, None, :], 4, axis=1), dps, fric, rest,
            cmask.astype(pts.dtype), dt)
        passed.append(prep)

    # heightfield terrain contacts: XLA narrowphase+prep, passed into the
    # kernel as the trailing pseudo-group (see fused_step._group_static)
    if scene.heightfield is not None:
        from dxk_tpu.ops.heightmap import heightfield_contacts, heightfield_plan
        hpts, hnrm, hdps, hba, hbb, hfr, hre, hcm = heightfield_contacts(
            scene.heightfield, w, w.body, mn, mx, scene.num_bodies,
            plan=heightfield_plan(scene))
        passed.append(prep_contacts(
            bodies, hba, hbb, hpts, hnrm, hdps, hfr, hre,
            hcm.astype(hpts.dtype), dt))

    # joint prep: either packed motor-control rows for IN-KERNEL prep
    # (cm_joint_prep; static params bake into the kernel) or the XLA prep
    # structs; one entry per joint type present in the scene, in
    # scene_joint_ab (reference solve) order
    from dxk_tpu.ops.pallas.batched_solver import scene_joint_ab
    jp_in_kernel = settings.joint_prep_in_kernel and not sequential
    if jp_in_kernel:
        from dxk_tpu.ops.pallas.cm_joint_prep import CTL_ATTRS, CTL_FIELDS
        rows = []
        for name, ab in scene_joint_ab(scene):
            for j in range(len(ab)):
                for field in CTL_FIELDS[name]:
                    rows.append(getattr(
                        controls, CTL_ATTRS[name][field])[j]
                        .astype(jnp.float32))
        rows.append(jnp.asarray(dt, jnp.float32))    # dt in the last row
        joint_preps = jnp.stack(rows)
    else:
        prep_fns = {
            "distance": lambda: prep_distance(bodies, scene.distance, dt),
            "ball": lambda: prep_ball(bodies, scene.ball, dt),
            "fixed": lambda: prep_fixed(bodies, scene.fixed, dt),
            "hinge": lambda: prep_hinge(bodies, scene.hinge, controls, dt),
            "cone_twist": lambda: prep_cone_twist(bodies, scene.cone_twist,
                                                  controls, dt),
            "slider": lambda: prep_slider(bodies, scene.slider, controls,
                                          dt),
        }
        joint_preps = tuple(prep_fns[name]()
                            for name, _ab in scene_joint_ab(scene))

    # world collider param pack: (11, C) param-major
    w_pack = jnp.concatenate([
        jnp.transpose(w.a, (1, 0)), jnp.transpose(w.b, (1, 0)),
        w.r[None, :], jnp.transpose(w.rot, (1, 0))], axis=0)

    if tracker is not None:
        tracker.check("body_velocities", (bodies.v, bodies.w))

    fused = make_fused_step_solver(scene, settings.num_rigid_solver_iterations,
                                   settings.sor_omega,
                                   sequential=sequential,
                                   joint_prep_in_kernel=jp_in_kernel)
    inv_dt = jnp.float32(1.0) / dt
    v_new, w_new, imp_n, live = fused(bodies, w_pack, joint_preps,
                                      tuple(passed), inv_dt)
    bodies = bodies.replace(v=v_new, w=w_new)
    if tracker is not None:
        tracker.check("solved_velocities", (bodies.v, bodies.w))

    new_state = integrate_velocities(scene, bodies, state, dt)
    if tracker is not None:
        tracker.check("integrated_state", (new_state.pos, new_state.rot))

    if scene.cloth is not None and state.cloth is not None:
        new_state = _cloth_substep(scene, new_state, state, settings, dt, w,
                                   bodies)

    # hf pseudo-group rows have no collider pair: pad with (-1, -1) so
    # contact_pairs stays index-aligned with contact_mask/contact_impulse
    # (same contract as the XLA path's hf block)
    if scene.heightfield is not None:
        hf_rows = scene.colliders.ctype.shape[0]
        static_pairs = static_pairs + [
            jnp.full((hf_rows, 2), -1, jnp.int32)]
    contact_pairs = jnp.concatenate(static_pairs) if static_pairs else None
    n_live = jnp.sum(live.astype(jnp.int32))
    info = StepInfo(
        num_broadphase_overlaps=n_live,
        num_contacts=n_live,
        broadphase_overflow=jnp.int32(0),
        trigger_overlap=trigger_overlap,
        contact_pairs=contact_pairs,
        contact_mask=live,
        contact_impulse=jnp.sum(imp_n, axis=-1),
        validate_stage=(tracker.first_bad() if tracker is not None else None),
    )
    return new_state, info


def _overlap_interactions(scene: Scene, w, mn, mx):
    """Trigger/FF vs rigid-body overlap checks (overlapCheck,
    collision_narrow.cpp:1593-1689): AABB pre-filter, then exact
    shape-vs-shape tests per static type bucket (reusing the contact
    kernels as boolean tests). Returns (trigger_overlap mask (Q,),
    per-body FF force)."""
    pairs = scene.overlap_pairs
    ia, ib = pairs[:, 0], pairs[:, 1]

    # exact overlap per type bucket, scattered back to the flat pair order
    overlap = jnp.zeros((pairs.shape[0],), bool)
    # map each bucket row back to its index in scene.overlap_pairs
    import numpy as _np
    flat_pairs = _np.asarray(scene.overlap_pairs)
    index_of = {tuple(p): i for i, p in enumerate(flat_pairs)}
    for g in scene.overlap_groups:
        m = aabb_overlap_mask(mn, mx, g.pairs)
        _, _, _, _, hit = _contacts_for_group(scene, w, g, g.pairs, m)
        rows = _np.asarray(g.pairs)
        idxs = jnp.asarray(_np.array([index_of[tuple(p)] for p in rows],
                                     _np.int32))
        overlap = overlap.at[idxs].set(hit)

    c = scene.colliders
    # which side is the trigger/FF, which is the rigid body
    a_is_other = c.owner_type[ia] >= 2
    other_idx = jnp.where(a_is_other, ia, ib)
    rb_collider = jnp.where(a_is_other, ib, ia)
    rb_body = c.body[rb_collider]

    is_ff = (c.owner_type[other_idx] == 2) & overlap
    ff_slot = c.owner_index[other_idx]
    ff_force = scene.ff_forces[ff_slot] * is_ff[:, None]
    n1 = scene.num_bodies + 1
    force_per_body = jnp.zeros((n1, 3), ff_force.dtype).at[rb_body].add(ff_force)

    is_trigger = (c.owner_type[other_idx] == 3) & overlap
    return is_trigger, force_per_body


def apply_ray_impulse(scene: Scene, state: State, origin, direction,
                      strength=1000.0) -> State:
    """testPhysicsInteraction (physics.cpp:555-629): cast a ray against all
    colliders owned by rigid bodies; apply `strength * direction` as a force
    (plus the induced torque) to the closest hit body's accumulators. The
    force persists until the next integration step, exactly like the
    reference's accumulator semantics."""
    from dxk_tpu.ops import raycast as rc
    from dxk_tpu.core.maths import cross as _cross, quat_rotate as _qr

    c = scene.colliders
    pos, rot = state.pos, state.rot
    bpos = pos[c.body]
    brot = rot[c.body]
    # ray into each collider owner's local space (physics.cpp:571)
    from dxk_tpu.core.maths import quat_inv_rotate as _qir
    o_l = _qir(brot, origin - bpos)
    d_l = _qir(brot, jnp.broadcast_to(direction, o_l.shape))

    big = 3.4e38
    t_sph, _ = rc.ray_sphere(o_l, d_l, c.a, c.r)
    t_cap, _ = rc.ray_capsule(o_l, d_l, c.a, c.b, c.r)
    t_cyl, _ = rc.ray_cylinder(o_l, d_l, c.a, c.b, c.r)
    t_box, _ = rc.ray_box(o_l, d_l, c.a, c.b, c.rot)
    if scene.hulls is not None:
        t_hull, _ = rc.ray_hull(o_l, d_l, c.a, c.rot,
                                scene.hulls.vertices[c.hull_id],
                                scene.hulls.vertex_mask[c.hull_id],
                                scene.hulls.face_normals[c.hull_id],
                                scene.hulls.face_offsets[c.hull_id],
                                scene.hulls.face_mask[c.hull_id])
    else:
        t_hull = jnp.full_like(t_sph, big)

    t = jnp.where(c.ctype == 0, t_sph,
        jnp.where(c.ctype == 1, t_cap,
        jnp.where(c.ctype == 2, t_cyl,
        jnp.where(c.ctype == 3, t_box, t_hull))))
    # only colliders owned by dynamic rigid bodies are poke targets
    is_rb = c.body < scene.num_bodies
    t = jnp.where(is_rb, t, big)

    best = jnp.argmin(t)
    hit_any = t[best] < big
    body = c.body[best]

    hit_local = o_l[best] + t[best] * d_l[best]
    hit_world = _qr(brot[best], hit_local) + bpos[best]
    cog_world = pos[body] + _qr(rot[body], scene.body_params.local_cog[body])

    force = direction * strength
    torque = _cross(hit_world - cog_world, force)
    scale = jnp.where(hit_any, 1.0, 0.0)
    return state.replace(
        force_acc=state.force_acc.at[body].add(force * scale),
        torque_acc=state.torque_acc.at[body].add(torque * scale))
