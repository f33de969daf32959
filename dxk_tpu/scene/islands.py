"""Build-time island decomposition: map a large scene of independent
sub-structures (towers, ragdoll farms, chain arrays) onto the batch axis.

The reference ships (dead) DFS island building
(/root/reference/src/physics/island.cpp:buildIslands — never called); its
solver never needed it because sequential impulses on one core don't care.
On TPU, islands ARE the scaling axis: each island becomes one lane-batch
element of the fused solver kernel (ops/pallas/batched_solver.py packs the
batch onto vector lanes), so a 1k-body scene of 64 towers solves as 64
lanes of a 16-body scene — small incidence matrices, VMEM-resident
velocities, full MXU utilization — instead of one 1k-body monolith.

Requirements (checked, `islandize` raises otherwise):
  - static candidate tables (use finalize(candidate_margin=...) to prune
    a big scene into disconnected components);
  - all islands identical: same local topology AND same collider/body/joint
    parameters (initial positions MAY differ — they live in State);
  - no cloth, heightfield, triggers/FFs, or kselect broadphase.

Bodies with inv_mass == 0 (statics, kinematic anchors) do not transmit
impulses, so they don't merge islands; each island referencing one gets a
local replica.

Usage:
    scene = builder.finalize(candidate_margin=1.0, contact_phases=4)
    im = islandize(scene)
    st = im.gather(scene.initial_state())         # (I, nbl+1, ...)
    step = jax.vmap(lambda s: physics_step(im.sub_scene, s, settings, dt))
    st, info = step(st)
    full = im.scatter(st, scene.initial_state())  # back to (N+1, ...)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from dxk_tpu.scene.scene import (Colliders, BodyParams, JointsOfType,
                                 MotorControls, PairGroup, Scene)


class NotIslandizable(ValueError):
    pass


@struct.dataclass
class IslandMap:
    """sub_scene: the representative island Scene (nbl bodies + dummy);
    body_map: (I, nbl) int32 global body index per island-local slot
    (global dummy for padding); *_ctrl_map: (I, Jl) int32 global joint
    index per island-local joint, for the control-bearing types — gather
    uses them to slice the caller's MotorControls into island space."""

    sub_scene: Scene = struct.field(pytree_node=False)
    body_map: jnp.ndarray = None     # (I, nbl) int32
    num_islands: int = struct.field(pytree_node=False, default=0)
    hinge_ctrl_map: jnp.ndarray = None      # (I, Jh) int32 or None
    ct_ctrl_map: jnp.ndarray = None         # (I, Jc) int32 or None
    slider_ctrl_map: jnp.ndarray = None     # (I, Js) int32 or None

    def gather(self, state):
        """(N+1, ...) per-body state -> (I, nbl+1, ...). The local dummy row
        is the global dummy row."""
        nbl = self.body_map.shape[1]
        full_map = jnp.concatenate(
            [self.body_map,
             jnp.full((self.num_islands, 1), state.pos.shape[0] - 1,
                      jnp.int32)], axis=1)
        take = lambda x: x[full_map] if x is not None else None
        return state.replace(
            pos=take(state.pos), rot=take(state.rot),
            lin_vel=take(state.lin_vel), ang_vel=take(state.ang_vel),
            force_acc=take(state.force_acc),
            torque_acc=take(state.torque_acc),
            controls=self._gather_controls(state.controls),
            cloth=None)

    def _gather_controls(self, controls):
        """Slice the caller's full-scene MotorControls into (I, Jl) island
        space via the per-island joint maps (each island keeps its own
        global joints; identical topology guarantees equal counts)."""
        if controls is None:
            return None

        def tk(arr, cmap):
            if cmap is None:
                return jnp.broadcast_to(arr[:0], (self.num_islands, 0))
            return arr[cmap]

        c = controls
        return MotorControls(
            hinge_motor_type=tk(c.hinge_motor_type, self.hinge_ctrl_map),
            hinge_target=tk(c.hinge_target, self.hinge_ctrl_map),
            hinge_max_torque=tk(c.hinge_max_torque, self.hinge_ctrl_map),
            ct_swing_motor_type=tk(c.ct_swing_motor_type, self.ct_ctrl_map),
            ct_swing_target=tk(c.ct_swing_target, self.ct_ctrl_map),
            ct_swing_axis_angle=tk(c.ct_swing_axis_angle, self.ct_ctrl_map),
            ct_swing_max_torque=tk(c.ct_swing_max_torque, self.ct_ctrl_map),
            ct_twist_motor_type=tk(c.ct_twist_motor_type, self.ct_ctrl_map),
            ct_twist_target=tk(c.ct_twist_target, self.ct_ctrl_map),
            ct_twist_max_torque=tk(c.ct_twist_max_torque, self.ct_ctrl_map),
            slider_motor_type=tk(c.slider_motor_type, self.slider_ctrl_map),
            slider_target=tk(c.slider_target, self.slider_ctrl_map),
            slider_max_force=tk(c.slider_max_force, self.slider_ctrl_map))

    def scatter(self, island_state, template_state):
        """(I, nbl+1, ...) -> (N+1, ...): write island rows back into a
        full-scene state (replicated zero-mass rows win last; they never
        change, so order is irrelevant)."""
        n1 = template_state.pos.shape[0]
        flat_idx = self.body_map.reshape(-1)

        def put(tmpl, isl):
            vals = isl[:, :-1].reshape((-1, *isl.shape[2:]))
            return tmpl.at[flat_idx].set(vals)

        return template_state.replace(
            pos=put(template_state.pos, island_state.pos),
            rot=put(template_state.rot, island_state.rot),
            lin_vel=put(template_state.lin_vel, island_state.lin_vel),
            ang_vel=put(template_state.ang_vel, island_state.ang_vel),
            force_acc=put(template_state.force_acc, island_state.force_acc),
            torque_acc=put(template_state.torque_acc,
                           island_state.torque_acc))


def _np(x):
    return np.asarray(x)


def islandize(scene: Scene, strict_params: bool = True) -> IslandMap:
    """Decompose `scene` into identical islands. Raises NotIslandizable if
    the scene has non-identical islands or unsupported features."""
    if scene.cloth is not None or scene.heightfield is not None:
        raise NotIslandizable("cloth/heightfield scenes not supported")
    if scene.overlap_groups or (scene.overlap_pairs is not None
                                and scene.overlap_pairs.shape[0] > 0):
        raise NotIslandizable("trigger/force-field scenes not supported")
    if scene.broadphase_k > 0:
        raise NotIslandizable("kselect scenes have no static tables")

    nb = scene.num_bodies
    inv_mass = _np(scene.body_params.inv_mass)
    dynamic = inv_mass[:nb] > 0.0

    # union-find over dynamic bodies
    parent = np.arange(nb)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    col_body = _np(scene.colliders.body)
    edges = []
    for g in scene.pair_groups:
        p = _np(g.pairs)
        ba, bb = col_body[p[:, 0]], col_body[p[:, 1]]
        edges.append(np.stack([ba, bb], -1))
    for name in ("distance", "ball", "fixed", "hinge", "cone_twist",
                 "slider"):
        j = getattr(scene, name)
        if j is not None:
            edges.append(np.stack([_np(j.body_a), _np(j.body_b)], -1))
    for e in np.concatenate(edges) if edges else []:
        a, b = int(e[0]), int(e[1])
        if a < nb and b < nb and dynamic[a] and dynamic[b]:
            union(a, b)

    roots = {}
    for i in range(nb):
        if dynamic[i]:
            roots.setdefault(find(i), []).append(i)
    islands_dyn = sorted(roots.values(), key=lambda lst: lst[0])
    n_isl = len(islands_dyn)
    if n_isl < 2:
        raise NotIslandizable(f"{n_isl} island(s) — nothing to decompose")

    # per island: referenced zero-mass (kinematic/static-owner) bodies
    # from joints and pair tables
    ref_sets = [set() for _ in range(n_isl)]
    isl_of = np.full(nb, -1)
    for ii, lst in enumerate(islands_dyn):
        for b in lst:
            isl_of[b] = ii
    all_edges = np.concatenate(edges) if edges else np.zeros((0, 2), int)
    for a, b in all_edges:
        a, b = int(a), int(b)
        for x, y in ((a, b), (b, a)):
            if x < nb and dynamic[x] and y < nb and not dynamic[y]:
                ref_sets[isl_of[x]].add(y)
    islands = [lst + sorted(ref_sets[ii])
               for ii, lst in enumerate(islands_dyn)]

    sizes = {len(lst) for lst in islands}
    if len(sizes) != 1:
        raise NotIslandizable(f"unequal island sizes: {sorted(sizes)}")
    nbl = sizes.pop()

    # local body index per island; global dummy maps to local dummy (nbl)
    g2l = []
    for lst in islands:
        m = {g: i for i, g in enumerate(lst)}
        m[nb] = nbl
        g2l.append(m)

    # per-island colliders: colliders owned by island bodies, plus every
    # static-owner collider (body == dummy) that appears in a pair with one
    # of them (e.g. the shared ground)
    own_cols = [[] for _ in range(n_isl)]
    static_refs = [set() for _ in range(n_isl)]
    for ci in range(col_body.shape[0]):
        b = int(col_body[ci])
        if b < nb and isl_of[b] >= 0:
            own_cols[isl_of[b]].append(ci)
        elif b < nb and not dynamic[b]:
            pass    # kinematic-owned collider: handled below via body list
    # kinematic-owned colliders attach to whichever islands replicate them
    for ci in range(col_body.shape[0]):
        b = int(col_body[ci])
        if b < nb and not dynamic[b]:
            for ii, lst in enumerate(islands):
                if b in g2l[ii] and b != nb:
                    if b in islands[ii]:
                        own_cols[ii].append(ci)
    for g in scene.pair_groups:
        p = _np(g.pairs)
        ba, bb = col_body[p[:, 0]], col_body[p[:, 1]]
        for (c0, c1), b0, b1 in zip(p, ba, bb):
            for cs, bs, co in ((c0, b0, c1), (c1, b1, c0)):
                if bs == nb:     # static collider paired with the other side
                    other = int(b1 if bs == b0 else b0)
                    ii = isl_of[other] if other < nb else -1
                    if ii >= 0:
                        static_refs[ii].add(int(cs))
    col_lists = [sorted(set(own_cols[ii])) + sorted(static_refs[ii])
                 for ii in range(n_isl)]
    csizes = {len(lst) for lst in col_lists}
    if len(csizes) != 1:
        raise NotIslandizable(f"unequal collider counts: {sorted(csizes)}")

    # canonical signature + param check against island 0
    def local_cols(ii):
        cmap = {g: i for i, g in enumerate(col_lists[ii])}
        return cmap

    def pair_sig(ii):
        cmap = local_cols(ii)
        sig = []
        for g in scene.pair_groups:
            p = _np(g.pairs)
            rows = []
            for c0, c1 in p:
                if int(c0) in cmap and int(c1) in cmap:
                    rows.append((cmap[int(c0)], cmap[int(c1)]))
            sig.append((g.type_a, g.type_b, g.phase, tuple(sorted(rows))))
        return tuple(sig)

    def joint_sig(ii):
        m = g2l[ii]
        sig = []
        for name in ("distance", "ball", "fixed", "hinge", "cone_twist",
                     "slider"):
            j = getattr(scene, name)
            if j is None:
                sig.append(None)
                continue
            rows = []
            for ji, (a, b) in enumerate(zip(_np(j.body_a), _np(j.body_b))):
                if int(a) in m and int(b) in m and (
                        isl_of[int(a)] == ii or isl_of[int(b)] == ii):
                    rows.append((ji, m[int(a)], m[int(b)]))
            sig.append(tuple((la, lb) for _ji, la, lb in rows))
        return tuple(sig)

    sig0p, sig0j = pair_sig(0), joint_sig(0)
    for ii in range(1, n_isl):
        if pair_sig(ii) != sig0p:
            raise NotIslandizable(f"island {ii} pair topology differs")
        if joint_sig(ii) != sig0j:
            raise NotIslandizable(f"island {ii} joint topology differs")

    ctype = _np(scene.colliders.ctype)
    if strict_params:
        ref = col_lists[0]
        for ii in range(1, n_isl):
            for field in ("ctype", "a", "b", "r", "rot", "friction",
                          "restitution", "hull_id"):
                v = _np(getattr(scene.colliders, field))
                if not np.allclose(v[col_lists[ii]], v[ref]):
                    raise NotIslandizable(
                        f"island {ii} collider param '{field}' differs")
            for field in ("inv_mass", "inv_inertia", "local_cog",
                          "gravity_factor", "linear_damping",
                          "angular_damping"):
                v = _np(getattr(scene.body_params, field))
                if not np.allclose(v[islands[ii]], v[islands[0]]):
                    raise NotIslandizable(
                        f"island {ii} body param '{field}' differs")

    # ---- build the representative sub-scene from island 0 ----------------
    cols0 = col_lists[0]
    cmap0 = local_cols(0)
    m0 = g2l[0]

    def body_slice(arr):
        a = _np(arr)
        return jnp.asarray(np.concatenate([a[islands[0]], a[nb:nb + 1]]))

    bp = BodyParams(
        inv_mass=body_slice(scene.body_params.inv_mass),
        inv_inertia=body_slice(scene.body_params.inv_inertia),
        local_cog=body_slice(scene.body_params.local_cog),
        gravity_factor=body_slice(scene.body_params.gravity_factor),
        linear_damping=body_slice(scene.body_params.linear_damping),
        angular_damping=body_slice(scene.body_params.angular_damping))

    body_remap = np.array([m0.get(int(b), nbl) for b in col_body[cols0]],
                          np.int32)
    cols = Colliders(
        ctype=jnp.asarray(ctype[cols0]),
        a=jnp.asarray(_np(scene.colliders.a)[cols0]),
        b=jnp.asarray(_np(scene.colliders.b)[cols0]),
        r=jnp.asarray(_np(scene.colliders.r)[cols0]),
        rot=jnp.asarray(_np(scene.colliders.rot)[cols0]),
        friction=jnp.asarray(_np(scene.colliders.friction)[cols0]),
        restitution=jnp.asarray(_np(scene.colliders.restitution)[cols0]),
        body=jnp.asarray(body_remap),
        owner_type=jnp.asarray(_np(scene.colliders.owner_type)[cols0]),
        owner_index=jnp.asarray(_np(scene.colliders.owner_index)[cols0]),
        hull_id=jnp.asarray(_np(scene.colliders.hull_id)[cols0]))

    groups = []
    for g in scene.pair_groups:
        p = _np(g.pairs)
        rows = [(cmap0[int(c0)], cmap0[int(c1)]) for c0, c1 in p
                if int(c0) in cmap0 and int(c1) in cmap0]
        if rows:
            groups.append(PairGroup(
                type_a=g.type_a, type_b=g.type_b,
                pairs=jnp.asarray(np.asarray(rows, np.int32)),
                max_narrow=len(rows), phase=g.phase))

    def joint_slice(name):
        j = getattr(scene, name)
        if j is None:
            return None, []
        keep = []
        for ji, (a, b) in enumerate(zip(_np(j.body_a), _np(j.body_b))):
            if int(a) in m0 and int(b) in m0 and (
                    isl_of[int(a)] == 0 or isl_of[int(b)] == 0):
                keep.append(ji)
        if not keep:
            return None, []
        ba = np.array([m0[int(_np(j.body_a)[ji])] for ji in keep], np.int32)
        bb = np.array([m0[int(_np(j.body_b)[ji])] for ji in keep], np.int32)
        from dxk_tpu.scene.native import color_constraints
        colors, ncol = color_constraints(ba, bb, nbl)
        kw = dict(body_a=jnp.asarray(ba), body_b=jnp.asarray(bb),
                  color=jnp.asarray(colors), num_colors=int(max(ncol, 1)))
        for f in ("local_anchor_a", "local_anchor_b", "length",
                  "initial_inv_rotation_difference", "local_axis_a",
                  "local_axis_b", "local_tangent_a", "local_bitangent_a",
                  "local_tangent_b", "limit_min", "limit_max"):
            v = getattr(j, f)
            if v is not None:
                kw[f] = jnp.asarray(_np(v)[keep])
        return JointsOfType(**kw), keep

    jd, _ = joint_slice("distance")
    jb, _ = joint_slice("ball")
    jf, _ = joint_slice("fixed")
    jh, kh = joint_slice("hinge")
    jc, kc = joint_slice("cone_twist")
    js, ks = joint_slice("slider")

    def ctrl_map_for(name):
        """(I, Jl) global joint index per island-local joint (the joint
        signature check above guarantees equal counts and corresponding
        order across islands)."""
        j = getattr(scene, name)
        if j is None:
            return None
        rows = []
        for ii in range(n_isl):
            m = g2l[ii]
            keep = [ji for ji, (a, b2) in enumerate(
                        zip(_np(j.body_a), _np(j.body_b)))
                    if int(a) in m and int(b2) in m and (
                        isl_of[int(a)] == ii or isl_of[int(b2)] == ii)]
            rows.append(keep)
        if not rows[0]:
            return None
        return jnp.asarray(np.asarray(rows, np.int32))

    c = scene.default_controls
    sub_controls = None
    if c is not None:
        def tk(arr, keep):
            return jnp.asarray(_np(arr)[keep]) if keep else \
                jnp.asarray(_np(arr)[:0])
        sub_controls = MotorControls(
            hinge_motor_type=tk(c.hinge_motor_type, kh),
            hinge_target=tk(c.hinge_target, kh),
            hinge_max_torque=tk(c.hinge_max_torque, kh),
            ct_swing_motor_type=tk(c.ct_swing_motor_type, kc),
            ct_swing_target=tk(c.ct_swing_target, kc),
            ct_swing_axis_angle=tk(c.ct_swing_axis_angle, kc),
            ct_swing_max_torque=tk(c.ct_swing_max_torque, kc),
            ct_twist_motor_type=tk(c.ct_twist_motor_type, kc),
            ct_twist_target=tk(c.ct_twist_target, kc),
            ct_twist_max_torque=tk(c.ct_twist_max_torque, kc),
            slider_motor_type=tk(c.slider_motor_type, ks),
            slider_target=tk(c.slider_target, ks),
            slider_max_force=tk(c.slider_max_force, ks))

    init_map = islands[0] + [nb]
    sub = Scene(
        num_bodies=nbl,
        body_params=bp,
        colliders=cols,
        hulls=scene.hulls,
        pair_groups=tuple(groups),
        num_contact_phases=scene.num_contact_phases,
        broadphase_k=0,
        distance=jd, ball=jb, fixed=jf, hinge=jh, cone_twist=jc, slider=js,
        default_controls=sub_controls,
        global_ff_force=scene.global_ff_force,
        ff_forces=scene.ff_forces,
        init_pos=jnp.asarray(_np(scene.init_pos)[init_map]),
        init_rot=jnp.asarray(_np(scene.init_rot)[init_map]))

    body_map = jnp.asarray(np.asarray(islands, np.int32))
    return IslandMap(sub_scene=sub, body_map=body_map, num_islands=n_isl,
                     hinge_ctrl_map=ctrl_map_for("hinge"),
                     ct_ctrl_map=ctrl_map_for("cone_twist"),
                     slider_ctrl_map=ctrl_map_for("slider"))
