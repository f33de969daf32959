"""PBD grid cloth — batched version of cloth_component::simulate
(/root/reference/src/physics/cloth.cpp:137-318): Verlet-style integration,
then velocity- / position- (XPBD-like) / drift-solve passes over distance
constraints, then 1/(1+dt*damping) damping. Wind force is per-triangle
(cloth.cpp:137-172).

The reference iterates constraints sequentially (Gauss-Seidel on positions);
constraint counts per cloth are small (~6 per particle), so a `lax.scan`
keeps the exact semantics and vmaps across envs. A Jacobi variant can be
added for giant cloths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

from dxk_tpu.core.maths import (cross, dot, normalize, quat_conj,
                                quat_rotate, squared_length)
from dxk_tpu.scene.scene import ClothParams, ClothState

GRAVITY = -9.81


def _particle_collider_sdf(w, hulls, p):
    """Signed distance + outward unit normal from every collider to every
    particle. p: (P, 3); returns sd (C, P) and n (C, P, 3).

    Exact SDFs for sphere/capsule/cylinder/box; hulls use the max over
    face planes (exact inside and near faces, an underestimate in edge/
    vertex Voronoi regions — conservative for a thin contact shell)."""
    pe = p[None, :, :]                           # (1, P, 3)
    a = w.a[:, None, :]                          # (C, 1, 3)
    b = w.b[:, None, :]
    r = w.r[:, None]
    q = w.rot[:, None, :]
    ct = np.asarray(w.ctype)[:, None]            # static per scene

    eps = 1e-12
    # w.b is a world segment endpoint ONLY for capsules/cylinders
    # (world_colliders keeps half-extents for boxes, zeros for spheres)
    is_seg = np.isin(np.asarray(w.ctype), (1, 2))[:, None]
    b_seg = jnp.where(is_seg[..., None], b, a)
    ab = b_seg - a
    ab_sq = jnp.maximum(jnp.sum(ab * ab, -1), eps)
    t01 = jnp.clip(jnp.sum((pe - a) * ab, -1) / ab_sq, 0.0, 1.0)
    seg = a + ab * t01[..., None]
    d_seg = pe - seg
    dist_seg = jnp.sqrt(jnp.maximum(jnp.sum(d_seg * d_seg, -1), eps))
    sd_sphcap = dist_seg - r
    n_sphcap = d_seg / dist_seg[..., None]

    # cylinder: radial/axial SDF (flat caps)
    length = jnp.sqrt(ab_sq)
    u = ab / length[..., None]
    t_raw = jnp.sum((pe - a) * u, -1)
    radial = (pe - a) - u * t_raw[..., None]
    rd = jnp.sqrt(jnp.maximum(jnp.sum(radial * radial, -1), eps))
    dxx = rd - r                                  # radial excess
    dyy = jnp.maximum(-t_raw, t_raw - length)     # axial excess
    out_x = jnp.maximum(dxx, 0.0)
    out_y = jnp.maximum(dyy, 0.0)
    sd_cyl = (jnp.minimum(jnp.maximum(dxx, dyy), 0.0)
              + jnp.sqrt(out_x * out_x + out_y * out_y))
    rad_dir = radial / rd[..., None]
    cap_dir = u * jnp.where(t_raw > 0.5 * length, 1.0, -1.0)[..., None]
    n_out = (rad_dir * out_x[..., None] + cap_dir * out_y[..., None])
    n_out = n_out / jnp.sqrt(jnp.maximum(
        jnp.sum(n_out * n_out, -1, keepdims=True), eps))
    n_in = jnp.where((dxx > dyy)[..., None], rad_dir, cap_dir)
    n_cyl = jnp.where((sd_cyl > 0.0)[..., None], n_out, n_in)

    # box: local-frame SDF (b = half extents)
    pl = quat_rotate(quat_conj(q), pe - a)
    qv = jnp.abs(pl) - b
    m = jnp.maximum(qv, 0.0)
    od = jnp.sqrt(jnp.maximum(jnp.sum(m * m, -1), eps))
    mi = jnp.minimum(jnp.max(qv, -1), 0.0)
    sd_box = jnp.where(jnp.all(qv <= 0.0, -1), mi, od)
    sgn = jnp.where(pl >= 0.0, 1.0, -1.0)
    face = (qv >= jnp.max(qv, -1, keepdims=True) - 1e-9).astype(pl.dtype)
    nl = jnp.where((sd_box > 0.0)[..., None], m * sgn / od[..., None],
                   normalize(face * sgn + 1e-30))
    n_box = quat_rotate(q, nl)

    sd = jnp.where(ct <= 1, sd_sphcap,
                   jnp.where(ct == 2, sd_cyl, sd_box))
    n = jnp.where((ct <= 1)[..., None], n_sphcap,
                  jnp.where((ct == 2)[..., None], n_cyl, n_box))

    if hulls is not None and (np.asarray(w.ctype) == 4).any():
        hid = np.maximum(np.asarray(w.hull_id), 0)
        fn = hulls.face_normals[hid][:, None]    # (C, 1, F, 3)
        fo = hulls.face_offsets[hid][:, None]    # (C, 1, F)
        fm = hulls.face_mask[hid][:, None]
        sd_f = jnp.sum(fn * pl[:, :, None, :], -1) + fo
        sd_f = jnp.where(fm, sd_f, -3.4e38)
        sd_hull = jnp.max(sd_f, -1)
        best = (sd_f >= sd_hull[..., None] - 1e-9).astype(pl.dtype)
        n_hull = quat_rotate(q, normalize(
            jnp.sum(fn * best[..., None], -2) + 1e-30))
        sd = jnp.where(ct == 4, sd_hull, sd)
        n = jnp.where((ct == 4)[..., None], n_hull, n)
    return sd, n


def collide_particles(params: ClothParams, world, hulls, heightfield,
                      pos, vel, bodies=None, colbody=None):
    """Cloth-vs-rigid collision: project penetrating particles out of
    every collider (deepest first) and the heightfield, and remove the
    approaching normal velocity. The reference has NO cloth-rigid
    collision (cloth.cpp never queries colliders) — this exceeds parity.

    One-way by default (rigid bodies do not feel the cloth). With
    `bodies` (SolverBodies) and `colbody` (collider -> body index map)
    given, the coupling is TWO-WAY at the velocity level: the normal
    velocity removed is measured RELATIVE to the body surface point, and
    the momentum each particle gains is applied as an opposite impulse on
    the body at the contact point. Returns (pos, vel) or
    (pos, vel, jsum (N+1, 3), tsum (N+1, 3)) with per-body impulse /
    torque-impulse sums (dummy/static rows have inv_mass 0 and absorb
    heightfield and static-collider contacts harmlessly)."""
    th = params.thickness
    free = params.inv_masses > 0.0

    normal = jnp.zeros_like(pos)
    depth = jnp.zeros(pos.shape[0], pos.dtype)
    ci = jnp.zeros(pos.shape[0], jnp.int32)
    if world is not None and world.a.shape[0] > 0:
        sd, n = _particle_collider_sdf(world, hulls, pos)
        dep = th[None, :] - sd                    # (C, P)
        ci = jnp.argmax(dep, axis=0)
        depth = jnp.max(dep, axis=0)
        normal = jnp.take_along_axis(n, ci[None, :, None], axis=0)[0]

    use_h = jnp.zeros(pos.shape[0], bool)
    if heightfield is not None:
        from dxk_tpu.ops.heightmap import height_at
        hdep = th - (pos[:, 1] - height_at(heightfield, pos[:, 0], pos[:, 2]))
        up = jnp.zeros_like(pos).at[:, 1].set(1.0)
        use_h = hdep > depth
        depth = jnp.where(use_h, hdep, depth)
        normal = jnp.where(use_h[:, None], up, normal)

    hit = (depth > 0.0) & free
    push = jnp.where(hit[:, None], normal * depth[:, None], 0.0)
    pos = pos + push

    if bodies is not None:
        nb_dummy = bodies.v.shape[0] - 1
        bi = jnp.take(jnp.asarray(colbody), ci) if colbody is not None \
            else jnp.full(pos.shape[0], nb_dummy, jnp.int32)
        bi = jnp.where(use_h, nb_dummy, bi)
        r = pos - bodies.pos_cog[bi]
        vb = bodies.v[bi] + cross(bodies.w[bi], r)
    else:
        vb = 0.0

    vn = jnp.sum(normal * (vel - vb), -1)
    rem = jnp.where(hit, jnp.minimum(vn, 0.0), 0.0)
    vel = vel - normal * rem[:, None]

    if bodies is None:
        return pos, vel

    # impulse on the particle = m_p * dv; opposite on the body at `pos`
    m_p = jnp.where(free, 1.0 / jnp.maximum(params.inv_masses, 1e-12), 0.0)
    j_body = (m_p * rem)[:, None] * normal        # = -J_particle
    jsum = jnp.zeros_like(bodies.v).at[bi].add(j_body)
    tsum = jnp.zeros_like(bodies.w).at[bi].add(cross(r, j_body))
    return pos, vel, jsum, tsum


def apply_wind_force(params: ClothParams, state: ClothState, force):
    """applyWindForce (cloth.cpp:137-172): each grid quad's two triangles
    push 1/3 of the normal-projected force onto their vertices."""
    tris = params.triangles
    p = state.positions
    a, b, c = p[tris[:, 0]], p[tris[:, 1]], p[tris[:, 2]]
    normal = cross(b - a, c - a)
    f = normal * dot(normalize(normal + 1e-30), force)[:, None] * (1.0 / 3.0)
    forces = state.forces
    for k in range(3):
        forces = forces.at[tris[:, k]].add(f)
    return state.replace(forces=forces)


_COLOR_CACHE = {}


def _constraint_colors(params):
    """Build-time greedy edge coloring of the distance-constraint graph:
    constraints in one color share no particle, so a whole color solves
    in ONE vectorized update (conflict-free Gauss-Seidel — the same
    trade the rigid solver's 'colored' mode makes, ops/solver.py). A
    12x12 grid cloth (structural+shear+bend) colors into ~12 groups.

    Returns a list of np.int32 index arrays into params.constraints.
    Cached per constraint array (scene-constant)."""
    cons = np.asarray(params.constraints)
    key = (cons.shape[0], cons.tobytes()[:64].__hash__())
    hit = _COLOR_CACHE.get(key)
    if hit is not None and np.array_equal(hit[0], cons):
        return hit[1]
    used = []          # per color: set of particles
    colors = []        # per color: list of constraint indices
    for i, (a, b) in enumerate(cons):
        for c in range(len(colors)):
            if a not in used[c] and b not in used[c]:
                colors[c].append(i)
                used[c].update((int(a), int(b)))
                break
        else:
            colors.append([i])
            used.append({int(a), int(b)})
    out = [np.asarray(c, np.int32) for c in colors]
    _COLOR_CACHE[key] = (cons, out)
    return out


def _colored_ops(params, idx):
    """Static one-hot gather/incidence matrices for one color: OH (2M, P)
    selects (a-endpoints; b-endpoints); applying OH.T places per-endpoint
    corrections back (exact — endpoints within a color are unique).
    Matmuls with these constants are how indexed access stays on the MXU
    instead of lowering to per-element gathers/scatters (CLAUDE.md
    tpu_gather rule; table here is P<=few-hundred particles)."""
    cons = np.asarray(params.constraints)[idx]
    P = int(params.inv_masses.shape[0])
    M = len(idx)
    oh = np.zeros((2 * M, P), np.float32)
    oh[np.arange(M), cons[:, 0]] = 1.0
    oh[np.arange(M, 2 * M), cons[:, 1]] = 1.0
    return jnp.asarray(oh)


def _solve_positions_colored(params, positions):
    """solvePositions with conflict-free color batching: same per-
    constraint math as _solve_positions_scan, Gauss-Seidel ACROSS colors,
    parallel within one (order-divergent from the reference's sweep but
    the same fixed point — like the rigid 'colored' solver mode).
    Correction deltas ride DEFAULT-precision matmuls (bf16-rounded once
    per color; positions themselves stay f32)."""
    inv_mass = params.inv_masses
    for idx in _constraint_colors(params):
        oh = _colored_ops(params, idx)
        M = len(idx)
        rest_sq = params.rest_lengths[idx] ** 2
        ims = params.inv_mass_sums[idx]
        ends = jnp.einsum("mp,pc->mc", oh, positions)     # (2M, 3)
        delta = ends[M:] - ends[:M]
        ln = jnp.sum(delta * delta, -1)
        active = (ims > 0.0) & (rest_sq + ln > 1e-5)
        k = jnp.where(active, (rest_sq - ln)
                      / jnp.maximum(ims * (rest_sq + ln), 1e-30), 0.0)
        wa = inv_mass[params.constraints[idx, 0]]
        wb = inv_mass[params.constraints[idx, 1]]
        corr = jnp.concatenate([-delta * (k * wa)[:, None],
                                delta * (k * wb)[:, None]])
        positions = positions + jnp.einsum("mp,mc->pc", oh, corr)
    return positions


def _solve_velocities_colored(params, velocities, gradients,
                              inv_scaled_grad_sq):
    """solveVelocities, color-batched (see _solve_positions_colored)."""
    inv_mass = params.inv_masses
    for idx in _constraint_colors(params):
        oh = _colored_ops(params, idx)
        M = len(idx)
        g = gradients[idx]
        ends = jnp.einsum("mp,pc->mc", oh, velocities)
        j = -jnp.sum(g * (ends[:M] - ends[M:]), -1) * inv_scaled_grad_sq[idx]
        wa = inv_mass[params.constraints[idx, 0]]
        wb = inv_mass[params.constraints[idx, 1]]
        corr = jnp.concatenate([g * (j * wa)[:, None],
                                -g * (j * wb)[:, None]])
        velocities = velocities + jnp.einsum("mp,mc->pc", oh, corr)
    return velocities


def _solve_positions_scan(params, positions):
    """solvePositions (cloth.cpp:300-318), sequential like the reference."""
    cons = params.constraints
    rest_sq = params.rest_lengths ** 2
    inv_mass = params.inv_masses
    ims = params.inv_mass_sums

    def body(pos, i):
        ia, ib = cons[i, 0], cons[i, 1]
        delta = pos[ib] - pos[ia]
        ln = squared_length(delta)
        sq = rest_sq[i]
        active = (ims[i] > 0.0) & (sq + ln > 1e-5)
        k = jnp.where(active, (sq - ln) / jnp.maximum(ims[i] * (sq + ln), 1e-30), 0.0)
        pos = pos.at[ia].add(-delta * (k * inv_mass[ia]))
        pos = pos.at[ib].add(delta * (k * inv_mass[ib]))
        return pos, None

    positions, _ = jax.lax.scan(body, positions, jnp.arange(cons.shape[0]))
    return positions


def _solve_velocities_scan(params, velocities, gradients, inv_scaled_grad_sq):
    """solveVelocities (cloth.cpp:288-298)."""
    cons = params.constraints
    inv_mass = params.inv_masses

    def body(vel, i):
        ia, ib = cons[i, 0], cons[i, 1]
        g = gradients[i]
        j = -dot(g, vel[ia] - vel[ib]) * inv_scaled_grad_sq[i]
        vel = vel.at[ia].add(g * (j * inv_mass[ia]))
        vel = vel.at[ib].add(-g * (j * inv_mass[ib]))
        return vel, None

    velocities, _ = jax.lax.scan(body, velocities, jnp.arange(cons.shape[0]))
    return velocities


def cloth_step(params: ClothParams, state: ClothState, settings,
               wind_force, dt, world=None, hulls=None,
               heightfield=None, bodies=None, colbody=None):
    """simulate (cloth.cpp:180-286) + optional cloth-vs-rigid collision
    (particles with thickness > 0; see collide_particles).

    Returns (ClothState, impulses) where impulses is None, or — when
    `bodies`/`colbody` are given (two-way coupling) — a (jsum, tsum) pair
    of per-body impulse / torque-impulse sums the caller applies to the
    rigid velocities."""
    state = apply_wind_force(params, state, wind_force)

    inv_mass = params.inv_masses
    gravity_v = GRAVITY * dt * params.gravity_factor

    vel = state.velocities
    vel = vel.at[:, 1].add(jnp.where(inv_mass > 0.0, gravity_v, 0.0))
    vel = vel + state.forces * (inv_mass * dt)[:, None]
    prev = state.positions
    pos = prev + vel * dt

    inv_dt = jnp.where(dt > 1e-5, 1.0 / dt, 1.0)

    colored = getattr(settings, "cloth_solver_mode", "scan") == "colored"
    solve_pos = _solve_positions_colored if colored else _solve_positions_scan
    solve_vel = (_solve_velocities_colored if colored
                 else _solve_velocities_scan)

    if settings.num_cloth_velocity_iterations > 0:
        cons = params.constraints
        grad = prev[cons[:, 1]] - prev[cons[:, 0]]
        denom = squared_length(grad) * params.inv_mass_sums
        inv_sgsq = jnp.where(params.inv_mass_sums == 0.0, 0.0,
                             1.0 / jnp.maximum(denom, 1e-30))
        for _ in range(settings.num_cloth_velocity_iterations):
            vel = solve_vel(params, vel, grad, inv_sgsq)
        pos = prev + vel * dt

    if settings.num_cloth_position_iterations > 0:
        for _ in range(settings.num_cloth_position_iterations):
            pos = solve_pos(params, pos)
        vel = (pos - prev) * inv_dt

    if settings.num_cloth_drift_iterations > 0:
        drift_prev = pos
        for _ in range(settings.num_cloth_drift_iterations):
            pos = solve_pos(params, pos)
        vel = vel + (pos - drift_prev) * inv_dt

    impulses = None
    if (params.thickness is not None
            and float(np.asarray(params.thickness).max()) > 0.0
            and (world is not None or heightfield is not None)):
        out = collide_particles(params, world, hulls, heightfield,
                                pos, vel, bodies=bodies, colbody=colbody)
        if bodies is not None:
            pos, vel, jsum, tsum = out
            impulses = (jsum, tsum)
        else:
            pos, vel = out

    vel = vel * (1.0 / (1.0 + dt * params.damping))[:, None]
    return ClothState(positions=pos, prev_positions=prev, velocities=vel,
                      forces=jnp.zeros_like(state.forces)), impulses
