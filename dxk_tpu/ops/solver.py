"""Sequential-impulse velocity constraint solver.

TPU rebuild of the reference's PGS solver
(/root/reference/src/physics/constraints.cpp): 7 constraint types —
distance / ball / fixed / hinge / cone-twist / slider / collision — each with
a prep pass (effective masses, biases, limit & motor activation computed once
per step) and a per-iteration solve, run for `num_iterations` rounds in the
reference's fixed type order (constraints.cpp:3748-3772).

Two execution modes:

  - "scan": per-type `lax.scan` Gauss-Seidel — exactly the reference's scalar
    path semantics (sequential impulses over shared body velocities, same
    iteration order). Correctness / golden-trajectory mode. Across a vmapped
    env batch the scans vectorize, so this is also fast when per-env
    constraint counts are modest (articulated scenes).
  - "jacobi": within each type, all constraints compute impulses in parallel
    against the same body velocities; per-body deltas are gathered with
    segment-sums and scaled by 1/degree (mass-splitting / averaged Jacobi).
    The TPU analog of the reference's conflict-free 8-wide SIMD batching
    (scheduleConstraintsSIMD, constraints.cpp:51-184), scaled from 8 lanes to
    the whole constraint set. Needs ~2-3x the iterations of Gauss-Seidel for
    the same stiffness but has no sequential inner loop, which is what large
    single-scene benchmarks need.

Betas and thresholds are the reference's (constraints.cpp:9-17).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from dxk_tpu.core.maths import (cross, dot, get_tangents, length, noz,
                                quat_conj, quat_mul, quat_rotate, skew,
                                solve_2x2, solve_3x3, get_axis_rotation,
                                quat_from_axis_angle)
from dxk_tpu.ops.integrator import SolverBodies
from dxk_tpu.ops.tpu_gather import (gather_rows, onehot_gather,
                                    onehot_gather_1d, onehot_scatter_add)
from dxk_tpu.scene.scene import MotorControls

DISTANCE_BETA = 0.1
BALL_BETA = 0.1
SLIDER_BETA = 0.1
HINGE_ROTATION_BETA = 0.3
HINGE_LIMIT_BETA = 0.1
TWIST_LIMIT_BETA = 0.1
SLIDER_LIMIT_BETA = 0.1
DT_THRESHOLD = 1e-5

from dxk_tpu.core import fastmath as fm  # noqa: E402 (kernel-shared trig)


def _get_axis_rotation_fm(q):
    """maths.get_axis_rotation with fastmath.acos (kernel-shared)."""
    from dxk_tpu.core.maths import squared_length
    v = q[..., :3]
    sq = squared_length(v)
    ok = sq > 0.0
    angle = jnp.where(ok, 2.0 * fm.acos(jnp.clip(q[..., 3], -1.0, 1.0)), 0.0)
    inv_len = jnp.where(ok, 1.0 / jnp.sqrt(jnp.where(ok, sq, 1.0)), 0.0)
    axis = jnp.where(ok[..., None], v * inv_len[..., None],
                     jnp.array([1.0, 0.0, 0.0], q.dtype))
    return axis, angle


def _inv_or_zero(x):
    return jnp.where(x != 0.0, 1.0 / jnp.where(x != 0.0, x, 1.0), 0.0)


def _mat_vec(m, v):
    return jnp.einsum("...ij,...j->...i", m, v)


def _point_inv_effective_mass(inv_ia, inv_ib, inv_ma, inv_mb, ra, rb):
    """skewA * invIA * skewA^T + skewB * invIB * skewB^T + I*(ma+mb)
    (constraints.cpp:487-492)."""
    sa = skew(ra)
    sb = skew(rb)
    m = (sa @ inv_ia @ jnp.swapaxes(sa, -1, -2)
         + sb @ inv_ib @ jnp.swapaxes(sb, -1, -2))
    eye = jnp.eye(3, dtype=ra.dtype)
    return m + eye * (inv_ma + inv_mb)[..., None, None]


# ===========================================================================
# Contacts (constraints.cpp:3307-3449)
#
# TPU layout: pair-major manifolds. A narrowphase pair contributes ONE solver
# row carrying its <=4 contact points; the points are solved sequentially
# within the row (the reference's in-order traversal of a pair's contacts),
# while body velocities are gathered/scattered once per pair instead of once
# per point — 4x less MXU gather traffic, and strictly better Gauss-Seidel
# behavior than treating the 4 points as independent (conflicting) rows.


@struct.dataclass
class ContactPrep:
    """Per-pair manifold prep. P pairs x up to 4 points. `phase_sizes` are
    static, contiguous slice sizes over the pair axis: pairs in different
    phases never share a dynamic body when the scene was built with
    contact phases (builder contact_phases=K), so a phased pass is
    conflict-free Gauss-Seidel; residual conflicts (hash collisions,
    heightfield blocks) are degree-averaged within the phase.

    Layout note: a component-major (comp, P) variant was tried and reverted
    — XLA's per-op overhead on the ~3x larger op graph cost far more than
    the lane-utilization win (908 eqns/pass, 16 s compiles, >100 ms/pass on
    CPU). Component-major layouts belong inside Pallas kernels
    (cm_narrowphase.py) where ops fuse for free."""

    body_a: jnp.ndarray        # (P,)
    body_b: jnp.ndarray        # (P,)
    inv_ma: jnp.ndarray        # (P,)
    inv_mb: jnp.ndarray        # (P,)
    rel_a: jnp.ndarray         # (P, 4, 3)
    rel_b: jnp.ndarray         # (P, 4, 3)
    normal: jnp.ndarray        # (P, 4, 3)
    tangent: jnp.ndarray       # (P, 4, 3)
    eff_mass_n: jnp.ndarray    # (P, 4)
    eff_mass_t: jnp.ndarray    # (P, 4)
    bias: jnp.ndarray          # (P, 4)
    friction: jnp.ndarray      # (P, 4)
    n_to_wa: jnp.ndarray       # (P, 4, 3) normalImpulseToAngularVelocityA
    n_to_wb: jnp.ndarray
    t_to_wa: jnp.ndarray
    t_to_wb: jnp.ndarray
    phase_sizes: tuple = struct.field(pytree_node=False, default=())


def prep_contacts(bodies: SolverBodies, body_a, body_b, point, normal, depth,
                  friction, restitution, mask, dt,
                  phase_sizes=()) -> ContactPrep:
    """body_a/body_b/friction/restitution: (P,); point/normal: (P, 4, 3);
    depth/mask: (P, 4). Masked points get zero effective mass (zero
    impulses); fully dead pairs should already point at the dummy body so
    they don't inflate per-body degrees."""
    inv_dt = 1.0 / dt
    pa = gather_rows(bodies.pos_cog, body_a)
    pb = gather_rows(bodies.pos_cog, body_b)
    rel_a = point - pa[:, None, :]
    rel_b = point - pb[:, None, :]

    bva = gather_rows(bodies.v, body_a)[:, None, :]
    bwa = gather_rows(bodies.w, body_a)[:, None, :]
    bvb = gather_rows(bodies.v, body_b)[:, None, :]
    bwb = gather_rows(bodies.w, body_b)[:, None, :]
    va = bva + cross(bwa, rel_a)
    vb = bvb + cross(bwb, rel_b)
    rel_v = vb - va
    tangent = noz(rel_v - dot(normal, rel_v)[..., None] * normal)

    inv_ia = gather_rows(bodies.inv_inertia, body_a)[:, None]
    inv_ib = gather_rows(bodies.inv_inertia, body_b)[:, None]
    inv_ma = onehot_gather_1d(bodies.inv_mass, body_a)
    inv_mb = onehot_gather_1d(bodies.inv_mass, body_b)
    inv_m_sum = (inv_ma + inv_mb)[:, None]

    cr_at = cross(rel_a, tangent)
    cr_bt = cross(rel_b, tangent)
    im_t = (inv_m_sum + dot(cr_at, _mat_vec(inv_ia, cr_at))
            + dot(cr_bt, _mat_vec(inv_ib, cr_bt)))
    eff_t = _inv_or_zero(im_t) * mask

    cr_an = cross(rel_a, normal)
    cr_bn = cross(rel_b, normal)
    im_n = (inv_m_sum + dot(cr_an, _mat_vec(inv_ia, cr_an))
            + dot(cr_bn, _mat_vec(inv_ib, cr_bn)))
    eff_n = _inv_or_zero(im_n) * mask

    # restitution + Baumgarte bias with slop (constraints.cpp:3355-3366)
    v_rel_n = dot(normal, rel_v)
    slop = -0.001
    active = (-depth < slop) & (v_rel_n < 0.0)
    bias = jnp.where(active, -restitution[:, None] * v_rel_n
                     - 0.1 * (-depth - slop) * inv_dt, 0.0)
    bias = jnp.where(dt > DT_THRESHOLD, bias, 0.0)

    return ContactPrep(
        body_a=body_a, body_b=body_b, inv_ma=inv_ma, inv_mb=inv_mb,
        rel_a=rel_a, rel_b=rel_b,
        normal=normal, tangent=tangent, eff_mass_n=eff_n, eff_mass_t=eff_t,
        bias=bias, friction=friction[:, None] * mask,
        n_to_wa=_mat_vec(inv_ia, cr_an), n_to_wb=_mat_vec(inv_ib, cr_bn),
        t_to_wa=_mat_vec(inv_ia, cr_at), t_to_wb=_mat_vec(inv_ib, cr_bt),
        phase_sizes=tuple(phase_sizes))


def _contact_solve_point(ck, inv_ma, inv_mb, va, wa, vb, wb, imp_n, imp_t):
    """One contact point: friction then normal (constraints.cpp:3404-3442).
    `ck` holds the point's fields with the point axis already selected."""
    # tangent
    av = va + cross(wa, ck.rel_a)
    bv = vb + cross(wb, ck.rel_b)
    vt = dot(bv - av, ck.tangent)
    lam = -ck.eff_mass_t * vt
    max_f = ck.friction * imp_n
    new_imp = jnp.clip(imp_t + lam, -max_f, max_f)
    lam = new_imp - imp_t
    imp_t = new_imp
    P = lam[..., None] * ck.tangent
    va = va - inv_ma[..., None] * P
    wa = wa - ck.t_to_wa * lam[..., None]
    vb = vb + inv_mb[..., None] * P
    wb = wb + ck.t_to_wb * lam[..., None]

    # normal
    av = va + cross(wa, ck.rel_a)
    bv = vb + cross(wb, ck.rel_b)
    vn = dot(bv - av, ck.normal)
    lam = -ck.eff_mass_n * (vn - ck.bias)
    new_imp = jnp.maximum(imp_n + lam, 0.0)
    lam = new_imp - imp_n
    imp_n = new_imp
    P = lam[..., None] * ck.normal
    va = va - inv_ma[..., None] * P
    wa = wa - ck.n_to_wa * lam[..., None]
    vb = vb + inv_mb[..., None] * P
    wb = wb + ck.n_to_wb * lam[..., None]
    return va, wa, vb, wb, imp_n, imp_t


class _PointView:
    """Point-k view over pair-major ContactPrep fields."""

    __slots__ = ("rel_a", "rel_b", "normal", "tangent", "eff_mass_n",
                 "eff_mass_t", "bias", "friction", "n_to_wa", "n_to_wb",
                 "t_to_wa", "t_to_wb")

    def __init__(self, c, k):
        for f in self.__slots__:
            self.__setattr__(f, getattr(c, f)[..., k, :]
                             if getattr(c, f).ndim > c.bias.ndim
                             else getattr(c, f)[..., k])


def _contact_solve_one(c, inv_ma, inv_mb, va, wa, vb, wb, imp_n, imp_t):
    """One pair: its <=4 points solved in order against the pair's gathered
    velocities (the reference's per-contact traversal, constraints.cpp:3404).
    imp_n/imp_t: (..., 4)."""
    imp_n_out = []
    imp_t_out = []
    for k in range(c.bias.shape[-1]):
        va, wa, vb, wb, ik_n, ik_t = _contact_solve_point(
            _PointView(c, k), inv_ma, inv_mb, va, wa, vb, wb,
            imp_n[..., k], imp_t[..., k])
        imp_n_out.append(ik_n)
        imp_t_out.append(ik_t)
    return (va, wa, vb, wb, jnp.stack(imp_n_out, -1),
            jnp.stack(imp_t_out, -1))


# ===========================================================================
# Distance (constraints.cpp:189-264)


@struct.dataclass
class DistancePrep:
    body_a: jnp.ndarray
    body_b: jnp.ndarray
    rel_a: jnp.ndarray
    rel_b: jnp.ndarray
    u: jnp.ndarray
    bias: jnp.ndarray
    eff_mass: jnp.ndarray
    to_wa: jnp.ndarray
    to_wb: jnp.ndarray
    color: jnp.ndarray = None
    num_colors: int = struct.field(pytree_node=False, default=1)


def prep_distance(bodies: SolverBodies, j, dt) -> DistancePrep:
    inv_dt = 1.0 / dt
    a, b = j.body_a, j.body_b
    rot_ga = gather_rows(bodies.rot, a)
    rot_gb = gather_rows(bodies.rot, b)
    rel_a = quat_rotate(rot_ga, j.local_anchor_a - gather_rows(bodies.local_cog, a))
    rel_b = quat_rotate(rot_gb, j.local_anchor_b - gather_rows(bodies.local_cog, b))
    ga = gather_rows(bodies.pos_cog, a) + rel_a
    gb = gather_rows(bodies.pos_cog, b) + rel_b
    u = gb - ga
    l = length(u)
    u = jnp.where((l > 0.001)[..., None], u / jnp.maximum(l, 1e-12)[..., None], 0.0)

    cr_a = cross(rel_a, u)
    cr_b = cross(rel_b, u)
    inv_ia = gather_rows(bodies.inv_inertia, a)
    inv_ib = gather_rows(bodies.inv_inertia, b)
    im = (onehot_gather_1d(bodies.inv_mass, a) + dot(cr_a, _mat_vec(inv_ia, cr_a))
          + onehot_gather_1d(bodies.inv_mass, b) + dot(cr_b, _mat_vec(inv_ib, cr_b)))
    bias = jnp.where(dt > DT_THRESHOLD, (l - j.length) * (DISTANCE_BETA * inv_dt), 0.0)
    # DELIBERATE DEVIATION from the reference: both its scalar and SIMD
    # distance paths compute impulseToAngularVelocity as
    # invInertia * cross(relAnchor, cross(relAnchor, u))
    # (constraints.cpp:232-233 and 367-368) — a double cross. The correct
    # torque arm for an impulse P = lambda*u is invInertia * (relAnchor x u),
    # the same form the reference itself uses everywhere else (e.g. contacts,
    # constraints.cpp:3369-3372). The double cross points the angular
    # response off-axis, pumps energy, and makes any CHAIN of distance
    # constraints explode (single joints merely orbit oddly — the reference's
    # demos never chain them, so it goes unseen there). We use the correct
    # arm; see tests/test_fidelity.py chain stability oracles.
    return DistancePrep(
        body_a=a, body_b=b, color=j.color, num_colors=j.num_colors, rel_a=rel_a, rel_b=rel_b, u=u, bias=bias,
        eff_mass=_inv_or_zero(im),
        to_wa=_mat_vec(inv_ia, cr_a),
        to_wb=_mat_vec(inv_ib, cr_b))


def _distance_solve_one(c, inv_ma, inv_mb, va, wa, vb, wb):
    av = va + cross(wa, c.rel_a)
    bv = vb + cross(wb, c.rel_b)
    cdot = dot(c.u, bv - av) + c.bias
    lam = -c.eff_mass * cdot
    P = lam[..., None] * c.u
    va = va - inv_ma[..., None] * P
    wa = wa - c.to_wa * lam[..., None]
    vb = vb + inv_mb[..., None] * P
    wb = wb + c.to_wb * lam[..., None]
    return va, wa, vb, wb


# ===========================================================================
# Ball (constraints.cpp:460-528)


@struct.dataclass
class BallPrep:
    body_a: jnp.ndarray
    body_b: jnp.ndarray
    rel_a: jnp.ndarray
    rel_b: jnp.ndarray
    bias: jnp.ndarray
    inv_eff_mass: jnp.ndarray
    color: jnp.ndarray = None
    num_colors: int = struct.field(pytree_node=False, default=1)


def prep_ball(bodies: SolverBodies, j, dt) -> BallPrep:
    inv_dt = 1.0 / dt
    a, b = j.body_a, j.body_b
    rot_ga = gather_rows(bodies.rot, a)
    rot_gb = gather_rows(bodies.rot, b)
    rel_a = quat_rotate(rot_ga, j.local_anchor_a - gather_rows(bodies.local_cog, a))
    rel_b = quat_rotate(rot_gb, j.local_anchor_b - gather_rows(bodies.local_cog, b))
    ga = gather_rows(bodies.pos_cog, a) + rel_a
    gb = gather_rows(bodies.pos_cog, b) + rel_b
    m = _point_inv_effective_mass(gather_rows(bodies.inv_inertia, a), gather_rows(bodies.inv_inertia, b),
                                  onehot_gather_1d(bodies.inv_mass, a), onehot_gather_1d(bodies.inv_mass, b),
                                  rel_a, rel_b)
    bias = jnp.where(dt > DT_THRESHOLD, (gb - ga) * (BALL_BETA * inv_dt), 0.0)
    return BallPrep(body_a=a, body_b=b, color=j.color, num_colors=j.num_colors, rel_a=rel_a, rel_b=rel_b,
                    bias=bias, inv_eff_mass=m)


def _ball_solve_one(c, inv_ma, inv_mb, inv_ia, inv_ib, va, wa, vb, wb):
    av = va + cross(wa, c.rel_a)
    bv = vb + cross(wb, c.rel_b)
    cdot = bv - av + c.bias
    P = solve_3x3(c.inv_eff_mass, -cdot)
    va = va - inv_ma[..., None] * P
    wa = wa - _mat_vec(inv_ia, cross(c.rel_a, P))
    vb = vb + inv_mb[..., None] * P
    wb = wb + _mat_vec(inv_ib, cross(c.rel_b, P))
    return va, wa, vb, wb


# ===========================================================================
# Fixed (constraints.cpp:736-823)


@struct.dataclass
class FixedPrep:
    body_a: jnp.ndarray
    body_b: jnp.ndarray
    rel_a: jnp.ndarray
    rel_b: jnp.ndarray
    translation_bias: jnp.ndarray
    inv_eff_trans_mass: jnp.ndarray
    rotation_bias: jnp.ndarray
    inv_eff_rot_mass: jnp.ndarray
    color: jnp.ndarray = None
    num_colors: int = struct.field(pytree_node=False, default=1)


def prep_fixed(bodies: SolverBodies, j, dt) -> FixedPrep:
    inv_dt = 1.0 / dt
    a, b = j.body_a, j.body_b
    rot_a = gather_rows(bodies.rot, a)
    rot_b = gather_rows(bodies.rot, b)
    rel_a = quat_rotate(rot_a, j.local_anchor_a - gather_rows(bodies.local_cog, a))
    rel_b = quat_rotate(rot_b, j.local_anchor_b - gather_rows(bodies.local_cog, b))
    ga = gather_rows(bodies.pos_cog, a) + rel_a
    gb = gather_rows(bodies.pos_cog, b) + rel_b
    inv_ia = gather_rows(bodies.inv_inertia, a)
    inv_ib = gather_rows(bodies.inv_inertia, b)
    mt = _point_inv_effective_mass(inv_ia, inv_ib, onehot_gather_1d(bodies.inv_mass, a),
                                   onehot_gather_1d(bodies.inv_mass, b), rel_a, rel_b)
    mr = inv_ia + inv_ib

    t_bias = jnp.where(dt > DT_THRESHOLD, (gb - ga) * (BALL_BETA * inv_dt), 0.0)
    rot_err = quat_mul(quat_mul(rot_b, j.initial_inv_rotation_difference),
                       quat_conj(rot_a))
    r_bias = jnp.where(dt > DT_THRESHOLD,
                       rot_err[..., :3] * (SLIDER_BETA * inv_dt * 2.0), 0.0)
    return FixedPrep(body_a=a, body_b=b, color=j.color, num_colors=j.num_colors, rel_a=rel_a, rel_b=rel_b,
                     translation_bias=t_bias, inv_eff_trans_mass=mt,
                     rotation_bias=r_bias, inv_eff_rot_mass=mr)


def _fixed_solve_one(c, inv_ma, inv_mb, inv_ia, inv_ib, va, wa, vb, wb):
    # rotation part
    cdot = wb - wa
    lam = solve_3x3(c.inv_eff_rot_mass, -(cdot + c.rotation_bias))
    wa = wa - _mat_vec(inv_ia, lam)
    wb = wb + _mat_vec(inv_ib, lam)
    # position part
    av = va + cross(wa, c.rel_a)
    bv = vb + cross(wb, c.rel_b)
    cdot = bv - av + c.translation_bias
    P = solve_3x3(c.inv_eff_trans_mass, -cdot)
    va = va - inv_ma[..., None] * P
    wa = wa - _mat_vec(inv_ia, cross(c.rel_a, P))
    vb = vb + inv_mb[..., None] * P
    wb = wb + _mat_vec(inv_ib, cross(c.rel_b, P))
    return va, wa, vb, wb


# ===========================================================================
# Hinge (constraints.cpp:1079-1307)


@struct.dataclass
class HingePrep:
    body_a: jnp.ndarray
    body_b: jnp.ndarray
    rel_a: jnp.ndarray
    rel_b: jnp.ndarray
    translation_bias: jnp.ndarray
    inv_eff_trans_mass: jnp.ndarray
    rotation_bias: jnp.ndarray          # (J, 2)
    inv_eff_rot_mass: jnp.ndarray       # (J, 2, 2)
    bxa: jnp.ndarray
    cxa: jnp.ndarray
    axis: jnp.ndarray                   # global rotation axis
    eff_axial_mass: jnp.ndarray
    solve_limit: jnp.ndarray            # bool
    solve_motor: jnp.ndarray            # bool
    limit_sign: jnp.ndarray
    limit_bias: jnp.ndarray
    motor_velocity: jnp.ndarray
    max_motor_impulse: jnp.ndarray
    ml_to_wa: jnp.ndarray               # motorAndLimitImpulseToAngularVelocity
    ml_to_wb: jnp.ndarray
    color: jnp.ndarray = None
    num_colors: int = struct.field(pytree_node=False, default=1)


def prep_hinge(bodies: SolverBodies, j, controls: MotorControls, dt) -> HingePrep:
    inv_dt = 1.0 / dt
    a, b = j.body_a, j.body_b
    rot_a = gather_rows(bodies.rot, a)
    rot_b = gather_rows(bodies.rot, b)
    rel_a = quat_rotate(rot_a, j.local_anchor_a - gather_rows(bodies.local_cog, a))
    rel_b = quat_rotate(rot_b, j.local_anchor_b - gather_rows(bodies.local_cog, b))
    ga = gather_rows(bodies.pos_cog, a) + rel_a
    gb = gather_rows(bodies.pos_cog, b) + rel_b
    inv_ia = gather_rows(bodies.inv_inertia, a)
    inv_ib = gather_rows(bodies.inv_inertia, b)
    inv_ma = onehot_gather_1d(bodies.inv_mass, a)
    inv_mb = onehot_gather_1d(bodies.inv_mass, b)

    mt = _point_inv_effective_mass(inv_ia, inv_ib, inv_ma, inv_mb, rel_a, rel_b)
    t_bias = jnp.where(dt > DT_THRESHOLD, (gb - ga) * (BALL_BETA * inv_dt), 0.0)

    axis_a = quat_rotate(rot_a, j.local_axis_a)
    axis_b = quat_rotate(rot_b, j.local_axis_b)
    tan_b, bitan_b = get_tangents(axis_b)

    bxa = cross(tan_b, axis_a)
    cxa = cross(bitan_b, axis_a)
    ia_bxa = _mat_vec(inv_ia, bxa)
    ib_bxa = _mat_vec(inv_ib, bxa)
    ia_cxa = _mat_vec(inv_ia, cxa)
    ib_cxa = _mat_vec(inv_ib, cxa)
    m00 = dot(bxa, ia_bxa) + dot(bxa, ib_bxa)
    m01 = dot(bxa, ia_cxa) + dot(bxa, ib_cxa)
    m10 = dot(cxa, ia_bxa) + dot(cxa, ib_bxa)
    m11 = dot(cxa, ia_cxa) + dot(cxa, ib_cxa)
    mr = jnp.stack([jnp.stack([m00, m01], -1), jnp.stack([m10, m11], -1)], -2)

    r_bias = jnp.where(
        dt > DT_THRESHOLD,
        jnp.stack([dot(axis_a, tan_b), dot(axis_a, bitan_b)], -1)
        * (HINGE_ROTATION_BETA * inv_dt), 0.0)

    # limits & motor (constraints.cpp:1155-1205)
    compare_a = quat_rotate(quat_conj(rot_a),
                            quat_rotate(rot_b, j.local_tangent_b))
    # fastmath.atan2 (not jnp.arctan2): shared with the fused kernel's
    # in-kernel joint prep (Mosaic has no atan2 lowering) so both paths
    # compute identical angles — see core/fastmath.py
    angle = fm.atan2(dot(compare_a, j.local_bitangent_a),
                     dot(compare_a, j.local_tangent_a))
    min_violated = (j.limit_min <= 0.0) & (angle <= j.limit_min)
    max_violated = (j.limit_max >= 0.0) & (angle >= j.limit_max)
    max_torque = controls.hinge_max_torque
    solve_limit = min_violated | max_violated
    solve_motor = max_torque > 0.0

    im_ax = (dot(axis_a, _mat_vec(inv_ia, axis_a))
             + dot(axis_a, _mat_vec(inv_ib, axis_a)))
    eff_ax = _inv_or_zero(im_ax)
    limit_sign = jnp.where(min_violated, 1.0, -1.0)

    # position motor: reach target angle in one frame, clamped later
    # (constraints.cpp:1189-1197)
    min_l = jnp.where(j.limit_min <= 0.0, j.limit_min, -jnp.pi)
    max_l = jnp.where(j.limit_max >= 0.0, j.limit_max, jnp.pi)
    target = jnp.clip(controls.hinge_target, min_l, max_l)
    pos_motor_vel = jnp.where(dt > DT_THRESHOLD, (target - angle) * inv_dt, 0.0)
    motor_vel = jnp.where(controls.hinge_motor_type == 1, pos_motor_vel,
                          controls.hinge_target)

    d = jnp.where(min_violated, angle - j.limit_min, j.limit_max - angle)
    limit_bias = jnp.where(dt > DT_THRESHOLD, d * HINGE_LIMIT_BETA * inv_dt, 0.0)

    return HingePrep(
        body_a=a, body_b=b, color=j.color, num_colors=j.num_colors, rel_a=rel_a, rel_b=rel_b,
        translation_bias=t_bias, inv_eff_trans_mass=mt,
        rotation_bias=r_bias, inv_eff_rot_mass=mr, bxa=bxa, cxa=cxa,
        axis=axis_a, eff_axial_mass=eff_ax,
        solve_limit=solve_limit, solve_motor=solve_motor,
        limit_sign=limit_sign, limit_bias=limit_bias,
        motor_velocity=motor_vel,
        max_motor_impulse=jnp.maximum(max_torque, 0.0) * dt,
        ml_to_wa=_mat_vec(inv_ia, axis_a), ml_to_wb=_mat_vec(inv_ib, axis_a))


def _hinge_solve_one(c, inv_ma, inv_mb, inv_ia, inv_ib, va, wa, vb, wb,
                     limit_imp, motor_imp):
    """Motor -> limit -> rotation -> position (constraints.cpp:1215-1306)."""
    axis = c.axis
    # motor
    rel_w = dot(axis, wb) - dot(axis, wa)
    motor_cdot = rel_w - c.motor_velocity
    lam = -c.eff_axial_mass * motor_cdot
    new_imp = jnp.clip(motor_imp + lam, -c.max_motor_impulse, c.max_motor_impulse)
    lam = jnp.where(c.solve_motor, new_imp - motor_imp, 0.0)
    motor_imp = jnp.where(c.solve_motor, new_imp, motor_imp)
    wa = wa - c.ml_to_wa * lam[..., None]
    wb = wb + c.ml_to_wb * lam[..., None]

    # limit
    rel_w = c.limit_sign * (dot(axis, wb) - dot(axis, wa))
    limit_cdot = rel_w + c.limit_bias
    lam = -c.eff_axial_mass * limit_cdot
    imp = jnp.maximum(limit_imp + lam, 0.0)
    lam = jnp.where(c.solve_limit, imp - limit_imp, 0.0)
    limit_imp = jnp.where(c.solve_limit, imp, limit_imp)
    lam = lam * c.limit_sign
    wa = wa - c.ml_to_wa * lam[..., None]
    wb = wb + c.ml_to_wb * lam[..., None]

    # rotation (2D)
    dw = wb - wa
    cdot2 = jnp.stack([dot(c.bxa, dw), dot(c.cxa, dw)], -1)
    lam2 = solve_2x2(c.inv_eff_rot_mass, -(cdot2 + c.rotation_bias))
    rot_p = c.bxa * lam2[..., 0:1] + c.cxa * lam2[..., 1:2]
    wa = wa - _mat_vec(inv_ia, rot_p)
    wb = wb + _mat_vec(inv_ib, rot_p)

    # position (3D)
    av = va + cross(wa, c.rel_a)
    bv = vb + cross(wb, c.rel_b)
    cdot = bv - av + c.translation_bias
    P = solve_3x3(c.inv_eff_trans_mass, -cdot)
    va = va - inv_ma[..., None] * P
    wa = wa - _mat_vec(inv_ia, cross(c.rel_a, P))
    vb = vb + inv_mb[..., None] * P
    wb = wb + _mat_vec(inv_ib, cross(c.rel_b, P))
    return va, wa, vb, wb, limit_imp, motor_imp


# ===========================================================================
# Cone-twist (constraints.cpp:1782-2069)


@struct.dataclass
class ConeTwistPrep:
    body_a: jnp.ndarray
    body_b: jnp.ndarray
    rel_a: jnp.ndarray
    rel_b: jnp.ndarray
    bias: jnp.ndarray
    inv_eff_mass: jnp.ndarray
    # swing limit
    solve_swing_limit: jnp.ndarray
    swing_axis: jnp.ndarray
    eff_swing_limit_mass: jnp.ndarray
    swing_limit_bias: jnp.ndarray
    sl_to_wa: jnp.ndarray
    sl_to_wb: jnp.ndarray
    # twist limit
    solve_twist_limit: jnp.ndarray
    twist_axis: jnp.ndarray
    eff_twist_mass: jnp.ndarray
    twist_limit_sign: jnp.ndarray
    twist_limit_bias: jnp.ndarray
    tw_to_wa: jnp.ndarray
    tw_to_wb: jnp.ndarray
    # swing motor
    solve_swing_motor: jnp.ndarray
    swing_motor_axis: jnp.ndarray
    eff_swing_motor_mass: jnp.ndarray
    swing_motor_velocity: jnp.ndarray
    max_swing_motor_impulse: jnp.ndarray
    sm_to_wa: jnp.ndarray
    sm_to_wb: jnp.ndarray
    # twist motor
    solve_twist_motor: jnp.ndarray
    twist_motor_velocity: jnp.ndarray
    max_twist_motor_impulse: jnp.ndarray
    color: jnp.ndarray = None
    num_colors: int = struct.field(pytree_node=False, default=1)


def prep_cone_twist(bodies: SolverBodies, j, controls: MotorControls, dt) -> ConeTwistPrep:
    inv_dt = 1.0 / dt
    a, b = j.body_a, j.body_b
    rot_a = gather_rows(bodies.rot, a)
    rot_b = gather_rows(bodies.rot, b)
    rel_a = quat_rotate(rot_a, j.local_anchor_a - gather_rows(bodies.local_cog, a))
    rel_b = quat_rotate(rot_b, j.local_anchor_b - gather_rows(bodies.local_cog, b))
    ga = gather_rows(bodies.pos_cog, a) + rel_a
    gb = gather_rows(bodies.pos_cog, b) + rel_b
    inv_ia = gather_rows(bodies.inv_inertia, a)
    inv_ib = gather_rows(bodies.inv_inertia, b)

    m = _point_inv_effective_mass(inv_ia, inv_ib, onehot_gather_1d(bodies.inv_mass, a),
                                  onehot_gather_1d(bodies.inv_mass, b), rel_a, rel_b)
    bias = jnp.where(dt > DT_THRESHOLD, (gb - ga) * (BALL_BETA * inv_dt), 0.0)

    # relative rotation decomposition (constraints.cpp:1823-1846)
    from dxk_tpu.core.maths import rotate_from_to
    btoa = quat_mul(quat_conj(rot_a), rot_b)
    axis_compare = quat_rotate(btoa, j.local_axis_b)
    swing_rotation = rotate_from_to(j.local_axis_a, axis_compare)

    twist_tan_a = quat_rotate(swing_rotation, j.local_tangent_a)
    twist_bitan_a = quat_rotate(swing_rotation, j.local_bitangent_a)
    tan_compare = quat_rotate(btoa, j.local_tangent_b)
    twist_angle = fm.atan2(dot(tan_compare, twist_bitan_a),
                           dot(tan_compare, twist_tan_a))

    swing_axis_l, swing_angle = _get_axis_rotation_fm(swing_rotation)
    neg = swing_angle < 0.0
    swing_angle = jnp.where(neg, -swing_angle, swing_angle)
    swing_axis_l = jnp.where(neg[..., None], -swing_axis_l, swing_axis_l)

    swing_limit = j.limit_min   # (swingLimit stored in limit_min)
    twist_limit = j.limit_max   # (twistLimit stored in limit_max)

    # swing limit (1848-1865)
    solve_swing = (swing_limit >= 0.0) & (swing_angle >= swing_limit)
    swing_axis = quat_rotate(rot_a, swing_axis_l)
    im_sl = (dot(swing_axis, _mat_vec(inv_ia, swing_axis))
             + dot(swing_axis, _mat_vec(inv_ib, swing_axis)))
    eff_sl = _inv_or_zero(im_sl)
    swing_limit_bias = jnp.where(dt > DT_THRESHOLD,
                                 (swing_limit - swing_angle) * (HINGE_LIMIT_BETA * inv_dt), 0.0)

    # swing motor (1867-1905)
    solve_swing_motor = controls.ct_swing_max_torque > 0.0
    ax_x = jnp.cos(controls.ct_swing_axis_angle)
    ax_y = jnp.sin(controls.ct_swing_axis_angle)
    local_sm_axis = (ax_x[..., None] * j.local_tangent_a
                     + ax_y[..., None] * j.local_bitangent_a)
    # velocity motor path
    sm_axis_vel = quat_rotate(rot_a, local_sm_axis)
    sm_vel_v = controls.ct_swing_target
    # position motor path
    target_angle = jnp.where(swing_limit >= 0.0,
                             jnp.clip(controls.ct_swing_target, -swing_limit, swing_limit),
                             controls.ct_swing_target)
    local_target_dir = quat_rotate(quat_from_axis_angle(local_sm_axis, target_angle),
                                   j.local_axis_a)
    local_sm_axis_pos = noz(cross(axis_compare, local_target_dir))
    sm_axis_pos = quat_rotate(rot_a, local_sm_axis_pos)
    cos_angle = dot(local_target_dir, axis_compare)
    delta_angle = fm.acos(jnp.clip(cos_angle, 0.0, 1.0))
    sm_vel_p = jnp.where(dt > DT_THRESHOLD, delta_angle * inv_dt * 0.2, 0.0)

    is_pos = controls.ct_swing_motor_type == 1
    sm_axis = jnp.where(is_pos[..., None], sm_axis_pos, sm_axis_vel)
    sm_vel = jnp.where(is_pos, sm_vel_p, sm_vel_v)
    im_sm = (dot(sm_axis, _mat_vec(inv_ia, sm_axis))
             + dot(sm_axis, _mat_vec(inv_ib, sm_axis)))
    eff_sm = _inv_or_zero(im_sm)

    # twist limit & motor (1907-1946)
    min_tw = (twist_limit >= 0.0) & (twist_angle <= -twist_limit)
    max_tw = (twist_limit >= 0.0) & (twist_angle >= twist_limit)
    solve_twist_limit = min_tw | max_tw
    solve_twist_motor = controls.ct_twist_max_torque > 0.0
    twist_axis = quat_rotate(rot_a, j.local_axis_a)
    im_tw = (dot(twist_axis, _mat_vec(inv_ia, twist_axis))
             + dot(twist_axis, _mat_vec(inv_ib, twist_axis)))
    eff_tw = _inv_or_zero(im_tw)
    twist_limit_sign = jnp.where(min_tw, 1.0, -1.0)

    limit = jnp.where(twist_limit >= 0.0, twist_limit, jnp.pi)
    tw_target = jnp.clip(controls.ct_twist_target, -limit, limit)
    tw_vel_p = jnp.where(dt > DT_THRESHOLD, (tw_target - twist_angle) * inv_dt, 0.0)
    tw_vel = jnp.where(controls.ct_twist_motor_type == 1, tw_vel_p,
                       controls.ct_twist_target)

    d = jnp.where(min_tw, twist_limit + twist_angle, twist_limit - twist_angle)
    twist_limit_bias = jnp.where(dt > DT_THRESHOLD, d * TWIST_LIMIT_BETA * inv_dt, 0.0)

    return ConeTwistPrep(
        body_a=a, body_b=b, color=j.color, num_colors=j.num_colors, rel_a=rel_a, rel_b=rel_b, bias=bias, inv_eff_mass=m,
        solve_swing_limit=solve_swing, swing_axis=swing_axis,
        eff_swing_limit_mass=eff_sl, swing_limit_bias=swing_limit_bias,
        sl_to_wa=_mat_vec(inv_ia, swing_axis), sl_to_wb=_mat_vec(inv_ib, swing_axis),
        solve_twist_limit=solve_twist_limit, twist_axis=twist_axis,
        eff_twist_mass=eff_tw, twist_limit_sign=twist_limit_sign,
        twist_limit_bias=twist_limit_bias,
        tw_to_wa=_mat_vec(inv_ia, twist_axis), tw_to_wb=_mat_vec(inv_ib, twist_axis),
        solve_swing_motor=solve_swing_motor, swing_motor_axis=sm_axis,
        eff_swing_motor_mass=eff_sm, swing_motor_velocity=sm_vel,
        max_swing_motor_impulse=jnp.maximum(controls.ct_swing_max_torque, 0.0) * dt,
        sm_to_wa=_mat_vec(inv_ia, sm_axis), sm_to_wb=_mat_vec(inv_ib, sm_axis),
        solve_twist_motor=solve_twist_motor, twist_motor_velocity=tw_vel,
        max_twist_motor_impulse=jnp.maximum(controls.ct_twist_max_torque, 0.0) * dt)


def _cone_twist_solve_one(c, inv_ma, inv_mb, inv_ia, inv_ib, va, wa, vb, wb,
                          swing_imp, twist_imp, sm_imp, tm_imp):
    """Twist motor -> swing motor -> twist limit -> swing limit -> position
    (constraints.cpp:1955-2068)."""
    # twist motor
    rel_w = dot(c.twist_axis, wb) - dot(c.twist_axis, wa)
    cdot = rel_w - c.twist_motor_velocity
    lam = -c.eff_twist_mass * cdot
    new_imp = jnp.clip(tm_imp + lam, -c.max_twist_motor_impulse,
                       c.max_twist_motor_impulse)
    lam = jnp.where(c.solve_twist_motor, new_imp - tm_imp, 0.0)
    tm_imp = jnp.where(c.solve_twist_motor, new_imp, tm_imp)
    wa = wa - c.tw_to_wa * lam[..., None]
    wb = wb + c.tw_to_wb * lam[..., None]

    # swing motor
    rel_w = dot(c.swing_motor_axis, wb) - dot(c.swing_motor_axis, wa)
    cdot = rel_w - c.swing_motor_velocity
    lam = -c.eff_swing_motor_mass * cdot
    new_imp = jnp.clip(sm_imp + lam, -c.max_swing_motor_impulse,
                       c.max_swing_motor_impulse)
    lam = jnp.where(c.solve_swing_motor, new_imp - sm_imp, 0.0)
    sm_imp = jnp.where(c.solve_swing_motor, new_imp, sm_imp)
    wa = wa - c.sm_to_wa * lam[..., None]
    wb = wb + c.sm_to_wb * lam[..., None]

    # twist limit
    rel_w = c.twist_limit_sign * (dot(c.twist_axis, wb) - dot(c.twist_axis, wa))
    cdot = rel_w + c.twist_limit_bias
    lam = -c.eff_twist_mass * cdot
    imp = jnp.maximum(twist_imp + lam, 0.0)
    lam = jnp.where(c.solve_twist_limit, imp - twist_imp, 0.0)
    twist_imp = jnp.where(c.solve_twist_limit, imp, twist_imp)
    lam = lam * c.twist_limit_sign
    wa = wa - c.tw_to_wa * lam[..., None]
    wb = wb + c.tw_to_wb * lam[..., None]

    # swing limit (note reversed signs: Cdot = aDotWA - aDotWB + bias,
    # wa += ..., wb -= ...; constraints.cpp:2035-2048)
    cdot = dot(c.swing_axis, wa) - dot(c.swing_axis, wb) + c.swing_limit_bias
    lam = -c.eff_swing_limit_mass * cdot
    imp = jnp.maximum(swing_imp + lam, 0.0)
    lam = jnp.where(c.solve_swing_limit, imp - swing_imp, 0.0)
    swing_imp = jnp.where(c.solve_swing_limit, imp, swing_imp)
    wa = wa + c.sl_to_wa * lam[..., None]
    wb = wb - c.sl_to_wb * lam[..., None]

    # position
    av = va + cross(wa, c.rel_a)
    bv = vb + cross(wb, c.rel_b)
    cdot = bv - av + c.bias
    P = solve_3x3(c.inv_eff_mass, -cdot)
    va = va - inv_ma[..., None] * P
    wa = wa - _mat_vec(inv_ia, cross(c.rel_a, P))
    vb = vb + inv_mb[..., None] * P
    wb = wb + _mat_vec(inv_ib, cross(c.rel_b, P))
    return va, wa, vb, wb, swing_imp, twist_imp, sm_imp, tm_imp


# ===========================================================================
# Slider (constraints.cpp:2638-2845)


@struct.dataclass
class SliderPrep:
    body_a: jnp.ndarray
    body_b: jnp.ndarray
    r_au_x_t: jnp.ndarray
    r_au_x_b: jnp.ndarray
    r_b_x_t: jnp.ndarray
    r_b_x_b: jnp.ndarray
    tangent: jnp.ndarray
    bitangent: jnp.ndarray
    inv_eff_trans_mass: jnp.ndarray   # (J, 2, 2)
    translation_bias: jnp.ndarray     # (J, 2)
    inv_eff_rot_mass: jnp.ndarray     # (J, 3, 3)
    rotation_bias: jnp.ndarray        # (J, 3)
    axis: jnp.ndarray
    solve_limit: jnp.ndarray
    eff_axial_mass: jnp.ndarray
    limit_bias: jnp.ndarray
    limit_sign: jnp.ndarray
    r_au_x_s: jnp.ndarray
    r_b_x_s: jnp.ndarray
    l_to_wa: jnp.ndarray
    l_to_wb: jnp.ndarray
    solve_motor: jnp.ndarray
    motor_velocity: jnp.ndarray
    max_motor_impulse: jnp.ndarray
    color: jnp.ndarray = None
    num_colors: int = struct.field(pytree_node=False, default=1)


def prep_slider(bodies: SolverBodies, j, controls: MotorControls, dt) -> SliderPrep:
    inv_dt = 1.0 / dt
    a, b = j.body_a, j.body_b
    rot_a = gather_rows(bodies.rot, a)
    rot_b = gather_rows(bodies.rot, b)
    rel_a = quat_rotate(rot_a, j.local_anchor_a - gather_rows(bodies.local_cog, a))
    rel_b = quat_rotate(rot_b, j.local_anchor_b - gather_rows(bodies.local_cog, b))
    ga = gather_rows(bodies.pos_cog, a) + rel_a
    gb = gather_rows(bodies.pos_cog, b) + rel_b
    inv_ia = gather_rows(bodies.inv_inertia, a)
    inv_ib = gather_rows(bodies.inv_inertia, b)
    inv_ma = onehot_gather_1d(bodies.inv_mass, a)
    inv_mb = onehot_gather_1d(bodies.inv_mass, b)

    axis = quat_rotate(rot_a, j.local_axis_a)
    tangent, bitangent = get_tangents(axis)
    u = gb - ga
    r_au = rel_a + u
    rbxt = cross(rel_b, tangent)
    rbxb = cross(rel_b, bitangent)
    rauxt = cross(r_au, tangent)
    rauxb = cross(r_au, bitangent)

    ia_rauxt = _mat_vec(inv_ia, rauxt)
    ia_rauxb = _mat_vec(inv_ia, rauxb)
    ib_rbxt = _mat_vec(inv_ib, rbxt)
    ib_rbxb = _mat_vec(inv_ib, rbxb)
    inv_mass_sum = inv_ma + inv_mb

    m00 = dot(rauxt, ia_rauxt) + dot(rbxt, ib_rbxt) + inv_mass_sum
    m01 = dot(rauxt, ia_rauxb) + dot(rbxt, ib_rbxb)
    m10 = dot(rauxb, ia_rauxt) + dot(rbxb, ib_rbxt)
    m11 = dot(rauxb, ia_rauxb) + dot(rbxb, ib_rbxb) + inv_mass_sum
    mt = jnp.stack([jnp.stack([m00, m01], -1), jnp.stack([m10, m11], -1)], -2)

    mr = inv_ia + inv_ib
    tb = jnp.where(dt > DT_THRESHOLD,
                   jnp.stack([dot(u, tangent), dot(u, bitangent)], -1)
                   * (SLIDER_BETA * inv_dt), 0.0)
    rot_err = quat_mul(quat_mul(rot_b, j.initial_inv_rotation_difference),
                       quat_conj(rot_a))
    rb_bias = jnp.where(dt > DT_THRESHOLD,
                        rot_err[..., :3] * (SLIDER_BETA * inv_dt * 2.0), 0.0)

    # limit (2702-2733)
    dist = dot(u, axis)
    min_v = (j.limit_min <= 0.0) & (dist < j.limit_min)
    max_v = (j.limit_max >= 0.0) & (dist > j.limit_max)
    solve_limit = min_v | max_v
    rauxs = cross(r_au, axis)
    rbxs = cross(rel_b, axis)
    im_ax = (inv_mass_sum + dot(rauxs, _mat_vec(inv_ia, rauxs))
             + dot(rbxs, _mat_vec(inv_ib, rbxs)))
    eff_ax = _inv_or_zero(im_ax)
    limit_sign = jnp.where(min_v, 1.0, -1.0)
    err = jnp.where(min_v, dist - j.limit_min, j.limit_max - dist)
    limit_bias = jnp.where(dt > DT_THRESHOLD, err * (SLIDER_LIMIT_BETA * inv_dt), 0.0)

    # motor (2735-2752)
    solve_motor = controls.slider_max_force > 0.0
    min_l = jnp.where(j.limit_min <= 0.0, j.limit_min, -jnp.inf)
    max_l = jnp.where(j.limit_max >= 0.0, j.limit_max, jnp.inf)
    target = jnp.clip(controls.slider_target, min_l, max_l)
    vel_p = jnp.where(dt > DT_THRESHOLD, (target - dist) * inv_dt, 0.0)
    motor_vel = jnp.where(controls.slider_motor_type == 1, vel_p,
                          controls.slider_target)

    return SliderPrep(
        body_a=a, body_b=b, color=j.color, num_colors=j.num_colors, r_au_x_t=rauxt, r_au_x_b=rauxb,
        r_b_x_t=rbxt, r_b_x_b=rbxb, tangent=tangent, bitangent=bitangent,
        inv_eff_trans_mass=mt, translation_bias=tb,
        inv_eff_rot_mass=mr, rotation_bias=rb_bias, axis=axis,
        solve_limit=solve_limit, eff_axial_mass=eff_ax,
        limit_bias=limit_bias, limit_sign=limit_sign,
        r_au_x_s=rauxs, r_b_x_s=rbxs,
        l_to_wa=_mat_vec(inv_ia, rauxs), l_to_wb=_mat_vec(inv_ib, rbxs),
        solve_motor=solve_motor, motor_velocity=motor_vel,
        max_motor_impulse=jnp.maximum(controls.slider_max_force, 0.0) * dt)


def _slider_solve_one(c, inv_ma, inv_mb, inv_ia, inv_ib, va, wa, vb, wb,
                      limit_imp, motor_imp):
    """Motor -> limit -> rotation -> position (constraints.cpp:2761-2845)."""
    # motor (pure linear along axis)
    cdot = dot(vb, c.axis) - dot(va, c.axis) - c.motor_velocity
    mass = _inv_or_zero(inv_ma + inv_mb)
    lam = -mass * cdot
    new_imp = jnp.clip(motor_imp + lam, -c.max_motor_impulse, c.max_motor_impulse)
    lam = jnp.where(c.solve_motor, new_imp - motor_imp, 0.0)
    motor_imp = jnp.where(c.solve_motor, new_imp, motor_imp)
    P = lam[..., None] * c.axis
    va = va - inv_ma[..., None] * P
    vb = vb + inv_mb[..., None] * P

    # limit
    cdot = (dot(vb, c.axis) + dot(wb, c.r_b_x_s)
            - dot(va, c.axis) - dot(wa, c.r_au_x_s))
    lam = -c.eff_axial_mass * (c.limit_sign * cdot + c.limit_bias)
    imp = jnp.maximum(limit_imp + lam, 0.0)
    lam = jnp.where(c.solve_limit, imp - limit_imp, 0.0)
    limit_imp = jnp.where(c.solve_limit, imp, limit_imp)
    lam = lam * c.limit_sign
    P = lam[..., None] * c.axis
    va = va - inv_ma[..., None] * P
    wa = wa - c.l_to_wa * lam[..., None]
    vb = vb + inv_mb[..., None] * P
    wb = wb + c.l_to_wb * lam[..., None]

    # rotation (3D)
    cdot = wb - wa
    lam3 = solve_3x3(c.inv_eff_rot_mass, -(cdot + c.rotation_bias))
    wa = wa - _mat_vec(inv_ia, lam3)
    wb = wb + _mat_vec(inv_ib, lam3)

    # position (2D in the plane normal to the slider axis)
    cx = (dot(c.tangent, vb) + dot(c.r_b_x_t, wb)
          - dot(c.tangent, va) - dot(c.r_au_x_t, wa))
    cy = (dot(c.bitangent, vb) + dot(c.r_b_x_b, wb)
          - dot(c.bitangent, va) - dot(c.r_au_x_b, wa))
    cdot2 = jnp.stack([cx, cy], -1)
    lam2 = solve_2x2(c.inv_eff_trans_mass, -(cdot2 + c.translation_bias))
    tbv = c.tangent * lam2[..., 0:1] + c.bitangent * lam2[..., 1:2]
    va = va - inv_ma[..., None] * tbv
    wa = wa - _mat_vec(inv_ia, c.r_au_x_t * lam2[..., 0:1] + c.r_au_x_b * lam2[..., 1:2])
    vb = vb + inv_mb[..., None] * tbv
    wb = wb + _mat_vec(inv_ib, c.r_b_x_t * lam2[..., 0:1] + c.r_b_x_b * lam2[..., 1:2])
    return va, wa, vb, wb, limit_imp, motor_imp


# ===========================================================================
# Orchestration


@struct.dataclass
class Prepped:
    contacts: Optional[ContactPrep] = None
    distance: Optional[DistancePrep] = None
    ball: Optional[BallPrep] = None
    fixed: Optional[FixedPrep] = None
    hinge: Optional[HingePrep] = None
    cone_twist: Optional[ConeTwistPrep] = None
    slider: Optional[SliderPrep] = None


def _tree_slice(tree, i):
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def _gs_pass(prep, solve_fn, n_acc, v, w, inv_mass, inv_inertia, accs):
    """Gauss-Seidel over one constraint type via lax.scan (reference scalar
    path semantics)."""
    count = prep.body_a.shape[0]
    if count == 0:
        return v, w, accs

    def body(carry, i):
        v, w, accs = carry
        c = _tree_slice(prep, i)
        a, b = c.body_a, c.body_b
        args = [c, inv_mass[a], inv_mass[b]]
        if solve_fn is not _contact_solve_one and solve_fn is not _distance_solve_one:
            args += [inv_inertia[a], inv_inertia[b]]
        args += [v[a], w[a], v[b], w[b]]
        args += [acc[i] for acc in accs]
        out = solve_fn(*args)
        va, wa, vb, wb = out[:4]
        new_accs = tuple(acc.at[i].set(val) for acc, val in zip(accs, out[4:]))
        v = v.at[a].set(va).at[b].set(vb)
        w = w.at[a].set(wa).at[b].set(wb)
        return (v, w, new_accs), None

    (v, w, accs), _ = jax.lax.scan(body, (v, w, accs), jnp.arange(count))
    return v, w, accs


def _jacobi_pass(prep, solve_fn, v, w, inv_mass, inv_inertia, accs,
                 omega=1.0):
    """Averaged-Jacobi over one constraint type: all constraints solve in
    parallel against the same body velocities; per-body deltas are averaged
    by constraint degree (mass-splitting). The whole-array analog of the
    reference's conflict-free SIMD batches. Gathers/scatters run as one-hot
    matmuls on the MXU (segment-sum), not generic scatter ops."""
    count = prep.body_a.shape[0]
    if count == 0:
        return v, w, accs

    a, b = prep.body_a, prep.body_b
    args = [prep, onehot_gather_1d(inv_mass, a), onehot_gather_1d(inv_mass, b)]
    if solve_fn is not _distance_solve_one:
        args += [gather_rows(inv_inertia, a), gather_rows(inv_inertia, b)]
    va, wa = gather_rows(v, a), gather_rows(w, a)
    vb, wb = gather_rows(v, b), gather_rows(w, b)
    args += [va, wa, vb, wb]
    args += list(accs)
    out = solve_fn(*args)
    nva, nwa, nvb, nwb = out[:4]
    new_accs = tuple(out[4:])

    n = v.shape[0]
    ones = jnp.ones((count, 1), jnp.float32)
    deg = onehot_scatter_add(jnp.zeros((n, 1), jnp.float32), a, ones)
    deg = onehot_scatter_add(deg, b, ones)[:, 0]
    inv_deg = 1.0 / jnp.maximum(deg, 1.0)

    dv = onehot_scatter_add(jnp.zeros_like(v), a, nva - va)
    dv = onehot_scatter_add(dv, b, nvb - vb)
    dw = onehot_scatter_add(jnp.zeros_like(w), a, nwa - wa)
    dw = onehot_scatter_add(dw, b, nwb - wb)
    # omega: successive over-relaxation on the averaged update (omega > 1
    # partially compensates the 1/degree damping; tune via
    # PhysicsSettings.sor_omega)
    v = v + dv * (omega * inv_deg)[:, None]
    w = w + dw * (omega * inv_deg)[:, None]
    return v, w, new_accs


def _phase_slices(prep):
    """Static (start, size) slices over the pair axis; a single full slice
    when the scene was built without contact phases."""
    sizes = prep.phase_sizes or (prep.body_a.shape[0],)
    starts, s = [], 0
    for sz in sizes:
        starts.append(s)
        s += sz
    return tuple(zip(starts, sizes))


def contact_phase_inv_degrees(prep: ContactPrep, num_rows: int):
    """1/degree per body per phase slice, where degree counts the pairs of
    that slice touching the body. Constant across solver iterations —
    computed once per step and closed over by the iteration scan. Dead pairs
    must already point at the dummy row (which is never read back)."""
    out = []
    for st, size in _phase_slices(prep):
        a = jax.lax.dynamic_slice_in_dim(prep.body_a, st, size)
        b = jax.lax.dynamic_slice_in_dim(prep.body_b, st, size)
        ones = jnp.ones((size, 1), jnp.float32)
        deg = onehot_scatter_add(jnp.zeros((num_rows, 1), jnp.float32), a, ones)
        deg = onehot_scatter_add(deg, b, ones)[:, 0]
        out.append(1.0 / jnp.maximum(deg, 1.0))
    return tuple(out)


def _contact_phased_pass(prep: ContactPrep, v, w, accs, inv_deg_phases,
                         omega=1.0):
    """One solver iteration over pair-major contacts: static phase slices
    run sequentially (Gauss-Seidel across phases); within a slice all pairs
    solve in parallel against the same velocities and per-body deltas are
    degree-averaged. Scenes built with contact_phases=K hash pairs so that
    a slice is (near-)conflict-free: degrees are 1 and the pass is exact
    sequential-impulse Gauss-Seidel, with no sequential inner loop.

    Velocities are carried as one fused (N, 6) [v|w] array so each side costs
    one gather + one scatter matmul per slice."""
    imp_n, imp_t = accs                                   # (P, 4)
    vw = jnp.concatenate([v, w], axis=-1)
    for si, (st, size) in enumerate(_phase_slices(prep)):
        if size == 0:
            continue
        c = jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, st, size), prep)
        a, b = c.body_a, c.body_b
        ga = gather_rows(vw, a)
        gb = gather_rows(vw, b)
        va, wa = ga[:, :3], ga[:, 3:]
        vb, wb = gb[:, :3], gb[:, 3:]
        nva, nwa, nvb, nwb, ni, nt = _contact_solve_one(
            c, c.inv_ma, c.inv_mb, va, wa, vb, wb,
            jax.lax.dynamic_slice_in_dim(imp_n, st, size),
            jax.lax.dynamic_slice_in_dim(imp_t, st, size))
        imp_n = jax.lax.dynamic_update_slice_in_dim(imp_n, ni, st, 0)
        imp_t = jax.lax.dynamic_update_slice_in_dim(imp_t, nt, st, 0)
        da = jnp.concatenate([nva - va, nwa - wa], -1)
        db = jnp.concatenate([nvb - vb, nwb - wb], -1)
        delta = onehot_scatter_add(jnp.zeros_like(vw), a, da)
        delta = onehot_scatter_add(delta, b, db)
        vw = vw + delta * (omega * inv_deg_phases[si])[:, None]
    return vw[:, :3], vw[:, 3:], (imp_n, imp_t)


def _contact_gs_pass(prep: ContactPrep, v, w, accs):
    """Reference-exact sequential impulses over contacts: lax.scan over
    pairs in order, each pair's <=4 points solved in order — the scalar
    path of constraints.cpp:3381-3448."""
    count = prep.body_a.shape[0]
    if count == 0:
        return v, w, accs
    imp_n, imp_t = accs

    def body(carry, i):
        v, w, imp_n, imp_t = carry
        c = jax.tree_util.tree_map(lambda x: x[i], prep)
        a, b = c.body_a, c.body_b
        nva, nwa, nvb, nwb, ni, nt = _contact_solve_one(
            c, c.inv_ma, c.inv_mb, v[a], w[a], v[b], w[b],
            imp_n[i], imp_t[i])
        v = v.at[a].set(nva).at[b].set(nvb)
        w = w.at[a].set(nwa).at[b].set(nwb)
        return (v, w, imp_n.at[i].set(ni), imp_t.at[i].set(nt)), None

    (v, w, imp_n, imp_t), _ = jax.lax.scan(
        body, (v, w, imp_n, imp_t), jnp.arange(count))
    return v, w, (imp_n, imp_t)


def _colored_pass(prep, solve_fn, v, w, inv_mass, inv_inertia, accs):
    """Colored Gauss-Seidel over one joint type: constraints are grouped by
    a build-time conflict-free coloring (native color_constraints — the
    direct analog of scheduleConstraintsSIMD); colors run sequentially,
    constraints within a color in parallel with no body conflicts, giving
    exact Gauss-Seidel convergence without a sequential inner loop."""
    count = prep.body_a.shape[0]
    if count == 0:
        return v, w, accs

    a, b = prep.body_a, prep.body_b
    needs_inertia = (solve_fn is not _contact_solve_one
                     and solve_fn is not _distance_solve_one)
    for c in range(prep.num_colors):
        mask = prep.color == c
        args = [prep, onehot_gather_1d(inv_mass, a),
                onehot_gather_1d(inv_mass, b)]
        if needs_inertia:
            args += [gather_rows(inv_inertia, a), gather_rows(inv_inertia, b)]
        va, wa = gather_rows(v, a), gather_rows(w, a)
        vb, wb = gather_rows(v, b), gather_rows(w, b)
        args += [va, wa, vb, wb]
        args += list(accs)
        out = solve_fn(*args)
        nva, nwa, nvb, nwb = out[:4]
        mf = mask.astype(v.dtype)[:, None]
        dv = onehot_scatter_add(jnp.zeros_like(v), a, (nva - va) * mf)
        dv = onehot_scatter_add(dv, b, (nvb - vb) * mf)
        dw = onehot_scatter_add(jnp.zeros_like(w), a, (nwa - wa) * mf)
        dw = onehot_scatter_add(dw, b, (nwb - wb) * mf)
        v = v + dv
        w = w + dw
        accs = tuple(jnp.where(mask, new, old)
                     for new, old in zip(out[4:], accs))
    return v, w, accs


def solve_constraints(bodies: SolverBodies, prepped: Prepped,
                      num_iterations: int, mode: str = "scan",
                      omega: float = 1.0):
    """Run `num_iterations` rounds over all constraint types in the
    reference's order: distance, ball, fixed, hinge, cone-twist, slider,
    collision (constraints.cpp:3748-3772).

    Returns (bodies, contact_imp_n): the per-pair-point accumulated normal
    impulses ((P, 4) or None) — the collision-impulse magnitude surfaced to
    collision events (physics.cpp:1091-1095 sums impulses per pair)."""
    v, w = bodies.v, bodies.w
    inv_m, inv_i = bodies.inv_mass, bodies.inv_inertia
    p = prepped

    def zeros_for(prep, n_acc, shape_field="body_a"):
        if prep is None:
            return ()
        z = jnp.zeros(getattr(prep, shape_field).shape, v.dtype)
        return tuple(z for _ in range(n_acc))

    accs = {
        "hinge": zeros_for(p.hinge, 2),
        "cone_twist": zeros_for(p.cone_twist, 4),
        "slider": zeros_for(p.slider, 2),
        "contacts": zeros_for(p.contacts, 2, "bias"),
    }

    # per-body 1/degree per contact phase: constant across iterations
    inv_deg_phases = (contact_phase_inv_degrees(p.contacts, v.shape[0])
                      if p.contacts is not None and mode != "scan" else ())

    passes = [
        ("distance", p.distance, _distance_solve_one, 0),
        ("ball", p.ball, _ball_solve_one, 0),
        ("fixed", p.fixed, _fixed_solve_one, 0),
        ("hinge", p.hinge, _hinge_solve_one, 2),
        ("cone_twist", p.cone_twist, _cone_twist_solve_one, 4),
        ("slider", p.slider, _slider_solve_one, 2),
        ("contacts", p.contacts, _contact_solve_one, 2),
    ]

    def one_iteration(carry, _):
        v, w, acc_tuple = carry
        acc_map = {"hinge": acc_tuple[0], "cone_twist": acc_tuple[1],
                   "slider": acc_tuple[2], "contacts": acc_tuple[3]}
        for name, prep, fn, n_acc in passes:
            if prep is None:
                continue
            cur = acc_map.get(name, ())
            if mode == "scan" and name == "contacts":
                v, w, new = _contact_gs_pass(prep, v, w, cur)
            elif mode == "scan":
                v, w, new = _gs_pass(prep, fn, n_acc, v, w, inv_m, inv_i, cur)
            elif name == "contacts":
                # phased pair-major pass: Gauss-Seidel across the scene's
                # static contact phases (single averaged-Jacobi slice when
                # the scene was built without phases)
                v, w, new = _contact_phased_pass(prep, v, w, cur,
                                                 inv_deg_phases, omega=omega)
            elif (mode == "colored"
                  and getattr(prep, "color", None) is not None):
                v, w, new = _colored_pass(prep, fn, v, w, inv_m, inv_i, cur)
            else:
                v, w, new = _jacobi_pass(prep, fn, v, w, inv_m, inv_i, cur,
                                         omega=omega)
            if name in acc_map:
                acc_map[name] = new
        return (v, w, (acc_map["hinge"], acc_map["cone_twist"],
                       acc_map["slider"], acc_map["contacts"])), None

    init = (v, w, (accs["hinge"], accs["cone_twist"], accs["slider"],
                   accs["contacts"]))
    (v, w, final_accs), _ = jax.lax.scan(one_iteration, init, None,
                                         length=num_iterations)
    contact_imp_n = final_accs[3][0] if final_accs[3] else None
    return bodies.replace(v=v, w=w), contact_imp_n
