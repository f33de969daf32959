"""Joint constraint prep on component-major lanes — the in-kernel port of
solver.py's prep_{distance,ball,fixed,hinge,cone_twist,slider}.

Round-3 motivation (docs/ROADMAP.md perf #4): the fused pipeline computed
joint prep in XLA (~0.5 ms at 4096 envs — tiny FLOPs, all dispatch/layout
overhead) and shipped ~60 packed rows per joint through HBM into the
kernel. Moving prep INTO the kernel leaves only body state, world
collider params and motor controls crossing HBM: static joint parameters
(anchors, axes, limits — scene constants) are baked into the unrolled
trace as literals, and each prep is a few hundred arithmetic ops per
joint on (CB,) env lanes.

Formulas are ported operation-for-operation from solver.py (itself cited
against constraints.cpp: distance 189-459, ball 460-735, fixed 736-1078,
hinge 1079-1213, cone-twist 1782-1946, slider 2638-2752) so the fused
path stays within fp dust of the XLA paths. The inverse-trig calls
(hinge angle, twist angle, swing arccos) use core/fastmath.py in BOTH
paths — Mosaic has no atan2/acos lowering, and sharing one polynomial
keeps vmap(step) == per-env step bit-comparable.

Each `*_rows` function computes ONE joint's packed row list in exactly
the layout batched_solver's `_*_field_rows` readers consume (same order
as `_pack_joint`), so the solve code is untouched.
"""

from __future__ import annotations

import jax.numpy as jnp

from dxk_tpu.core import fastmath as fm
from dxk_tpu.ops.pallas.cm_narrowphase import (_add, _cross, _dot, _muls,
                                               _neg, _sqlen, _sub, _where,
                                               get_tangent_cm,
                                               quat_rotate_cm)
from dxk_tpu.ops.solver import (BALL_BETA, DISTANCE_BETA, DT_THRESHOLD,
                                HINGE_LIMIT_BETA, HINGE_ROTATION_BETA,
                                SLIDER_BETA, SLIDER_LIMIT_BETA,
                                TWIST_LIMIT_BETA)

# ---------------------------------------------------------------------------
# cm quaternion / mat3 helpers (ports of core/maths.py, same op order)


def quat_mul_cm(a, b):
    """maths.quat_mul: w = aw*bw - av.bv ; v = av*bw + bv*aw + av x bv."""
    av = (a[0], a[1], a[2])
    bv = (b[0], b[1], b[2])
    w = a[3] * b[3] - _dot(av, bv)
    c = _cross(av, bv)
    v = _add(_add(_muls(av, b[3]), _muls(bv, a[3])), c)
    return (v[0], v[1], v[2], w)


def quat_conj_cm(q):
    return (-q[0], -q[1], -q[2], q[3])


def quat_normalize_cm(q):
    n = jnp.sqrt(jnp.maximum(
        q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3], 1e-30))
    inv = 1.0 / n
    return (q[0] * inv, q[1] * inv, q[2] * inv, q[3] * inv)


def quat_from_axis_angle_cm(axis, angle):
    half = angle * 0.5
    s = jnp.sin(half)
    return (axis[0] * s, axis[1] * s, axis[2] * s, jnp.cos(half))


def normalize_cm(v):
    inv = 1.0 / jnp.sqrt(jnp.maximum(_sqlen(v), 1e-30))
    return _muls(v, inv)


def noz_cm(v):
    sq = _sqlen(v)
    ok = sq > 1e-12
    inv = jnp.sqrt(1.0 / jnp.where(ok, sq, 1.0))
    return tuple(jnp.where(ok, c * inv, 0.0) for c in v)


def rotate_from_to_cm(f, t):
    """maths.rotate_from_to (inputs assumed already normalized here — the
    callers pass unit axes, matching the XLA path where normalize() of a
    unit vector is a near-no-op kept for fp parity)."""
    f = normalize_cm(f)
    t = normalize_cm(t)
    d = _dot(f, t)
    s = jnp.sqrt(jnp.maximum((1.0 + d) * 2.0, 1e-30))
    invs = 1.0 / s
    c = _cross(f, t)
    qg = quat_normalize_cm((c[0] * invs, c[1] * invs, c[2] * invs, s * 0.5))
    one = jnp.ones_like(d)
    zero = jnp.zeros_like(d)
    ax1 = _cross((one, zero, zero), f)
    ax2 = _cross((zero, one, zero), f)
    use2 = _sqlen(ax1) < 1e-12
    axr = _where(use2, ax2, ax1)
    axis = normalize_cm(_add(axr, (jnp.full_like(d, 1e-30),) * 3))
    anti = d < (1e-6 - 1.0)
    q = tuple(jnp.where(anti, p, g)
              for p, g in zip((axis[0], axis[1], axis[2], zero), qg))
    ident = (zero, zero, zero, one)
    return tuple(jnp.where(d >= 1.0, i, x) for i, x in zip(ident, q))


def get_axis_rotation_cm(q):
    """maths.get_axis_rotation with fastmath.acos."""
    v = (q[0], q[1], q[2])
    sq = _sqlen(v)
    ok = sq > 0.0
    angle = jnp.where(ok, 2.0 * fm.acos(jnp.clip(q[3], -1.0, 1.0)), 0.0)
    inv_len = jnp.where(ok, 1.0 / jnp.sqrt(jnp.where(ok, sq, 1.0)), 0.0)
    one = jnp.ones_like(sq)
    zero = jnp.zeros_like(sq)
    axis = _where(ok, _muls(v, inv_len), (one, zero, zero))
    return axis, angle


def skew_matvec(inv_i, v):
    """inv_i: 9-tuple row-major mat3; v: v3 -> mat*vec, same sum order as
    solver._mat_vec (einsum j-ascending)."""
    return (inv_i[0] * v[0] + inv_i[1] * v[1] + inv_i[2] * v[2],
            inv_i[3] * v[0] + inv_i[4] * v[1] + inv_i[5] * v[2],
            inv_i[6] * v[0] + inv_i[7] * v[1] + inv_i[8] * v[2])


def _matmul3(a, b):
    """9-tuple row-major mat3 product, k-ascending sums."""
    out = []
    for i in range(3):
        for j in range(3):
            out.append(a[3 * i + 0] * b[0 + j] + a[3 * i + 1] * b[3 + j]
                       + a[3 * i + 2] * b[6 + j])
    return tuple(out)


def _mat_t(a):
    return (a[0], a[3], a[6], a[1], a[4], a[7], a[2], a[5], a[8])


def _skew(r):
    z = jnp.zeros_like(r[0])
    return (z, -r[2], r[1],
            r[2], z, -r[0],
            -r[1], r[0], z)


def point_inv_eff_mass_cm(ia, ib, inv_ma, inv_mb, ra, rb):
    """solver._point_inv_effective_mass: sa Ia sa^T + sb Ib sb^T +
    I (ma+mb). Returns a 9-tuple."""
    sa = _skew(ra)
    sb = _skew(rb)
    m = tuple(x + y for x, y in zip(_matmul3(_matmul3(sa, ia), _mat_t(sa)),
                                    _matmul3(_matmul3(sb, ib), _mat_t(sb))))
    s = inv_ma + inv_mb
    m = list(m)
    m[0] = m[0] + s
    m[4] = m[4] + s
    m[8] = m[8] + s
    return tuple(m)


def _inv_nz(x):
    return jnp.where(x != 0.0, 1.0 / jnp.where(x != 0.0, x, 1.0), 0.0)


def _b2f(x):
    return jnp.where(x, 1.0, 0.0)


# ---------------------------------------------------------------------------
# per-joint row builders. `bd` carries the two bodies' lanes:
#   qa, qb (4-tuples), pa, pb (v3 world COG), ia, ib (9-tuples world inverse
#   inertia), inv_ma, inv_mb (lanes).
# `js` carries the joint's STATIC params as python floats (anchors already
# have local_cog subtracted). `ctl` carries the joint's control lanes.
# dt/inv_dt are lanes (broadcast scalars).


def _anchors(js, bd):
    rel_a = quat_rotate_cm(bd["qa"], js["anchor_a"])
    rel_b = quat_rotate_cm(bd["qb"], js["anchor_b"])
    ga = _add(bd["pa"], rel_a)
    gb = _add(bd["pb"], rel_b)
    return rel_a, rel_b, ga, gb


def distance_rows(js, ctl, bd, dt, inv_dt):
    rel_a, rel_b, ga, gb = _anchors(js, bd)
    u = _sub(gb, ga)
    l = jnp.sqrt(jnp.maximum(_sqlen(u), 0.0))
    ok = l > 0.001
    u = tuple(jnp.where(ok, c / jnp.maximum(l, 1e-12), 0.0) for c in u)
    cr_a = _cross(rel_a, u)
    cr_b = _cross(rel_b, u)
    im = (bd["inv_ma"] + _dot(cr_a, skew_matvec(bd["ia"], cr_a))
          + bd["inv_mb"] + _dot(cr_b, skew_matvec(bd["ib"], cr_b)))
    bias = jnp.where(dt > DT_THRESHOLD,
                     (l - js["length"]) * (DISTANCE_BETA * inv_dt), 0.0)
    to_wa = skew_matvec(bd["ia"], cr_a)
    to_wb = skew_matvec(bd["ib"], cr_b)
    rows = list(rel_a) + list(rel_b) + list(u) + list(to_wa) + list(to_wb)
    rows += [bias, _inv_nz(im)]
    return rows


def ball_rows(js, ctl, bd, dt, inv_dt):
    rel_a, rel_b, ga, gb = _anchors(js, bd)
    m = point_inv_eff_mass_cm(bd["ia"], bd["ib"], bd["inv_ma"],
                              bd["inv_mb"], rel_a, rel_b)
    bias = tuple(jnp.where(dt > DT_THRESHOLD,
                           c * (BALL_BETA * inv_dt), 0.0)
                 for c in _sub(gb, ga))
    return list(rel_a) + list(rel_b) + list(bias) + list(m)


def fixed_rows(js, ctl, bd, dt, inv_dt):
    rel_a, rel_b, ga, gb = _anchors(js, bd)
    mt = point_inv_eff_mass_cm(bd["ia"], bd["ib"], bd["inv_ma"],
                               bd["inv_mb"], rel_a, rel_b)
    mr = tuple(x + y for x, y in zip(bd["ia"], bd["ib"]))
    t_bias = tuple(jnp.where(dt > DT_THRESHOLD,
                             c * (BALL_BETA * inv_dt), 0.0)
                   for c in _sub(gb, ga))
    rot_err = quat_mul_cm(quat_mul_cm(bd["qb"], js["init_inv_rot"]),
                          quat_conj_cm(bd["qa"]))
    r_bias = tuple(jnp.where(dt > DT_THRESHOLD,
                             rot_err[i] * (SLIDER_BETA * inv_dt * 2.0), 0.0)
                   for i in range(3))
    return (list(rel_a) + list(rel_b) + list(t_bias) + list(r_bias)
            + list(mt) + list(mr))


def hinge_rows(js, ctl, bd, dt, inv_dt):
    """solver.prep_hinge (constraints.cpp:1079-1213)."""
    rel_a, rel_b, ga, gb = _anchors(js, bd)
    ia, ib = bd["ia"], bd["ib"]
    mt = point_inv_eff_mass_cm(ia, ib, bd["inv_ma"], bd["inv_mb"],
                               rel_a, rel_b)
    t_bias = tuple(jnp.where(dt > DT_THRESHOLD,
                             c * (BALL_BETA * inv_dt), 0.0)
                   for c in _sub(gb, ga))

    axis_a = quat_rotate_cm(bd["qa"], js["local_axis_a"])
    axis_b = quat_rotate_cm(bd["qb"], js["local_axis_b"])
    tan_b = get_tangent_cm(axis_b)
    bitan_b = _cross(axis_b, tan_b)

    bxa = _cross(tan_b, axis_a)
    cxa = _cross(bitan_b, axis_a)
    ia_bxa = skew_matvec(ia, bxa)
    ib_bxa = skew_matvec(ib, bxa)
    ia_cxa = skew_matvec(ia, cxa)
    ib_cxa = skew_matvec(ib, cxa)
    m00 = _dot(bxa, ia_bxa) + _dot(bxa, ib_bxa)
    m01 = _dot(bxa, ia_cxa) + _dot(bxa, ib_cxa)
    m10 = _dot(cxa, ia_bxa) + _dot(cxa, ib_bxa)
    m11 = _dot(cxa, ia_cxa) + _dot(cxa, ib_cxa)

    rb0 = jnp.where(dt > DT_THRESHOLD,
                    _dot(axis_a, tan_b) * (HINGE_ROTATION_BETA * inv_dt),
                    0.0)
    rb1 = jnp.where(dt > DT_THRESHOLD,
                    _dot(axis_a, bitan_b) * (HINGE_ROTATION_BETA * inv_dt),
                    0.0)

    # limits & motor (constraints.cpp:1155-1205)
    compare_a = quat_rotate_cm(
        quat_conj_cm(bd["qa"]),
        quat_rotate_cm(bd["qb"], js["local_tangent_b"]))
    angle = fm.atan2(_dot(compare_a, js["local_bitangent_a"]),
                     _dot(compare_a, js["local_tangent_a"]))
    lmin, lmax = js["limit_min"], js["limit_max"]
    min_violated = (lmin <= 0.0) & (angle <= lmin)
    max_violated = (lmax >= 0.0) & (angle >= lmax)
    max_torque = ctl["max_torque"]
    solve_limit = min_violated | max_violated
    solve_motor = max_torque > 0.0

    im_ax = (_dot(axis_a, skew_matvec(ia, axis_a))
             + _dot(axis_a, skew_matvec(ib, axis_a)))
    eff_ax = _inv_nz(im_ax)
    limit_sign = jnp.where(min_violated, 1.0, -1.0)

    min_l = lmin if lmin <= 0.0 else -3.14159265358979
    max_l = lmax if lmax >= 0.0 else 3.14159265358979
    target = jnp.clip(ctl["target"], min_l, max_l)
    pos_motor_vel = jnp.where(dt > DT_THRESHOLD,
                              (target - angle) * inv_dt, 0.0)
    motor_vel = jnp.where(ctl["motor_type"] == 1.0, pos_motor_vel,
                          ctl["target"])

    d = jnp.where(min_violated, angle - lmin, lmax - angle)
    limit_bias = jnp.where(dt > DT_THRESHOLD,
                           d * HINGE_LIMIT_BETA * inv_dt, 0.0)

    rows = (list(rel_a) + list(rel_b) + list(t_bias) + list(bxa)
            + list(cxa) + list(axis_a)
            + list(skew_matvec(ia, axis_a)) + list(skew_matvec(ib, axis_a))
            + list(mt) + [m00, m01, m10, m11] + [rb0, rb1])
    rows += [eff_ax, _b2f(solve_limit), _b2f(solve_motor), limit_sign,
             limit_bias, motor_vel, jnp.maximum(max_torque, 0.0) * dt]
    return rows


def cone_twist_rows(js, ctl, bd, dt, inv_dt):
    """solver.prep_cone_twist (constraints.cpp:1782-1946)."""
    rel_a, rel_b, ga, gb = _anchors(js, bd)
    ia, ib = bd["ia"], bd["ib"]
    m = point_inv_eff_mass_cm(ia, ib, bd["inv_ma"], bd["inv_mb"],
                              rel_a, rel_b)
    bias = tuple(jnp.where(dt > DT_THRESHOLD,
                           c * (BALL_BETA * inv_dt), 0.0)
                 for c in _sub(gb, ga))

    btoa = quat_mul_cm(quat_conj_cm(bd["qa"]), bd["qb"])
    axis_compare = quat_rotate_cm(btoa, js["local_axis_b"])
    swing_rotation = rotate_from_to_cm(js["local_axis_a"], axis_compare)

    twist_tan_a = quat_rotate_cm(swing_rotation, js["local_tangent_a"])
    twist_bitan_a = quat_rotate_cm(swing_rotation, js["local_bitangent_a"])
    tan_compare = quat_rotate_cm(btoa, js["local_tangent_b"])
    twist_angle = fm.atan2(_dot(tan_compare, twist_bitan_a),
                           _dot(tan_compare, twist_tan_a))

    swing_axis_l, swing_angle = get_axis_rotation_cm(swing_rotation)
    neg = swing_angle < 0.0
    swing_angle = jnp.where(neg, -swing_angle, swing_angle)
    swing_axis_l = _where(neg, _neg(swing_axis_l), swing_axis_l)

    swing_limit = js["limit_min"]      # swingLimit stored in limit_min
    twist_limit = js["limit_max"]      # twistLimit stored in limit_max

    # swing limit (1848-1865)
    solve_swing = ((swing_limit >= 0.0)
                   & (swing_angle >= swing_limit))
    swing_axis = quat_rotate_cm(bd["qa"], swing_axis_l)
    im_sl = (_dot(swing_axis, skew_matvec(ia, swing_axis))
             + _dot(swing_axis, skew_matvec(ib, swing_axis)))
    eff_sl = _inv_nz(im_sl)
    swing_limit_bias = jnp.where(
        dt > DT_THRESHOLD,
        (swing_limit - swing_angle) * (HINGE_LIMIT_BETA * inv_dt), 0.0)

    # swing motor (1867-1905)
    solve_swing_motor = ctl["swing_max_torque"] > 0.0
    ax_x = jnp.cos(ctl["swing_axis_angle"])
    ax_y = jnp.sin(ctl["swing_axis_angle"])
    local_sm_axis = _add(_muls(js["local_tangent_a"], ax_x),
                         _muls(js["local_bitangent_a"], ax_y))
    sm_axis_vel = quat_rotate_cm(bd["qa"], local_sm_axis)
    sm_vel_v = ctl["swing_target"]
    if js["limit_min"] >= 0.0:
        target_angle = jnp.clip(ctl["swing_target"], -swing_limit,
                                swing_limit)
    else:
        target_angle = ctl["swing_target"]
    local_target_dir = quat_rotate_cm(
        quat_from_axis_angle_cm(local_sm_axis, target_angle),
        js["local_axis_a"])
    local_sm_axis_pos = noz_cm(_cross(axis_compare, local_target_dir))
    sm_axis_pos = quat_rotate_cm(bd["qa"], local_sm_axis_pos)
    cos_angle = _dot(local_target_dir, axis_compare)
    delta_angle = fm.acos(jnp.clip(cos_angle, 0.0, 1.0))
    sm_vel_p = jnp.where(dt > DT_THRESHOLD, delta_angle * inv_dt * 0.2, 0.0)

    is_pos = ctl["swing_motor_type"] == 1.0
    sm_axis = _where(is_pos, sm_axis_pos, sm_axis_vel)
    sm_vel = jnp.where(is_pos, sm_vel_p, sm_vel_v)
    im_sm = (_dot(sm_axis, skew_matvec(ia, sm_axis))
             + _dot(sm_axis, skew_matvec(ib, sm_axis)))
    eff_sm = _inv_nz(im_sm)

    # twist limit & motor (1907-1946)
    min_tw = (twist_limit >= 0.0) & (twist_angle <= -twist_limit)
    max_tw = (twist_limit >= 0.0) & (twist_angle >= twist_limit)
    solve_twist_limit = min_tw | max_tw
    solve_twist_motor = ctl["twist_max_torque"] > 0.0
    twist_axis = quat_rotate_cm(bd["qa"], js["local_axis_a"])
    im_tw = (_dot(twist_axis, skew_matvec(ia, twist_axis))
             + _dot(twist_axis, skew_matvec(ib, twist_axis)))
    eff_tw = _inv_nz(im_tw)
    twist_limit_sign = jnp.where(min_tw, 1.0, -1.0)

    limit = twist_limit if twist_limit >= 0.0 else 3.14159265358979
    tw_target = jnp.clip(ctl["twist_target"], -limit, limit)
    tw_vel_p = jnp.where(dt > DT_THRESHOLD,
                         (tw_target - twist_angle) * inv_dt, 0.0)
    tw_vel = jnp.where(ctl["twist_motor_type"] == 1.0, tw_vel_p,
                       ctl["twist_target"])

    d = jnp.where(min_tw, twist_limit + twist_angle,
                  twist_limit - twist_angle)
    twist_limit_bias = jnp.where(dt > DT_THRESHOLD,
                                 d * TWIST_LIMIT_BETA * inv_dt, 0.0)

    rows = (list(rel_a) + list(rel_b) + list(bias) + list(swing_axis)
            + list(skew_matvec(ia, swing_axis))
            + list(skew_matvec(ib, swing_axis))
            + list(twist_axis)
            + list(skew_matvec(ia, twist_axis))
            + list(skew_matvec(ib, twist_axis))
            + list(sm_axis)
            + list(skew_matvec(ia, sm_axis))
            + list(skew_matvec(ib, sm_axis))
            + list(m))
    rows += [_b2f(solve_swing), eff_sl, swing_limit_bias,
             _b2f(solve_twist_limit), eff_tw, twist_limit_sign,
             twist_limit_bias, _b2f(solve_swing_motor), eff_sm, sm_vel,
             jnp.maximum(ctl["swing_max_torque"], 0.0) * dt,
             _b2f(solve_twist_motor), tw_vel,
             jnp.maximum(ctl["twist_max_torque"], 0.0) * dt]
    return rows


def slider_rows(js, ctl, bd, dt, inv_dt):
    """solver.prep_slider (constraints.cpp:2638-2752)."""
    rel_a, rel_b, ga, gb = _anchors(js, bd)
    ia, ib = bd["ia"], bd["ib"]
    inv_ma, inv_mb = bd["inv_ma"], bd["inv_mb"]

    axis = quat_rotate_cm(bd["qa"], js["local_axis_a"])
    tangent = get_tangent_cm(axis)
    bitangent = _cross(axis, tangent)
    u = _sub(gb, ga)
    r_au = _add(rel_a, u)
    rbxt = _cross(rel_b, tangent)
    rbxb = _cross(rel_b, bitangent)
    rauxt = _cross(r_au, tangent)
    rauxb = _cross(r_au, bitangent)

    ia_rauxt = skew_matvec(ia, rauxt)
    ia_rauxb = skew_matvec(ia, rauxb)
    ib_rbxt = skew_matvec(ib, rbxt)
    ib_rbxb = skew_matvec(ib, rbxb)
    inv_mass_sum = inv_ma + inv_mb

    m00 = _dot(rauxt, ia_rauxt) + _dot(rbxt, ib_rbxt) + inv_mass_sum
    m01 = _dot(rauxt, ia_rauxb) + _dot(rbxt, ib_rbxb)
    m10 = _dot(rauxb, ia_rauxt) + _dot(rbxb, ib_rbxt)
    m11 = _dot(rauxb, ia_rauxb) + _dot(rbxb, ib_rbxb) + inv_mass_sum

    mr = tuple(x + y for x, y in zip(ia, ib))
    tb0 = jnp.where(dt > DT_THRESHOLD,
                    _dot(u, tangent) * (SLIDER_BETA * inv_dt), 0.0)
    tb1 = jnp.where(dt > DT_THRESHOLD,
                    _dot(u, bitangent) * (SLIDER_BETA * inv_dt), 0.0)
    rot_err = quat_mul_cm(quat_mul_cm(bd["qb"], js["init_inv_rot"]),
                          quat_conj_cm(bd["qa"]))
    r_bias = tuple(jnp.where(dt > DT_THRESHOLD,
                             rot_err[i] * (SLIDER_BETA * inv_dt * 2.0), 0.0)
                   for i in range(3))

    # limit (2702-2733)
    lmin, lmax = js["limit_min"], js["limit_max"]
    dist = _dot(u, axis)
    min_v = (lmin <= 0.0) & (dist < lmin)
    max_v = (lmax >= 0.0) & (dist > lmax)
    solve_limit = min_v | max_v
    rauxs = _cross(r_au, axis)
    rbxs = _cross(rel_b, axis)
    im_ax = (inv_mass_sum + _dot(rauxs, skew_matvec(ia, rauxs))
             + _dot(rbxs, skew_matvec(ib, rbxs)))
    eff_ax = _inv_nz(im_ax)
    limit_sign = jnp.where(min_v, 1.0, -1.0)
    err = jnp.where(min_v, dist - lmin, lmax - dist)
    limit_bias = jnp.where(dt > DT_THRESHOLD,
                           err * (SLIDER_LIMIT_BETA * inv_dt), 0.0)

    # motor (2735-2752)
    solve_motor = ctl["max_force"] > 0.0
    min_l = lmin if lmin <= 0.0 else -3.4e38
    max_l = lmax if lmax >= 0.0 else 3.4e38
    target = jnp.clip(ctl["target"], min_l, max_l)
    vel_p = jnp.where(dt > DT_THRESHOLD, (target - dist) * inv_dt, 0.0)
    motor_vel = jnp.where(ctl["motor_type"] == 1.0, vel_p, ctl["target"])

    rows = (list(rauxt) + list(rauxb) + list(rbxt) + list(rbxb)
            + list(tangent) + list(bitangent) + list(axis)
            + list(rauxs) + list(rbxs)
            + list(skew_matvec(ia, rauxs)) + list(skew_matvec(ib, rbxs))
            + list(r_bias)
            + [m00, m01, m10, m11] + [tb0, tb1] + list(mr))
    rows += [_b2f(solve_limit), eff_ax, limit_bias, limit_sign,
             _b2f(solve_motor), motor_vel,
             jnp.maximum(ctl["max_force"], 0.0) * dt]
    return rows


ROW_BUILDERS = {
    "distance": distance_rows,
    "ball": ball_rows,
    "fixed": fixed_rows,
    "hinge": hinge_rows,
    "cone_twist": cone_twist_rows,
    "slider": slider_rows,
}

# controls lanes each type consumes, in the order they are packed into the
# kernel's controls table (see fused_step joint-prep packing)
CTL_FIELDS = {
    "distance": (),
    "ball": (),
    "fixed": (),
    "hinge": ("motor_type", "target", "max_torque"),
    "cone_twist": ("swing_motor_type", "swing_target", "swing_axis_angle",
                   "swing_max_torque", "twist_motor_type", "twist_target",
                   "twist_max_torque"),
    "slider": ("motor_type", "target", "max_force"),
}

# MotorControls attribute prefix per type
CTL_ATTRS = {
    "hinge": {"motor_type": "hinge_motor_type", "target": "hinge_target",
              "max_torque": "hinge_max_torque"},
    "cone_twist": {
        "swing_motor_type": "ct_swing_motor_type",
        "swing_target": "ct_swing_target",
        "swing_axis_angle": "ct_swing_axis_angle",
        "swing_max_torque": "ct_swing_max_torque",
        "twist_motor_type": "ct_twist_motor_type",
        "twist_target": "ct_twist_target",
        "twist_max_torque": "ct_twist_max_torque"},
    "slider": {"motor_type": "slider_motor_type", "target": "slider_target",
               "max_force": "slider_max_force"},
}


def static_params(scene, name):
    """Per-joint python-float static dicts for one joint type (anchors with
    local_cog pre-subtracted — both are scene constants)."""
    import numpy as np
    j = getattr(scene, name)
    lc = np.asarray(scene.body_params.local_cog)
    body_a = np.asarray(j.body_a)
    body_b = np.asarray(j.body_b)
    anchor_a = np.asarray(j.local_anchor_a) - lc[body_a]
    anchor_b = np.asarray(j.local_anchor_b) - lc[body_b]

    def vec(x, i):
        return tuple(float(c) for c in np.asarray(x)[i])

    out = []
    for i in range(body_a.shape[0]):
        d = {"anchor_a": vec(anchor_a, i), "anchor_b": vec(anchor_b, i)}
        if name == "distance":
            d["length"] = float(np.asarray(j.length)[i])
        if name in ("fixed", "slider"):
            q = np.asarray(j.initial_inv_rotation_difference)[i]
            d["init_inv_rot"] = tuple(float(c) for c in q)
        if name in ("hinge", "cone_twist", "slider"):
            d["local_axis_a"] = vec(j.local_axis_a, i)
        if name == "hinge":
            d["local_axis_b"] = vec(j.local_axis_b, i)
        if name in ("hinge", "cone_twist"):
            d["local_tangent_a"] = vec(j.local_tangent_a, i)
            d["local_bitangent_a"] = vec(j.local_bitangent_a, i)
            d["local_tangent_b"] = vec(j.local_tangent_b, i)
        if name == "cone_twist":
            d["local_axis_b"] = vec(j.local_axis_b, i)
        if name in ("hinge", "cone_twist", "slider"):
            d["limit_min"] = float(np.asarray(j.limit_min)[i])
            d["limit_max"] = float(np.asarray(j.limit_max)[i])
        out.append(d)
    return out
