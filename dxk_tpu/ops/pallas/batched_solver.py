"""Fused batched constraint solver — one Pallas TPU kernel for the whole
30-iteration, all-types velocity solve of a vmapped env batch.

Motivation (measured, docs/PERF_NOTES.md round 2): at 1024 locomotion envs
the XLA solver passes are 88% of the env step (15.8 of 17.9 ms) — every
per-constraint op is a (B, P, 3)-shaped elementwise op whose 3-wide minor
axis wastes the TPU's 128 lanes, and 30 iterations x ~10 passes of them
round-trip HBM. This kernel is the TPU shape of the reference's
scheduleConstraintsSIMD + SIMD solver pair
(/root/reference/src/physics/constraints.cpp:51-184, 3453-3772): where the
reference packs 8 constraints into AVX lanes, we pack the ENV BATCH onto
the vector lanes (128 envs per grid step) and the constraints of a pair
group onto sublanes, and keep body velocities resident in VMEM across all
iterations.

Scope: scenes whose solve topology is STATIC and shared across the batch —
the RL workhorse pattern (SURVEY §2.2/2.7: N identical envs stepped in
lockstep). Concretely:

  - every broadphase pair group has max_narrow == table size (no dynamic
    compaction; per-env liveness arrives as masked prep: dead pairs have
    eff_mass == 0 and contribute exactly zero impulse — the same guarantee
    the masked XLA path relies on);
  - ALL 7 constraint types solve in-kernel (round 3; reference SIMD paths
    constraints.cpp:189-3306); heightfield terrain contacts enter as a
    prep-passed pseudo-group (fused_step._group_static);
  - solver semantics match solver_mode="jacobi": per-type averaged-Jacobi
    passes in the reference's type order, degree-averaged per body
    (constraints.cpp:3748-3772 order), contact manifolds solved
    point-sequential in-row (constraints.cpp:3404-3442).

Data layout inside the kernel (all f32):

  - vw: (NB, 6*CB) — body rows x [v|w] components, each component a CB-lane
    (one env chunk) slice. Lives in the fori_loop carry -> VMEM/vregs.
  - contact fields: (K, 3, Pg, CB) vectors / (K, Pg, CB) scalars — the
    pair axis on SUBLANES, envs on LANES: a (Pg, CB) elementwise op fills
    whole vregs.
  - contact gather/scatter: static 0/1 incidence matrices (2Pg, NB) /
    (NB, 2Pg) contracted on the MXU against the (NB, 6*CB) velocity block —
    body indices are scene constants, so "gather" is a tiny matmul, not a
    dynamic address computation.
  - joints: few rows — direct static row reads from vw.

This module hosts the shared solve machinery (per-type joint solves,
contact point solve, packing layouts, padding); the kernel itself — which
also fuses narrowphase + prep in front of the solve — lives in
fused_step.py behind a jax.custom_batching.custom_vmap (unbatched falls
back to plain XLA, vmap enters the kernel in 128-env chunks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CB = 128          # envs per grid chunk (one full vreg of lanes)

# max contact points a narrowphase recipe can emit, by sorted (typeA,typeB)
# (ops/narrowphase.py: sphere* analytic single point; capsule-capsule /
# capsule-box / cylinder segment clips <=2; box-box Sutherland-Hodgman +
# 4-point reduction; hulls single EPA contact)
# type ids: 0=sphere 1=capsule 2=cylinder 3=box 4=hull
TYPE_MAX_POINTS = {
    (0, 0): 1, (0, 1): 1, (0, 2): 1, (0, 3): 1, (0, 4): 1,
    (1, 1): 2, (1, 2): 2, (1, 3): 2, (1, 4): 1,
    # cylinder pairs emit 4-point cap rings (cap-on-cap / cap-on-face,
    # narrowphase.cylinder_{cylinder,box}_contact) — K=2 would silently
    # truncate the ring in the fused prep-passed path (_pack_passed)
    (2, 2): 4, (2, 3): 4, (2, 4): 1,
    # box-hull and hull-hull emit clipped <=4-point manifolds
    # (cm_polytope SAT+clip, round 3)
    (3, 3): 4, (3, 4): 4,
    (4, 4): 4,
}

VEC_FIELDS = ("rel_a", "rel_b", "normal", "tangent",
              "n_to_wa", "n_to_wb", "t_to_wa", "t_to_wb")
SCAL_FIELDS = ("eff_mass_n", "eff_mass_t", "bias", "friction")

HINGE_VECS = ("rel_a", "rel_b", "translation_bias", "bxa", "cxa", "axis",
              "ml_to_wa", "ml_to_wb")
HINGE_SCALS = ("eff_axial_mass", "solve_limit", "solve_motor", "limit_sign",
               "limit_bias", "motor_velocity", "max_motor_impulse")
CT_VECS = ("rel_a", "rel_b", "bias", "swing_axis", "sl_to_wa", "sl_to_wb",
           "twist_axis", "tw_to_wa", "tw_to_wb", "swing_motor_axis",
           "sm_to_wa", "sm_to_wb")
CT_SCALS = ("solve_swing_limit", "eff_swing_limit_mass", "swing_limit_bias",
            "solve_twist_limit", "eff_twist_mass", "twist_limit_sign",
            "twist_limit_bias", "solve_swing_motor", "eff_swing_motor_mass",
            "swing_motor_velocity", "max_swing_motor_impulse",
            "solve_twist_motor", "twist_motor_velocity",
            "max_twist_motor_impulse")

# packed rows per joint: vec fields + mt(9) + mr(4) + rot_bias(2) + scalars
HINGE_ROWS = len(HINGE_VECS) * 3 + 9 + 4 + 2 + len(HINGE_SCALS)
CT_ROWS = len(CT_VECS) * 3 + 9 + len(CT_SCALS)

# distance / ball / fixed / slider layouts (round 3: all 7 constraint
# types solve in-kernel, matching the reference SIMD paths
# constraints.cpp:189-459, 460-735, 736-1078, 2638-3306)
DIST_VECS = ("rel_a", "rel_b", "u", "to_wa", "to_wb")
DIST_SCALS = ("bias", "eff_mass")
DIST_ROWS = len(DIST_VECS) * 3 + len(DIST_SCALS)
BALL_VECS = ("rel_a", "rel_b", "bias")
BALL_SCALS = ()
BALL_ROWS = len(BALL_VECS) * 3 + 9                       # + inv_eff_mass
FIXED_VECS = ("rel_a", "rel_b", "translation_bias", "rotation_bias")
FIXED_SCALS = ()
FIXED_ROWS = len(FIXED_VECS) * 3 + 9 + 9                 # + mt + mr
SLIDER_VECS = ("r_au_x_t", "r_au_x_b", "r_b_x_t", "r_b_x_b", "tangent",
               "bitangent", "axis", "r_au_x_s", "r_b_x_s", "l_to_wa",
               "l_to_wb", "rotation_bias")
SLIDER_SCALS = ("solve_limit", "eff_axial_mass", "limit_bias", "limit_sign",
                "solve_motor", "motor_velocity", "max_motor_impulse")
SLIDER_ROWS = len(SLIDER_VECS) * 3 + 4 + 2 + 9 + len(SLIDER_SCALS)

# reference solve order within one iteration (constraints.cpp:3748-3772);
# contacts come after all joint types
JOINT_ORDER = ("distance", "ball", "fixed", "hinge", "cone_twist", "slider")


def phase_partition(phases):
    """Group indices by ascending phase value (input already sorted):
    [[g, ...], ...] — contact phases run as sequential Gauss-Seidel slices
    (solver._contact_phased_pass semantics)."""
    out, last = [], None
    for g, ph in enumerate(phases):
        if ph != last:
            out.append([])
            last = ph
        out[-1].append(g)
    return out


# ===========================================================================
# component-math helpers on (…, CB)-shaped rows


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _muls(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _matvec(m, v):
    """m: 9-tuple row-major, v: v3."""
    return (m[0] * v[0] + m[1] * v[1] + m[2] * v[2],
            m[3] * v[0] + m[4] * v[1] + m[5] * v[2],
            m[6] * v[0] + m[7] * v[1] + m[8] * v[2])


def _inv_nz(x):
    return jnp.where(x != 0.0, 1.0 / jnp.where(x != 0.0, x, 1.0), 0.0)


def _solve_2x2(a11, a12, a21, a22, b0, b1):
    det = a11 * a22 - a12 * a21
    inv = _inv_nz(det)
    return inv * (a22 * b0 - a12 * b1), inv * (a11 * b1 - a21 * b0)


def _solve_3x3(m, b):
    """Cramer's rule on columns (math.cpp:1356-1372). m 9-tuple row-major."""
    ex = (m[0], m[3], m[6])
    ey = (m[1], m[4], m[7])
    ez = (m[2], m[5], m[8])
    det = _dot(ex, _cross(ey, ez))
    inv = _inv_nz(det)
    return (inv * _dot(b, _cross(ey, ez)),
            inv * _dot(ex, _cross(b, ez)),
            inv * _dot(ex, _cross(ey, b)))


# ===========================================================================
# in-kernel solves (ports of ops/solver.py *_solve_one to component rows)


def _contact_point(cv, cs, inv_ma, inv_mb, va, wa, vb, wb, imp_n, imp_t):
    """Friction then normal (constraints.cpp:3404-3442); all args
    (Pg, CB)-shaped rows / v3 tuples of them."""
    rel_a, rel_b, nrm, tan, twa_n, twb_n, twa_t, twb_t = cv
    eff_n, eff_t, bias, fric = cs

    av = _add(va, _cross(wa, rel_a))
    bv = _add(vb, _cross(wb, rel_b))
    vt = _dot(tan, _sub(bv, av))
    lam = -eff_t * vt
    max_f = fric * imp_n
    new = jnp.clip(imp_t + lam, -max_f, max_f)
    lam = new - imp_t
    imp_t = new
    va = _sub(va, _muls(tan, inv_ma * lam))
    wa = _sub(wa, _muls(twa_t, lam))
    vb = _add(vb, _muls(tan, inv_mb * lam))
    wb = _add(wb, _muls(twb_t, lam))

    av = _add(va, _cross(wa, rel_a))
    bv = _add(vb, _cross(wb, rel_b))
    vn = _dot(nrm, _sub(bv, av))
    lam = -eff_n * (vn - bias)
    new = jnp.maximum(imp_n + lam, 0.0)
    lam = new - imp_n
    imp_n = new
    va = _sub(va, _muls(nrm, inv_ma * lam))
    wa = _sub(wa, _muls(twa_n, lam))
    vb = _add(vb, _muls(nrm, inv_mb * lam))
    wb = _add(wb, _muls(twb_n, lam))
    return va, wa, vb, wb, imp_n, imp_t


def _hinge_one(f, inv_ma, inv_mb, inv_ia, inv_ib, va, wa, vb, wb,
               limit_imp, motor_imp):
    """Motor -> limit -> rotation -> position (constraints.cpp:1215-1306).
    f: dict of (CB,)-shaped fields; inv_i*: 9-tuples."""
    axis = f["axis"]
    # motor
    rel_w = _dot(axis, wb) - _dot(axis, wa)
    cdot = rel_w - f["motor_velocity"]
    lam = -f["eff_axial_mass"] * cdot
    new = jnp.clip(motor_imp + lam, -f["max_motor_impulse"],
                   f["max_motor_impulse"])
    on = f["solve_motor"] > 0.5
    lam = jnp.where(on, new - motor_imp, 0.0)
    motor_imp = jnp.where(on, new, motor_imp)
    wa = _sub(wa, _muls(f["ml_to_wa"], lam))
    wb = _add(wb, _muls(f["ml_to_wb"], lam))

    # limit
    rel_w = f["limit_sign"] * (_dot(axis, wb) - _dot(axis, wa))
    cdot = rel_w + f["limit_bias"]
    lam = -f["eff_axial_mass"] * cdot
    imp = jnp.maximum(limit_imp + lam, 0.0)
    on = f["solve_limit"] > 0.5
    lam = jnp.where(on, imp - limit_imp, 0.0)
    limit_imp = jnp.where(on, imp, limit_imp)
    lam = lam * f["limit_sign"]
    wa = _sub(wa, _muls(f["ml_to_wa"], lam))
    wb = _add(wb, _muls(f["ml_to_wb"], lam))

    # rotation (2D)
    dw = _sub(wb, wa)
    c0 = _dot(f["bxa"], dw) + f["rot_bias0"]
    c1 = _dot(f["cxa"], dw) + f["rot_bias1"]
    l0, l1 = _solve_2x2(f["mr00"], f["mr01"], f["mr10"], f["mr11"],
                        -c0, -c1)
    rot_p = _add(_muls(f["bxa"], l0), _muls(f["cxa"], l1))
    wa = _sub(wa, _matvec(inv_ia, rot_p))
    wb = _add(wb, _matvec(inv_ib, rot_p))

    # position (3D)
    av = _add(va, _cross(wa, f["rel_a"]))
    bv = _add(vb, _cross(wb, f["rel_b"]))
    cdot3 = _add(_sub(bv, av), f["translation_bias"])
    P = _solve_3x3(f["mt"], tuple(-c for c in cdot3))
    va = _sub(va, _muls(P, inv_ma))
    wa = _sub(wa, _matvec(inv_ia, _cross(f["rel_a"], P)))
    vb = _add(vb, _muls(P, inv_mb))
    wb = _add(wb, _matvec(inv_ib, _cross(f["rel_b"], P)))
    return va, wa, vb, wb, limit_imp, motor_imp


def _cone_twist_one(f, inv_ma, inv_mb, inv_ia, inv_ib, va, wa, vb, wb,
                    swing_imp, twist_imp, sm_imp, tm_imp):
    """Twist motor -> swing motor -> twist limit -> swing limit -> position
    (constraints.cpp:1955-2068)."""
    # twist motor
    rel_w = _dot(f["twist_axis"], wb) - _dot(f["twist_axis"], wa)
    cdot = rel_w - f["twist_motor_velocity"]
    lam = -f["eff_twist_mass"] * cdot
    new = jnp.clip(tm_imp + lam, -f["max_twist_motor_impulse"],
                   f["max_twist_motor_impulse"])
    on = f["solve_twist_motor"] > 0.5
    lam = jnp.where(on, new - tm_imp, 0.0)
    tm_imp = jnp.where(on, new, tm_imp)
    wa = _sub(wa, _muls(f["tw_to_wa"], lam))
    wb = _add(wb, _muls(f["tw_to_wb"], lam))

    # swing motor
    rel_w = _dot(f["swing_motor_axis"], wb) - _dot(f["swing_motor_axis"], wa)
    cdot = rel_w - f["swing_motor_velocity"]
    lam = -f["eff_swing_motor_mass"] * cdot
    new = jnp.clip(sm_imp + lam, -f["max_swing_motor_impulse"],
                   f["max_swing_motor_impulse"])
    on = f["solve_swing_motor"] > 0.5
    lam = jnp.where(on, new - sm_imp, 0.0)
    sm_imp = jnp.where(on, new, sm_imp)
    wa = _sub(wa, _muls(f["sm_to_wa"], lam))
    wb = _add(wb, _muls(f["sm_to_wb"], lam))

    # twist limit
    rel_w = f["twist_limit_sign"] * (_dot(f["twist_axis"], wb)
                                     - _dot(f["twist_axis"], wa))
    cdot = rel_w + f["twist_limit_bias"]
    lam = -f["eff_twist_mass"] * cdot
    imp = jnp.maximum(twist_imp + lam, 0.0)
    on = f["solve_twist_limit"] > 0.5
    lam = jnp.where(on, imp - twist_imp, 0.0)
    twist_imp = jnp.where(on, imp, twist_imp)
    lam = lam * f["twist_limit_sign"]
    wa = _sub(wa, _muls(f["tw_to_wa"], lam))
    wb = _add(wb, _muls(f["tw_to_wb"], lam))

    # swing limit (reversed signs, constraints.cpp:2035-2048)
    cdot = (_dot(f["swing_axis"], wa) - _dot(f["swing_axis"], wb)
            + f["swing_limit_bias"])
    lam = -f["eff_swing_limit_mass"] * cdot
    imp = jnp.maximum(swing_imp + lam, 0.0)
    on = f["solve_swing_limit"] > 0.5
    lam = jnp.where(on, imp - swing_imp, 0.0)
    swing_imp = jnp.where(on, imp, swing_imp)
    wa = _add(wa, _muls(f["sl_to_wa"], lam))
    wb = _sub(wb, _muls(f["sl_to_wb"], lam))

    # position
    av = _add(va, _cross(wa, f["rel_a"]))
    bv = _add(vb, _cross(wb, f["rel_b"]))
    cdot3 = _add(_sub(bv, av), f["bias"])
    P = _solve_3x3(f["m"], tuple(-c for c in cdot3))
    va = _sub(va, _muls(P, inv_ma))
    wa = _sub(wa, _matvec(inv_ia, _cross(f["rel_a"], P)))
    vb = _add(vb, _muls(P, inv_mb))
    wb = _add(wb, _matvec(inv_ib, _cross(f["rel_b"], P)))
    return va, wa, vb, wb, swing_imp, twist_imp, sm_imp, tm_imp


def _distance_one(f, inv_ma, inv_mb, inv_ia, inv_ib, va, wa, vb, wb):
    """Port of _distance_solve_one (solver.py; constraints.cpp:244-263 with
    the documented corrected torque arm) to component rows. Inertia args
    unused (kept for the uniform joint-solve signature)."""
    av = _add(va, _cross(wa, f["rel_a"]))
    bv = _add(vb, _cross(wb, f["rel_b"]))
    cdot = _dot(f["u"], _sub(bv, av)) + f["bias"]
    lam = -f["eff_mass"] * cdot
    va = _sub(va, _muls(f["u"], inv_ma * lam))
    wa = _sub(wa, _muls(f["to_wa"], lam))
    vb = _add(vb, _muls(f["u"], inv_mb * lam))
    wb = _add(wb, _muls(f["to_wb"], lam))
    return va, wa, vb, wb


def _ball_one(f, inv_ma, inv_mb, inv_ia, inv_ib, va, wa, vb, wb):
    """Port of _ball_solve_one (constraints.cpp:508-527)."""
    av = _add(va, _cross(wa, f["rel_a"]))
    bv = _add(vb, _cross(wb, f["rel_b"]))
    cdot = _add(_sub(bv, av), f["bias"])
    P = _solve_3x3(f["m"], tuple(-c for c in cdot))
    va = _sub(va, _muls(P, inv_ma))
    wa = _sub(wa, _matvec(inv_ia, _cross(f["rel_a"], P)))
    vb = _add(vb, _muls(P, inv_mb))
    wb = _add(wb, _matvec(inv_ib, _cross(f["rel_b"], P)))
    return va, wa, vb, wb


def _fixed_one(f, inv_ma, inv_mb, inv_ia, inv_ib, va, wa, vb, wb):
    """Port of _fixed_solve_one (constraints.cpp:787-822): rotation then
    position."""
    cdot = _sub(wb, wa)
    rhs = tuple(-(c + rb) for c, rb in zip(cdot, f["rotation_bias"]))
    lam = _solve_3x3(f["mr"], rhs)
    wa = _sub(wa, _matvec(inv_ia, lam))
    wb = _add(wb, _matvec(inv_ib, lam))

    av = _add(va, _cross(wa, f["rel_a"]))
    bv = _add(vb, _cross(wb, f["rel_b"]))
    cdot = _add(_sub(bv, av), f["translation_bias"])
    P = _solve_3x3(f["mt"], tuple(-c for c in cdot))
    va = _sub(va, _muls(P, inv_ma))
    wa = _sub(wa, _matvec(inv_ia, _cross(f["rel_a"], P)))
    vb = _add(vb, _muls(P, inv_mb))
    wb = _add(wb, _matvec(inv_ib, _cross(f["rel_b"], P)))
    return va, wa, vb, wb


def _slider_one(f, inv_ma, inv_mb, inv_ia, inv_ib, va, wa, vb, wb,
                limit_imp, motor_imp):
    """Port of _slider_solve_one (constraints.cpp:2761-2845): motor ->
    limit -> rotation -> position."""
    axis = f["axis"]
    # motor (pure linear along axis)
    cdot = _dot(vb, axis) - _dot(va, axis) - f["motor_velocity"]
    mass = _inv_nz(inv_ma + inv_mb)
    lam = -mass * cdot
    new = jnp.clip(motor_imp + lam, -f["max_motor_impulse"],
                   f["max_motor_impulse"])
    on = f["solve_motor"] > 0.5
    lam = jnp.where(on, new - motor_imp, 0.0)
    motor_imp = jnp.where(on, new, motor_imp)
    va = _sub(va, _muls(axis, inv_ma * lam))
    vb = _add(vb, _muls(axis, inv_mb * lam))

    # limit
    cdot = (_dot(vb, axis) + _dot(wb, f["r_b_x_s"])
            - _dot(va, axis) - _dot(wa, f["r_au_x_s"]))
    lam = -f["eff_axial_mass"] * (f["limit_sign"] * cdot + f["limit_bias"])
    imp = jnp.maximum(limit_imp + lam, 0.0)
    on = f["solve_limit"] > 0.5
    lam = jnp.where(on, imp - limit_imp, 0.0)
    limit_imp = jnp.where(on, imp, limit_imp)
    lam = lam * f["limit_sign"]
    va = _sub(va, _muls(axis, inv_ma * lam))
    wa = _sub(wa, _muls(f["l_to_wa"], lam))
    vb = _add(vb, _muls(axis, inv_mb * lam))
    wb = _add(wb, _muls(f["l_to_wb"], lam))

    # rotation (3D)
    cdot = _sub(wb, wa)
    rhs = tuple(-(c + rb) for c, rb in zip(cdot, f["rotation_bias"]))
    lam3 = _solve_3x3(f["mr"], rhs)
    wa = _sub(wa, _matvec(inv_ia, lam3))
    wb = _add(wb, _matvec(inv_ib, lam3))

    # position (2D in the plane normal to the slider axis)
    cx = (_dot(f["tangent"], vb) + _dot(f["r_b_x_t"], wb)
          - _dot(f["tangent"], va) - _dot(f["r_au_x_t"], wa))
    cy = (_dot(f["bitangent"], vb) + _dot(f["r_b_x_b"], wb)
          - _dot(f["bitangent"], va) - _dot(f["r_au_x_b"], wa))
    l0, l1 = _solve_2x2(f["mt00"], f["mt01"], f["mt10"], f["mt11"],
                        -(cx + f["tb0"]), -(cy + f["tb1"]))
    tbv = _add(_muls(f["tangent"], l0), _muls(f["bitangent"], l1))
    va = _sub(va, _muls(tbv, inv_ma))
    wa = _sub(wa, _matvec(
        inv_ia, _add(_muls(f["r_au_x_t"], l0), _muls(f["r_au_x_b"], l1))))
    vb = _add(vb, _muls(tbv, inv_mb))
    wb = _add(wb, _matvec(
        inv_ib, _add(_muls(f["r_b_x_t"], l0), _muls(f["r_b_x_b"], l1))))
    return va, wa, vb, wb, limit_imp, motor_imp


# ===========================================================================
# the kernel
#
# I/O layout: every per-env tensor reaches the kernel BATCH-MAJOR (B, cols)
# — XLA-side packing is then pure slices + one stack (no batch-minor
# transposes, which measured ~3-6 ms each on the chip). The kernel flips a
# chunk's block to entity-rows/env-lanes itself: small tensors with one
# tpu.transpose, the big contact tensors by DMA-ing the (CB, cols) block
# from HBM into a bounce buffer and transposing (CB, Pg) column-slices into
# a persistent VMEM scratch (a few microseconds — VMEM-to-VMEM).


def _round128(x):
    return ((x + 127) // 128) * 128


def _mxu_t(x, precision=jax.lax.Precision.HIGHEST):
    """Transpose (CB, X) -> (X, CB) on the MXU: contract the CB axis
    against a CB x CB identity, free of the lane-alignment constraints
    tpu.transpose and DMA slicing impose. Default precision is HIGHEST:
    at the TPU's DEFAULT f32 matmul precision the MXU truncates inputs to
    bf16 (measured 2.5e-3 relative, round-5 job 06), so an identity
    product is NOT a transpose — it bf16-rounds every value it moves.
    That truncation on the kernel's velocity boundary was the round-4
    free-flight fidelity drift. State/velocity boundaries must keep
    HIGHEST; param/table transposes in the production averaged solve may
    pass DEFAULT (bf16 param rounding is within solver tolerance, and
    the 6-pass HIGHEST transposes cost ~20% runtime — r5 job 10)."""
    ident = jnp.eye(x.shape[0], dtype=jnp.float32)
    return jax.lax.dot_general(
        x, ident, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)


def _hinge_field_rows(t, j):
    """Fields of hinge j from the transposed (H*RH, CB) array."""
    base = j * HINGE_ROWS
    r = base
    f = {}
    for name in ("rel_a", "rel_b", "translation_bias", "bxa", "cxa", "axis",
                 "ml_to_wa", "ml_to_wb"):
        f[name] = (t[r], t[r + 1], t[r + 2])
        r += 3
    f["mt"] = tuple(t[r + i] for i in range(9)); r += 9
    f["mr00"], f["mr01"], f["mr10"], f["mr11"] = t[r], t[r+1], t[r+2], t[r+3]
    r += 4
    f["rot_bias0"] = t[r]; r += 1
    f["rot_bias1"] = t[r]; r += 1
    for name in HINGE_SCALS:
        f[name] = t[r]
        r += 1
    return f


def _ct_field_rows(t, j):
    base = j * CT_ROWS
    r = base
    f = {}
    for name in CT_VECS:
        f[name] = (t[r], t[r + 1], t[r + 2])
        r += 3
    f["m"] = tuple(t[r + i] for i in range(9)); r += 9
    for name in CT_SCALS:
        f[name] = t[r]
        r += 1
    return f


def _dist_field_rows(t, j):
    r = j * DIST_ROWS
    f = {}
    for name in DIST_VECS:
        f[name] = (t[r], t[r + 1], t[r + 2])
        r += 3
    for name in DIST_SCALS:
        f[name] = t[r]
        r += 1
    return f


def _ball_field_rows(t, j):
    r = j * BALL_ROWS
    f = {}
    for name in BALL_VECS:
        f[name] = (t[r], t[r + 1], t[r + 2])
        r += 3
    f["m"] = tuple(t[r + i] for i in range(9))
    return f


def _fixed_field_rows(t, j):
    r = j * FIXED_ROWS
    f = {}
    for name in FIXED_VECS:
        f[name] = (t[r], t[r + 1], t[r + 2])
        r += 3
    f["mt"] = tuple(t[r + i] for i in range(9)); r += 9
    f["mr"] = tuple(t[r + i] for i in range(9))
    return f


def _slider_field_rows(t, j):
    r = j * SLIDER_ROWS
    f = {}
    for name in SLIDER_VECS:
        f[name] = (t[r], t[r + 1], t[r + 2])
        r += 3
    f["mt00"], f["mt01"], f["mt10"], f["mt11"] = (t[r], t[r + 1], t[r + 2],
                                                  t[r + 3])
    r += 4
    f["tb0"], f["tb1"] = t[r], t[r + 1]
    r += 2
    f["mr"] = tuple(t[r + i] for i in range(9)); r += 9
    for name in SLIDER_SCALS:
        f[name] = t[r]
        r += 1
    return f


# ---- per-type extra (matrix / vec2) rows, matching the readers above ------


def _joint_extra_hinge(h):
    extra = [h.inv_eff_trans_mass[..., i, j]
             for i in range(3) for j in range(3)]
    extra += [h.inv_eff_rot_mass[..., 0, 0], h.inv_eff_rot_mass[..., 0, 1],
              h.inv_eff_rot_mass[..., 1, 0], h.inv_eff_rot_mass[..., 1, 1]]
    extra += [h.rotation_bias[..., 0], h.rotation_bias[..., 1]]
    return extra


def _joint_extra_ct(c):
    return [c.inv_eff_mass[..., i, j] for i in range(3) for j in range(3)]


def _joint_extra_dist(_d):
    return []


def _joint_extra_ball(b):
    return [b.inv_eff_mass[..., i, j] for i in range(3) for j in range(3)]


def _joint_extra_fixed(x):
    extra = [x.inv_eff_trans_mass[..., i, j]
             for i in range(3) for j in range(3)]
    extra += [x.inv_eff_rot_mass[..., i, j]
              for i in range(3) for j in range(3)]
    return extra


def _joint_extra_slider(s):
    extra = [s.inv_eff_trans_mass[..., 0, 0], s.inv_eff_trans_mass[..., 0, 1],
             s.inv_eff_trans_mass[..., 1, 0], s.inv_eff_trans_mass[..., 1, 1]]
    extra += [s.translation_bias[..., 0], s.translation_bias[..., 1]]
    extra += [s.inv_eff_rot_mass[..., i, j]
              for i in range(3) for j in range(3)]
    return extra


# name -> (vecs, scals, rows, extra_fn, reader, solve, n_acc)
JOINT_SPECS = {
    "distance": (DIST_VECS, DIST_SCALS, DIST_ROWS, _joint_extra_dist,
                 _dist_field_rows, _distance_one, 0),
    "ball": (BALL_VECS, BALL_SCALS, BALL_ROWS, _joint_extra_ball,
             _ball_field_rows, _ball_one, 0),
    "fixed": (FIXED_VECS, FIXED_SCALS, FIXED_ROWS, _joint_extra_fixed,
              _fixed_field_rows, _fixed_one, 0),
    "hinge": (HINGE_VECS, HINGE_SCALS, HINGE_ROWS, _joint_extra_hinge,
              _hinge_field_rows, _hinge_one, 2),
    "cone_twist": (CT_VECS, CT_SCALS, CT_ROWS, _joint_extra_ct,
                   _ct_field_rows, _cone_twist_one, 4),
    "slider": (SLIDER_VECS, SLIDER_SCALS, SLIDER_ROWS, _joint_extra_slider,
               _slider_field_rows, _slider_one, 2),
}


def joint_rows(name):
    return JOINT_SPECS[name][2]


def pack_joint_type(name, prep):
    """(B, J*ROWS) packed table for one joint type's prep (batched)."""
    vecs, scals, _rows, extra_fn, _r, _s, _n = JOINT_SPECS[name]
    return _pack_joint(prep, vecs, scals, extra_fn(prep))


def _write_body_row(vw, n, new6):
    """Write body n's 6 components back into vw (NB, 6L) as a one-hot
    multiplicative select. Rationale (round 4, real-TPU lowering):
    .at[n].set emits a scatter, which Mosaic cannot lower even when n is a
    Python int; an iota-mask jnp.where select lowers but trips a libtpu
    layout CHECK (layout.h offsets_[0] < tiling_[0]) in the terminal
    compiler. oh is exactly 0/1, so row n becomes exactly new6 (bit-exact,
    unlike a delta-add) and other rows are exactly preserved."""
    row = jnp.concatenate([c[None, :] for c in new6], axis=1)   # (1, 6L)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (vw.shape[0], 1), 0)
          == n).astype(vw.dtype)                                # (NB, 1)
    return vw * (1.0 - oh) + oh * row


def _solve_joint_type(name, ab, t, vw, invm_t, invI_t, nb, L, inv_deg6,
                      omega, accs, sequential=False):
    """One pass over all joints of one type. vw: (NB, 6L); t: (J*ROWS, L)
    packed fields; accs: tuple of per-joint accumulator lists. Returns
    (vw, new_accs). sequential=False: averaged Jacobi across the type
    (deltas scaled by inv_deg6*omega). sequential=True: reference-exact
    Gauss-Seidel — each joint's new velocities are written back before the
    next joint solves (the scalar path of constraints.cpp, solver.py
    _gs_pass semantics)."""
    _v, _s, _rows, _e, reader, solve, n_acc = JOINT_SPECS[name]
    delta = {}
    new_accs = tuple([] for _ in range(n_acc))
    for j, (a, b) in enumerate(ab):
        ra = [vw[a, c * L:(c + 1) * L] for c in range(6)]
        rb = [vw[b, c * L:(c + 1) * L] for c in range(6)]
        va, wa = tuple(ra[0:3]), tuple(ra[3:6])
        vb, wb = tuple(rb[0:3]), tuple(rb[3:6])
        f = reader(t, j)
        inv_ia = tuple(invI_t[i * nb + a, :] for i in range(9))
        inv_ib = tuple(invI_t[i * nb + b, :] for i in range(9))
        out = solve(f, invm_t[a, :], invm_t[b, :], inv_ia, inv_ib,
                    va, wa, vb, wb, *[acc[j] for acc in accs])
        nva, nwa, nvb, nwb = out[:4]
        if sequential:
            vw = _write_body_row(vw, a, tuple(nva) + tuple(nwa))
            vw = _write_body_row(vw, b, tuple(nvb) + tuple(nwb))
        else:
            _acc(delta, a, _sub(nva, va), _sub(nwa, wa))
            _acc(delta, b, _sub(nvb, vb), _sub(nwb, wb))
        for lst, val in zip(new_accs, out[4:]):
            lst.append(val)
    if not sequential:
        vw = _apply_delta(vw, delta, inv_deg6, omega)
    return vw, new_accs


def static_joint_invdeg(scene, nbody):
    """(6, nbody) 1/degree per joint type — scene constants (wiring is
    static)."""
    out = np.ones((len(JOINT_ORDER), nbody), np.float32)
    for row, name in enumerate(JOINT_ORDER):
        joint = getattr(scene, name)
        if joint is None:
            continue
        deg = np.zeros(nbody, np.float32)
        for n in np.asarray(joint.body_a):
            deg[n] += 1
        for n in np.asarray(joint.body_b):
            deg[n] += 1
        out[row] = 1.0 / np.maximum(deg, 1.0)
    return out


def scene_joint_ab(scene):
    """[(name, [(a, b), ...])] for every joint type present in the scene,
    in reference solve order."""
    out = []
    for name in JOINT_ORDER:
        joint = getattr(scene, name)
        if joint is not None and np.asarray(joint.body_a).shape[0] > 0:
            out.append((name, list(zip(
                np.asarray(joint.body_a).tolist(),
                np.asarray(joint.body_b).tolist()))))
    return out


def _acc(delta, n, dv, dw):
    cur = delta.get(n)
    entry = list(dv) + list(dw)
    if cur is None:
        delta[n] = entry
    else:
        delta[n] = [c + e for c, e in zip(cur, entry)]


def _apply_delta(vw, delta, inv_deg, omega):
    """Apply the few joint deltas to the (NB, 6CB) block. Rows assemble via
    concatenate (static row indices) — Mosaic has no scatter-add lowering
    for value updates."""
    nb = vw.shape[0]
    zero = None
    rows = []
    for n in range(nb):
        comps = delta.get(n)
        if comps is None:
            if zero is None:
                zero = jnp.zeros((1, vw.shape[1]), vw.dtype)
            rows.append(zero)
        else:
            row = jnp.concatenate(
                [c[None, :] for c in comps], axis=1)         # (1, 6CB)
            rows.append(row * (omega * inv_deg[n])[None, :])
    return vw + jnp.concatenate(rows, axis=0)


# ===========================================================================
# XLA-side packing + custom_vmap wrapper


def _pack_joint(prep, vec_names, scal_names, extra):
    """(B, J*R) with column j*R + r (row order matching the kernel's
    _*_field_rows readers)."""
    rows = []
    for name in vec_names:
        v = getattr(prep, name)                  # (B, J, 3)
        rows.extend([v[..., i] for i in range(3)])
    rows.extend(extra)
    for name in scal_names:
        rows.append(getattr(prep, name).astype(jnp.float32))
    t = jnp.stack(rows, axis=2)                  # (B, J, R)
    return t.reshape(t.shape[0], -1)


def _pad_batch_to_cb(tree, B):
    """Pad every leaf's leading batch axis to a CB multiple by REPEATING
    valid envs (idx mod B). Zero-padding is unsafe: garbage lanes (e.g.
    zero quaternions) can breed NaNs, and NaN*0 through the in-kernel
    MXU-identity transposes contaminates every lane of a row."""
    pad = (-B) % CB
    if not pad:
        return tree
    idx = jnp.arange(B + pad) % B
    return jax.tree_util.tree_map(lambda x: x[idx], tree)
