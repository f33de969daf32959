"""Inverse-trig implementations shared by the XLA solver preps and the
Pallas fused kernel.

Mosaic (Pallas TPU) lowers sin/cos/tan/exp/log/sqrt/rsqrt but has NO
lowering for atan/atan2/acos/asin — yet the reference's hinge and
cone-twist constraint preps need them every step (hinge angle
constraints.cpp:1155-1166, twist angle 1823-1846, swing position-motor
arccos 1887-1896). To move joint prep INTO the fused kernel while keeping
the kernel and the XLA paths bit-identical (vmap(step) == per-env step —
the custom_vmap contract), BOTH paths use these polynomial versions: the
same operations in the same order compile to the same results on a given
backend, which jnp.arctan2 (libm on CPU, a different approximation on
TPU) does not guarantee.

The core is the Cephes atanf minimax polynomial (~2-3 ulp over the
reduced range); acos/asin route through atan2 with the
sqrt((1-x)(1+x)) identity for conditioning near the poles. Branchless
(jnp.where) throughout — all constituent ops have Mosaic lowerings.

Accuracy (pinned by tests/test_fastmath.py): |atan2 - numpy| < 4e-7 rad
over the full plane; |acos - numpy| < 1e-5 near the poles, < 5e-7
elsewhere — far below the float32 noise floor the reference's own
angle - limit comparisons live in.
"""

from __future__ import annotations

import jax.numpy as jnp

_PI = 3.14159265358979323846
_PI_2 = _PI / 2
_PI_4 = _PI / 4
_TAN_PI_8 = 0.4142135623730950


def _atan_01(t):
    """atan on [0, 1]: one Cephes range split at tan(pi/8), branchless."""
    hi = t > _TAN_PI_8
    tr = jnp.where(hi, (t - 1.0) / (t + 1.0), t)
    z = tr * tr
    p = (((8.05374449538e-2 * z - 1.38776856032e-1) * z
          + 1.99777106478e-1) * z - 3.33329491539e-1) * z * tr + tr
    return jnp.where(hi, _PI_4 + p, p)


def atan2(y, x):
    """Four-quadrant arctangent, atan2(0, 0) = 0 (matches numpy except at
    the signed-zero corners the physics never distinguishes)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    t = jnp.minimum(ax, ay) / jnp.where(mx > 0.0, mx, 1.0)
    r = _atan_01(t)
    r = jnp.where(ay > ax, _PI_2 - r, r)
    r = jnp.where(x < 0.0, _PI - r, r)
    return jnp.where(y < 0.0, -r, r)


def acos(x):
    """arccos via atan2(sqrt((1-x)(1+x)), x) — well-conditioned at +-1."""
    xc = jnp.clip(x, -1.0, 1.0)
    s = jnp.sqrt(jnp.maximum((1.0 - xc) * (1.0 + xc), 0.0))
    return atan2(s, xc)


def asin(x):
    xc = jnp.clip(x, -1.0, 1.0)
    s = jnp.sqrt(jnp.maximum((1.0 - xc) * (1.0 + xc), 0.0))
    return atan2(xc, s)
