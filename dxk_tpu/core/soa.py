"""Component-wise SoA vector math — the TPU port of the reference's SIMD
lane layout (/root/reference/src/core/math_simd.h: wN_vec3 is a struct of
per-component lane arrays {x, y, z}, NOT an array of 3-vectors).

Why: jnp code on (P, 3) arrays puts the 3-wide vector axis on the TPU's
128-lane dimension — a 2.3% VPU utilization ceiling for every elementwise
op. With vectors as 3 separate (P,) arrays the P axis fills the lanes.
The hot per-pair pipelines (contact solve, narrowphase) use this layout;
cold paths keep the ergonomic (…, 3) arrays.

A "v3" here is any sequence of 3 same-shaped arrays (tuple/list); a "q4"
is a 4-sequence (x, y, z, w)."""

from __future__ import annotations

import jax.numpy as jnp


def v3(x, y, z):
    return (x, y, z)


def splat(vec, like):
    """Constant (3,) vector -> v3 broadcast against `like` (an array)."""
    return tuple(jnp.full_like(like, float(c)) for c in vec)


def from_rows(arr):
    """(…, 3) array -> v3 of (…,) components (layout boundary helper)."""
    return (arr[..., 0], arr[..., 1], arr[..., 2])


def to_rows(v):
    """v3 -> (…, 3) array (layout boundary helper)."""
    return jnp.stack(v, axis=-1)


def add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross(a, b):
    """math.h cross(vec3, vec3) in lane form (math_simd.h cross)."""
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def muladd(a, b, s):
    """a + b * s."""
    return (a[0] + b[0] * s, a[1] + b[1] * s, a[2] + b[2] * s)


def mulsub(a, b, s):
    """a - b * s."""
    return (a[0] - b[0] * s, a[1] - b[1] * s, a[2] - b[2] * s)
