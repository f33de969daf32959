"""Batched vector / quaternion / matrix math for the TPU physics core.

Semantics follow the reference engine's scalar math library
(/root/reference/src/core/math.h, math.cpp) so that solver behavior and
trajectories can be compared 1:1, but everything here operates on arrays with
arbitrary leading batch dimensions:

  - vectors: (..., 3) float32
  - quaternions: (..., 4) float32, layout (x, y, z, w)  [Hamilton, right-handed]
  - 3x3 matrices: (..., 3, 3) float32, row-major (m[i, j] = row i, col j)

All functions are pure and jit/vmap-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# small helpers


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    return jnp.linalg.norm(v, axis=-1)


def squared_length(v):
    return jnp.sum(v * v, axis=-1)


def normalize(v, eps=0.0):
    """Plain normalize; caller guarantees nonzero length (reference math.h)."""
    return v / jnp.maximum(length(v), eps)[..., None] if eps else v / length(v)[..., None]


def noz(v):
    """Normalize-or-zero (reference math.h `noz`): returns 0 for ~zero input."""
    sq = squared_length(v)
    safe = jnp.where(sq > 1e-12, sq, 1.0)
    return jnp.where((sq > 1e-12)[..., None], v * jnp.sqrt(1.0 / safe)[..., None], 0.0)


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def clamp01(x):
    return jnp.clip(x, 0.0, 1.0)


def deg2rad(d):
    return jnp.float32(d) * (jnp.pi / 180.0) if not hasattr(d, "shape") else d * (jnp.pi / 180.0)


def lerp(a, b, t):
    return a + (b - a) * t


# ---------------------------------------------------------------------------
# quaternions (x, y, z, w)

QUAT_IDENTITY = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def quat_identity(batch_shape=()):
    return jnp.broadcast_to(QUAT_IDENTITY, (*batch_shape, 4))


def quat(v3, w):
    """Assemble a quaternion from vector part and scalar part."""
    return jnp.concatenate([v3, jnp.asarray(w)[..., None]], axis=-1)


def quat_v(q):
    return q[..., :3]


def quat_w(q):
    return q[..., 3]


def quat_mul(a, b):
    """Hamilton product, matching reference operator*(quat, quat)
    (math.h:627-633): w = aw*bw - a.v·b.v ; v = a.v*bw + b.v*aw + a.v×b.v."""
    av, aw = a[..., :3], a[..., 3:4]
    bv, bw = b[..., :3], b[..., 3:4]
    w = aw[..., 0] * bw[..., 0] - dot(av, bv)
    v = av * bw + bv * aw + cross(av, bv)
    return quat(v, w)


def quat_conj(q):
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q, v):
    """Rotate vector by quaternion: (q * p * conj(q)).v (math.h:642-646).

    Expanded to the standard 2-cross-product form (algebraically identical):
      v' = v + 2*w*(u×v) + 2*(u×(u×v)),  u = q.v
    """
    u = q[..., :3]
    w = q[..., 3:4]
    uv = cross(u, v)
    return v + 2.0 * (w * uv + cross(u, uv))


def quat_inv_rotate(q, v):
    """Rotate by the conjugate (inverse for unit quats)."""
    return quat_rotate(quat_conj(q), v)


def quat_from_axis_angle(axis, angle):
    """quat(vec3 axis, float angle) constructor (math.cpp:932): axis assumed
    normalized; q = (axis*sin(a/2), cos(a/2))."""
    angle = jnp.asarray(angle)
    half = angle * 0.5
    s = jnp.sin(half)
    return quat(axis * s[..., None], jnp.cos(half))


def quat_to_mat3(q):
    """Rotation matrix from unit quaternion (math.cpp quaternionToMat3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(*m.shape[:-1], 3, 3)


def rotate_from_to(_from, _to):
    """Shortest-arc rotation between two vectors (math.cpp rotateFromTo).

    Branchless version of the reference's three cases:
      d >= 1          -> identity
      d < 1e-6 - 1    -> 180 deg about any perpendicular axis
      otherwise       -> normalize((from×to, sqrt((1+d)*2)/... )) form
    """
    f = normalize(_from)
    t = normalize(_to)
    d = dot(f, t)

    # general case
    s = jnp.sqrt(jnp.maximum((1.0 + d) * 2.0, 1e-30))
    invs = 1.0 / s
    c = cross(f, t)
    q_general = quat(c * invs[..., None], s * 0.5)
    q_general = quat_normalize(q_general)

    # antiparallel case: rotate pi about axis perpendicular to `f`
    ax1 = cross(jnp.array([1.0, 0.0, 0.0], f.dtype), f)
    ax2 = cross(jnp.array([0.0, 1.0, 0.0], f.dtype), f)
    use2 = (squared_length(ax1) < 1e-12)[..., None]
    axis = normalize(jnp.where(use2, ax2, ax1) + 1e-30)
    q_pi = quat(axis, jnp.zeros_like(d))  # sin(pi/2)=1, cos(pi/2)=0

    anti = (d < (1e-6 - 1.0))[..., None]
    q = jnp.where(anti, q_pi, q_general)
    ident = jnp.broadcast_to(QUAT_IDENTITY, q.shape)
    return jnp.where((d >= 1.0)[..., None], ident, q)


def get_axis_rotation(q):
    """Axis + angle of a quaternion (math.cpp getAxisRotation). Returns
    (axis (...,3), angle (...)). Angle is 2*acos(w) in [0, 2*pi]."""
    v = q[..., :3]
    sq = squared_length(v)
    ok = sq > 0.0
    angle = jnp.where(ok, 2.0 * jnp.arccos(jnp.clip(q[..., 3], -1.0, 1.0)), 0.0)
    inv_len = jnp.where(ok, 1.0 / jnp.sqrt(jnp.where(ok, sq, 1.0)), 0.0)
    axis = jnp.where(ok[..., None], v * inv_len[..., None],
                     jnp.array([1.0, 0.0, 0.0], q.dtype))
    return axis, angle


def twist_swing_decompose(q, twist_axis):
    """decomposeQuaternionIntoTwistAndSwing (math.cpp:594-600): project the
    vector part onto the (normalized) twist axis; swing = q * conj(twist)."""
    v = q[..., :3]
    proj = dot(v, twist_axis)[..., None] * twist_axis
    twist = quat_normalize(quat(proj, q[..., 3]))
    swing = quat_mul(q, quat_conj(twist))
    return twist, swing


# ---------------------------------------------------------------------------
# tangent frames


def get_tangent(normal):
    """math.cpp getTangent: branch on |n.x| >= 0.57735."""
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    use_x = (jnp.abs(nx) >= 0.57735)[..., None]
    t = jnp.where(
        use_x,
        jnp.stack([ny, -nx, jnp.zeros_like(nx)], axis=-1),
        jnp.stack([jnp.zeros_like(nx), nz, -ny], axis=-1),
    )
    return normalize(t)


def get_tangents(normal):
    """math.cpp getTangents: tangent = getTangent(n); bitangent = n×tangent."""
    t = get_tangent(normal)
    b = cross(normal, t)
    return t, b


# ---------------------------------------------------------------------------
# small linear solves (adjugate / Cramer, matching math.cpp exactly)


def solve_2x2(A, b):
    """solveLinearSystem(mat2, vec2) (math.cpp:1342-1354). A: (...,2,2)."""
    a11, a12 = A[..., 0, 0], A[..., 0, 1]
    a21, a22 = A[..., 1, 0], A[..., 1, 1]
    det = a11 * a22 - a12 * a21
    inv_det = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
    x = inv_det * (a22 * b[..., 0] - a12 * b[..., 1])
    y = inv_det * (a11 * b[..., 1] - a21 * b[..., 0])
    return jnp.stack([x, y], axis=-1)


def solve_3x3(A, b):
    """solveLinearSystem(mat3, vec3) (math.cpp:1356-1372): Cramer's rule on
    the column vectors."""
    ex = A[..., :, 0]
    ey = A[..., :, 1]
    ez = A[..., :, 2]
    det = dot(ex, cross(ey, ez))
    inv_det = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
    x = inv_det * dot(b, cross(ey, ez))
    y = inv_det * dot(ex, cross(b, ez))
    z = inv_det * dot(ex, cross(ey, b))
    return jnp.stack([x, y, z], axis=-1)


def skew(r):
    """getSkewMatrix (math.cpp:797-810): cross-product matrix [r]x."""
    zero = jnp.zeros_like(r[..., 0])
    m = jnp.stack(
        [zero, -r[..., 2], r[..., 1],
         r[..., 2], zero, -r[..., 0],
         -r[..., 1], r[..., 0], zero],
        axis=-1,
    )
    return m.reshape(*m.shape[:-1], 3, 3)


def mat3_mul(a, b):
    return a @ b


def mat3_vec(m, v):
    return jnp.einsum("...ij,...j->...i", m, v)


def mat3_T(m):
    return jnp.swapaxes(m, -1, -2)


def outer(a, b):
    return a[..., :, None] * b[..., None, :]


def mat3_inverse(m):
    """invert(mat3) via adjugate; matches reference invert() semantics."""
    return jnp.linalg.inv(m)


# ---------------------------------------------------------------------------
# transforms (trs with scale==1; physics ignores scale like the reference DLL)


def transform_position(pos, rot, p):
    """transformPosition(trs, p) = rot * p + pos."""
    return quat_rotate(rot, p) + pos


def transform_direction(rot, d):
    return quat_rotate(rot, d)


def inverse_transform_position(pos, rot, p):
    """inverseTransformPosition (math.cpp:528-531), scale = 1."""
    return quat_inv_rotate(rot, p - pos)


def inverse_transform_direction(rot, d):
    return quat_inv_rotate(rot, d)


def angle_to_npi_pi(angle):
    """Wrap angle to [-pi, pi] (math.cpp angleToNegPiToPi), branchless."""
    return jnp.mod(angle + jnp.pi, 2.0 * jnp.pi) - jnp.pi


# ---------------------------------------------------------------------------
# Catmull-Rom splines (math.h:1048-1135) — used by particle settings
# (size/intensity/life-scale over lifetime) and animation-style curves.


def evaluate_spline(ts, values, t):
    """catmull_rom_spline::evaluate (math.h:1048-1090), branchless.

    `ts` (N,) ascending knots; a negative entry at index k+1 truncates the
    spline to k+1 points (the reference's sentinel convention). `values`
    (N,) or (N, D) control values. `t` any batch shape; returns the spline
    value per element. The reference walks k while ts[k] < t; here k is a
    mask sum over the same predicate (identical result for ascending ts),
    clamped to >= 1 (the reference never evaluates with t <= ts[0] — its
    callers clamp relLife to [0.01, 0.99]; k=0 would read ts[-1], UB in
    C++ too)."""
    ts = jnp.asarray(ts, jnp.float32)
    values = jnp.asarray(values, jnp.float32)
    n = ts.shape[0]
    t = jnp.asarray(t, jnp.float32)
    tb = t[..., None]                                   # (..., 1) vs (N,)
    # valid knot: index 0/1 always (num >= 2 asserted), else ts >= 0
    valid = (jnp.arange(n) < 2) | (ts >= 0.0)
    # effective num = first invalid index (all-valid -> n)
    num = jnp.where(jnp.any(~valid), jnp.argmin(valid.astype(jnp.int32)), n)
    m = num - 1
    # k = #{j in [0, num-2] : ts[j] < t and valid[j+1]} (prefix property)
    stepable = (jnp.arange(n) < m) & valid
    k = jnp.sum((stepable & (ts < tb)).astype(jnp.int32), axis=-1)
    k = jnp.clip(k, 1, n - 1)

    def take(idx):
        oh = (jnp.arange(n) == idx[..., None]).astype(values.dtype)
        if values.ndim == 1:
            return jnp.sum(oh * values, axis=-1)
        return jnp.einsum("...n,nd->...d", oh, values)

    t0 = jnp.sum((jnp.arange(n) == (k - 1)[..., None]) * ts, axis=-1)
    t1 = jnp.sum((jnp.arange(n) == k[..., None]) * ts, axis=-1)
    h1 = jnp.clip((t - t0) / jnp.where(t1 == t0, 1.0, t1 - t0), 0.0, 1.0)
    h2 = h1 * h1
    h3 = h2 * h1
    # Catmull-Rom basis, same dot(vec4, h) grouping as the reference
    w0 = -h3 + 2.0 * h2 - h1
    w1 = 3.0 * h3 - 5.0 * h2 + 2.0
    w2 = -3.0 * h3 + 4.0 * h2 + h1
    w3 = h3 - h2
    if values.ndim > 1:
        w0, w1, w2, w3 = (w[..., None] for w in (w0, w1, w2, w3))
    out = (take(jnp.clip(k - 2, 0, m)) * w0 + take(k - 1) * w1
           + take(k) * w2 + take(jnp.clip(k + 1, 0, m)) * w3)
    return out * 0.5
