"""Heightfield terrain collision.

Rebuild of /root/reference/src/terrain/heightmap_collider.h (uint16 height
grid + min/max mip quadtree, iterateTrianglesInVolume) and
src/physics/heightmap_collision.cpp (per-collider triangle contacts +
below-terrain safety contact).

The reference walks a quadtree per collider to enumerate triangles that
intersect its AABB. On TPU the quadtree becomes a *fixed-footprint gather*:
each collider samples a static K x K window of grid cells around its AABB
(2*K*K triangles) and runs branchless per-triangle contact tests, masked by
cell validity. K bounds the collider footprint in cells (the reference's
dynamic triangle list becomes a static capacity, like every other buffer
here).

Contacts follow heightmap_collision.cpp:
  - sphere vs triangle: closest point on triangle (43-78)
  - capsule vs triangle: segment-triangle closest point -> sphere test
  - box vs triangle: 13-axis SAT (80-250, OBB via rotate-to-local 480-507)
  - safety contact: if the collider's lowest support point is below the
    terrain height at that (x, z), emit a contact with normal (0,-1,0)
    (537-570); note the reference's convention here is body B = terrain with
    the normal pointing down toward the terrain.
Contacts are reduced to the 4 deepest per collider.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from dxk_tpu.core.maths import cross, dot, normalize, quat_inv_rotate, quat_rotate, squared_length
from dxk_tpu.ops.geometry import closest_point_segment_segment


@struct.dataclass
class Heightfield:
    """Static terrain description (heightmap_collider_component). World-space
    triangle (x, z) layout matches heightmap_collider.h:87-104:
      cell (x, z) -> triangles (A, B, C) and (C, B, D) with
      A=(x,z) B=(x,z+1) C=(x+1,z) D=(x+1,z+1)."""

    heights: jnp.ndarray        # (H, W) f32 world heights (already scaled)
    cell_size: float = struct.field(pytree_node=False)
    min_corner: jnp.ndarray = None     # (3,) world position of grid [0,0]
    friction: float = struct.field(pytree_node=False, default=1.0)
    restitution: float = struct.field(pytree_node=False, default=0.0)
    window: int = struct.field(pytree_node=False, default=8)  # K cells

    @property
    def size(self):
        return self.heights.shape


def make_heightfield(heights: np.ndarray, cell_size: float,
                     min_corner=(0.0, 0.0, 0.0), friction=1.0,
                     restitution=0.0, window=8) -> Heightfield:
    h = jnp.asarray(np.asarray(heights, np.float32))
    return Heightfield(heights=h, cell_size=float(cell_size),
                       min_corner=jnp.asarray(np.asarray(min_corner, np.float32)),
                       friction=friction, restitution=restitution,
                       window=window)


def height_at(hf: Heightfield, x, z):
    """Bilinear-free exact height: sample the triangle containing (x, z)
    (getHeightAt semantics)."""
    lx = (x - hf.min_corner[0]) / hf.cell_size
    lz = (z - hf.min_corner[2]) / hf.cell_size
    H, W = hf.heights.shape
    cx = jnp.clip(jnp.floor(lx).astype(jnp.int32), 0, W - 2)
    cz = jnp.clip(jnp.floor(lz).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(lx - cx, 0.0, 1.0)
    fz = jnp.clip(lz - cz, 0.0, 1.0)
    # One-hot masked-sum reads instead of gathers: every batched gather
    # op costs ~a millisecond per scan step on TPU regardless of size
    # (CLAUDE.md batched-gather rule), while a masked reduction over the
    # whole (H, W) table is a few VPU microseconds and fuses — exact f32
    # (no MXU involved). Two row reductions + four column selects fetch
    # the 2x2 node block.
    hr = jnp.arange(H)
    wr = jnp.arange(W)
    r0 = jnp.sum(jnp.where((hr == cz[..., None]),
                           1.0, 0.0)[..., None] * hf.heights, -2)
    r1 = jnp.sum(jnp.where((hr == cz[..., None] + 1),
                           1.0, 0.0)[..., None] * hf.heights, -2)
    m0 = jnp.where(wr == cx[..., None], 1.0, 0.0)
    m1 = jnp.where(wr == cx[..., None] + 1, 1.0, 0.0)
    ha = jnp.sum(r0 * m0, -1)
    hb = jnp.sum(r1 * m0, -1)
    hc = jnp.sum(r0 * m1, -1)
    hd = jnp.sum(r1 * m1, -1)
    # triangle (A,B,C) for fx+fz<1 else (C,B,D)
    h1 = ha + (hc - ha) * fx + (hb - ha) * fz
    h2 = hd + (hb - hd) * (1.0 - fx) + (hc - hd) * (1.0 - fz)
    return hf.min_corner[1] + jnp.where(fx + fz < 1.0, h1, h2)


def _window_triangles(hf: Heightfield, aabb_min, aabb_max, K=None):
    """Gather the K x K cell window under the collider AABB. Returns
    (tri_a, tri_b, tri_c) each (2*K*K, 3) world space + valid mask."""
    K = hf.window if K is None else K
    H, W = hf.heights.shape
    lx = (aabb_min[0] - hf.min_corner[0]) / hf.cell_size
    lz = (aabb_min[2] - hf.min_corner[2]) / hf.cell_size
    x0 = jnp.clip(jnp.floor(lx).astype(jnp.int32), 0, jnp.maximum(W - 1 - K, 0))
    z0 = jnp.clip(jnp.floor(lz).astype(jnp.int32), 0, jnp.maximum(H - 1 - K, 0))

    dx = jnp.arange(K)
    dz = jnp.arange(K)
    cx = jnp.broadcast_to(x0 + dx[None, :], (K, K))
    cz = jnp.broadcast_to(z0 + dz[:, None], (K, K))
    valid = (cx < W - 1) & (cz < H - 1)

    # One (K+1)x(K+1) node-window fetch via one-hot masked sums; the
    # four cell corners are static slices of it. Gather ops cost ~a
    # millisecond each per scan step on TPU (CLAUDE.md batched-gather
    # rule); a two-step masked reduction over the (H, W) table is VPU
    # microseconds, exact f32, and fuses. Invalid (clamped) nodes are
    # masked out by `valid` below.
    nx = jnp.minimum(x0 + jnp.arange(K + 1), W - 1)
    nz = jnp.minimum(z0 + jnp.arange(K + 1), H - 1)
    rows = jnp.sum(jnp.where(jnp.arange(H) == nz[:, None], 1.0,
                             0.0)[..., None] * hf.heights, -2)  # (K+1, W)
    nh = jnp.sum(rows[:, None, :]
                 * jnp.where(jnp.arange(W) == nx[:, None], 1.0,
                             0.0)[None, :, :], -1)      # (K+1, K+1)
    nwx = hf.min_corner[0] + nx.astype(jnp.float32) * hf.cell_size
    nwz = hf.min_corner[2] + nz.astype(jnp.float32) * hf.cell_size
    nodes = jnp.stack([jnp.broadcast_to(nwx[None, :], nh.shape),
                       hf.min_corner[1] + nh,
                       jnp.broadcast_to(nwz[:, None], nh.shape)], axis=-1)

    A = nodes[:K, :K]
    B = nodes[1:, :K]
    C = nodes[:K, 1:]
    D = nodes[1:, 1:]

    tri_a = jnp.concatenate([A.reshape(-1, 3), C.reshape(-1, 3)])
    tri_b = jnp.concatenate([B.reshape(-1, 3), B.reshape(-1, 3)])
    tri_c = jnp.concatenate([C.reshape(-1, 3), D.reshape(-1, 3)])
    vmask = jnp.concatenate([valid.reshape(-1), valid.reshape(-1)])

    # prune triangles fully outside the collider AABB (x/z)
    tmin = jnp.minimum(jnp.minimum(tri_a, tri_b), tri_c)
    tmax = jnp.maximum(jnp.maximum(tri_a, tri_b), tri_c)
    overlap = ((tmin[:, 0] <= aabb_max[0]) & (tmax[:, 0] >= aabb_min[0])
               & (tmin[:, 2] <= aabb_max[2]) & (tmax[:, 2] >= aabb_min[2])
               & (tmin[:, 1] <= aabb_max[1] + 10.0) & (tmax[:, 1] >= aabb_min[1]))
    return tri_a, tri_b, tri_c, vmask & overlap


def closest_point_point_triangle(p, a, b, c):
    """Ericson 5.1.5 (reference closestPoint_PointTriangle)."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = dot(ab, ap)
    d2 = dot(ac, ap)
    bp = p - b
    d3 = dot(ab, bp)
    d4 = dot(ac, bp)
    cp = p - c
    d5 = dot(ab, cp)
    d6 = dot(ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_bc = (d4 - d3) + (d5 - d6)
    w_bc = jnp.clip((d4 - d3) / jnp.where(jnp.abs(denom_bc) < 1e-12, 1.0, denom_bc), 0.0, 1.0)

    region_a = (d1 <= 0.0) & (d2 <= 0.0)
    region_b = (d3 >= 0.0) & (d4 <= d3)
    region_c = (d6 >= 0.0) & (d5 <= d6)
    region_ab = (vc <= 0.0) & (d1 >= 0.0) & (d3 <= 0.0)
    region_ac = (vb <= 0.0) & (d2 >= 0.0) & (d6 <= 0.0)
    region_bc = (va <= 0.0) & (d4 - d3 >= 0.0) & (d5 - d6 >= 0.0)

    v_ab = jnp.clip(d1 / jnp.where(jnp.abs(d1 - d3) < 1e-12, 1.0, d1 - d3), 0.0, 1.0)
    w_ac = jnp.clip(d2 / jnp.where(jnp.abs(d2 - d6) < 1e-12, 1.0, d2 - d6), 0.0, 1.0)

    denom = jnp.where(jnp.abs(va + vb + vc) < 1e-12, 1.0, va + vb + vc)
    v = vb / denom
    w = vc / denom
    interior = a + ab * v[..., None] + ac * w[..., None]

    out = interior
    out = jnp.where(region_bc[..., None], b + (c - b) * w_bc[..., None], out)
    out = jnp.where(region_ac[..., None], a + ac * w_ac[..., None], out)
    out = jnp.where(region_ab[..., None], a + ab * v_ab[..., None], out)
    out = jnp.where(region_c[..., None], c, out)
    out = jnp.where(region_b[..., None], b, out)
    out = jnp.where(region_a[..., None], a, out)
    return out


def _sphere_tri(center, radius, a, b, c):
    """collideSphereVsTriangle (heightmap_collision.cpp:43-78)."""
    closest = closest_point_point_triangle(center, a, b, c)
    n = closest - center
    sq = squared_length(n)
    hit = sq <= radius * radius
    degenerate = sq == 0.0
    dist = jnp.sqrt(jnp.maximum(sq, 1e-30))
    tri_n = cross(b - a, c - a)
    n = jnp.where(degenerate[..., None], -tri_n, n / dist[..., None])
    n = jnp.where(degenerate[..., None], normalize(n + 1e-30), n)
    depth = radius - jnp.where(degenerate, 0.0, dist)
    return closest, n, depth, hit


def _capsule_tri(pa, pb, radius, a, b, c):
    """Capsule vs triangle: closest point of the axis segment to the
    triangle (min over face projection and the three edges), then a sphere
    test there."""
    # candidates: segment endpoints vs triangle, segment vs each edge
    cand_pts = []
    for p in (pa, pb):
        q = closest_point_point_triangle(p, a, b, c)
        cand_pts.append((p, q))
    for (e0, e1) in ((a, b), (b, c), (c, a)):
        s, t, _ = closest_point_segment_segment(pa, pb, e0, e1)
        cand_pts.append((s, t))
    best_d = jnp.full_like(pa[..., 0], 3.4e38)
    best_s = pa
    best_q = a
    for (s, q) in cand_pts:
        d = squared_length(s - q)
        better = d < best_d
        best_d = jnp.where(better, d, best_d)
        best_s = jnp.where(better[..., None], s, best_s)
        best_q = jnp.where(better[..., None], q, best_q)
    return _sphere_capsule_pt(best_s, radius, best_q, a, b, c)


def _sphere_capsule_pt(center, radius, closest, a, b, c):
    n = closest - center
    sq = squared_length(n)
    hit = sq <= radius * radius
    degenerate = sq == 0.0
    dist = jnp.sqrt(jnp.maximum(sq, 1e-30))
    tri_n = cross(b - a, c - a)
    n = jnp.where(degenerate[..., None], -normalize(tri_n + 1e-30),
                  n / dist[..., None])
    depth = radius - jnp.where(degenerate, 0.0, dist)
    return closest, n, depth, hit


def _box_tri(center, half, q, a, b, c):
    """OBB vs triangle via rotate-to-local 13-axis SAT
    (heightmap_collision.cpp:80-507). Contact = deepest vertex/closest point
    approximation: the triangle point closest to the box center, with the
    SAT minimum axis as normal."""
    al = quat_inv_rotate(q, a - center)
    bl = quat_inv_rotate(q, b - center)
    cl = quat_inv_rotate(q, c - center)

    f0 = bl - al
    f1 = cl - bl
    f2 = al - cl
    eye = jnp.eye(3, dtype=center.dtype)

    best_pen = jnp.full_like(center[..., 0], 3.4e38)
    best_n = jnp.zeros_like(center)
    sep = jnp.zeros_like(center[..., 0], dtype=bool)

    def axis_test(axis, best_pen, best_n, sep):
        ln2 = squared_length(axis)
        ok = ln2 > 1e-12
        axis_n = axis / jnp.sqrt(jnp.maximum(ln2, 1e-12))[..., None]
        p0 = dot(al, axis_n)
        p1 = dot(bl, axis_n)
        p2 = dot(cl, axis_n)
        r = jnp.sum(half * jnp.abs(axis_n), axis=-1)
        tri_min = jnp.minimum(jnp.minimum(p0, p1), p2)
        tri_max = jnp.maximum(jnp.maximum(p0, p1), p2)
        pen = jnp.minimum(tri_max, r) - jnp.maximum(tri_min, -r)
        this_sep = ok & ((tri_min > r) | (tri_max < -r))
        better = ok & ~this_sep & (pen < best_pen)
        best_pen = jnp.where(better, pen, best_pen)
        # normal sign: point from box toward triangle
        sgn = jnp.where(tri_min + tri_max > 0.0, 1.0, -1.0)
        best_n = jnp.where(better[..., None], axis_n * sgn[..., None], best_n)
        return best_pen, best_n, sep | this_sep

    # 3 face axes, 1 triangle normal, 9 edge cross axes
    for i in range(3):
        best_pen, best_n, sep = axis_test(
            jnp.broadcast_to(eye[i], center.shape), best_pen, best_n, sep)
    tri_n = cross(f0, cl - al)
    best_pen, best_n, sep = axis_test(tri_n, best_pen, best_n, sep)
    for f in (f0, f1, f2):
        for i in range(3):
            best_pen, best_n, sep = axis_test(
                cross(jnp.broadcast_to(eye[i], center.shape), f),
                best_pen, best_n, sep)

    hit = ~sep
    # contact point: triangle point closest to box center (local origin)
    cp = closest_point_point_triangle(jnp.zeros_like(center), al, bl, cl)
    point = quat_rotate(q, cp) + center
    normal = quat_rotate(q, best_n)
    return point, normal, best_pen, hit


def heightfield_plan(scene):
    """Static (shape-type, window-size) bucketing of a scene's colliders
    for `heightfield_contacts` — all from build-time data, so the traced
    program runs ONE shape test per collider on a footprint-sized window
    instead of all three tests on the global K=8 window.

    The monolithic path computes, per collider per env: 3 shape tests x
    2*K*K triangles with K=8 (the 13-axis box SAT among them) and a
    top_k over 128 scores — 82% of BASELINE config 4's step time, where
    most colliders are gear-tooth capsules whose AABB spans ONE terrain
    cell. Shape type and a rotation-invariant AABB-extent bound are both
    static (sphere 2r; capsule |b-a|+2r; box 2|half|), so the bucketing
    is exact, not heuristic. Ref: the reference's per-collider quadtree
    walk (heightmap_collider.h iterateTrianglesInVolume) sizes its
    triangle list dynamically per collider — this is the static-capacity
    equivalent, per BUCKET instead of per collider to bound program
    variants.

    Returns {"groups": [(tag, K, idx ndarray)], "inactive": idx ndarray,
    "inv": permutation ndarray} with idx concatenation covering every
    collider exactly once; inv maps concat order back to collider order.
    """
    c = scene.colliders
    hf = scene.heightfield
    ctype = np.asarray(c.ctype)
    a = np.asarray(c.a)
    b = np.asarray(c.b)
    r = np.asarray(c.r)
    body = np.asarray(c.body)
    C = ctype.shape[0]

    ext = np.zeros(C, np.float64)
    ext = np.where(ctype == 0, 2.0 * r, ext)                        # sphere
    ext = np.where(np.isin(ctype, (1, 2)),
                   np.linalg.norm(b - a, axis=-1) + 2.0 * r,
                   ext)                                    # capsule/cylinder
    ext = np.where(ctype == 3, 2.0 * np.linalg.norm(b, axis=-1),
                   ext)                                             # box
    k_req = np.ceil(ext / hf.cell_size).astype(np.int64) + 1
    k_bucket = np.maximum(2, 2 ** np.ceil(np.log2(
        np.maximum(k_req, 1))).astype(np.int64))
    k_bucket = np.minimum(k_bucket, hf.window)

    active = (body < scene.num_bodies) & np.isin(ctype, (0, 1, 2, 3))
    groups = []
    for tag, code in (("sphere", 0), ("capsule", 1), ("box", 3)):
        tmask = active & (ctype == code)
        for K in sorted(set(k_bucket[tmask].tolist())):
            idx = np.nonzero(tmask & (k_bucket == K))[0]
            groups.append((tag, int(K), idx))
    # cylinders: the reference's per-type switch has NO cylinder case, so
    # its lowestPoint is read uninitialized (heightmap_collision.cpp:
    # 537-568) — undefined behavior its demos never hit (they drive on
    # plane ground). Deliberate deviation (documented in FIDELITY.md):
    # capsule-approximation triangle contacts (exact for the lateral
    # surface, which is what a rolling wheel touches) + the exact
    # cylinder lowest-support safety contact.
    cmask = active & (ctype == 2)
    for K in sorted(set(k_bucket[cmask].tolist())):
        idx = np.nonzero(cmask & (k_bucket == K))[0]
        groups.append(("cylinder", int(K), idx))
    inactive = np.nonzero(~active)[0]
    order = np.concatenate([g[2] for g in groups] + [inactive]) \
        if groups else inactive
    return {"groups": groups, "inactive": inactive,
            "inv": np.argsort(order)}


def _typed_group_contacts(hf: Heightfield, w, aabb_min, aabb_max,
                          idx, tag, K):
    """Per-collider terrain manifolds for one (shape-type, window) bucket.
    Same math as the monolithic per_collider path, minus the two dead
    shape tests and with a footprint-sized triangle window."""

    def per(a_, b_, r_, rot_, amin, amax):
        ta, tb, tc, vmask = _window_triangles(hf, amin, amax, K)
        if tag == "sphere":
            pts, nrm, dep, hit = jax.vmap(
                lambda x, y, z: _sphere_tri(a_, r_, x, y, z))(ta, tb, tc)
            low = a_ - jnp.array([0.0, 1.0, 0.0]) * r_
        elif tag == "capsule":
            pts, nrm, dep, hit = jax.vmap(
                lambda x, y, z: _capsule_tri(a_, b_, r_, x, y, z))(ta, tb, tc)
            low = jnp.where(a_[1] < b_[1], a_, b_) \
                - jnp.array([0.0, 1.0, 0.0]) * r_
        elif tag == "cylinder":
            # capsule-approx lateral contacts + exact lowest support:
            # lower endpoint plus the radial component of -y orthogonal
            # to the axis (see heightfield_plan).
            pts, nrm, dep, hit = jax.vmap(
                lambda x, y, z: _capsule_tri(a_, b_, r_, x, y, z))(ta, tb, tc)
            axis = b_ - a_
            u = axis / jnp.sqrt(jnp.maximum(squared_length(axis), 1e-12))
            d = jnp.array([0.0, -1.0, 0.0])
            radial = d - u * dot(d, u)
            rl = jnp.sqrt(jnp.maximum(squared_length(radial), 0.0))
            rdir = jnp.where(rl > 1e-6, radial / jnp.maximum(rl, 1e-12),
                             jnp.array([1.0, 0.0, 0.0]))
            low = jnp.where(a_[1] < b_[1], a_, b_) + r_ * rdir
        else:
            pts, nrm, dep, hit = jax.vmap(
                lambda x, y, z: _box_tri(a_, b_, rot_, x, y, z))(ta, tb, tc)
            nl = quat_inv_rotate(rot_, jnp.array([0.0, -1.0, 0.0]))
            low = a_ + quat_rotate(rot_, jnp.where(nl >= 0, b_, -b_))
        hit = hit & vmask

        # 4-deepest selection WITHOUT top_k (lowers to a sort — ~ms per
        # call per scan step on TPU) or index gathers: four rounds of
        # masked max + first-tie one-hot reduction. Matches top_k's
        # ordering (descending, stable ties).
        score = jnp.where(hit, dep, -3.4e38)
        pts4s, nrm4s, dep4s, hit4s = [], [], [], []
        for _slot in range(4):
            m = jnp.max(score)
            sel = score == m
            sel = sel & (jnp.cumsum(sel) == 1)          # first tie only
            sf = sel.astype(pts.dtype)
            pts4s.append(jnp.sum(sf[:, None] * pts, 0))
            nrm4s.append(jnp.sum(sf[:, None] * nrm, 0))
            dep4s.append(jnp.sum(sf * dep, 0))
            hit4s.append(jnp.any(sel & hit))
            score = jnp.where(sel, -3.4e38, score)
        pts4 = jnp.stack(pts4s)
        nrm4 = jnp.stack(nrm4s)
        dep4 = jnp.stack(dep4s)
        hit4 = jnp.stack(hit4s)

        # below-terrain safety contact (heightmap_collision.cpp:537-570)
        h_at = height_at(hf, low[0], low[2])
        below = low[1] < h_at
        pts4 = pts4.at[3].set(jnp.where(below, low, pts4[3]))
        nrm4 = nrm4.at[3].set(jnp.where(below,
                                        jnp.array([0.0, -1.0, 0.0]), nrm4[3]))
        dep4 = dep4.at[3].set(jnp.where(below, h_at - low[1], dep4[3]))
        hit4 = hit4.at[3].set(hit4[3] | below)
        return pts4, nrm4, dep4, hit4

    return jax.vmap(per)(w.a[idx], w.b[idx], w.r[idx], w.rot[idx],
                         aabb_min[idx], aabb_max[idx])


def heightfield_contacts(hf: Heightfield, w, body_of, aabb_min, aabb_max,
                         num_bodies, plan=None):
    """Contacts between every rigid-body collider and the terrain.
    `w`: WorldColliders. Returns flat contact arrays (C*4 slots):
    (points, normals, depths, body_a, body_b=dummy, friction, restitution,
    mask). Contact orientation matches the reference: collider is body A,
    terrain is the static dummy, normal points from collider toward terrain.

    `plan` (from `heightfield_plan`): static bucketing that runs one
    shape test per collider on a footprint-sized window; None falls back
    to the monolithic all-types K=hf.window path (identical contacts —
    a footprint-covering window sees every triangle its AABB overlaps).
    """
    C = w.ctype.shape[0]

    if plan is not None:
        parts = [_typed_group_contacts(hf, w, aabb_min, aabb_max,
                                       idx, tag, K)
                 for tag, K, idx in plan["groups"] if len(idx)]
        n_in = len(plan["inactive"])
        if n_in:
            parts.append((jnp.zeros((n_in, 4, 3)), jnp.zeros((n_in, 4, 3)),
                          jnp.zeros((n_in, 4)),
                          jnp.zeros((n_in, 4), bool)))
        pts, nrm, dep, hit = (jnp.concatenate(x)[plan["inv"]]
                              for x in zip(*parts))
        is_rb = body_of < num_bodies
        hit = hit & is_rb[:, None]
        fric = jnp.clip(jnp.sqrt(w.friction * hf.friction), 0.0, 1.0)
        rest = jnp.clip(jnp.maximum(w.restitution, hf.restitution), 0.0, 1.0)
        body_a = jnp.where(hit.any(axis=1), body_of,
                           num_bodies).astype(jnp.int32)
        body_b = jnp.full((C,), num_bodies, jnp.int32)
        return pts, nrm, dep, body_a, body_b, fric, rest, hit

    def per_collider(ci):
        ctype = w.ctype[ci]
        amin = aabb_min[ci]
        amax = aabb_max[ci]
        ta, tb, tc, vmask = _window_triangles(hf, amin, amax)

        # per-triangle tests for each supported shape, selected by type
        sp, sn, sd, sh = jax.vmap(
            lambda a, b, c: _sphere_tri(w.a[ci], w.r[ci], a, b, c))(ta, tb, tc)
        cp_, cn, cd, ch = jax.vmap(
            lambda a, b, c: _capsule_tri(w.a[ci], w.b[ci], w.r[ci], a, b, c))(ta, tb, tc)
        bp, bn, bd, bh = jax.vmap(
            lambda a, b, c: _box_tri(w.a[ci], w.b[ci], w.rot[ci], a, b, c))(ta, tb, tc)

        is_s = ctype == 0
        is_c = ctype == 1
        is_b = ctype == 3
        pts = jnp.where(is_s, sp, jnp.where(is_c, cp_, bp))
        nrm = jnp.where(is_s, sn, jnp.where(is_c, cn, bn))
        dep = jnp.where(is_s, sd, jnp.where(is_c, cd, bd))
        hit = jnp.where(is_s, sh, jnp.where(is_c, ch, bh))
        hit = hit & vmask & (is_s | is_c | is_b)

        # keep 4 deepest
        score = jnp.where(hit, dep, -3.4e38)
        _, top = jax.lax.top_k(score, 4)
        pts4 = pts[top]
        nrm4 = nrm[top]
        dep4 = dep[top]
        hit4 = hit[top]

        # safety contact (heightmap_collision.cpp:537-570): lowest support
        # point below terrain -> replace slot 3
        low_s = w.a[ci] - jnp.array([0.0, 1.0, 0.0]) * w.r[ci]
        low_c = jnp.where(w.a[ci, 1] < w.b[ci, 1], w.a[ci], w.b[ci]) \
            - jnp.array([0.0, 1.0, 0.0]) * w.r[ci]
        nl = quat_inv_rotate(w.rot[ci], jnp.array([0.0, -1.0, 0.0]))
        low_b = w.a[ci] + quat_rotate(w.rot[ci],
                                      jnp.where(nl >= 0, w.b[ci], -w.b[ci]))
        low = jnp.where(is_s, low_s, jnp.where(is_c, low_c, low_b))
        h_at = height_at(hf, low[0], low[2])
        below = low[1] < h_at
        pts4 = pts4.at[3].set(jnp.where(below, low, pts4[3]))
        nrm4 = nrm4.at[3].set(jnp.where(below,
                                        jnp.array([0.0, -1.0, 0.0]), nrm4[3]))
        dep4 = dep4.at[3].set(jnp.where(below, h_at - low[1], dep4[3]))
        hit4 = hit4.at[3].set(hit4[3] | below)

        return pts4, nrm4, dep4, hit4

    pts, nrm, dep, hit = jax.vmap(per_collider)(jnp.arange(C))
    is_rb = body_of < num_bodies
    hit = hit & is_rb[:, None]

    fric = jnp.clip(jnp.sqrt(w.friction * hf.friction), 0.0, 1.0)
    rest = jnp.clip(jnp.maximum(w.restitution, hf.restitution), 0.0, 1.0)

    # pair-major manifolds: one 4-point row per collider vs the static dummy
    body_a = jnp.where(hit.any(axis=1), body_of, num_bodies).astype(jnp.int32)
    body_b = jnp.full((C,), num_bodies, jnp.int32)
    return pts, nrm, dep, body_a, body_b, fric, rest, hit
