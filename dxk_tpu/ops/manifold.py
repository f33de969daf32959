"""Fixed-capacity contact-manifold machinery.

TPU-native versions of the reference's clipping helpers
(/root/reference/src/physics/collision_narrow.cpp:56-372):

  - `sutherland_hodgman`: polygon clipping with static-size (8-slot) buffers
    and a traced vertex count, replacing the dynamic clipping_polygon.
  - `reduce_manifold`: Dirk Gregorius' 4-point manifold reduction
    (deepest/farthest/max-area selection, findStableContactManifold,
    collision_narrow.cpp:56-146).

A polygon is (verts (S,3), depths (S,), n ()) where slots [0, n) are valid.
S = 8 suffices: a quad clipped by 4 planes gains at most one vertex per plane.
"""

from __future__ import annotations

import jax.numpy as jnp

import jax

from dxk_tpu.core.maths import cross, dot, get_tangent, lerp


def _scatter_rows(indices, values, out_rows):
    """Write rows at unique `indices` (drop >= out_rows) via a one-hot
    matmul — XLA's batched scatter lowers pathologically on TPU."""
    oh = jax.nn.one_hot(indices, out_rows, dtype=values.dtype)   # (K, R)
    return jnp.einsum("kr,kd->rd", oh, values)


def _scatter_vals(indices, values, out_rows):
    oh = jax.nn.one_hot(indices, out_rows, dtype=values.dtype)
    return jnp.einsum("kr,k->r", oh, values)

POLY_SLOTS = 8
_NEG = -3.4e38
# RELATIVE tie margin for reduce_manifold's vertex selection (a later
# vertex must beat the incumbent by REDUCE_TIE_TOL * (|best| + |cand|);
# scale-invariant). Must stay equal to the copy in
# ops/pallas/cm_narrowphase.py.
REDUCE_TIE_TOL = 1e-4


def signed_distance(p, plane):
    """plane = (nx, ny, nz, d); distance = n.p + d (createPlane semantics)."""
    return dot(p, plane[..., :3]) + plane[..., 3]


def make_plane(point, normal):
    return jnp.concatenate([normal, -dot(normal, point)[..., None]], axis=-1)


def _clip_one_plane(verts, depths, n, plane):
    """One Sutherland-Hodgman pass (collision_narrow.cpp:166-212) with
    masked fixed-size buffers. Emits, per input edge (v_i -> v_{i+1 mod n}):
      both inside    -> [end]
      start inside   -> [clip]
      end inside     -> [clip, end]
      neither        -> []
    """
    S = verts.shape[0]
    idx = jnp.arange(S)
    n_safe = jnp.maximum(n, 1)
    valid = idx < n
    nxt = (idx + 1) % n_safe

    start_v, start_d = verts, depths
    oh_nxt = jax.nn.one_hot(nxt, S, dtype=verts.dtype)
    end_v = jnp.einsum("ks,sd->kd", oh_nxt, verts)
    end_d = jnp.einsum("ks,s->k", oh_nxt, depths)

    sd_start = signed_distance(start_v, plane)
    sd_end = signed_distance(end_v, plane)
    start_in = sd_start > 0.0
    end_in = sd_end > 0.0

    # interpolated clip point (clipAgainstPlane, collision_narrow.cpp:154-163)
    a_abs = jnp.abs(sd_start)
    t = a_abs / jnp.maximum(a_abs + jnp.abs(sd_end), 1e-12)
    clip_v = lerp(start_v, end_v, t[:, None])
    clip_d = lerp(start_d, end_d, t)

    emit_clip = (start_in != end_in) & valid
    emit_end = end_in & valid
    count = emit_clip.astype(jnp.int32) + emit_end.astype(jnp.int32)
    offset = jnp.cumsum(count) - count
    new_n = jnp.sum(count)

    first_v = jnp.where(emit_clip[:, None], clip_v, end_v)
    first_d = jnp.where(emit_clip, clip_d, end_d)
    first_ok = count >= 1
    second_ok = count == 2

    drop = S  # out-of-range index row is sliced off (one-hot drops >= S)
    i1 = jnp.where(first_ok, offset, drop)
    i2 = jnp.where(second_ok, offset + 1, drop)

    # write targets are unique, so two one-hot accumulations == set
    out_v = _scatter_rows(i1, first_v, S) + _scatter_rows(i2, end_v, S)
    out_d = _scatter_vals(i1, first_d, S) + _scatter_vals(i2, end_d, S)
    return out_v, out_d, new_n


def sutherland_hodgman(verts, depths, n, planes):
    """Clip polygon against a static list of planes (planes: (P, 4))."""
    for i in range(planes.shape[0]):
        verts, depths, n = _clip_one_plane(verts, depths, n, planes[i])
    return verts, depths, n


def project_and_filter(verts, depths, n, ref_plane):
    """Post-clip step of clipPointsAndBuildContact
    (collision_narrow.cpp:339-369): drop points with depth < 0 and project
    the survivors onto the reference plane. Compacts valid slots to the
    front. Returns (verts, depths, n)."""
    S = verts.shape[0]
    idx = jnp.arange(S)
    valid = (idx < n) & (depths >= 0.0)
    verts = verts + ref_plane[:3] * depths[:, None]

    keep = valid.astype(jnp.int32)
    offset = jnp.cumsum(keep) - keep
    new_n = jnp.sum(keep)
    tgt = jnp.where(valid, offset, S)
    out_v = _scatter_rows(tgt, verts, S)
    out_d = _scatter_vals(tgt, depths, S)
    return out_v, out_d, new_n


def reduce_manifold(verts, depths, n, normal):
    """findStableContactManifold (collision_narrow.cpp:56-146): keep at most
    4 points. Returns (points (4,3), pen_depths (4,), count ())."""
    S = verts.shape[0]
    idx = jnp.arange(S)
    valid = idx < n

    def masked_argmax(scores):
        # Sequential first-wins max with a tie margin: a later slot must
        # beat the incumbent by REDUCE_TIE_TOL. Keeps this path and the
        # component-major Pallas port (cm_narrowphase._reduce_manifold_cm)
        # picking the same vertices when scores tie at float-noise level.
        scores = jnp.where(valid, scores, _NEG)
        best = scores[0]
        bi = jnp.int32(0)
        for k in range(1, S):
            upd = scores[k] > best + (
                REDUCE_TIE_TOL * (jnp.abs(best) + jnp.abs(scores[k])) + 1e-9)
            best = jnp.where(upd, scores[k], best)
            bi = jnp.where(upd, k, bi)
        return bi

    def row(i):
        oh = jax.nn.one_hot(i, S, dtype=verts.dtype)
        return oh @ verts

    # 1: extreme along a fixed tangent direction
    search = get_tangent(normal)
    i0 = masked_argmax(dot(verts, search))
    p0 = row(i0)

    # 2: farthest from first (reference starts bestDistance at 0 over all)
    i1 = masked_argmax(jnp.sum((verts - p0) ** 2, axis=-1))
    p1 = row(i1)

    # 3: max signed triangle area with (p0, p1)
    qa = p0 - verts
    qb = p1 - verts
    area3 = 0.5 * dot(cross(qa, qb), normal)
    i2 = masked_argmax(area3)
    p2 = row(i2)

    # 4: max of the three sub-areas
    qc = p2 - verts
    a1 = 0.5 * dot(cross(qa, qb), normal)
    a2 = 0.5 * dot(cross(qb, qc), normal)
    a3 = 0.5 * dot(cross(qc, qa), normal)
    i3 = masked_argmax(jnp.maximum(jnp.maximum(a1, a2), a3))

    sel = jnp.stack([i0, i1, i2, i3])
    oh_sel = jax.nn.one_hot(sel, S, dtype=verts.dtype)
    reduced_v = oh_sel @ verts
    reduced_d = oh_sel @ depths

    # if n <= 4: keep the first n slots verbatim
    keep_v = verts[:4]
    keep_d = depths[:4]
    use_reduced = n > 4
    out_v = jnp.where(use_reduced, reduced_v, keep_v)
    out_d = jnp.where(use_reduced, reduced_d, keep_d)
    count = jnp.where(use_reduced, 4, n)
    return out_v, out_d, count
