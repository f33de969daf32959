"""Generic convex-polytope contacts on component-major lane tuples:
exact SAT + reference-face clipping for box-hull and hull-hull pairs, and
candidate-axis SAT for cylinder-hull.

The reference resolves these pairs with GJK+EPA and emits a SINGLE
contact (collision_narrow.cpp:1150-1178 box-hull, 1045-1073
cylinder-hull, 1558-1584 hull-hull, where the multi-contact manifold is
an explicit TODO). EPA's 20-iteration-capped expanding polytope is both
unsuited to a fixed-shape TPU kernel and approximate (docs/PERF_NOTES.md
documents a catastrophic divergence on high-aspect CSOs). For POLYTOPE
pairs the separating-axis set {face normals of A, face normals of B,
edge-direction cross products} is finite and complete, so this module
computes the EXACT minimum-translation vector by brute-force SAT over
build-time-deduped axes (scene/hull_topology.py), then builds a <=4-point
manifold by Sutherland-Hodgman-clipping the incident face loop against
the reference face loop — the same machinery (and tie-break tolerances)
as box_box_cm, which itself ports the reference's OBB-OBB path
(collision_narrow.cpp:1179-1528). Flat-on-flat hull stacks get a real
4-point manifold where the reference torque-jitters on one point.

Everything is arithmetic on lane tuples, so the same code runs as the
array-of-structs narrowphase path (0-d lanes, ops/narrowphase.py
wrappers) and as the fused Pallas kernel's cm recipe — bit-identical,
which the cross-path tests pin.

Inputs are WORLD-space static lists:
  verts:  list[V] of v3             polytope vertices
  faces:  list[F] of (n v3, valid)  outward unit face normals
  loops:  list[F] of (list[LM] of v3, length lane)   ordered CCW around n
  edges:  list[E] of (d v3, valid)  unique unit edge directions
Loops must be padded to a COMMON LM across both sides (repeat last point).
"""

from __future__ import annotations

import jax.numpy as jnp

from dxk_tpu.ops.pallas.cm_narrowphase import (
    SAT_TIE_TOL, _add, _clip_one_plane_cm, _cross, _dot, _muls, _neg,
    _project_filter_cm, _reduce_manifold_cm, _sqlen, _sub, _where,
    quat_rotate_cm)

_BIG = 3.4e38


def _interval(verts, n):
    """(min, max) of dot(v, n) over a static vertex list."""
    s0 = _dot(verts[0], n)
    mn = mx = s0
    for v in verts[1:]:
        s = _dot(v, n)
        mn = jnp.minimum(mn, s)
        mx = jnp.maximum(mx, s)
    return mn, mx


def _support(verts, n):
    """Vertex of the list maximizing dot(v, n) (first max wins)."""
    best = verts[0]
    bs = _dot(best, n)
    for v in verts[1:]:
        s = _dot(v, n)
        take = s > bs
        bs = jnp.where(take, s, bs)
        best = _where(take, v, best)
    return best


def _centroid(verts):
    inv = 1.0 / len(verts)
    c = verts[0]
    for v in verts[1:]:
        c = _add(c, v)
    return _muls(c, inv)


def _sat_update(best, ov, payload, margin_tol=SAT_TIE_TOL):
    """One relative-tie-tolerance argmin step (box_box_cm semantics:
    first min wins within the margin). best = (ov, payload...); payload
    entries may be arbitrarily nested tuples of lanes."""
    import jax
    bs = best[0]
    margin = margin_tol * (jnp.abs(bs) + jnp.abs(ov)) + 1e-9
    upd = ov < bs - margin
    out = [jnp.where(upd, ov, bs)]
    for new, old in zip(payload, best[1:]):
        out.append(jax.tree_util.tree_map(
            lambda a, b: jnp.where(upd, a, b), new, old))
    return tuple(out)


def _face_scan(faces, loops, verts_self, verts_other):
    """Best (min-overlap) face axis of one side; the returned n is the
    side's OUTWARD face normal (the caller orients it A->B — it negates
    n_b when B's side wins). Overlap along an outward face normal n:
    max_self(n) - min_other(n). Returns
    (ov, n, loop_pts, loop_len, separated)."""
    zero = jnp.zeros_like(_dot(verts_self[0], verts_self[0]))
    LM = len(loops[0][0])
    best = (jnp.full_like(zero, _BIG), (zero, zero, zero),
            tuple((zero, zero, zero) for _ in range(LM)),
            jnp.zeros_like(zero, dtype=jnp.int32))
    separated = zero > jnp.ones_like(zero)      # all-False
    for (n, valid), (loop, llen) in zip(faces, loops):
        mx_s = _dot(verts_self[0], n)
        for v in verts_self[1:]:
            mx_s = jnp.maximum(mx_s, _dot(v, n))
        mn_o, _ = _interval(verts_other, n)
        ov = mx_s - mn_o
        separated = separated | (valid & (ov < 0.0))
        ov = jnp.where(valid, ov, _BIG)
        best = _sat_update(best, ov, (n, tuple(loop), llen))
    return best + (separated,)


def _edge_scan(edges_a, edges_b, verts_a, verts_b, ca, cb):
    """Best (min-overlap) edge-cross axis, oriented A->B via centroids.
    Near-parallel crosses are masked out (their face axes cover those
    configurations, as in the reference's `parallel` fallback,
    collision_narrow.cpp:1304-1317). Returns (ov, axis, da, db,
    separated)."""
    zero = jnp.zeros_like(_dot(verts_a[0], verts_a[0]))
    best = (jnp.full_like(zero, _BIG), (zero, zero, zero),
            (zero, zero, zero), (zero, zero, zero))
    separated = zero > jnp.ones_like(zero)
    cab = _sub(cb, ca)
    for da, va in edges_a:
        for db, vb in edges_b:
            ax = _cross(da, db)
            l2 = _sqlen(ax)
            ok = va & vb & (l2 > 1e-10)
            axn = _muls(ax, 1.0 / jnp.sqrt(jnp.maximum(l2, 1e-30)))
            s = jnp.where(_dot(axn, cab) < 0.0, -1.0, 1.0)
            axn = _muls(axn, s)
            mxa = _dot(verts_a[0], axn)
            for v in verts_a[1:]:
                mxa = jnp.maximum(mxa, _dot(v, axn))
            mnb = _dot(verts_b[0], axn)
            for v in verts_b[1:]:
                mnb = jnp.minimum(mnb, _dot(v, axn))
            ov = mxa - mnb
            separated = separated | (ok & (ov < 0.0))
            ov = jnp.where(ok, ov, _BIG)
            best = _sat_update(best, ov, (axn, da, db))
    return best + (separated,)


def _select_incident(faces, loops, ref_n):
    """Face of the OTHER side most antiparallel to the reference normal:
    argmax of dot(fn, -ref_n). Returns (loop_pts, loop_len)."""
    zero = jnp.zeros_like(ref_n[0])
    LM = len(loops[0][0])
    import jax
    bs = jnp.full_like(zero, -_BIG)
    bl = tuple((zero, zero, zero) for _ in range(LM))
    bn = jnp.zeros_like(zero, dtype=jnp.int32)
    for (n, valid), (loop, llen) in zip(faces, loops):
        s = jnp.where(valid, -_dot(n, ref_n), -_BIG)
        take = s > bs
        bs = jnp.where(take, s, bs)
        bl = jax.tree_util.tree_map(
            lambda a, b: jnp.where(take, a, b), tuple(loop), bl)
        bn = jnp.where(take, llen, bn)
    return bl, bn


def polytope_polytope_core(verts_a, faces_a, loops_a, edges_a,
                           verts_b, faces_b, loops_b, edges_b):
    """Exact SAT + reference-face clip between two convex polytopes.
    Returns (pts[4] v3, dps[4], normal v3 (A->B), masks[4]) in the input
    (world) space. Manifold semantics match box_box_cm: face winner ->
    clipped <=4-point manifold; edge winner -> 1 closest-point contact."""
    zero = jnp.zeros_like(_dot(verts_a[0], verts_a[0]))
    LM = len(loops_a[0][0])
    assert LM == len(loops_b[0][0]), "loops must share a common LM padding"

    ca = _centroid(verts_a)
    cb = _centroid(verts_b)

    ov_a, n_a, loop_a, len_a, sep_a = _face_scan(
        faces_a, loops_a, verts_a, verts_b)
    ov_b, n_b, loop_b, len_b, sep_b = _face_scan(
        faces_b, loops_b, verts_b, verts_a)
    ov_e, ax_e, da_e, db_e, sep_e = _edge_scan(
        edges_a, edges_b, verts_a, verts_b, ca, cb)

    hit = ~(sep_a | sep_b | sep_e)

    # 3-way winner with the same ordering/tie-break as box_box_cm
    # (faces of A, then faces of B, then edges; earlier wins ties)
    best = (ov_a, jnp.zeros_like(zero, dtype=jnp.int32))
    best = _sat_update(best, ov_b, (jnp.ones_like(best[1]),))
    best = _sat_update(best, ov_e, (jnp.full_like(best[1], 2),))
    which = best[1]
    is_face_a = which == 0
    is_face_b = which == 1
    is_edge = which == 2
    best_ov = best[0]

    # world normal pointing A -> B (face-A: +n_a; face-B: -n_b; edge: +ax)
    normal = _where(is_face_a, n_a, _where(is_face_b, _neg(n_b), ax_e))

    # ---- face case: clip incident loop against reference loop ------------
    ref_n = _where(is_face_b, n_b, n_a)          # outward from ref side
    ref_loop = _where_loop(is_face_b, loop_b, loop_a)
    ref_len = jnp.where(is_face_b, len_b, len_a)
    inc_from_b = _select_incident(faces_b, loops_b, ref_n)
    inc_from_a = _select_incident(faces_a, loops_a, ref_n)
    inc_loop = _where_loop(is_face_b, inc_from_a[0], inc_from_b[0])
    inc_len = jnp.where(is_face_b, inc_from_a[1], inc_from_b[1])

    rp_d = -_dot(ref_n, ref_loop[0])             # ref face plane offset

    S = 2 * LM
    zv = (zero, zero, zero)
    verts = list(inc_loop) + [zv] * (S - LM)
    depths = [-(_dot(v, ref_n) + rp_d) for v in inc_loop] \
        + [zero] * (S - LM)
    nn = inc_len
    for i in range(LM):
        start = ref_loop[i]
        is_wrap = jnp.asarray(i) == ref_len - 1
        end = _where(is_wrap, ref_loop[0], ref_loop[(i + 1) % LM])
        side_n = _cross(ref_n, _sub(end, start))  # inward for CCW loops
        pd = -_dot(side_n, start)
        nv, nd, nnn = _clip_one_plane_cm(verts, depths, nn, side_n, pd)
        use = jnp.asarray(i) < ref_len
        verts = [_where(use, a, b) for a, b in zip(nv, verts)]
        depths = [jnp.where(use, a, b) for a, b in zip(nd, depths)]
        nn = jnp.where(use, nnn, nn)
    verts, depths, nn = _project_filter_cm(verts, depths, nn, ref_n, rp_d)
    f_pts, f_dps, f_cnt = _reduce_manifold_cm(verts, depths, nn, normal)
    face_hit = nn > 0

    # ---- edge case: closest point between the two support LINES ----------
    # (the support vertex along the axis is an endpoint of the supporting
    # edge, so the lines through the supports with the winning directions
    # contain the witness edges)
    a_sup = _support(verts_a, ax_e)
    b_sup = _support(verts_b, _neg(ax_e))
    r = _sub(b_sup, a_sup)
    a11 = _sqlen(da_e)
    a22 = _sqlen(db_e)
    a12 = -_dot(da_e, db_e)
    b1 = _dot(da_e, r)
    b2 = -_dot(db_e, r)
    det = a11 * a22 - a12 * a12
    ok = det > 1e-12
    inv = 1.0 / jnp.where(ok, det, 1.0)
    s = jnp.where(ok, (b1 * a22 - b2 * a12) * inv, 0.0)
    t = jnp.where(ok, (a11 * b2 - a12 * b1) * inv, 0.0)
    pa = _add(a_sup, _muls(da_e, s))
    pb = _add(b_sup, _muls(db_e, t))
    e_pt = _muls(_add(pa, pb), 0.5)
    e_dp = best_ov

    pts = [_where(is_edge, e_pt, f_pts[k]) for k in range(4)]
    dps = [jnp.where(is_edge, jnp.where(k == 0, e_dp, zero), f_dps[k])
           for k in range(4)]
    count = jnp.where(is_edge, 1, f_cnt)
    hit = hit & (is_edge | face_hit)
    count = jnp.where(hit, count, 0)
    masks = [(k < count) for k in range(4)]
    return pts, dps, normal, masks


def _where_loop(c, la, lb):
    return tuple(_where(c, a, b) for a, b in zip(la, lb))


# ===========================================================================
# world-space topology builders


def box_topology_world(bc, bh, bq, LM):
    """Box (center, half-extents, quat) as world-space polytope lists:
    8 verts, 6 faces with 4-point CCW loops (padded to LM), 3 edge dirs.
    Static topology, dynamic values — lets box-hull ride the generic
    core."""
    one = jnp.ones_like(bh[0])
    zero = jnp.zeros_like(bh[0])
    true = one > zero
    ex, ey, ez = (one, zero, zero), (zero, one, zero), (zero, zero, one)
    basis = (ex, ey, ez)
    ax = [quat_rotate_cm(bq, e) for e in basis]

    def corner(sx, sy, sz):
        l = (sx * bh[0], sy * bh[1], sz * bh[2])
        return _add(quat_rotate_cm(bq, l), bc)

    verts = [corner(sx, sy, sz)
             for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
             for sz in (-1.0, 1.0)]

    faces, loops, llen = [], [], jnp.full_like(zero, 4).astype(jnp.int32)
    for i in range(3):
        j, k = (i + 1) % 3, (i + 2) % 3

        def face_loop(si, order):
            out = []
            for sj, sk in order:
                s = [0.0, 0.0, 0.0]
                s[i], s[j], s[k] = si, sj, sk
                l = (s[0] * bh[0], s[1] * bh[1], s[2] * bh[2])
                out.append(_add(quat_rotate_cm(bq, l), bc))
            while len(out) < LM:
                out.append(out[-1])
            return tuple(out)

        # CCW around the outward normal (cross(n, edge) points inward)
        faces.append((ax[i], true))
        loops.append((face_loop(1.0, ((1, -1), (1, 1), (-1, 1), (-1, -1))),
                      llen))
        faces.append((_neg(ax[i]), true))
        loops.append((face_loop(-1.0, ((-1, -1), (-1, 1), (1, 1), (1, -1))),
                      llen))
    edges = [(ax[i], true) for i in range(3)]
    return verts, faces, loops, edges


def hull_topology_world(hp, hq, vlist, flist, llist, llens, elist):
    """Rotate hull-local topology lists (from scene tables) to world.
    vlist: list[V] v3; flist: list[F] (n v3, valid); llist: list[F] of
    list[LM] v3; llens: list[F] lanes; elist: list[E] (d v3, valid)."""
    verts = [_add(quat_rotate_cm(hq, v), hp) for v in vlist]
    faces = [(quat_rotate_cm(hq, n), valid) for n, valid in flist]
    loops = [(tuple(_add(quat_rotate_cm(hq, p), hp) for p in loop), ll)
             for loop, ll in zip(llist, llens)]
    edges = [(quat_rotate_cm(hq, d), valid) for d, valid in elist]
    return verts, faces, loops, edges


def box_hull_cm(bc, bh, bq, hulls_world, LM):
    """Box vs hull via the generic polytope core (box = side a).
    hulls_world = (verts, faces, loops, edges) world lists for the hull
    side, loops padded to LM."""
    va, fa, la, ea = box_topology_world(bc, bh, bq, LM)
    vb, fb, lb, eb = hulls_world
    return polytope_polytope_core(va, fa, la, ea, vb, fb, lb, eb)


def hull_hull_cm(hulls_world_a, hulls_world_b):
    va, fa, la, ea = hulls_world_a
    vb, fb, lb, eb = hulls_world_b
    return polytope_polytope_core(va, fa, la, ea, vb, fb, lb, eb)


# ===========================================================================
# cylinder-hull: candidate-axis SAT, single contact (parity with the
# reference's GJK+EPA single contact, collision_narrow.cpp:1045-1073)


def cylinder_hull_cm(ca, cb2, cr, hulls_world):
    """Cylinder (axis endpoints ca..cb2, radius cr) vs hull. The cylinder
    is smooth, so SAT needs a CANDIDATE axis set rather than a complete
    finite one; the set below covers every feature pairing (hull face vs
    any cylinder feature, cylinder axis/cap vs hull vertex/edge, lateral
    surface vs hull edge or vertex):
      - hull face normals
      - the cylinder axis
      - hull edge dir x cylinder axis (lateral vs edge)
      - perp-from-axis toward each hull vertex (lateral/rim vs vertex)
    The cylinder's projection interval along any unit axis n is
    center +- (h |n.a| + r sqrt(1 - (n.a)^2)) — exact, so each candidate
    gives an exact overlap and the minimum is an upper bound on the true
    depth that is exact in all enumerated feature cases (the same
    best-approximation contract as the reference's capped EPA). Returns
    (pts[1], dps[1], normal (cyl->hull), masks[1])."""
    verts_h, faces_h, _loops_h, edges_h = hulls_world
    m = _muls(_add(ca, cb2), 0.5)
    axv = _sub(cb2, ca)
    hlen = 0.5 * jnp.sqrt(jnp.maximum(_sqlen(axv), 0.0))
    adir = _muls(axv, 1.0 / jnp.maximum(2.0 * hlen, 1e-30))
    zero = jnp.zeros_like(cr)

    def cyl_interval(n):
        na = _dot(n, adir)
        perp = jnp.sqrt(jnp.maximum(1.0 - na * na, 0.0))
        half = hlen * jnp.abs(na) + cr * perp
        c = _dot(m, n)
        return c - half, c + half

    best_ov = jnp.full_like(zero, _BIG)
    best_n = (zero, zero, jnp.ones_like(zero))
    separated = zero > jnp.ones_like(zero)

    def consider(best_ov, best_n, separated, n, valid):
        # two-sided overlap; normal oriented cylinder -> hull
        mna, mxa = cyl_interval(n)
        mnb, mxb = _interval(verts_h, n)
        d1 = mxa - mnb
        d2 = mxb - mna
        ov = jnp.minimum(d1, d2)
        nd = _where(d1 <= d2, n, _neg(n))
        separated = separated | (valid & (ov < 0.0))
        ov = jnp.where(valid, ov, _BIG)
        upd = ov < best_ov - (SAT_TIE_TOL * (jnp.abs(best_ov)
                                             + jnp.abs(ov)) + 1e-9)
        return (jnp.where(upd, ov, best_ov), _where(upd, nd, best_n),
                separated)

    for n, valid in faces_h:
        best_ov, best_n, separated = consider(
            best_ov, best_n, separated, n, valid)
    true = jnp.ones_like(zero) > zero
    best_ov, best_n, separated = consider(
        best_ov, best_n, separated, adir, true)
    for d, valid in edges_h:
        cx = _cross(d, adir)
        l2 = _sqlen(cx)
        ok = valid & (l2 > 1e-10)
        cxn = _muls(cx, 1.0 / jnp.sqrt(jnp.maximum(l2, 1e-30)))
        best_ov, best_n, separated = consider(
            best_ov, best_n, separated, cxn, ok)
    for v in verts_h:
        # direction from the CLAMPED closest axis point to the vertex —
        # equals the pure radial direction beside the lateral surface and
        # tilts across the cap rim for vertices beyond the caps
        w = _sub(v, m)
        t = jnp.clip(_dot(w, adir), -hlen, hlen)
        perp = _sub(w, _muls(adir, t))
        l2 = _sqlen(perp)
        ok = l2 > 1e-10
        pn = _muls(perp, 1.0 / jnp.sqrt(jnp.maximum(l2, 1e-30)))
        best_ov, best_n, separated = consider(
            best_ov, best_n, separated, pn, ok)

    # ---- support-witness descent refinement --------------------------------
    # The candidate set misses rim-vs-edge configurations (the true MTV
    # there is perpendicular to the hull edge AND tangent to the cap rim).
    # At any local optimum of overlap(n) = max_cyl(n) - min_hull(n) the
    # witness difference w_cyl(n) - w_hull(-n) is PARALLEL to n (scaled by
    # the signed overlap), so iterate n <- normalize(sign(ov) * (w_c - w_h))
    # from the best SAT axis, keeping the minimum — pure arithmetic, can
    # only improve the bound, and finds separations the candidates miss.
    def cyl_support(n):
        na = _dot(n, adir)
        perp = _sub(n, _muls(adir, na))
        pl = jnp.sqrt(jnp.maximum(_sqlen(perp), 0.0))
        pdir = _muls(perp, 1.0 / jnp.maximum(pl, 1e-30))
        sgn = jnp.where(na >= 0.0, 1.0, -1.0)
        return _add(m, _add(_muls(adir, hlen * sgn),
                            _muls(pdir, jnp.where(pl > 1e-6, cr, 0.0))))

    def overlap_along(n):
        na = _dot(n, adir)
        half = hlen * jnp.abs(na) + cr * jnp.sqrt(
            jnp.maximum(1.0 - na * na, 0.0))
        mn_h, _ = _interval(verts_h, n)
        return _dot(m, n) + half - mn_h

    # probe follows the fixed point unconditionally; best keeps the min
    probe_n, probe_ov = best_n, best_ov
    for _ in range(8):
        w_c = cyl_support(probe_n)
        w_h = _support(verts_h, _neg(probe_n))
        d = _sub(w_c, w_h)
        d = _muls(d, jnp.where(probe_ov >= 0.0, 1.0, -1.0))
        dl = jnp.sqrt(jnp.maximum(_sqlen(d), 0.0))
        ok = dl > 1e-9
        probe_n = _where(ok, _muls(d, 1.0 / jnp.maximum(dl, 1e-30)),
                         probe_n)
        probe_ov = overlap_along(probe_n)
        take = probe_ov < best_ov
        best_ov = jnp.where(take, probe_ov, best_ov)
        best_n = _where(take, probe_n, best_n)

    # ---- exact boolean gate: distance GJK (gjk_distance.py) --------------
    # The candidate set + descent can still miss a SEPARATING axis in
    # rim-vs-edge configurations (measured: a false hit at true gap 5e-3).
    # The distance GJK is exact for separated convex shapes (supports are
    # closed-form), so it decides the boolean; SAT provides the depth.
    from dxk_tpu.ops.pallas.cm_hull import sup_verts
    from dxk_tpu.ops.pallas.gjk_distance import gjk_distance

    def sup_cyl(params, d):
        _ = params
        return cyl_support(d)

    dist, _qa, _qb, overlap = gjk_distance(
        sup_cyl, lambda vl, d: sup_verts(vl, d), None, verts_h,
        max_iterations=16)
    hit = (best_ov >= 0.0) & ~separated & (overlap | (dist < 1e-5))
    n = best_n                                   # cylinder -> hull
    # support point of the cylinder along +n, pulled back half the depth
    # (same support fn the SAT/descent optimized, so the witness is
    # consistent with the reported axis)
    pt = _sub(cyl_support(n), _muls(n, 0.5 * best_ov))
    return [pt], [best_ov], n, [hit]
