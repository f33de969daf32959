"""Component-major narrowphase recipes (ops/pallas/cm_narrowphase.py) vs
their array-of-structs siblings (ops/narrowphase.py) on random pair soups.

The cm recipes feed the fused physics kernel; the AoS recipes are the
reference-cited canonical path. Same math, different layout — results must
agree elementwise (capsule-box up to manifold point ORDER, which the AoS
path's reduce_manifold heuristic may permute)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.ops import narrowphase as np_aos
from dxk_tpu.ops.pallas import cm_narrowphase as cm

N = 256


def _rand(key, lo, hi, shape):
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


def _v3(x):
    """(N, 3) -> v3 of (N,)"""
    return (x[:, 0], x[:, 1], x[:, 2])


def _q4(x):
    return (x[:, 0], x[:, 1], x[:, 2], x[:, 3])


def _norm_quat(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


class TestCapsuleCapsule:
    def test_matches_aos(self):
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 6)
        aa = _rand(ks[0], -1, 1, (N, 3))
        ab = aa + _rand(ks[1], -1.2, 1.2, (N, 3))
        ba = _rand(ks[2], -1, 1, (N, 3))
        bb = ba + _rand(ks[3], -1.2, 1.2, (N, 3))
        ar = _rand(ks[4], 0.1, 0.6, (N,))
        br = _rand(ks[5], 0.1, 0.6, (N,))
        # include exactly-parallel cases
        bb = bb.at[:64].set(ba[:64] + (ab[:64] - aa[:64]))
        bb = bb.at[64:96].set(ba[64:96] - (ab[64:96] - aa[64:96]))

        pts, dps, nrm, cnt, hit = jax.vmap(np_aos.capsule_capsule_contact)(
            aa, ab, ar, ba, bb, br)
        c_pts, c_dps, c_nrm, c_mask = cm.capsule_capsule_cm(
            _v3(aa), _v3(ab), ar, _v3(ba), _v3(bb), br)

        mask_aos = np.asarray(hit)[:, None] & (np.arange(4)[None, :]
                                               < np.asarray(cnt)[:, None])
        c_mask = np.stack([np.asarray(m) for m in c_mask], 1)
        assert np.array_equal(c_mask, mask_aos[:, :2]), "live masks differ"
        for k in range(2):
            live = mask_aos[:, k]
            got_p = np.stack([np.asarray(c) for c in c_pts[k]], -1)[live]
            want_p = np.asarray(pts)[live, k]
            assert np.allclose(got_p, want_p, atol=1e-5)
            assert np.allclose(np.asarray(c_dps[k])[live],
                               np.asarray(dps)[live, k], atol=1e-5)
        live = mask_aos[:, 0]
        got_n = np.stack([np.asarray(c) for c in c_nrm], -1)[live]
        assert np.allclose(got_n, np.asarray(nrm)[live], atol=1e-5)


class TestCapsuleBox:
    def test_matches_aos(self):
        key = jax.random.PRNGKey(1)
        ks = jax.random.split(key, 6)
        aa = _rand(ks[0], -1.5, 1.5, (N, 3))
        ab = aa + _rand(ks[1], -1.5, 1.5, (N, 3))
        ar = _rand(ks[2], 0.1, 0.5, (N,))
        bc = _rand(ks[3], -0.5, 0.5, (N, 3))
        bh = _rand(ks[4], 0.2, 1.0, (N, 3))
        bq = _norm_quat(_rand(ks[5], -1, 1, (N, 4)))
        # axis-aligned + face-parallel cases (enrichment path)
        bq = bq.at[:96].set(jnp.array([0.0, 0, 0, 1]))
        ab = ab.at[:48, 1].set(aa[:48, 1])          # horizontal capsules
        ab = ab.at[:48, 2].set(aa[:48, 2])

        pts, dps, nrm, cnt, hit = jax.vmap(np_aos.capsule_box_contact)(
            aa, ab, ar, bc, bh, bq)
        c_pts, c_dps, c_nrm, c_mask = cm.capsule_box_cm(
            _v3(aa), _v3(ab), ar, _v3(bc), _v3(bh), _q4(bq))

        cnt_aos = np.asarray(cnt) * np.asarray(hit)
        c_mask_np = np.stack([np.asarray(m) for m in c_mask], 1)
        cnt_cm = c_mask_np.sum(1)
        agree = cnt_aos == cnt_cm
        # live-count agreement on the vast majority (boundary cases where
        # a clipped endpoint sits exactly on depth 0 may differ)
        assert agree.mean() > 0.97, (1 - agree.mean())

        # normals match where both report the same single point
        one = agree & (cnt_aos == 1)
        got_n = np.stack([np.asarray(c) for c in c_nrm], -1)
        assert np.allclose(got_n[one], np.asarray(nrm)[one], atol=1e-4)
        got_p0 = np.stack([np.asarray(c) for c in c_pts[0]], -1)
        assert np.allclose(got_p0[one], np.asarray(pts)[one, 0], atol=1e-4)
        assert np.allclose(np.asarray(c_dps[0])[one],
                           np.asarray(dps)[one, 0], atol=1e-4)

        # 2-point manifolds: same point SET (order may differ via
        # reduce_manifold's heuristic)
        two = agree & (cnt_aos == 2)
        if two.any():
            got = np.stack(
                [np.stack([np.asarray(c) for c in c_pts[k]], -1)
                 for k in range(2)], 1)[two]              # (M, 2, 3)
            want = np.asarray(pts)[two][:, :2]
            d_direct = (np.abs(got - want).max(-1)).max(-1)
            d_swap = (np.abs(got[:, ::-1] - want).max(-1)).max(-1)
            assert np.minimum(d_direct, d_swap).max() < 1e-3


def test_sphere_cylinder():
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 5)
    sc = _rand(ks[0], -1, 1, (N, 3))
    sr = _rand(ks[1], 0.1, 0.7, (N,))
    ca = _rand(ks[2], -1, 1, (N, 3))
    cb = ca + _rand(ks[3], -1.2, 1.2, (N, 3))
    cr = _rand(ks[4], 0.1, 0.5, (N,))
    pts, dps, nrm, cnt, hit = jax.vmap(np_aos.sphere_cylinder_contact)(
        sc, sr, ca, cb, cr)
    p, d, n, h = cm.sphere_cylinder_cm(_v3(sc), sr, _v3(ca), _v3(cb), cr)
    live = np.asarray(hit)
    assert np.array_equal(np.asarray(h), live)
    assert np.allclose(np.stack([np.asarray(x) for x in p], -1)[live],
                       np.asarray(pts)[live, 0], atol=1e-5)
    assert np.allclose(np.asarray(d)[live], np.asarray(dps)[live, 0],
                       atol=1e-5)
    got_n = np.stack([np.asarray(x) for x in n], -1)
    assert np.allclose(got_n[live], np.asarray(nrm)[live], atol=1e-5)


def test_capsule_cylinder():
    key = jax.random.PRNGKey(12)
    ks = jax.random.split(key, 6)
    aa = _rand(ks[0], -1, 1, (N, 3))
    ab = aa + _rand(ks[1], -1.2, 1.2, (N, 3))
    ba = _rand(ks[2], -1, 1, (N, 3))
    bb = ba + _rand(ks[3], -1.2, 1.2, (N, 3))
    ar = _rand(ks[4], 0.1, 0.6, (N,))
    br = _rand(ks[5], 0.1, 0.6, (N,))
    # exactly-parallel cases
    bb = bb.at[:64].set(ba[:64] + (ab[:64] - aa[:64]))
    bb = bb.at[64:96].set(ba[64:96] - (ab[64:96] - aa[64:96]))

    pts, dps, nrm, cnt, hit = jax.vmap(np_aos.capsule_cylinder_contact)(
        aa, ab, ar, ba, bb, br)
    c_pts, c_dps, c_nrm, c_mask = cm.capsule_cylinder_cm(
        _v3(aa), _v3(ab), ar, _v3(ba), _v3(bb), br)

    mask_aos = np.asarray(hit)[:, None] & (np.arange(4)[None, :]
                                           < np.asarray(cnt)[:, None])
    c_mask = np.stack([np.asarray(m) for m in c_mask], 1)
    assert np.array_equal(c_mask, mask_aos[:, :2]), "live masks differ"
    for k in range(2):
        live = mask_aos[:, k]
        got_p = np.stack([np.asarray(c) for c in c_pts[k]], -1)[live]
        assert np.allclose(got_p, np.asarray(pts)[live, k], atol=1e-5)
        assert np.allclose(np.asarray(c_dps[k])[live],
                           np.asarray(dps)[live, k], atol=1e-5)


class TestBoxBox:
    def test_matches_aos(self):
        key = jax.random.PRNGKey(7)
        ks = jax.random.split(key, 6)
        ca = _rand(ks[0], -0.5, 0.5, (N, 3))
        ha = _rand(ks[1], 0.2, 0.8, (N, 3))
        qa = _norm_quat(_rand(ks[2], -1, 1, (N, 4)))
        cb = ca + _rand(ks[3], -1.0, 1.0, (N, 3))
        hb = _rand(ks[4], 0.2, 0.8, (N, 3))
        qb = _norm_quat(_rand(ks[5], -1, 1, (N, 4)))
        # stacked axis-aligned cases (the box-bench regime: face contacts,
        # parallel SAT fallback) in the first quarter
        ident = jnp.array([0.0, 0, 0, 1])
        qa = qa.at[:64].set(ident)
        qb = qb.at[:64].set(ident)
        cb = cb.at[:64, 0].set(ca[:64, 0] + 0.1)
        cb = cb.at[:64, 2].set(ca[:64, 2] - 0.05)
        cb = cb.at[:64, 1].set(ca[:64, 1] + ha[:64, 1] + hb[:64, 1] - 0.02)

        pts, dps, nrm, cnt, hit = jax.vmap(np_aos.box_box_contact)(
            ca, ha, qa, cb, hb, qb)
        c_pts, c_dps, c_nrm, c_mask = cm.box_box_cm(
            _v3(ca), _v3(ha), _q4(qa), _v3(cb), _v3(hb), _q4(qb))

        cnt_aos = np.asarray(cnt) * np.asarray(hit)
        c_mask_np = np.stack([np.asarray(m) for m in c_mask], 1)
        cnt_cm = c_mask_np.sum(1)
        agree = cnt_aos == cnt_cm
        assert agree.mean() > 0.97, (1 - agree.mean())

        got_n = np.stack([np.asarray(c) for c in c_nrm], -1)
        live = agree & (cnt_aos > 0)
        assert np.allclose(got_n[live], np.asarray(nrm)[live], atol=1e-4)

        got = np.stack(
            [np.stack([np.asarray(c) for c in c_pts[k]], -1)
             for k in range(4)], 1)                        # (N, 4, 3)
        gd = np.stack([np.asarray(d) for d in c_dps], 1)   # (N, 4)
        want = np.asarray(pts)
        wd = np.asarray(dps)
        # point SETS must match (reduce_manifold order is heuristic)
        for idx in np.nonzero(live)[0][:200]:
            k = cnt_aos[idx]
            a = got[idx][c_mask_np[idx]]
            b = want[idx, :k]
            da = np.abs(a[:, None, :] - b[None, :, :]).max(-1).min(-1)
            assert da.max() < 1e-3, (idx, a, b)
            assert np.allclose(np.sort(gd[idx][c_mask_np[idx]]),
                               np.sort(wd[idx, :k]), atol=1e-3)


def test_sphere_sphere():
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 4)
    c1 = _rand(ks[0], -1, 1, (N, 3))
    c2 = _rand(ks[1], -1, 1, (N, 3))
    r1 = _rand(ks[2], 0.1, 0.8, (N,))
    r2 = _rand(ks[3], 0.1, 0.8, (N,))
    pts, dps, nrm, cnt, hit = jax.vmap(np_aos.sphere_sphere_contact)(
        c1, r1, c2, r2)
    p, d, n, h = cm.sphere_sphere_cm(_v3(c1), r1, _v3(c2), r2)
    assert np.array_equal(np.asarray(h), np.asarray(hit))
    live = np.asarray(hit)
    assert np.allclose(np.stack([np.asarray(x) for x in p], -1)[live],
                       np.asarray(pts)[live, 0], atol=1e-6)
    assert np.allclose(np.asarray(d)[live], np.asarray(dps)[live, 0],
                       atol=1e-6)


def test_sphere_capsule_and_box():
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 8)
    sc = _rand(ks[0], -1, 1, (N, 3))
    sr = _rand(ks[1], 0.1, 0.7, (N,))
    ca = _rand(ks[2], -1, 1, (N, 3))
    cb = ca + _rand(ks[3], -1.2, 1.2, (N, 3))
    cr = _rand(ks[4], 0.1, 0.5, (N,))
    pts, dps, nrm, cnt, hit = jax.vmap(np_aos.sphere_capsule_contact)(
        sc, sr, ca, cb, cr)
    p, d, n, h = cm.sphere_capsule_cm(_v3(sc), sr, _v3(ca), _v3(cb), cr)
    live = np.asarray(hit)
    assert np.array_equal(np.asarray(h), live)
    assert np.allclose(np.stack([np.asarray(x) for x in p], -1)[live],
                       np.asarray(pts)[live, 0], atol=1e-5)

    bc = _rand(ks[5], -0.5, 0.5, (N, 3))
    bh = _rand(ks[6], 0.2, 1.0, (N, 3))
    bq = _norm_quat(_rand(ks[7], -1, 1, (N, 4)))
    pts, dps, nrm, cnt, hit = jax.vmap(np_aos.sphere_box_contact)(
        sc, sr, bc, bh, bq)
    p, d, n, h = cm.sphere_box_cm(_v3(sc), sr, _v3(bc), _v3(bh), _q4(bq))
    live = np.asarray(hit)
    assert np.array_equal(np.asarray(h), live)
    assert np.allclose(np.stack([np.asarray(x) for x in p], -1)[live],
                       np.asarray(pts)[live, 0], atol=1e-5)
    assert np.allclose(np.asarray(d)[live], np.asarray(dps)[live, 0],
                       atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestCylinderBox:
    def test_matches_aos(self):
        """cylinder_box_cm vs the AoS analytic path: same construction on
        both sides (exact boolean + SAT-MTV + interval clip / cap ring), so
        agreement is to fp epsilon — including manifold structure."""
        key = jax.random.PRNGKey(7)
        ks = jax.random.split(key, 9)
        aa = _rand(ks[0], -1.5, 1.5, (N, 3))
        ab = aa + _rand(ks[1], -1.5, 1.5, (N, 3))
        ar = _rand(ks[2], 0.1, 0.5, (N,))
        bc = _rand(ks[3], -0.3, 0.3, (N, 3))
        bh = _rand(ks[4], 0.3, 1.0, (N, 3))
        bq = _norm_quat(_rand(ks[5], -1, 1, (N, 4)))
        # upright cap-on-face (ring) + lying tube-on-face (clip) chunks
        bq = bq.at[:128].set(jnp.array([0.0, 0, 0, 1]))
        aa = aa.at[:64, 1].set(_rand(ks[6], 0.3, 1.3, (64,)))
        ab = ab.at[:64].set(aa[:64] + jnp.array([0.0, 1.0, 0.0]))
        ab = ab.at[64:128, 1].set(aa[64:128, 1])

        pts, dps, nrm, cnt, hit = jax.vmap(np_aos.cylinder_box_contact)(
            aa, ab, ar, bc, bh, bq)
        c_pts, c_dps, c_nrm, c_mask = cm.cylinder_box_cm(
            _v3(aa), _v3(ab), ar, _v3(bc), _v3(bh), _q4(bq))

        cnt_aos = np.asarray(cnt) * np.asarray(hit)
        c_mask_np = np.stack([np.asarray(m) for m in c_mask], 1)
        assert np.array_equal(c_mask_np.sum(1), cnt_aos), "counts differ"

        # atol 1e-3: the two compilations' alternating-projection iterates
        # carry different fp dust on slow-converging (grazing) configs —
        # same feature and depth; an algorithmic divergence shows as >=0.1
        hits = np.asarray(hit)
        got_n = np.stack([np.asarray(c) for c in c_nrm], -1)
        assert np.allclose(got_n[hits], np.asarray(nrm)[hits], atol=1e-3)
        for k in range(4):
            live = hits & c_mask_np[:, k]
            if not live.any():
                continue
            gp = np.stack([np.asarray(c) for c in c_pts[k]], -1)[live]
            assert np.allclose(gp, np.asarray(pts)[live, k], atol=1e-3)
            assert np.allclose(np.asarray(c_dps[k])[live],
                               np.asarray(dps)[live, k], atol=1e-3)
        # every structural case must actually occur in the soup
        assert (cnt_aos == 1).any() and (cnt_aos == 2).any() \
            and (cnt_aos == 4).any()


class TestCylinderCylinder:
    def test_matches_aos(self):
        """cylinder_cylinder_cm vs the AoS path across all four manifold
        structures (cap ring / tube-2 / single cap / non-parallel)."""
        key = jax.random.PRNGKey(2)
        ks = jax.random.split(key, 8)
        aa = _rand(ks[0], -1.0, 1.0, (N, 3))
        ab = aa + _rand(ks[1], -1.5, 1.5, (N, 3))
        ar = _rand(ks[2], 0.1, 0.5, (N,))
        ba = _rand(ks[3], -1.0, 1.0, (N, 3))
        bb = ba + _rand(ks[4], -1.5, 1.5, (N, 3))
        br = _rand(ks[5], 0.1, 0.5, (N,))
        bb = bb.at[:48].set(ba[:48] + (ab[:48] - aa[:48]))
        ba = ba.at[:24].set(aa[:24] + 0.97 * (ab[:24] - aa[:24]) + 0.05)
        bb = bb.at[:24].set(ba[:24] + (ab[:24] - aa[:24]))
        bb = bb.at[48:80].set(ba[48:80] - (ab[48:80] - aa[48:80]))

        pts, dps, nrm, cnt, hit = jax.vmap(
            np_aos.cylinder_cylinder_contact)(aa, ab, ar, ba, bb, br)
        c_pts, c_dps, c_nrm, c_mask = cm.cylinder_cylinder_cm(
            _v3(aa), _v3(ab), ar, _v3(ba), _v3(bb), br)

        cnt_aos = np.asarray(cnt) * np.asarray(hit)
        c_mask_np = np.stack([np.asarray(m) for m in c_mask], 1)
        assert np.array_equal(c_mask_np.sum(1), cnt_aos), "counts differ"

        hits = np.asarray(hit)
        got_n = np.stack([np.asarray(c) for c in c_nrm], -1)
        assert np.allclose(got_n[hits], np.asarray(nrm)[hits], atol=1e-3)
        for k in range(4):
            live = hits & c_mask_np[:, k]
            if not live.any():
                continue
            gp = np.stack([np.asarray(c) for c in c_pts[k]], -1)[live]
            assert np.allclose(gp, np.asarray(pts)[live, k], atol=1e-3)
            assert np.allclose(np.asarray(c_dps[k])[live],
                               np.asarray(dps)[live, k], atol=1e-3)
        assert (cnt_aos == 1).any() and (cnt_aos == 2).any() \
            and (cnt_aos == 4).any()
