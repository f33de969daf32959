"""GJK/EPA validation against analytic intersection results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.ops.gjk import (gjk_intersection, support_box, support_capsule,
                             support_cylinder, support_sphere)
from dxk_tpu.ops.epa import epa

IDQ = jnp.array([0.0, 0.0, 0.0, 1.0])


def gjk_epa(sup_a, sup_b, pa, pb):
    hit, simplex = gjk_intersection(sup_a, sup_b, pa, pb)
    point, normal, depth = epa(sup_a, sup_b, pa, pb, simplex)
    return hit, point, normal, depth


class TestGJK:
    def test_sphere_sphere_hit_miss(self):
        a = (jnp.array([0.0, 0.0, 0.0]), jnp.float32(1.0))
        b_hit = (jnp.array([1.5, 0.0, 0.0]), jnp.float32(1.0))
        b_miss = (jnp.array([2.5, 0.0, 0.0]), jnp.float32(1.0))
        hit, _ = gjk_intersection(support_sphere, support_sphere, a, b_hit)
        assert bool(hit)
        hit, _ = gjk_intersection(support_sphere, support_sphere, a, b_miss)
        assert not bool(hit)

    def test_box_box_hit_miss(self):
        a = (jnp.zeros(3), jnp.ones(3), IDQ)
        b_hit = (jnp.array([1.5, 0.0, 0.0]), jnp.ones(3), IDQ)
        b_miss = (jnp.array([2.5, 0.1, 0.0]), jnp.ones(3), IDQ)
        hit, _ = gjk_intersection(support_box, support_box, a, b_hit)
        assert bool(hit)
        hit, _ = gjk_intersection(support_box, support_box, a, b_miss)
        assert not bool(hit)

    def test_capsule_box_hit_miss(self):
        box = (jnp.zeros(3), jnp.ones(3), IDQ)
        cap_hit = (jnp.array([0.0, 1.2, -0.5]), jnp.array([0.0, 1.2, 0.5]),
                   jnp.float32(0.3))
        cap_miss = (jnp.array([0.0, 1.5, -0.5]), jnp.array([0.0, 1.5, 0.5]),
                    jnp.float32(0.3))
        hit, _ = gjk_intersection(support_capsule, support_box, cap_hit, box)
        assert bool(hit)
        hit, _ = gjk_intersection(support_capsule, support_box, cap_miss, box)
        assert not bool(hit)

    def test_batch_random_spheres_match_analytic(self):
        rng = np.random.default_rng(0)
        ca = rng.normal(size=(64, 3)).astype(np.float32)
        cb = rng.normal(size=(64, 3)).astype(np.float32)
        ra = rng.uniform(0.2, 1.2, 64).astype(np.float32)
        rb = rng.uniform(0.2, 1.2, 64).astype(np.float32)
        want = np.linalg.norm(ca - cb, axis=-1) <= ra + rb

        f = jax.vmap(lambda ca, ra, cb, rb: gjk_intersection(
            support_sphere, support_sphere, (ca, ra), (cb, rb))[0])
        got = np.asarray(f(ca, ra, cb, rb))
        # GJK on smooth shapes can disagree within a tiny boundary band
        margin = np.abs(np.linalg.norm(ca - cb, axis=-1) - (ra + rb)) > 1e-3
        assert np.all(got[margin] == want[margin])


class TestEPA:
    def test_sphere_sphere_depth(self):
        a = (jnp.array([0.0, 0.0, 0.0]), jnp.float32(1.0))
        b = (jnp.array([1.5, 0.0, 0.0]), jnp.float32(1.0))
        hit, point, normal, depth = gjk_epa(support_sphere, support_sphere, a, b)
        assert bool(hit)
        assert abs(float(depth) - 0.5) < 0.05
        assert abs(float(normal[0])) > 0.99
        assert abs(float(point[0]) - 0.75) < 0.1

    def test_box_box_depth(self):
        a = (jnp.zeros(3), jnp.ones(3), IDQ)
        b = (jnp.array([1.7, 0.0, 0.0]), jnp.ones(3), IDQ)
        hit, point, normal, depth = gjk_epa(support_box, support_box, a, b)
        assert bool(hit)
        assert abs(float(depth) - 0.3) < 0.02
        assert abs(float(normal[0])) > 0.99

    def test_capsule_box_face(self):
        """Capsule lying on top of a box, sunk 0.1 into the face."""
        box = (jnp.zeros(3), jnp.ones(3), IDQ)
        cap = (jnp.array([-0.5, 1.2, 0.0]), jnp.array([0.5, 1.2, 0.0]),
               jnp.float32(0.3))
        hit, point, normal, depth = gjk_epa(support_capsule, support_box,
                                            cap, box)
        assert bool(hit)
        assert abs(float(depth) - 0.1) < 0.02
        # normal from capsule to box: -y
        assert float(normal[1]) < -0.98

    def test_deep_sphere(self):
        """Deep penetration: small sphere center inside a big box."""
        box = (jnp.zeros(3), jnp.ones(3), IDQ)
        sph = (jnp.array([0.0, 0.8, 0.0]), jnp.float32(0.1))
        hit, point, normal, depth = gjk_epa(support_sphere, support_box,
                                            sph, box)
        assert bool(hit)
        # depth: sphere bottom at 0.7... min translation is +y: 1.0-0.8+0.1=0.3
        assert abs(float(depth) - 0.3) < 0.05
        assert abs(float(normal[1])) > 0.95


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestAnalyticCylinderBoxVsEPA:
    """The analytic cylinder-box path (narrowphase.cylinder_box_contact,
    round-3 redesign) against GJK+EPA on a random soup: the boolean must
    agree exactly; depth/normal to EPA's own tolerance on the dominant
    (face/tube) features. Rim-on-edge contacts may overestimate depth (the
    candidate axis set is finite) — bounded below."""

    def _soup(self):
        key = jax.random.PRNGKey(0)
        N = 256
        ks = jax.random.split(key, 8)
        aa = jax.random.uniform(ks[0], (N, 3), jnp.float32, -1.5, 1.5)
        ab = aa + jax.random.uniform(ks[1], (N, 3), jnp.float32, -1.5, 1.5)
        ar = jax.random.uniform(ks[2], (N,), jnp.float32, 0.1, 0.5)
        bh = jax.random.uniform(ks[3], (N, 3), jnp.float32, 0.3, 1.0)
        aa = aa.at[:64, 0].set(
            jax.random.uniform(ks[4], (64,), jnp.float32, -0.5, 0.5))
        aa = aa.at[:64, 2].set(
            jax.random.uniform(ks[5], (64,), jnp.float32, -0.5, 0.5))
        aa = aa.at[:64, 1].set(
            jax.random.uniform(ks[6], (64,), jnp.float32, 0.2, 1.2))
        ab = ab.at[:64].set(aa[:64] + jnp.array([0.0, 1.0, 0.0]))
        return aa, ab, ar, bh

    def test_hit_and_depth_match(self):
        from dxk_tpu.ops import narrowphase as np_aos

        aa, ab, ar, bh = self._soup()
        N = aa.shape[0]
        bc = jnp.zeros((N, 3))
        idq = jnp.tile(jnp.array([0.0, 0, 0, 1]), (N, 1))

        def ref(a, b, r, h):
            cyl = (a, b, r)
            box = (jnp.zeros(3), h, jnp.array([0.0, 0, 0, 1]))
            hit, simplex = gjk_intersection(support_cylinder, support_box,
                                            cyl, box)
            point, normal, depth = epa(support_cylinder, support_box,
                                       cyl, box, simplex, max_iterations=24)
            return hit, normal, depth

        rhit, rn, rd = jax.vmap(ref)(aa, ab, ar, bh)
        pts, dps, nrm, cnt, hit = jax.vmap(np_aos.cylinder_box_contact)(
            aa, ab, ar, bc, bh, idq)

        hit = np.asarray(hit)
        rhit = np.asarray(rhit)
        assert (hit == rhit).mean() >= 0.995, "boolean diverges from GJK"

        both = hit & rhit & (np.asarray(rd) < 0.3)
        nd = (np.asarray(nrm) * np.asarray(rn)).sum(-1)
        dd = np.abs(np.asarray(dps)[:, 0] - np.asarray(rd))
        # ties (two near-equal MTVs) legitimately flip the normal; require
        # depth agreement there instead
        ok = (nd > 0.9) | (dd < 0.01)
        assert ok[both].mean() > 0.9, f"{(~ok[both]).sum()} outliers"
        assert np.percentile(dd[both], 90) < 0.05
        assert dd[both].max() < 0.15    # rim-edge overestimate bound


class TestAnalyticCylinderCylinderVsEPA:
    """Non-parallel analytic cylinder-cylinder (round 3) vs GJK+EPA."""

    def test_hit_and_depth_match(self):
        from dxk_tpu.ops import narrowphase as np_aos

        key = jax.random.PRNGKey(1)
        N = 256
        ks = jax.random.split(key, 8)
        aa = jax.random.uniform(ks[0], (N, 3), jnp.float32, -1.0, 1.0)
        ab = aa + jax.random.uniform(ks[1], (N, 3), jnp.float32, -1.5, 1.5)
        ar = jax.random.uniform(ks[2], (N,), jnp.float32, 0.1, 0.5)
        ba = jax.random.uniform(ks[3], (N, 3), jnp.float32, -1.0, 1.0)
        bb = ba + jax.random.uniform(ks[4], (N, 3), jnp.float32, -1.5, 1.5)
        br = jax.random.uniform(ks[5], (N,), jnp.float32, 0.1, 0.5)

        def ref(a, b, r, a2, b2, r2):
            A = (a, b, r)
            B = (a2, b2, r2)
            hit, simplex = gjk_intersection(support_cylinder,
                                            support_cylinder, A, B)
            point, normal, depth = epa(support_cylinder, support_cylinder,
                                       A, B, simplex, max_iterations=24)
            return hit, normal, depth

        rhit, rn, rd = jax.vmap(ref)(aa, ab, ar, ba, bb, br)
        pts, dps, nrm, cnt, hit = jax.vmap(
            np_aos.cylinder_cylinder_contact)(aa, ab, ar, ba, bb, br)

        u_a = (ab - aa) / jnp.linalg.norm(ab - aa, axis=-1, keepdims=True)
        u_b = (bb - ba) / jnp.linalg.norm(bb - ba, axis=-1, keepdims=True)
        nonpar = np.abs(np.asarray((u_a * u_b).sum(-1))) <= 0.99

        hit = np.asarray(hit)
        rhit = np.asarray(rhit)
        assert ((hit == rhit) | ~nonpar).mean() >= 0.995

        both = hit & rhit & nonpar & (np.asarray(rd) < 0.3)
        nd = (np.asarray(nrm) * np.asarray(rn)).sum(-1)
        dd = np.abs(np.asarray(dps)[:, 0] - np.asarray(rd))
        ok = (nd > 0.9) | (dd < 0.01)
        assert ok[both].mean() > 0.9
        assert np.percentile(dd[both], 90) < 0.05
        assert dd[both].max() < 0.15
