"""Editor-picking ray tests added for full bounding-volume parity
(ray::intersectPlane/Disk/Rectangle/Triangle/Torus,
/root/reference/src/physics/bounding_volumes.cpp:197-265 and the
disk/rect/torus suite) — VERDICT r3 missing #4."""

import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.ops.raycast import (ray_disk, ray_plane, ray_rect, ray_torus,
                                 ray_triangle)

O = jnp.asarray([0.0, 5.0, 0.0])
DOWN = jnp.asarray([0.0, -1.0, 0.0])
UP = jnp.asarray([0.0, 1.0, 0.0])


class TestPlaneDiskRect:
    def test_plane_hit(self):
        t, hit = ray_plane(O, DOWN, UP, jnp.zeros(3))
        assert bool(hit) and float(t) == pytest.approx(5.0)

    def test_plane_parallel_misses(self):
        t, hit = ray_plane(O, jnp.asarray([1.0, 0.0, 0.0]), UP, jnp.zeros(3))
        assert not bool(hit)

    def test_plane_behind_misses(self):
        t, hit = ray_plane(O, UP, UP, jnp.zeros(3))
        assert not bool(hit)

    def test_disk_inside_radius(self):
        t, hit = ray_disk(O, DOWN, jnp.asarray([0.2, 0.0, 0.1]), UP, 0.5)
        assert bool(hit) and float(t) == pytest.approx(5.0)

    def test_disk_outside_radius(self):
        _, hit = ray_disk(O, DOWN, jnp.asarray([1.0, 0.0, 0.0]), UP, 0.5)
        assert not bool(hit)

    def test_rect_inside(self):
        tg = jnp.asarray([1.0, 0.0, 0.0])
        bt = jnp.asarray([0.0, 0.0, 1.0])
        t, hit = ray_rect(jnp.asarray([0.3, 5.0, -0.1]), DOWN,
                          jnp.zeros(3), tg, bt, jnp.asarray([0.5, 0.2]))
        assert bool(hit) and float(t) == pytest.approx(5.0)

    def test_rect_outside_one_axis(self):
        tg = jnp.asarray([1.0, 0.0, 0.0])
        bt = jnp.asarray([0.0, 0.0, 1.0])
        _, hit = ray_rect(jnp.asarray([0.3, 5.0, 0.3]), DOWN,
                          jnp.zeros(3), tg, bt, jnp.asarray([0.5, 0.2]))
        assert not bool(hit)


class TestTriangle:
    A = jnp.asarray([-1.0, 0.0, -1.0])
    B = jnp.asarray([1.0, 0.0, -1.0])
    C = jnp.asarray([0.0, 0.0, 1.0])

    def test_hit_centroid(self):
        t, hit, front = ray_triangle(O, DOWN, self.A, self.B, self.C)
        assert bool(hit) and float(t) == pytest.approx(5.0)

    def test_miss_outside(self):
        o = jnp.asarray([2.0, 5.0, 0.0])
        _, hit, _ = ray_triangle(o, DOWN, self.A, self.B, self.C)
        assert not bool(hit)

    def test_front_facing_flag(self):
        # winding A,B,C has normal noz(cross(B-A, C-A)) = -y; the upward
        # ray faces the front (nDotR < 0, bounding_volumes.cpp:263)
        _, hit, front = ray_triangle(O, DOWN, self.A, self.B, self.C)
        assert bool(hit) and not bool(front)
        _, hit2, front2 = ray_triangle(-O, UP, self.A, self.B, self.C)
        assert bool(hit2) and bool(front2)


class TestTorus:
    def test_hit_tube_from_above(self):
        # torus in xz plane, major R=1, tube r=0.25: a ray straight down
        # over (1, 0) hits the tube top at y=0.25 -> t = 5 - 0.25
        o = jnp.asarray([1.0, 5.0, 0.0])
        t, hit = ray_torus(o, DOWN, jnp.zeros(3), UP, 1.0, 0.25)
        assert bool(hit)
        assert float(t) == pytest.approx(4.75, abs=5e-3)

    def test_through_hole_misses(self):
        t, hit = ray_torus(O, DOWN, jnp.zeros(3), UP, 1.0, 0.25)
        assert not bool(hit)

    def test_far_ray_misses(self):
        o = jnp.asarray([4.0, 5.0, 0.0])
        _, hit = ray_torus(o, DOWN, jnp.zeros(3), UP, 1.0, 0.25)
        assert not bool(hit)

    def test_tilted_axis(self):
        # axis +x: the torus lies in the yz plane; ray along -x over the
        # tube circle at (0, 1, 0) hits at x = tube radius
        o = jnp.asarray([5.0, 1.0, 0.0])
        d = jnp.asarray([-1.0, 0.0, 0.0])
        t, hit = ray_torus(o, d, jnp.zeros(3),
                           jnp.asarray([1.0, 0.0, 0.0]), 1.0, 0.25)
        assert bool(hit)
        assert float(t) == pytest.approx(4.75, abs=5e-3)

    def test_axis_negative_y_fallback(self):
        # degenerate rotateFromTo case (axis == -y): handled by the flip
        o = jnp.asarray([1.0, 5.0, 0.0])
        t, hit = ray_torus(o, DOWN, jnp.zeros(3),
                           jnp.asarray([0.0, -1.0, 0.0]), 1.0, 0.25)
        assert bool(hit)
        assert float(t) == pytest.approx(4.75, abs=5e-3)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
