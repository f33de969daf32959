"""Pallas AABB-overlap kernel vs the XLA dense reference formulation.

On CPU (the test platform) the kernel runs in interpret mode; the same
code compiles natively on TPU (verified on v5e — see docs/PERF_NOTES.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.ops.pallas.broadphase_kernel import TILE, aabb_overlap_matrix_pallas


def _ref_matrix(mn, mx):
    return ~(jnp.any(mn[..., :, None, :] > mx[..., None, :, :], axis=-1)
             | jnp.any(mn[..., None, :, :] > mx[..., :, None, :], axis=-1))


def _random_aabbs(rng, c):
    mn = rng.uniform(-50, 50, (c, 3)).astype(np.float32)
    mx = mn + rng.uniform(0.5, 3.0, (c, 3)).astype(np.float32)
    return jnp.asarray(mn), jnp.asarray(mx)


@pytest.mark.parametrize("c", [1, 17, TILE, TILE + 1, 300])
def test_matches_xla_dense(c):
    mn, mx = _random_aabbs(np.random.default_rng(c), c)
    got = aabb_overlap_matrix_pallas(mn, mx)
    assert got.shape == (c, c)
    assert bool(jnp.all((got > 0) == _ref_matrix(mn, mx)))


def test_diagonal_is_overlap():
    mn, mx = _random_aabbs(np.random.default_rng(0), 50)
    got = aabb_overlap_matrix_pallas(mn, mx)
    assert bool(jnp.all(jnp.diagonal(got) == 1))


def test_vmap_batched():
    rng = np.random.default_rng(7)
    mn = jnp.asarray(rng.uniform(-50, 50, (4, 140, 3)).astype(np.float32))
    mx = mn + jnp.asarray(rng.uniform(0.5, 3.0, (4, 140, 3)).astype(np.float32))
    got = jax.vmap(aabb_overlap_matrix_pallas)(mn, mx)
    assert bool(jnp.all((got > 0) == _ref_matrix(mn, mx)))


def test_degenerate_touching():
    # exactly touching AABBs count as overlapping (<=, not <)
    mn = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
    mx = jnp.array([[1.0, 1.0, 1.0], [2.0, 1.0, 1.0]], jnp.float32)
    got = aabb_overlap_matrix_pallas(mn, mx)
    assert bool(jnp.all(got == 1))


class TestKSelectBroadphase:
    def _scene(self):
        import numpy as np
        from dxk_tpu.scene import SceneBuilder
        rng = np.random.RandomState(0)
        b = SceneBuilder()
        g = b.add_static()
        b.add_box_collider(g, (0, -1, 0), (30, 1, 30))
        for i in range(60):
            p = (rng.uniform(-4, 4), rng.uniform(0.3, 2.5), rng.uniform(-4, 4))
            body = b.add_body(position=p)
            kind = i % 3
            if kind == 0:
                b.add_sphere_collider(body, (0, 0, 0), 0.4)
            elif kind == 1:
                b.add_box_collider(body, (0, 0, 0), (0.35, 0.35, 0.35))
            else:
                b.add_capsule_collider(body, (0, -0.2, 0), (0, 0.2, 0), 0.25)
        return b

    def test_kselect_matches_table_pair_sets(self):
        """The fused K-select kernel must select exactly the pairs the
        masked-table path selects (same overlap set, same type buckets,
        same phases), for a mixed-shape soup."""
        import jax
        import numpy as np
        from dxk_tpu.ops.broadphase import (aabb_overlap_mask,
                                            kselect_group_pairs)
        from dxk_tpu.ops.shapes import collider_aabbs, world_colliders

        b = self._scene()
        table = b.finalize(contact_phases=4)
        ksel = b.finalize(contact_phases=4, broadphase="kselect",
                          broadphase_k=16)
        st = table.initial_state()

        w = world_colliders(table, st.pos, st.rot)
        mn, mx = collider_aabbs(table, w)
        sel, n_overlaps, row_drop = jax.jit(
            lambda mn, mx: kselect_group_pairs(ksel, mn, mx))(mn, mx)
        assert int(row_drop) == 0

        total_table = 0
        for gi, g in enumerate(table.pair_groups):
            mask = aabb_overlap_mask(mn, mx, g.pairs)
            want = {tuple(p) for p in np.asarray(g.pairs)[np.asarray(mask)]}
            total_table += len(want)
            kg = [kg for kgi, kg in sorted(sel.items())
                  if (ksel.pair_groups[kgi].type_a,
                      ksel.pair_groups[kgi].type_b,
                      ksel.pair_groups[kgi].phase)
                  == (g.type_a, g.type_b, g.phase)]
            assert len(kg) == 1
            pairs, kmask, dropped = kg[0]
            assert int(dropped) == 0
            got = {tuple(p) for p in np.asarray(pairs)[np.asarray(kmask)]}
            assert got == want, (g.type_a, g.type_b, g.phase,
                                 got - want, want - got)
        assert int(n_overlaps) == total_table

    def test_kselect_end_to_end_trajectory(self):
        """Full physics steps through the kselect path stay close to the
        table path (identical pair sets; fp ordering may differ)."""
        import jax
        import numpy as np
        from dxk_tpu.physics import PhysicsSettings, physics_step

        b = self._scene()
        settings = PhysicsSettings(num_rigid_solver_iterations=10,
                                   solver_mode="colored")

        def run(scene):
            st = scene.initial_state()
            step = jax.jit(lambda s: physics_step(scene, s, settings,
                                                  1 / 120)[0])
            for _ in range(30):
                st = step(st)
            return np.asarray(st.pos)

        p_table = run(b.finalize(contact_phases=4))
        p_ksel = run(b.finalize(contact_phases=4, broadphase="kselect",
                                broadphase_k=16))
        assert np.abs(p_table - p_ksel).max() < 1e-3
