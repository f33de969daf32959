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
