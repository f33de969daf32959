"""Brute-force k-nearest-neighbor queries (reference
src/core/nearest_neighbor.* wraps nanoflann for editor queries). On TPU a
dense masked distance matrix + top_k is faster than any tree for the point
counts this engine sees; fully jittable/vmappable."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def knn(points, queries, k, mask=None):
    """points (N, 3), queries (Q, 3) -> (indices (Q, k), sq_dists (Q, k)),
    nearest first. `mask` (N,) marks valid points."""
    d = queries[:, None, :] - points[None, :, :]
    sq = jnp.sum(d * d, axis=-1)                    # (Q, N)
    if mask is not None:
        sq = jnp.where(mask[None, :], sq, 3.4e38)
    neg, idx = jax.lax.top_k(-sq, k)
    return idx, -neg


def nearest(points, query, mask=None):
    """Single nearest neighbor of one query point."""
    idx, sq = knn(points, query[None, :], 1, mask)
    return idx[0, 0], sq[0, 0]
