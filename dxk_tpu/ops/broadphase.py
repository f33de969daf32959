"""Broadphase: AABB overlap over static candidate-pair tables.

The reference uses a persistent sort-and-sweep on one axis with insertion-sort
temporal coherence (/root/reference/src/physics/collision_broad.cpp). A
mutating sorted-endpoint list is a poor fit for XLA; instead, collider types
and ownership are static per scene, so the builder pre-computes pruned
candidate pair tables bucketed by type pair (the reference's 6x6 matrix,
collision_narrow.cpp:2343-2453, moved to build time). At runtime each bucket
does a masked AABB-overlap test and compacts the overlapping pairs into a
fixed-capacity buffer with `top_k` (the capacity mirrors the reference's
conservative arena sizing, physics.cpp:1212-1228; overflow is counted, not
UB).

For very large scenes, the O(P) pair table (P ~ C^2/2) is still cheap in
flops but the follow-up compaction cost dominates; a Pallas sweep kernel can
replace the masked test later without changing this interface.
"""

from __future__ import annotations

import jax
import jax.lax
import jax.numpy as jnp

from dxk_tpu.ops.tpu_gather import gather_rows


def aabb_overlap_mask(aabb_min, aabb_max, pairs):
    """pairs: (P, 2) collider indices. Returns (P,) bool overlap.

    Dense pair tables (P within ~C^2/8 of all-pairs) are served from a full
    (C, C) overlap matrix + a static-index take — 3.6x faster on TPU than
    per-pair dynamic gathers; sparse tables use one-hot/native row gathers.
    """
    a, b = pairs[:, 0], pairs[:, 1]
    c = aabb_min.shape[0]
    p = pairs.shape[0]
    if p * 8 >= c * c:
        if c >= 256 and jax.default_backend() == "tpu":
            # tiled Pallas kernel: no (C, C, 3) compare intermediates,
            # ~2.3x the XLA dense path at C~1k
            from dxk_tpu.ops.pallas.broadphase_kernel import (
                aabb_overlap_matrix_pallas)
            flat = aabb_overlap_matrix_pallas(aabb_min, aabb_max).reshape(-1)
            return jnp.take(flat, a.astype(jnp.int32) * c + b) > 0
        no = (jnp.any(aabb_min[:, None, :] > aabb_max[None, :, :], axis=-1)
              | jnp.any(aabb_min[None, :, :] > aabb_max[:, None, :], axis=-1))
        flat = (~no).reshape(-1)
        return jnp.take(flat, a.astype(jnp.int32) * c + b)
    mna, mxa = gather_rows(aabb_min, a), gather_rows(aabb_max, a)
    mnb, mxb = gather_rows(aabb_min, b), gather_rows(aabb_max, b)
    no = jnp.any(mna > mxb, axis=-1) | jnp.any(mnb > mxa, axis=-1)
    return ~no


def compact_pairs(pairs, mask, k):
    """Select up to `k` overlapping pairs (deterministically: lowest pair
    index first). Returns (sel_pairs (k,2), sel_mask (k,), num_dropped ())."""
    p = pairs.shape[0]
    if k >= p:
        return pairs, mask, jnp.int32(0)
    # score: overlapping pairs first, each preferring lower index
    idx = jnp.arange(p, dtype=jnp.int32)
    score = jnp.where(mask, p - idx, -idx)
    _, sel = jax.lax.top_k(score, k)
    sel_mask = mask[sel]
    dropped = jnp.maximum(jnp.sum(mask.astype(jnp.int32)) - k, 0)
    return pairs[sel], sel_mask, dropped
