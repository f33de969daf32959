"""Pallas TPU kernel: tiled all-pairs AABB overlap matrix.

The dense broadphase path (ops/broadphase.py) computes a (C, C) boolean
overlap matrix; XLA materializes (C, C, 3) compare intermediates. This
kernel tiles the matrix into (TILE, TILE) VMEM blocks and keeps the six
axis-interval compares fused in-register, so HBM traffic is exactly the
input AABBs plus the output matrix.

Layout notes (hard-won on the tunnel's AOT compiler):
- Column-side operands are passed TRANSPOSED as (3, C) so the per-axis
  slice is along sublanes. Slicing axis 1/2 of a (TILE, 3) block puts the
  slice on the LANE dim; doing that for all 3 axes on both operands makes
  Mosaic's scoped-vmem estimate explode to ~16.5M (> the 16M scoped limit)
  and the kernel fails to compile. Sublane slices keep it at ~0.2M.
- Output is int8 {0,1}: bool tiles poorly on the VPU's 8x128 lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _overlap_kernel(mn_row_ref, mx_row_ref, mn_colt_ref, mx_colt_ref,
                    out_ref):
    """out[i, j] = 1 if AABB_row_i overlaps AABB_col_j.

    Row blocks are (TILE, 3); col blocks are transposed (3, TILE). Compare
    per axis with broadcast (TILE, 1) vs (1, TILE)."""
    acc = jnp.float32(1.0)
    for axis in range(3):
        rmn = mn_row_ref[:, axis][:, None]        # (TILE, 1)
        rmx = mx_row_ref[:, axis][:, None]
        cmn = mn_colt_ref[axis, :][None, :]       # (1, TILE)
        cmx = mx_colt_ref[axis, :][None, :]
        sep = jnp.logical_or(rmn > cmx, cmn > rmx)
        acc = acc * jnp.where(sep, 0.0, 1.0)
    out_ref[:, :] = jnp.broadcast_to(acc, out_ref.shape).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=())
def aabb_overlap_matrix_pallas(aabb_min, aabb_max):
    """aabb_min/max: (C, 3) -> (C, C) int8 overlap {0,1}. C is padded up
    to a TILE multiple internally (padding rows never overlap: +inf mins)."""
    c = aabb_min.shape[0]
    cp = ((c + TILE - 1) // TILE) * TILE
    pad = cp - c
    big = jnp.float32(3.0e38)
    mn = jnp.pad(aabb_min, ((0, pad), (0, 0)), constant_values=big)
    mx = jnp.pad(aabb_max, ((0, pad), (0, 0)), constant_values=-big)
    mnt = mn.T
    mxt = mx.T

    grid = (cp // TILE, cp // TILE)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _overlap_kernel,
        out_shape=jax.ShapeDtypeStruct((cp, cp), jnp.int8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(mn, mx, mnt, mxt)
    return out[:c, :c]
