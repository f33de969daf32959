"""Pallas TPU kernel: fused broadphase with per-row K-select compaction.

The reference's broadphase is a persistent sort-and-sweep with insertion-sort
temporal coherence (/root/reference/src/physics/collision_broad.cpp:87-295,
385-402) — a mutating sorted list, hostile to XLA. The round-1 replacement
(static O(C^2) candidate tables + masked AABB tests + top_k compaction)
is correct but its per-step cost scales with the table: at C~1k the 524k-row
mask + compaction costs ~20 ms/step (batch 8, measured) — the whole physics
budget.

This kernel is the TPU-shaped sweep: one pass over the (C x C) pair space in
(128 x C) row tiles, entirely in VMEM, that directly emits a COMPACTED
candidate list:

  - overlap test: 3 axis-interval compares, fused in-register;
  - pruning + classification inline from per-collider int vectors (owner
    kind, body id, shape type) — no C^2 table ever touches HBM. Each pair's
    class encodes (type bucket, contact phase, operand swap), exactly the
    information the narrowphase type dispatch needs
    (collision_narrow.cpp:2404-2453's 6x6 bucketing, moved into the sweep);
  - per-row K-select: up to K overlapping partners per row via K masked
    lane-min reductions (no sort, no scatter). Pair placement: dynamic-dynamic
    pairs live in the lower-indexed row; static-dynamic pairs live in the
    dynamic row, so a huge static ground never overflows its own row.

Output is (C, K) partner indices + classes + per-row hit counts; downstream
bucketing is a cheap top_k over C*K ~ 8k candidates instead of C^2/2.
Overflow (row hits > K) is counted, not UB — the same fixed-capacity
philosophy as the reference's conservative arena sizing
(physics.cpp:1212-1228).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
BIG_J = 1 << 20   # python int: jnp constants would be captured tracers


def class_of(ta, tb, phase, swap, num_phases):
    """Pair class id: 1 + ((bucket * num_phases + phase) * 2 + swap).
    bucket is the upper-triangle index over sorted shape types (the
    reference's type-pair bucketing, collision_narrow.cpp:2404-2453).
    Works on ints or int arrays; 0 means 'no candidate'."""
    lo = jnp.minimum(ta, tb) if not isinstance(ta, int) else min(ta, tb)
    hi = jnp.maximum(ta, tb) if not isinstance(ta, int) else max(ta, tb)
    bucket = lo * 5 - lo * (lo - 1) // 2 + (hi - lo)
    return 1 + (bucket * num_phases + phase) * 2 + swap


def _kselect_kernel(num_phases, k_sel,
                    mn_row_ref, mx_row_ref, mnt_ref, mxt_ref,
                    body_ref, owner_ref, ctype_ref,
                    idx_ref, cls_ref, cnt_ref):
    i0 = pl.program_id(0) * TILE
    cp = mnt_ref.shape[1]

    # --- AABB overlap (TILE, CP) ---------------------------------------
    ov = jnp.bool_(True)
    for axis in range(3):
        rmn = mn_row_ref[:, axis][:, None]
        rmx = mx_row_ref[:, axis][:, None]
        cmn = mnt_ref[axis, :][None, :]
        cmx = mxt_ref[axis, :][None, :]
        ov = ov & ~((rmn > cmx) | (cmn > rmx))

    # --- pruning + classification (collision_narrow.cpp:2346-2396) ------
    jj = jax.lax.broadcasted_iota(jnp.int32, (TILE, cp), 1)
    ii = (jax.lax.broadcasted_iota(jnp.int32, (TILE, cp), 0)
          + jnp.int32(i0))
    body_j = body_ref[0, :][None, :]
    owner_j = owner_ref[0, :][None, :]
    ctype_j = ctype_ref[0, :][None, :]
    body_i = body_ref[0, pl.ds(i0, TILE)][:, None]
    owner_i = owner_ref[0, pl.ds(i0, TILE)][:, None]
    ctype_i = ctype_ref[0, pl.ds(i0, TILE)][:, None]

    rb_i = owner_i == 0
    rb_j = owner_j == 0
    st_i = owner_i == 1
    st_j = owner_j == 1
    # pair placement: dd pairs in the lower-indexed row; sd pairs in the
    # dynamic row (statics can overlap everything — e.g. the ground).
    # Written as and/or over the mutually exclusive dd/sd cases: a
    # bool-valued jnp.where lowers to an i8->i1 trunci Mosaic rejects.
    dd = rb_i & rb_j
    placed = (dd & (jj > ii)) | (rb_i & st_j)
    allowed = placed & ~(dd & (body_i == body_j))

    # contact phase hash (builder.finalize contact_phases): chains/stacks
    # become conflict-free Gauss-Seidel slices
    dyn_min = jnp.where(rb_i & rb_j, jnp.minimum(body_i, body_j),
                        jnp.where(rb_i, body_i, body_j))
    is_sd = ~(rb_i & rb_j)
    phase = (dyn_min + 2 * is_sd.astype(jnp.int32)) % num_phases
    swap = (ctype_i > ctype_j).astype(jnp.int32)
    cls = jnp.where(allowed & ov,
                    class_of(ctype_i, ctype_j, phase, swap, num_phases),
                    0).astype(jnp.int32)

    mask = cls > 0
    cnt_ref[:, 0] = jnp.sum(mask.astype(jnp.int32), axis=1)

    # --- K-select: K masked lane-min reductions -------------------------
    for k in range(k_sel):
        jsel = jnp.min(jnp.where(mask, jj, BIG_J), axis=1)        # (TILE,)
        valid = jsel < BIG_J
        hitk = mask & (jj == jsel[:, None])
        clsk = jnp.max(jnp.where(hitk, cls, 0), axis=1)
        idx_ref[:, k] = jnp.where(valid, jsel, -1)
        cls_ref[:, k] = clsk
        mask = mask & ~hitk


@functools.partial(jax.jit, static_argnames=("num_phases", "k_sel"))
def kselect_broadphase(aabb_min, aabb_max, body, owner_type, ctype,
                       num_phases: int = 1, k_sel: int = 8):
    """aabb_min/max: (C, 3); body/owner_type/ctype: (C,) int32.
    Returns (partner_idx (C, K) int32 with -1 padding,
             partner_cls (C, K) int32 with 0 padding,
             row_hits (C,) int32).
    Candidate pair k of row i is (i, partner_idx[i, k]) with class
    partner_cls[i, k] (see class_of); row_hits > K means dropped pairs."""
    c = aabb_min.shape[0]
    cp = ((c + TILE - 1) // TILE) * TILE
    pad = cp - c
    big = jnp.float32(3.0e38)
    mn = jnp.pad(aabb_min, ((0, pad), (0, 0)), constant_values=big)
    mx = jnp.pad(aabb_max, ((0, pad), (0, 0)), constant_values=-big)
    mnt, mxt = mn.T, mx.T
    pad_i = lambda v, fill: jnp.pad(v.astype(jnp.int32), (0, pad),
                                    constant_values=fill)[None, :]
    body_p = pad_i(body, -2)
    owner_p = pad_i(owner_type, 2)   # padded cols: neither rb nor static
    ctype_p = pad_i(ctype, 0)

    grid = (cp // TILE,)
    interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_kselect_kernel, num_phases, k_sel)
    idx, cls, cnt = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((cp, k_sel), jnp.int32),
                   jax.ShapeDtypeStruct((cp, k_sel), jnp.int32),
                   jax.ShapeDtypeStruct((cp, 1), jnp.int32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE, k_sel), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, k_sel), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(mn, mx, mnt, mxt, body_p, owner_p, ctype_p)
    return idx[:c], cls[:c], cnt[:c, 0]
