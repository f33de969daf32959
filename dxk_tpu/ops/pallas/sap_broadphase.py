"""Pallas TPU sort-and-sweep broadphase for large single scenes.

The reference's broadphase is a persistent insertion-sorted endpoint array
swept with temporal coherence (/root/reference/src/physics/
collision_broad.cpp:87-295 sweep, 385-402 sort) — O(n * active), but a
mutating sorted list is hostile to XLA. The kselect kernel
(kselect_broadphase.py) replaced it with a tiled O(C^2) pair-space sweep;
fine to ~2-4k colliders, quadratic beyond.

This module is the TPU-shaped SAP:

  1. sort colliders by AABB x-min (jnp.argsort — one XLA sort per step, the
     analog of the reference's insertion-sort maintenance);
  2. sweep a WINDOW of the sorted order: in sorted space, every pair that
     overlaps on x satisfies j > i with min_x[j] <= max_x[i], so partners
     of row i live in the next few sorted tiles. The kernel visits
     `window` column tiles per 128-row tile — O(C * window * 128) instead
     of O(C^2) — and K-selects up to k_sel partners per row with inline
     phase/type classification (same contract as kselect_broadphase);
  3. colliders with huge x extents (the ground plane, arena walls) would
     make every window overflow; they are excluded from the sweep at build
     time (scene.sap_broad) and handled by a dense (C x S) side pass, the
     classic "broad statics out of SAP" split.

A row whose x-interval extends past its window's end sets the per-row
window_overflow counter (honest fixed-capacity accounting, like the
reference's conservative arena sizing) — seen nonzero => raise `window`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dxk_tpu.ops.pallas.kselect_broadphase import BIG_J, TILE, class_of


def _sap_kernel(num_phases, k_sel, window,
                *refs):
    """refs: mn_row, mx_row (TILE, 3) row-tile AABBs;
    then `window` column blocks each [mnt (3,TILE), mxt (3,TILE),
    body (1,TILE), owner (1,TILE), ctype (1,TILE)];
    then col_minx (1, TILE) of the LAST window tile (for overflow);
    outputs idx (TILE, K), cls (TILE, K), cnt (TILE, 1), ovf (TILE, 1)."""
    it = iter(refs)
    mn_row_ref = next(it)
    mx_row_ref = next(it)
    cols = [tuple(next(it) for _ in range(5)) for _ in range(window)]
    idx_ref = next(it)
    cls_ref = next(it)
    cnt_ref = next(it)
    ovf_ref = next(it)

    i0 = pl.program_id(0) * TILE
    rmn = [mn_row_ref[:, a][:, None] for a in range(3)]
    rmx = [mx_row_ref[:, a][:, None] for a in range(3)]
    ii = (jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
          + jnp.int32(i0))
    body_i = None   # filled from the d=0 block (its columns ARE the rows)
    ovs, clss, jjs = [], [], []
    for d, (mnt, mxt, body_c, owner_c, ctype_c) in enumerate(cols):
        ov = jnp.bool_(True)
        for a in range(3):
            cmn = mnt[a, :][None, :]
            cmx = mxt[a, :][None, :]
            ov = ov & ~((rmn[a] > cmx) | (cmn > rmx[a]))
        jj = (jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
              + jnp.int32(i0) + d * TILE)
        body_j = body_c[0, :][None, :]
        owner_j = owner_c[0, :][None, :]
        ctype_j = ctype_c[0, :][None, :]
        if d == 0:
            body_i = body_c[0, :][:, None]
            owner_i = owner_c[0, :][:, None]
            ctype_i = ctype_c[0, :][:, None]
            rb_i = owner_i == 0
            st_i = owner_i == 1
        rb_j = owner_j == 0
        st_j = owner_j == 1
        # pair lives in the earlier-SORTED row (classic SAP: visited from
        # the interval that starts first); one side dynamic, the other
        # dynamic-or-static — force-field/trigger colliders (owner 2/3)
        # are NOT contact candidates (kselect_broadphase places only
        # rb-rb / rb-static; triggers ride the static overlap list).
        # bool-valued jnp.where lowers to i8->i1 trunci Mosaic rejects —
        # use and/or forms.
        allowed = (jj > ii) & ((rb_i & (rb_j | st_j)) | (st_i & rb_j))
        dd = rb_i & rb_j
        allowed = allowed & ~(dd & (body_i == body_j))

        dyn_min = jnp.where(dd, jnp.minimum(body_i, body_j),
                            jnp.where(rb_i, body_i, body_j))
        is_sd = ~dd
        phase = (dyn_min + 2 * is_sd.astype(jnp.int32)) % num_phases
        swap = (ctype_i > ctype_j).astype(jnp.int32)
        cls = jnp.where(
            allowed & ov,
            class_of(ctype_i, ctype_j, phase, swap, num_phases),
            0).astype(jnp.int32)
        ovs.append(ov)
        clss.append(cls)
        jjs.append(jj)

    cls_all = jnp.concatenate(clss, axis=1)       # (TILE, W*TILE)
    jj_all = jnp.concatenate(jjs, axis=1)
    mask = cls_all > 0
    cnt_ref[:, 0] = jnp.sum(mask.astype(jnp.int32), axis=1)

    # window overflow: row's x-interval reaches past the last column of
    # the window => pairs may exist beyond it (min_x is sorted, so
    # comparing against the window's LAST column's min_x is exact)
    last_mn = cols[-1][0]
    end_minx = last_mn[0, TILE - 1]
    ovf_ref[:, 0] = (rmx[0][:, 0] >= end_minx).astype(jnp.int32)

    for k in range(k_sel):
        jsel = jnp.min(jnp.where(mask, jj_all, BIG_J), axis=1)
        valid = jsel < BIG_J
        hitk = mask & (jj_all == jsel[:, None])
        clsk = jnp.max(jnp.where(hitk, cls_all, 0), axis=1)
        idx_ref[:, k] = jnp.where(valid, jsel, -1)
        cls_ref[:, k] = clsk
        mask = mask & ~hitk


@functools.partial(jax.jit,
                   static_argnames=("num_phases", "k_sel", "window",
                                    "broad_idx"))
def sap_broadphase(aabb_min, aabb_max, body, owner_type, ctype,
                   num_phases: int = 1, k_sel: int = 8, window: int = 4,
                   broad_idx: tuple = ()):
    """Sort-and-sweep broadphase. Same contract as kselect_broadphase —
    returns (partner_idx (C, K+S) int32 with -1 padding, partner_cls
    (C, K+S) int32 with 0 padding, row_hits (C,) int32) in ORIGINAL
    collider index space — plus a 4th value window_overflow () int32
    (rows whose x-interval outran the sorted window; raise `window` or
    move more statics into broad_idx if nonzero).

    broad_idx: colliders excluded from the sweep (huge statics) and
    paired densely against every sweep collider (S = len(broad_idx)
    extra partner columns)."""
    c = aabb_min.shape[0]
    cp = ((c + TILE - 1) // TILE) * TILE
    big = jnp.float32(3.0e38)

    # exclude broad colliders from the sweep (sort them to the far end
    # with empty AABBs)
    if broad_idx:
        bsel = jnp.zeros((c,), jnp.bool_).at[jnp.asarray(broad_idx)].set(
            True)
        swp_min = jnp.where(bsel[:, None], big, aabb_min)
        swp_max = jnp.where(bsel[:, None], -big, aabb_max)
    else:
        swp_min, swp_max = aabb_min, aabb_max

    order = jnp.argsort(swp_min[:, 0]).astype(jnp.int32)      # (C,)
    mn_s = swp_min[order]
    mx_s = swp_max[order]
    body_s = body.astype(jnp.int32)[order]
    owner_s = owner_type.astype(jnp.int32)[order]
    ctype_s = ctype.astype(jnp.int32)[order]

    # pad: rows to cp; columns additionally by (window-1) tiles so the
    # last row tile's window exists. Padding sorts AFTER everything
    # (min=+big) and can never overlap (max=-big).
    pad_r = cp - c
    pad_c = pad_r + (window - 1) * TILE
    mn_r = jnp.pad(mn_s, ((0, pad_r), (0, 0)), constant_values=big)
    mx_r = jnp.pad(mx_s, ((0, pad_r), (0, 0)), constant_values=-big)
    mnt = jnp.pad(mn_s, ((0, pad_c), (0, 0)), constant_values=big).T
    mxt = jnp.pad(mx_s, ((0, pad_c), (0, 0)), constant_values=-big).T
    pad_i = lambda v, fill: jnp.pad(v, (0, pad_c), constant_values=fill)[
        None, :]
    body_p = pad_i(body_s, -2)
    owner_p = pad_i(owner_s, 2)
    ctype_p = pad_i(ctype_s, 0)

    col_specs = []
    col_inputs = []
    for d in range(window):
        col_inputs += [mnt, mxt, body_p, owner_p, ctype_p]
        col_specs += [
            pl.BlockSpec((3, TILE), (lambda i, _d=d: (0, i + _d)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE), (lambda i, _d=d: (0, i + _d)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), (lambda i, _d=d: (0, i + _d)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), (lambda i, _d=d: (0, i + _d)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), (lambda i, _d=d: (0, i + _d)),
                         memory_space=pltpu.VMEM),
        ]

    grid = (cp // TILE,)
    interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_sap_kernel, num_phases, k_sel, window)
    idx_s, cls_s, cnt_s, ovf_s = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((cp, k_sel), jnp.int32),
                   jax.ShapeDtypeStruct((cp, k_sel), jnp.int32),
                   jax.ShapeDtypeStruct((cp, 1), jnp.int32),
                   jax.ShapeDtypeStruct((cp, 1), jnp.int32)),
        grid=grid,
        in_specs=[pl.BlockSpec((TILE, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + col_specs,
        out_specs=(pl.BlockSpec((TILE, k_sel), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((TILE, k_sel), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(mn_r, mx_r, *col_inputs)
    idx_s, cls_s = idx_s[:c], cls_s[:c]
    cnt_s, ovf_s = cnt_s[:c, 0], ovf_s[:c, 0]

    # map partners back to original collider ids; scatter rows back
    # (order is a permutation, so .at[order].set covers every row)
    idx_orig = jnp.where(idx_s >= 0, order[jnp.maximum(idx_s, 0)], -1)
    idx = jnp.zeros((c, k_sel), jnp.int32).at[order].set(idx_orig)
    cls = jnp.zeros((c, k_sel), jnp.int32).at[order].set(cls_s)
    hits = jnp.zeros((c,), jnp.int32).at[order].set(cnt_s)
    # overflow folds BOTH loss modes: rows whose x-interval outran the
    # sorted window (pairs never seen) AND rows whose in-window matches
    # outran the k_sel output slots (pairs seen but dropped by the
    # K-select). The dense side columns below never drop, so they must
    # not dilute this count (the caller can't tell sweep hits from dense
    # hits in the combined `hits`).
    window_overflow = (jnp.sum(ovf_s)
                       + jnp.sum(jnp.maximum(cnt_s - k_sel, 0)))

    # dense side pass against the broad statics (XLA): S extra columns
    if broad_idx:
        bi = jnp.asarray(broad_idx, jnp.int32)                 # (S,)
        bmn, bmx = aabb_min[bi], aabb_max[bi]                  # (S, 3)
        no = (jnp.any(aabb_min[:, None] > bmx[None], axis=-1)
              | jnp.any(bmn[None] > aabb_max[:, None], axis=-1))
        ov = ~no                                               # (C, S)
        rb_i = (owner_type.astype(jnp.int32) == 0)[:, None]
        not_self = jnp.arange(c, dtype=jnp.int32)[:, None] != bi[None]
        allowed = ov & rb_i & not_self
        ct_i = ctype.astype(jnp.int32)[:, None]
        ct_b = ctype.astype(jnp.int32)[bi][None]
        phase = (body.astype(jnp.int32)[:, None] + 2) % num_phases
        swap = (ct_i > ct_b).astype(jnp.int32)
        bcls = jnp.where(allowed,
                         class_of(ct_i, ct_b, phase, swap, num_phases),
                         0).astype(jnp.int32)
        bidx = jnp.where(allowed, jnp.broadcast_to(bi[None], bcls.shape),
                         -1)
        idx = jnp.concatenate([idx, bidx], axis=1)
        cls = jnp.concatenate([cls, bcls], axis=1)
        hits = hits + jnp.sum(allowed.astype(jnp.int32), axis=1)

    return idx, cls, hits, window_overflow
