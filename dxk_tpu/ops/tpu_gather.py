"""TPU-friendly gather/scatter.

XLA's generic batched gather/scatter lower to slow serialized loops on TPU
for the small-table access patterns this engine has (polytope points, body
state rows). For small tables a one-hot matmul runs on the MXU and is ~3x
faster inside scans; for large tables the native gather wins. These helpers
pick per call site based on the static table size.

All helpers take tables that are unbatched *under vmap* (vmap adds the batch
axis); `idx` may have any shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ONEHOT_MAX_TABLE = 256
# one-hot is also fine for bigger tables as long as the materialized one-hot
# stays small (XLA fuses it into the matmul up to a point)
ONEHOT_MAX_ELEMENTS = 64_000_000


def _use_onehot(n, idx) -> bool:
    import numpy as _np
    k = int(_np.prod(idx.shape)) if idx.shape else 1
    return n <= ONEHOT_MAX_TABLE or n * k <= ONEHOT_MAX_ELEMENTS


def onehot_gather(table, idx):
    """table: (N, D); idx: (...,) int -> (..., D)."""
    n = table.shape[0]
    if not _use_onehot(n, idx):
        return table[idx]
    oh = jax.nn.one_hot(idx, n, dtype=jnp.float32)
    return jnp.einsum("...n,nd->...d", oh,
                      table.astype(jnp.float32)).astype(table.dtype)


def onehot_gather_int(table, idx):
    """Integer table variant (values must be exactly representable in f32)."""
    n = table.shape[0]
    if not _use_onehot(n, idx):
        return table[idx]
    out = onehot_gather(table.astype(jnp.float32), idx)
    return jnp.round(out).astype(table.dtype)


def onehot_gather_1d(table, idx):
    """table: (N,) scalars; idx: (...,) -> (...,)."""
    n = table.shape[0]
    if n > ONEHOT_MAX_TABLE:
        return table[idx]
    oh = jax.nn.one_hot(idx, n, dtype=jnp.float32)
    return jnp.einsum("...n,n->...", oh,
                      table.astype(jnp.float32)).astype(table.dtype)


def onehot_select_row(table, i):
    """table (N, D...) , i scalar -> (D...)."""
    n = table.shape[0]
    if n > ONEHOT_MAX_TABLE:
        return table[i]
    oh = jax.nn.one_hot(i, n, dtype=jnp.float32)
    flat = table.reshape(n, -1).astype(jnp.float32)
    return (oh @ flat).reshape(table.shape[1:]).astype(table.dtype)


def onehot_scatter_add(target, idx, values):
    """target (N, D), idx (K,), values (K, D): target + sum-by-index.
    One-hot^T matmul (a segment-sum on the MXU) for small N."""
    n = target.shape[0]
    if not _use_onehot(n, idx):
        return target.at[idx].add(values)
    oh = jax.nn.one_hot(idx, n, dtype=jnp.float32)        # (K, N)
    return target + jnp.einsum("kn,kd->nd", oh,
                               values.astype(jnp.float32)).astype(target.dtype)


def onehot_scatter_add_1d(target, idx, values):
    n = target.shape[0]
    if not _use_onehot(n, idx):
        return target.at[idx].add(values)
    oh = jax.nn.one_hot(idx, n, dtype=jnp.float32)
    return target + jnp.einsum("kn,k->n", oh,
                               values.astype(jnp.float32)).astype(target.dtype)


def gather_rows(arr, idx):
    """arr (N, ...) -> (idx.shape..., ...) via one-hot matmul for small N."""
    flat = arr.reshape(arr.shape[0], -1)
    out = onehot_gather(flat, idx)
    return out.reshape(idx.shape + arr.shape[1:])
