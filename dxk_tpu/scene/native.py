"""ctypes bindings for the native scene-compiler core
(native/scene_core.cpp) — the C++ host runtime piece of the framework,
mirroring the reference's C++ scene/physics bookkeeping layer. Falls back to
pure-numpy implementations when the shared library isn't built, so the
framework stays importable everywhere.

Covers:
  - candidate-pair table baking (pruning + 6x6 type bucketing at C++ speed)
  - per-body mass-property aggregation
  - greedy constraint graph coloring (build-time replacement for the
    reference's runtime scheduleConstraintsSIMD)
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "libscene_core.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        # try building it once
        build = os.path.join(os.path.dirname(path), "build.sh")
        if os.path.exists(build):
            os.system(f"sh {build} >/dev/null 2>&1")
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.bake_pair_tables.restype = ctypes.c_int32
        lib.bake_pair_tables.argtypes = [i32p, i32p, i32p, ctypes.c_int32,
                                         i32p, i32p, i32p, i32p]
        lib.aggregate_mass_properties.restype = None
        lib.aggregate_mass_properties.argtypes = [f64p, f64p, f64p, i32p,
                                                  ctypes.c_int32,
                                                  ctypes.c_int32,
                                                  f64p, f64p, f64p]
        lib.color_constraints.restype = ctypes.c_int32
        lib.color_constraints.argtypes = [i32p, i32p, ctypes.c_int32,
                                          ctypes.c_int32, i32p]
        _LIB = lib
    return _LIB


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def bake_pair_tables(ctype: np.ndarray, owner_type: np.ndarray,
                     body: np.ndarray
                     ) -> Tuple[Dict[Tuple[int, int], np.ndarray], np.ndarray]:
    """Returns ({(type_a, type_b): (P, 2) int32 pairs}, overlap_pairs)."""
    C = len(ctype)
    lib = _library()
    if lib is None:
        return _bake_pair_tables_np(ctype, owner_type, body)

    cap = C * (C - 1) // 2
    pairs = np.empty((max(cap, 1), 2), np.int32)
    bucket_of = np.empty(max(cap, 1), np.int32)
    overlap = np.empty((max(cap, 1), 2), np.int32)
    counts = np.zeros(16, np.int32)
    ctype = np.ascontiguousarray(ctype, np.int32)
    owner_type = np.ascontiguousarray(owner_type, np.int32)
    body = np.ascontiguousarray(body, np.int32)
    n = lib.bake_pair_tables(_i32p(ctype), _i32p(owner_type), _i32p(body),
                             C, _i32p(pairs), _i32p(bucket_of),
                             _i32p(overlap), _i32p(counts))
    buckets: Dict[Tuple[int, int], np.ndarray] = {}
    pair_slice = pairs[:n]
    bucket_slice = bucket_of[:n]
    bid = 0
    for ta in range(5):
        for tb in range(ta, 5):
            if counts[bid] > 0:
                buckets[(ta, tb)] = pair_slice[bucket_slice == bid].copy()
            bid += 1
    return buckets, overlap[:counts[15]].copy()


def _bake_pair_tables_np(ctype, owner_type, body):
    """Vectorized numpy fallback with identical semantics."""
    C = len(ctype)
    ii, jj = np.triu_indices(C, k=1)
    ti, tj = owner_type[ii], owner_type[jj]
    rb_i, rb_j = ti == 0, tj == 0
    keep = rb_i | rb_j
    same = rb_i & rb_j & (body[ii] == body[jj])
    keep &= ~same
    ii, jj, ti, tj = ii[keep], jj[keep], ti[keep], tj[keep]
    swap = ctype[ii] > ctype[jj]
    a = np.where(swap, jj, ii).astype(np.int32)
    b = np.where(swap, ii, jj).astype(np.int32)
    both_rb = (ti == 0) & (tj == 0)
    one_static = (ti == 1) | (tj == 1)
    is_coll = both_rb | one_static
    buckets = {}
    ta, tb = ctype[a], ctype[b]
    for t1 in range(5):
        for t2 in range(t1, 5):
            m = is_coll & (ta == t1) & (tb == t2)
            if m.any():
                buckets[(t1, t2)] = np.stack([a[m], b[m]], -1)
    overlap = np.stack([a[~is_coll], b[~is_coll]], -1)
    return buckets, overlap


def color_constraints(body_a: np.ndarray, body_b: np.ndarray,
                      dummy_body: int) -> Tuple[np.ndarray, int]:
    """Greedy conflict-free coloring; returns (colors, num_colors)."""
    n = len(body_a)
    colors = np.zeros(n, np.int32)
    lib = _library()
    if lib is not None and n:
        a = np.ascontiguousarray(body_a, np.int32)
        b = np.ascontiguousarray(body_b, np.int32)
        nc = lib.color_constraints(_i32p(a), _i32p(b), n, dummy_body,
                                   _i32p(colors))
        return colors, int(nc)
    used: dict = {}
    nc = 0
    for i in range(n):
        mask = 0
        if body_a[i] != dummy_body:
            mask |= used.get(int(body_a[i]), 0)
        if body_b[i] != dummy_body:
            mask |= used.get(int(body_b[i]), 0)
        c = 0
        while (mask >> c) & 1:
            c += 1
        colors[i] = c
        if body_a[i] != dummy_body:
            used[int(body_a[i])] = used.get(int(body_a[i]), 0) | (1 << c)
        if body_b[i] != dummy_body:
            used[int(body_b[i])] = used.get(int(body_b[i]), 0) | (1 << c)
        nc = max(nc, c + 1)
    return colors, nc
