"""Native scene-compiler core (native/scene_core.cpp) vs numpy fallback."""

import numpy as np

from dxk_tpu.scene.native import (_bake_pair_tables_np, _library,
                                  bake_pair_tables, color_constraints)


def test_library_builds():
    assert _library() is not None, "native/libscene_core.so failed to build"


def test_pair_tables_match_numpy():
    rng = np.random.default_rng(0)
    C = 60
    ctype = rng.integers(0, 5, C).astype(np.int32)
    owner = rng.choice([0, 0, 0, 1, 2, 3], C).astype(np.int32)
    body = rng.integers(0, 20, C).astype(np.int32)
    body[owner != 0] = 20  # non-RB owners -> dummy

    nat, nat_overlap = bake_pair_tables(ctype, owner, body)
    ref, ref_overlap = _bake_pair_tables_np(ctype, owner, body)

    assert set(nat.keys()) == set(ref.keys())
    for k in nat:
        a = {tuple(p) for p in np.asarray(nat[k])}
        b = {tuple(p) for p in np.asarray(ref[k])}
        assert a == b, k
    assert ({tuple(p) for p in nat_overlap}
            == {tuple(p) for p in ref_overlap})


def test_coloring_is_conflict_free():
    rng = np.random.default_rng(1)
    n = 200
    a = rng.integers(0, 30, n).astype(np.int32)
    b = rng.integers(0, 30, n).astype(np.int32)
    keep = a != b          # real constraints never self-pair
    a, b = a[keep], b[keep]
    colors, nc = color_constraints(a, b, dummy_body=30)
    assert nc >= 1
    for c in range(nc):
        sel = colors == c
        bodies = np.concatenate([a[sel], b[sel]])
        bodies = bodies[bodies != 30]
        assert len(bodies) == len(set(bodies.tolist())), f"conflict in color {c}"
