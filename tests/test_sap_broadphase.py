"""Sort-and-sweep broadphase (ops/pallas/sap_broadphase.py): candidate
sets must match brute force, and the end-to-end trajectory must match the
masked-table broadphase (collision_broad.cpp:87-295's role)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxk_tpu.physics import PhysicsSettings, physics_step
from dxk_tpu.scene import SceneBuilder


def _scatter_scene(n=40, broadphase="table", **kw):
    rng = np.random.RandomState(0)
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (60, 1, 60))   # broad static
    for i in range(n):
        x, z = rng.uniform(-12, 12, 2)
        bd = b.add_body(position=(x, 0.5 + 0.002 * i, z))
        if i % 3 == 0:
            b.add_sphere_collider(bd, (0, 0, 0), 0.4)
        elif i % 3 == 1:
            b.add_box_collider(bd, (0, 0, 0), (0.35, 0.35, 0.35))
        else:
            b.add_capsule_collider(bd, (0, -0.2, 0), (0, 0.2, 0), 0.25)
    return b.finalize(broadphase=broadphase, **kw)


def _pair_set(idx, cls):
    out = set()
    idx, cls = np.asarray(idx), np.asarray(cls)
    for i in range(idx.shape[0]):
        for k in range(idx.shape[1]):
            if cls[i, k] > 0 and idx[i, k] >= 0:
                out.add((min(i, int(idx[i, k])), max(i, int(idx[i, k]))))
    return out


def test_sap_matches_brute_force_candidates():
    from dxk_tpu.ops.pallas.sap_broadphase import sap_broadphase
    from dxk_tpu.ops.shapes import collider_aabbs, world_colliders

    scene = _scatter_scene(40, broadphase="sap", broadphase_k=8)
    assert scene.broadphase_kind == "sap"
    assert len(scene.sap_broad) == 1          # the ground
    st = scene.initial_state()
    w = world_colliders(scene, st.pos, st.rot)
    mn, mx = collider_aabbs(scene, w)
    c = scene.colliders
    idx, cls, hits, wovf = jax.jit(
        lambda mn, mx: sap_broadphase(
            mn, mx, c.body, c.owner_type, c.ctype,
            num_phases=scene.num_contact_phases, k_sel=8,
            window=scene.sap_window, broad_idx=scene.sap_broad)
    )(mn, mx)
    got = _pair_set(idx, cls)

    # brute force: overlapping pairs with >=1 rigid body, distinct bodies
    mnn, mxx = np.asarray(mn), np.asarray(mx)
    body = np.asarray(c.body)
    owner = np.asarray(c.owner_type)
    want = set()
    C = mnn.shape[0]
    for i in range(C):
        for j in range(i + 1, C):
            if np.any(mnn[i] > mxx[j]) or np.any(mnn[j] > mxx[i]):
                continue
            rb_i, rb_j = owner[i] == 0, owner[j] == 0
            if not (rb_i or rb_j):
                continue
            if rb_i and rb_j and body[i] == body[j]:
                continue
            want.add((i, j))
    assert int(wovf) == 0
    assert got == want, (sorted(got - want), sorted(want - got))


def test_sap_end_to_end_matches_table():
    scene_t = _scatter_scene(30)
    scene_s = _scatter_scene(30, broadphase="sap", broadphase_k=10)
    settings = PhysicsSettings(num_rigid_solver_iterations=10,
                               solver_mode="jacobi")
    st_t = scene_t.initial_state()
    st_s = scene_s.initial_state()
    step_t = jax.jit(lambda s: physics_step(scene_t, s, settings, 1 / 120)[0])
    step_s = jax.jit(lambda s: physics_step(scene_s, s, settings, 1 / 120)[0])
    for _ in range(30):
        st_t = step_t(st_t)
        st_s = step_s(st_s)
    err = float(jnp.abs(st_t.pos[:-1] - st_s.pos[:-1]).max())
    assert err < 1e-4, err
    assert bool(jnp.isfinite(st_s.pos).all())


def test_sap_window_overflow_detected():
    """A collider whose x-extent spans far past its window must raise the
    overflow counter (not silently miss pairs) when not in sap_broad."""
    from dxk_tpu.ops.pallas.sap_broadphase import sap_broadphase

    C = 300
    rng = np.random.RandomState(1)
    mn = np.zeros((C, 3), np.float32)
    mn[:, 0] = np.sort(rng.uniform(0, 300, C)).astype(np.float32)
    mn[:, 1:] = 0.0
    mx = mn + 1.0
    # collider 0 spans the whole axis
    mx[0, 0] = 400.0
    body = np.arange(C, dtype=np.int32)
    owner = np.zeros(C, np.int32)
    ctype = np.zeros(C, np.int32)
    _idx, _cls, _hits, wovf = sap_broadphase(
        jnp.asarray(mn), jnp.asarray(mx), jnp.asarray(body),
        jnp.asarray(owner), jnp.asarray(ctype), k_sel=4, window=2)
    assert int(wovf) > 0


def test_sap_excludes_trigger_and_force_field_colliders():
    """Trigger/force-field colliders (owner types 3/2) must NOT become
    contact candidates: kselect places only rb-rb / rb-static pairs
    (kselect_broadphase.py `placed`), and the reference prunes non-RB
    pairs before narrowphase (collision_narrow.cpp:2346-2396). A trigger
    admitted here would get solver impulses — bodies bouncing off an
    intangible volume."""
    from dxk_tpu.ops.pallas.sap_broadphase import sap_broadphase

    # 0 = dynamic sphere; 1 = trigger box overlapping it; 2 = force-field
    # box overlapping it; 3 = another dynamic sphere overlapping; 4 =
    # static box overlapping. Expected candidates: (0,3) and (0,4) only.
    mn = np.array([[0.0, 0, 0], [0.1, 0, 0], [0.2, 0, 0],
                   [0.3, 0, 0], [0.4, 0, 0]], np.float32)
    mx = mn + 1.0
    body = np.array([0, 1, 2, 3, 4], np.int32)
    owner = np.array([0, 3, 2, 0, 1], np.int32)   # rb, trig, ff, rb, static
    ctype = np.zeros(5, np.int32)
    idx, cls, hits, wovf = sap_broadphase(
        jnp.asarray(mn), jnp.asarray(mx), jnp.asarray(body),
        jnp.asarray(owner), jnp.asarray(ctype), k_sel=4, window=2)
    got = _pair_set(idx, cls)
    assert got == {(0, 3), (0, 4), (3, 4)}, got
    assert int(wovf) == 0


def test_sap_kselect_drop_counted_despite_dense_columns():
    """Sweep pairs dropped by the per-row K-select must raise the overflow
    counter even when dense broad-static columns exist: `hits` mixes sweep
    and dense counts, so max(hits - (k_sel + S), 0) would undercount (the
    dense columns never drop)."""
    from dxk_tpu.ops.pallas.sap_broadphase import sap_broadphase

    # 8 mutually-overlapping colliders: first-sorted row has 7 partners
    # > k_sel=4. Collider 8 is a far-away broad static (S=1) overlapping
    # nothing, so every dropped pair is a sweep drop.
    C = 9
    mn = np.zeros((C, 3), np.float32)
    mn[:8, 0] = np.linspace(0.0, 0.35, 8)
    mn[8] = (500.0, 0, 0)
    mx = mn + 1.0
    body = np.arange(C, dtype=np.int32)
    owner = np.zeros(C, np.int32)
    owner[8] = 1
    ctype = np.zeros(C, np.int32)
    idx, cls, hits, wovf = sap_broadphase(
        jnp.asarray(mn), jnp.asarray(mx), jnp.asarray(body),
        jnp.asarray(owner), jnp.asarray(ctype), k_sel=4, window=2,
        broad_idx=(8,))
    # rows (sorted) have 7,6,5 in-window partners -> drops 3+2+1 = 6
    assert int(wovf) == 6, int(wovf)
    # and the emitted pairs are the K-select survivors only
    got = _pair_set(idx, cls)
    assert len(got) == 4 * 4 + 3 + 2 + 1, sorted(got)
