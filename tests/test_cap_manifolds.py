"""Cap-contact ring manifolds (round 3, exceeds the reference): the
reference emits ONE point for cylinder-cap-on-cap and cap-on-box-face and
leaves stability as TODOs (collision_narrow.cpp:883, 1015-1018); a single
cap point lets stacked/upright cylinders tip through. Here both cases get
a 4-point ring."""

import jax.numpy as jnp
import numpy as np

from dxk_tpu.ops.narrowphase import (cylinder_box_contact,
                                     cylinder_cylinder_contact)

IDQ = jnp.asarray([0.0, 0.0, 0.0, 1.0])


def test_cylinder_cap_to_cap_ring():
    pts, dps, nrm, cnt, hit = cylinder_cylinder_contact(
        jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]),
        jnp.float32(0.5),
        jnp.asarray([0.05, 0.99, 0.02]), jnp.asarray([0.05, 1.99, 0.02]),
        jnp.float32(0.4))
    assert bool(hit) and int(cnt) == 4
    assert abs(float(nrm[1])) > 0.99
    p = np.asarray(pts)
    assert np.allclose(p[:, 1], 0.995, atol=1e-3)       # interface plane
    assert np.ptp(p[:, 0]) > 0.5 or np.ptp(p[:, 2]) > 0.5
    assert np.allclose(np.asarray(dps), 0.01, atol=1e-3)


def test_cylinder_rim_overlap_prefers_shallower_radial():
    """Mostly-lateral overlap: the radial (tube-tube) penetration is
    shallower than the axial one, so the reference's cap-vs-tube choice
    (capPenetration < penetration) picks the 2-point tube manifold."""
    pts, dps, nrm, cnt, hit = cylinder_cylinder_contact(
        jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]),
        jnp.float32(0.5),
        jnp.asarray([0.895, 0.99, 0.0]), jnp.asarray([0.895, 1.99, 0.0]),
        jnp.float32(0.4))
    assert bool(hit)
    assert int(cnt) == 2
    assert abs(float(nrm[0])) > 0.99          # radial normal
    p = np.asarray(pts)[:2]
    assert np.allclose(p[:, 0], 0.4475, atol=1e-3)   # axis midpoint


def test_cylinder_cap_on_box_face_ring():
    pts, dps, nrm, cnt, hit = cylinder_box_contact(
        jnp.asarray([0.0, 0.48, 0.0]), jnp.asarray([0.0, 1.48, 0.0]),
        jnp.float32(0.3),
        jnp.asarray([0.0, -0.5, 0.0]), jnp.asarray([5.0, 1.0, 5.0]), IDQ)
    assert bool(hit) and int(cnt) == 4
    p = np.asarray(pts)
    assert np.allclose(p[:, 1], 0.48, atol=1e-2)        # cap plane
    assert np.ptp(p[:, 0]) > 0.5 or np.ptp(p[:, 2]) > 0.5
