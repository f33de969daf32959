"""Debug-mode finiteness validation — the VALIDATE analog.

The reference ships compile-out NaN/Inf sweeps over colliders, AABBs, body
states, contacts and constraints, called after each pipeline stage
(/root/reference/src/physics/physics.cpp:807-926, call sites 1218-1250,
1281, 1350). Here the analog is a jit-compatible stage tracker: each
pipeline stage registers a named finiteness check, and the step reports the
FIRST offending stage (or -1) in `StepInfo.validate_stage` — data instead of
an assert, so it composes with vmap/scan and can gate host-side raises.

Usage inside jitted code:
    tr = StageTracker()
    tr.check("world_colliders", w)
    ...
    info = info.replace(validate_stage=tr.first_bad())

Opt-in via PhysicsSettings.validate (off = zero cost: the tracker is not
instantiated and no checks are traced).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# stage name -> id, mirroring the reference's per-stage VALIDATE call sites
STAGE_NAMES = (
    "world_colliders",   # validate after getWorldSpaceColliders (1218)
    "aabbs",             # validateAABBs (1219)
    "contacts",          # narrowphase output (1250)
    "body_velocities",   # after integrate forces (1281)
    "constraint_prep",   # solver prep (constraints init)
    "solved_velocities",  # after solve iterations (1350)
    "integrated_state",  # after integrateVelocity
)
STAGE_ID = {n: i for i, n in enumerate(STAGE_NAMES)}


def _all_finite(tree) -> jnp.ndarray:
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
    if not leaves:
        return jnp.bool_(True)
    oks = [jnp.all(jnp.isfinite(x)) for x in leaves]
    return jnp.stack(oks).all()


class StageTracker:
    """Collects per-stage finiteness flags during one traced step."""

    def __init__(self):
        self._bad = []   # list of (stage_id, is_bad scalar bool)

    def check(self, stage: str, tree):
        self._bad.append((STAGE_ID[stage], ~_all_finite(tree)))

    def first_bad(self) -> jnp.ndarray:
        """First offending stage id, or -1 if every checked stage was
        finite."""
        out = jnp.int32(-1)
        for sid, bad in reversed(self._bad):
            out = jnp.where(bad, jnp.int32(sid), out)
        return out


def check_finite(tree, name: str = "value"):
    """Standalone helper: returns () bool — True when every float leaf of
    the pytree is finite. Composable under jit/vmap."""
    del name
    return _all_finite(tree)
