"""Collision / trigger events as data.

The reference surfaces physics events through callbacks: it keeps the
previous frame's collision and trigger-overlap lists, sorts both by entity
pair, and walks them in a sorted merge — pairs only in the new list fire
"begin" (with the accumulated collision impulse), pairs only in the old list
fire "end" (/root/reference/src/physics/physics.cpp:952-1035 triggers,
1037-1178 collisions; impulse accumulation 1091-1095).

Here events are data (SURVEY §7 design stance): `physics_step` returns the
step's solved contact pairs + per-pair summed normal impulse in `StepInfo`,
and trigger overlaps as a boolean mask over the static trigger-pair list.
This module provides the frame-over-frame diffs:

  - `trigger_events`: jittable — the trigger list is static per scene, so
    enter/leave is a mask diff.
  - `collision_events`: host-side — contact pairs occupy different solver
    slots each step, so the diff keys on the collider-id pair exactly like
    the reference's sorted merge keys on entity pairs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


def trigger_events(prev_overlap, overlap):
    """Enter/leave masks over the scene's static trigger-pair list
    (physics.cpp:1004-1033: only-in-new -> enter, only-in-old -> leave).
    Both args are (Q,) bool from StepInfo.trigger_overlap; jit-safe."""
    enter = overlap & ~prev_overlap
    leave = prev_overlap & ~overlap
    return enter, leave


@dataclass(frozen=True)
class CollisionEvent:
    """One begin/end event (collision_begin_event / collision_end_event,
    physics.h:402-417): the two colliders (and their owning bodies) plus the
    solver's accumulated normal impulse for begins."""

    collider_a: int
    collider_b: int
    body_a: int
    body_b: int
    impulse: float


def _pair_impulses(info, min_impulse):
    pairs = np.asarray(info.contact_pairs)
    mask = np.asarray(info.contact_mask)
    imp = np.asarray(info.contact_impulse)
    out = {}
    for i in range(pairs.shape[0]):
        a, b = int(pairs[i, 0]), int(pairs[i, 1])
        if not mask[i] or a < 0:          # -1 = heightfield block
            continue
        key = (a, b) if a <= b else (b, a)
        out[key] = out.get(key, 0.0) + float(imp[i])
    if min_impulse > 0.0:
        # the reference only reports collisions whose impulse clears a
        # threshold when the user sets one (application.cpp:192-201 uses it
        # to gate collision sounds)
        out = {k: v for k, v in out.items() if v >= min_impulse}
    return out


def collision_events(scene, prev_info, info, min_impulse: float = 0.0,
                     ) -> Tuple[List[CollisionEvent], List[CollisionEvent]]:
    """Frame-over-frame begin/end diff for one env (unbatched StepInfo;
    index into vmapped infos first). Returns (begins, ends); begins carry
    the step's accumulated normal impulse, ends carry the last impulse seen
    (the reference's end event carries no impulse — it is provided here for
    convenience). Host-side, mirrors the sorted-merge of
    physics.cpp:1100-1152."""
    body_of = np.asarray(scene.colliders.body)
    cur = _pair_impulses(info, min_impulse)
    prev = _pair_impulses(prev_info, min_impulse) if prev_info is not None \
        else {}

    def ev(key, imp):
        a, b = key
        return CollisionEvent(a, b, int(body_of[a]), int(body_of[b]),
                              float(imp))

    begins = [ev(k, v) for k, v in sorted(cur.items()) if k not in prev]
    ends = [ev(k, v) for k, v in sorted(prev.items()) if k not in cur]
    return begins, ends


def collision_events_batched(scene, prev_info, info, min_impulse: float = 0.0):
    """Per-env begin/end diffs for vmapped StepInfos: returns a list of
    (begins, ends) with one entry per env (the reference runs its event
    merge once per world; a vmapped batch is N worlds). Host-side."""
    import jax

    n = np.asarray(info.contact_mask).shape[0]

    def env_slice(tree, i):
        return jax.tree_util.tree_map(
            lambda x: x[i] if x is not None else None, tree)

    out = []
    for i in range(n):
        out.append(collision_events(
            scene, env_slice(prev_info, i) if prev_info is not None else None,
            env_slice(info, i), min_impulse))
    return out
