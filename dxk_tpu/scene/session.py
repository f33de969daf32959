"""Editor-style play/pause/stop and undo for scene state.

The reference keeps an editor scene and a runtime scene as a pair:
pressing play clones the editor scene into the runtime one, stop throws
the runtime scene away and restores the editor state, and the editor undo
stack snapshots per-entity binary blobs
(/root/reference/src/scene/scene.h:359-463 cloneTo/play-pause-stop,
serialization_binary.h:6 + editor/undo_stack.* for undo).

In this framework a scene's dynamic state is one immutable pytree, so the
whole machinery collapses to reference management: a "clone" is just
keeping a reference, and undo snapshots are O(1). This session wrapper
packages those semantics behind the reference's verbs so application code
ports 1:1.
"""

from __future__ import annotations

import jax


class SceneSession:
    """Play/pause/stop + snapshot/undo over (scene, state).

    - `play()` snapshots the current (editor) state and starts stepping.
    - `pause()` / `resume()` freeze stepping (`step()` becomes a no-op).
    - `stop()` discards the runtime state and restores the play snapshot.
    - `snapshot()` pushes the current state on the undo stack; `undo()`
      pops and restores (the editor undo-stack analog).
    """

    def __init__(self, scene, step_fn, state=None):
        """step_fn(state) -> state (typically a jitted physics_step
        closure). `state` defaults to scene.initial_state()."""
        self.scene = scene
        self._step_fn = step_fn
        self.state = state if state is not None else scene.initial_state()
        self._play_snapshot = None
        self._undo_stack = []
        self.playing = False
        self.paused = False

    # ---- play / pause / stop (scene.h:399-453) ----------------------------

    def play(self):
        if self.playing:
            return
        self._play_snapshot = self.state    # immutable pytree: O(1) clone
        self.playing = True
        self.paused = False

    def pause(self):
        if self.playing:
            self.paused = True

    def resume(self):
        if self.playing:
            self.paused = False

    def stop(self):
        if not self.playing:
            return
        self.state = self._play_snapshot
        self._play_snapshot = None
        self.playing = False
        self.paused = False

    def step(self, *args, **kwargs):
        """Advance one frame unless stopped/paused. Returns the state."""
        if self.playing and not self.paused:
            self.state = self._step_fn(self.state, *args, **kwargs)
        return self.state

    # ---- undo stack (editor/undo_stack.*) ----------------------------------

    def snapshot(self):
        self._undo_stack.append(self.state)

    def undo(self):
        """Restore the most recent snapshot; no-op on an empty stack."""
        if self._undo_stack:
            self.state = self._undo_stack.pop()
        return self.state

    @property
    def undo_depth(self):
        return len(self._undo_stack)

    # ---- convenience --------------------------------------------------------

    def edit(self, fn):
        """Apply a pure state edit (e.g. move an entity in the editor):
        state -> state. Records an undo snapshot first."""
        self.snapshot()
        self.state = fn(self.state)
        return self.state

    def device_get(self):
        """Host copy of the current state (for serialization/UI)."""
        return jax.device_get(self.state)

    # ---- editor picking (src/core/nearest_neighbor.*) ----------------------

    def pick_nearest_body(self, point, k=1):
        """Editor picking: the k bodies whose centers are nearest `point`
        (the reference wraps nanoflann for this, nearest_neighbor.h; on TPU
        a dense masked distance matrix + top_k beats any tree at engine
        point counts). Returns (indices (k,), sq_dists (k,))."""
        import jax.numpy as jnp

        from dxk_tpu.utils.knn import knn

        q = jnp.asarray(point, jnp.float32)[None, :]
        idx, sq = knn(self.state.pos, q, k)
        return idx[0], sq[0]
