"""SceneSession: play/pause/stop scene cloning + editor undo analog
(scene.h:359-463, editor/undo_stack.*)."""

import jax
import numpy as np

from dxk_tpu.physics import PhysicsSettings, physics_step
from dxk_tpu.scene import SceneBuilder, SceneSession


def _make():
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
    bd = b.add_body(position=(0, 2, 0))
    b.add_sphere_collider(bd, (0, 0, 0), 0.5)
    scene = b.finalize()
    step = jax.jit(lambda s: physics_step(scene, s, PhysicsSettings(),
                                          1 / 120)[0])
    return scene, step


def test_play_stop_restores_editor_state():
    scene, step = _make()
    sess = SceneSession(scene, step)
    y0 = float(sess.state.pos[1, 1])
    sess.play()
    for _ in range(60):
        sess.step()
    assert float(sess.state.pos[1, 1]) < y0 - 0.05   # it fell
    sess.stop()
    assert float(sess.state.pos[1, 1]) == y0          # exact restore
    assert not sess.playing


def test_pause_freezes_stepping():
    scene, step = _make()
    sess = SceneSession(scene, step)
    sess.play()
    sess.step()
    y = np.asarray(sess.state.pos).copy()
    sess.pause()
    for _ in range(10):
        sess.step()
    assert np.array_equal(np.asarray(sess.state.pos), y)
    sess.resume()
    sess.step()
    assert not np.array_equal(np.asarray(sess.state.pos), y)


def test_undo_stack():
    scene, step = _make()
    sess = SceneSession(scene, step)

    def nudge(st):
        return st.replace(pos=st.pos.at[1, 0].add(1.0))

    x0 = float(sess.state.pos[1, 0])
    sess.edit(nudge)
    sess.edit(nudge)
    assert float(sess.state.pos[1, 0]) == x0 + 2.0
    assert sess.undo_depth == 2
    sess.undo()
    assert float(sess.state.pos[1, 0]) == x0 + 1.0
    sess.undo()
    assert float(sess.state.pos[1, 0]) == x0
    sess.undo()                                       # empty: no-op
    assert float(sess.state.pos[1, 0]) == x0


def test_pick_nearest_body():
    """Editor picking rides utils.knn (nearest_neighbor.h analog): the
    query next to the dynamic sphere picks it over the static ground."""
    scene, step = _make()
    sess = SceneSession(scene, step)
    idx, sq = sess.pick_nearest_body((0.1, 2.0, 0.0))
    assert int(idx[0]) == 1
    assert float(sq[0]) < 0.02
