"""Debug rasterizer tests (render/raster.py, replacing the D3D12 view)."""

import jax
import jax.numpy as jnp
import numpy as np

from dxk_tpu.physics import PhysicsSettings
from dxk_tpu.render.raster import render
from dxk_tpu.scene import SceneBuilder


def test_render_sphere_on_ground():
    b = SceneBuilder()
    g = b.add_static()
    b.add_box_collider(g, (0, -1, 0), (20, 1, 20))
    ball = b.add_body(position=(0, 1.0, 0))
    b.add_sphere_collider(ball, (0, 0, 0), 0.5)
    scene = b.finalize()
    state = scene.initial_state()

    rgb, depth = jax.jit(lambda s: render(scene, s, eye=(3, 2, 4),
                                          target=(0, 0.5, 0),
                                          width=64, height=48))(state)
    rgb = np.asarray(rgb)
    depth = np.asarray(depth)
    assert rgb.shape == (48, 64, 3) and depth.shape == (48, 64)
    assert np.all(np.isfinite(rgb))
    # most of the frame shows the ground plane
    assert (depth > 0).mean() > 0.4
    # the sphere (different body color) appears near the image center
    center = rgb[18:30, 24:40].reshape(-1, 3)
    edge = rgb[:6, :8].reshape(-1, 3)
    assert not np.allclose(center.mean(0), edge.mean(0), atol=0.02)


def test_raycast_shapes_batched():
    """Regression for the batched ray_aabb reduction bug: box hits must work
    with collider-batched params (drives the poke path too)."""
    from dxk_tpu.ops.raycast import ray_box
    o = jnp.tile(jnp.array([3.0, 2.0, 4.0]), (5, 1))
    d = jnp.tile(jnp.array([-0.3, -0.5, -0.8]) / jnp.linalg.norm(
        jnp.array([-0.3, -0.5, -0.8])), (5, 1))
    c = jnp.tile(jnp.array([0.0, -4.0, 0.0]), (5, 1))
    h = jnp.tile(jnp.array([20.0, 4.0, 20.0]), (5, 1))
    q = jnp.tile(jnp.array([0.0, 0, 0, 1.0]), (5, 1))
    t, hit = ray_box(o, d, c, h, q)
    assert t.shape == (5,)
    assert bool(hit.all())
    assert np.allclose(np.asarray(t), t[0])
