"""Perlin-style gradient noise (reference src/core/perlin.* — used there for
terrain generation). JAX implementation for generating heightfields
on-device or host-side."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _hash2(ix, iy, seed):
    h = ix * 374761393 + iy * 668265263 + seed * 1442695041
    h = (h ^ (h >> 13)) * 1274126177
    return h ^ (h >> 16)


def _gradient(ix, iy, seed):
    h = _hash2(ix, iy, seed)
    angle = (h & 0xFFFF).astype(jnp.float32) * (2.0 * jnp.pi / 65536.0)
    return jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=-1)


def perlin(x, y, seed=0):
    """2D gradient noise in ~[-0.7, 0.7]. x, y: arrays of sample coords."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    fx = x - ix
    fy = y - iy

    def dot_grad(ox, oy):
        g = _gradient(ix + ox, iy + oy, jnp.int32(seed))
        d = jnp.stack([fx - ox, fy - oy], axis=-1)
        return jnp.sum(g * d, axis=-1)

    def fade(t):
        return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)

    u, v = fade(fx), fade(fy)
    n00, n10 = dot_grad(0, 0), dot_grad(1, 0)
    n01, n11 = dot_grad(0, 1), dot_grad(1, 1)
    nx0 = n00 + u * (n10 - n00)
    nx1 = n01 + u * (n11 - n01)
    return nx0 + v * (nx1 - nx0)


def fbm(x, y, octaves=4, lacunarity=2.0, gain=0.5, seed=0):
    """Fractal Brownian motion over `perlin` — terrain-style heightfields."""
    total = jnp.zeros_like(jnp.asarray(x, jnp.float32))
    amp = 1.0
    freq = 1.0
    for i in range(octaves):
        total = total + amp * perlin(x * freq, y * freq, seed + i)
        amp *= gain
        freq *= lacunarity
    return total


def terrain_heightfield(size=64, cell_size=1.0, height_scale=3.0,
                        feature_scale=0.08, seed=0):
    """Generate a (size, size) heightfield for
    SceneBuilder.set_heightfield."""
    idx = jnp.arange(size, dtype=jnp.float32)
    xs, zs = jnp.meshgrid(idx * feature_scale, idx * feature_scale)
    h = fbm(xs, zs, seed=seed)
    h = (h - h.min()) * height_scale
    return h
