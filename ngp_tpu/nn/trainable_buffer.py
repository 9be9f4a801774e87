"""Trainable buffers: environment map + learned lens-distortion grid.

Equivalents of the reference's ``TrainableBuffer`` uses
(ref: testbed.h:937-951; envmap read/gradient envmap.cuh:30-105;
32×32 distortion grid consumed in ray generation,
src/testbed_nerf.cu:1188-1190). Both are plain arrays with bilinear
sampling — autodiff provides the deposit/backward the reference implements
with atomics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(grid: jax.Array, uv: jax.Array, wrap_x: bool = False):
    """grid (H, W, C), uv (N, 2) in [0,1] → (N, C), bilinear, edge clamp
    (optionally wrapping in x for equirect envmaps)."""
    H, W = grid.shape[:2]
    x = uv[:, 0] * W - 0.5
    y = jnp.clip(uv[:, 1] * H - 0.5, 0.0, H - 1.000001)
    if wrap_x:
        x = jnp.mod(x, W)
    else:
        x = jnp.clip(x, 0.0, W - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x1 = (x0 + 1) % W if wrap_x else jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    g = grid
    return ((1 - fx) * (1 - fy) * g[y0, x0] + fx * (1 - fy) * g[y0, x1] +
            (1 - fx) * fy * g[y1, x0] + fx * fy * g[y1, x1])


class Envmap:
    """Equirectangular trainable environment map (RGBA)."""

    def __init__(self, height: int = 256, width: int = 512):
        self.height = height
        self.width = width

    def init_params(self, key):
        return jnp.zeros((self.height, self.width, 4))

    @staticmethod
    def dir_to_uv(d: jax.Array) -> jax.Array:
        """Direction → equirect uv (ref: dir→latlong mapping)."""
        theta = jnp.arcsin(jnp.clip(d[:, 1], -1.0, 1.0))
        phi = jnp.arctan2(d[:, 0], d[:, 2])
        return jnp.stack([phi / (2 * jnp.pi) + 0.5,
                          theta / jnp.pi + 0.5], -1)

    def sample(self, params: jax.Array, dirs: jax.Array) -> jax.Array:
        """(N,3) directions → RGBA radiance (premultiplied-alpha blending
        against the background happens in the caller, ref:
        compute_loss_kernel :1393-1400)."""
        return bilinear_sample(params, self.dir_to_uv(dirs), wrap_x=True)


class DistortionGrid:
    """Learned 2D ray-direction offset grid (ref: 32×32
    TrainableBuffer<2,2> consumed additively in pixel→ray)."""

    def __init__(self, resolution=(32, 32)):
        self.resolution = tuple(resolution)

    def init_params(self, key):
        h, w = self.resolution
        return jnp.zeros((h, w, 2))

    def sample(self, params: jax.Array, xy: jax.Array) -> jax.Array:
        return bilinear_sample(params, xy)
