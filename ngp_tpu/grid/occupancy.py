"""Cascaded occupancy grid: maintenance + lookups.

TPU-native equivalent of the reference's density-grid subsystem
(ref: src/testbed_nerf.cu:465-620, 2761-2859): a 128³ grid per cascade
storing an EMA'd max-splat of σ·Δt_min, thresholded into a bitfield with
max-pooled mips. Everything here is one jitted update — cell sampling,
density eval, scatter-max splat, EMA, mean, bit packing, mip pooling —
with no host sync.

Layout notes:
- grid values: (n_total_cascades·128³,) float32, Morton-ordered within each
  cascade (kept Morton for snapshot compatibility with the reference's
  density_grid_binary payload).
- bitfield: (NERF_CASCADES·128³//8,) uint8, same bit order as the
  reference (bit i%8 of byte i//8 for Morton index i).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ngp_tpu.common import (GRID_VOLUME, NERF_CASCADES, NERF_GRIDSIZE,
                            NERF_MIN_OPTICAL_THICKNESS, MIN_CONE_STEPSIZE)


# --- Morton (z-order) encoding, vectorized bit twiddling ---------------------

def _part1by2(x: jax.Array) -> jax.Array:
    x = x.astype(jnp.uint32) & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _compact1by2(x: jax.Array) -> jax.Array:
    x = x.astype(jnp.uint32) & jnp.uint32(0x09249249)
    x = (x | (x >> 2)) & jnp.uint32(0x030C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0300F00F)
    x = (x | (x >> 8)) & jnp.uint32(0x030000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x000003FF)
    return x


def morton3d(x, y, z) -> jax.Array:
    return (_part1by2(x) | (_part1by2(y) << 1) | (_part1by2(z) << 2)).astype(jnp.int32)


def morton3d_invert(idx) -> tuple[jax.Array, jax.Array, jax.Array]:
    i = jnp.asarray(idx).astype(jnp.uint32)
    return (_compact1by2(i).astype(jnp.int32),
            _compact1by2(i >> 1).astype(jnp.int32),
            _compact1by2(i >> 2).astype(jnp.int32))


# --- mip / cell helpers (ref: src/testbed_nerf.cu:267-352,449-463) -----------

def mip_from_pos(pos: jax.Array, max_cascade: int) -> jax.Array:
    """Smallest cascade whose [0,1]-scaled cube contains pos (pos in
    ngp/world units, scene centered at 0.5)."""
    maxval = jnp.max(jnp.abs(pos - 0.5), axis=-1)
    # frexpf: maxval = m·2^e with m ∈ [0.5,1) → e = floor(log2(maxval)) + 1
    exponent = jnp.floor(jnp.log2(jnp.maximum(maxval, 1e-10))).astype(jnp.int32) + 1
    return jnp.clip(exponent + 1, 0, max_cascade)


def mip_from_dt(dt: jax.Array, pos: jax.Array, max_cascade: int) -> jax.Array:
    mip = mip_from_pos(pos, max_cascade)
    d = dt * (2 * NERF_GRIDSIZE)
    e = jnp.floor(jnp.log2(jnp.maximum(d, 1e-10))).astype(jnp.int32) + 1
    return jnp.where(d < 1.0, mip, jnp.clip(jnp.maximum(e, mip), 0, max_cascade))


def cell_idx_at(pos: jax.Array, mip: jax.Array) -> jax.Array:
    """Morton cell index of pos at the given mip (pos (N,3), mip (N,))."""
    scale = jnp.exp2(-mip.astype(jnp.float32))[:, None]
    p = (pos - 0.5) * scale + 0.5
    i = jnp.clip((p * NERF_GRIDSIZE).astype(jnp.int32), 0, NERF_GRIDSIZE - 1)
    return morton3d(i[:, 0], i[:, 1], i[:, 2])


def occupied_at(bitfield: jax.Array, pos: jax.Array, mip: jax.Array) -> jax.Array:
    """Occupancy lookup (ref: density_grid_occupied_at)."""
    idx = cell_idx_at(pos, mip)
    byte = jnp.take(bitfield, idx // 8 + mip * (GRID_VOLUME // 8), mode="clip")
    return (byte >> (idx % 8).astype(jnp.uint8)) & jnp.uint8(1) > 0


# --- grid state ---------------------------------------------------------------

class OccupancyGrid(NamedTuple):
    """Functional state of the cascaded grid."""
    density: jax.Array    # ((max_cascade+1)·128³,) f32, <0 marks untrained
    bitfield: jax.Array   # (NERF_CASCADES·128³//8,) uint8
    mean: jax.Array       # scalar f32: mean clamped level-0 density
    ema_step: jax.Array   # int32 update counter


def init_grid(max_cascade: int) -> OccupancyGrid:
    n = GRID_VOLUME * (max_cascade + 1)
    return OccupancyGrid(
        density=jnp.zeros((n,), jnp.float32),
        bitfield=jnp.zeros((NERF_CASCADES * GRID_VOLUME // 8,), jnp.uint8),
        mean=jnp.zeros((), jnp.float32),
        ema_step=jnp.zeros((), jnp.int32),
    )


def cell_center_positions(max_cascade: int) -> jax.Array:
    """World positions of all cell centers for every cascade, Morton order
    — used by mark_untrained (ref: mark_untrained_density_grid)."""
    idx = jnp.arange(GRID_VOLUME, dtype=jnp.uint32)
    x, y, z = morton3d_invert(idx)
    base = (jnp.stack([x, y, z], -1).astype(jnp.float32) + 0.5) / NERF_GRIDSIZE
    levels = jnp.exp2(jnp.arange(max_cascade + 1, dtype=jnp.float32))
    pos = (base[None] - 0.5) * levels[:, None, None] + 0.5   # (C, V, 3)
    return pos.reshape(-1, 3)


def mark_untrained(max_cascade: int, xforms: jax.Array, focal: jax.Array,
                   resolution: jax.Array) -> jax.Array:
    """Mark cells invisible from every training camera with -1
    (ref: mark_untrained_density_grid, src/testbed_nerf.cu:369-417).

    xforms: (I, 3, 4) camera-to-world; focal: (I, 2); resolution: (I, 2).
    Returns the initial density vector ((max_cascade+1)·V,).
    """
    pos = cell_center_positions(max_cascade)                  # (N, 3)
    levels = jnp.repeat(jnp.arange(max_cascade + 1), GRID_VOLUME)
    voxel_radius = 0.5 * (3.0 ** 0.5) * jnp.exp2(
        levels.astype(jnp.float32)) / NERF_GRIDSIZE         # (N,)

    def visible_from(carry, cam):
        xf, f, res = cam
        ploc = pos - xf[:, 3][None]                           # (N, 3)
        x = ploc @ xf[:, 0]
        y = ploc @ xf[:, 1]
        z = ploc @ xf[:, 2]
        half = res.astype(jnp.float32) * 0.5
        vis = (z > 0) & \
            (jnp.abs(x) - voxel_radius < z / f[0] * half[0]) & \
            (jnp.abs(y) - voxel_radius < z / f[1] * half[1])
        return carry | vis, None

    seen, _ = jax.lax.scan(visible_from,
                           jnp.zeros(pos.shape[0], bool),
                           (xforms, focal, resolution))
    return jnp.where(seen, 0.0, -1.0)


def update_grid(
    grid: OccupancyGrid,
    density_fn: Callable[[jax.Array], jax.Array],
    key: jax.Array,
    max_cascade: int,
    decay: float = 0.95,
    n_uniform: int = GRID_VOLUME // 4,
    n_nonuniform: int = GRID_VOLUME // 4,
    aabb_min: jax.Array | float = 0.0,
    aabb_size: jax.Array | float = 1.0,
) -> OccupancyGrid:
    """One grid maintenance step (ref: update_density_grid_nerf):
    sample cells (uniform + occupied-biased with up to 10 retries), query σ,
    max-splat σ·Δt_min, EMA-max merge, then rebuild mean/bitfield/mips.

    ``density_fn`` maps *warped* positions (N,3)∈[0,1]³ → σ (N,).
    ``aabb_min/size`` define the training AABB for the warp.
    """
    n_cascades = max_cascade + 1
    n_cells = GRID_VOLUME * n_cascades
    k1, k2, k3, k4 = jax.random.split(key, 4)

    if n_uniform >= n_cells:
        # full sweep (warmup, ref: all cells while step < 256): enumerate
        # every cell once — no random probing needed.
        flat_idx = jnp.arange(n_cells, dtype=jnp.int32)
        level = flat_idx // GRID_VOLUME
        x, y, z = morton3d_invert(flat_idx % GRID_VOLUME)
        cell = jnp.stack([x, y, z], -1).astype(jnp.float32)
        u = jax.random.uniform(k1, (n_cells, 3))
        lv = jnp.exp2(level.astype(jnp.float32))[:, None]
        pos = ((cell + u) / NERF_GRIDSIZE - 0.5) * lv + 0.5
        warped = (pos - aabb_min) / aabb_size
        sigma = density_fn(warped)
        tmp = jnp.zeros((n_cells,), jnp.float32).at[flat_idx].max(
            sigma * MIN_CONE_STEPSIZE, mode="drop")
        density = jnp.where(grid.density < 0.0, grid.density,
                            jnp.maximum(grid.density * decay, tmp))
        return rebuild_bitfield(grid._replace(
            density=density, ema_step=grid.ema_step + 1), max_cascade)

    def sample_cells(key, n, thresh):
        kl, kp, kr = jax.random.split(key, 3)
        level = jax.random.randint(kl, (n,), 0, n_cascades)
        # occupied-biased retry: try 10 pseudo-random cells, keep the first
        # exceeding thresh (mirrors the reference's LCG probe loop).
        base = jax.random.randint(kr, (n,), 0, GRID_VOLUME, dtype=jnp.int32)
        idx = base
        chosen = jnp.full((n,), -1, jnp.int32)
        for j in range(10):
            cand = ((base.astype(jnp.uint32) + jnp.uint32(j * 19349663))
                    % jnp.uint32(GRID_VOLUME)).astype(jnp.int32)
            flat = cand + level * GRID_VOLUME
            ok = jnp.take(grid.density, flat, mode="clip") > thresh
            chosen = jnp.where((chosen < 0) & ok, cand, chosen)
        idx = jnp.where(chosen >= 0, chosen, idx)
        flat_idx = idx + level * GRID_VOLUME
        x, y, z = morton3d_invert(idx)
        cell = jnp.stack([x, y, z], -1).astype(jnp.float32)
        u = jax.random.uniform(kp, (n, 3))
        lv = jnp.exp2(level.astype(jnp.float32))[:, None]
        pos = ((cell + u) / NERF_GRIDSIZE - 0.5) * lv + 0.5
        return pos, flat_idx

    pos_u, idx_u = sample_cells(k1, n_uniform, -0.01)
    pos_n, idx_n = sample_cells(k2, n_nonuniform, NERF_MIN_OPTICAL_THICKNESS)
    pos = jnp.concatenate([pos_u, pos_n], 0)
    idx = jnp.concatenate([idx_u, idx_n], 0)

    warped = (pos - aabb_min) / aabb_size
    sigma = density_fn(warped)
    optical_thickness = sigma * MIN_CONE_STEPSIZE

    tmp = jnp.zeros((n_cells,), jnp.float32).at[idx].max(
        optical_thickness, mode="drop")
    density = jnp.where(grid.density < 0.0, grid.density,
                        jnp.maximum(grid.density * decay, tmp))

    return rebuild_bitfield(grid._replace(
        density=density, ema_step=grid.ema_step + 1), max_cascade)


def rebuild_bitfield(grid: OccupancyGrid, max_cascade: int) -> OccupancyGrid:
    """Mean + threshold + bit packing + mip max-pool
    (ref: update_density_grid_mean_and_bitfield)."""
    level0 = grid.density[:GRID_VOLUME]
    mean = jnp.mean(jnp.maximum(level0, 0.0))
    thresh = jnp.minimum(NERF_MIN_OPTICAL_THICKNESS, mean)

    n_cascades = grid.density.shape[0] // GRID_VOLUME
    occ = grid.density.reshape(n_cascades, GRID_VOLUME) > thresh  # (C, V)
    # pack bits: Morton index i → byte i//8, bit i%8; Morton order means
    # groups of 8 consecutive indices form a 2×2×2 block.
    bits = occ.reshape(n_cascades, GRID_VOLUME // 8, 8)
    weights = (1 << jnp.arange(8, dtype=jnp.uint32))[None, None, :]
    packed = jnp.sum(bits.astype(jnp.uint32) * weights, axis=-1).astype(jnp.uint8)
    full = jnp.zeros((NERF_CASCADES, GRID_VOLUME // 8), jnp.uint8)
    full = full.at[:n_cascades].set(packed)

    # mip max-pool (ref: bitfield_max_pool): the whole level-L cube maps
    # to the center half of level L+1 — a 2×2×2 block of L-cells at block
    # coords b (< 64) becomes the L+1 cell at b + GRIDSIZE/4, occupied if
    # any child is.
    occ_full = jnp.zeros((NERF_CASCADES, GRID_VOLUME), bool)
    occ_full = occ_full.at[:n_cascades].set(occ)
    px, py, pz = morton3d_invert(jnp.arange(GRID_VOLUME // 8, dtype=jnp.uint32))
    pool_tgt = morton3d(px + NERF_GRIDSIZE // 4, py + NERF_GRIDSIZE // 4,
                        pz + NERF_GRIDSIZE // 4)

    def pool(level_occ):
        # Morton groups of 8 consecutive indices are exactly 2×2×2 blocks.
        child_any = level_occ.reshape(GRID_VOLUME // 8, 8).any(-1)
        return jnp.zeros((GRID_VOLUME,), bool).at[pool_tgt].set(child_any)

    def body(carry, level):
        prev = carry
        pooled = pool(prev)
        cur = occ_full[level] | pooled
        return cur, cur

    _, pooled_levels = jax.lax.scan(
        body, occ_full[0], jnp.arange(1, NERF_CASCADES))
    all_occ = jnp.concatenate([occ_full[0:1], pooled_levels], axis=0)
    bits = all_occ.reshape(NERF_CASCADES, GRID_VOLUME // 8, 8)
    packed = jnp.sum(bits.astype(jnp.uint32) * weights, axis=-1).astype(jnp.uint8)
    return grid._replace(bitfield=packed.reshape(-1), mean=mean)
