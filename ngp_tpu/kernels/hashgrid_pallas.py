"""Pallas TPU kernels for the Morton-tiled blocked grid encoding.

Lookup structure (see blocked_grid.py): every (sample, level) needs exactly
ONE 128-lane table row. The kernel brings rows to samples with a one-hot
matmul on the MXU (bf16 one-hot · bf16 table → f32 rows — exact selection),
then picks the 2^D·F corner values with a single in-row lane shuffle
(tpu.dynamic_gather along the minor axis — the one vector-rate gather the
hardware exposes), and does the trilinear weighting on the VPU.

Backward reuses the same one-hot: dTable = one-hotᵀ · dRows is again an MXU
matmul, so the scatter-add that cripples XLA's TPU backend never appears.

Grid: (level, sample-tile); the table-gradient output block has a
constant-per-level index map and is accumulated across sample tiles.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ngp_tpu.kernels.blocked_grid import (LANES, BlockedGridMeta, _block_geom,
                                          lookup_geometry)

# round-4 chip sweep (scalar-output timing, 2^18 samples, 16 levels,
# 2^13 rows): tile 512 → 2048 cuts fwd+bwd 167 → 155 ms (bf16) by
# amortizing the (R,128) dtable accumulation; fwd is tile-insensitive.
DEFAULT_TILE = 2048


def _eff_tile(n: int, tile: int) -> int:
    """Clamp the sample tile to the padded problem size so small render
    buckets don't pay a 2048-wide pipeline."""
    p = 1 << max(int(n - 1).bit_length(), 9)
    return min(tile, p)

# The bwd kernel's scoped VMEM footprint ((T,R) one-hot + iota + dtable
# accumulator) exceeds the 16 MB default limit at tile 512 / 2^11 rows;
# v5e/v4 expose far more physical VMEM — raise the Mosaic cap.
_VMEM_LIMIT = 100 * 1024 * 1024


def _compiler_params():
    # pltpu.CompilerParams was TPUCompilerParams in older jax releases
    cls = getattr(pltpu, "CompilerParams", None) or pltpu.TPUCompilerParams
    return cls(vmem_limit_bytes=_VMEM_LIMIT)


def _corner_masks(n_dims: int, tile: int):
    """Per-lane decode tables for corner lanes j = c·F + f (j < C·F),
    built in-kernel from a lane iota (Pallas kernels cannot capture
    host constants). Returns (lane_off (T,128) i32, bits list of D
    (T,128) f32, used (T,128) f32)."""
    side, _ = _block_geom(n_dims)
    C = 1 << n_dims
    F = 2
    j = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 1)
    c = j // F
    f = j % F
    off = jnp.zeros((tile, LANES), jnp.int32)
    bits = []
    for d in range(n_dims):
        bit = (c >> d) & 1
        off = off + bit * (side ** d)
        bits.append(bit.astype(jnp.float32))
    lane_off = off * F + f
    used = (j < C * F).astype(jnp.float32)
    return lane_off, bits, used


def _weights_from_frac(frac_cols, bits, used):
    """frac_cols: list of D (TILE, 1) fraction columns → (TILE, 128) corner
    weights replicated per feature lane (zero on unused lanes)."""
    w = used
    for d, fc in enumerate(frac_cols):
        b = bits[d]
        w = w * (b * fc + (1.0 - b) * (1.0 - fc))
    return w


def _fwd_kernel(rows_ref, frac_ref, table_ref, out_ref, *, meta, tile, rows):
    D = meta.n_dims
    lane_off, bits, used = _corner_masks(D, tile)
    R = rows

    rows = rows_ref[0, 0, :].reshape(tile, 1)                  # (T, 1) int32
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (tile, R), 1)
    oh = (rows == iota_r).astype(jnp.bfloat16)                 # (T, R)
    tbl = table_ref[0].astype(jnp.bfloat16)                    # (R, 128)
    A = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)   # (T, 128)

    base = rows_ref[0, 1, :].reshape(tile, 1)                  # base lane
    idx = base + lane_off                                      # (T, 128)
    G = jnp.take_along_axis(A, idx, axis=1)                    # corner values

    fracs = [frac_ref[0, d, :].reshape(tile, 1) for d in range(D)]
    w = _weights_from_frac(fracs, bits, used)
    contrib = G * w                                            # (T, 128)
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 1) % 2
    f0 = jnp.sum(jnp.where(lane_f == 0, contrib, 0.0), axis=1)
    f1 = jnp.sum(jnp.where(lane_f == 1, contrib, 0.0), axis=1)
    out_ref[0, 0, :] = f0
    out_ref[0, 1, :] = f1


def _bwd_table_kernel(rows_ref, frac_ref, g_ref, dtable_ref, *, meta, tile,
                      rows):
    """dTable = one-hotᵀ · dRows — needs NO forward recompute: dA is built
    purely from the incoming gradient and the trilinear weights."""
    D = meta.n_dims
    lane_off, bits, used = _corner_masks(D, tile)
    R = rows

    rows = rows_ref[0, 0, :].reshape(tile, 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (tile, R), 1)
    oh = (rows == iota_r).astype(jnp.bfloat16)

    base = rows_ref[0, 1, :].reshape(tile, 1)
    idx = base + lane_off

    fracs = [frac_ref[0, d, :].reshape(tile, 1) for d in range(D)]
    w = _weights_from_frac(fracs, bits, used)

    lane_f = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 1) % 2
    g0 = g_ref[0, 0, :].reshape(tile, 1)
    g1 = g_ref[0, 1, :].reshape(tile, 1)
    gl = jnp.where(lane_f == 0, g0, g1) * used                 # (T, 128)

    # dG = w·g at corner lanes; scatter back to row-lane positions via a
    # 16-step static unroll (C·F ≤ 16 used lanes).
    gv = gl * w                                                # d/dG
    dA = jnp.zeros((tile, LANES), jnp.float32)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 1)
    CF = (1 << D) * 2
    for j in range(CF):
        tgt = idx[:, j].reshape(tile, 1)
        val = gv[:, j].reshape(tile, 1)
        dA = dA + jnp.where(lane_iota == tgt, val, 0.0)

    # table grad: one-hotᵀ @ dA, accumulated over sample tiles
    dT = jax.lax.dot_general(
        oh, dA.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # (R, 128)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dtable_ref[0] = jnp.zeros_like(dtable_ref[0])

    dtable_ref[0] += dT


def _bwd_frac_kernel(rows_ref, frac_ref, table_ref, g_ref, dfrac_ref,
                     *, meta, tile, rows):
    """Position (fraction) gradients — needs the forward corner values, so
    it recomputes the selection matmul. Split into its OWN pallas_call so
    XLA dead-code-eliminates it whenever position gradients are unused
    (camera optimization off — the default training path)."""
    D = meta.n_dims
    lane_off, bits, used = _corner_masks(D, tile)
    R = rows

    rows = rows_ref[0, 0, :].reshape(tile, 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (tile, R), 1)
    oh = (rows == iota_r).astype(jnp.bfloat16)
    tbl = table_ref[0].astype(jnp.bfloat16)
    A = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)

    base = rows_ref[0, 1, :].reshape(tile, 1)
    idx = base + lane_off
    G = jnp.take_along_axis(A, idx, axis=1)

    fracs = [frac_ref[0, d, :].reshape(tile, 1) for d in range(D)]

    lane_f = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 1) % 2
    g0 = g_ref[0, 0, :].reshape(tile, 1)
    g1 = g_ref[0, 1, :].reshape(tile, 1)
    gl = jnp.where(lane_f == 0, g0, g1) * used                 # (T, 128)

    # position grads: dw/dfrac_d = ±Π_{d'≠d} w_d' (on used lanes)
    gG = gl * G                                                # d/dw
    for d in range(D):
        prod = used
        for dd in range(D):
            if dd == d:
                continue
            b = bits[dd]
            prod = prod * (b * fracs[dd] + (1.0 - b) * (1.0 - fracs[dd]))
        sign = bits[d] * 2.0 - 1.0
        dfrac_ref[0, d, :] = jnp.sum(gG * prod * sign, axis=1)


def _pad_to(x, n, axis):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad) if n != x.shape[axis] else x


def _level_groups(meta: BlockedGridMeta):
    """Levels grouped by the selection width the one-hot must scan
    (meta.level_needed_rows): coarse dense levels address far fewer rows
    than the stored table width, and selection cost is linear in scanned
    rows. Returns [(rows_n, np.array(level_ids))], plus the inverse
    permutation that restores level order after per-group concat."""
    groups: dict = {}
    for l, rn in enumerate(meta.level_needed_rows):
        groups.setdefault(rn, []).append(l)
    items = sorted(groups.items())
    order = [l for _, lvls in items for l in lvls]
    inv = np.argsort(np.asarray(order))
    return [(rn, np.asarray(lvls)) for rn, lvls in items], inv


def _geometry(meta: BlockedGridMeta, pos: jax.Array, tile: int):
    """XLA-side geometry: padded (rows+base_lane) and frac arrays."""
    side, _ = _block_geom(meta.n_dims)
    N = pos.shape[0]
    Np = ((N + tile - 1) // tile) * tile
    rows, local, frac = lookup_geometry(meta, pos)             # (L,N),(L,N,D),(L,N,D)
    lane_strides = jnp.asarray([side ** d for d in range(meta.n_dims)], jnp.int32)
    base_lane = jnp.sum(local * lane_strides, axis=-1) * meta.n_features_per_level
    ri = jnp.stack([rows, base_lane], axis=1)                  # (L, 2, N)
    fr = jnp.moveaxis(frac, -1, 1)                             # (L, D, N)
    return (_pad_to(ri.astype(jnp.int32), Np, 2), _pad_to(fr, Np, 2), N, Np)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def blocked_grid_encode(table, pos, meta: BlockedGridMeta,
                        tile: int = DEFAULT_TILE):
    """(L,R,128) table + (N,D) positions → (N, L·F) features (Pallas)."""
    out, _ = _encode_fwd_impl(table, pos, meta, tile)
    return out


def _encode_fwd_impl(table, pos, meta, tile):
    tile = _eff_tile(pos.shape[0], tile)
    L, D = meta.n_levels, meta.n_dims
    ri, fr, N, Np = _geometry(meta, pos, tile)
    n_tiles = Np // tile

    groups, inv = _level_groups(meta)
    parts = []
    for R, lvls in groups:
        Lg = len(lvls)
        idx = jnp.asarray(lvls)
        parts.append(pl.pallas_call(
            functools.partial(_fwd_kernel, meta=meta, tile=tile, rows=R),
            grid=(Lg, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 2, tile), lambda l, t: (l, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, tile), lambda l, t: (l, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, LANES), lambda l, t: (l, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 2, tile), lambda l, t: (l, 0, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Lg, 2, Np), jnp.float32),
            compiler_params=_compiler_params(),
        )(ri[idx], fr[idx], table[idx, :R]))
    out = parts[0] if len(parts) == 1 else \
        jnp.concatenate(parts, axis=0)[jnp.asarray(inv)]
    feats = out[:, :, :N]                                      # (L, 2, N)
    # keep the (cheap to store, ~80 MB at NeRF batch) geometry as residuals
    # so the bwd pass doesn't recompute lookup_geometry on 4M points
    pos_stub = jnp.zeros((0,), pos.dtype)   # dtype carrier (residuals must
    return feats.transpose(2, 0, 1).reshape(N, L * 2), \
        (table, pos_stub, ri, fr)           # be JAX types)


def _encode_fwd(table, pos, meta, tile):
    return _encode_fwd_impl(table, pos, meta, tile)


def _encode_bwd(meta, tile, residuals, g):
    table, pos_stub, ri, fr = residuals
    tile = _eff_tile(g.shape[0], tile)
    L, D = meta.n_levels, meta.n_dims
    N, Np = g.shape[0], ri.shape[2]
    n_tiles = Np // tile
    gT = g.reshape(N, L, 2).transpose(1, 2, 0)                 # (L, 2, N)
    gT = _pad_to(gT, Np, 2)

    groups, inv = _level_groups(meta)
    dt_parts, df_parts = [], []
    for R, lvls in groups:
        Lg = len(lvls)
        idx = jnp.asarray(lvls)
        dt = pl.pallas_call(
            functools.partial(_bwd_table_kernel, meta=meta, tile=tile,
                              rows=R),
            grid=(Lg, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 2, tile), lambda l, t: (l, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, tile), lambda l, t: (l, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, tile), lambda l, t: (l, 0, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, R, LANES), lambda l, t: (l, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Lg, R, LANES), jnp.float32),
            compiler_params=_compiler_params(),
        )(ri[idx], fr[idx], gT[idx])
        # untouched rows of dense levels carry zero grad
        dt_parts.append(_pad_to(dt, meta.rows, 1))

        df_parts.append(pl.pallas_call(
            functools.partial(_bwd_frac_kernel, meta=meta, tile=tile,
                              rows=R),
            grid=(Lg, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 2, tile), lambda l, t: (l, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, tile), lambda l, t: (l, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, LANES), lambda l, t: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, tile), lambda l, t: (l, 0, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, D, tile), lambda l, t: (l, 0, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Lg, D, Np), jnp.float32),
            compiler_params=_compiler_params(),
        )(ri[idx], fr[idx], table[idx, :R], gT[idx]))

    if len(groups) == 1:
        dtable, dfrac = dt_parts[0], df_parts[0]
    else:
        inv_j = jnp.asarray(inv)
        dtable = jnp.concatenate(dt_parts, axis=0)[inv_j]
        dfrac = jnp.concatenate(df_parts, axis=0)[inv_j]

    # chain dfrac → dpos: frac = pos·scale + 0.5 - floor(...)
    scales = jnp.asarray(meta.level_scales, jnp.float32)
    dpos = jnp.einsum("ldn,l->nd", dfrac[:, :, :N], scales)
    return dtable, dpos.astype(pos_stub.dtype)


blocked_grid_encode.defvjp(_encode_fwd, _encode_bwd)


# --------------------------------------------------------------------------
# int8 variant: one-hot selection + table in int8 → MXU int8 rate (2× bf16)
# --------------------------------------------------------------------------

def _fwd_kernel_i8(rows_ref, frac_ref, table_ref, scale_ref, out_ref,
                   *, meta, tile, rows):
    """Forward with an int8-quantized table (per-LEVEL scale): the
    selection matmul runs at the MXU's int8 rate. Exactness: the one-hot
    is 0/1 int8, so the int32 accumulator reproduces the quantized row
    exactly; the only error is the table quantization itself."""
    D = meta.n_dims
    lane_off, bits, used = _corner_masks(D, tile)
    R = rows

    rows = rows_ref[0, 0, :].reshape(tile, 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (tile, R), 1)
    oh = (rows == iota_r).astype(jnp.int8)                     # (T, R)
    tbl = table_ref[0]                                         # (R,128) i8
    A = jnp.dot(oh, tbl, preferred_element_type=jnp.int32)     # (T, 128)
    A = A.astype(jnp.float32) * scale_ref[pl.program_id(0), 0]

    base = rows_ref[0, 1, :].reshape(tile, 1)
    idx = base + lane_off
    G = jnp.take_along_axis(A, idx, axis=1)

    fracs = [frac_ref[0, d, :].reshape(tile, 1) for d in range(D)]
    w = _weights_from_frac(fracs, bits, used)
    contrib = G * w
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 1) % 2
    out_ref[0, 0, :] = jnp.sum(jnp.where(lane_f == 0, contrib, 0.0), axis=1)
    out_ref[0, 1, :] = jnp.sum(jnp.where(lane_f == 1, contrib, 0.0), axis=1)


def _bwd_table_kernel_i8(rows_ref, frac_ref, g_ref, dtable_ref,
                         *, meta, tile, rows):
    """dTable via int8 MXU: quantize this tile's dA with a per-tile
    scale (stochastic-free round; gradients are noisy anyway), multiply
    int8×int8 → int32, rescale, accumulate f32."""
    D = meta.n_dims
    lane_off, bits, used = _corner_masks(D, tile)
    R = rows

    rows = rows_ref[0, 0, :].reshape(tile, 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (tile, R), 1)
    oh = (rows == iota_r).astype(jnp.int8)

    base = rows_ref[0, 1, :].reshape(tile, 1)
    idx = base + lane_off
    fracs = [frac_ref[0, d, :].reshape(tile, 1) for d in range(D)]
    w = _weights_from_frac(fracs, bits, used)

    lane_f = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 1) % 2
    g0 = g_ref[0, 0, :].reshape(tile, 1)
    g1 = g_ref[0, 1, :].reshape(tile, 1)
    gl = jnp.where(lane_f == 0, g0, g1) * used

    gv = gl * w
    dA = jnp.zeros((tile, LANES), jnp.float32)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 1)
    CF = (1 << D) * 2
    for j in range(CF):
        tgt = idx[:, j].reshape(tile, 1)
        val = gv[:, j].reshape(tile, 1)
        dA = dA + jnp.where(lane_iota == tgt, val, 0.0)

    scale = jnp.maximum(jnp.max(jnp.abs(dA)), 1e-20) / 127.0
    dA_i8 = jnp.clip(jnp.round(dA / scale), -127, 127).astype(jnp.int8)
    dT = jax.lax.dot_general(
        oh, dA_i8, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                      # (R, 128)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dtable_ref[0] = jnp.zeros_like(dtable_ref[0])

    dtable_ref[0] += dT.astype(jnp.float32) * scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def blocked_grid_encode_int8(table, pos, meta: BlockedGridMeta,
                             tile: int = DEFAULT_TILE):
    """int8-MXU variant of blocked_grid_encode: the fwd table and the bwd
    cotangents are quantized to int8 (per-level / per-tile scales), so
    both selection matmuls run at twice the bf16 rate. Gate behind
    NGP_TPU_ENCODE_INT8; quality ablation lives in bench_fox."""
    out, _ = _encode_fwd_impl_i8(table, pos, meta, tile)
    return out


def _encode_fwd_impl_i8(table, pos, meta, tile):
    tile = _eff_tile(pos.shape[0], tile)
    L, D = meta.n_levels, meta.n_dims
    ri, fr, N, Np = _geometry(meta, pos, tile)
    n_tiles = Np // tile

    scales = jnp.maximum(jnp.max(jnp.abs(table), axis=(1, 2)),
                         1e-20) / 127.0                        # (L,)
    tq = jnp.clip(jnp.round(table / scales[:, None, None]),
                  -127, 127).astype(jnp.int8)
    scales2d = scales[:, None]                                 # SMEM (1,1)

    groups, inv = _level_groups(meta)
    parts = []
    for R, lvls in groups:
        Lg = len(lvls)
        idx = jnp.asarray(lvls)
        parts.append(pl.pallas_call(
            functools.partial(_fwd_kernel_i8, meta=meta, tile=tile,
                              rows=R),
            grid=(Lg, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 2, tile), lambda l, t: (l, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, tile), lambda l, t: (l, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, LANES), lambda l, t: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Lg, 1), lambda l, t: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 2, tile), lambda l, t: (l, 0, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Lg, 2, Np), jnp.float32),
            compiler_params=_compiler_params(),
        )(ri[idx], fr[idx], tq[idx, :R], scales2d[idx]))
    out = parts[0] if len(parts) == 1 else \
        jnp.concatenate(parts, axis=0)[jnp.asarray(inv)]
    feats = out[:, :, :N]
    pos_stub = jnp.zeros((0,), pos.dtype)
    return feats.transpose(2, 0, 1).reshape(N, L * 2), \
        (table, pos_stub, ri, fr)


def _encode_fwd_i8(table, pos, meta, tile):
    return _encode_fwd_impl_i8(table, pos, meta, tile)


def _encode_bwd_i8(meta, tile, residuals, g):
    table, pos_stub, ri, fr = residuals
    tile = _eff_tile(g.shape[0], tile)
    L, D = meta.n_levels, meta.n_dims
    N, Np = g.shape[0], ri.shape[2]
    n_tiles = Np // tile
    gT = g.reshape(N, L, 2).transpose(1, 2, 0)
    gT = _pad_to(gT, Np, 2)

    groups, inv = _level_groups(meta)
    dt_parts, df_parts = [], []
    for R, lvls in groups:
        Lg = len(lvls)
        idx = jnp.asarray(lvls)
        dt = pl.pallas_call(
            functools.partial(_bwd_table_kernel_i8, meta=meta, tile=tile,
                              rows=R),
            grid=(Lg, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 2, tile), lambda l, t: (l, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, tile), lambda l, t: (l, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, tile), lambda l, t: (l, 0, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, R, LANES), lambda l, t: (l, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Lg, R, LANES), jnp.float32),
            compiler_params=_compiler_params(),
        )(ri[idx], fr[idx], gT[idx])
        dt_parts.append(_pad_to(dt, meta.rows, 1))

        # position grads: reuse the f32 dfrac kernel (DCE'd when unused)
        df_parts.append(pl.pallas_call(
            functools.partial(_bwd_frac_kernel, meta=meta, tile=tile,
                              rows=R),
            grid=(Lg, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 2, tile), lambda l, t: (l, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, tile), lambda l, t: (l, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, LANES), lambda l, t: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, tile), lambda l, t: (l, 0, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, D, tile), lambda l, t: (l, 0, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Lg, D, Np), jnp.float32),
            compiler_params=_compiler_params(),
        )(ri[idx], fr[idx], table[idx, :R], gT[idx]))

    if len(groups) == 1:
        dtable, dfrac = dt_parts[0], df_parts[0]
    else:
        inv_j = jnp.asarray(inv)
        dtable = jnp.concatenate(dt_parts, axis=0)[inv_j]
        dfrac = jnp.concatenate(df_parts, axis=0)[inv_j]

    scales = jnp.asarray(meta.level_scales, jnp.float32)
    dpos = jnp.einsum("ldn,l->nd", dfrac[:, :, :N], scales)
    return dtable, dpos.astype(pos_stub.dtype)


blocked_grid_encode_int8.defvjp(_encode_fwd_i8, _encode_bwd_i8)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def blocked_grid_encode_i8fwd(table, pos, meta: BlockedGridMeta,
                              tile: int = DEFAULT_TILE):
    """Mixed-precision encode: int8 forward (selection matmul at the
    MXU's int8 rate — chip sweep: 66 → 48 ms fwd at 2^18×16×2^13) with
    the EXACT bf16/f32 backward, so gradients carry no quantization
    noise. The only approximation is the per-level table quantization in
    the forward activations (quality-ablated in bench_fox)."""
    out, _ = _encode_fwd_impl_i8(table, pos, meta, tile)
    return out


blocked_grid_encode_i8fwd.defvjp(_encode_fwd_i8, _encode_bwd)
