"""Data-parallel NeRF training step over a device mesh.

The reference is single-GPU (ref: README.md:239-241); this is the
first-class TPU scaling design from SURVEY §2.10: rays are embarrassingly
parallel, so the batch axis is sharded over the mesh's ``data`` axis with
``shard_map``. Each device marches/compacts/evaluates ITS OWN rays into a
local sample buffer (no cross-device compaction traffic), then gradients
and counters are ``psum``'d over ICI and the (replicated) Adam update runs
identically everywhere. The occupancy grid is maintained replicated —
its update already runs every N steps and its splat inputs are cheap to
recompute per device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ngp_tpu.common import LOSS_SCALE, NERF_MIN_OPTICAL_THICKNESS, \
    linear_to_srgb, srgb_to_linear
from ngp_tpu.opt.optimizers import apply_update
from ngp_tpu.rays.marching import compact_samples, march_rays


def make_dp_train_step(trainer, mesh: Mesh, n_rays_per_device: int = 1024,
                       samples_per_device: int = 1 << 14):
    """Build a jitted DP train step for the given NerfTrainer and mesh.

    Returns step(params, opt_state, bitfield, grid_mean, key, data) →
    (params, opt_state, loss). ``data`` must be replicated on the mesh.
    """
    tc = trainer.tcfg
    model = trainer.model
    n_dev = mesh.shape["data"]

    def per_shard_loss(params, bitfield, grid_mean, key, data):
        # distinct RNG stream per shard
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        k_ray, k_march, k_bg = jax.random.split(key, 3)
        n_rays = n_rays_per_device
        S = samples_per_device

        img, xy, texsamp, _ = trainer._sample_pixels(
            data, {"cdf_x": None, "cdf_y": None, "cdf_img": None}, k_ray,
            n_rays)
        o, d, _ = trainer._build_rays(data, trainer.cam_params, img, xy)
        t, dt, emit = march_rays(
            bitfield, o, d, k_march, n_rays, tc.march_steps,
            trainer.cone_angle, trainer.max_cascade,
            trainer.aabb_min, trainer.aabb_size)
        emit = emit & (texsamp[:, 0] >= 0.0)[:, None]
        s_t, s_dt, s_ray, counts, offsets, fits, total, _ = compact_samples(
            t, dt, emit, n_rays, S)
        rid = jnp.clip(s_ray, 0, n_rays - 1)

        bg = jax.random.uniform(k_bg, (n_rays, 3)) if tc.random_bg_color \
            else jnp.ones((n_rays, 3))
        bg_linear = srgb_to_linear(bg)
        rgbtarget = texsamp[:, :3] + (1.0 - texsamp[:, 3:4]) * bg_linear
        rgbtarget = linear_to_srgb(rgbtarget)
        bg_out = linear_to_srgb(bg_linear)

        valid = s_ray < n_rays
        has_samples = (counts > 0) & fits

        def loss_of(p):
            s_pos = o[rid] + s_t[:, None] * d[rid]
            s_pos_warp = (s_pos - trainer.aabb_min) / trainer.aabb_size
            s_dir_warp = d[rid] * 0.5 + 0.5
            rgb_raw, dens_raw = model.apply(p, s_pos_warp, s_dir_warp)
            rgb = jax.nn.sigmoid(rgb_raw.astype(jnp.float32))
            sigma = jnp.exp(jnp.clip(dens_raw.astype(jnp.float32), -15., 15.))
            sdt = jnp.where(valid, sigma * s_dt, 0.0)
            cum = jnp.cumsum(sdt)
            excl = cum - sdt
            seg_base = jnp.where(counts > 0,
                                 excl[jnp.clip(offsets, 0, S - 1)], 0.0)
            T = jnp.exp(-(excl - seg_base[rid]))
            alpha = 1.0 - jnp.exp(-sdt)
            w = jnp.where(valid, T * alpha, 0.0)
            rgb_ray = jnp.zeros((n_rays, 3)).at[s_ray].add(
                w[:, None] * rgb, mode="drop")
            T_end = jnp.exp(-jnp.zeros((n_rays,)).at[s_ray].add(
                sdt, mode="drop"))
            rgb_ray = rgb_ray + T_end[:, None] * bg_out
            per_c = trainer.rgb_loss(rgbtarget, rgb_ray)
            # local SUM; the psum'd count normalizes globally
            loss_sum = jnp.sum(per_c * has_samples[:, None])
            return loss_sum * LOSS_SCALE, has_samples.sum()

        (loss_sum, n_eff), grads = jax.value_and_grad(
            loss_of, has_aux=True)(params)
        # ICI collectives: gradient + counter reduction. Normalize by the
        # GLOBAL effective ray count so the DP step matches the
        # single-device step's loss_sum/n_eff (ref divides loss_scale by
        # n_rays, testbed_nerf.cu:1493); without this the gradient scale
        # would drift with per-step sample counts and device count.
        grads = jax.lax.psum(grads, "data")
        loss_sum = jax.lax.psum(loss_sum, "data")
        n_eff = jnp.maximum(jax.lax.psum(n_eff, "data"), 1)
        grads = jax.tree.map(lambda g: g / n_eff, grads)
        return grads, loss_sum / n_eff

    sharded = shard_map(
        per_shard_loss, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_rep=False)

    @jax.jit
    def step(params, opt_state, bitfield, grid_mean, key, data):
        grads, loss = sharded(params, bitfield, grid_mean, key, data)
        params, opt_state = apply_update(
            params, grads, opt_state, trainer.opt_cfg, trainer.matrix_mask)
        return params, opt_state, loss / LOSS_SCALE

    return step
