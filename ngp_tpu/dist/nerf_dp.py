"""Data-parallel NeRF training step over a device mesh.

The reference is single-GPU (ref: README.md:239-241); this is the
first-class TPU scaling design from SURVEY §2.10: rays are embarrassingly
parallel, so the batch axis is sharded over the mesh's ``data`` axis with
``shard_map``. Each device marches/compacts/evaluates ITS OWN rays into a
local sample buffer (no cross-device compaction traffic), then gradients,
counters and error-map deposits are ``psum``'d over ICI and the
(replicated) Adam update runs identically everywhere.

Round-3 rework: the per-device body IS ``NerfTrainer._train_step_impl``
with ``axis_name="data"`` — one loss implementation for single-device and
DP (the reference has one step driver, ref: src/testbed_nerf.cu:3138-3385).
Hierarchical march, importance sampling, camera/exposure/focal
optimization, depth supervision and the error-map deposit are all
inherited instead of hand-cloned (the round-2 version drifted).

Round-4 fix (advisor): ``err_state`` and ``sharp_grid`` are STEP
ARGUMENTS, not closure captures — the importance-sampling CDFs refresh
between steps and the sharpness grid is live, exactly like the
single-device train loop.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ngp_tpu.common import LOSS_SCALE  # noqa: F401  (re-export legacy)


def make_dp_train_step(trainer, mesh: Mesh, n_rays_per_device: int = 1024,
                       samples_per_device: int = 1 << 14):
    """Build a jitted DP train step for the given NerfTrainer and mesh.

    Returns
        step(params, opt_state, cam, cam_m, cam_v, error_map, sharp_grid,
             err_state, bitfield, coarse, grid_mean, key, data)
          → (params, opt_state, cam, cam_m, cam_v, error_map, sharp_grid,
             loss)
    All inputs replicated on the mesh; rays/samples are sharded
    implicitly by giving each device its own RNG stream. Pass the
    trainer's live ``sharpness_grid`` and ``trainer._error_state()`` (or
    ``null_error_state()`` when importance sampling is off) each call so
    the sampling distribution tracks training.
    """
    def per_device(params, opt_state, cam, cam_m, cam_v, error_map,
                   sharp_grid, err_state, bitfield, coarse, grid_mean,
                   key, data):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        params, opt_state, cam, cam_m, cam_v, error_map, sharp_grid, \
            stats, _ = trainer._train_step_impl(
                params, opt_state, cam, cam_m, cam_v, error_map,
                sharp_grid, err_state, bitfield, coarse, grid_mean, key,
                data, n_rays=n_rays_per_device, axis_name="data",
                capacity=samples_per_device)
        return (params, opt_state, cam, cam_m, cam_v, error_map,
                sharp_grid, stats.loss)

    n_in = 13
    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=tuple(P() for _ in range(n_in)),
        out_specs=tuple(P() for _ in range(8)),
        check_rep=False)

    return jax.jit(sharded)


def null_error_state():
    """err_state placeholder when importance sampling is disabled."""
    return {"cdf_x": None, "cdf_y": None, "cdf_img": None}
