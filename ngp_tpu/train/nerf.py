"""NeRF training engine.

TPU-native re-design of the reference's NeRF trainer
(ref: src/testbed_nerf.cu:1085-1600, 2896-3385). The key structural change:
the reference's sequential occupancy-grid ray march (two-pass count/compact
with atomics) is replaced by a **closed-form step lattice**. Cone-stepping
t_{k+1} = t_k + clamp(t_k·cone, Δmin, Δmax) has an exact 3-phase closed
form (linear below Δmin/cone, geometric in between, linear above
Δmax/cone), and both the reference's emit and skip paths advance on this
lattice — so the set of training samples is exactly {lattice points that
are occupied}. That makes sample generation a fully-parallel filter:

    lattice (R,K) → occupancy mask (one gather) → compaction (one scatter)

with no sequential marching loop, no atomics, and static shapes end-to-end.
Compositing uses the exact identity log(1-α) = -σ·Δt, so per-ray
transmittance is a segmented cumulative sum; the hand-derived backward of
the reference (compute_loss_kernel_train_nerf) is replaced by autodiff of
the same math.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.common import (LOSS_SCALE, MAX_CONE_STEPSIZE, MIN_CONE_STEPSIZE,
                            NERF_MIN_OPTICAL_THICKNESS, LossType,
                            linear_to_srgb, loss_type_from_str, mse2psnr,
                            srgb_to_linear)
from ngp_tpu.config import autofill_hashgrid_config
from ngp_tpu.data.nerf_loader import NerfDataset
from ngp_tpu.grid import occupancy as occ
from ngp_tpu.nn.models import NerfNetwork
from ngp_tpu.opt.losses import loss_fn as make_loss
from ngp_tpu.opt.optimizers import (AdamConfig, apply_update,
                                    inference_params, init_state)
from ngp_tpu.rays.camera import pixel_to_ray_train
from ngp_tpu.rays.marching import (calc_dt, compact_samples, cone_angle_for,
                                   march_rays, step_lattice)


class TrainStepStats(NamedTuple):
    loss: jax.Array
    measured_samples: jax.Array          # compacted samples this step
    measured_samples_uncompacted: jax.Array
    n_rays_with_samples: jax.Array


@dataclasses.dataclass
class NerfTrainerConfig:
    n_rays: int = 4096               # adapted between steps (power-of-2)
    target_batch_size: int = 1 << 18
    march_steps: int = 1024          # lattice length K
    random_bg_color: bool = True
    train_in_linear_colors: bool = False
    color_space_linear: bool = True  # Testbed default EColorSpace::Linear
    near_distance: float = 0.2       # ref: testbed.h:675
    density_grid_decay: float = 0.95
    n_steps_between_grid_updates: int = 16
    snap_to_pixel_centers: bool = False


class NerfTrainer:
    """Owns model/optimizer/occupancy state for one NeRF scene."""

    def __init__(self, dataset: NerfDataset, config: dict, seed: int = 1337,
                 tcfg: Optional[NerfTrainerConfig] = None):
        self.dataset = dataset
        self.tcfg = tcfg or NerfTrainerConfig()
        aabb_scale = dataset.aabb_scale
        self.aabb_scale = aabb_scale
        half = aabb_scale / 2.0
        self.aabb_min = np.float32(0.5 - half)
        self.aabb_size = np.float32(aabb_scale)
        self.max_cascade = max(0, int(math.log2(aabb_scale)))
        self.cone_angle = cone_angle_for(aabb_scale)

        enc = autofill_hashgrid_config(config["encoding"], 3, 2048.0,
                                       aabb_scale=aabb_scale)
        cfg = dict(config)
        cfg["encoding"] = enc
        self.model = NerfNetwork(cfg, n_extra_dims=dataset.n_extra_learnable_dims)
        self.loss_type = loss_type_from_str(config.get("loss", {}).get("otype", "L2"))
        self.rgb_loss = make_loss(self.loss_type)
        self.opt_cfg = AdamConfig.from_config(config.get("optimizer", {}),
                                              loss_scale=LOSS_SCALE)

        key = jax.random.PRNGKey(seed)
        self.key, k_init = jax.random.split(key)
        self.params = self.model.init_params(k_init)
        self.opt_state = init_state(self.params, self.opt_cfg)
        self.matrix_mask = self.model.matrix_mask(self.params)

        # occupancy grid, with camera-visibility culling at init
        # (ref: mark_untrained_density_grid)
        grid = occ.init_grid(self.max_cascade)
        density0 = occ.mark_untrained(
            self.max_cascade,
            jnp.asarray(dataset.xforms),
            jnp.asarray(dataset.focal),
            jnp.asarray(dataset.resolution))
        self.grid = grid._replace(density=density0)

        # device-resident dataset (fp16 images like the reference's GPU
        # copy). Bundled as a pytree passed INTO the jitted step — a
        # closure capture would embed the image tensor as an HLO constant
        # (hundreds of MB in the serialized module).
        self.data = {
            "images": jnp.asarray(dataset.images, jnp.float16),
            "xforms": jnp.asarray(dataset.xforms),
            "focal": jnp.asarray(dataset.focal),
            "principal": jnp.asarray(dataset.principal),
            "resolution": jnp.asarray(dataset.resolution, jnp.float32),
            "lens_params": jnp.asarray(dataset.lens_params),
        }

        self.training_step = 0
        self.loss_scalar_ema = 0.0
        self._step_fns = {}  # n_rays → jitted step
        self._grid_update = jax.jit(self._grid_update_impl,
                                    static_argnames=("full_sweep",),
                                    donate_argnums=(1,))

    # ------------------------------------------------------------------
    # sample generation (lattice + filter + compaction)
    # ------------------------------------------------------------------

    def _generate_rays(self, data, key, n_rays):
        """Pick image/pixel per ray, build world rays + targets."""
        k_img, k_xy, k_t = jax.random.split(key, 3)
        img = jax.random.randint(k_img, (n_rays,), 0, self.dataset.n_images)
        xy = jax.random.uniform(k_xy, (n_rays, 2))
        res = data["resolution"][img]
        if self.tcfg.snap_to_pixel_centers:
            xy = (jnp.floor(xy * res) + 0.5) / res

        o, d_raw = pixel_to_ray_train(
            xy, data["xforms"][img], data["focal"][img],
            data["principal"][img], res, data["lens_params"][img],
            self.dataset.lens_is_opencv)
        d_norm_len = jnp.linalg.norm(d_raw, axis=-1, keepdims=True)
        d = d_raw / jnp.maximum(d_norm_len, 1e-9)

        # nearest-texel premultiplied-linear target (ref: read_rgba)
        pix = jnp.clip((xy * res).astype(jnp.int32), 0,
                       res.astype(jnp.int32) - 1)
        texsamp = data["images"][img, pix[:, 1], pix[:, 0]].astype(jnp.float32)
        return img, xy, o, d, texsamp

    def _march(self, bitfield, o, d, key, n_rays):
        return march_rays(bitfield, o, d, key, n_rays, self.tcfg.march_steps,
                          self.cone_angle, self.max_cascade,
                          self.aabb_min, self.aabb_size)

    def _compact(self, t, dt, emit, n_rays):
        return compact_samples(t, dt, emit, n_rays,
                               self.tcfg.target_batch_size)

    # ------------------------------------------------------------------
    # one training step
    # ------------------------------------------------------------------

    def _train_step_impl(self, params, opt_state, bitfield, grid_mean, key,
                         data, n_rays):
        tc = self.tcfg
        S = tc.target_batch_size
        k_ray, k_march, k_bg, key = jax.random.split(key, 4)

        img, xy, o, d, texsamp = self._generate_rays(data, k_ray, n_rays)
        t, dt, emit = self._march(bitfield, o, d, k_march, n_rays)
        # masked-away pixels (negative red sentinel) never train
        emit = emit & (texsamp[:, 0] >= 0.0)[:, None]
        s_t, s_dt, s_ray, counts, offsets, fits, total = self._compact(
            t, dt, emit, n_rays)

        sample_o = o[jnp.clip(s_ray, 0, n_rays - 1)]
        sample_d = d[jnp.clip(s_ray, 0, n_rays - 1)]
        s_pos = sample_o + s_t[:, None] * sample_d
        s_pos_warp = (s_pos - self.aabb_min) / self.aabb_size
        s_dir_warp = sample_d * 0.5 + 0.5

        # target reconstruction (ref: compute_loss_kernel_train_nerf
        # :1388-1427). Linear colorspace path, sRGB network output space.
        if tc.random_bg_color:
            bg = jax.random.uniform(k_bg, (n_rays, 3))
        else:
            bg = jnp.ones((n_rays, 3))
        bg_linear = srgb_to_linear(bg)
        rgbtarget = texsamp[:, :3] + (1.0 - texsamp[:, 3:4]) * bg_linear
        if not tc.train_in_linear_colors:
            rgbtarget = linear_to_srgb(rgbtarget)
            bg_out = linear_to_srgb(bg_linear)
        else:
            bg_out = bg_linear

        valid = s_ray < n_rays                                  # (S,)
        has_samples = (counts > 0) & fits
        n_eff = jnp.maximum(has_samples.sum(), 1)

        reg_on = (grid_mean < NERF_MIN_OPTICAL_THICKNESS).astype(jnp.float32)

        def loss_of(p):
            rgb_raw, dens_raw = self.model.apply(p, s_pos_warp, s_dir_warp)
            rgb = jax.nn.sigmoid(rgb_raw.astype(jnp.float32))
            sigma = jnp.exp(jnp.clip(dens_raw.astype(jnp.float32), -15., 15.))
            sdt = jnp.where(valid, sigma * s_dt, 0.0)

            # per-ray transmittance via segmented cumsum of σΔt
            cum = jnp.cumsum(sdt)
            excl = cum - sdt
            seg_base = jnp.where(counts > 0, excl[jnp.clip(offsets, 0, S - 1)], 0.0)
            T = jnp.exp(-(excl - seg_base[jnp.clip(s_ray, 0, n_rays - 1)]))
            alpha = 1.0 - jnp.exp(-sdt)
            w = jnp.where(valid, T * alpha, 0.0)

            rgb_ray = jnp.zeros((n_rays, 3)).at[s_ray].add(
                w[:, None] * rgb, mode="drop")
            opt_depth = jnp.zeros((n_rays,)).at[s_ray].add(sdt, mode="drop")
            T_end = jnp.exp(-opt_depth)
            rgb_ray = rgb_ray + T_end[:, None] * bg_out

            per_c = self.rgb_loss(rgbtarget, rgb_ray)           # (R, 3)
            ray_mask = has_samples.astype(jnp.float32)
            loss_rgb = jnp.sum(per_c * ray_mask[:, None]) / n_eff

            # density regularizers (ref: :1495-1547, added to dL/draw
            # WITHOUT loss_scale — so divide by LOSS_SCALE here)
            depth = s_t
            near_pen = jnp.where(
                valid & (dens_raw > -10.0) & (depth < tc.near_distance),
                1e-4 * dens_raw, 0.0).sum()
            l1_pen = reg_on * (-1e-4 * jnp.minimum(dens_raw, 0.0) *
                               valid).sum()
            reg = (near_pen + l1_pen) / LOSS_SCALE
            return (loss_rgb + reg) * LOSS_SCALE, (loss_rgb, per_c, ray_mask)

        (scaled_loss, (loss_rgb, per_c, ray_mask)), grads = \
            jax.value_and_grad(loss_of, has_aux=True)(params)
        params, opt_state = apply_update(params, grads, opt_state,
                                         self.opt_cfg, self.matrix_mask)
        stats = TrainStepStats(
            loss=loss_rgb / 3.0,
            measured_samples=jnp.minimum(total, S),
            measured_samples_uncompacted=emit.sum(),
            n_rays_with_samples=has_samples.sum(),
        )
        return params, opt_state, stats, key

    # ------------------------------------------------------------------
    # occupancy-grid maintenance
    # ------------------------------------------------------------------

    def _grid_update_impl(self, params, grid, key, full_sweep: bool):
        def density_fn(warped):
            # evaluate in 2^18 chunks — a full sweep queries millions of
            # cells and the hash-gather index tensors would blow HBM.
            n = warped.shape[0]
            chunk = 1 << 18
            if n <= chunk:
                return self.model.density(params, warped)
            pad = (-n) % chunk
            w = jnp.pad(warped, ((0, pad), (0, 0)))
            out = jax.lax.map(
                lambda c: self.model.density(params, c),
                w.reshape(-1, chunk, 3))
            return out.reshape(-1)[:n]

        if full_sweep:
            n_u = occ.GRID_VOLUME * (self.max_cascade + 1)
            n_n = 1
        else:
            n_u = occ.GRID_VOLUME // 4
            n_n = occ.GRID_VOLUME // 4
        return occ.update_grid(
            grid, density_fn, key, self.max_cascade,
            decay=self.tcfg.density_grid_decay,
            n_uniform=n_u, n_nonuniform=max(n_n, 1),
            aabb_min=self.aabb_min, aabb_size=self.aabb_size)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def train(self, n_steps: int) -> float:
        tc = self.tcfg
        loss = 0.0
        for _ in range(n_steps):
            if self.training_step % tc.n_steps_between_grid_updates == 0:
                self.key, k = jax.random.split(self.key)
                self.grid = self._grid_update(
                    self.params, self.grid, k,
                    full_sweep=self.training_step < 256)
            n_rays = self.tcfg.n_rays
            fn = self._step_fns.get(n_rays)
            if fn is None:
                fn = jax.jit(functools.partial(self._train_step_impl,
                                               n_rays=n_rays),
                             donate_argnums=(0, 1))
                self._step_fns[n_rays] = fn
            self.params, self.opt_state, stats, self.key = fn(
                self.params, self.opt_state, self.grid.bitfield,
                self.grid.mean, self.key, self.data)
            self.training_step += 1
            loss = float(stats.loss)
            # rays/batch adaptation (ref: NerfCounters::update_after_training)
            measured = int(stats.measured_samples)
            if measured > 0:
                ideal = n_rays * tc.target_batch_size / measured
                new_rays = 1 << int(round(math.log2(max(ideal, 256))))
                self.tcfg.n_rays = int(min(new_rays, 1 << 18))
        return loss

    # inference helpers -------------------------------------------------

    @functools.cached_property
    def _density_infer(self):
        @jax.jit
        def run(params, pos_warped):
            return self.model.density(params, pos_warped)
        return run

    def density_at(self, pos: np.ndarray) -> np.ndarray:
        """σ at world positions (unwarped), using inference (EMA) params."""
        p = inference_params(self.params, self.opt_state, self.opt_cfg)
        warped = (np.asarray(pos) - float(self.aabb_min)) / float(self.aabb_size)
        return np.asarray(self._density_infer(p, jnp.asarray(warped)))

    # snapshot I/O ------------------------------------------------------

    def save_snapshot(self, path, network_config: dict):
        """ref: Testbed::save_snapshot (src/testbed.cu:3008-3042)."""
        from ngp_tpu.io.snapshot import save_snapshot
        save_snapshot(
            path, network_config,
            params=jax.tree.map(np.asarray, self.params),
            ema_params=jax.tree.map(np.asarray, self.opt_state.ema_params),
            density_grid=np.asarray(self.grid.density),
            max_cascade=self.max_cascade,
            training_step=self.training_step,
            aabb_scale=self.aabb_scale,
            aabb_min=[float(self.aabb_min)] * 3,
            aabb_max=[float(self.aabb_min + self.aabb_size)] * 3,
            rays_per_batch=self.tcfg.n_rays,
        )

    def load_snapshot_state(self, path):
        """Restore params/EMA/grid from a snapshot written by this class."""
        from ngp_tpu.io.snapshot import load_snapshot
        doc = load_snapshot(path)
        snap = doc["snapshot"]
        self.params = jax.tree.map(jnp.asarray, snap["ngp_tpu_params"])
        self.opt_state = self.opt_state._replace(
            ema_params=jax.tree.map(jnp.asarray, snap["ngp_tpu_ema_params"]))
        if "density_grid" in snap:
            density = jnp.asarray(snap["density_grid"][: self.grid.density.size])
            self.grid = occ.rebuild_bitfield(
                self.grid._replace(density=density), self.max_cascade)
        self.training_step = int(snap.get("training_step", 0))
        return doc
