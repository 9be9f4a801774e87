"""Single-NeRF renderer.

TPU-native equivalent of the reference's NerfTracer pipeline
(ref: src/testbed_nerf.cu:2047-2500: init_rays_from_camera → trace →
composite → shade). Instead of the iterative compact-march-infer loop with
a host-synced alive counter, each pixel chunk is rendered with the same
closed-form lattice + occupancy filter + compaction as training, then one
batched network call and a segmented composite. Network output space is
sRGB (logistic activation); compositing happens there and the background
is blended with remaining transmittance, matching the training-time math.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.common import RenderMode, srgb_to_linear
from ngp_tpu.rays.marching import (compact_samples, composite_samples,
                                   march_rays)


@dataclasses.dataclass
class RenderOptions:
    width: int = 1080
    height: int = 1920
    fov_axis_focal: float = 1375.0       # focal length in pixels (x)
    focal_y: Optional[float] = None
    principal: tuple = (0.5, 0.5)
    spp: int = 1
    render_mode: RenderMode = RenderMode.SHADE
    lens_params: tuple = (0.0, 0.0, 0.0, 0.0)   # OpenCV k1 k2 p1 p2
    background: tuple = (0.0, 0.0, 0.0, 0.0)
    linear_out: bool = True              # return linear RGB (like run.py eval)
    min_transmittance: float = 1e-4
    chunk: int = 1 << 16
    march_steps: int = 1024
    samples_per_chunk_factor: int = 48   # per-ray sample cap per segment
    march_segments: int = 4              # early-out granularity


class NerfRenderer:
    """Renders frames from a trained NeRF (model+params+occupancy grid)."""

    def __init__(self, model, aabb_min, aabb_size, cone_angle, max_cascade,
                 opts: Optional[RenderOptions] = None):
        self.model = model
        self.aabb_min = aabb_min
        self.aabb_size = aabb_size
        self.cone_angle = cone_angle
        self.max_cascade = max_cascade
        self.opts = opts or RenderOptions()

    @classmethod
    def for_trainer(cls, trainer, opts: Optional[RenderOptions] = None):
        return cls(trainer.model, trainer.aabb_min, trainer.aabb_size,
                   trainer.cone_angle, trainer.max_cascade, opts)

    # ------------------------------------------------------------------

    @functools.cached_property
    def _render_chunk(self):
        opts = self.opts

        mode = opts.render_mode

        @functools.partial(jax.jit, static_argnames=("n_rays",))
        def run(params, bitfield, o, d, bg, n_rays):
            per_ray = opts.samples_per_chunk_factor
            S = opts.chunk * per_ray
            t, dt, emit = march_rays(
                bitfield, o, d, None, n_rays, opts.march_steps,
                self.cone_angle, self.max_cascade,
                self.aabb_min, self.aabb_size, t_start_min=0.05)

            # Segmented front-to-back evaluation with transmittance
            # early-out: saturated rays stop consuming network evals in
            # later segments (the reference gets this from its per-8-step
            # trace loop + min_transmittance cutoff).
            nseg = max(opts.march_segments, 1)
            seg_len = opts.march_steps // nseg
            rgb_acc = jnp.zeros((n_rays, 3))
            depth_acc = jnp.zeros((n_rays,))
            cost_acc = jnp.zeros((n_rays,))
            logT = jnp.zeros((n_rays,))
            total = jnp.zeros((), jnp.int32)
            for si in range(nseg):
                sl = slice(si * seg_len, (si + 1) * seg_len)
                alive = jnp.exp(-logT) > opts.min_transmittance
                emit_s = emit[:, sl] & alive[:, None]
                s_t, s_dt, s_ray, counts, offsets, fits, tot = \
                    compact_samples(t[:, sl], dt[:, sl], emit_s, n_rays,
                                    S, max_per_ray=per_ray)
                total = total + tot
                rid = jnp.clip(s_ray, 0, n_rays - 1)
                pos = o[rid] + s_t[:, None] * d[rid]
                pos_w = (pos - self.aabb_min) / self.aabb_size
                dir_w = d[rid] * 0.5 + 0.5
                if mode == RenderMode.NORMALS:
                    # input-gradient normals (density gradient w.r.t. pos)
                    def dens_of(pw):
                        return jnp.sum(self.model.density(params, pw))
                    g = jax.grad(dens_of)(pos_w)
                    nrm = -g / (jnp.linalg.norm(g, axis=-1,
                                                keepdims=True) + 1e-9)
                    _, dens_raw = self.model.apply(params, pos_w, dir_w)
                    rgb = nrm * 0.5 + 0.5
                else:
                    rgb_raw, dens_raw = self.model.apply(params, pos_w, dir_w)
                    rgb = jax.nn.sigmoid(rgb_raw.astype(jnp.float32))
                if mode == RenderMode.POSITIONS:
                    rgb = pos_w
                sigma = jnp.exp(jnp.clip(dens_raw.astype(jnp.float32),
                                         -15., 15.))
                rgb_seg, opac_seg, w = composite_samples(
                    sigma, rgb, s_dt, s_ray, offsets, counts, n_rays)
                T_in = jnp.exp(-logT)
                rgb_acc = rgb_acc + T_in[:, None] * rgb_seg
                depth_acc = depth_acc + T_in * jnp.zeros(
                    (n_rays,)).at[s_ray].add(w * s_t, mode="drop")
                cost_acc = cost_acc + counts.astype(jnp.float32)
                logT = logT - jnp.log(jnp.maximum(1.0 - opac_seg, 1e-10))

            opacity = 1.0 - jnp.exp(-logT)
            rgb_out = rgb_acc + (1.0 - opacity)[:, None] * bg[None, :3]
            if mode == RenderMode.DEPTH:
                rgb_out = jnp.repeat(
                    (depth_acc / jnp.maximum(opacity, 1e-6))[:, None], 3, 1)
            elif mode == RenderMode.AO:
                rgb_out = jnp.repeat(opacity[:, None], 3, axis=1)
            elif mode == RenderMode.COST:
                rgb_out = jnp.repeat(cost_acc[:, None] / 128.0, 3, axis=1)
            return rgb_out, opacity, depth_acc, total

        return run

    def render(self, params, bitfield, camera_matrix: np.ndarray,
               width: Optional[int] = None, height: Optional[int] = None,
               focal: Optional[tuple] = None, spp: Optional[int] = None,
               seed: int = 0) -> np.ndarray:
        """Render one frame → (H, W, 4) float32.

        camera_matrix: (3,4) NGP-convention camera→world.
        Output RGB is in the network's sRGB space converted to linear if
        opts.linear_out (matching render_to_cpu + run.py eval protocol).
        """
        opts = self.opts
        W = width or opts.width
        H = height or opts.height
        # don't pad tiny frames up to a huge chunk (CPU/eval cost)
        eff_chunk = min(opts.chunk, max(((W * H + 255) // 256) * 256, 256))
        fx = (focal or (opts.fov_axis_focal,
                        opts.focal_y or opts.fov_axis_focal))[0]
        fy = (focal or (opts.fov_axis_focal,
                        opts.focal_y or opts.fov_axis_focal))[1]
        n_spp = spp or opts.spp
        cx, cy = opts.principal

        xf = jnp.asarray(camera_matrix, jnp.float32)
        acc = np.zeros((H * W, 4), np.float32)
        rng = np.random.default_rng(seed)
        for s in range(n_spp):
            # pixel sample offsets (center for spp=1, jittered after)
            off = 0.5 if n_spp == 1 or s == 0 else rng.random(2)
            ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
            u = (xs.reshape(-1) + off if np.isscalar(off) else
                 xs.reshape(-1) + off[0]) / W
            v = (ys.reshape(-1) + (off if np.isscalar(off) else off[1])) / H
            dx = (u - cx) * W / fx
            dy = (v - cy) * H / fy
            if any(abs(p) > 0 for p in opts.lens_params):
                # iterative OpenCV undistortion, matching training rays
                # (ref: render path honors lens when
                # render_with_lens_distortion is set)
                from ngp_tpu.rays.camera import iterative_opencv_undistort
                import jax.numpy as _jnp
                k1, k2, p1, p2 = opts.lens_params
                ddx, ddy = iterative_opencv_undistort(
                    _jnp.asarray(dx), _jnp.asarray(dy), k1, k2, p1, p2)
                dx, dy = np.asarray(ddx), np.asarray(ddy)
            dirs = np.stack([dx, dy, np.ones_like(u)], -1).astype(np.float32)
            frame = np.zeros((H * W, 4), np.float32)
            bg = jnp.asarray(opts.background, jnp.float32)
            for i in range(0, H * W, eff_chunk):
                sl = slice(i, min(i + eff_chunk, H * W))
                n = sl.stop - sl.start
                pad = eff_chunk - n
                dchunk = np.pad(dirs[sl], ((0, pad), (0, 0)))
                d_world = dchunk @ np.asarray(camera_matrix[:, :3]).T
                d_world /= np.linalg.norm(d_world, axis=-1, keepdims=True) + 1e-9
                o = np.broadcast_to(np.asarray(camera_matrix[:, 3]),
                                    (eff_chunk, 3))
                rgb, opacity, depth, _ = self._render_chunk(
                    params, bitfield, jnp.asarray(o), jnp.asarray(d_world),
                    bg, eff_chunk)
                out = np.concatenate([np.asarray(rgb),
                                      np.asarray(opacity)[:, None]], -1)
                frame[sl] = out[:n]
            acc = (acc * s + frame) / (s + 1)
        img = acc.reshape(H, W, 4)
        if opts.linear_out:
            rgb_lin = np.asarray(srgb_to_linear(jnp.asarray(img[..., :3])))
            img = np.concatenate([rgb_lin, img[..., 3:]], -1)
        return img
