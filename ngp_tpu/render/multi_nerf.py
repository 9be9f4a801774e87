"""Multi-NeRF scene renderer + Blender RenderRequest data model.

TPU-native re-design of the fork's headless render engine
(ref: src/nerf_renderer.cu + include/neural-graphics-primitives/nerf/*):
``NerfDescriptor`` → cached ``NeuralRadianceField`` (per-snapshot network +
occupancy bitfield) → per-request proxies with world transforms, 3D SDF
masks and opacity, composited along camera rays.

Compositing model: instead of the reference's alternating
nearest-sample-proxy march (cull_…_set_proxy_rays_active,
src/nerf_renderer.cu:376-428), all proxies are sampled on a **shared
world-space cone lattice**; overlapping volumes combine by summing σ at
equal depth — the volumetric union the reference's depth-ordered switching
approximates. Masks scale per-sample alpha exactly like
``RenderModifiers`` (mask list with auto-prepended complement "All",
ref: nerf/render_modifiers.cuh:47-61).
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.common import TonemapCurve, linear_to_srgb_np
from ngp_tpu.grid import occupancy as occ
from ngp_tpu.rays.marching import (calc_dt, compact_samples,
                                   merge_excess_samples, step_lattice)


# --------------------------------------------------------------------------
# data model (ref: nerf/render_request.cuh, nerf_descriptor.cuh, mask_3D.cuh)
# --------------------------------------------------------------------------

@dataclasses.dataclass
class Mask3D:
    """SDF-based render mask (ref: nerf/mask_3D.cuh:129-255)."""
    shape: str = "box"            # box | cylinder | sphere | all
    mode: str = "add"             # add | subtract
    transform: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32))
    dims: np.ndarray = dataclasses.field(
        default_factory=lambda: np.ones(3, np.float32))
    radius: float = 0.5
    height: float = 1.0
    feather: float = 0.0
    opacity: float = 1.0

    @classmethod
    def All(cls, mode: str = "add") -> "Mask3D":
        return cls(shape="all", mode=mode)

    def _sdf(self, p_local: jnp.ndarray) -> jnp.ndarray:
        if self.shape == "all":
            return jnp.full(p_local.shape[:-1], -1e10)
        if self.shape == "sphere":
            return jnp.linalg.norm(p_local, axis=-1) - self.radius
        if self.shape == "cylinder":
            dxy = jnp.linalg.norm(p_local[..., :2], axis=-1) - self.radius
            dz = jnp.abs(p_local[..., 2]) - self.height * 0.5
            return jnp.maximum(dxy, dz)
        # box
        q = jnp.abs(p_local) - jnp.asarray(self.dims, jnp.float32) * 0.5
        return (jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
                + jnp.minimum(jnp.max(q, axis=-1), 0.0))

    def sample(self, p_world: jnp.ndarray) -> jnp.ndarray:
        """Signed alpha contribution at world points: positive alpha for
        add masks inside, negative for subtract (ref: Mask3D::sample)."""
        m = jnp.asarray(np.linalg.inv(self.transform), jnp.float32)
        p = p_world @ m[:3, :3].T + m[:3, 3]
        sd = self._sdf(p)
        feather = max(self.feather, 1e-6)
        a = jnp.clip(-sd / feather, 0.0, 1.0) * self.opacity
        return a if self.mode == "add" else -a


def apply_masks(masks: List[Mask3D], p_world: jnp.ndarray) -> jnp.ndarray:
    """Merged mask alpha ∈ [0,1]; auto-prepends the complement "All" mask
    when the list starts with an add-mask (ref: render_modifiers.cuh:47-61:
    a leading add means 'start from nothing')."""
    if not masks:
        return jnp.ones(p_world.shape[:-1])
    mask_list = list(masks)
    if mask_list[0].mode == "add":
        alpha = jnp.zeros(p_world.shape[:-1])
    else:
        alpha = jnp.ones(p_world.shape[:-1])
    for m in mask_list:
        a = m.sample(p_world)
        alpha = jnp.clip(alpha + a, 0.0, 1.0)
    return alpha


@dataclasses.dataclass
class NerfDescriptor:
    """ref: nerf/nerf_descriptor.cuh:15-35."""
    snapshot_path: str = ""
    aabb_min: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))
    aabb_max: np.ndarray = dataclasses.field(
        default_factory=lambda: np.ones(3, np.float32))
    transform: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32))
    masks: List[Mask3D] = dataclasses.field(default_factory=list)
    opacity: float = 1.0


@dataclasses.dataclass
class DownsampleInfo:
    """Progressive preview mip (ref: DownsampleInfo::MakeFromMip,
    common.h:337-355)."""
    scale: int = 1

    @classmethod
    def MakeFromMip(cls, mip: int) -> "DownsampleInfo":
        return cls(scale=1 << mip)


@dataclasses.dataclass
class RenderOutputProperties:
    width: int = 640
    height: int = 480
    downsample: DownsampleInfo = dataclasses.field(
        default_factory=DownsampleInfo)
    spp: int = 1
    color_space: str = "linear"          # linear | srgb
    tonemap_curve: TonemapCurve = TonemapCurve.IDENTITY
    exposure: float = 0.0
    background_color: tuple = (0.0, 0.0, 0.0, 0.0)
    flip_y: bool = True                  # Blender convention


@dataclasses.dataclass
class RenderCameraProperties:
    transform: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32))
    model: str = "perspective"   # perspective|spherical_quadrilateral|quadrilateral_hexahedron
    focal_length: float = 800.0
    near_distance: float = 0.05
    aperture_size: float = 0.0
    focus_z: float = 1.0
    # spherical quadrilateral params
    sq_width: float = 1.0
    sq_height: float = 1.0
    sq_curvature: float = 0.0
    # quadrilateral hexahedron: 8 corners (front 4 + back 4)
    qh_corners: Optional[np.ndarray] = None


@dataclasses.dataclass
class RenderRequest:
    output: RenderOutputProperties
    camera: RenderCameraProperties
    nerfs: List[NerfDescriptor]
    modifiers: List[Mask3D] = dataclasses.field(default_factory=list)


# --------------------------------------------------------------------------
# per-snapshot radiance field (ref: nerf/neural_radiance_field.cuh)
# --------------------------------------------------------------------------

class NeuralRadianceField:
    """Inference-side NeRF loaded from a snapshot msgpack."""

    _uid_counter = itertools.count()

    def __init__(self, snapshot_path: str):
        # stable identity for jit-cache keys: id() is recycled by the GC,
        # so a new field could silently hit a dead field's compiled
        # closure (round-3 advisor finding)
        self.uid = next(NeuralRadianceField._uid_counter)
        import os
        from ngp_tpu.io.snapshot import import_reference_snapshot, \
            load_snapshot
        from ngp_tpu.nn.models import NerfNetwork
        doc = load_snapshot(snapshot_path)
        snap = doc["snapshot"]
        config = {k: v for k, v in doc.items() if k != "snapshot"}
        from ngp_tpu.config import autofill_hashgrid_config
        aabb_scale = int(snap["nerf"]["aabb_scale"])
        config = dict(config)
        config["encoding"] = autofill_hashgrid_config(
            config["encoding"], 3, 2048.0, aabb_scale=aabb_scale)
        if "ngp_tpu_ema_params" in snap:
            self.model = NerfNetwork(config)
            self.params = jax.tree.map(jnp.asarray,
                                       snap["ngp_tpu_ema_params"])
        else:
            # CUDA-reference snapshot → tcnn-layout model + imported params
            prev = os.environ.get("NGP_TPU_GRID_IMPL")
            os.environ["NGP_TPU_GRID_IMPL"] = "tcnn"
            try:
                _, params, _ = import_reference_snapshot(snapshot_path)
                self.model = NerfNetwork(config)
            finally:
                if prev is None:
                    os.environ.pop("NGP_TPU_GRID_IMPL", None)
                else:
                    os.environ["NGP_TPU_GRID_IMPL"] = prev
            self.params = jax.tree.map(jnp.asarray, params)
        self.aabb_scale = aabb_scale
        self.max_cascade = int(snap.get("max_cascade", 0))
        self.aabb_min = np.float32(0.5 - aabb_scale / 2.0)
        self.aabb_size = np.float32(aabb_scale)
        self.cone_angle = 1.0 / 256.0 if aabb_scale > 1 else 0.0
        density = jnp.asarray(snap["density_grid"])
        grid = occ.init_grid(self.max_cascade)._replace(
            density=density[: occ.GRID_VOLUME * (self.max_cascade + 1)])
        self.bitfield = occ.rebuild_bitfield(grid, self.max_cascade).bitfield


# --------------------------------------------------------------------------
# camera models (ref: camera_models.cuh:27-240)
# --------------------------------------------------------------------------

def generate_global_rays(cam: RenderCameraProperties, W: int, H: int,
                         rng: Optional[np.random.Generator] = None):
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    jitter = 0.5 if rng is None else rng.random(2)
    u = (xs.reshape(-1) + jitter if np.isscalar(jitter) else
         xs.reshape(-1) + jitter[0]) / W
    v = (ys.reshape(-1) + (jitter if np.isscalar(jitter) else jitter[1])) / H
    xf = np.asarray(cam.transform, np.float32)[:3, :4]
    if cam.model == "perspective":
        d = np.stack([(u - 0.5) * W / cam.focal_length,
                      (v - 0.5) * H / cam.focal_length,
                      np.ones_like(u)], -1).astype(np.float32)
        if cam.aperture_size > 0 and rng is not None:
            # per-ray thin-lens DoF (ref: pixel_to_ray DoF via Shirley
            # square→disk, common_device.cuh:260-317)
            ang = rng.random(len(d)).astype(np.float32) * 2 * np.pi
            rad = np.sqrt(rng.random(len(d)).astype(np.float32))
            lens = np.stack([rad * np.cos(ang), rad * np.sin(ang),
                             np.zeros_like(ang)], -1) * cam.aperture_size
            d = (d * cam.focus_z - lens) / cam.focus_z
            o_local = lens                                   # (N, 3)
        else:
            o_local = np.zeros((len(d), 3), np.float32)
        o = o_local @ xf[:, :3].T + xf[:, 3]
        dw = d @ xf[:, :3].T
    elif cam.model == "spherical_quadrilateral":
        # curved-display ray generation: rays leave a spherical patch
        sx = (u - 0.5) * cam.sq_width
        sy = (v - 0.5) * cam.sq_height
        c = cam.sq_curvature
        z = c * (sx ** 2 + sy ** 2)
        p_local = np.stack([sx, sy, z], -1).astype(np.float32)
        n_local = np.stack([-2 * c * sx, -2 * c * sy,
                            np.ones_like(sx)], -1).astype(np.float32)
        n_local /= np.linalg.norm(n_local, axis=-1, keepdims=True)
        o = p_local @ xf[:, :3].T + xf[:, 3]
        dw = n_local @ xf[:, :3].T
    elif cam.model == "quadrilateral_hexahedron":
        qc = np.asarray(cam.qh_corners, np.float32).reshape(2, 2, 2, 3)
        uu, vv = u.astype(np.float32), v.astype(np.float32)

        def bilerp(q):  # q: (2,2,3)
            top = q[0, 0] * (1 - uu)[:, None] + q[0, 1] * uu[:, None]
            bot = q[1, 0] * (1 - uu)[:, None] + q[1, 1] * uu[:, None]
            return top * (1 - vv)[:, None] + bot * vv[:, None]

        front = bilerp(qc[0])
        back = bilerp(qc[1])
        o = front @ xf[:, :3].T + xf[:, 3]
        dw = (back - front) @ xf[:, :3].T
    else:
        raise ValueError(f"unknown camera model {cam.model}")
    dw = dw / (np.linalg.norm(dw, axis=-1, keepdims=True) + 1e-12)
    return o.astype(np.float32), dw.astype(np.float32)


# --------------------------------------------------------------------------
# renderer
# --------------------------------------------------------------------------

class MultiNerfRenderer:
    """RenderData-equivalent cache + the composite render loop
    (ref: RenderData cache, nerf/render_data.cuh:23-98; pipeline
    src/nerf_renderer.cu:565-791)."""

    def __init__(self, march_steps: int = 512, chunk: int = 1 << 13,
                 samples_per_ray: int = 32, march_segments: int = 8,
                 composite_mode: str = "nearest"):
        self.fields: dict[str, NeuralRadianceField] = {}
        self.march_steps = march_steps
        self.chunk = chunk
        self.samples_per_ray = samples_per_ray   # per-proxy cap PER SEGMENT
        self.march_segments = march_segments
        # Overlapping-proxy semantics. "nearest" (DEFAULT, matching the
        # reference's per-step proxy culling: only the proxy whose next
        # sample is nearest the camera composites each step,
        # ref: cull_global_rays_..._kernel src/nerf_renderer.cu:376-428).
        # "sum" (opt-in): densities of all active proxies superpose at
        # each lattice point — physically a mixture of participating
        # media.
        # on the shared world lattice every active proxy's "next sample"
        # is the same point, so the cull degenerates to its tie-break —
        # first alive proxy wins — i.e. exclusive descriptor-order
        # priority inside overlaps. See tests/test_multi_nerf_e2e.py
        # (composite-mode A/B) for the observable difference with
        # opacity < 1.
        if composite_mode not in ("sum", "nearest"):
            raise ValueError("composite_mode must be 'sum' or 'nearest'")
        self.composite_mode = composite_mode

    def _field(self, path: str) -> NeuralRadianceField:
        if path not in self.fields:
            self.fields[path] = NeuralRadianceField(path)
        return self.fields[path]

    def render(self, request: RenderRequest) -> np.ndarray:
        out = request.output
        ds = out.downsample.scale
        W, H = max(out.width // ds, 1), max(out.height // ds, 1)
        cam = request.camera

        proxies = []
        for desc in request.nerfs:
            field = self._field(desc.snapshot_path)
            xf = np.asarray(desc.transform, np.float32)
            masks = list(request.modifiers) + list(desc.masks)
            proxies.append((field, xf, np.linalg.inv(xf), masks,
                            float(desc.opacity)))

        bg = np.asarray(out.background_color, np.float32)
        # spp accumulation (ref: render loop per sample in bl render path;
        # sample 0 at pixel centers, later samples jittered; DoF needs an
        # rng each sample)
        n_spp = max(int(out.spp), 1)
        frame = np.zeros((H * W, 4), np.float32)
        for s in range(n_spp):
            rng = np.random.default_rng(s) \
                if (s > 0 or cam.aperture_size > 0) else None
            o_all, d_all = generate_global_rays(cam, W, H, rng)
            n = len(o_all)
            for i in range(0, n, self.chunk):
                sl = slice(i, min(i + self.chunk, n))
                cnk = sl.stop - sl.start
                pad = self.chunk - cnk
                o = np.pad(o_all[sl], ((0, pad), (0, 0)))
                d = np.pad(d_all[sl], ((0, pad), (0, 0)),
                           constant_values=1.0)
                rgb, opac = self._render_chunk(proxies, jnp.asarray(o),
                                               jnp.asarray(d),
                                               cam.near_distance)
                frame[sl, :3] += np.asarray(rgb)[:cnk]
                frame[sl, 3] += np.asarray(opac)[:cnk]
        frame /= n_spp

        # background + color management (ref: bl_render_frame +
        # accumulate/tonemap, src/testbed.cu:2687-2691)
        rgb = frame[:, :3] + (1 - frame[:, 3:4]) * bg[None, :3]
        alpha = frame[:, 3:4] + (1 - frame[:, 3:4]) * bg[3]
        img = np.concatenate([rgb, alpha], -1).reshape(H, W, 4)
        img[..., :3] *= 2.0 ** out.exposure
        if out.tonemap_curve != TonemapCurve.IDENTITY:
            from ngp_tpu.render.buffer import tonemap
            img[..., :3] = np.asarray(
                tonemap(jnp.maximum(jnp.asarray(img[..., :3]), 0.0),
                        out.tonemap_curve))
        if out.color_space == "srgb":
            img[..., :3] = linear_to_srgb_np(np.clip(img[..., :3], 0, 1))
        if out.flip_y:
            img = img[::-1]
        return np.ascontiguousarray(img, np.float32)

    @staticmethod
    def _mask_sig(masks):
        return tuple(
            (m.shape, m.mode, round(m.feather, 6), round(m.opacity, 6),
             round(m.radius, 6), round(m.height, 6),
             tuple(np.asarray(m.dims, np.float64).round(6).tolist()),
             tuple(np.asarray(m.transform,
                              np.float64).ravel().round(6).tolist()))
            for m in masks)

    def _render_chunk(self, proxies, o, d, near):
        """Jitted dispatch wrapper (round-3: the round-2 version ran the
        whole composite as eager per-op dispatches — weak #9). The jit is
        cached per (chunk size, proxy set, mask config); proxy transforms
        and opacities stay DYNAMIC so Blender animation doesn't
        recompile."""
        cache = getattr(self, "_chunk_fns", None)
        if cache is None:
            cache = self._chunk_fns = {}
        key = (o.shape[0], round(max(near, 1e-4), 6), self.composite_mode,
               tuple((p[0].uid, self._mask_sig(p[3])) for p in proxies))
        fn = cache.get(key)
        if fn is None:
            fn = self._build_chunk_fn(
                [p[0] for p in proxies], [p[3] for p in proxies],
                int(o.shape[0]), max(near, 1e-4))
            cache[key] = fn
        params = tuple(p[0].params for p in proxies)
        bits = tuple(p[0].bitfield for p in proxies)
        R3s = jnp.stack([jnp.asarray(p[2][:3, :3]) for p in proxies])
        trs = jnp.stack([jnp.asarray(p[2][:3, 3]) for p in proxies])
        scales = jnp.asarray([float(np.linalg.norm(p[2][:3, 0]))
                              for p in proxies])
        opac = jnp.asarray([float(p[4]) for p in proxies])
        return fn(o, d, params, bits, R3s, trs, scales, opac)

    def _build_chunk_fn(self, fields, masks_list, n_rays: int,
                        near: float):
        """Shared world-lattice compositing across all proxies, one jit.

        Each proxy's network runs only on its COMPACTED active lattice
        points per SEGMENT, with a transmittance early-out between
        segments (the reference culls to the nearest proxy per step +
        min-transmittance, nerf_renderer.cu:376-428)."""
        import jax as _jax
        K = self.march_steps
        cone = max((f.cone_angle for f in fields), default=1.0 / 256.0)
        nseg = max(self.march_segments, 1)
        seg_len = K // nseg
        S = n_rays * self.samples_per_ray                   # per seg budget

        @_jax.jit
        def run(o, d, params, bits, R3s, trs, scales, opacities):
            t0 = jnp.full((n_rays,), near)
            t_all = step_lattice(t0, cone, K)              # (R, K)
            dt_all = calc_dt(t_all, cone)
            pre = []
            for i, field in enumerate(fields):
                R3, tr = R3s[i], trs[i]
                dl = d @ R3.T
                dl = dl / (jnp.linalg.norm(dl, axis=-1,
                                           keepdims=True) + 1e-12)
                pre.append((field, params[i], bits[i], R3, tr, dl,
                            scales[i], masks_list[i], opacities[i]))

            rgb_acc = jnp.zeros((n_rays, 3))
            logT = jnp.zeros((n_rays,))
            for si in range(nseg):
                sl = slice(si * seg_len, (si + 1) * seg_len)
                t, dt = t_all[:, sl], dt_all[:, sl]
                alive = jnp.exp(-logT) > 1e-4
                pw = o[:, None, :] + t[..., None] * d[:, None, :]
                flat_pw = pw.reshape(-1, 3)
                sigma_sum = jnp.zeros((n_rays, seg_len))
                rgb_sum = jnp.zeros((n_rays, seg_len, 3))
                # "nearest" mode: lattice points already claimed by an
                # earlier proxy are dead to later ones (the shared-lattice
                # limit of the reference's nearest-sample proxy cull)
                claimed = jnp.zeros((n_rays, seg_len), bool)
                for (field, prm, bitfield, R3, tr, dl, scale, masks,
                     opacity) in pre:
                    pl = flat_pw @ R3.T + tr                # local positions
                    inside = jnp.all(
                        (pl >= field.aabb_min) &
                        (pl <= field.aabb_min + field.aabb_size), axis=-1)
                    mip = occ.mip_from_dt(dt.reshape(-1) * scale, pl,
                                          field.max_cascade)
                    occd = occ.occupied_at(bitfield, pl, mip)
                    active = (inside & occd).reshape(n_rays, seg_len) & \
                        alive[:, None]
                    if self.composite_mode == "nearest":
                        active = active & ~claimed
                        claimed = claimed | active
                    # no truncation: rays over the per-segment budget are
                    # DECIMATED with dt compensation (optical depth kept;
                    # the ref marches to completion,
                    # nerf_renderer.cu:661-791)
                    active, dt_m = merge_excess_samples(
                        active, dt, self.samples_per_ray)
                    s_t, s_dt, s_ray, counts, offsets, fits, tot, s_k = \
                        compact_samples(t, dt_m, active, n_rays, S)
                    valid = s_ray < n_rays
                    rid = jnp.clip(s_ray, 0, n_rays - 1)
                    pw_s = o[rid] + s_t[:, None] * d[rid]   # world samples
                    pl_s = pw_s @ R3.T + tr
                    pl_w = (pl_s - field.aabb_min) / field.aabb_size
                    dir_w = dl[rid] * 0.5 + 0.5
                    rgb_raw, dens_raw = field.model.apply(prm, pl_w,
                                                          dir_w)
                    sig = jnp.exp(jnp.clip(dens_raw.astype(jnp.float32),
                                           -15., 15.))
                    rgb = jax.nn.sigmoid(rgb_raw.astype(jnp.float32))
                    mask_alpha = apply_masks(masks, pw_s) if masks else 1.0
                    # scatter σ·Δt (with the proxy's local-space metric
                    # and the merged Δt) so decimated samples carry their
                    # full optical depth through the composite
                    contrib = jnp.where(valid, sig * opacity * mask_alpha *
                                        scale * s_dt, 0.0)
                    sigma_sum = sigma_sum.at[rid, s_k].add(contrib,
                                                           mode="drop")
                    rgb_sum = rgb_sum.at[rid, s_k].add(
                        contrib[:, None] * rgb, mode="drop")

                # composite this segment onto the accumulated frame
                mean_rgb = rgb_sum / jnp.maximum(sigma_sum,
                                                 1e-12)[..., None]
                sdt = sigma_sum                             # already σ·Δt
                alpha = 1.0 - jnp.exp(-sdt)
                T = jnp.exp(-(jnp.cumsum(sdt, axis=1) - sdt))
                wgt = T * alpha
                T_in = jnp.exp(-logT)
                rgb_acc = rgb_acc + T_in[:, None] * jnp.sum(
                    wgt[..., None] * mean_rgb, axis=1)
                logT = logT + jnp.sum(sdt, axis=1)

            return rgb_acc, 1.0 - jnp.exp(-logT)

        return run
