"""Fast smoke tier (`pytest -m smoke`, target < 2 min total): a miniature
snapshot -> multi-NeRF round-trip plus the short-run-bitfield regression.

Round-3 postmortem: the flagship Blender e2e takes minutes, so the gate
was skipped at round end and regression dba943c shipped red. This tier is
cheap enough to run before every commit and still covers the
snapshot -> NeuralRadianceField path end to end
(ref: src/nerf_renderer.cu:565-608, nerf/neural_radiance_field.cuh:153).
"""
import numpy as np
import pytest

from synthetic import make_orbit_dataset
from test_nerf_e2e import render_gt_sphere


@pytest.mark.smoke
def test_short_run_snapshot_has_live_bitfield(tmp_path):
    """Snapshot after <256 steps (pure warmup) must carry a non-empty
    density grid whose bitfield covers the trained object when reloaded
    through the multi-NeRF engine (round-3 verdict item #1)."""
    from ngp_tpu.config import load_network_config
    from ngp_tpu.render.multi_nerf import (MultiNerfRenderer,
                                           NerfDescriptor,
                                           NeuralRadianceField,
                                           RenderCameraProperties,
                                           RenderOutputProperties,
                                           RenderRequest)
    from ngp_tpu.train.nerf import NerfTrainer, NerfTrainerConfig

    res, focal = 16, 16.0
    center = np.array([0.5, 0.5, 0.5])
    color = np.array([0.9, 0.4, 0.2], np.float32)
    ds = make_orbit_dataset(n_images=4, res=res, radius=1.4, focal=focal)
    ds.images = np.stack([
        render_gt_sphere(res, ds.xforms[i], focal, center, 0.25, color,
                         np.zeros(3)) for i in range(4)])
    cfg = load_network_config("configs/nerf/base.json")
    cfg["encoding"]["n_levels"] = 4
    cfg["encoding"]["log2_hashmap_size"] = 12
    tr = NerfTrainer(ds, cfg, tcfg=NerfTrainerConfig(
        n_rays=256, target_batch_size=1 << 13, march_steps=1024))
    tr.train(64)
    assert tr.training_step < 256  # this test covers the WARMUP window

    snap = tmp_path / "mini.msgpack"
    tr.save_snapshot(snap, cfg)

    field = NeuralRadianceField(str(snap))
    bf = np.asarray(field.bitfield)
    assert (bf != 0).any(), "short-run snapshot reloaded with empty bitfield"

    cam = RenderCameraProperties(
        transform=np.vstack([ds.xforms[0], [0, 0, 0, 1]]),
        focal_length=focal)
    out = RenderOutputProperties(width=16, height=16, spp=1,
                                 background_color=(0, 0, 0, 0),
                                 flip_y=False)
    req = RenderRequest(output=out, camera=cam,
                        nerfs=[NerfDescriptor(snapshot_path=str(snap))])
    img = MultiNerfRenderer(march_steps=1024, chunk=256).render(req)
    assert img.shape == (16, 16, 4)
    assert np.isfinite(img).all()
    # after 40 steps the sphere must already read denser than the corner
    assert img[8, 8, 3] > img[1, 1, 3], (img[8, 8], img[1, 1])


@pytest.mark.smoke
def test_smoke_image_and_volume_trainers():
    """One real train segment through the image and volume engines
    (round-4 verdict weak #6: the gate must touch every primitive's
    train step, not just NeRF)."""
    from ngp_tpu.config import load_network_config
    from ngp_tpu.train.image import ImageTrainer
    from ngp_tpu.train.volume import default_plume_trainer

    rng = np.random.default_rng(7)
    img = rng.random((32, 32, 4), np.float32)
    icfg = load_network_config("configs/image/base.json")
    icfg["encoding"]["n_levels"] = 4
    icfg["encoding"]["log2_hashmap_size"] = 12
    it = ImageTrainer(img, icfg, batch_size=1 << 10)
    l0 = it.train(8)
    assert np.isfinite(l0)
    assert np.isfinite(it.psnr())

    vcfg = load_network_config("configs/volume/base.json")
    vcfg["encoding"]["n_levels"] = 4
    vcfg["encoding"]["log2_hashmap_size"] = 12
    vt = default_plume_trainer(vcfg, batch_size=1 << 10)
    lv = vt.train(4)
    assert np.isfinite(lv)


@pytest.mark.smoke
def test_smoke_nerf_renderer_chunk(tmp_path):
    """NerfRenderer chunked path on a freshly-trained tiny scene (the
    gate previously never touched the single-scene renderer; a
    compaction/bitfield regression there shipped red in round 3)."""
    from ngp_tpu.config import load_network_config
    from ngp_tpu.opt.optimizers import inference_params
    from ngp_tpu.render.nerf_render import NerfRenderer, RenderOptions
    from ngp_tpu.train.nerf import NerfTrainer, NerfTrainerConfig

    res, focal = 16, 16.0
    center = np.array([0.5, 0.5, 0.5])
    color = np.array([0.2, 0.6, 0.9], np.float32)
    ds = make_orbit_dataset(n_images=4, res=res, radius=1.4, focal=focal)
    ds.images = np.stack([
        render_gt_sphere(res, ds.xforms[i], focal, center, 0.25, color,
                         np.zeros(3)) for i in range(4)])
    cfg = load_network_config("configs/nerf/base.json")
    cfg["encoding"]["n_levels"] = 4
    cfg["encoding"]["log2_hashmap_size"] = 12
    tr = NerfTrainer(ds, cfg, tcfg=NerfTrainerConfig(
        n_rays=256, target_batch_size=1 << 13, march_steps=1024))
    tr.train(32)
    r = NerfRenderer.for_trainer(tr, RenderOptions(
        width=res, height=res, fov_axis_focal=focal,
        background=(0, 0, 0, 0), linear_out=True, chunk=128,
        march_steps=512))
    p = inference_params(tr.params, tr.opt_state, tr.opt_cfg)
    img = r.render(p, tr.grid.bitfield, ds.xforms[0], res, res,
                   focal=(focal, focal), spp=1)
    assert img.shape == (res, res, 4)
    assert np.isfinite(img).all()
    assert img[8, 8, 3] > img[1, 1, 3]


@pytest.mark.smoke
def test_smoke_bitfield_pack_exactness():
    """rebuild_bitfield's bit packing must agree with occupied_at's bit
    math CELL-FOR-CELL (sharp mutation guard: the weak center>corner
    render assertions survive a bit-axis swap because a byte's 2x2x2
    block is spatially coarse; this test does not)."""
    import jax.numpy as jnp
    from ngp_tpu.grid import occupancy as occ

    g = occ.init_grid(max_cascade=0)
    # a scattered set of single occupied cells (odd/even parities in each
    # axis so every bit position of the packed byte is exercised)
    cells = [(3, 5, 8), (4, 4, 4), (7, 2, 1), (120, 121, 10), (65, 64, 63)]
    dens = np.zeros(occ.GRID_VOLUME, np.float32)
    for (x, y, z) in cells:
        dens[(z * occ.G + y) * occ.G + x] = 1.0
    g = g._replace(density=jnp.asarray(dens))
    g = occ.rebuild_bitfield(g, max_cascade=0)

    centers = np.array([[(x + 0.5) / occ.G, (y + 0.5) / occ.G,
                         (z + 0.5) / occ.G] for (x, y, z) in cells],
                       np.float32)
    mip = jnp.zeros(len(cells), jnp.int32)
    hit = np.asarray(occ.occupied_at(g.bitfield, jnp.asarray(centers), mip))
    assert hit.all(), hit
    # every neighbor cell (+1 in each axis) must be EMPTY
    for ax in range(3):
        nb = centers.copy()
        nb[:, ax] += 1.0 / occ.G
        miss = np.asarray(occ.occupied_at(g.bitfield, jnp.asarray(nb), mip))
        assert not miss.any(), (ax, miss)
    # total popcount equals the number of seeded cells (level 0)
    bf0 = np.asarray(g.bitfield[: occ.GRID_VOLUME // 8])
    assert int(np.unpackbits(bf0).sum()) == len(cells)
