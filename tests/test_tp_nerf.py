"""Tensor-parallel NeRF table sharding on the 8-device virtual mesh
(SURVEY §2.10 TP row; round-5 verdict #9)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthetic import make_orbit_dataset


def _make_trainer():
    from ngp_tpu.config import load_network_config
    from ngp_tpu.train.nerf import NerfTrainer, NerfTrainerConfig
    ds = make_orbit_dataset(res=16)
    cfg = load_network_config("configs/nerf/base.json")
    cfg["encoding"]["n_levels"] = 4
    cfg["encoding"]["log2_hashmap_size"] = 12
    return NerfTrainer(ds, cfg, tcfg=NerfTrainerConfig(
        n_rays=128, target_batch_size=1024, march_steps=64))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tp_step_matches_single_device():
    """TP(model=4) with one data shard must reproduce the single-device
    step: the row-sharded encode psum is the same sum over disjoint
    corner contributions (fp association aside)."""
    from ngp_tpu.dist.mesh import make_mesh
    from ngp_tpu.dist.nerf_dp import null_error_state
    from ngp_tpu.dist.tp_nerf import make_tp_nerf_train_step

    tr_ref = _make_trainer()
    tr_tp = _make_trainer()
    bitfield = jnp.full_like(tr_ref.grid.bitfield, 255)
    coarse = jnp.ones_like(tr_ref.grid.coarse)
    key = jax.random.PRNGKey(7)
    err = null_error_state()
    sharp0 = jnp.zeros((1,), jnp.float32)

    k0 = jax.random.fold_in(key, 0)
    p_ref, s_ref, *_, stats_ref, _ = tr_ref._train_step_impl(
        tr_ref.params, tr_ref.opt_state, tr_ref.cam_params, tr_ref.cam_m,
        tr_ref.cam_v, tr_ref.error_map, sharp0, err, bitfield, coarse,
        tr_ref.grid.mean, k0, tr_ref.data, n_rays=128, capacity=1024)

    mesh = make_mesh(n_data=1, n_model=4, devices=jax.devices()[:4])
    step = make_tp_nerf_train_step(tr_tp, mesh, n_rays_per_device=128,
                                   samples_per_device=1024)
    with mesh:
        p_tp, s_tp, loss_tp = step(
            tr_ref.params, tr_ref.opt_state, tr_ref.cam_params,
            tr_ref.cam_m, tr_ref.cam_v, tr_ref.error_map, sharp0, err,
            bitfield, coarse, tr_ref.grid.mean, key, tr_ref.data)

    np.testing.assert_allclose(float(loss_tp), float(stats_ref.loss),
                               rtol=1e-4)
    # Table entries whose gradient contributions nearly cancel (~1e-17)
    # can flip sign under the shard-local summation order, and Adam's
    # scale-invariant first step turns that into a full ±lr move in
    # opposite directions. Allow that fp-association artifact on a
    # <0.1% sliver; everything else must match tightly.
    a = np.asarray(p_tp["pos_encoding"])
    b = np.asarray(p_ref["pos_encoding"])
    diff = np.abs(a - b)
    lr = 1e-2
    assert float((diff > 5e-5).mean()) < 1e-3
    assert float(diff.max()) <= 2.5 * lr
    for a, b in zip(jax.tree.leaves(p_tp["density_net"]),
                    jax.tree.leaves(p_ref["density_net"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_x_tp_step_runs_and_shards_table():
    """Full DPxTP (data=2 x model=4): the step runs, losses are finite,
    the table moves, and its rows are physically sharded 1/M per
    device."""
    from ngp_tpu.dist.mesh import make_mesh
    from ngp_tpu.dist.nerf_dp import null_error_state
    from ngp_tpu.dist.tp_nerf import make_tp_nerf_train_step

    tr = _make_trainer()
    mesh = make_mesh(n_data=2, n_model=4)
    step = make_tp_nerf_train_step(tr, mesh, n_rays_per_device=64,
                                   samples_per_device=512)
    err = null_error_state()
    sharp0 = jnp.zeros((1,), jnp.float32)
    bitfield = jnp.full_like(tr.grid.bitfield, 255)   # live grid
    coarse = jnp.ones_like(tr.grid.coarse)
    with mesh:
        p, s, loss = step(
            tr.params, tr.opt_state, tr.cam_params, tr.cam_m, tr.cam_v,
            tr.error_map, sharp0, err, bitfield, coarse,
            tr.grid.mean, tr.key, tr.data)
        p2, s2, loss2 = step(
            p, s, tr.cam_params, tr.cam_m, tr.cam_v, tr.error_map,
            sharp0, err, bitfield, coarse, tr.grid.mean,
            jax.random.PRNGKey(2), tr.data)
    assert np.isfinite(float(loss)) and np.isfinite(float(loss2))
    assert not np.allclose(np.asarray(tr.params["pos_encoding"]),
                           np.asarray(p2["pos_encoding"]))
    # physical sharding: each device holds rows/4 of axis 1
    tbl = p2["pos_encoding"]
    shard_rows = {sh.data.shape[1] for sh in tbl.addressable_shards}
    assert shard_rows == {tbl.shape[1] // 4}
