"""Data-parallel NeRF step on the 8-device virtual mesh."""
import jax
import numpy as np
import pytest

from synthetic import make_orbit_dataset


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_step_runs_and_matches_shapes():
    from ngp_tpu.config import load_network_config
    from ngp_tpu.dist.mesh import make_mesh
    from ngp_tpu.dist.nerf_dp import make_dp_train_step
    from ngp_tpu.train.nerf import NerfTrainer, NerfTrainerConfig

    ds = make_orbit_dataset(res=16)
    cfg = load_network_config("configs/nerf/base.json")
    cfg["encoding"]["n_levels"] = 4
    cfg["encoding"]["log2_hashmap_size"] = 12
    tr = NerfTrainer(ds, cfg, tcfg=NerfTrainerConfig(
        n_rays=256, target_batch_size=2048, march_steps=64))
    mesh = make_mesh(n_data=8)
    step = make_dp_train_step(tr, mesh, n_rays_per_device=128,
                              samples_per_device=1024)
    with mesh:
        p, s, loss = step(tr.params, tr.opt_state, tr.grid.bitfield,
                          tr.grid.mean, tr.key, tr.data)
        p2, s2, loss2 = step(p, s, tr.grid.bitfield, tr.grid.mean,
                             jax.random.PRNGKey(2), tr.data)
    assert np.isfinite(float(loss)) and np.isfinite(float(loss2))
    # params actually changed
    before = jax.tree.leaves(tr.params)[0]
    after = jax.tree.leaves(p2)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
