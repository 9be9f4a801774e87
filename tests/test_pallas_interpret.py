"""The Pallas blocked-grid kernel path, end to end in interpret mode:
kernel fwd/bwd already unit-validated; here a full Adam training loop runs
through it (what the TPU executes)."""
import numpy as np
import pytest


@pytest.mark.slow
def test_training_through_pallas_kernel_interpret(monkeypatch):
    import jax
    from jax.experimental.pallas import tpu as pltpu
    import ngp_tpu.nn.encodings as E

    def patched(self, params, x, max_level=None, **_):
        from ngp_tpu.kernels.hashgrid_pallas import blocked_grid_encode
        return blocked_grid_encode(params, x, self.meta, 128)

    monkeypatch.setattr(E.BlockedGridEncoding, "apply", patched)

    from ngp_tpu.config import load_network_config
    from ngp_tpu.train.image import ImageTrainer
    img = np.random.default_rng(0).random((64, 64, 4)).astype(np.float32)
    cfg = load_network_config("configs/image/base.json")
    with pltpu.force_tpu_interpret_mode():
        tr = ImageTrainer(img, cfg, batch_size=1 << 10)
        l0 = tr.train(2)
        l1 = tr.train(15)
    assert l1 < l0, (l0, l1)


def test_blocked_grid_int8_close_to_reference():
    """int8 selection path ≈ f32 reference within the quantization step
    (per-level max/127)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from ngp_tpu.kernels.blocked_grid import BlockedGridMeta, encode_reference
    from ngp_tpu.kernels.hashgrid_pallas import blocked_grid_encode_int8

    meta = BlockedGridMeta(n_dims=3, n_levels=4, base_resolution=16,
                           per_level_scale=1.5, log2_rows=7)
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (meta.n_levels, meta.rows, 128)) * 0.3
    pos = jax.random.uniform(jax.random.PRNGKey(1), (512, 3))
    ref = np.asarray(encode_reference(table, pos, meta))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(blocked_grid_encode_int8(table, pos, meta, 256))
    # max quant step per level ≈ max|T| / 127; features are convex combos
    step = float(jnp.max(jnp.abs(table))) / 127.0
    assert np.abs(got - ref).max() < 4 * step, np.abs(got - ref).max()

    # backward: table grads flow and land on touched rows (the custom_vjp
    # backward binds during grad evaluation, so the interpret context must
    # wrap the grad call itself)
    def loss(t):
        return jnp.sum(blocked_grid_encode_int8(t, pos, meta, 256) ** 2)
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss)(table)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_blocked_grid_multigroup_matches_reference():
    """Per-level row grouping (level_needed_rows): a fox-shaped meta whose
    coarse dense levels scan far fewer rows than the stored table width
    must stay EXACT vs the reference — fwd, table grad, and position grad
    (the grouped kernels slice/reassemble across 3+ row-width groups)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from ngp_tpu.kernels.blocked_grid import BlockedGridMeta, encode_reference
    from ngp_tpu.kernels.hashgrid_pallas import (_level_groups,
                                                 blocked_grid_encode)

    meta = BlockedGridMeta(n_dims=3, n_levels=6, base_resolution=16,
                           per_level_scale=1.6, log2_rows=11)
    groups, _ = _level_groups(meta)
    assert len(groups) >= 3, groups   # the point: mixed row widths

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (meta.n_levels, meta.rows, 128)) * 0.3
    pos = jax.random.uniform(jax.random.PRNGKey(1), (512, 3))
    ref = np.asarray(encode_reference(table, pos, meta))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(blocked_grid_encode(table, pos, meta, 256))
    # the kernel's selection matmul casts the table to bf16 —
    # expect bf16 rounding of table values, not f32 exactness
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=4e-3)

    g_out = jax.random.normal(jax.random.PRNGKey(2), ref.shape) * 0.1

    def loss_ref(t, p):
        return jnp.sum(encode_reference(t, p, meta) * g_out)

    def loss_pal(t, p):
        return jnp.sum(blocked_grid_encode(t, p, meta, 256) * g_out)

    gt_ref, gp_ref = jax.grad(loss_ref, argnums=(0, 1))(table, pos)
    with pltpu.force_tpu_interpret_mode():
        gt_pal, gp_pal = jax.grad(loss_pal, argnums=(0, 1))(table, pos)
    np.testing.assert_allclose(np.asarray(gt_pal), np.asarray(gt_ref),
                               rtol=5e-2, atol=4e-3)
    np.testing.assert_allclose(np.asarray(gp_pal), np.asarray(gp_ref),
                               rtol=5e-2, atol=5e-2)
