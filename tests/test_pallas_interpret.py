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
