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
