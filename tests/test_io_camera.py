"""Image I/O codecs and camera math."""
import numpy as np
import pytest


def test_exr_roundtrip_float_and_half(tmp_path):
    from ngp_tpu.data.image_io import load_exr, save_exr
    img = np.random.default_rng(0).random((37, 53, 4)).astype(np.float32)
    p32 = tmp_path / "f32.exr"
    save_exr(p32, img, dtype=np.float32)
    np.testing.assert_array_equal(load_exr(p32), img)
    p16 = tmp_path / "f16.exr"
    save_exr(p16, img, dtype=np.float16)
    np.testing.assert_allclose(load_exr(p16), img, atol=1e-3)


def test_exr_reads_reference_albert():
    from ngp_tpu.data.image_io import load_exr
    img = load_exr("/root/reference/data/image/albert.exr")
    assert img.shape == (1024, 1024, 4)
    assert 0.0 <= img.min() and img.max() <= 1.0 + 1e-5


def test_bin_roundtrip(tmp_path):
    from ngp_tpu.data.image_io import load_binary_image, save_binary_image
    img = np.random.default_rng(1).random((9, 7, 4)).astype(np.float32)
    p = tmp_path / "img.bin"
    save_binary_image(p, img)
    np.testing.assert_allclose(load_binary_image(p), img, atol=1e-3)


def test_ldr_srgb_premultiply(tmp_path):
    from ngp_tpu.data.image_io import load_stbi, save_stbi
    img = np.zeros((8, 8, 4), np.float32)
    img[..., 0] = 0.5  # linear red
    img[..., 3] = 1.0
    p = tmp_path / "t.png"
    save_stbi(p, img, from_linear=True)
    back = load_stbi(p)
    np.testing.assert_allclose(back[..., 0], 0.5, atol=2e-2)
    np.testing.assert_allclose(back[..., 3], 1.0)


def test_opencv_undistort_inverts_distortion():
    import jax.numpy as jnp
    from ngp_tpu.rays.camera import iterative_opencv_undistort
    k1, k2, p1, p2 = 0.06, -0.08, -0.001, 0.0002  # fox-like params
    rng = np.random.default_rng(2)
    x = (rng.random(100) - 0.5) * 0.8
    y = (rng.random(100) - 0.5) * 0.8
    # forward distortion (Brown-Conrady)
    r2 = x * x + y * y
    radial = 1 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    xu, yu = iterative_opencv_undistort(jnp.asarray(xd), jnp.asarray(yd),
                                        k1, k2, p1, p2)
    np.testing.assert_allclose(np.asarray(xu), x, atol=1e-4)
    np.testing.assert_allclose(np.asarray(yu), y, atol=1e-4)


def test_ray_aabb():
    import jax.numpy as jnp
    from ngp_tpu.rays.camera import ray_aabb_intersect
    o = jnp.asarray([[0.5, 0.5, -1.0], [2.0, 2.0, 2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    tmin, tmax = ray_aabb_intersect(o, d, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(tmin)[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tmax)[0], 2.0, atol=1e-6)
    assert float(tmin[1]) > float(tmax[1])  # miss


def test_nerf_matrix_roundtrip():
    from ngp_tpu.data.nerf_loader import nerf_matrix_to_ngp, ngp_matrix_to_nerf
    rng = np.random.default_rng(3)
    m = rng.random((3, 4)).astype(np.float32)
    scale, offset = 0.33, np.asarray([0.5, 0.5, 0.5], np.float32)
    ngp = nerf_matrix_to_ngp(m, scale, offset)
    back = ngp_matrix_to_nerf(ngp, scale, offset)
    np.testing.assert_allclose(back, m, atol=1e-5)
