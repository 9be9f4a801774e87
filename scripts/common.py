"""Shared script helpers: image I/O, error metrics (ref: scripts/common.py
of the reference — PSNR/SSIM/L1/L2 family used by run.py's eval)."""
from __future__ import annotations

import os
import sys

import numpy as np

ROOT_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT_DIR)

from ngp_tpu.common import linear_to_srgb_np, srgb_to_linear_np  # noqa: E402
from ngp_tpu.data.image_io import (load_binary_image, load_exr,  # noqa
                                   load_stbi, read_image, save_binary_image,
                                   save_exr, save_stbi)


def write_image(path, img):
    path = str(path)
    if path.endswith(".bin"):
        save_binary_image(path, img)
    elif path.endswith(".exr"):
        save_exr(path, img)
    else:
        save_stbi(path, img, from_linear=True)


def mse2psnr(mse: float) -> float:
    return -10.0 * np.log10(max(float(mse), 1e-12))


def compute_error_img(metric: str, img: np.ndarray, ref: np.ndarray):
    metric = metric.upper()
    d = img - ref
    if metric == "MAE":
        return np.abs(d)
    if metric == "MAPE":
        return np.abs(d) / (np.abs(ref) + 1e-2)
    if metric == "SMAPE":
        return 2 * np.abs(d) / (np.abs(ref) + np.abs(img) + 2e-2)
    if metric == "MSE":
        return d * d
    if metric == "MRSE":
        return d * d / (ref * ref + 1e-2)
    raise ValueError(metric)


def compute_error(metric: str, img, ref) -> float:
    return float(np.mean(compute_error_img(metric, np.asarray(img),
                                           np.asarray(ref))))


def luminance(a: np.ndarray) -> np.ndarray:
    return 0.212671 * a[..., 0] + 0.715160 * a[..., 1] + 0.072169 * a[..., 2]


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Grayscale SSIM with 11×11 Gaussian window (standard constants)."""
    from scipy.ndimage import gaussian_filter
    x = luminance(np.asarray(a, np.float64))
    y = luminance(np.asarray(b, np.float64))
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    mu_x = gaussian_filter(x, 1.5)
    mu_y = gaussian_filter(y, 1.5)
    sxx = gaussian_filter(x * x, 1.5) - mu_x ** 2
    syy = gaussian_filter(y * y, 1.5) - mu_y ** 2
    sxy = gaussian_filter(x * y, 1.5) - mu_x * mu_y
    s = ((2 * mu_x * mu_y + C1) * (2 * sxy + C2)) / \
        ((mu_x ** 2 + mu_y ** 2 + C1) * (sxx + syy + C2))
    return float(np.mean(s))


def flip(img: np.ndarray, ref: np.ndarray,
         pixels_per_degree: float = 67.0) -> float:
    """LDR-FLIP-style perceptual error (simplified re-implementation of the
    metric the reference vendors in scripts/flip/): CSF-bandlimited color
    difference in a perceptually uniform space combined with an edge/point
    feature difference, mean over pixels in [0,1]."""
    from scipy.ndimage import gaussian_filter

    def to_lab(x):
        x = np.clip(x, 0, 1) ** 2.2
        M = np.array([[0.4124, 0.3576, 0.1805],
                      [0.2126, 0.7152, 0.0722],
                      [0.0193, 0.1192, 0.9505]])
        xyz = x @ M.T
        wp = np.array([0.9505, 1.0, 1.089])
        f = np.cbrt(np.maximum(xyz / wp, 1e-8))
        L = 116 * f[..., 1] - 16
        a = 500 * (f[..., 0] - f[..., 1])
        b = 200 * (f[..., 1] - f[..., 2])
        return np.stack([L, a, b], -1)

    # spatial bandlimiting ~ CSF low-pass (sigma from viewing conditions)
    sigma = 0.5 * pixels_per_degree / 60.0
    fa = gaussian_filter(np.asarray(img, np.float64), (sigma, sigma, 0))
    fb = gaussian_filter(np.asarray(ref, np.float64), (sigma, sigma, 0))
    dE = np.linalg.norm(to_lab(fa[..., :3]) - to_lab(fb[..., :3]), axis=-1)
    color_err = 1.0 - np.exp(-dE / 30.0)

    # feature difference: gradient-magnitude mismatch of luminance
    def lum_grad(x):
        l = luminance(x)
        gx = np.gradient(l, axis=1)
        gy = np.gradient(l, axis=0)
        return np.sqrt(gx * gx + gy * gy)
    feat_err = np.abs(lum_grad(fa) - lum_grad(fb))
    feat_err = 1.0 - np.exp(-feat_err * 8.0)
    err = 1.0 - (1.0 - color_err) * (1.0 - feat_err)
    return float(np.mean(err))
