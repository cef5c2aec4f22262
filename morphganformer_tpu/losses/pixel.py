"""Pixel-space losses: MSE, L1, PSNR, DSSIM — all differentiable jnp.

Behavioral spec: the reference uses torch MSELoss (1024_example_MSE.py:223),
numpy compare_ssim / psnr on flattened images (1024_example_SSIM.py:112-162,
1024_example_PSNR.py:113-160), and lpips' numpy helpers
(lpips/__init__.py:48-55). Here every loss is a jit-able, differentiable
function of NHWC images in [-1, 1], so they can sit inside the projection
value_and_grad (the reference's numpy versions could not).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mse_loss(img, target):
    return jnp.mean(jnp.square(img - target))


def l1_loss(img, target):
    return jnp.mean(jnp.abs(img - target))


def psnr(img, target, data_range=2.0):
    """Peak signal-to-noise ratio in dB (higher is better)."""
    mse = jnp.mean(jnp.square(img - target))
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def psnr_loss(img, target, data_range=2.0):
    """Negated PSNR for minimization (reference 1024_example_PSNR.py uses
    psnr as the objective)."""
    return -psnr(img, target, data_range)


def _gaussian_kernel(size=11, sigma=1.5):
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), dtype=jnp.float32)


def ssim(img, target, data_range=2.0, size=11, sigma=1.5):
    """Structural similarity (Wang et al. 2004), gaussian-windowed, channel
    mean — matches skimage.metrics.structural_similarity(gaussian_weights=True,
    use_sample_covariance=False) used by the reference's SSIM script."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    kernel = _gaussian_kernel(size, sigma)
    channels = img.shape[-1]
    k4 = jnp.broadcast_to(kernel[:, :, None, None], (size, size, 1, channels))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, k4, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=channels)

    mu_x = filt(img)
    mu_y = filt(target)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = filt(img * img) - mu_xx
    sigma_y = filt(target * target) - mu_yy
    sigma_xy = filt(img * target) - mu_xy
    s = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)) / (
        (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2))
    return jnp.mean(s)


def dssim_loss(img, target, data_range=2.0):
    """(1 - SSIM) / 2 — the minimization form (lpips/__init__.py dssim)."""
    return (1.0 - ssim(img, target, data_range)) / 2.0
