"""Image quality metrics.

Parity surface with ``wisp/ops/image/metrics.py`` (reference): float PSNR,
clamped (uint8-quantized) PSNR/MSE — the numbers SHACIRA reports per epoch —
plus SSIM.  Metrics are jit-friendly (pure jnp) and return scalars.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(rgb, gts):
    """Float PSNR, images in [0,1] (ref metrics.py:19-37)."""
    mse = jnp.mean((rgb[..., :3] - gts[..., :3]) ** 2)
    return 10.0 * jnp.log10(1.0 / mse)


def clamped_psnr(rgb, gts):
    """PSNR after clamping + uint8 quantization (ref metrics.py:39-58).

    ``20 log10(255) - 10 log10(mse_uint8)``.
    """
    # torch's float->uint8 cast truncates toward zero; match that exactly.
    rgb8 = (jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    gts8 = (jnp.clip(gts, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    mse = jnp.mean((rgb8[..., :3].astype(jnp.float32) - gts8[..., :3].astype(jnp.float32)) ** 2)
    return 20.0 * jnp.log10(255.0) - 10.0 * jnp.log10(mse)


def clamped_mse(rgb, gts):
    """uint8-quantized MSE (ref metrics.py:60-79)."""
    rgb8 = (jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    gts8 = (jnp.clip(gts, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return jnp.mean((rgb8[..., :3].astype(jnp.float32) - gts8[..., :3].astype(jnp.float32)) ** 2)


def ssim(rgb, gts, data_range: float = 1.0):
    """Gaussian-weighted SSIM (sigma=1.5), matching skimage defaults used by
    the reference (metrics.py:111-132): per-channel SSIM averaged.

    Args:
        rgb, gts: [H, W, C] float arrays in [0, 1].
    """
    rgb = jnp.asarray(rgb, jnp.float32)
    gts = jnp.asarray(gts, jnp.float32)
    sigma = 1.5
    truncate = 3.5
    radius = int(truncate * sigma + 0.5)  # 5
    size = 2 * radius + 1
    x = np.arange(size) - radius
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    kernel = jnp.asarray(g, jnp.float32)

    def filt(img):  # separable gaussian, per channel: img [H, W, C]
        img = jnp.moveaxis(img, -1, 0)  # [C, H, W]
        img = jax.vmap(lambda ch: jnp.apply_along_axis(
            lambda v: jnp.convolve(v, kernel, mode='valid'), 0, ch))(img)
        img = jax.vmap(lambda ch: jnp.apply_along_axis(
            lambda v: jnp.convolve(v, kernel, mode='valid'), 1, ch))(img)
        return jnp.moveaxis(img, 0, -1)

    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    mu_x = filt(rgb)
    mu_y = filt(gts)
    mu_xx = filt(rgb * rgb)
    mu_yy = filt(gts * gts)
    mu_xy = filt(rgb * gts)
    # skimage uses unbiased (N/(N-1)) covariance estimates with gaussian weights
    npts = size ** 2
    cov_norm = npts / (npts - 1)
    vx = cov_norm * (mu_xx - mu_x * mu_x)
    vy = cov_norm * (mu_yy - mu_y * mu_y)
    vxy = cov_norm * (mu_xy - mu_x * mu_y)
    num = (2 * mu_x * mu_y + C1) * (2 * vxy + C2)
    den = (mu_x ** 2 + mu_y ** 2 + C1) * (vx + vy + C2)
    return jnp.mean(num / den)


def mse(rgb, gts):
    return jnp.mean((rgb - gts) ** 2)
