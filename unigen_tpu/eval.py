"""Evaluation metrics: SSIM (the BASELINE parity metric) + PSNR/MAE.

The reference installs metric packages but never uses them in-repo
(SURVEY.md §4: pytorch-fid/dists-pytorch/torchmetrics unused); evaluation is
visual inspection of saved PNGs. Here SSIM is first-class because the build
target is SSIM >= 0.99 vs reference outputs (BASELINE.md).

Standard SSIM: 11x11 Gaussian window (sigma 1.5), K1=0.01, K2=0.03, applied
per channel and averaged. Covariances carry skimage's sample-covariance
correction NP/(NP-1) (structural_similarity(gaussian_weights=True,
use_sample_covariance=True) semantics) so the 0.99 parity gate reads the
same whether checked here or with skimage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    return jnp.outer(g, g)


def _filter2d(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """img [B, C, H, W] valid-mode depthwise filter."""
    b, c, h, w = img.shape
    k = kernel[:, :, None, None]                       # HWIO with I=1
    k = jnp.tile(k, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        img, k, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NCHW", "HWIO", "NCHW"))


def ssim(a: jnp.ndarray, b: jnp.ndarray, *, data_range: float = 255.0,
         win_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM between image batches [B, C, H, W] (float)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    # clamp the window to the image (odd-sized): a window larger than the
    # image makes the valid convolution empty and the mean NaN
    side = min(int(a.shape[-2]), int(a.shape[-1]))
    if side < win_size:
        win_size = side if side % 2 == 1 else side - 1
    k = _gaussian_kernel(win_size, sigma)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a = _filter2d(a, k)
    mu_b = _filter2d(b, k)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    # win_size 1 (degenerate 1-2 px images): variances vanish and SSIM
    # reduces to the luminance term; avoid the 0/0 in the 1-sample cov norm
    cov_norm = ((win_size * win_size) / (win_size * win_size - 1.0)
                if win_size > 1 else 1.0)
    s_aa = cov_norm * (_filter2d(a * a, k) - mu_aa)
    s_bb = cov_norm * (_filter2d(b * b, k) - mu_bb)
    s_ab = cov_norm * (_filter2d(a * b, k) - mu_ab)
    num = (2 * mu_ab + c1) * (2 * s_ab + c2)
    den = (mu_aa + mu_bb + c1) * (s_aa + s_bb + c2)
    return jnp.mean(num / den)


def psnr(a: jnp.ndarray, b: jnp.ndarray, *, data_range: float = 255.0) -> jnp.ndarray:
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def image_metrics(a: np.ndarray, b: np.ndarray) -> dict:
    """uint8 HWC (or batched) image comparison report."""
    if a.ndim == 3:
        a, b = a[None], b[None]
    at = jnp.asarray(a.transpose(0, 3, 1, 2), jnp.float32)
    bt = jnp.asarray(b.transpose(0, 3, 1, 2), jnp.float32)
    return {"ssim": float(ssim(at, bt)), "psnr": float(psnr(at, bt)),
            "mae": float(jnp.mean(jnp.abs(at - bt)))}
