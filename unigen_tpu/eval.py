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


# --------------------------------------------------------------- FID / DISTS
#
# The reference ships pytorch-fid / dists-pytorch / torchmetrics in
# environment.yaml but never calls them (SURVEY.md §4). This is the runnable
# metric plumbing (VERDICT r4 next-round #8): distribution-level Fréchet
# distance over ANY feature extractor (classic FID = InceptionV3 pool3;
# FD-VGG / FD-DINOv2 are the same statistic over a different tower —
# arXiv:2306.04675 recommends DINOv2, which this repo already implements
# with HF parity for the depth condition, models/depth.py), plus the DISTS
# perceptual score (Ding et al., arXiv:2004.07728) over the VGG16 tower
# (models/vgg.py). Feature weights are environment-blocked like every real
# checkpoint; scripts/eval.py wires --fid/--dists with a 'test' extractor so
# the pipeline is exercised end-to-end today.


class FeatureStats:
    """Streaming mean/covariance accumulator for Fréchet-distance features.

    Accumulates on host in float64 (FID is numerically touchy at 2048-dim;
    the matrix sqrt wants the extra mantissa). Feed [N, D] batches."""

    def __init__(self, dim: int):
        self.n = 0
        self._sum = np.zeros((dim,), np.float64)
        self._outer = np.zeros((dim, dim), np.float64)

    def update(self, feats) -> None:
        f = np.asarray(feats, np.float64)
        assert f.ndim == 2 and f.shape[1] == self._sum.shape[0], f.shape
        self.n += f.shape[0]
        self._sum += f.sum(axis=0)
        self._outer += f.T @ f

    def finalize(self):
        """-> (mu [D], sigma [D, D]) with the sample-covariance 1/(n-1)
        normalization (np.cov / pytorch-fid convention)."""
        assert self.n >= 2, "need >= 2 samples for a covariance"
        mu = self._sum / self.n
        sigma = (self._outer - self.n * np.outer(mu, mu)) / (self.n - 1)
        return mu, sigma


def _sqrtm_psd(a: np.ndarray) -> np.ndarray:
    w, v = np.linalg.eigh((a + a.T) / 2.0)
    return (v * np.sqrt(np.clip(w, 0.0, None))) @ v.T


def frechet_distance(mu1, sigma1, mu2, sigma2, *, eps: float = 1e-6) -> float:
    """||mu1-mu2||² + tr(S1 + S2 - 2·sqrtm(S1·S2)).

    tr(sqrtm(S1·S2)) is computed symmetrically as
    tr(sqrtm(sqrtm(S1)·S2·sqrtm(S1))) via eigh — S1·S2 itself is not
    symmetric and scipy's generic sqrtm is unstable on near-singular
    products (pytorch-fid adds eps·I for the same reason)."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    s1 = np.asarray(sigma1, np.float64) + eps * np.eye(mu1.shape[0])
    s2 = np.asarray(sigma2, np.float64) + eps * np.eye(mu2.shape[0])
    s1h = _sqrtm_psd(s1)
    tr_covmean = np.sum(np.sqrt(np.clip(
        np.linalg.eigvalsh((s1h @ s2 @ s1h + (s1h @ s2 @ s1h).T) / 2.0),
        0.0, None)))
    diff = mu1 - mu2
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2.0 * tr_covmean)


def fid(features_a: np.ndarray, features_b: np.ndarray) -> float:
    """Fréchet distance between two [N, D] feature sets (one-shot helper;
    use FeatureStats for streaming over large sets)."""
    fa, fb = np.asarray(features_a), np.asarray(features_b)
    sa, sb = FeatureStats(fa.shape[1]), FeatureStats(fb.shape[1])
    sa.update(fa)
    sb.update(fb)
    return frechet_distance(*sa.finalize(), *sb.finalize())


def dists(vgg_params, a: jnp.ndarray, b: jnp.ndarray,
          weights=None) -> jnp.ndarray:
    """DISTS (Deep Image Structure and Texture Similarity, arXiv:2004.07728)
    between image batches a, b in [B, 3, H, W], values in [0, 1].

    Feature stack = raw input + the 5 VGG16 relu stages under L2 pooling
    (models/vgg.vgg16_stages(pool="l2")). Per channel: a texture (mean) term
    and a structure (covariance) term over the spatial map; the official
    score weights channels with LEARNED alpha/beta (weights-blocked here like
    the VGG weights themselves) — ``weights=(alpha_list, beta_list)`` slots
    them in; default is the uniform prior (alpha=beta=1/(2·C_total)).
    Returns the DISTANCE (0 = identical, like the official repo)."""
    from unigen_tpu.models.vgg import vgg16_stages
    c1 = c2 = 1e-6
    feats_a = [a] + vgg16_stages(vgg_params, a, pool="l2")
    feats_b = [b] + vgg16_stages(vgg_params, b, pool="l2")
    n_ch = sum(int(f.shape[1]) for f in feats_a)
    score = jnp.zeros((a.shape[0],), jnp.float32)
    for j, (fa, fb) in enumerate(zip(feats_a, feats_b)):
        mu_a = jnp.mean(fa, axis=(2, 3))
        mu_b = jnp.mean(fb, axis=(2, 3))
        var_a = jnp.var(fa, axis=(2, 3))
        var_b = jnp.var(fb, axis=(2, 3))
        cov = jnp.mean(fa * fb, axis=(2, 3)) - mu_a * mu_b
        texture = (2 * mu_a * mu_b + c1) / (mu_a ** 2 + mu_b ** 2 + c1)
        structure = (2 * cov + c2) / (var_a + var_b + c2)
        if weights is None:
            alpha = beta = 1.0 / (2.0 * n_ch)
            score = score + alpha * jnp.sum(texture, axis=1) \
                + beta * jnp.sum(structure, axis=1)
        else:
            alpha, beta = weights[0][j], weights[1][j]
            score = score + jnp.sum(alpha * texture, axis=1) \
                + jnp.sum(beta * structure, axis=1)
    return 1.0 - score
