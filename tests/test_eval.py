"""SSIM/PSNR metric sanity."""

import jax.numpy as jnp
import numpy as np

from unigen_tpu.eval import image_metrics, psnr, ssim


def test_ssim_identity_and_noise():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (1, 3, 32, 32)).astype(np.float32)
    assert float(ssim(jnp.asarray(img), jnp.asarray(img))) > 0.9999
    noisy = img + rng.normal(0, 25, img.shape).astype(np.float32)
    s = float(ssim(jnp.asarray(img), jnp.asarray(noisy)))
    assert 0.0 < s < 0.99


def test_ssim_monotonic_in_noise():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (1, 3, 32, 32)).astype(np.float32)
    s_small = float(ssim(jnp.asarray(img), jnp.asarray(img + 5)))
    s_big = float(ssim(jnp.asarray(img),
                       jnp.asarray(img + rng.normal(0, 50, img.shape))))
    assert s_small > s_big


def test_psnr_and_report():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    m = image_metrics(a, a)
    assert m["ssim"] > 0.9999 and m["psnr"] > 60 and m["mae"] == 0.0
    b = np.clip(a.astype(int) + 10, 0, 255).astype(np.uint8)
    m2 = image_metrics(a, b)
    assert m2["psnr"] < m["psnr"] and m2["mae"] > 5


def test_ssim_small_images_no_nan():
    """Images smaller than the 11px SSIM window must not NaN (the window
    clamps to the image side; 1-2 px degenerates to the luminance term)."""
    import numpy as np
    from unigen_tpu.eval import image_metrics
    rng = np.random.default_rng(0)
    for side in (2, 4, 8):
        a = rng.integers(0, 256, (1, side, side, 3), dtype=np.uint8)
        b = np.clip(a.astype(int) + rng.integers(-3, 4, a.shape),
                    0, 255).astype(np.uint8)
        m = image_metrics(a, b)
        assert np.isfinite(m["ssim"]) and 0.9 < m["ssim"] <= 1.0
        assert image_metrics(a, a.copy())["ssim"] == 1.0
