"""Native C++ data-pipeline vs numpy reference (skips if toolchain absent)."""

import numpy as np
import pytest

from unigen_tpu.data import native


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (3, 24, 40, 3), dtype=np.uint8)


def _with_fallback(fn, *args, **kw):
    save = native._LIB
    native._LIB = None
    try:
        return fn(*args, **kw)
    finally:
        native._LIB = save


def test_normalize_matches(imgs):
    if not native.available():
        pytest.skip("native lib unavailable")
    got = native.normalize_chw(imgs)
    ref = _with_fallback(native.normalize_chw, imgs)
    np.testing.assert_allclose(got, ref, atol=2e-7)
    assert got.shape == (3, 3, 24, 40)


def test_resize_matches(imgs):
    if not native.available():
        pytest.skip("native lib unavailable")
    got = native.resize_bilinear(imgs, 12, 20)
    ref = _with_fallback(native.resize_bilinear, imgs, 12, 20)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_sobel_and_gray_match(imgs):
    if not native.available():
        pytest.skip("native lib unavailable")
    gs = native.sobel_edges(imgs)
    rs = _with_fallback(native.sobel_edges, imgs)
    assert (gs != rs).mean() < 0.01
    gg = native.grayscale(imgs)
    rg = _with_fallback(native.grayscale, imgs)
    assert np.abs(gg.astype(int) - rg.astype(int)).max() <= 1


def test_blur_runs(imgs):
    if not native.available():
        pytest.skip("native lib unavailable")
    out = native.gaussian_blur(imgs, 3.0)
    assert out.shape == imgs.shape
    # blur reduces variance
    assert out.astype(np.float32).var() < imgs.astype(np.float32).var()


def test_to_model_range_uses_native_and_matches_numpy(imgs):
    """conditions.to_model_range is the native pipeline's real consumer
    (every dataset __getitem__): the native route must equal the numpy
    formula within float32 rounding."""
    from unigen_tpu.data import conditions as C
    img = imgs[0]
    got = C.to_model_range(img)
    ref = (img.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)
    np.testing.assert_allclose(got, ref, atol=2e-7)
    assert got.shape == (3, 24, 40) and got.dtype == np.float32
