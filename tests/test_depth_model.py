"""Depth-Anything golden: the JAX DINOv2+DPT implementation must match
transformers DepthAnythingForDepthEstimation on a tiny random config
(the reference's depth condition source, condition.py:52-60)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from unigen_tpu.io.torch_bridge import load_depth_anything
from unigen_tpu.models.depth import (DepthAnythingConfig, depth_forward,
                                     depth_to_condition_image,
                                     interpolate_bilinear, tiny_depth_config)


def _tiny_hf_model():
    from transformers import DepthAnythingConfig as HFCfg
    from transformers import DepthAnythingForDepthEstimation, Dinov2Config
    bk = Dinov2Config(hidden_size=32, num_hidden_layers=4,
                      num_attention_heads=2, intermediate_size=128,
                      patch_size=14, image_size=56,
                      out_indices=[1, 2, 3, 4],
                      out_features=None, apply_layernorm=True,
                      reshape_hidden_states=False)
    cfg = HFCfg(backbone_config=bk, reassemble_hidden_size=32,
                neck_hidden_sizes=[8, 16, 24, 32], fusion_hidden_size=16,
                head_hidden_size=8, patch_size=14,
                reassemble_factors=[4, 2, 1, 0.5])
    torch.manual_seed(0)
    model = DepthAnythingForDepthEstimation(cfg).eval()
    # random init leaves layer_scale at 1.0 and convs ~N(0, 0.02) — fine
    return model


def test_interpolate_bilinear_matches_torch_both_conventions():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 7, 9)).astype(np.float32)
    for ac, size in [(True, (13, 5)), (False, (14, 18)), (True, (7, 9))]:
        ref = torch.nn.functional.interpolate(
            torch.tensor(x), size=size, mode="bilinear", align_corners=ac)
        got = interpolate_bilinear(jnp.asarray(x), size, align_corners=ac)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                                   rtol=1e-5, atol=1e-5)


def test_depth_anything_matches_transformers():
    model = _tiny_hf_model()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = tiny_depth_config()
    params = load_depth_anything(sd, cfg)

    rng = np.random.default_rng(1)
    px = rng.normal(size=(1, 3, 56, 56)).astype(np.float32)  # native grid 4x4
    with torch.no_grad():
        ref = model(pixel_values=torch.tensor(px)).predicted_depth.numpy()
    got = np.asarray(depth_forward(params, cfg, jnp.asarray(px)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_depth_condition_end_to_end():
    """make_depth_fn: uint8 image in -> uint8 3-channel depth image out."""
    from unigen_tpu.data import conditions as C
    model = _tiny_hf_model()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = tiny_depth_config()
    params = load_depth_anything(sd, cfg)
    fn = C.make_depth_fn(params, cfg)
    img = np.random.default_rng(2).integers(0, 255, (60, 80, 3), dtype=np.uint8)
    out = C.synthesize("depth", img, depth_fn=fn)
    assert out.shape == (60, 80, 3) and out.dtype == np.uint8
    assert out.std() > 0  # produced an actual map, not a constant
