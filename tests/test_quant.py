"""Int8 W8A8 quantization path."""

import jax
import jax.numpy as jnp
import numpy as np

from unigen_tpu.layers.core import linear
from unigen_tpu.ops.quant import (int8_matmul, quantize_tree, quantize_weight,
                                  quantized_bytes)


def test_int8_matmul_accuracy():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32)) * 0.02
    x = jnp.asarray(rng.normal(size=(16, 256)).astype(np.float32))
    q = quantize_weight(w)
    assert q["w_q"].dtype == jnp.int8
    ref = x @ w
    got = int8_matmul(x, q["w_q"], q["w_scale"])
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_linear_dispatches_on_quantized_params():
    rng = np.random.default_rng(1)
    p = {"w": jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32)),
         "b": jnp.asarray(rng.normal(size=(128,)).astype(np.float32))}
    x = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
    ref = linear(p, x)
    q = quantize_weight(p["w"])
    q["b"] = p["b"]
    got = linear(q, x)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03


def test_quantize_tree_selectivity():
    tree = {
        "attn": {"to_q": {"w": jnp.ones((512, 512)), "b": jnp.zeros((512,))}},
        "gate": {"w": jnp.ones((512, 8))},              # skipped (gate)
        "small": {"w": jnp.ones((16, 16))},             # skipped (min_dim)
        "norm1": {"linear": {"w": jnp.ones((512, 512))}},  # adaln: quantized
    }
    q = quantize_tree(tree, min_dim=512)
    assert "w_q" in q["attn"]["to_q"] and "b" in q["attn"]["to_q"]
    assert "w" in q["gate"] and "w" in q["small"]
    assert "w_q" in q["norm1"]["linear"]  # AdaLN linears are fair game
    assert quantized_bytes(q) < quantized_bytes(tree)


def test_stacked_weight_quantization():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(3, 64, 32)).astype(np.float32))
    q = quantize_weight(w)
    assert q["w_q"].shape == (3, 64, 32) and q["w_scale"].shape == (3, 1, 32)
    # gathered block matches single quantization
    import jax
    w0 = quantize_weight(w[1])
    np.testing.assert_array_equal(np.asarray(q["w_q"][1]), np.asarray(w0["w_q"]))


def test_tiny_model_int8_forward_close():
    from unigen_tpu import config as cfg_lib
    from unigen_tpu.models.unigen_flux import (init_unigen_flux_params,
                                               unigen_flux_forward)
    from unigen_tpu.ops.packing import prepare_latent_image_ids
    flux = cfg_lib.tiny_flux_config(attention_head_dim=32, num_attention_heads=4,
                                    axes_dims_rope=(8, 12, 12))
    cfg = cfg_lib.UniGenConfig(family="flux", flux=flux, condition_types=("canny",))
    params = init_unigen_flux_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_tree(params, min_dim=64)
    b, hw, t = 1, 4, 6
    ks = jax.random.split(jax.random.PRNGKey(7), 6)
    batch = dict(
        hidden=jax.random.normal(ks[0], (b, hw * hw, flux.in_channels)),
        condition=jax.random.normal(ks[1], (b, hw * hw, flux.in_channels)),
        encoder=jax.random.normal(ks[2], (b, t, flux.joint_attention_dim)),
        pooled=jax.random.normal(ks[3], (b, flux.pooled_projection_dim)),
        condition_pooled=jax.random.normal(ks[4], (b, flux.pooled_projection_dim)),
        timestep=jnp.full((b,), 0.5),
        img_ids=prepare_latent_image_ids(hw, hw),
        txt_ids=jnp.zeros((t, 3)),
        condition_ids=prepare_latent_image_ids(hw, hw),
    )
    ref, _, _ = unigen_flux_forward(params, cfg, **batch)
    got, _, _ = unigen_flux_forward(qparams, cfg, **batch)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.15, rel  # serving-grade, not parity-grade
