"""W8A8 / W4A8 quantization paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu.layers.core import linear
from unigen_tpu.ops.quant import (int4_matmul, int8_matmul, pack_int4,
                                  quantize_tree, quantize_unigen_serving,
                                  quantize_weight, quantize_weight_int4,
                                  quantized_bytes, unpack_int4)


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


def test_int4_pack_roundtrip_exact():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.integers(-7, 8, (5, 64, 32)), jnp.int8)
    packed = pack_int4(q)
    assert packed.shape == (5, 32, 32) and packed.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), np.asarray(q))


def test_int4_matmul_accuracy():
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(512, 256)).astype(np.float32)) * 0.02
    x = jnp.asarray(rng.normal(size=(16, 512)).astype(np.float32))
    q = quantize_weight_int4(w)
    assert q["w_q4"].shape == (256, 256)
    ref = x @ w
    got = int4_matmul(x, q["w_q4"], q["w_scale"])
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    # RTN int4 on iid-gaussian weights: ~13% per matmul (real checkpoints
    # with heavy-tailed weights fare better); this pins the implementation,
    # not a fidelity claim
    assert rel < 0.2, rel
    # and it must be far better than scale-free truncation
    assert rel > 0.01, "suspiciously exact — is this actually int4?"


def test_int4_linear_dispatch_and_stacked_gather():
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.normal(size=(3, 128, 128)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    q = quantize_weight_int4(w)
    q["b"] = b
    x = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
    from unigen_tpu.utils import index_params
    got = linear(index_params(q, 1), x)
    ref = x @ w[1] + b
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.25, rel
    with pytest.raises(ValueError):
        int4_matmul(x, q["w_q4"], q["w_scale"])  # stacked weight must fail loud


def test_serving_policy_mixed_bits():
    tree = {
        "base": {"attn": {"w": jnp.ones((512, 512)) * 0.01},
                 "gate": {"w": jnp.ones((512, 8))}},
        "control": {"double_blocks": {"attn": {"w": jnp.ones((512, 512)) * .01}},
                    "shared_expert": {"attn": {"w": jnp.ones((512, 512)) * .01}},
                    "moe": {"experts": {"w": jnp.ones((512, 512))}}},
    }
    q = quantize_unigen_serving(tree)
    assert "w_q4" in q["base"]["attn"], "frozen base -> int4"
    assert "w_q4" in q["control"]["double_blocks"]["attn"], "adapter blocks -> int4"
    assert "w_q" in q["control"]["shared_expert"]["attn"], "small adapter -> int8"
    assert "w" in q["base"]["gate"] and "w" in q["control"]["moe"]["experts"]
    # the W8 variant of the adapter blocks stays available
    q8 = quantize_unigen_serving(tree, adapter_block_bits=8)
    assert "w_q" in q8["control"]["double_blocks"]["attn"]
    # int4 halves the int8 footprint for the same weight
    assert (q["control"]["double_blocks"]["attn"]["w_q4"].nbytes
            == q["control"]["shared_expert"]["attn"]["w_q"].nbytes // 2)


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


def test_quantized_matmul_straight_through_gradients():
    """QLoRA convention: dx flows through quantized frozen weights (the
    dequantized transpose), the integer weight itself gets no grad — so a
    frozen W4/W8 base still back-propagates into upstream adapter params."""
    rng = np.random.default_rng(6)
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32)) * 0.05
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    g_ref = jax.grad(lambda x_: float(0) + jnp.sum(jnp.tanh(x_ @ w)))(x)
    q8 = quantize_weight(w)
    q4 = quantize_weight_int4(w)
    g8 = jax.grad(lambda x_: jnp.sum(jnp.tanh(
        int8_matmul(x_, q8["w_q"], q8["w_scale"]))))(x)
    g4 = jax.grad(lambda x_: jnp.sum(jnp.tanh(
        int4_matmul(x_, q4["w_q4"], q4["w_scale"]))))(x)
    assert float(jnp.linalg.norm(g8 - g_ref) / jnp.linalg.norm(g_ref)) < 0.05
    assert float(jnp.linalg.norm(g4 - g_ref) / jnp.linalg.norm(g_ref)) < 0.35
    # upstream param behind a quantized frozen layer still gets gradient
    a0 = jnp.eye(64, 64)
    ga = jax.grad(lambda a: jnp.sum(int8_matmul(x @ a, q8["w_q"],
                                                q8["w_scale"])))(a0)
    assert bool(jnp.any(ga != 0))


def test_quant_bwd_policies_agree():
    """UNIGEN_QUANT_BWD=bf16 (default) and int8 compute the same dx as the
    legacy f32 dequant backward: bf16 to matmul tolerance, int8 to the
    per-token cotangent-quantization tolerance (cosine > 0.999) — the
    train-MFU lever must not change adapter gradient direction."""
    import os
    from unigen_tpu.ops import quant as Q
    rng = np.random.default_rng(9)
    w = jnp.asarray(rng.normal(size=(128, 96)).astype(np.float32)) * 0.05
    x = jnp.asarray(rng.normal(size=(6, 128)).astype(np.float32))
    q8 = quantize_weight(w)
    q4 = quantize_weight_int4(w)

    def grads(policy):
        old = os.environ.get("UNIGEN_QUANT_BWD")
        os.environ["UNIGEN_QUANT_BWD"] = policy
        try:
            g8 = jax.grad(lambda x_: jnp.sum(jnp.tanh(
                int8_matmul(x_, q8["w_q"], q8["w_scale"]))))(x)
            g4 = jax.grad(lambda x_: jnp.sum(jnp.tanh(
                int4_matmul(x_, q4["w_q4"], q4["w_scale"]))))(x)
        finally:
            if old is None:
                os.environ.pop("UNIGEN_QUANT_BWD")
            else:
                os.environ["UNIGEN_QUANT_BWD"] = old
        return np.asarray(g8, np.float64), np.asarray(g4, np.float64)

    ref8, ref4 = grads("f32")
    for pol, tol_rel in (("bf16", 0.02), ("int8", 0.03)):
        p8, p4 = grads(pol)
        for got, ref in ((p8, ref8), (p4, ref4)):
            rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            cos = float((got.ravel() @ ref.ravel())
                        / (np.linalg.norm(got) * np.linalg.norm(ref)))
            assert rel < tol_rel, (pol, rel)
            assert cos > 0.999, (pol, cos)


def test_w4a8_pallas_kernel_matches_xla():
    """Fused dequant-matmul kernel (packed-int4 read, VPU unpack, int8 MXU)
    is bit-identical to the XLA unpack path (interpret mode on CPU)."""
    import importlib
    import os
    os.environ["UNIGEN_PALLAS_INTERPRET"] = "1"
    from unigen_tpu.ops import quant
    from unigen_tpu.ops.pallas import quant_matmul as qm
    importlib.reload(qm)  # pick up interpret mode even if imported earlier
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.normal(size=(2048, 384)).astype(np.float32)) * 0.02
    x = jnp.asarray(rng.normal(size=(200, 2048)).astype(np.float32))
    q4 = quantize_weight_int4(w)
    ref = int4_matmul(x, q4["w_q4"], q4["w_scale"], jnp.float32)
    xq, xs = quant._quantize_act(x)
    got = qm.w4a8_matmul_pallas(xq, xs, q4["w_q4"],
                                q4["w_scale"].reshape(1, -1), jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # SD3 width: K=1536 takes the 512-row K block (VERDICT r4 #6 — the
    # fixed 1024 block excluded every SD3 stack from the fused kernel)
    assert qm._pick_bk(1536) == 512 and qm._pick_bk(6144) == 1024
    w = jnp.asarray(rng.normal(size=(1536, 384)).astype(np.float32)) * 0.02
    x = jnp.asarray(rng.normal(size=(64, 1536)).astype(np.float32))
    q4 = quantize_weight_int4(w)
    assert qm.supported(x, q4["w_q4"])
    ref = int4_matmul(x, q4["w_q4"], q4["w_scale"], jnp.float32)
    xq, xs = quant._quantize_act(x)
    got = qm.w4a8_matmul_pallas(xq, xs, q4["w_q4"],
                                q4["w_scale"].reshape(1, -1), jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_quantize_tree_streaming_matches_one_shot():
    """The bounded-memory streaming walk produces numerically identical
    trees to quantize_tree / quantize_unigen_serving (donate=False on CPU —
    deletion semantics are device-memory behavior, not numerics)."""
    from unigen_tpu.ops.quant import (quantize_tree,
                                      quantize_tree_streaming,
                                      quantize_unigen_serving,
                                      quantize_unigen_serving_streaming)
    rng = jax.random.PRNGKey(0)
    tree = {"base": {"blk": {"w": jax.random.normal(rng, (768, 512)),
                             "b": jnp.zeros((512,))},
                     "gate": {"w": jax.random.normal(rng, (768, 768))}},
            "control": {"double_blocks": {"w": jax.random.normal(rng, (2, 640, 640))},
                        "small": {"w": jax.random.normal(rng, (16, 16))}}}
    def check(x, y):
        # int leaves exact; fp scales within jit-vs-eager rounding (~1e-9)
        xa, ya = np.asarray(x), np.asarray(y)
        if np.issubdtype(xa.dtype, np.integer):
            np.testing.assert_array_equal(xa, ya)
        else:
            np.testing.assert_allclose(xa, ya, rtol=1e-6, atol=1e-8)

    a = quantize_tree(tree, bits=8)
    b = quantize_tree_streaming(tree, bits=8, donate=False)
    jax.tree.map(check, a, b)
    sa = quantize_unigen_serving(tree)
    sb = quantize_unigen_serving_streaming(tree, donate=False)
    jax.tree.map(check, sa, sb)
