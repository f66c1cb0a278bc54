"""SD3 + SANA family tests: backbone shapes, UniGen zero-init invariants,
CrossAttn mode, UniGenBase variant, multi-head configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu import config as cfg_lib


@pytest.fixture(scope="module")
def sd3_cfg():
    return cfg_lib.UniGenConfig(
        family="sd3", sd3=cfg_lib.tiny_sd3_config(),
        control=cfg_lib.ControlConfig(use_rope=False),
        condition_types=("depth",))


def _sd3_batch(cfg, b=2, hw=8, t=6, key=0):
    bb = cfg.sd3
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    return dict(
        hidden=jax.random.normal(ks[0], (b, bb.in_channels, hw, hw)),
        condition=jax.random.normal(ks[1], (b, bb.in_channels, hw, hw)),
        encoder=jax.random.normal(ks[2], (b, t, bb.joint_attention_dim)),
        pooled=jax.random.normal(ks[3], (b, bb.pooled_projection_dim)),
        condition_pooled=jax.random.normal(ks[4], (b, bb.pooled_projection_dim)),
        timestep=jnp.full((b,), 500.0),
    )


def test_sd3_backbone_shapes(sd3_cfg):
    from unigen_tpu.models.sd3 import init_sd3_params, sd3_forward
    bb = sd3_cfg.sd3
    params = init_sd3_params(jax.random.PRNGKey(0), bb)
    batch = _sd3_batch(sd3_cfg)
    out = sd3_forward(params, bb, batch["hidden"], batch["encoder"],
                      batch["pooled"], batch["timestep"])
    assert out.shape == (2, bb.out_channels, 8, 8)
    assert jnp.isfinite(out).all()


def test_unigen_sd3_zero_init_matches_base(sd3_cfg):
    from unigen_tpu.models.sd3 import sd3_forward
    from unigen_tpu.models.unigen_sd3 import (init_unigen_sd3_params,
                                              unigen_sd3_forward)
    params = init_unigen_sd3_params(jax.random.PRNGKey(0), sd3_cfg)
    batch = _sd3_batch(sd3_cfg)
    pred, losses, outs = unigen_sd3_forward(params, sd3_cfg, **batch)
    base = sd3_forward(params["base"], sd3_cfg.sd3, batch["hidden"],
                       batch["encoder"], batch["pooled"], batch["timestep"])
    np.testing.assert_allclose(np.asarray(pred), np.asarray(base),
                               rtol=1e-4, atol=1e-5)
    assert jnp.isfinite(losses["moe_loss"])
    e = sd3_cfg.control.moe.num_experts(1)
    assert outs["expert_counts"].shape == (e,)


def test_unigen_sd3_crossattn_mode():
    cfg = cfg_lib.UniGenConfig(
        family="sd3", sd3=cfg_lib.tiny_sd3_config(),
        control=cfg_lib.ControlConfig(use_rope=False, cn2base_method="CrossAttn"),
        condition_types=("depth",))
    from unigen_tpu.models.unigen_sd3 import (init_unigen_sd3_params,
                                              unigen_sd3_forward)
    params = init_unigen_sd3_params(jax.random.PRNGKey(1), cfg)
    assert "cross_kv" in params["control"]
    batch = _sd3_batch(cfg, key=2)
    pred, _, _ = unigen_sd3_forward(params, cfg, **batch)
    assert pred.shape == batch["hidden"].shape
    assert jnp.isfinite(pred).all()


def test_unigen_base_variant(sd3_cfg):
    from unigen_tpu.models.unigen_sd3 import (init_unigen_sd3_params,
                                              unigen_base_forward)
    params = init_unigen_sd3_params(jax.random.PRNGKey(2), sd3_cfg,
                                    base_variant=True)
    assert "preprocess_block" in params["control"]
    batch = _sd3_batch(sd3_cfg, key=3)
    pred, losses, _ = unigen_base_forward(params, sd3_cfg, **batch)
    assert pred.shape == batch["hidden"].shape
    assert jnp.isfinite(pred).all() and jnp.isfinite(losses["moe_loss"])


def test_unigen_base_variant_single_control_blocks(sd3_cfg):
    """use_encoder_hidden_states=False (reference :90-100, base variant
    only): control blocks are SINGLE transformer blocks over the hidden
    stream — no text weave inside the control stack, no base warm-start,
    and the residual-cache replay stays bit-exact. The interleaved
    UniGenSD3 rejects the flag (reference :496)."""
    import dataclasses
    from unigen_tpu.models.unigen_sd3 import (init_unigen_sd3_params,
                                              unigen_base_forward,
                                              unigen_sd3_forward)
    cfg2 = dataclasses.replace(
        sd3_cfg, control=dataclasses.replace(sd3_cfg.control,
                                             use_encoder_hidden_states=False))
    params = init_unigen_sd3_params(jax.random.PRNGKey(2), cfg2,
                                    base_variant=True)
    assert "single_control_blocks" in params["control"]
    assert "joint_blocks" not in params["control"]
    # single blocks have no context stream -> no norm1_context
    assert "norm1_context" not in params["control"]["single_control_blocks"]
    batch = _sd3_batch(cfg2, key=3)
    pred, losses, outs = unigen_base_forward(params, cfg2, **batch,
                                             return_control_residuals=True)
    assert pred.shape == batch["hidden"].shape
    assert jnp.isfinite(pred).all() and jnp.isfinite(losses["moe_loss"])
    # replay with the captured residuals is bit-exact (cache contract)
    replay, _, _ = unigen_base_forward(
        params, cfg2, **batch, control_residuals=outs["control_residuals"])
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(replay))
    # interleaved class rejects the flag (reference :496)
    p2 = init_unigen_sd3_params(jax.random.PRNGKey(2), cfg2)
    with pytest.raises(AssertionError):
        unigen_sd3_forward(p2, cfg2, **batch)


def test_unigen_base_variant_use_pos_embed(sd3_cfg):
    """use_pos_embed=True creates a separate trainable target PatchEmbed,
    warm-started to equal base pos_embed (reference :53-65,146-147) — so the
    forward at init matches the use_pos_embed=False path exactly."""
    import dataclasses
    from unigen_tpu.models.unigen_sd3 import (init_unigen_sd3_params,
                                              unigen_base_forward)
    cfg2 = dataclasses.replace(
        sd3_cfg, control=dataclasses.replace(sd3_cfg.control,
                                             use_pos_embed=True))
    params = init_unigen_sd3_params(jax.random.PRNGKey(2), cfg2,
                                    base_variant=True)
    assert "pos_embed" in params["control"]
    np.testing.assert_array_equal(
        np.asarray(params["control"]["pos_embed"]["proj"]["w"]),
        np.asarray(params["base"]["pos_embed"]["proj"]["w"]))
    batch = _sd3_batch(cfg2, key=3)
    pred, _, _ = unigen_base_forward(params, cfg2, **batch)
    assert pred.shape == batch["hidden"].shape
    assert jnp.isfinite(pred).all()


# ------------------------------------------------------------ SANA

@pytest.fixture(scope="module")
def sana_cfg():
    return cfg_lib.UniGenConfig(
        family="sana", sana=cfg_lib.tiny_sana_config(),
        control=cfg_lib.ControlConfig(),
        condition_types=("canny",))


def _sana_batch(cfg, b=2, hw=8, t=5, key=0):
    bb = cfg.sana
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    return dict(
        hidden=jax.random.normal(ks[0], (b, bb.in_channels, hw, hw)),
        condition=jax.random.normal(ks[1], (b, bb.in_channels, hw, hw)),
        encoder=jax.random.normal(ks[2], (b, t, bb.caption_channels)),
        pooled=jax.random.normal(ks[3], (b, bb.pooled_projection_dim)),
        condition_pooled=jax.random.normal(ks[4], (b, bb.pooled_projection_dim)),
        timestep=jnp.full((b,), 500.0),
    )


def test_sana_backbone_shapes(sana_cfg):
    from unigen_tpu.models.sana import init_sana_params, sana_forward
    bb = sana_cfg.sana
    params = init_sana_params(jax.random.PRNGKey(0), bb)
    batch = _sana_batch(sana_cfg)
    out = sana_forward(params, bb, batch["hidden"], batch["encoder"],
                       batch["timestep"])
    assert out.shape == (2, bb.out_channels, 8, 8)
    assert jnp.isfinite(out).all()


def test_sana_encoder_mask(sana_cfg):
    from unigen_tpu.models.sana import init_sana_params, sana_forward
    bb = sana_cfg.sana
    params = init_sana_params(jax.random.PRNGKey(0), bb)
    batch = _sana_batch(sana_cfg)
    mask = jnp.array([[1, 1, 1, 0, 0]] * 2, bool)
    out1 = sana_forward(params, bb, batch["hidden"], batch["encoder"],
                        batch["timestep"], encoder_mask=mask)
    enc2 = batch["encoder"].at[:, 4].set(99.0)
    out2 = sana_forward(params, bb, batch["hidden"], enc2,
                        batch["timestep"], encoder_mask=mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-4, atol=1e-5)  # masked token ignored


def test_sana_unigen_zero_init(sana_cfg):
    from unigen_tpu.models.sana import (init_sana_unigen_params, sana_forward,
                                        sana_unigen_forward)
    params = init_sana_unigen_params(jax.random.PRNGKey(0), sana_cfg)
    batch = _sana_batch(sana_cfg, key=1)
    pred, losses, outs = sana_unigen_forward(params, sana_cfg, **batch)
    base = sana_forward(params["base"], sana_cfg.sana, batch["hidden"],
                        batch["encoder"], batch["timestep"])
    np.testing.assert_allclose(np.asarray(pred), np.asarray(base),
                               rtol=1e-4, atol=1e-5)
    assert jnp.isfinite(losses["moe_loss"])


def test_sana_linear_attention_matches_quadratic():
    """ReLU linear attention == explicit quadratic form (no softmax)."""
    from unigen_tpu.layers.blocks_sana import (init_linear_attention,
                                               linear_attention)
    p = init_linear_attention(jax.random.PRNGKey(0), 16, 2, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16))
    got = linear_attention(p, x, heads=2)

    from unigen_tpu.layers.core import linear as lin
    from unigen_tpu.ops.attention import merge_heads, split_heads
    q = jax.nn.relu(split_heads(lin(p["to_q"], x), 2))
    k = jax.nn.relu(split_heads(lin(p["to_k"], x), 2))
    v = split_heads(lin(p["to_v"], x), 2)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    out = jnp.einsum("bhqk,bhke->bhqe", scores, v) / (
        scores.sum(-1, keepdims=True) + 1e-15)
    expect = lin(p["to_out"], merge_heads(out))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-4, atol=1e-5)


def test_unigen_base_crossattn_variant():
    cfg = cfg_lib.UniGenConfig(
        family="sd3", sd3=cfg_lib.tiny_sd3_config(),
        control=cfg_lib.ControlConfig(use_rope=False, cn2base_method="CrossAttn"),
        condition_types=("depth",))
    from unigen_tpu.models.unigen_sd3 import (init_unigen_sd3_params,
                                              unigen_base_forward)
    params = init_unigen_sd3_params(jax.random.PRNGKey(4), cfg,
                                    base_variant=True)
    batch = _sd3_batch(cfg, key=5)
    pred, losses, _ = unigen_base_forward(params, cfg, **batch)
    assert pred.shape == batch["hidden"].shape
    assert jnp.isfinite(pred).all()


def test_unigen_sd3_partial_depth_control():
    """control.num_layers < base depth -> control blocks reused across base
    blocks via int(i/(n/cn)) (reference UniGenBase control_blocks_num)."""
    cfg = cfg_lib.UniGenConfig(
        family="sd3", sd3=cfg_lib.tiny_sd3_config(),
        control=cfg_lib.ControlConfig(use_rope=False, num_layers=2),
        condition_types=("depth",))
    from unigen_tpu.models.unigen_sd3 import (init_unigen_sd3_params,
                                              unigen_sd3_forward)
    params = init_unigen_sd3_params(jax.random.PRNGKey(6), cfg)
    assert params["control"]["add_blocks"]["w"].shape[0] == 2
    batch = _sd3_batch(cfg, key=7)
    pred, losses, _ = unigen_sd3_forward(params, cfg, **batch)
    assert pred.shape == batch["hidden"].shape
    assert jnp.isfinite(pred).all() and jnp.isfinite(losses["moe_loss"])
