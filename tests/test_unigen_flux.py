"""UniGenFlux model tests on a tiny config: shapes, the ControlNet zero-init
invariant (adapter contributes nothing at init), multi-condition mode, and
jit-compilability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu import config as cfg_lib
from unigen_tpu.models.flux import flux_forward, init_flux_params
from unigen_tpu.models.unigen_flux import (control_block_index_table,
                                           init_unigen_flux_params,
                                           unigen_flux_forward)
from unigen_tpu.ops.packing import prepare_latent_image_ids


@pytest.fixture(scope="module")
def tiny():
    flux = cfg_lib.tiny_flux_config()
    cfg = cfg_lib.UniGenConfig(family="flux", flux=flux,
                               condition_types=("canny",))
    params = init_unigen_flux_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _batch(cfg, b=2, hw=4, t=6, key=7):
    ks = jax.random.split(jax.random.PRNGKey(key), 6)
    s = hw * hw
    bb = cfg.flux
    return dict(
        hidden=jax.random.normal(ks[0], (b, s, bb.in_channels)),
        condition=jax.random.normal(ks[1], (b, s, bb.in_channels)),
        encoder=jax.random.normal(ks[2], (b, t, bb.joint_attention_dim)),
        pooled=jax.random.normal(ks[3], (b, bb.pooled_projection_dim)),
        condition_pooled=jax.random.normal(ks[4], (b, bb.pooled_projection_dim)),
        timestep=jnp.full((b,), 0.5),
        img_ids=prepare_latent_image_ids(hw, hw),
        txt_ids=jnp.zeros((t, 3)),
        condition_ids=prepare_latent_image_ids(hw, hw),
    )


def test_control_index_table_matches_reference_formula():
    # 19 base double blocks -> 9 control blocks
    table = control_block_index_table(19, 9)
    expect = [int(i / (19 / 9)) for i in range(19)]
    assert table == expect
    assert table[0] == 0 and table[-1] == 8
    assert control_block_index_table(38, 19) == [i // 2 for i in range(38)]


def test_forward_shapes_and_outputs(tiny):
    cfg, params = tiny
    batch = _batch(cfg)
    pred, losses, outs = unigen_flux_forward(params, cfg, **batch)
    assert pred.shape == batch["hidden"].shape
    assert jnp.isfinite(losses["moe_loss"]) and losses["moe_loss"].shape == ()
    e = cfg.control.moe.num_experts(cfg.condition_nums)
    assert outs["expert_counts"].shape == (e,)
    assert int(outs["expert_counts"].sum()) == 2 * 16  # every token routed


def test_zero_init_adapter_matches_base(tiny):
    """At init the add-linears are zero, so UniGenFlux == plain Flux forward
    (the ControlNet gating property, reference UniGenUtils.py:194-197)."""
    cfg, params = tiny
    batch = _batch(cfg)
    pred, _, _ = unigen_flux_forward(params, cfg, **batch)
    base_pred = flux_forward(params["base"], cfg.flux, batch["hidden"],
                             batch["encoder"], batch["pooled"],
                             batch["timestep"], batch["img_ids"],
                             batch["txt_ids"])
    np.testing.assert_allclose(np.asarray(pred), np.asarray(base_pred),
                               rtol=1e-4, atol=1e-5)


def test_conditioning_scale_changes_output_after_perturbing_adds(tiny):
    cfg, params = tiny
    # make the zero-init adds non-zero so the control path is live (random
    # perturbation — a constant matrix would be annihilated by LayerNorm)
    params = jax.tree.map(lambda x: x, params)
    params["control"]["add_double"]["w"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(11), params["control"]["add_double"]["w"].shape)
    params["control"]["add_single"]["w"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(12), params["control"]["add_single"]["w"].shape)
    batch = _batch(cfg)
    p1, _, _ = unigen_flux_forward(params, cfg, **batch, conditioning_scale=1.0)
    p0, _, _ = unigen_flux_forward(params, cfg, **batch, conditioning_scale=0.0)
    base_pred = flux_forward(params["base"], cfg.flux, batch["hidden"],
                             batch["encoder"], batch["pooled"],
                             batch["timestep"], batch["img_ids"], batch["txt_ids"])
    assert not np.allclose(np.asarray(p1), np.asarray(base_pred), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(base_pred),
                               rtol=1e-4, atol=1e-5)


def test_multi_condition_forward(tiny):
    cfg, params = tiny
    batch = _batch(cfg)
    k = 2
    batch["condition"] = jnp.stack([batch["condition"]] * k)
    batch["condition_pooled"] = jnp.stack([batch["condition_pooled"]] * k)
    batch["condition_ids"] = jnp.stack([batch["condition_ids"]] * k)
    pred, losses, _ = unigen_flux_forward(params, cfg, **batch)
    assert pred.shape == batch["hidden"].shape
    assert jnp.isfinite(pred).all()


def test_jit_and_guidance_variant():
    flux = cfg_lib.tiny_flux_config(guidance_embeds=True)
    cfg = cfg_lib.UniGenConfig(family="flux", flux=flux)
    params = init_unigen_flux_params(jax.random.PRNGKey(1), cfg)
    batch = _batch(cfg)
    batch["guidance"] = jnp.full((2,), 3.5)

    @jax.jit
    def fwd(params, batch):
        return unigen_flux_forward(params, cfg, **batch)[0]

    pred = fwd(params, batch)
    assert pred.shape == batch["hidden"].shape
    assert jnp.isfinite(pred).all()


def test_warm_start_copies_base_blocks(tiny):
    cfg, params = tiny
    n_cn = cfg.flux.num_layers // cfg.control.single_control_dev
    base_w = params["base"]["double_blocks"]["attn"]["to_q"]["w"]
    ctrl_w = params["control"]["double_blocks"]["attn"]["to_q"]["w"]
    np.testing.assert_array_equal(np.asarray(ctrl_w), np.asarray(base_w[:n_cn]))
    np.testing.assert_array_equal(
        np.asarray(params["control"]["x_embedder"]["w"]),
        np.asarray(params["base"]["x_embedder"]["w"]))


def test_bf16_forward_with_f32_scale_schedule():
    """A strongly-typed f32 conditioning_scale (e.g. an element of the
    pipeline's controlnet_keep schedule array) must not promote the bf16
    activation stream — this previously broke every bf16 pipeline __call__
    with a scan-carry dtype mismatch (the CLI path; tests ran fp32)."""
    flux = cfg_lib.tiny_flux_config()
    cfg = cfg_lib.UniGenConfig(family="flux", flux=flux,
                               condition_types=("canny",))
    params = init_unigen_flux_params(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16)
    batch = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        _batch(cfg, b=1))
    batch["img_ids"] = batch["img_ids"].astype(jnp.float32)
    batch["txt_ids"] = batch["txt_ids"].astype(jnp.float32)
    batch["condition_ids"] = batch["condition_ids"].astype(jnp.float32)
    schedule = jnp.ones((4,), jnp.float32)       # strong f32 scalar element
    pred, _, _ = unigen_flux_forward(params, cfg, **batch,
                                     conditioning_scale=schedule[0])
    assert pred.dtype == jnp.bfloat16
    assert jnp.isfinite(pred.astype(jnp.float32)).all()
