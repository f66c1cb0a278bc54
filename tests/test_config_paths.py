"""Coverage for non-default control-config paths: consis module, block
(non-modulated) experts, single_add merge, pooled-prompt gating, remat."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu import config as cfg_lib
from unigen_tpu.models.unigen_flux import (init_unigen_flux_params,
                                           unigen_flux_forward)
from unigen_tpu.ops.packing import prepare_latent_image_ids


def _batch(cfg, b=1, hw=4, t=6, key=7):
    ks = jax.random.split(jax.random.PRNGKey(key), 6)
    bb = cfg.flux
    s = hw * hw
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


def _run(control_kw, key=0):
    flux = cfg_lib.tiny_flux_config()
    cfg = cfg_lib.UniGenConfig(family="flux", flux=flux,
                               control=cfg_lib.ControlConfig(**control_kw),
                               condition_types=("canny",))
    params = init_unigen_flux_params(jax.random.PRNGKey(key), cfg)
    batch = _batch(cfg)
    pred, losses, outs = unigen_flux_forward(params, cfg, **batch)
    assert pred.shape == batch["hidden"].shape
    assert jnp.isfinite(pred).all() and jnp.isfinite(losses["moe_loss"])
    return params, cfg, batch, pred


def test_consis_module_path():
    params, cfg, _, _ = _run(dict(use_consis_module=True))
    assert "consis" in params["control"]
    assert "block0" in params["control"]["consis"]


def test_block_experts_path():
    """use_rope=False + use_modulate=False -> per-expert single transformer
    blocks with token-wise temb (executable here, unlike the reference's
    shape-broken published path — SURVEY.md §2.7)."""
    params, cfg, _, _ = _run(dict(use_rope=False, use_modulate=False))
    assert "hid_block" in params["control"]["moe"]["experts"]


def test_single_add_merge():
    _, _, _, p_overall = _run(dict(single_block_control_method="overall_add"),
                              key=3)
    _, _, _, p_single = _run(dict(single_block_control_method="single_add"),
                             key=3)
    # zero-init adds -> both match base; just assert both paths execute and
    # produce identical results at init (the merge only differs when gates
    # are non-zero)
    np.testing.assert_allclose(np.asarray(p_overall), np.asarray(p_single),
                               rtol=1e-5, atol=1e-6)


def test_single_add_differs_when_gates_live():
    flux = cfg_lib.tiny_flux_config()
    outs = {}
    for method in ("overall_add", "single_add"):
        cfg = cfg_lib.UniGenConfig(
            family="flux", flux=flux,
            control=cfg_lib.ControlConfig(single_block_control_method=method),
            condition_types=("canny",))
        params = init_unigen_flux_params(jax.random.PRNGKey(1), cfg)
        params["control"]["add_single"]["w"] = 0.05 * jax.random.normal(
            jax.random.PRNGKey(5), params["control"]["add_single"]["w"].shape)
        batch = _batch(cfg)
        outs[method], _, _ = unigen_flux_forward(params, cfg, **batch)
    assert not np.allclose(np.asarray(outs["overall_add"]),
                           np.asarray(outs["single_add"]), atol=1e-6)


def test_no_pooled_prompt_embeds():
    _run(dict(use_pooled_prompt_embeds=False))


def test_no_shared_expert_and_no_single_blocks():
    params, _, _, _ = _run(dict(use_shared_expert=False,
                                use_single_trans_blocks=False))
    assert "shared_expert" not in params["control"]
    assert "single_blocks" not in params["control"]


def test_remat_forward_matches():
    flux = cfg_lib.tiny_flux_config()
    cfg = cfg_lib.UniGenConfig(family="flux", flux=flux, condition_types=("canny",))
    params = init_unigen_flux_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    a, _, _ = unigen_flux_forward(params, cfg, **batch, remat=False)
    b_, _, _ = unigen_flux_forward(params, cfg, **batch, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-5,
                               atol=1e-6)


def test_expert_num_override_and_top2():
    _run(dict(moe=cfg_lib.MoEConfig(expert_num=5)))
    # top-2 routing wires through the gate module directly
    from unigen_tpu.ops import gating
    logits = jax.random.normal(jax.random.PRNGKey(0), (20, 5))
    out = gating.top2_gate(logits, capacity=20)
    assert out.combine_weights.shape == (20, 5, 20)
