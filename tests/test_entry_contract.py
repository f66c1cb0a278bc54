"""Driver-contract guards: entry() compiles and runs; pipeline true-CFG and
subject-offset paths."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu import config as cfg_lib
from unigen_tpu.models import vae as vae_lib


def test_entry_compiles_tiny():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # use the internal example builder against the tiny preset for speed
    from unigen_tpu import presets
    from unigen_tpu.models.unigen_flux import (init_unigen_flux_params,
                                               unigen_flux_forward)
    cfg = presets.tiny()
    params = init_unigen_flux_params(jax.random.PRNGKey(0), cfg)
    batch = mod._example_inputs(cfg, b=1, hw=4, t=6, dtype=jnp.float32)
    pred, losses, _ = jax.jit(
        lambda p, b: unigen_flux_forward(p, cfg, **b))(params, batch)
    assert pred.shape == batch["hidden"].shape
    assert jnp.isfinite(losses["moe_loss"])


def test_pipeline_true_cfg_and_subject_offset():
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.pipelines.flux import UniGenFluxPipeline

    flux = cfg_lib.tiny_flux_config()
    cfg = cfg_lib.UniGenConfig(family="flux", flux=flux,
                               condition_types=("subject",))
    params = init_unigen_flux_params(jax.random.PRNGKey(0), cfg)
    # make the zero-init control gates live so condition-side changes are
    # visible in the output (random, not constant — LN kills constants)
    params["control"]["add_double"]["w"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(9), params["control"]["add_double"]["w"].shape)
    vae_cfg = vae_lib.tiny_vae_config(latent_channels=flux.in_channels // 4)
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), vae_cfg)
    pipe = UniGenFluxPipeline(cfg=cfg, params=params, vae_cfg=vae_cfg,
                              vae_params=vae_params, dtype=jnp.float32)
    b, h, w = 1, 16, 16
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    common = dict(
        pooled=jax.random.normal(ks[1], (b, flux.pooled_projection_dim)),
        cond_pooled=jax.random.normal(ks[2], (b, flux.pooled_projection_dim)),
        control_pixels=jax.random.normal(ks[3], (b, 3, h, w)),
        height=h, width=w, num_inference_steps=2)
    embeds = jax.random.normal(ks[0], (b, 8, flux.joint_attention_dim))
    neg = jax.random.normal(ks[4], (b, 8, flux.joint_attention_dim))
    neg_pool = jax.random.normal(ks[5], (b, flux.pooled_projection_dim))

    img_cfg = pipe.generate(prompt_embeds=embeds, true_cfg_scale=2.0,
                            neg_embeds=neg, neg_pooled=neg_pool, **common)
    img_plain = pipe.generate(prompt_embeds=embeds, **common)
    assert img_cfg.shape == (b, h, w, 3)
    assert not np.array_equal(img_cfg, img_plain)  # CFG changes the output

    img_subj = pipe.generate(prompt_embeds=embeds, subject_offset=True, **common)
    assert not np.array_equal(img_subj, img_plain)  # id offset changes output


def test_conditioning_window_schedule():
    """control_guidance start/end -> per-step scale vector."""
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.pipelines.flux import UniGenFluxPipeline
    import numpy as np
    steps = 4
    keep = [1.0 - float((i / steps < 0.25) or ((i + 1) / steps > 0.75))
            for i in range(steps)]
    assert keep == [0.0, 1.0, 1.0, 0.0]
