"""Tests: flow-match scheduler, VAE, CLIP/T5 encoders, end-to-end pipeline on
tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu import config as cfg_lib
from unigen_tpu.models import vae as vae_lib
from unigen_tpu.models.clip_text import clip_encode, init_clip_params, tiny_clip_config
from unigen_tpu.models.t5_text import (init_t5_params, relative_position_buckets,
                                       t5_encode, tiny_t5_config)
from unigen_tpu.pipelines import scheduling


# ------------------------------------------------------------ scheduler

def test_inference_sigmas_static_shift():
    cfg = scheduling.FlowMatchConfig(shift=3.0)
    sigmas, timesteps = scheduling.inference_sigmas(cfg, 4)
    raw = np.linspace(1.0, 0.25, 4)
    expect = 3 * raw / (1 + 2 * raw)
    np.testing.assert_allclose(sigmas[:4], expect, rtol=1e-6)
    assert sigmas[-1] == 0.0
    np.testing.assert_allclose(timesteps, expect * 1000, rtol=1e-6)
    assert float(sigmas[0]) == pytest.approx(1.0)  # shift fixes sigma(1) = 1


def test_inference_sigmas_dynamic_shift():
    cfg = scheduling.FlowMatchConfig(use_dynamic_shifting=True)
    mu = scheduling.calculate_shift(1024, cfg)
    assert 0.5 < mu < 1.15
    sigmas, _ = scheduling.inference_sigmas(cfg, 4, image_seq_len=1024)
    raw = np.linspace(1.0, 0.25, 4)
    expect = np.exp(mu) / (np.exp(mu) + (1 / raw - 1))
    np.testing.assert_allclose(sigmas[:4], expect, rtol=1e-6)


def test_euler_step_linear_flow():
    # with v = (noise - x0) constant, stepping sigma 1 -> 0 recovers x0
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4)))
    noise = jnp.asarray(np.random.default_rng(1).normal(size=(1, 4)))
    xt = scheduling.scale_noise(x0, noise, jnp.array([1.0]))  # == noise
    v = noise - x0
    out = scheduling.euler_step(xt, v, jnp.asarray(1.0), jnp.asarray(0.0))
    np.testing.assert_allclose(out, x0, rtol=1e-5, atol=1e-6)


def test_timestep_density_and_weighting():
    u = scheduling.sample_timestep_density(jax.random.PRNGKey(0), 64, "logit_normal")
    assert ((u > 0) & (u < 1)).all()
    w = scheduling.loss_weighting(jnp.array([0.5]), "cosmap")
    np.testing.assert_allclose(w, 2 / (np.pi * 0.5), rtol=1e-6)
    assert scheduling.loss_weighting(jnp.array([0.5]), "none")[0] == 1.0


# ------------------------------------------------------------ VAE

@pytest.fixture(scope="module")
def tiny_vae():
    cfg = vae_lib.tiny_vae_config()
    params = vae_lib.init_vae_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_vae_shapes_roundtrip(tiny_vae):
    cfg, params = tiny_vae
    px = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 16))
    lat = vae_lib.vae_encode(params, cfg, px)
    assert lat.shape == (2, cfg.latent_channels, 8, 8)  # 2 blocks -> /2
    out = vae_lib.vae_decode(params, cfg, lat)
    assert out.shape == px.shape
    assert jnp.isfinite(out).all()


def test_vae_encode_deterministic_vs_sampled(tiny_vae):
    cfg, params = tiny_vae
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 16, 16))
    a = vae_lib.vae_encode(params, cfg, px)
    b = vae_lib.vae_encode(params, cfg, px)
    np.testing.assert_array_equal(a, b)
    c = vae_lib.vae_encode(params, cfg, px, sample_rng=jax.random.PRNGKey(3))
    assert not np.allclose(a, c)


# ------------------------------------------------------------ text encoders

def test_clip_pooled_at_eos():
    cfg = tiny_clip_config()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.array([[5, 6, 7, cfg.eos_token_id, 0, 0]])
    last, penult, pooled = clip_encode(params, cfg, ids)
    assert last.shape == (1, 6, cfg.hidden_size)
    np.testing.assert_allclose(pooled[0], last[0, 3], rtol=1e-6)


def test_clip_causal_mask():
    """Changing a later token must not affect earlier positions' hidden."""
    cfg = tiny_clip_config()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    ids1 = jnp.array([[5, 6, 7, 8, 9, cfg.eos_token_id]])
    ids2 = jnp.array([[5, 6, 7, 8, 10, cfg.eos_token_id]])
    l1, _, _ = clip_encode(params, cfg, ids1)
    l2, _, _ = clip_encode(params, cfg, ids2)
    np.testing.assert_allclose(l1[0, :4], l2[0, :4], atol=1e-5)
    assert not np.allclose(l1[0, 4], l2[0, 4])


def test_t5_relative_buckets_properties():
    b = relative_position_buckets(8, 8, 32, 128)
    assert b.shape == (8, 8)
    assert b[0, 0] == 0
    assert (b[0, 1:] >= 16).all()   # future positions use the upper half
    assert (b[1:, 0] < 16).all()    # past positions lower half
    assert b.max() < 32


def test_t5_encode_shapes_and_mask():
    cfg = tiny_t5_config()
    params = init_t5_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.array([[4, 5, 6, 1, 0, 0]])
    mask = jnp.array([[1, 1, 1, 1, 0, 0]])
    out = t5_encode(params, cfg, ids, mask)
    assert out.shape == (1, 6, cfg.d_model)
    assert jnp.isfinite(out).all()
    # masked positions must not influence unmasked outputs
    ids2 = ids.at[0, 5].set(99)
    out2 = t5_encode(params, cfg, ids2, mask)
    np.testing.assert_allclose(out[0, :4], out2[0, :4], atol=1e-5)


# ------------------------------------------------------------ pipeline e2e

def test_pipeline_generate_tiny():
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.pipelines.flux import UniGenFluxPipeline

    flux = cfg_lib.tiny_flux_config()
    cfg = cfg_lib.UniGenConfig(family="flux", flux=flux, condition_types=("canny",))
    params = init_unigen_flux_params(jax.random.PRNGKey(0), cfg)
    vae_cfg = vae_lib.tiny_vae_config(latent_channels=flux.in_channels // 4)
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), vae_cfg)
    pipe = UniGenFluxPipeline(cfg=cfg, params=params, vae_cfg=vae_cfg,
                              vae_params=vae_params, dtype=jnp.float32)
    b, h, w = 1, 16, 16
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    imgs = pipe.generate(
        prompt_embeds=jax.random.normal(ks[0], (b, 8, flux.joint_attention_dim)),
        pooled=jax.random.normal(ks[1], (b, flux.pooled_projection_dim)),
        cond_pooled=jax.random.normal(ks[2], (b, flux.pooled_projection_dim)),
        control_pixels=jax.random.normal(ks[3], (b, 3, h, w)),
        height=h, width=w, num_inference_steps=2)
    assert imgs.shape == (b, h, w, 3) and imgs.dtype == np.uint8


def test_pipeline_multi_condition_generate_tiny():
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.pipelines.flux import UniGenFluxPipeline

    flux = cfg_lib.tiny_flux_config()
    cfg = cfg_lib.UniGenConfig(family="flux", flux=flux,
                               condition_types=("canny", "depth"))
    params = init_unigen_flux_params(jax.random.PRNGKey(0), cfg)
    vae_cfg = vae_lib.tiny_vae_config(latent_channels=flux.in_channels // 4)
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), vae_cfg)
    pipe = UniGenFluxPipeline(cfg=cfg, params=params, vae_cfg=vae_cfg,
                              vae_params=vae_params, dtype=jnp.float32)
    b, h, w, k = 1, 16, 16, 2
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    imgs = pipe.generate(
        prompt_embeds=jax.random.normal(ks[0], (b, 8, flux.joint_attention_dim)),
        pooled=jax.random.normal(ks[1], (b, flux.pooled_projection_dim)),
        cond_pooled=jax.random.normal(ks[2], (k, b, flux.pooled_projection_dim)),
        control_pixels=jax.random.normal(ks[3], (k, b, 3, h, w)),
        height=h, width=w, num_inference_steps=2)
    assert imgs.shape == (b, h, w, 3)
