"""SANA pipeline smoke: full e2e program (AE encode -> MoE+control denoise
scan -> AE decode) on tiny configs, plus Gemma-driven text path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unigen_tpu import config as cfg_lib
from unigen_tpu.models import vae as vae_lib
from unigen_tpu.models.gemma_text import gemma_encode, tiny_gemma_config
from unigen_tpu.models.sana import init_sana_unigen_params
from unigen_tpu.pipelines.sana import UniGenSanaPipeline


def _tiny_gemma_params(cfg, key):
    """Random Gemma tree with the bridge's layout (no torch needed)."""
    ks = iter(jax.random.split(key, 64))

    def lin(i, o):
        return {"w": jax.random.normal(next(ks), (i, o)) * 0.05}

    d, hd = cfg.hidden_size, cfg.head_dim

    def layer():
        return {
            "input_ln": {"scale": jnp.zeros((d,))},
            "post_attn_ln": {"scale": jnp.zeros((d,))},
            "pre_ff_ln": {"scale": jnp.zeros((d,))},
            "post_ff_ln": {"scale": jnp.zeros((d,))},
            "attn": {"q": lin(d, cfg.num_heads * hd),
                     "k": lin(d, cfg.num_kv_heads * hd),
                     "v": lin(d, cfg.num_kv_heads * hd),
                     "o": lin(cfg.num_heads * hd, d)},
            "gate": lin(d, cfg.intermediate_size),
            "up": lin(d, cfg.intermediate_size),
            "down": lin(cfg.intermediate_size, d),
        }

    return {"embed": jax.random.normal(next(ks), (cfg.vocab_size, d)) * 0.02,
            "layers": [layer() for _ in range(cfg.num_layers)],
            "final_ln": {"scale": jnp.zeros((d,))}}


def test_sana_pipeline_end_to_end_tiny():
    sana = cfg_lib.tiny_sana_config(caption_channels=32)
    ucfg = cfg_lib.UniGenConfig(family="sana", sana=sana,
                                condition_types=("canny",))
    params = init_sana_unigen_params(jax.random.PRNGKey(0), ucfg)

    vae_cfg = vae_lib.tiny_vae_config(latent_channels=sana.in_channels)
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), vae_cfg)
    gcfg = tiny_gemma_config(hidden_size=32, num_heads=4, num_kv_heads=2,
                             head_dim=8)
    gparams = _tiny_gemma_params(gcfg, jax.random.PRNGKey(2))

    pipe = UniGenSanaPipeline(
        cfg=ucfg, params=params,
        ae_encode=lambda px: vae_lib.vae_encode(vae_params, vae_cfg, px),
        ae_decode=lambda lat: vae_lib.vae_decode(vae_params, vae_cfg, lat),
        ae_downscale=vae_cfg.downscale,
        gemma_cfg=gcfg, gemma_params=gparams)

    b, res = 1, 4 * vae_cfg.downscale
    ids = jnp.asarray(np.arange(6)[None] + 2)
    embeds = gemma_encode(gparams, gcfg, ids)
    assert embeds.shape == (1, 6, 32)

    imgs = pipe.generate(
        prompt_embeds=embeds.astype(jnp.float32),
        prompt_mask=jnp.ones((b, 6), jnp.int32),
        pooled=jnp.zeros((b, sana.pooled_projection_dim)),
        cond_pooled=jnp.zeros((b, sana.pooled_projection_dim)),
        control_pixels=np.random.default_rng(0).standard_normal(
            (b, 3, res, res)).astype(np.float32) * 0.1,
        height=res, width=res, num_inference_steps=2, seed=0)
    assert imgs.shape == (b, res, res, 3) and imgs.dtype == np.uint8
    # keep-window schedule caches a second program without error
    imgs2 = pipe.generate(
        prompt_embeds=embeds.astype(jnp.float32),
        prompt_mask=jnp.ones((b, 6), jnp.int32),
        pooled=jnp.zeros((b, sana.pooled_projection_dim)),
        cond_pooled=jnp.zeros((b, sana.pooled_projection_dim)),
        control_pixels=np.zeros((b, 3, res, res), np.float32),
        height=res, width=res, num_inference_steps=2,
        control_guidance_end=0.5, seed=1)
    assert imgs2.shape == (b, res, res, 3)
