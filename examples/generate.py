#!/usr/bin/env python
"""Minimal end-to-end example: controllable generation with UniGenFlux.

With a real checkpoint directory, pass --ckpt; without one this demo builds a
randomly-initialised tiny model so the full pipeline (condition image ->
VAE encode -> condition-weaving denoise -> VAE decode) runs anywhere.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from unigen_tpu.utils import apply_env_platform
    apply_env_platform()
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None, help="diffusers-layout FLUX dir")
    p.add_argument("--family", default="flux", choices=["flux", "sana"],
                   help="model family for the random tiny demo")
    p.add_argument("--prompt", default="a cat wearing a hat")
    p.add_argument("--condition", default="canny")
    p.add_argument("--image", default=None, help="control image path")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--out", default="out.png")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from unigen_tpu.data import conditions as C

    if args.ckpt:
        from unigen_tpu.pipelines.loading import load_flux_pipeline
        pipe = load_flux_pipeline(args.ckpt, condition_types=[args.condition])
        img = np.asarray(Image.open(args.image).convert("RGB").resize((512, 512)))
        control = C.synthesize(args.condition, img)
        imgs = pipe(prompt=args.prompt, condition_prompt=args.condition,
                    control_image=C.to_model_range(control)[None],
                    num_inference_steps=args.steps)
    elif args.family == "sana":
        print("no --ckpt given: running the random tiny SANA demo")
        from unigen_tpu import config as cfg_lib
        from unigen_tpu.models import vae as vae_lib
        from unigen_tpu.models.sana import init_sana_unigen_params
        from unigen_tpu.pipelines.sana import UniGenSanaPipeline

        sana = cfg_lib.tiny_sana_config()
        ucfg = cfg_lib.UniGenConfig(family="sana", sana=sana,
                                    condition_types=(args.condition,))
        params = init_sana_unigen_params(jax.random.PRNGKey(0), ucfg)
        vae_cfg = vae_lib.tiny_vae_config(latent_channels=sana.in_channels)
        vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), vae_cfg)
        pipe = UniGenSanaPipeline(
            cfg=ucfg, params=params,
            ae_encode=lambda px: vae_lib.vae_encode(vae_params, vae_cfg, px),
            ae_decode=lambda lat: vae_lib.vae_decode(vae_params, vae_cfg, lat),
            ae_downscale=vae_cfg.downscale)
        res = 8 * vae_cfg.downscale
        ks = jax.random.split(jax.random.PRNGKey(2), 2)
        imgs = pipe.generate(
            prompt_embeds=jax.random.normal(ks[0], (1, 8, sana.caption_channels)),
            prompt_mask=jnp.ones((1, 8), jnp.int32),
            pooled=jax.random.normal(ks[1], (1, sana.pooled_projection_dim)),
            cond_pooled=jnp.zeros((1, sana.pooled_projection_dim)),
            control_pixels=np.zeros((1, 3, res, res), np.float32),
            height=res, width=res, num_inference_steps=args.steps)
    else:
        print("no --ckpt given: running the random tiny demo model")
        from unigen_tpu import config as cfg_lib, presets
        from unigen_tpu.models import vae as vae_lib
        from unigen_tpu.models.unigen_flux import init_unigen_flux_params
        from unigen_tpu.pipelines.flux import UniGenFluxPipeline

        cfg = presets.tiny((args.condition,))
        params = init_unigen_flux_params(jax.random.PRNGKey(0), cfg)
        vae_cfg = vae_lib.tiny_vae_config(latent_channels=cfg.flux.in_channels // 4)
        vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), vae_cfg)
        pipe = UniGenFluxPipeline(cfg=cfg, params=params, vae_cfg=vae_cfg,
                                  vae_params=vae_params, dtype=jnp.float32)
        h = w = 32
        rng = np.random.default_rng(0)
        control_u8 = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        control = C.to_model_range(C.synthesize("canny", control_u8))[None]
        ks = jax.random.split(jax.random.PRNGKey(2), 3)
        imgs = pipe.generate(
            prompt_embeds=jax.random.normal(ks[0], (1, 8, cfg.flux.joint_attention_dim)),
            pooled=jax.random.normal(ks[1], (1, cfg.flux.pooled_projection_dim)),
            cond_pooled=jax.random.normal(ks[2], (1, cfg.flux.pooled_projection_dim)),
            control_pixels=jnp.asarray(control, jnp.float32),
            height=h, width=w, num_inference_steps=args.steps)

    Image.fromarray(imgs[0]).save(args.out)
    print(f"wrote {args.out} ({imgs[0].shape})")


if __name__ == "__main__":
    main()
