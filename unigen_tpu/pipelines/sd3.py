"""UniGenSD3Pipeline — SD3.5 controllable inference (reference
src/UniGenPipeline.py:29-450) as one jit program per call shape.

SD3 differences from the Flux pipeline: classifier-free guidance by
negative/positive batch duplication (reference :286-290), dynamic-shift
timesteps from the scheduler config (:325-346), conditioning-scale start/end
windows (``controlnet_keep``, :366-372), unpacked [B,C,H,W] latents, and the
condition-prompt pooled embedding from the CLIP stack (:34-105).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unigen_tpu.config import UniGenConfig
from unigen_tpu.models import vae as vae_lib
from unigen_tpu.models.unigen_sd3 import unigen_sd3_forward
from unigen_tpu.ops import quant as quant_lib
from unigen_tpu.pipelines import caching, scheduling


@dataclass
class UniGenSD3Pipeline:
    cfg: UniGenConfig
    params: Dict[str, Any]
    vae_cfg: vae_lib.VAEConfig = field(default_factory=lambda: vae_lib.VAEConfig(
        scaling_factor=1.5305, shift_factor=0.0609))
    vae_params: Optional[dict] = None
    scheduler: scheduling.FlowMatchConfig = field(
        default_factory=lambda: scheduling.FlowMatchConfig(shift=3.0))
    text_encoders: Any = None          # optional dict, see encode_prompt
    dtype: Any = jnp.float32
    prompt_cache_size: int = 0         # >0: LRU prompt-embedding cache
                                       # (caching.PromptLRU)
    mesh: Any = None                   # set via shard(): multi-chip serving

    def __post_init__(self):
        self._program_cache: Dict[Any, Any] = {}
        self._prompt_cache = caching.PromptLRU(self.prompt_cache_size)

    # ------------------------------------------------------------ multi-chip

    def shard(self, mesh) -> None:
        """Place the serving tree on a device mesh (same contract as
        UniGenFluxPipeline.shard): params follow parallel/sharding.py rules
        (quantized leaves included), the VAE replicates, and generate()
        shards its batch inputs over 'data'."""
        from unigen_tpu.parallel import sharding as shd
        self.mesh = mesh
        self.params = shd.shard_params(self.params, mesh)
        if self.vae_params is not None:
            self.vae_params = jax.tree.map(
                lambda x: shd.place_global(x, shd.replicated(mesh)),
                self.vae_params)

    def _place_inputs(self, tree):
        if self.mesh is None:
            return tree
        from unigen_tpu.parallel import sharding as shd
        d = self.mesh.shape.get("data", 1)

        def _place(x):
            if not hasattr(x, "ndim"):
                return x
            if x.ndim >= 1 and d > 1 and x.shape[0] % d == 0:
                spec = [None] * x.ndim
                spec[0] = "data"
                return shd.place_global(
                    x, jax.sharding.NamedSharding(
                        self.mesh, jax.sharding.PartitionSpec(*spec)))
            return shd.place_global(x, shd.replicated(self.mesh))

        return jax.tree.map(_place, tree)

    # ------------------------------------------------------------ text
    # text_encoders bundle layout:
    #   {"clip_l": (params, cfg, tokenizer), "clip_g": (params, cfg, tokenizer),
    #    "t5": (params, cfg, tokenizer) or None}

    def encode_prompt(self, prompt, max_sequence_length: int = 256):
        """(context_embeds, pooled) via CLIP-L + CLIP-G (+T5) — the triple
        encoder stack (reference UniGenPipeline.py:34-105)."""
        assert self.text_encoders, "text encoders not loaded; pass embeds"
        from unigen_tpu.models.text_encoder import sd3_encode_prompt
        te = self.text_encoders
        clip_l, clip_l_cfg, tok_l = te["clip_l"]
        clip_g, clip_g_cfg, tok_g = te["clip_g"]
        t5 = te.get("t5")
        t5_params, t5_cfg, tok_t5 = t5 if t5 else (None, None, None)
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)

        def compute():
            ctx, pooled = sd3_encode_prompt(
                clip_l, clip_l_cfg, clip_g, clip_g_cfg, t5_params, t5_cfg,
                tok_l, tok_g, tok_t5, prompts, max_sequence_length,
                pad_to_dim=self.cfg.sd3.joint_attention_dim)
            return ctx.astype(self.dtype), pooled.astype(self.dtype)

        return self._prompt_cache.get_or(
            ("prompt", tuple(prompts), max_sequence_length), compute)

    def encode_condition_prompt(self, condition_prompt):
        """Pooled embedding of the condition task name (reference
        UniGenPipeline.py:34-105 / train.py:568-570)."""
        assert self.text_encoders, "text encoders not loaded"
        from unigen_tpu.models.text_encoder import encode_pooled_only
        clip_l, clip_l_cfg, tok_l = self.text_encoders["clip_l"]
        clip_g, clip_g_cfg, tok_g = self.text_encoders["clip_g"]
        prompts = ([condition_prompt] if isinstance(condition_prompt, str)
                   else list(condition_prompt))

        def compute():
            pl_ = encode_pooled_only(clip_l, clip_l_cfg, tok_l, prompts)
            pg_ = encode_pooled_only(clip_g, clip_g_cfg, tok_g, prompts)
            return jnp.concatenate([pl_, pg_], axis=-1).astype(self.dtype)

        return self._prompt_cache.get_or(("cond", tuple(prompts)), compute)

    def __call__(self, prompt, condition_prompt, control_image,
                 negative_prompt=None, height: int = 512, width: int = 512,
                 num_inference_steps: int = 28, guidance_scale: float = 7.0,
                 conditioning_scale: float = 1.0,
                 control_guidance_start: float = 0.0,
                 control_guidance_end: float = 1.0,
                 max_sequence_length: int = 256, seed: int = 0, **kw):
        """Single-condition SD3 call (reference UniGenPipeline.py:29-450):
        CFG via negative/positive duplication; control_image [B,3,H,W] in
        [-1,1]. Extra kwargs (control_cache_interval/-threshold, latents)
        forward to generate()."""
        embeds, pooled = self.encode_prompt(prompt, max_sequence_length)
        cond_pooled = self.encode_condition_prompt(condition_prompt)
        neg_embeds = neg_pooled = None
        if negative_prompt is not None:
            neg_embeds, neg_pooled = self.encode_prompt(negative_prompt,
                                                        max_sequence_length)
        return self.generate(
            prompt_embeds=embeds, pooled=pooled, cond_pooled=cond_pooled,
            control_pixels=jnp.asarray(control_image, self.dtype),
            neg_embeds=neg_embeds, neg_pooled=neg_pooled,
            height=height, width=width,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            conditioning_scale=conditioning_scale,
            control_guidance_start=control_guidance_start,
            control_guidance_end=control_guidance_end, seed=seed, **kw)

    def _program(self, num_steps: int, height: int, width: int,
                 guidance_scale: float, schedule: jnp.ndarray,
                 cache_interval: int = 1, adaptive: bool = False,
                 cfg_cache: bool = False, model_cache: bool = False,
                 model_cache_order: int = 0,
                 hybrid_model_interval: int = 1,
                 hybrid_adaptive: bool = False,
                 residual_bits: int = 16):
        # adaptive=True: the program takes a trailing cache_threshold scalar
        # (traced, not baked in) — one compiled program serves any threshold.
        # cfg_cache=True (requires a caching mode + CFG): replay steps run
        # ONLY the positive stream (half the batch) and reuse the cached
        # pos-neg guidance delta — the uncond stream is recomputed on the
        # same refresh schedule as the control cache.
        # model_cache=True: replay steps skip the ENTIRE transformer and
        # reuse the cached guided prediction (TeaCache-style zero-order hold
        # on the flow; the biggest lever on the 28-step CFG denoise where a
        # replay step costs zero transformer compute).
        cfg = self.cfg
        vs = self.vae_cfg.downscale
        lh, lw = height // vs, width // vs
        sigmas, timesteps = scheduling.inference_sigmas(self.scheduler, num_steps)
        do_cfg = guidance_scale > 1.0

        def program(params, vae_params, latents, control_pixels, prompt_embeds,
                    pooled, cond_pooled, neg_embeds, neg_pooled,
                    cache_threshold=None, model_threshold=None):
            control_lat = vae_lib.vae_encode(vae_params, self.vae_cfg,
                                             control_pixels).astype(self.dtype)
            if do_cfg:
                # neg/pos duplication (reference :286-290): one batched pass
                embeds = jnp.concatenate([neg_embeds, prompt_embeds], axis=0)
                pool = jnp.concatenate([neg_pooled, pooled], axis=0)
                cpool = jnp.concatenate([cond_pooled, cond_pooled], axis=0)
                ctrl = jnp.concatenate([control_lat, control_lat], axis=0)
            else:
                embeds, pool, cpool, ctrl = prompt_embeds, pooled, cond_pooled, control_lat

            def fwd(lat, i, **kw):
                lat_in = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat
                t = jnp.full((lat_in.shape[0],), timesteps[i], self.dtype)
                pred, _, outs = unigen_sd3_forward(
                    params, cfg, hidden=lat_in, condition=ctrl, encoder=embeds,
                    pooled=pool, condition_pooled=cpool, timestep=t,
                    conditioning_scale=schedule[i], **kw)
                if do_cfg:
                    neg, pos = jnp.split(pred, 2, axis=0)
                    pred = neg + guidance_scale * (pos - neg)
                return pred, outs

            if (cache_interval <= 1 and not adaptive
                    and hybrid_model_interval <= 1 and not hybrid_adaptive):
                def step(lat, i):
                    pred, _ = fwd(lat, i)
                    return scheduling.euler_step(lat, pred, sigmas[i],
                                                 sigmas[i + 1]), None

                latents, _ = jax.lax.scan(step, latents, jnp.arange(num_steps))
            elif model_cache:
                # full-model output caching: fwd() already applies the CFG
                # combine, so the cached prediction is the guided velocity
                # (shared scan incl. the order-1 Taylor replay:
                # caching.model_cache_scan)
                latents, n_refresh = caching.model_cache_scan(
                    lambda lat, i: fwd(lat, i)[0], latents, sigmas,
                    num_steps, cache_interval=cache_interval,
                    adaptive=adaptive,
                    threshold=cache_threshold if adaptive else None,
                    order=model_cache_order)
            elif hybrid_model_interval > 1 or hybrid_adaptive:
                # hybrid three-level cache (docs/SERVING.md rung 3c): full
                # refresh every cache_interval steps, base-with-control-replay
                # every hybrid_model_interval steps between, prediction replay
                # otherwise; the CFG duplication rides inside the batch axis
                # of both the forward and the residual cache
                bb = cfg.sd3
                bc = latents.shape[0] * (2 if do_cfg else 1)
                s_tok = (lh // bb.patch_size) * (lw // bb.patch_size)
                shp = (bb.num_layers, bc, s_tok, bb.inner_dim)
                zero = quant_lib.residual_buffer(shp, residual_bits,
                                                 self.dtype)

                def full_fwd_h(lat, i):
                    pred, outs = fwd(lat, i, return_control_residuals=True,
                                     control_residuals_bits=residual_bits)
                    return pred, outs["control_residuals"]

                def base_fwd_h(lat, i, res):
                    return fwd(lat, i, control_residuals=res)[0]

                latents, n_full, n_base = caching.hybrid_cache_scan(
                    full_fwd_h, base_fwd_h, latents, sigmas, num_steps,
                    control_interval=cache_interval,
                    model_interval=hybrid_model_interval,
                    residuals_init=zero, order=model_cache_order,
                    adaptive=hybrid_adaptive,
                    control_threshold=cache_threshold,
                    model_threshold=model_threshold)
            else:
                # control-residual step caching (see unigen_sd3_forward): one
                # cache [n_base, B(*2 if cfg), S, D] of raw control block
                # outputs; the CFG duplication rides inside the batch axis so
                # a single cache serves both halves
                bb = cfg.sd3
                bc = latents.shape[0] * (2 if do_cfg else 1)
                s_tok = (lh // bb.patch_size) * (lw // bb.patch_size)
                shp = (bb.num_layers, bc, s_tok, bb.inner_dim)
                zero = quant_lib.residual_buffer(shp, residual_bits,
                                                 self.dtype)

                use_cfg_cache = cfg_cache and do_cfg
                bsz = None  # bound below once latents' batch is known

                def fwd_pos(lat, i, res_pos):
                    """Positive-stream-only forward (no CFG duplication) with
                    the pos half of the control cache replayed — the
                    cfg_cache replay step. In global MoE routing mode the
                    half batch may route differently from the pos half of
                    the duplicated batch; per-sample routing (the serving
                    default) is identical by construction."""
                    t = jnp.full((lat.shape[0],), timesteps[i], self.dtype)
                    pred, _, _ = unigen_sd3_forward(
                        params, cfg, hidden=lat, condition=control_lat,
                        encoder=prompt_embeds, pooled=pooled,
                        condition_pooled=cond_pooled, timestep=t,
                        conditioning_scale=schedule[i],
                        control_residuals=res_pos)
                    return pred

                def step(carry, i):
                    if adaptive:
                        lat, res, delta, lat_ref, n_ref = carry
                        refresh = caching.refresh_decision(i, lat, lat_ref,
                                                           cache_threshold)
                    else:
                        lat, res, delta = carry
                        refresh = (i % cache_interval) == 0

                    if use_cfg_cache:
                        def full():
                            lat_in = jnp.concatenate([lat, lat], axis=0)
                            t = jnp.full((lat_in.shape[0],), timesteps[i],
                                         self.dtype)
                            pred2, _, outs = unigen_sd3_forward(
                                params, cfg, hidden=lat_in, condition=ctrl,
                                encoder=embeds, pooled=pool,
                                condition_pooled=cpool, timestep=t,
                                conditioning_scale=schedule[i],
                                return_control_residuals=True,
                                control_residuals_bits=residual_bits)
                            neg, pos = jnp.split(pred2, 2, axis=0)
                            d = pos - neg
                            return (neg + guidance_scale * d,
                                    outs["control_residuals"], d)

                        def replay():
                            pos = fwd_pos(lat, i,
                                          jax.tree.map(lambda r: r[:, bsz:],
                                                       res))
                            # pred = neg + g(pos-neg) = pos + (g-1)(pos-neg)
                            return (pos + (guidance_scale - 1.0) * delta,
                                    res, delta)
                    else:
                        def full():
                            pred, outs = fwd(
                                lat, i, return_control_residuals=True,
                                control_residuals_bits=residual_bits)
                            return pred, outs["control_residuals"], delta

                        def replay():
                            pred, _ = fwd(lat, i, control_residuals=res)
                            return pred, res, delta

                    pred, res, delta = jax.lax.cond(refresh, full, replay)
                    lat_next = scheduling.euler_step(lat, pred, sigmas[i],
                                                     sigmas[i + 1])
                    if adaptive:
                        lat_ref = jnp.where(refresh, lat, lat_ref)
                        n_ref = n_ref + refresh.astype(jnp.int32)
                        return (lat_next, res, delta, lat_ref, n_ref), None
                    return (lat_next, res, delta), None

                bsz = latents.shape[0]
                # guidance delta cache [B,...] — only updated/read when
                # use_cfg_cache (refresh always precedes first read)
                delta0 = jnp.zeros_like(latents)
                if adaptive:
                    (latents, _, _, _, n_refresh), _ = jax.lax.scan(
                        step, (latents, zero, delta0, latents,
                               jnp.zeros((), jnp.int32)),
                        jnp.arange(num_steps))
                else:
                    (latents, _, _), _ = jax.lax.scan(
                        step, (latents, zero, delta0),
                        jnp.arange(num_steps))
            pixels = vae_lib.vae_decode(vae_params, self.vae_cfg,
                                        latents.astype(jnp.float32))
            if hybrid_adaptive:
                return pixels, n_full, n_base
            if adaptive:
                return pixels, n_refresh
            return pixels

        return program, (lh, lw)

    def generate(self, *, prompt_embeds, pooled, cond_pooled, control_pixels,
                 neg_embeds=None, neg_pooled=None, height: int = 512,
                 width: int = 512, num_inference_steps: int = 28,
                 guidance_scale: float = 7.0, conditioning_scale: float = 1.0,
                 control_guidance_start: float = 0.0,
                 control_guidance_end: float = 1.0, seed: int = 0,
                 latents: Optional[jnp.ndarray] = None,
                 control_cache_interval: int = 1,
                 control_cache_threshold: float = 0.0,
                 cfg_cache: bool = False,
                 model_cache_interval: int = 1,
                 model_cache_threshold: float = 0.0,
                 model_cache_order: int = 0,
                 residual_cache_bits: int = 16,
                 quality_profile: Optional[str] = None) -> np.ndarray:
        """quality_profile picks a measured serving operating point
        (docs/SERVING.md; SD3.5-medium W8A8 28-step CFG b=1): "exact"
        (default) 0.502 img/s; "balanced" — hybrid (c=8, m=2) 1.419 img/s
        (2.83x); "fast" — full-model cache interval 4 order 1, 1.858 img/s
        (3.70x). Mixing a profile with explicit cache knobs is an error.
        control_cache_interval > 1 enables control-residual step caching
        (recompute the control branch every k-th denoise step) — a
        serving-only approximation; measure fidelity before production use.
        control_cache_threshold > 0 switches to the adaptive drift rule
        (pipelines/caching.py); refresh count → self.last_cache_refreshes.
        cfg_cache=True (requires a caching mode + guidance_scale > 1):
        replay steps also skip the uncond stream — the positive stream runs
        at half batch and the cached pos-neg guidance delta is reused.
        model_cache_interval > 1 / model_cache_threshold > 0 enable
        FULL-MODEL output caching (replay steps skip the entire transformer);
        mutually exclusive with cfg_cache and thresholds.
        Setting BOTH intervals (> 1) enables the HYBRID three-level cache
        (rung 3c): full refresh every control_cache_interval steps,
        base-with-control-replay every model_cache_interval steps between,
        prediction replay otherwise. Setting BOTH thresholds (> 0,
        control > model) enables the fully-ADAPTIVE hybrid (both traced,
        one compiled program); last_cache_refreshes = (n_full, n_base)."""
        knobs = caching.quality_profile_knobs(
            quality_profile, caching.PROFILE_TABLES["sd3"],
            dict(control_cache_interval=control_cache_interval,
                 control_cache_threshold=control_cache_threshold,
                 cfg_cache=cfg_cache,
                 model_cache_interval=model_cache_interval,
                 model_cache_threshold=model_cache_threshold,
                 model_cache_order=model_cache_order),
            num_steps=num_inference_steps)
        control_cache_interval = knobs.get("control_cache_interval",
                                           control_cache_interval)
        model_cache_interval = knobs.get("model_cache_interval",
                                         model_cache_interval)
        model_cache_order = knobs.get("model_cache_order", model_cache_order)
        steps = num_inference_steps
        keep = np.array([
            1.0 - float((i / steps < control_guidance_start)
                        or ((i + 1) / steps > control_guidance_end))
            for i in range(steps)], np.float32)
        schedule = jnp.asarray(conditioning_scale * keep)
        model_cache = model_cache_interval > 1 or model_cache_threshold > 0.0
        hybrid_model_interval = 1
        hybrid_adaptive = (model_cache_threshold > 0.0
                           and control_cache_threshold > 0.0)
        if hybrid_adaptive:
            # fully-ADAPTIVE three-level cache (rung 3c): both refresh
            # decisions are traced drift thresholds — one compiled program
            if model_cache_interval > 1 or control_cache_interval > 1:
                raise ValueError("adaptive hybrid caching (both thresholds "
                                 "> 0) takes thresholds only; leave the "
                                 "intervals at 1")
            if cfg_cache:
                raise ValueError("cfg_cache does not compose with hybrid "
                                 "caching (skip steps already bypass the "
                                 "uncond stream)")
            if control_cache_threshold <= model_cache_threshold:
                raise ValueError(
                    "adaptive hybrid caching requires control_cache_threshold"
                    " > model_cache_threshold, got "
                    f"c={control_cache_threshold} m={model_cache_threshold}")
            model_cache = False
            cache_interval = 1
            cache_threshold = 0.0
        elif model_cache_interval > 1 and control_cache_interval > 1:
            # hybrid three-level cache (rung 3c) — fixed intervals only
            if control_cache_threshold > 0.0 or model_cache_threshold > 0.0:
                raise ValueError("hybrid caching takes both intervals OR "
                                 "both thresholds, not a mix")
            if cfg_cache:
                raise ValueError("cfg_cache does not compose with hybrid "
                                 "caching (skip steps already bypass the "
                                 "uncond stream)")
            if (control_cache_interval <= model_cache_interval
                    or control_cache_interval % model_cache_interval):
                raise ValueError(
                    "hybrid caching requires model_cache_interval < "
                    "control_cache_interval and control_cache_interval a "
                    "multiple of model_cache_interval, got "
                    f"c={control_cache_interval} m={model_cache_interval}")
            model_cache = False
            hybrid_model_interval = model_cache_interval
            cache_interval = control_cache_interval
            cache_threshold = 0.0
        elif model_cache:
            if control_cache_interval > 1 or control_cache_threshold > 0.0:
                raise ValueError("the model cache composes with the control "
                                 "cache only via fixed intervals on both "
                                 "(hybrid mode); thresholds are mutually "
                                 "exclusive with it")
            if cfg_cache:
                raise ValueError("cfg_cache composes with the control cache "
                                 "only; the model cache already skips the "
                                 "uncond stream on replay steps")
            cache_interval = model_cache_interval
            cache_threshold = model_cache_threshold
        else:
            cache_interval = control_cache_interval
            cache_threshold = control_cache_threshold
        adaptive = cache_threshold > 0.0 and not hybrid_adaptive
        if cfg_cache and control_cache_interval <= 1 and not adaptive:
            raise ValueError("cfg_cache requires control_cache_interval > 1 "
                             "or control_cache_threshold > 0 (it rides the "
                             "same refresh schedule)")
        if residual_cache_bits not in (4, 8, 16):
            raise ValueError("residual_cache_bits must be 4, 8 or 16, got "
                             f"{residual_cache_bits}")
        if residual_cache_bits < 16 and model_cache and not (
                hybrid_model_interval > 1 or hybrid_adaptive):
            raise ValueError("residual_cache_bits<16 quantizes the "
                             "control-residual cache; the pure model cache "
                             "has none (use a control-cache or hybrid mode)")
        cache_key = (steps, height, width, round(guidance_scale, 4),
                     tuple(conditioning_scale * keep), cache_interval,
                     adaptive, cfg_cache, model_cache, model_cache_order,
                     hybrid_model_interval, hybrid_adaptive,
                     residual_cache_bits)
        if cache_key in self._program_cache:
            program, (lh, lw) = self._program_cache[cache_key]
        else:
            program, (lh, lw) = self._program(steps, height, width,
                                              guidance_scale, schedule,
                                              cache_interval,
                                              adaptive, cfg_cache, model_cache,
                                              model_cache_order,
                                              hybrid_model_interval,
                                              hybrid_adaptive,
                                              residual_cache_bits)
            program = jax.jit(program)
            self._program_cache[cache_key] = (program, (lh, lw))
        b = prompt_embeds.shape[0]
        if latents is None:
            latents = jax.random.normal(jax.random.PRNGKey(seed),
                                        (b, self.cfg.sd3.in_channels, lh, lw),
                                        self.dtype)
        if neg_embeds is None:
            neg_embeds = jnp.zeros_like(prompt_embeds)
            neg_pooled = jnp.zeros_like(pooled)
        if self.mesh is not None:
            (latents, control_pixels, prompt_embeds, pooled, cond_pooled,
             neg_embeds, neg_pooled) = self._place_inputs(
                (latents, control_pixels, prompt_embeds, pooled,
                 cond_pooled, neg_embeds, neg_pooled))
        if hybrid_adaptive:
            pixels, n_full, n_base = program(
                self.params, self.vae_params, latents, control_pixels,
                prompt_embeds, pooled, cond_pooled, neg_embeds, neg_pooled,
                jnp.float32(control_cache_threshold),
                jnp.float32(model_cache_threshold))
            self.last_cache_refreshes = (int(n_full), int(n_base))
        elif adaptive:
            pixels, n_refresh = program(
                self.params, self.vae_params, latents, control_pixels,
                prompt_embeds, pooled, cond_pooled, neg_embeds, neg_pooled,
                jnp.float32(cache_threshold))
            self.last_cache_refreshes = int(n_refresh)
        else:
            pixels = program(self.params, self.vae_params, latents,
                             control_pixels, prompt_embeds, pooled,
                             cond_pooled, neg_embeds, neg_pooled)
        from unigen_tpu.parallel.sharding import fetch_global
        imgs = fetch_global(jnp.clip(pixels.astype(jnp.float32), -1, 1))
        return ((imgs.transpose(0, 2, 3, 1) + 1) * 127.5).round().astype(np.uint8)
