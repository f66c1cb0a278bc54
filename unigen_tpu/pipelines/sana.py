"""UniGenSanaPipeline — controllable generation on the SANA family.

Beyond-parity: the reference builds SANAUniGen (UniGenTransformer.py:
1453-2112) but ships NO pipeline for it; this completes the family with the
same one-jit design as pipelines/flux.py: AE-encode the control image, run
the N-step flow-matching Euler loop (lax.scan) through sana_unigen_forward,
AE-decode.

Text encoding follows the reference's split conditioning: the PROMPT
sequence embedding comes from Gemma-2 (SANA's native encoder,
models/gemma_text.py), while pooled prompt/condition-task embeddings come
from CLIP-L (the reference reuses its CLIP-based ``encode_prompt`` one-
encoder mode for every family, train.py:392-397 — hence SANA's
pooled_projection_dim of 768).

The autoencoder is pluggable (``ae_encode``/``ae_decode`` callables +
``ae_downscale``): SANA's DC-AE is f32c32; checkpoint bridging for DC-AE
needs a weights-available environment, and any latent autoencoder with the
right channel count drives the pipeline (tests use the tiny KL VAE).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from unigen_tpu.config import UniGenConfig
from unigen_tpu.models.clip_text import CLIPTextConfig, clip_encode
from unigen_tpu.models.gemma_text import GemmaConfig, gemma_encode
from unigen_tpu.models.sana import sana_unigen_forward
from unigen_tpu.ops import quant as quant_lib
from unigen_tpu.pipelines import caching, scheduling


@dataclass
class UniGenSanaPipeline:
    cfg: UniGenConfig
    params: Dict[str, Any]                      # base, control
    ae_encode: Callable                         # [B,3,H,W] -> [B,C,h,w]
    ae_decode: Callable                         # [B,C,h,w] -> [B,3,H,W]
    ae_downscale: int = 32                      # DC-AE f32c32
    gemma_cfg: Optional[GemmaConfig] = None
    gemma_params: Optional[dict] = None
    clip_cfg: Optional[CLIPTextConfig] = None
    clip_params: Optional[dict] = None
    tokenizer: Any = None                       # Gemma tokenizer
    tokenizer_clip: Any = None
    scheduler: scheduling.FlowMatchConfig = field(
        default_factory=lambda: scheduling.FlowMatchConfig(
            shift=3.0, use_dynamic_shifting=False))   # SANA flow shift
    dtype: Any = jnp.float32
    prompt_cache_size: int = 0      # >0: LRU prompt-embedding cache
                                    # (caching.PromptLRU)

    def __post_init__(self):
        self._program_cache: Dict[Any, Any] = {}
        self._prompt_cache = caching.PromptLRU(self.prompt_cache_size)

    # ------------------------------------------------------------ text

    def encode_prompt(self, prompt: Union[str, Sequence[str]],
                      max_sequence_length: int = 300) -> jnp.ndarray:
        """Gemma-2 last hidden states [B, S, caption_channels]."""
        assert self.tokenizer is not None and self.gemma_params is not None
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)

        def compute():
            ids = self.tokenizer(prompts, padding="max_length",
                                 max_length=max_sequence_length,
                                 truncation=True, return_tensors="np")
            embeds = jax.jit(partial(gemma_encode, cfg=self.gemma_cfg))(
                self.gemma_params, input_ids=jnp.asarray(ids.input_ids),
                attention_mask=jnp.asarray(ids.attention_mask))
            return (embeds.astype(self.dtype),
                    jnp.asarray(ids.attention_mask))

        return self._prompt_cache.get_or(
            ("prompt", tuple(prompts), max_sequence_length), compute)

    def encode_pooled(self, text: Union[str, Sequence[str]]) -> jnp.ndarray:
        """CLIP-L pooled embedding (prompt or condition task name)."""
        assert self.tokenizer_clip is not None and self.clip_params is not None
        prompts = [text] if isinstance(text, str) else list(text)

        def compute():
            clip_len = min(77, self.clip_cfg.max_position_embeddings)
            ids = self.tokenizer_clip(prompts, padding="max_length",
                                      max_length=clip_len, truncation=True,
                                      return_tensors="np").input_ids
            _, _, pooled = jax.jit(partial(clip_encode, cfg=self.clip_cfg))(
                self.clip_params, input_ids=jnp.asarray(ids))
            return pooled.astype(self.dtype)

        return self._prompt_cache.get_or(("pooled", tuple(prompts)), compute)

    # ------------------------------------------------------------ program

    def _denoise_program(self, num_steps: int, height: int, width: int,
                         scale_schedule, cache_interval: int = 1,
                         adaptive: bool = False, model_cache: bool = False,
                         model_cache_order: int = 0,
                         hybrid_model_interval: int = 1,
                         hybrid_adaptive: bool = False,
                         residual_bits: int = 16):
        # adaptive=True: the program takes a trailing cache_threshold scalar
        # (traced, not baked in) — one compiled program serves any threshold.
        # model_cache=True: replay steps skip the ENTIRE transformer and
        # reuse the cached prediction (TeaCache-style zero-order hold)
        cfg = self.cfg
        lh, lw = height // self.ae_downscale, width // self.ae_downscale
        sigmas, timesteps = scheduling.inference_sigmas(
            self.scheduler, num_steps, image_seq_len=lh * lw)
        sigmas = np.asarray(sigmas)
        timesteps = np.asarray(timesteps)

        def program(params, latents, control_pixels, prompt_embeds,
                    prompt_mask, pooled, cond_pooled, cache_threshold=None,
                    model_threshold=None):
            control_lat = self.ae_encode(control_pixels).astype(self.dtype)
            b = latents.shape[0]
            sig = jnp.asarray(sigmas)
            tsteps = jnp.asarray(timesteps)
            sched = jnp.asarray(scale_schedule)

            def fwd(lat, i, **kw):
                pred, _, outs = sana_unigen_forward(
                    params, cfg, hidden=lat, condition=control_lat,
                    encoder=prompt_embeds, pooled=pooled,
                    condition_pooled=cond_pooled,
                    timestep=jnp.full((b,), tsteps[i] / 1000.0, self.dtype),
                    encoder_mask=prompt_mask,
                    conditioning_scale=sched[i], **kw)
                return pred, outs

            if (cache_interval <= 1 and not adaptive
                    and hybrid_model_interval <= 1 and not hybrid_adaptive):
                def step(lat, i):
                    pred, _ = fwd(lat, i)
                    lat = scheduling.euler_step(lat, pred, sig[i], sig[i + 1])
                    return lat, None

                latents, _ = jax.lax.scan(step, latents,
                                          jnp.arange(num_steps))
            elif model_cache:
                # full-model output caching: replay steps cost zero
                # transformer compute (shared scan incl. the order-1 Taylor
                # replay: caching.model_cache_scan)
                latents, n_refresh = caching.model_cache_scan(
                    lambda lat_x, i: fwd(lat_x, i)[0], latents, sig,
                    num_steps, cache_interval=cache_interval,
                    adaptive=adaptive,
                    threshold=cache_threshold if adaptive else None,
                    order=model_cache_order)
            elif hybrid_model_interval > 1 or hybrid_adaptive:
                # hybrid three-level cache (docs/SERVING.md rung 3c)
                bb = cfg.sana
                s_tok = (lh // bb.patch_size) * (lw // bb.patch_size)
                shp = (bb.num_layers, b, s_tok, bb.inner_dim)
                zero = quant_lib.residual_buffer(shp, residual_bits,
                                                 self.dtype)

                def full_fwd_h(lat, i):
                    pred, outs = fwd(lat, i, return_control_residuals=True,
                                     control_residuals_bits=residual_bits)
                    return pred, outs["control_residuals"]

                def base_fwd_h(lat, i, res):
                    return fwd(lat, i, control_residuals=res)[0]

                latents, n_full, n_base = caching.hybrid_cache_scan(
                    full_fwd_h, base_fwd_h, latents, sig, num_steps,
                    control_interval=cache_interval,
                    model_interval=hybrid_model_interval,
                    residuals_init=zero, order=model_cache_order,
                    adaptive=hybrid_adaptive,
                    control_threshold=cache_threshold,
                    model_threshold=model_threshold)
            else:
                # control-residual step caching (see sana_unigen_forward):
                # cache of raw per-base-block control outputs
                bb = cfg.sana
                s_tok = (lh // bb.patch_size) * (lw // bb.patch_size)
                shp = (bb.num_layers, b, s_tok, bb.inner_dim)
                zero = quant_lib.residual_buffer(shp, residual_bits,
                                                 self.dtype)

                def step(carry, i):
                    if adaptive:
                        lat, res, lat_ref, n_ref = carry
                        refresh = caching.refresh_decision(i, lat, lat_ref,
                                                           cache_threshold)
                    else:
                        lat, res = carry
                        refresh = (i % cache_interval) == 0

                    def full():
                        pred, outs = fwd(lat, i,
                                         return_control_residuals=True,
                                         control_residuals_bits=residual_bits)
                        return pred, outs["control_residuals"]

                    def replay():
                        pred, _ = fwd(lat, i, control_residuals=res)
                        return pred, res

                    pred, res = jax.lax.cond(refresh, full, replay)
                    lat_next = scheduling.euler_step(lat, pred, sig[i],
                                                     sig[i + 1])
                    if adaptive:
                        lat_ref = jnp.where(refresh, lat, lat_ref)
                        n_ref = n_ref + refresh.astype(jnp.int32)
                        return (lat_next, res, lat_ref, n_ref), None
                    return (lat_next, res), None

                if adaptive:
                    (latents, _, _, n_refresh), _ = jax.lax.scan(
                        step, (latents, zero, latents,
                               jnp.zeros((), jnp.int32)),
                        jnp.arange(num_steps))
                else:
                    (latents, _), _ = jax.lax.scan(step, (latents, zero),
                                                   jnp.arange(num_steps))
            pixels = self.ae_decode(latents.astype(jnp.float32))
            if hybrid_adaptive:
                return pixels, n_full, n_base
            if adaptive:
                return pixels, n_refresh
            return pixels

        return program, (lh, lw)

    def generate(self, *, prompt_embeds, prompt_mask, pooled, cond_pooled,
                 control_pixels, height: int = 512, width: int = 512,
                 num_inference_steps: int = 20,
                 conditioning_scale: float = 1.0,
                 control_guidance_start: float = 0.0,
                 control_guidance_end: float = 1.0,
                 seed: int = 0, latents=None,
                 control_cache_interval: int = 1,
                 control_cache_threshold: float = 0.0,
                 model_cache_interval: int = 1,
                 model_cache_threshold: float = 0.0,
                 model_cache_order: int = 0,
                 residual_cache_bits: int = 16,
                 quality_profile: Optional[str] = None) -> np.ndarray:
        """quality_profile picks a measured serving operating point
        (docs/SERVING.md; SANA-1.6B W8A8 1024² 20-step b=2): "exact"
        (default) 1.213 img/s; "balanced" — hybrid (c=4, m=2) 3.056 img/s
        (2.52x); "fast" — full-model cache interval 4 order 1, 4.473 img/s
        (3.69x, SSIM-vs-bf16 0.99752). Mixing a profile with explicit
        knobs is an error.
        control_cache_interval > 1 enables control-residual step caching
        (recompute the control branch every k-th denoise step) — a
        serving-only approximation; measure fidelity before production use.
        control_cache_threshold > 0 switches to the adaptive drift rule
        (pipelines/caching.py); refresh count → self.last_cache_refreshes.
        model_cache_interval > 1 / model_cache_threshold > 0 enable
        FULL-MODEL output caching (replay steps skip the entire transformer);
        mutually exclusive with thresholds.
        Setting BOTH intervals (> 1) enables the HYBRID three-level cache
        (rung 3c): full refresh every control_cache_interval steps,
        base-with-control-replay every model_cache_interval steps between,
        prediction replay otherwise. Setting BOTH thresholds (> 0,
        control > model) enables the fully-ADAPTIVE hybrid (both traced,
        one compiled program); last_cache_refreshes = (n_full, n_base).
        residual_cache_bits=8 stores the control-residual cache int8 with
        per-token scales (half the cache HBM; see UniGenFluxPipeline)."""
        knobs = caching.quality_profile_knobs(
            quality_profile, caching.PROFILE_TABLES["sana"],
            dict(control_cache_interval=control_cache_interval,
                 control_cache_threshold=control_cache_threshold,
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
        schedule = tuple(conditioning_scale * keep)
        model_cache = model_cache_interval > 1 or model_cache_threshold > 0.0
        hybrid_model_interval = 1
        hybrid_adaptive = (model_cache_threshold > 0.0
                           and control_cache_threshold > 0.0)
        if hybrid_adaptive:
            # fully-ADAPTIVE three-level cache (rung 3c)
            if model_cache_interval > 1 or control_cache_interval > 1:
                raise ValueError("adaptive hybrid caching (both thresholds "
                                 "> 0) takes thresholds only; leave the "
                                 "intervals at 1")
            if control_cache_threshold <= model_cache_threshold:
                raise ValueError(
                    "adaptive hybrid caching requires control_cache_threshold"
                    " > model_cache_threshold, got "
                    f"c={control_cache_threshold} m={model_cache_threshold}")
            model_cache = False
            cache_interval = 1
            cache_threshold = 0.0
        elif model_cache_interval > 1 and control_cache_interval > 1:
            if control_cache_threshold > 0.0 or model_cache_threshold > 0.0:
                raise ValueError("hybrid caching takes both intervals OR "
                                 "both thresholds, not a mix")
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
        else:
            if model_cache and (control_cache_interval > 1
                                or control_cache_threshold > 0.0):
                raise ValueError("the model cache composes with the control "
                                 "cache only via fixed intervals on both "
                                 "(hybrid mode); thresholds are mutually "
                                 "exclusive with it")
            cache_interval = (model_cache_interval if model_cache
                              else control_cache_interval)
            cache_threshold = (model_cache_threshold if model_cache
                               else control_cache_threshold)
        adaptive = cache_threshold > 0.0 and not hybrid_adaptive
        if residual_cache_bits not in (4, 8, 16):
            raise ValueError("residual_cache_bits must be 4, 8 or 16, got "
                             f"{residual_cache_bits}")
        if residual_cache_bits < 16 and model_cache and not (
                hybrid_model_interval > 1 or hybrid_adaptive):
            raise ValueError("residual_cache_bits<16 quantizes the "
                             "control-residual cache; the pure model cache "
                             "has none (use a control-cache or hybrid mode)")
        key = (steps, height, width, schedule, cache_interval,
               adaptive, model_cache, model_cache_order,
               hybrid_model_interval, hybrid_adaptive, residual_cache_bits)
        if key in self._program_cache:
            program, (lh, lw) = self._program_cache[key]
        else:
            program, (lh, lw) = self._denoise_program(steps, height, width,
                                                      np.asarray(schedule),
                                                      cache_interval,
                                                      adaptive, model_cache,
                                                      model_cache_order,
                                                      hybrid_model_interval,
                                                      hybrid_adaptive,
                                                      residual_cache_bits)
            program = jax.jit(program)
            self._program_cache[key] = (program, (lh, lw))
        b = prompt_embeds.shape[0]
        if latents is None:
            latents = jax.random.normal(
                jax.random.PRNGKey(seed),
                (b, self.cfg.sana.in_channels, lh, lw), self.dtype)
        if hybrid_adaptive:
            pixels, n_full, n_base = program(
                self.params, latents, jnp.asarray(control_pixels, self.dtype),
                prompt_embeds, prompt_mask, pooled, cond_pooled,
                jnp.float32(control_cache_threshold),
                jnp.float32(model_cache_threshold))
            self.last_cache_refreshes = (int(n_full), int(n_base))
        elif adaptive:
            pixels, n_refresh = program(
                self.params, latents, jnp.asarray(control_pixels, self.dtype),
                prompt_embeds, prompt_mask, pooled, cond_pooled,
                jnp.float32(cache_threshold))
            self.last_cache_refreshes = int(n_refresh)
        else:
            pixels = program(self.params, latents,
                             jnp.asarray(control_pixels, self.dtype),
                             prompt_embeds, prompt_mask, pooled, cond_pooled)
        from unigen_tpu.parallel.sharding import fetch_global
        imgs = fetch_global(jnp.clip(pixels.astype(jnp.float32), -1, 1))
        return ((imgs.transpose(0, 2, 3, 1) + 1) * 127.5).round().astype(np.uint8)

    # ------------------------------------------------------------ public

    def __call__(self, prompt: Union[str, Sequence[str]],
                 condition_prompt: str, control_image: np.ndarray,
                 height: int = 512, width: int = 512,
                 num_inference_steps: int = 20,
                 conditioning_scale: float = 1.0,
                 max_sequence_length: int = 300, seed: int = 0,
                 **kw) -> np.ndarray:
        embeds, mask = self.encode_prompt(prompt, max_sequence_length)
        pooled = self.encode_pooled(prompt)
        cond_pooled = self.encode_pooled(condition_prompt)
        return self.generate(
            prompt_embeds=embeds, prompt_mask=mask, pooled=pooled,
            cond_pooled=cond_pooled,
            control_pixels=jnp.asarray(control_image, self.dtype),
            height=height, width=width,
            num_inference_steps=num_inference_steps,
            conditioning_scale=conditioning_scale, seed=seed, **kw)
