"""UniGenFluxPipeline — controllable text->image inference, TPU-native.

Re-design of the reference's diffusers-style pipeline
(src/UniGenPipeline.py:452-1134) as ONE jit-compiled program per call shape:
VAE-encode the control image(s), pack latents + ids, run the N-step
flow-matching Euler loop via lax.scan (optional true-CFG second pass per
step), unpack, VAE-decode. Text encoding (CLIP pooled + T5 sequence) is a
separate jitted program (embeddings change per prompt, the denoise program is
reused across prompts).

Fixes the published defect where the multi-condition ``__call__`` shadows the
single-condition one on the same class (reference UniGenPipeline.py:486 vs
:809 — SURVEY.md §2.7): here they are two distinct methods.

conditioning-scale start/end windows (``controlnet_keep``,
UniGenPipeline.py:366-372) become a static per-step scale vector folded into
the scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from unigen_tpu.config import UniGenConfig
from unigen_tpu.models import vae as vae_lib
from unigen_tpu.models.clip_text import CLIPTextConfig, clip_encode
from unigen_tpu.models.t5_text import T5Config, t5_encode
from unigen_tpu.models.unigen_flux import unigen_flux_forward
from unigen_tpu.ops.packing import (pack_latents, prepare_latent_image_ids,
                                    unpack_latents)
from unigen_tpu.pipelines import caching, scheduling


@dataclass
class UniGenFluxPipeline:
    """Holds configs + params; all compute methods are jitted pure programs."""
    cfg: UniGenConfig
    params: Dict[str, Any]                    # base, control
    vae_cfg: vae_lib.VAEConfig = field(default_factory=vae_lib.VAEConfig)
    vae_params: Optional[dict] = None
    clip_cfg: Optional[CLIPTextConfig] = None
    clip_params: Optional[dict] = None
    t5_cfg: Optional[T5Config] = None
    t5_params: Optional[dict] = None
    scheduler: scheduling.FlowMatchConfig = field(
        default_factory=lambda: scheduling.FlowMatchConfig(
            shift=1.0, use_dynamic_shifting=False))
    tokenizer: Any = None                      # CLIP tokenizer (transformers)
    tokenizer_2: Any = None                    # T5 tokenizer
    dtype: Any = jnp.bfloat16
    prompt_cache_size: int = 0      # >0: LRU prompt-embedding cache (serving
                                    # repeats negative/condition prompts every
                                    # request; see caching.PromptLRU)
    mesh: Any = None                # set via shard(): multi-chip serving

    def __post_init__(self):
        self._program_cache: Dict[Any, Any] = {}
        self._lora = None               # models/lora.LoraSwitcher when loaded
        self._prompt_cache = caching.PromptLRU(self.prompt_cache_size)

    # ------------------------------------------------------------ multi-chip

    def shard(self, mesh) -> None:
        """Place the serving tree on a device mesh for multi-chip serving
        (the inference counterpart of Trainer(mesh=...)): params follow the
        TP/EP/ZeRO rules in parallel/sharding.py (quantized w_q/w_q4/w_scale
        leaves shard like their fp counterparts), the VAE replicates, and
        subsequent generate() calls shard their batch inputs over 'data' so
        GSPMD partitions the compiled denoise program with XLA collectives
        over ICI. Call AFTER load_lora (adapter refolds re-place onto the
        mesh automatically, at a full re-placement cost per switch)."""
        from unigen_tpu.parallel import sharding as shd
        self.mesh = mesh
        self.params = shd.shard_params(self.params, mesh)
        if self.vae_params is not None:
            self.vae_params = jax.tree.map(
                lambda x: shd.place_global(x, shd.replicated(mesh)),
                self.vae_params)

    def _place_inputs(self, tree, batch_axis: int = 0):
        """Shard array inputs over the mesh 'data' axis (replicate anything
        whose batch dim doesn't divide); no-op without a mesh."""
        if self.mesh is None:
            return tree
        from unigen_tpu.parallel import sharding as shd
        d = self.mesh.shape.get("data", 1)

        def _place(x):
            if not hasattr(x, "ndim"):
                return x
            if (x.ndim > batch_axis and d > 1
                    and x.shape[batch_axis] % d == 0):
                spec = [None] * x.ndim
                spec[batch_axis] = "data"
                return shd.place_global(
                    x, jax.sharding.NamedSharding(
                        self.mesh, jax.sharding.PartitionSpec(*spec)))
            return shd.place_global(x, shd.replicated(self.mesh))

        return jax.tree.map(_place, tree)

    # ------------------------------------------------------------ LoRA experts

    def load_lora(self, adapters_or_dir, adapter_names=None) -> None:
        """Attach per-condition LoRA experts (reference lora_switching_module
        + hook.py load_model_hook). Accepts a directory in the reference
        per-adapter layout ({dir}/{name}/pytorch_lora_weights.safetensors) or
        an in-memory adapters dict from models/lora. Works on bf16 AND
        quantized serving trees (dequant-add-requant fold)."""
        from unigen_tpu.models.lora import LoraSwitcher
        if isinstance(adapters_or_dir, str):
            from unigen_tpu.io import torch_bridge as tb
            adapters = tb.load_lora_adapters(adapters_or_dir, self.params,
                                             adapter_names, dtype=jnp.float32)
        else:
            adapters = adapters_or_dir
        self._lora = LoraSwitcher(adapters, self.params)

    def set_condition_adapter(self, names, scale: float = 1.0) -> None:
        """Fold exactly `names` (str, list, or None=disable all) into the
        live weights — the trace-time equivalent of the reference's runtime
        PEFT scaling flips. Shapes/dtypes are unchanged, so compiled programs
        are reused across switches; cost is the refold of affected linears."""
        assert self._lora is not None, "call load_lora() first"
        self.params = self._lora.switch(self.params, names, scale)
        if self.mesh is not None:
            # refolded leaves come back unplaced — keep the mesh placement
            from unigen_tpu.parallel import sharding as shd
            self.params = shd.shard_params(self.params, self.mesh)

    def _auto_switch(self, condition_prompt) -> None:
        """Per-call expert selection by condition type (enable_lora parity):
        a single condition type with a matching adapter selects it; unknown
        types (or mixed-type batches) leave the current fold untouched."""
        if self._lora is None:
            return
        names = ([condition_prompt] if isinstance(condition_prompt, str)
                 else list(dict.fromkeys(condition_prompt)))
        if len(names) == 1 and names[0] in self._lora.adapters:
            self.set_condition_adapter(names[0])

    # ------------------------------------------------------------ text

    def encode_prompt(self, prompt: Union[str, Sequence[str]],
                      max_sequence_length: int = 512
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(t5_embeds [B,T,4096], clip_pooled [B,768]). Requires tokenizers +
        encoder params (reference src/text_encoder.py:98-134)."""
        assert self.tokenizer is not None and self.clip_params is not None, \
            "text encoders not loaded; pass prompt_embeds directly"
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)

        def compute():
            clip_len = min(77, self.clip_cfg.max_position_embeddings)
            clip_ids = self.tokenizer(prompts, padding="max_length",
                                      max_length=clip_len, truncation=True,
                                      return_tensors="np").input_ids
            t5_ids = self.tokenizer_2(prompts, padding="max_length",
                                      max_length=max_sequence_length,
                                      truncation=True,
                                      return_tensors="np").input_ids
            _, _, pooled = jax.jit(partial(clip_encode, cfg=self.clip_cfg))(
                self.clip_params, input_ids=jnp.asarray(clip_ids))
            embeds = jax.jit(partial(t5_encode, cfg=self.t5_cfg))(
                self.t5_params, input_ids=jnp.asarray(t5_ids))
            return embeds.astype(self.dtype), pooled.astype(self.dtype)

        return self._prompt_cache.get_or(
            ("prompt", tuple(prompts), max_sequence_length), compute)

    def encode_condition_prompt(self, condition_prompt: Union[str, Sequence[str]]
                                ) -> jnp.ndarray:
        """Pooled embedding of the condition task name (the 1-encoder mode of
        reference encode_prompt, text_encoder.py:98-106)."""
        prompts = ([condition_prompt] if isinstance(condition_prompt, str)
                   else list(condition_prompt))

        def compute():
            clip_len = min(77, self.clip_cfg.max_position_embeddings)
            ids = self.tokenizer(prompts, padding="max_length",
                                 max_length=clip_len, truncation=True,
                                 return_tensors="np").input_ids
            _, _, pooled = jax.jit(partial(clip_encode, cfg=self.clip_cfg))(
                self.clip_params, input_ids=jnp.asarray(ids))
            return pooled.astype(self.dtype)

        return self._prompt_cache.get_or(
            ("cond", tuple(prompts)), compute)

    # ------------------------------------------------------------ core program

    def _denoise_program(self, num_steps: int, height: int, width: int,
                         true_cfg_scale: float, guidance_scale: float,
                         scale_schedule: jnp.ndarray, multi: bool,
                         cache_interval: int = 1,
                         adaptive: bool = False,
                         cfg_cache: bool = False,
                         model_cache: bool = False,
                         model_cache_order: int = 0,
                         hybrid_model_interval: int = 1,
                         hybrid_adaptive: bool = False,
                         residual_bits: int = 16):
        # adaptive=True: the program takes a trailing cache_threshold scalar
        # (traced, NOT baked in) — one compiled program serves every
        # threshold, so the knob is tunable at serving time for free.
        # cfg_cache=True (true-CFG only): replay steps skip the negative
        # stream and reuse the cached guidance delta (see pipelines/sd3.py).
        # model_cache=True: replay steps skip the ENTIRE transformer and
        # reuse the cached guided velocity prediction (zero-order hold —
        # TeaCache arXiv:2411.19108 applied to the whole model output, vs the
        # control-branch-only cache above); shares the same refresh schedule
        # machinery (fixed interval or adaptive drift threshold).
        cfg = self.cfg
        bb = cfg.flux
        vs = self.vae_cfg.downscale
        lh, lw = 2 * (height // (vs * 2)), 2 * (width // (vs * 2))
        sigmas, timesteps = scheduling.inference_sigmas(
            self.scheduler, num_steps, image_seq_len=(lh // 2) * (lw // 2))
        img_ids = prepare_latent_image_ids(lh // 2, lw // 2)
        do_cfg = true_cfg_scale > 1.0

        def program(params, vae_params, latents, control_pixels, prompt_embeds,
                    pooled, cond_pooled, neg_embeds, neg_pooled,
                    cond_id_offsets, cache_threshold=None,
                    model_threshold=None):
            # VAE-encode control image(s): [B,3,H,W] or [K,B,3,H,W]
            enc = partial(vae_lib.vae_encode, vae_params, self.vae_cfg)
            if multi:
                control_lat = jax.vmap(lambda px: pack_latents(enc(px)))(control_pixels)
                cond_ids = jax.vmap(
                    lambda off: prepare_latent_image_ids(lh // 2, lw // 2, off)
                )(cond_id_offsets)
            else:
                control_lat = pack_latents(enc(control_pixels))
                cond_ids = prepare_latent_image_ids(lh // 2, lw // 2,
                                                    cond_id_offsets)
            control_lat = control_lat.astype(self.dtype)
            b = latents.shape[0]
            txt_ids = jnp.zeros((prompt_embeds.shape[1], 3))
            guidance = (jnp.full((b,), guidance_scale, self.dtype)
                        if bb.guidance_embeds else None)

            def fwd(lat, i, embeds, pool, **kw):
                pred, _, outs = unigen_flux_forward(
                    params, cfg, hidden=lat, condition=control_lat,
                    encoder=embeds, pooled=pool, condition_pooled=cond_pooled,
                    timestep=jnp.full((b,), timesteps[i] / 1000.0, self.dtype),
                    img_ids=img_ids, txt_ids=txt_ids, condition_ids=cond_ids,
                    guidance=guidance,
                    conditioning_scale=scale_schedule[i], **kw)
                return pred, outs

            if (cache_interval <= 1 and not adaptive
                    and hybrid_model_interval <= 1 and not hybrid_adaptive):
                def step(lat, i):
                    pred, _ = fwd(lat, i, prompt_embeds, pooled)
                    if do_cfg:
                        neg, _ = fwd(lat, i, neg_embeds, neg_pooled)
                        pred = neg + true_cfg_scale * (pred - neg)
                    lat = scheduling.euler_step(lat, pred, sigmas[i],
                                                sigmas[i + 1])
                    return lat, None

                latents, _ = jax.lax.scan(step, latents, jnp.arange(num_steps))
            elif model_cache:
                # full-model output caching: a replay step costs ZERO
                # transformer compute — the carried velocity prediction is
                # applied at the step's own sigma gap (zero-order hold on the
                # flow); refresh steps run the exact full forward (incl. CFG).
                # model_cache_order=1: replay extrapolates linearly from the
                # two most recent refreshed predictions (TaylorSeer-style,
                # arXiv:2503.06923) — same cost, better fidelity at
                # aggressive intervals; falls back to zero-order until two
                # refreshes exist
                def full_pred(lat, i):
                    pred, _ = fwd(lat, i, prompt_embeds, pooled)
                    if do_cfg:
                        neg, _ = fwd(lat, i, neg_embeds, neg_pooled)
                        pred = neg + true_cfg_scale * (pred - neg)
                    return pred

                latents, n_refresh = caching.model_cache_scan(
                    full_pred, latents, sigmas, num_steps,
                    cache_interval=cache_interval, adaptive=adaptive,
                    threshold=cache_threshold if adaptive else None,
                    order=model_cache_order)
            elif hybrid_model_interval > 1 or hybrid_adaptive:
                # hybrid three-level cache (docs/SERVING.md rung 3c): full
                # refresh every cache_interval steps, base-with-control-replay
                # every hybrid_model_interval steps in between, prediction
                # replay otherwise (caching.hybrid_cache_scan)
                bb_ = cfg.flux
                s_img = (lh // 2) * (lw // 2)
                s_stream = prompt_embeds.shape[1] + s_img
                d = bb_.inner_dim
                streams = [(prompt_embeds, pooled)]
                if do_cfg:
                    streams.append((neg_embeds, neg_pooled))

                def zero_res():
                    from unigen_tpu.ops import quant as quant_lib
                    shapes = ((bb_.num_layers, b, s_img, d),
                              (bb_.num_single_layers, b, s_stream, d))
                    return tuple(quant_lib.residual_buffer(
                        s, residual_bits, self.dtype) for s in shapes)

                def combine(preds):
                    if do_cfg:
                        return preds[1] + true_cfg_scale * (preds[0]
                                                            - preds[1])
                    return preds[0]

                def full_fwd_h(lat, i):
                    outs2 = [fwd(lat, i, emb, pool,
                                 return_control_residuals=True,
                                 control_residuals_bits=residual_bits)
                             for emb, pool in streams]
                    return (combine([p for p, _ in outs2]),
                            tuple(o["control_residuals"] for _, o in outs2))

                def base_fwd_h(lat, i, res):
                    return combine([
                        fwd(lat, i, emb, pool, control_residuals=r)[0]
                        for (emb, pool), r in zip(streams, res)])

                latents, n_full, n_base = caching.hybrid_cache_scan(
                    full_fwd_h, base_fwd_h, latents, sigmas, num_steps,
                    control_interval=cache_interval,
                    model_interval=hybrid_model_interval,
                    residuals_init=tuple(zero_res() for _ in streams),
                    order=model_cache_order, adaptive=hybrid_adaptive,
                    control_threshold=cache_threshold,
                    model_threshold=model_threshold)
            else:
                # control-residual step caching (see unigen_flux_forward
                # docstring): recompute the control branch every
                # cache_interval-th step, replay the cached per-block adds in
                # between (rescaled by the live conditioning schedule)
                bb_ = cfg.flux
                s_img = (lh // 2) * (lw // 2)
                s_stream = prompt_embeds.shape[1] + s_img
                d = bb_.inner_dim

                def zero_res():
                    from unigen_tpu.ops import quant as quant_lib
                    shapes = ((bb_.num_layers, b, s_img, d),
                              (bb_.num_single_layers, b, s_stream, d))
                    return tuple(quant_lib.residual_buffer(
                        s, residual_bits, self.dtype) for s in shapes)

                streams = [(prompt_embeds, pooled)]
                if do_cfg:
                    streams.append((neg_embeds, neg_pooled))

                use_cfg_cache = cfg_cache and do_cfg

                def step(carry, i):
                    if adaptive:
                        lat, caches, delta, lat_ref, n_ref = carry
                        refresh = caching.refresh_decision(i, lat, lat_ref,
                                                           cache_threshold)
                    else:
                        lat, caches, delta = carry
                        refresh = (i % cache_interval) == 0

                    if use_cfg_cache:
                        # one shared cond: refresh computes BOTH streams and
                        # the guidance delta; replay runs only the positive
                        # stream (half the compute) and reuses the delta
                        def full():
                            outs2 = [fwd(lat, i, emb, pool,
                                         return_control_residuals=True,
                                         control_residuals_bits=residual_bits)
                                     for emb, pool in streams]
                            preds = [p for p, _ in outs2]
                            d_ = preds[0] - preds[1]
                            return (preds[1] + true_cfg_scale * d_,
                                    tuple(o["control_residuals"]
                                          for _, o in outs2), d_)

                        def replay():
                            # pred = neg + s·d = pos + (s-1)·d
                            pos, _ = fwd(lat, i, *streams[0],
                                         control_residuals=caches[0])
                            return (pos + (true_cfg_scale - 1.0) * delta,
                                    caches, delta)

                        pred, new_caches, delta = jax.lax.cond(refresh, full,
                                                               replay)
                    else:
                        preds, new_caches = [], []
                        for (emb, pool), res in zip(streams, caches):
                            def full(lat=lat, emb=emb, pool=pool):
                                pred, outs = fwd(
                                    lat, i, emb, pool,
                                    return_control_residuals=True,
                                    control_residuals_bits=residual_bits)
                                return pred, outs["control_residuals"]

                            def replay(lat=lat, emb=emb, pool=pool, res=res):
                                pred, _ = fwd(lat, i, emb, pool,
                                              control_residuals=res)
                                return pred, res

                            pred, res = jax.lax.cond(refresh, full, replay)
                            preds.append(pred)
                            new_caches.append(res)
                        new_caches = tuple(new_caches)
                        pred = preds[0]
                        if do_cfg:
                            pred = preds[1] + true_cfg_scale * (preds[0]
                                                                - preds[1])
                    lat_next = scheduling.euler_step(lat, pred, sigmas[i],
                                                     sigmas[i + 1])
                    if adaptive:
                        # the drift reference is the INPUT latent of the last
                        # refreshed step (the state the cache was computed at)
                        lat_ref = jnp.where(refresh, lat, lat_ref)
                        n_ref = n_ref + refresh.astype(jnp.int32)
                        return (lat_next, new_caches, delta, lat_ref,
                                n_ref), None
                    return (lat_next, new_caches, delta), None

                caches0 = tuple(zero_res() for _ in streams)
                delta0 = jnp.zeros_like(latents)
                if adaptive:
                    carry0 = (latents, caches0, delta0, latents,
                              jnp.zeros((), jnp.int32))
                    (latents, _, _, _, n_refresh), _ = jax.lax.scan(
                        step, carry0, jnp.arange(num_steps))
                else:
                    (latents, _, _), _ = jax.lax.scan(
                        step, (latents, caches0, delta0),
                        jnp.arange(num_steps))
            pixels = vae_lib.vae_decode(vae_params, self.vae_cfg,
                                        unpack_latents(latents.astype(jnp.float32),
                                                       lh, lw))
            if hybrid_adaptive:
                return pixels, n_full, n_base
            if adaptive:
                return pixels, n_refresh
            return pixels

        return program, (lh, lw)

    def generate(self, *, prompt_embeds, pooled, cond_pooled, control_pixels,
                 height: int = 512, width: int = 512, num_inference_steps: int = 4,
                 guidance_scale: float = 3.5, true_cfg_scale: float = 1.0,
                 neg_embeds=None, neg_pooled=None,
                 conditioning_scale: float = 1.0,
                 control_guidance_start: float = 0.0,
                 control_guidance_end: float = 1.0,
                 subject_offset: Union[bool, Sequence[bool]] = False,
                 seed: int = 0, latents: Optional[jnp.ndarray] = None,
                 control_cache_interval: int = 1,
                 control_cache_threshold: float = 0.0,
                 cfg_cache: bool = False,
                 model_cache_interval: int = 1,
                 model_cache_threshold: float = 0.0,
                 model_cache_order: int = 0,
                 residual_cache_bits: int = 16,
                 quality_profile: Optional[str] = None
                 ) -> np.ndarray:
        """Single-condition generation from precomputed embeddings.
        Returns uint8 images [B, H, W, 3].

        quality_profile picks a measured serving operating point instead of
        raw cache knobs (docs/SERVING.md; flux full topology W4A8 b=2):
        "exact" (default) — no caching, 1.371 img/s; "balanced" — hybrid
        three-level cache (c=4, m=2) with int8 residuals, 3.611 img/s at
        the same SSIM-vs-exact (0.99957) as bf16 residuals, ABSOLUTE SSIM
        vs bf16 0.99734/0.99719 (gate passed, FIDELITY_FLUX_HYBRID.json,
        measured with bf16 residuals — the int8 residual delta is below
        image-level resolution at this config); "fast" —
        full-model cache interval 4 with first-order Taylor replay,
        5.304 img/s. "fast" is schedule-aware: on schedules shorter than 8
        steps it would fail the absolute 0.99 gate (4-step SSIM 0.985 —
        k=4 over 4 steps leaves one model forward;
        FIDELITY_FLUX_FAST.json), so the selection degrades to "balanced"
        with a warning; pass explicit cache knobs to force the aggressive
        point. Mixing a profile with explicit cache knobs is an error.

        control_cache_interval > 1 enables the control-residual step cache
        (recompute the control branch + MoE preprocess every k-th denoise
        step, replay the cached per-block adds in between) — a serving-only
        approximation; measure fidelity before enabling in production.
        control_cache_threshold > 0 replaces the fixed interval with the
        adaptive drift rule (pipelines/caching.py); the refresh count taken
        lands in ``self.last_cache_refreshes``.
        cfg_cache=True (requires a caching mode + true_cfg_scale > 1):
        replay steps also skip the negative stream, reusing the cached
        guidance delta.
        model_cache_interval > 1 / model_cache_threshold > 0 enable
        FULL-MODEL output caching (replay steps skip the entire transformer
        and reuse the cached guided prediction — the most aggressive rung
        of the cache ladder, docs/SERVING.md); mutually exclusive with
        cfg_cache and the control-cache threshold.
        Setting BOTH intervals (> 1) enables the HYBRID three-level cache
        (rung 3c): full refresh every control_cache_interval steps,
        base-with-control-replay every model_cache_interval steps between,
        prediction replay otherwise — requires model_cache_interval <
        control_cache_interval with the latter a multiple of the former.
        Setting BOTH thresholds (> 0, control > model) enables the
        fully-ADAPTIVE hybrid: a step runs full when the latent drifted
        more than control_cache_threshold since the last full step, base
        when it drifted more than model_cache_threshold since the last
        prediction refresh, skip otherwise; both thresholds ride as traced
        scalars (one compiled program, live-tunable);
        last_cache_refreshes = (n_full, n_base).
        residual_cache_bits=8 stores the control-residual cache as int8
        with per-token scales (ops/quant.quantize_residual — quantized
        inside the capture scan, so the bf16 stack never materialises):
        HALF the cache HBM residency for a small measured fidelity cost.
        Only meaningful with a control-residual cache (control-cache or
        hybrid modes); orthogonal to quality_profile."""
        explicit = dict(control_cache_interval=control_cache_interval,
                        control_cache_threshold=control_cache_threshold,
                        cfg_cache=cfg_cache,
                        model_cache_interval=model_cache_interval,
                        model_cache_threshold=model_cache_threshold,
                        model_cache_order=model_cache_order)
        if residual_cache_bits != 16:
            explicit["residual_cache_bits"] = residual_cache_bits
        knobs = caching.quality_profile_knobs(
            quality_profile, caching.PROFILE_TABLES["flux"], explicit,
            num_steps=num_inference_steps)
        residual_cache_bits = knobs.get("residual_cache_bits",
                                        residual_cache_bits)
        control_cache_interval = knobs.get("control_cache_interval",
                                           control_cache_interval)
        model_cache_interval = knobs.get("model_cache_interval",
                                         model_cache_interval)
        model_cache_order = knobs.get("model_cache_order", model_cache_order)

        multi = control_pixels.ndim == 5
        steps = num_inference_steps
        keep = np.array([
            1.0 - float((i / steps < control_guidance_start)
                        or ((i + 1) / steps > control_guidance_end))
            for i in range(steps)], np.float32)
        schedule = jnp.asarray(conditioning_scale * keep)

        # one compiled program per call shape (jit caches by fn identity, so
        # the closure must be cached too or every call would recompile)
        model_cache = model_cache_interval > 1 or model_cache_threshold > 0.0
        hybrid_model_interval = 1
        hybrid_adaptive = (model_cache_threshold > 0.0
                           and control_cache_threshold > 0.0)
        if hybrid_adaptive:
            # fully-ADAPTIVE three-level cache (docs/SERVING.md rung 3c):
            # both refresh decisions are drift thresholds riding as TRACED
            # scalars — one compiled program serves any operating point
            if model_cache_interval > 1 or control_cache_interval > 1:
                raise ValueError("adaptive hybrid caching (both thresholds "
                                 "> 0) takes thresholds only; leave the "
                                 "intervals at 1")
            if cfg_cache:
                raise ValueError("cfg_cache does not compose with hybrid "
                                 "caching (skip steps already bypass the "
                                 "negative stream)")
            if control_cache_threshold <= model_cache_threshold:
                raise ValueError(
                    "adaptive hybrid caching requires control_cache_threshold"
                    " > model_cache_threshold (below it, full refreshes fire "
                    "before base ever would and the schedule degenerates to "
                    "the adaptive model cache), got "
                    f"c={control_cache_threshold} m={model_cache_threshold}")
            model_cache = False
            cache_interval = 1
            cache_threshold = 0.0
        elif model_cache_interval > 1 and control_cache_interval > 1:
            # HYBRID three-level cache (docs/SERVING.md rung 3c): full refresh
            # every control_cache_interval steps, base-with-control-replay
            # every model_cache_interval steps between, prediction replay
            # otherwise — fixed intervals only
            if control_cache_threshold > 0.0 or model_cache_threshold > 0.0:
                raise ValueError("hybrid caching takes both intervals OR "
                                 "both thresholds, not a mix")
            if cfg_cache:
                raise ValueError("cfg_cache does not compose with hybrid "
                                 "caching (skip steps already bypass the "
                                 "negative stream)")
            if (control_cache_interval <= model_cache_interval
                    or control_cache_interval % model_cache_interval):
                raise ValueError(
                    "hybrid caching requires model_cache_interval < "
                    "control_cache_interval and control_cache_interval a "
                    "multiple of model_cache_interval (every full step must "
                    "fall on a base boundary), got "
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
                                 "negative stream on replay steps")
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
        cache_key = (steps, height, width, true_cfg_scale > 1.0,
                     round(guidance_scale, 4), tuple(np.asarray(schedule)),
                     multi, cache_interval, adaptive, cfg_cache, model_cache,
                     model_cache_order, hybrid_model_interval, hybrid_adaptive,
                     residual_cache_bits)
        if cache_key in self._program_cache:
            program, (lh, lw) = self._program_cache[cache_key]
        else:
            program, (lh, lw) = self._denoise_program(
                steps, height, width, true_cfg_scale, guidance_scale, schedule,
                multi, cache_interval=cache_interval,
                adaptive=adaptive, cfg_cache=cfg_cache,
                model_cache=model_cache, model_cache_order=model_cache_order,
                hybrid_model_interval=hybrid_model_interval,
                hybrid_adaptive=hybrid_adaptive,
                residual_bits=residual_cache_bits)
            program = jax.jit(program)
            self._program_cache[cache_key] = (program, (lh, lw))

        b = prompt_embeds.shape[0]
        if latents is None:
            latents = jax.random.normal(
                jax.random.PRNGKey(seed),
                (b, (lh // 2) * (lw // 2), self.cfg.flux.in_channels), self.dtype)
        if neg_embeds is None:
            neg_embeds = jnp.zeros_like(prompt_embeds)
            neg_pooled = jnp.zeros_like(pooled)
        # subject-condition spatial-separation id offset (condition.py:118-121);
        # in multi-condition mode each condition keeps its own offset so a
        # subject stream under joint control still gets the separation trick
        if multi:
            k = control_pixels.shape[0]
            per_cond = (list(subject_offset) if not isinstance(subject_offset, bool)
                        else [subject_offset] * k)
            assert len(per_cond) == k, \
                f"subject_offset: expected {k} per-condition flags, got {per_cond}"
            offsets = jnp.asarray([lw / 2.0 if s else 0.0 for s in per_cond],
                                  jnp.float32)
        else:
            flag = (any(subject_offset) if not isinstance(subject_offset, bool)
                    else subject_offset)
            offsets = jnp.asarray(lw / 2.0 if flag else 0.0)

        if self.mesh is not None:
            # multi-chip serving: batch inputs shard over 'data', the rest
            # replicates; GSPMD partitions the program against the sharded
            # params placed by shard()
            (latents, prompt_embeds, pooled, neg_embeds,
             neg_pooled) = self._place_inputs(
                (latents, prompt_embeds, pooled, neg_embeds, neg_pooled))
            # multi-condition arrays carry a leading K axis; batch is axis 1
            cond_axis = 1 if multi else 0
            cond_pooled = self._place_inputs(cond_pooled,
                                             batch_axis=cond_axis)
            control_pixels = self._place_inputs(control_pixels,
                                                batch_axis=cond_axis)
            from unigen_tpu.parallel import sharding as shd
            offsets = shd.place_global(offsets, shd.replicated(self.mesh))

        if hybrid_adaptive:
            # BOTH thresholds ride as traced scalars: one compiled program
            # serves any (control, model) operating point, live-tunable
            pixels, n_full, n_base = program(
                self.params, self.vae_params, latents, control_pixels,
                prompt_embeds, pooled, cond_pooled, neg_embeds, neg_pooled,
                offsets, jnp.float32(control_cache_threshold),
                jnp.float32(model_cache_threshold))
            self.last_cache_refreshes = (int(n_full), int(n_base))
        elif adaptive:
            # threshold rides as a traced scalar: ONE compiled program serves
            # every threshold value (tunable at serving time, no recompile)
            pixels, n_refresh = program(
                self.params, self.vae_params, latents, control_pixels,
                prompt_embeds, pooled, cond_pooled, neg_embeds, neg_pooled,
                offsets, jnp.float32(cache_threshold))
            self.last_cache_refreshes = int(n_refresh)
        else:
            pixels = program(self.params, self.vae_params, latents,
                             control_pixels, prompt_embeds, pooled,
                             cond_pooled, neg_embeds, neg_pooled, offsets)
        from unigen_tpu.parallel.sharding import fetch_global
        imgs = fetch_global(jnp.clip(pixels.astype(jnp.float32), -1, 1))
        return ((imgs.transpose(0, 2, 3, 1) + 1) * 127.5).round().astype(np.uint8)

    # ------------------------------------------------------------ public API

    def __call__(self, prompt: Union[str, Sequence[str]],
                 condition_prompt: Union[str, Sequence[str]],
                 control_image: np.ndarray,
                 negative_prompt: Optional[Union[str, Sequence[str]]] = None,
                 height: int = 512, width: int = 512,
                 num_inference_steps: int = 4, guidance_scale: float = 3.5,
                 true_cfg_scale: float = 1.0, conditioning_scale: float = 1.0,
                 control_guidance_start: float = 0.0,
                 control_guidance_end: float = 1.0,
                 max_sequence_length: int = 512, seed: int = 0,
                 control_cache_interval: int = 1,
                 control_cache_threshold: float = 0.0,
                 cfg_cache: bool = False,
                 model_cache_interval: int = 1,
                 model_cache_threshold: float = 0.0,
                 model_cache_order: int = 0,
                 residual_cache_bits: int = 16,
                 quality_profile: Optional[str] = None) -> np.ndarray:
        """Single-condition call (reference UniGenPipeline.py:486-807).
        control_image: float array [B,3,H,W] in [-1,1]."""
        self._auto_switch(condition_prompt)
        embeds, pooled = self.encode_prompt(prompt, max_sequence_length)
        cond_pooled = self.encode_condition_prompt(condition_prompt)
        neg_embeds = neg_pooled = None
        if negative_prompt is not None and true_cfg_scale > 1.0:
            neg_embeds, neg_pooled = self.encode_prompt(negative_prompt,
                                                        max_sequence_length)
        # sequence-typed condition_prompt (one task name per batch sample)
        # triggers the offset when any sample is subject-driven; the ids are
        # shared across the batch, matching the reference's single-type batches
        subject = ("subject" == condition_prompt if isinstance(condition_prompt, str)
                   else any(cp == "subject" for cp in condition_prompt))
        return self.generate(
            prompt_embeds=embeds, pooled=pooled, cond_pooled=cond_pooled,
            control_pixels=jnp.asarray(control_image, self.dtype),
            height=height, width=width, num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, true_cfg_scale=true_cfg_scale,
            neg_embeds=neg_embeds, neg_pooled=neg_pooled,
            conditioning_scale=conditioning_scale,
            control_guidance_start=control_guidance_start,
            control_guidance_end=control_guidance_end,
            subject_offset=subject, seed=seed,
            control_cache_interval=control_cache_interval,
            control_cache_threshold=control_cache_threshold,
            cfg_cache=cfg_cache,
            model_cache_interval=model_cache_interval,
            model_cache_threshold=model_cache_threshold,
            model_cache_order=model_cache_order,
            residual_cache_bits=residual_cache_bits,
            quality_profile=quality_profile)

    def multi_condition_call(self, prompt: Union[str, Sequence[str]],
                             condition_prompts: Sequence[str],
                             control_images: Sequence[np.ndarray],
                             height: int = 512, width: int = 512,
                             num_inference_steps: int = 4,
                             guidance_scale: float = 3.5,
                             conditioning_scale: float = 1.0,
                             max_sequence_length: int = 512,
                             seed: int = 0, **kw) -> np.ndarray:
        """Multi-condition joint control (reference UniGenPipeline.py:809-1134):
        per-condition pooled embeds + stacked control images feed
        MultiCondition forward (summed expert outputs)."""
        if self._lora is not None:
            # joint control enables every present condition's expert at once
            # (reference enable_lora takes a LIST of adapters to keep active)
            present = [cp for cp in dict.fromkeys(condition_prompts)
                       if cp in self._lora.adapters]
            if present:
                self.set_condition_adapter(present)
        embeds, pooled = self.encode_prompt(prompt, max_sequence_length)
        cond_pooled = jnp.stack([self.encode_condition_prompt(cp)
                                 for cp in condition_prompts])
        control = jnp.stack([jnp.asarray(ci, self.dtype)
                             for ci in control_images])
        kw.setdefault("subject_offset",
                      [cp == "subject" for cp in condition_prompts])
        return self.generate(
            prompt_embeds=embeds, pooled=pooled, cond_pooled=cond_pooled,
            control_pixels=control, height=height, width=width,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            conditioning_scale=conditioning_scale, seed=seed, **kw)
