"""from_pretrained plumbing: HF-layout checkpoint directory -> pipeline.

Mirrors the reference's asset loading (train.py:259-307, infer.py:115-150):
a diffusers-layout directory with ``transformer/ vae/ text_encoder/
text_encoder_2/ tokenizer/ tokenizer_2/ scheduler/`` subfolders, plus an
optional UniGen adapter checkpoint (the reference's three formats, see
io/torch_bridge.load_adapter_checkpoint).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from unigen_tpu import config as cfg_lib
from unigen_tpu.io import serving_cache as serving_cache_lib
from unigen_tpu.io import torch_bridge as tb
from unigen_tpu.models import vae as vae_lib
from unigen_tpu.models.clip_text import CLIPTextConfig
from unigen_tpu.models.t5_text import T5Config
from unigen_tpu.pipelines import scheduling


def _subcfg(root: str, sub: str) -> dict:
    path = os.path.join(root, sub, "config.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def load_flux_pipeline(root: str, *, condition_types: Sequence[str] = ("canny",),
                       adapter_dir: Optional[str] = None,
                       dtype=jnp.bfloat16, control_overrides: Optional[dict] = None,
                       quantize: Optional[str] = None,
                       quantize_text: Optional[str] = None,
                       lora_dir: Optional[str] = None,
                       lora_adapter_names: Optional[Sequence[str]] = None,
                       serving_cache: Optional[str] = None):
    """Build a UniGenFluxPipeline from a FLUX.1 HF directory. The control
    branch is warm-started from the base unless an adapter checkpoint is
    given (reference infer.py:115-140).

    quantize: None/'bf16' keeps the load dtype; 'w4a8' applies the
    single-chip serving policy (int4 base + blocks, int8 small pieces —
    9.4 GiB for the real 12B+4.7B stack); 'w8a8' quantizes everything
    eligible to int8. Both use the bounded-memory streaming walk
    (ops/quant) so a checkpoint larger than free HBM still quantizes
    in place on one chip.

    lora_dir: per-condition LoRA experts in the reference per-adapter layout
    ({lora_dir}/{adapter}/pytorch_lora_weights.safetensors, hook.py:48-76);
    loaded AFTER quantization so switching refolds through the quantized
    tree (see pipelines/flux.load_lora).

    serving_cache (with quantize): directory for the persisted QUANTIZED
    transformer tree (io/serving_cache.py). A valid cache skips the bf16
    transformer read + streaming quantization on restart (the production
    cold-start path: read the small quantized tree directly); a missing
    cache is written after the first quantization. Topology/policy
    mismatches refuse to load."""
    from unigen_tpu.models.unigen_flux import init_unigen_flux_control
    from unigen_tpu.pipelines.flux import UniGenFluxPipeline

    tcfg = _subcfg(root, "transformer")
    flux = cfg_lib.FluxBackboneConfig(
        in_channels=tcfg.get("in_channels", 64),
        num_layers=tcfg.get("num_layers", 19),
        num_single_layers=tcfg.get("num_single_layers", 38),
        attention_head_dim=tcfg.get("attention_head_dim", 128),
        num_attention_heads=tcfg.get("num_attention_heads", 24),
        joint_attention_dim=tcfg.get("joint_attention_dim", 4096),
        pooled_projection_dim=tcfg.get("pooled_projection_dim", 768),
        guidance_embeds=tcfg.get("guidance_embeds", False),
        axes_dims_rope=tuple(tcfg.get("axes_dims_rope", (16, 56, 56))),
    )
    cfg = cfg_lib.UniGenConfig(
        family="flux", flux=flux,
        control=cfg_lib.ControlConfig(**(control_overrides or {})),
        condition_types=tuple(condition_types))

    fingerprint = {"family": "flux", "num_layers": flux.num_layers,
                   "num_single_layers": flux.num_single_layers,
                   "inner_dim": flux.inner_dim,
                   "single_control_dev": cfg.control.single_control_dev,
                   "condition_types": list(condition_types),
                   "adapter_dir": bool(adapter_dir)}
    use_cache = quantize in ("w4a8", "w8a8") and serving_cache
    if use_cache and serving_cache_lib.has_serving_tree(serving_cache):
        tree, _ = serving_cache_lib.load_serving_tree(
            serving_cache, quantize=quantize, config_fingerprint=fingerprint)
        base, control = tree["base"], tree["control"]
    else:
        sd = tb.read_checkpoint_dir(os.path.join(root, "transformer"))
        base = tb.load_flux_transformer(sd, flux.num_layers,
                                        flux.num_single_layers, dtype=dtype)
        n_cn = flux.num_layers // cfg.control.single_control_dev
        n_cn_s = flux.num_single_layers // cfg.control.single_control_dev
        if adapter_dir:
            control = tb.load_adapter_checkpoint(
                adapter_dir, n_cn=n_cn, n_cn_single=n_cn_s,
                num_experts=cfg.control.moe.num_experts(cfg.condition_nums),
                dtype=dtype, guidance=flux.guidance_embeds)
        else:
            control = init_unigen_flux_control(jax.random.PRNGKey(0), cfg,
                                               dtype=dtype, base_params=base)

        if quantize in ("w4a8", "w8a8"):
            from unigen_tpu.ops import quant
            tree = {"base": base, "control": control}
            if quantize == "w4a8":
                tree = quant.quantize_unigen_serving_streaming(tree)
            else:
                tree = quant.quantize_tree_streaming(tree)
            base, control = tree["base"], tree["control"]
            if use_cache:
                serving_cache_lib.save_serving_tree(
                    {"base": base, "control": control}, serving_cache,
                    quantize=quantize, config_fingerprint=fingerprint)

    vcfg_raw = _subcfg(root, "vae")
    vae_cfg = vae_lib.VAEConfig(
        latent_channels=vcfg_raw.get("latent_channels", 16),
        block_out_channels=tuple(vcfg_raw.get("block_out_channels",
                                              (128, 256, 512, 512))),
        layers_per_block=vcfg_raw.get("layers_per_block", 2),
        norm_num_groups=vcfg_raw.get("norm_num_groups", 32),
        scaling_factor=vcfg_raw.get("scaling_factor", 0.3611),
        shift_factor=vcfg_raw.get("shift_factor", 0.1159))
    vae_params = tb.load_vae(tb.read_checkpoint_dir(os.path.join(root, "vae")),
                             vae_cfg.block_out_channels,
                             vae_cfg.layers_per_block, dtype=jnp.float32)

    clip_raw = _subcfg(root, "text_encoder")
    clip_cfg = CLIPTextConfig(
        vocab_size=clip_raw.get("vocab_size", 49408),
        hidden_size=clip_raw.get("hidden_size", 768),
        intermediate_size=clip_raw.get("intermediate_size", 3072),
        num_layers=clip_raw.get("num_hidden_layers", 12),
        num_heads=clip_raw.get("num_attention_heads", 12),
        max_position_embeddings=clip_raw.get("max_position_embeddings", 77),
        eos_token_id=clip_raw.get("eos_token_id", 49407),
        projection_dim=clip_raw.get("projection_dim")
        if clip_raw.get("architectures", [""])[0].endswith("WithProjection") else None)
    clip_params = tb.load_clip_text(
        tb.read_checkpoint_dir(os.path.join(root, "text_encoder")),
        clip_cfg.num_layers, dtype=jnp.float32)

    t5_raw = _subcfg(root, "text_encoder_2")
    t5_cfg = T5Config(
        vocab_size=t5_raw.get("vocab_size", 32128),
        d_model=t5_raw.get("d_model", 4096), d_kv=t5_raw.get("d_kv", 64),
        d_ff=t5_raw.get("d_ff", 10240), num_layers=t5_raw.get("num_layers", 24),
        num_heads=t5_raw.get("num_heads", 64))
    t5_params = tb.load_t5_encoder(
        tb.read_checkpoint_dir(os.path.join(root, "text_encoder_2")),
        t5_cfg.num_layers, dtype=dtype)
    clip_params = _quantize_text(clip_params, quantize_text)
    t5_params = _quantize_text(t5_params, quantize_text)

    sch_raw = _subcfg(root, "scheduler") or {}
    scheduler = scheduling.FlowMatchConfig(
        shift=sch_raw.get("shift", 1.0),
        use_dynamic_shifting=sch_raw.get("use_dynamic_shifting", False),
        base_shift=sch_raw.get("base_shift", 0.5),
        max_shift=sch_raw.get("max_shift", 1.15))

    tokenizer = tokenizer_2 = None
    try:
        from transformers import CLIPTokenizer, T5TokenizerFast
        tokenizer = CLIPTokenizer.from_pretrained(os.path.join(root, "tokenizer"))
        tokenizer_2 = T5TokenizerFast.from_pretrained(os.path.join(root, "tokenizer_2"))
    except Exception:
        pass

    pipe = UniGenFluxPipeline(
        cfg=cfg, params={"base": base, "control": control},
        vae_cfg=vae_cfg, vae_params=vae_params,
        clip_cfg=clip_cfg, clip_params=clip_params,
        t5_cfg=t5_cfg, t5_params=t5_params, scheduler=scheduler,
        tokenizer=tokenizer, tokenizer_2=tokenizer_2, dtype=dtype)
    if lora_dir:
        pipe.load_lora(lora_dir, list(lora_adapter_names)
                       if lora_adapter_names else None)
    return pipe


def sd3_backbone_from_json(tcfg: dict) -> cfg_lib.SD3BackboneConfig:
    """diffusers SD3Transformer2DModel config.json -> SD3BackboneConfig
    (shared by load_sd3_pipeline and measure_fidelity --ckpt)."""
    return cfg_lib.SD3BackboneConfig(
        sample_size=tcfg.get("sample_size", 128),
        patch_size=tcfg.get("patch_size", 2),
        in_channels=tcfg.get("in_channels", 16),
        num_layers=tcfg.get("num_layers", 24),
        attention_head_dim=tcfg.get("attention_head_dim", 64),
        num_attention_heads=tcfg.get("num_attention_heads", 24),
        joint_attention_dim=tcfg.get("joint_attention_dim", 4096),
        caption_projection_dim=tcfg.get("caption_projection_dim", 1536),
        pooled_projection_dim=tcfg.get("pooled_projection_dim", 2048),
        out_channels=tcfg.get("out_channels", 16),
        pos_embed_max_size=tcfg.get("pos_embed_max_size", 384),
        dual_attention_layers=tuple(tcfg.get("dual_attention_layers", ())),
        qk_norm=tcfg.get("qk_norm"))


def sana_backbone_from_json(tcfg: dict) -> cfg_lib.SanaBackboneConfig:
    """diffusers SanaTransformer2DModel config.json -> SanaBackboneConfig."""
    return cfg_lib.SanaBackboneConfig(
        in_channels=tcfg.get("in_channels", 32),
        out_channels=tcfg.get("out_channels", 32),
        num_layers=tcfg.get("num_layers", 20),
        attention_head_dim=tcfg.get("attention_head_dim", 32),
        num_attention_heads=tcfg.get("num_attention_heads", 70),
        num_cross_attention_heads=tcfg.get("num_cross_attention_heads", 20),
        cross_attention_head_dim=tcfg.get("cross_attention_head_dim", 112),
        cross_attention_dim=tcfg.get("cross_attention_dim", 2240),
        caption_channels=tcfg.get("caption_channels", 2304),
        mlp_ratio=tcfg.get("mlp_ratio", 2.5),
        patch_size=tcfg.get("patch_size", 1),
        sample_size=tcfg.get("sample_size", 32),
        # UniGen-specific (not a diffusers SanaTransformer2DModel field):
        # pooled-embedding dim for the MoE modulation stream
        pooled_projection_dim=tcfg.get("pooled_projection_dim", 768))


def _clip_cfg_from_json(raw: dict) -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=raw.get("vocab_size", 49408),
        hidden_size=raw.get("hidden_size", 768),
        intermediate_size=raw.get("intermediate_size", 3072),
        num_layers=raw.get("num_hidden_layers", 12),
        num_heads=raw.get("num_attention_heads", 12),
        max_position_embeddings=raw.get("max_position_embeddings", 77),
        eos_token_id=raw.get("eos_token_id", 49407),
        projection_dim=raw.get("projection_dim")
        if raw.get("architectures", [""])[0].endswith("WithProjection")
        else None)


def _load_clip_bundle(root: str, sub: str, tok_sub: str):
    """(params, cfg, tokenizer) for a CLIP text-encoder subfolder, or None
    when the subfolder is absent (prompt-embed-only pipelines)."""
    enc_dir = os.path.join(root, sub)
    if not os.path.isdir(enc_dir):
        return None
    raw = _subcfg(root, sub)
    ccfg = _clip_cfg_from_json(raw)
    params = tb.load_clip_text(tb.read_checkpoint_dir(enc_dir),
                               ccfg.num_layers, dtype=jnp.float32)
    tokenizer = None
    try:
        from transformers import CLIPTokenizer
        tokenizer = CLIPTokenizer.from_pretrained(os.path.join(root, tok_sub))
    except Exception:
        pass
    return params, ccfg, tokenizer


def _quantize_text(params, quantize_text: Optional[str]):
    """Apply the text-tower serving policy (ops/quant.quantize_text_tower)
    to a loaded encoder tree. 'w8a8' -> int8, 'w4a8' -> int4 nibble-packed.
    The reference serves all text encoders bf16 (infer.py:115-149); on one
    v5e the bf16 T5-XXL alone (~9.4 GiB) cannot co-reside with the W4A8
    transformer — this knob is what makes the full prompt->image stack
    single-chip resident."""
    if params is None or quantize_text is None:
        return params
    if quantize_text not in ("w8a8", "w4a8"):
        raise ValueError(f"quantize_text must be 'w8a8'/'w4a8', got {quantize_text!r}")
    from unigen_tpu.ops import quant
    return quant.quantize_text_tower(
        params, bits=4 if quantize_text == "w4a8" else 8)


def _quantize_unigen_tree(base, control, quantize: Optional[str]):
    """Apply the serving quantization policy to a loaded sd3/sana
    {base, control} pair. 'w8a8' -> int8 everywhere eligible; 'w4a8' ->
    int4 base + int8 adapter (the measured SD3 half-memory policy — the
    flux-specific key map in quantize_unigen_serving doesn't apply to
    these families, see bench.py sd3 family rung)."""
    if quantize not in ("w4a8", "w8a8"):
        return base, control
    from unigen_tpu.ops import quant
    if quantize == "w8a8":
        tree = quant.quantize_tree_streaming({"base": base, "control": control})
        return tree["base"], tree["control"]
    return (quant.quantize_tree_streaming(base, bits=4),
            quant.quantize_tree_streaming(control, bits=8))


def load_sd3_pipeline(root: str, *, condition_types: Sequence[str] = ("depth",),
                      adapter_dir: Optional[str] = None,
                      dtype=jnp.float32, control_overrides: Optional[dict] = None,
                      quantize: Optional[str] = None,
                      quantize_text: Optional[str] = None):
    """Build a UniGenSD3Pipeline from an SD3.5 HF directory (reference
    train.py:259-307 asset loading for the SD3 family). Text encoders load
    from the SD3 triple-encoder layout (text_encoder=CLIP-L,
    text_encoder_2=CLIP-G, text_encoder_3=T5) when the subfolders exist;
    otherwise the pipeline serves prompt embeddings passed by the caller.
    quantize: 'w8a8'/'w4a8' applies the streaming serving policy to the
    transformer tree (same knob as load_flux_pipeline)."""
    from unigen_tpu.io import torch_bridge_sd3 as tb3
    from unigen_tpu.models.unigen_sd3 import init_unigen_sd3_control
    from unigen_tpu.pipelines.sd3 import UniGenSD3Pipeline

    tcfg = _subcfg(root, "transformer")
    sd3 = sd3_backbone_from_json(tcfg)
    overrides = dict(control_overrides or {})
    overrides.setdefault("use_rope", False)
    cfg = cfg_lib.UniGenConfig(family="sd3", sd3=sd3,
                               control=cfg_lib.ControlConfig(**overrides),
                               condition_types=tuple(condition_types))

    sd = tb.read_checkpoint_dir(os.path.join(root, "transformer"))
    base = tb3.load_sd3_transformer(sd, sd3, dtype=dtype)
    n_cn = cfg.control.num_layers or sd3.num_layers
    if adapter_dir:
        adapter_sd = tb.read_checkpoint_dir(adapter_dir)
        control = tb3.load_sd3_unigen_adapter(
            adapter_sd, sd3, n_cn,
            cfg.control.moe.num_experts(cfg.condition_nums), dtype=dtype,
            modulated=(cfg.control.use_modulate or cfg.control.use_rope))
    else:
        control = init_unigen_sd3_control(jax.random.PRNGKey(0), cfg,
                                          dtype=dtype, base_params=base)
    base, control = _quantize_unigen_tree(base, control, quantize)

    text_encoders = None
    clip_l = _load_clip_bundle(root, "text_encoder", "tokenizer")
    clip_g = _load_clip_bundle(root, "text_encoder_2", "tokenizer_2")
    if clip_l and clip_g:
        t5 = None
        t5_dir = os.path.join(root, "text_encoder_3")
        if os.path.isdir(t5_dir):
            t5_raw = _subcfg(root, "text_encoder_3")
            t5_cfg = T5Config(
                vocab_size=t5_raw.get("vocab_size", 32128),
                d_model=t5_raw.get("d_model", 4096),
                d_kv=t5_raw.get("d_kv", 64),
                d_ff=t5_raw.get("d_ff", 10240),
                num_layers=t5_raw.get("num_layers", 24),
                num_heads=t5_raw.get("num_heads", 64))
            t5_params = tb.load_t5_encoder(tb.read_checkpoint_dir(t5_dir),
                                           t5_cfg.num_layers, dtype=dtype)
            tok3 = None
            try:
                from transformers import T5TokenizerFast
                tok3 = T5TokenizerFast.from_pretrained(
                    os.path.join(root, "tokenizer_3"))
            except Exception:
                pass
            t5 = (_quantize_text(t5_params, quantize_text), t5_cfg, tok3)
        if quantize_text:
            clip_l = (_quantize_text(clip_l[0], quantize_text),) + clip_l[1:]
            clip_g = (_quantize_text(clip_g[0], quantize_text),) + clip_g[1:]
        text_encoders = {"clip_l": clip_l, "clip_g": clip_g, "t5": t5}

    vcfg_raw = _subcfg(root, "vae")
    vae_cfg = vae_lib.VAEConfig(
        latent_channels=vcfg_raw.get("latent_channels", 16),
        block_out_channels=tuple(vcfg_raw.get("block_out_channels",
                                              (128, 256, 512, 512))),
        layers_per_block=vcfg_raw.get("layers_per_block", 2),
        norm_num_groups=vcfg_raw.get("norm_num_groups", 32),
        scaling_factor=vcfg_raw.get("scaling_factor", 1.5305),
        shift_factor=vcfg_raw.get("shift_factor", 0.0609))
    vae_params = tb.load_vae(tb.read_checkpoint_dir(os.path.join(root, "vae")),
                             vae_cfg.block_out_channels,
                             vae_cfg.layers_per_block, dtype=jnp.float32)

    sch_raw = _subcfg(root, "scheduler") or {}
    scheduler = scheduling.FlowMatchConfig(shift=sch_raw.get("shift", 3.0))

    return UniGenSD3Pipeline(cfg=cfg, params={"base": base, "control": control},
                             vae_cfg=vae_cfg, vae_params=vae_params,
                             scheduler=scheduler, text_encoders=text_encoders,
                             dtype=dtype)


def gemma_config_from_json(raw: dict):
    """transformers Gemma2 config.json -> models/gemma_text.GemmaConfig."""
    from unigen_tpu.models.gemma_text import GemmaConfig
    return GemmaConfig(
        vocab_size=raw.get("vocab_size", 256000),
        hidden_size=raw.get("hidden_size", 2304),
        intermediate_size=raw.get("intermediate_size", 9216),
        num_layers=raw.get("num_hidden_layers", 26),
        num_heads=raw.get("num_attention_heads", 8),
        num_kv_heads=raw.get("num_key_value_heads", 4),
        head_dim=raw.get("head_dim", 256),
        rms_norm_eps=raw.get("rms_norm_eps", 1e-6),
        rope_theta=raw.get("rope_theta", 10000.0),
        attn_logit_softcapping=raw.get("attn_logit_softcapping", 50.0),
        query_pre_attn_scalar=raw.get("query_pre_attn_scalar", 256.0),
        sliding_window=raw.get("sliding_window", 4096))


def load_sana_pipeline(root: str, *, condition_types: Sequence[str] = ("canny",),
                       adapter_dir: Optional[str] = None,
                       dtype=jnp.float32, control_overrides: Optional[dict] = None,
                       quantize: Optional[str] = None,
                       quantize_text: Optional[str] = None,
                       dcae_dir: Optional[str] = None,
                       clip_dir: Optional[str] = None):
    """Build a UniGenSanaPipeline from a SANA HF directory (reference
    infer.py:115-150 asset loading applied to the SANA family, which the
    reference models but never wires into an entry point —
    UniGenTransformer.py:1453-2112).

    - transformer/adapter: validated bridges (torch_bridge_sd3).
    - text_encoder/tokenizer: Gemma-2 (golden-tested vs transformers).
    - latent codec: DC-AE in the framework-native format
      (models/dcae.save_dcae_native) from ``dcae_dir`` or ``{root}/vae``;
      when neither holds a native save, a RANDOM-INIT DC-AE is used and a
      loud warning printed — bridging released dc-ae weights needs a
      weights-available environment (ROADMAP #1).
    - clip_dir: optional CLIP-L directory for pooled prompt/condition
      embeddings (the UniGen-SANA pooled stream; the reference loads CLIP
      for every family, train.py:81-88). Absent -> callers pass
      pooled embeddings directly.
    """
    from unigen_tpu.io import torch_bridge_sd3 as tb3
    from unigen_tpu.models import dcae
    from unigen_tpu.models.sana import init_sana_unigen_control
    from unigen_tpu.pipelines.sana import UniGenSanaPipeline

    tcfg = _subcfg(root, "transformer")
    sana = sana_backbone_from_json(tcfg)
    cfg = cfg_lib.UniGenConfig(
        family="sana", sana=sana,
        control=cfg_lib.ControlConfig(**(control_overrides or {})),
        condition_types=tuple(condition_types))

    sd = tb.read_checkpoint_dir(os.path.join(root, "transformer"))
    base = tb3.load_sana_transformer(sd, sana, dtype=dtype)
    n_cn = cfg.control.num_layers or sana.num_layers
    if adapter_dir:
        control = tb3.load_sana_unigen_adapter(
            tb.read_checkpoint_dir(adapter_dir), sana, n_cn,
            cfg.control.moe.num_experts(cfg.condition_nums), dtype=dtype)
    else:
        control = init_sana_unigen_control(jax.random.PRNGKey(0), cfg,
                                           dtype=dtype, base_params=base)
    base, control = _quantize_unigen_tree(base, control, quantize)

    ae_root = dcae_dir or os.path.join(root, "vae")
    if dcae.has_dcae_native(ae_root):
        ae_params, ae_cfg = dcae.load_dcae_native(ae_root)
    else:
        import sys
        ae_cfg = dcae.DCAEConfig(latent_channels=sana.in_channels)
        ae_params = jax.jit(
            lambda k: dcae.init_dcae_params(k, ae_cfg))(jax.random.PRNGKey(2))
        print(f"# load_sana_pipeline: no native DC-AE at {ae_root} — using "
              "RANDOM-INIT codec (decoded pixels are meaningless; bridge "
              "released dc-ae weights via models/dcae.save_dcae_native)",
              file=sys.stderr)

    gemma_cfg = gemma_params = tokenizer = None
    enc_dir = os.path.join(root, "text_encoder")
    if os.path.isdir(enc_dir):
        gemma_cfg = gemma_config_from_json(_subcfg(root, "text_encoder"))
        gemma_params = tb.load_gemma_text(tb.read_checkpoint_dir(enc_dir),
                                          gemma_cfg.num_layers, dtype=dtype)
        gemma_params = _quantize_text(gemma_params, quantize_text)
        try:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(
                os.path.join(root, "tokenizer"))
        except Exception:
            pass

    clip_cfg = clip_params = tokenizer_clip = None
    if clip_dir:
        raw = {}
        cfg_path = os.path.join(clip_dir, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                raw = json.load(f)
        clip_cfg = _clip_cfg_from_json(raw)
        clip_params = tb.load_clip_text(tb.read_checkpoint_dir(clip_dir),
                                        clip_cfg.num_layers, dtype=jnp.float32)
        clip_params = _quantize_text(clip_params, quantize_text)
        try:
            from transformers import CLIPTokenizer
            tokenizer_clip = CLIPTokenizer.from_pretrained(clip_dir)
        except Exception:
            pass

    sch_raw = _subcfg(root, "scheduler") or {}
    scheduler = scheduling.FlowMatchConfig(shift=sch_raw.get("shift", 3.0))

    return UniGenSanaPipeline(
        cfg=cfg, params={"base": base, "control": control},
        ae_encode=lambda px: dcae.dcae_encode(ae_params, ae_cfg, px),
        ae_decode=lambda z: dcae.dcae_decode(ae_params, ae_cfg, z),
        ae_downscale=ae_cfg.downscale,
        gemma_cfg=gemma_cfg, gemma_params=gemma_params,
        clip_cfg=clip_cfg, clip_params=clip_params,
        tokenizer=tokenizer, tokenizer_clip=tokenizer_clip,
        scheduler=scheduler, dtype=dtype)
