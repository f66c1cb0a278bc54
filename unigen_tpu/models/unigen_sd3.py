"""UniGenSD3 — interleaved condition-weaving control branch over a frozen SD3
backbone, plus the generic UniGenBase variant (separate control branch).

Reconstruction of reference UniGenTransformer.py:490-710 (UniGenSD3) and
:21-488 (UniGenBase):

UniGenSD3 (interleaved, the advertised variant):
  per base block i: base joint block -> control joint block
  int(i/(n_base/n_cn)) on the LIVE base hidden + fixed control context,
  condition temb -> hidden += zero_linear(cn_out) * scale. MoE preprocessing
  runs once after base block 0. cn2base_method="CrossAttn" instead feeds the
  control output as KV-append condition tokens into the NEXT base block's
  attention (reference :611-614; trainable condition_k/v live on base blocks,
  :138-141).

UniGenBase (separate branch):
  control branch runs ONCE: two preprocess weave blocks + MoE + N control
  blocks produce per-block residuals, which the base pass adds (or attends
  to) at int(i/interval) (reference :298-399). NOTE the published
  ``preprocess_block`` is never created (reference :330,334 vs :817-829 —
  dead code, SURVEY.md §2.7); we create it, keeping the intended semantics.

SD3 conventions: timestep on the 0..1000 scale; experts are pairs of
single transformer blocks with token-wise temb (use_modulate=False shipped
config) unless use_modulate/use_rope selects modulation pairs.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from unigen_tpu.config import ControlConfig, SD3BackboneConfig, UniGenConfig
from unigen_tpu.layers.adaln import adaln_continuous
from unigen_tpu.layers.blocks_sd3 import (init_sd3_joint_block,
                                          init_sd3_single_block,
                                          sd3_joint_block, sd3_single_block)
from unigen_tpu.layers.core import init_linear, init_rms_norm, linear
from unigen_tpu.layers.embeddings import (combined_time_text,
                                          init_combined_time_text,
                                          init_patch_embed, patch_embed)
from unigen_tpu.models import moe as moe_lib
from unigen_tpu.models.sd3 import (init_sd3_params, sd3_block_list,
                                   sd3_embed_inputs)
from unigen_tpu.models.unigen_flux import control_block_index_table
from unigen_tpu.ops.packing import unpatchify
from unigen_tpu.ops.rope import rope_multi_axis
from unigen_tpu.utils import index_params, init_stacked

SD3_ROPE_AXES = (8, 28, 28)  # reference UniGenTransformer.py:130


def _n_control(cfg: UniGenConfig) -> int:
    bb: SD3BackboneConfig = cfg.sd3
    return cfg.control.num_layers or bb.num_layers


def init_unigen_sd3_control(key, cfg: UniGenConfig, *, dtype=jnp.float32,
                            base_params: Optional[dict] = None,
                            base_variant: bool = False) -> dict:
    bb: SD3BackboneConfig = cfg.sd3
    cc: ControlConfig = cfg.control
    d, heads, hd = bb.inner_dim, bb.num_attention_heads, bb.attention_head_dim
    n_cn = _n_control(cfg)
    num_experts = cc.moe.num_experts(cfg.condition_nums)
    base_size = bb.sample_size // bb.patch_size
    dual = set(bb.dual_attention_layers)

    ks = iter(jax.random.split(key, 16))
    p: Dict[str, Any] = {
        "pos_embed_input": init_patch_embed(
            next(ks), bb.patch_size,
            bb.in_channels + cc.extra_conditioning_channels, d,
            bb.pos_embed_max_size, base_size,
            pos_embed_type=(None if cc.use_rope else "sincos"), dtype=dtype),
        "time_text_embed": init_combined_time_text(next(ks), d,
                                                   bb.pooled_projection_dim, dtype=dtype),
        "condition_embed": init_combined_time_text(next(ks), d,
                                                   bb.pooled_projection_dim, dtype=dtype),
        # UniGenSD3 overrides the context embedder to d->d (reference :493);
        # the UniGenBase variant keeps joint_dim->d (reference :80)
        "context_embedder": init_linear(
            next(ks), bb.joint_attention_dim if base_variant else d, d, dtype=dtype),
        # use_encoder_hidden_states=False (reference :90-100, base variant
        # only): control blocks are SINGLE transformer blocks over the
        # hidden stream — no text weave inside the control stack, and no
        # base warm-start (the reference only loads transformer_blocks into
        # the control stack when the flag is True, :155-156)
        ("joint_blocks" if cc.use_encoder_hidden_states or not base_variant
         else "single_control_blocks"): init_stacked(
            next(ks), n_cn,
            (lambda k: init_sd3_joint_block(k, d, heads, hd,
                                            qk_norm=bb.qk_norm, dtype=dtype))
            if cc.use_encoder_hidden_states or not base_variant else
            (lambda k: init_sd3_single_block(k, d, heads, hd,
                                             qk_norm=bb.qk_norm,
                                             dtype=dtype))),
        "add_blocks": init_stacked(
            next(ks), n_cn, lambda k: init_linear(k, d, d, dtype=dtype, zero=True)),
        "moe": moe_lib.init_moe_params(
            next(ks), d, bb.pooled_projection_dim, num_experts,
            modulated=(cc.use_modulate or cc.use_rope),
            expert_block_init=(None if (cc.use_modulate or cc.use_rope) else
                               (lambda k: init_sd3_single_block(
                                   k, d, heads, hd, qk_norm=bb.qk_norm, dtype=dtype))),
            dtype=dtype),
    }
    if cc.use_shared_expert:
        p["shared_expert"] = {
            "weave_cond": init_sd3_joint_block(next(ks), d, heads, hd,
                                               qk_norm=bb.qk_norm, dtype=dtype),
            "weave_text": init_sd3_joint_block(next(ks), d, heads, hd,
                                               context_pre_only=True,
                                               use_dual_attention=True,
                                               qk_norm=bb.qk_norm, dtype=dtype),
        }
    if base_variant and cc.use_pos_embed:
        # separate trainable PatchEmbed for the TARGET stream (reference
        # :53-65 control_pos_embed; warm-started from base pos_embed :146-147)
        p["pos_embed"] = init_patch_embed(
            next(ks), bb.patch_size, bb.in_channels, d, bb.pos_embed_max_size,
            base_size, pos_embed_type=(None if cc.use_rope else "sincos"),
            dtype=dtype)
    if base_variant:
        p["preprocess_block"] = {
            "b0": init_sd3_joint_block(next(ks), d, heads, hd,
                                       qk_norm=bb.qk_norm, dtype=dtype),
            "b1": init_sd3_joint_block(next(ks), d, heads, hd,
                                       qk_norm=bb.qk_norm, dtype=dtype),
        }
    if cc.cn2base_method == "CrossAttn":
        # trainable KV-append projections on every BASE block's attention
        # (reference init_trainable_param :138-141)
        inner = heads * hd
        def cross(k):
            k1, k2 = jax.random.split(k)
            out = {"condition_k": init_linear(k1, d, inner, dtype=dtype),
                   "condition_v": init_linear(k2, d, inner, dtype=dtype)}
            if bb.qk_norm == "rms_norm":
                out["condition_k_norm"] = init_rms_norm(hd, dtype=dtype)
            return out
        p["cross_kv"] = [cross(k) for k in jax.random.split(next(ks), bb.num_layers)]

    if cc.use_transformer_params and base_params is not None:
        p = warm_start_sd3_control(p, base_params, cfg)
    return p


def warm_start_sd3_control(control: dict, base: dict, cfg: UniGenConfig) -> dict:
    """init_control_param (reference :145-158): embedders + control blocks
    copied from the base. Control blocks are plain (non-dual) so only the
    plain base stack maps; dual-attention base blocks keep random init for
    mismatched leaves — the reference's strict=False load has the same
    partial-copy effect."""
    control = dict(control)
    control["time_text_embed"] = jax.tree.map(jnp.copy, base["time_text_embed"])
    control["condition_embed"] = jax.tree.map(jnp.copy, base["time_text_embed"])
    if control["context_embedder"]["w"].shape == base["context_embedder"]["w"].shape:
        control["context_embedder"] = jax.tree.map(jnp.copy, base["context_embedder"])
    if "pos_embed" in base and "proj" in control["pos_embed_input"]:
        if (control["pos_embed_input"]["proj"]["w"].shape
                == base["pos_embed"]["proj"]["w"].shape):
            control["pos_embed_input"]["proj"] = jax.tree.map(
                jnp.copy, base["pos_embed"]["proj"])
    if "pos_embed" in control and "pos_embed" in base:
        # control_pos_embed.load_state_dict(pos_embed..., strict=False) :146-147
        control["pos_embed"]["proj"] = jax.tree.map(
            jnp.copy, base["pos_embed"]["proj"])
    return control


def init_unigen_sd3_params(key, cfg: UniGenConfig, *, dtype=jnp.float32,
                           base_variant: bool = False) -> dict:
    kb, kc = jax.random.split(key)
    base = init_sd3_params(kb, cfg.sd3, dtype=dtype)
    control = init_unigen_sd3_control(kc, cfg, dtype=dtype, base_params=base,
                                      base_variant=base_variant)
    return {"base": base, "control": control}


def _sd3_rope(ids):
    return rope_multi_axis(ids, SD3_ROPE_AXES)


def _moe_with_weave_sd3(ctrl, cfg: UniGenConfig, h0, cond_tokens, control_enc,
                        control_temb, cond_temb, pooled, condition_pooled, *,
                        rng, training, attn_impl, ropes=None):
    bb, cc = cfg.sd3, cfg.control
    heads = bb.num_attention_heads
    num_experts = cc.moe.num_experts(cfg.condition_nums)
    streams = {"temb": control_temb, "condition_temb": cond_temb,
               "pooled": pooled, "condition_pooled": condition_pooled}
    out = moe_lib.moe_apply(ctrl["moe"], cc, num_experts, h0, cond_tokens,
                            streams, block_apply=sd3_single_block, heads=heads,
                            rng=rng, training=training)
    exp_h, exp_c = out.expert_hidden, out.expert_condition

    if "shared_expert" in ctrl:
        rope1 = ropes["img_cond"] if ropes else None
        cond_states, hidden_states = sd3_joint_block(
            ctrl["shared_expert"]["weave_cond"], h0, cond_tokens, cond_temb,
            rope1, heads=heads, attn_impl=attn_impl)
        rope2 = ropes["img_cond_txt"] if ropes else None
        hc_in = jnp.concatenate([hidden_states, cond_states], axis=1)
        _, hc = sd3_joint_block(ctrl["shared_expert"]["weave_text"], hc_in,
                                control_enc, control_temb, rope2, heads=heads,
                                attn_impl=attn_impl)
        s = hidden_states.shape[1]
        exp_h = hc[:, :s] + exp_h
        exp_c = hc[:, s:] + exp_c
    return moe_lib.MoEOutput(exp_h, exp_c, out.aux_loss, out.expert_counts)


class SD3Preprocess(NamedTuple):
    moe_hidden: jnp.ndarray
    control_enc: jnp.ndarray
    control_temb: jnp.ndarray
    cond_temb: jnp.ndarray
    aux_loss: jnp.ndarray
    expert_counts: jnp.ndarray


def _preprocess_sd3(ctrl, cfg: UniGenConfig, h0, enc0, condition, pooled,
                    condition_pooled, timestep, *, rng, training, attn_impl):
    bb, cc = cfg.sd3, cfg.control
    dtype = h0.dtype
    cond_tokens = patch_embed(ctrl["pos_embed_input"], condition,
                              bb.patch_size, bb.pos_embed_max_size)
    ctrl_pooled = pooled if cc.use_pooled_prompt_embeds else jnp.zeros_like(pooled)
    t = timestep.astype(jnp.float32)
    control_temb = combined_time_text(ctrl["time_text_embed"], t, ctrl_pooled,
                                      dtype=dtype)
    cond_temb = combined_time_text(ctrl["condition_embed"], t, condition_pooled,
                                   dtype=dtype)
    control_enc = linear(ctrl["context_embedder"], enc0)
    out = _moe_with_weave_sd3(ctrl, cfg, h0, cond_tokens, control_enc,
                              control_temb, cond_temb, pooled, condition_pooled,
                              rng=rng, training=training, attn_impl=attn_impl)
    return SD3Preprocess(out.expert_hidden + out.expert_condition, control_enc,
                         control_temb, cond_temb, out.aux_loss,
                         out.expert_counts)


def unigen_sd3_forward(params: dict, cfg: UniGenConfig,
                       hidden: jnp.ndarray,          # [B, C, H, W]
                       condition: jnp.ndarray,       # [B, C, H, W]
                       encoder: jnp.ndarray,         # [B, T, joint_dim]
                       pooled: jnp.ndarray,
                       condition_pooled: jnp.ndarray,
                       timestep: jnp.ndarray,        # [B], 0..1000
                       *, conditioning_scale: float = 1.0,
                       attn_impl: str = "auto",
                       rng: Optional[jax.Array] = None, training: bool = False,
                       control_residuals: Optional[jnp.ndarray] = None,
                       return_control_residuals: bool = False,
                       control_residuals_bits: int = 16
                       ) -> Tuple[jnp.ndarray, Dict, Dict]:
    """Interleaved UniGenSD3 forward (reference :581-710).

    Control-residual step caching (serving-only approximation, same scheme as
    ``unigen_flux_forward``): the cached tensor is the RAW per-base-block
    control block output ``cn_out`` stacked as [n_base, B, S_img, D] — raw
    (pre-add-linear, unscaled) so one cache serves both the ``add`` merge and
    the ``CrossAttn`` KV-append merge. Replay skips the MoE preprocess and
    every control joint block, paying only the (cheap) per-block add linear;
    with residuals captured at the same state it is bit-identical to the
    plain forward (tests/test_control_cache.py)."""
    base, ctrl = params["base"], params["control"]
    bb, cc = cfg.sd3, cfg.control
    heads = bb.num_attention_heads
    b, c, height, width = hidden.shape
    # keep a strongly-typed f32 scale from promoting bf16 activations
    conditioning_scale = jnp.asarray(conditioning_scale, hidden.dtype)
    # reference :496: the interleaved class requires joint control blocks
    assert cc.use_encoder_hidden_states, \
        "UniGenSD3 (interleaved) requires use_encoder_hidden_states=True; " \
        "the single-block control variant exists on the UniGenBase path only"

    h, enc, temb = sd3_embed_inputs(base, bb, hidden, encoder, pooled, timestep)
    blocks = sd3_block_list(base, bb)
    n_cn = _n_control(cfg)
    table = control_block_index_table(bb.num_layers, n_cn)
    cross = cc.cn2base_method == "CrossAttn"

    reuse = control_residuals is not None
    assert not (reuse and return_control_residuals), \
        "pass either control_residuals or return_control_residuals, not both"
    assert control_residuals_bits in (4, 8, 16)
    # int8/int4 residual capture/replay (same contract as
    # unigen_flux_forward): capture quantizes per block ({"q"/"q4","s"}
    # leaves, ops/quant); replay auto-detects the dict structure and
    # dequantizes per block
    from functools import partial as _partial
    from unigen_tpu.ops import quant as quant_lib
    _cap = (_partial(quant_lib.quantize_residual,
                     bits=control_residuals_bits)
            if return_control_residuals and control_residuals_bits < 16
            else (lambda r: r))
    _q = isinstance(control_residuals, dict)

    pre = None
    cond_kv = None
    cn_ys = []
    for i, block in enumerate(blocks):
        bp = block
        if cross and "cross_kv" in ctrl:
            bp = dict(block)
            bp["attn"] = {**block["attn"], **ctrl["cross_kv"][i]}
        enc_out, h = sd3_joint_block(bp, h, enc, temb, heads=heads,
                                     condition_kv_states=cond_kv,
                                     attn_impl=attn_impl)
        enc = enc_out if enc_out is not None else enc
        if reuse:
            cn_out = (quant_lib.dequantize_residual(
                jax.tree.map(lambda r: r[i], control_residuals), h.dtype)
                if _q else control_residuals[i])
        else:
            if pre is None:
                pre = _preprocess_sd3(ctrl, cfg, h, enc, condition, pooled,
                                      condition_pooled, timestep, rng=rng,
                                      training=training, attn_impl=attn_impl)
                cn_in = pre.moe_hidden
            else:
                cn_in = h
            cn_p = index_params(ctrl["joint_blocks"], table[i])
            _, cn_out = sd3_joint_block(cn_p, cn_in, pre.control_enc,
                                        pre.cond_temb, heads=heads,
                                        attn_impl=attn_impl)
            if return_control_residuals:
                cn_ys.append(_cap(cn_out))
        if cross:
            cond_kv = cn_out
        h = h + linear(index_params(ctrl["add_blocks"], table[i]), cn_out) \
            * conditioning_scale

    h = adaln_continuous(base["norm_out"], h, temb)
    h = linear(base["proj_out"], h)
    hp, wp = height // bb.patch_size, width // bb.patch_size
    out = unpatchify(h, hp, wp, bb.patch_size, bb.out_channels)
    if reuse:
        add_losses = {"moe_loss": jnp.zeros((), jnp.float32)}
        add_outputs: Dict[str, Any] = {"expert_counts": None}
    else:
        add_losses = {"moe_loss": pre.aux_loss * cc.moe.aux_loss_weight}
        add_outputs = {"expert_counts": pre.expert_counts}
    if return_control_residuals:
        add_outputs["control_residuals"] = jax.tree.map(
            lambda *xs: jnp.stack(xs), *cn_ys)
    return out, add_losses, add_outputs


def unigen_base_forward(params: dict, cfg: UniGenConfig,
                        hidden: jnp.ndarray, condition: jnp.ndarray,
                        encoder: jnp.ndarray, pooled: jnp.ndarray,
                        condition_pooled: jnp.ndarray, timestep: jnp.ndarray,
                        *, conditioning_scale: float = 1.0,
                        attn_impl: str = "auto",
                        rng: Optional[jax.Array] = None, training: bool = False,
                        control_residuals: Optional[jnp.ndarray] = None,
                        return_control_residuals: bool = False,
                        control_residuals_bits: int = 16
                        ) -> Tuple[jnp.ndarray, Dict, Dict]:
    """UniGenBase variant (reference :298-488): the control branch runs ONCE
    (preprocess weave blocks + MoE + n control blocks) producing per-block
    residuals consumed by the base pass at int(i/interval).

    Control-residual step caching: here the cached tensor is the POST-add-
    linear unscaled residual stack [n_cn, B, S, D] (the whole control branch
    is one skippable unit — nothing downstream needs the raw block outputs);
    replay runs the base pass only."""
    base, ctrl = params["base"], params["control"]
    bb, cc = cfg.sd3, cfg.control
    heads = bb.num_attention_heads
    b, c, height, width = hidden.shape
    dtype = hidden.dtype
    # keep a strongly-typed f32 scale from promoting bf16 activations
    conditioning_scale = jnp.asarray(conditioning_scale, dtype)

    reuse = control_residuals is not None
    assert not (reuse and return_control_residuals), \
        "pass either control_residuals or return_control_residuals, not both"
    assert control_residuals_bits in (4, 8, 16)
    if reuse:
        return _base_forward_with_residuals(
            params, cfg, hidden, encoder, pooled, timestep,
            control_residuals, conditioning_scale=conditioning_scale,
            attn_impl=attn_impl)

    # control branch inputs (reference control_forward :310-344); a trainable
    # control pos_embed embeds the target when use_pos_embed (:311-314)
    target_embed = ctrl.get("pos_embed", base["pos_embed"])
    ctrl_hidden = patch_embed(target_embed, hidden, bb.patch_size,
                              bb.pos_embed_max_size)
    cond_tokens = patch_embed(ctrl["pos_embed_input"], condition, bb.patch_size,
                              bb.pos_embed_max_size)
    ctrl_pooled = pooled if cc.use_pooled_prompt_embeds else jnp.zeros_like(pooled)
    t = timestep.astype(jnp.float32)
    control_temb = combined_time_text(ctrl["time_text_embed"], t, ctrl_pooled, dtype=dtype)
    cond_temb = combined_time_text(ctrl["condition_embed"], t, condition_pooled, dtype=dtype)
    control_enc = linear(ctrl["context_embedder"], encoder)

    # preprocess weave: text <-> hidden, then [hidden|text] <-> condition
    control_enc2, ctrl_hidden = sd3_joint_block(
        ctrl["preprocess_block"]["b0"], ctrl_hidden, control_enc, control_temb,
        heads=heads, attn_impl=attn_impl)
    he = jnp.concatenate([ctrl_hidden, control_enc2], axis=1)
    cond_tokens2, he2 = sd3_joint_block(
        ctrl["preprocess_block"]["b1"], he, cond_tokens, cond_temb,
        heads=heads, attn_impl=attn_impl)
    s_h = ctrl_hidden.shape[1]
    ctrl_hidden, control_enc2 = he2[:, :s_h], he2[:, s_h:]

    moe_out = _moe_with_weave_sd3(ctrl, cfg, ctrl_hidden, cond_tokens2,
                                  control_enc2, control_temb, cond_temb,
                                  pooled, condition_pooled, rng=rng,
                                  training=training, attn_impl=attn_impl)
    x = moe_out.expert_hidden + moe_out.expert_condition

    n_cn = _n_control(cfg)
    residuals = []
    for i in range(n_cn):
        if cc.use_encoder_hidden_states:
            cn_p = index_params(ctrl["joint_blocks"], i)
            control_enc2, x = sd3_joint_block(cn_p, x, control_enc2,
                                              control_temb, heads=heads,
                                              attn_impl=attn_impl)
        else:
            # single-block control stack (reference :353-356): the hidden
            # stream alone, no text weave inside the control blocks
            cn_p = index_params(ctrl["single_control_blocks"], i)
            x = sd3_single_block(cn_p, x, control_temb, heads=heads,
                                 attn_impl=attn_impl)
        res = linear(index_params(ctrl["add_blocks"], i), x)
        residuals.append(res)

    out = _base_pass_sd3(params, cfg, hidden, encoder, pooled, timestep,
                         residuals, conditioning_scale=conditioning_scale,
                         attn_impl=attn_impl)
    add_outputs: Dict[str, Any] = {"expert_counts": moe_out.expert_counts}
    if return_control_residuals:
        from functools import partial as _partial
        from unigen_tpu.ops import quant as quant_lib
        _cap = (_partial(quant_lib.quantize_residual,
                         bits=control_residuals_bits)
                if control_residuals_bits < 16 else (lambda r: r))
        add_outputs["control_residuals"] = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[_cap(r) for r in residuals])
    return out, {"moe_loss": moe_out.aux_loss * cc.moe.aux_loss_weight}, \
        add_outputs


def _base_pass_sd3(params, cfg, hidden, encoder, pooled, timestep, residuals,
                   *, conditioning_scale, attn_impl):
    """The frozen-base pass of ``unigen_base_forward``: residual injection at
    int(i/interval); residuals are UNSCALED (scale applied here, so cached
    residuals pick up the live conditioning schedule)."""
    base, ctrl = params["base"], params["control"]
    bb, cc = cfg.sd3, cfg.control
    heads = bb.num_attention_heads
    b, c, height, width = hidden.shape
    n_cn = _n_control(cfg)

    h, enc, temb = sd3_embed_inputs(base, bb, hidden, encoder, pooled, timestep)
    blocks = sd3_block_list(base, bb)
    interval = bb.num_layers / n_cn
    cross = cc.cn2base_method == "CrossAttn"
    for i, block in enumerate(blocks):
        bp = block
        res = residuals[int(i / interval)] * conditioning_scale
        cond_kv = res if cross else None
        if cross and "cross_kv" in ctrl:
            bp = dict(block)
            bp["attn"] = {**block["attn"], **ctrl["cross_kv"][i]}
        enc_out, h = sd3_joint_block(bp, h, enc, temb, heads=heads,
                                     condition_kv_states=cond_kv,
                                     attn_impl=attn_impl)
        enc = enc_out if enc_out is not None else enc
        if not cross:
            h = h + res

    h = adaln_continuous(base["norm_out"], h, temb)
    h = linear(base["proj_out"], h)
    hp, wp = height // bb.patch_size, width // bb.patch_size
    return unpatchify(h, hp, wp, bb.patch_size, bb.out_channels)


def _base_forward_with_residuals(params, cfg, hidden, encoder, pooled,
                                 timestep, control_residuals, *,
                                 conditioning_scale, attn_impl):
    """Replay path of ``unigen_base_forward``: the whole control branch is
    skipped; cached residuals drive the base pass. Quantized caches
    ({"q"/"q4","s"} dict leaves, ops/quant.quantize_residual) are
    dequantized per index."""
    if isinstance(control_residuals, dict):
        from unigen_tpu.ops import quant as quant_lib
        n = next(iter(control_residuals.values())).shape[0]
        control_residuals = [
            quant_lib.dequantize_residual(
                jax.tree.map(lambda r, i=i: r[i], control_residuals),
                hidden.dtype)
            for i in range(n)]
    out = _base_pass_sd3(params, cfg, hidden, encoder, pooled, timestep,
                         list(control_residuals),
                         conditioning_scale=conditioning_scale,
                         attn_impl=attn_impl)
    return out, {"moe_loss": jnp.zeros((), jnp.float32)}, \
        {"expert_counts": None}
