"""UniGenFlux — condition-weaving control branch + MoE expert modulation over
a frozen FLUX.1 backbone. The primary model family.

Faithful TPU-native reconstruction of the reference forward graph
(UniGenTransformer.py:712-1271; call-stack SURVEY.md §3.3):

  x_embed / context_embed / time_text_embed(+guidance)
  base double block 0
  -> preprocess_moe: control embedders, MoE route+experts, consis (opt),
     shared-expert condition weave (2 joint blocks)
  -> control double block 0 on (expert_h + expert_c), gated zero-linear add
  19x [base double -> control double (idx i*n_cn//19) -> gated add]
  stream = [txt | img]
  38x [base single -> control single (idx i//2) -> overall_add | single_add]
  AdaLN-continuous out -> proj

Notes preserved from the reference (cited so parity is checkable):
  * control blocks are RoPE Flux blocks with SAMPLE-FIRST stream order and ids
    passed explicitly (the missing FluxJointRoPE/SingleRoPE classes, §2.7).
  * the control context stream is NOT threaded — every control block reads the
    fixed control_context_embedder output (UniGenTransformer.py:1091).
  * the control branch input is the LIVE base hidden state per block; only
    block 0 consumes the MoE output (UniGenTransformer.py:1086-1089).
  * control double blocks are REUSED across base blocks via
    int(i / (19 / n_cn)) (UniGenTransformer.py:1126-1127).
  * multi-condition: per-condition MoE passes share weights; expert outputs
    and condition tembs are SUMMED; aux loss/counts taken from the last
    condition (UniGenTransformer.py:1295-1322 — reference behavior, kept).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from unigen_tpu.config import ControlConfig, FluxBackboneConfig, UniGenConfig
from unigen_tpu.layers.adaln import adaln_continuous
from unigen_tpu.layers.blocks_flux import (flux_double_block, flux_single_block,
                                           init_flux_double_block,
                                           init_flux_single_block)
from unigen_tpu.layers.core import init_linear, linear
from unigen_tpu.layers.embeddings import combined_time_text, init_combined_time_text
from unigen_tpu.models import moe as moe_lib
from unigen_tpu.models.flux import flux_embed_inputs, flux_rope, init_flux_params
from unigen_tpu.utils import index_params, remat_wrap, init_stacked


def control_block_index_table(n_base: int, n_control: int) -> list:
    """Reference mapping: int(i / (n_base / n_control))."""
    interval = n_base / n_control
    return [min(int(i / interval), n_control - 1) for i in range(n_base)]


def init_unigen_flux_control(key, cfg: UniGenConfig, *, dtype=jnp.float32,
                             base_params: Optional[dict] = None) -> dict:
    """Build the trainable adapter tree (the reference's
    ``trainable_control_modules`` registry, UniGenTransformer.py:719-891).
    When ``base_params`` is given, warm-start control modules from the frozen
    base (init_control_param, :789-804): control double blocks <- base double
    blocks [0:n_cn], control singles <- base singles [0:n_cn_single], both
    time embedders <- base time_text_embed, x_embedder <- base x_embedder.
    The context embedder is NOT warm-started (reference :795 is commented out).
    """
    bb: FluxBackboneConfig = cfg.flux
    cc: ControlConfig = cfg.control
    d, heads, hd = bb.inner_dim, bb.num_attention_heads, bb.attention_head_dim
    n_cn = bb.num_layers // cc.single_control_dev
    n_cn_single = bb.num_single_layers // cc.single_control_dev
    num_experts = cc.moe.num_experts(cfg.condition_nums)

    ks = jax.random.split(key, 12)
    p: Dict[str, Any] = {
        "x_embedder": init_linear(ks[0], bb.in_channels, d, dtype=dtype),
        "time_text_embed": init_combined_time_text(
            ks[1], d, bb.pooled_projection_dim, guidance=bb.guidance_embeds, dtype=dtype),
        "condition_embed": init_combined_time_text(
            ks[2], d, bb.pooled_projection_dim, guidance=bb.guidance_embeds, dtype=dtype),
        "context_embedder": init_linear(ks[3], d, d, dtype=dtype),
        "double_blocks": init_stacked(
            ks[4], n_cn, lambda k: init_flux_double_block(k, d, heads, hd, dtype=dtype)),
        "add_double": init_stacked(
            ks[5], n_cn, lambda k: init_linear(k, d, d, dtype=dtype, zero=True)),
        "moe": moe_lib.init_moe_params(
            ks[6], d, bb.pooled_projection_dim, num_experts,
            modulated=(cc.use_modulate or cc.use_rope),
            expert_block_init=(None if (cc.use_modulate or cc.use_rope) else
                               (lambda k: init_flux_single_block(k, d, heads, hd, dtype=dtype))),
            dtype=dtype),
    }
    if cc.use_single_trans_blocks:
        p["single_blocks"] = init_stacked(
            ks[7], n_cn_single,
            lambda k: init_flux_single_block(k, d, heads, hd, dtype=dtype))
        p["add_single"] = init_stacked(
            ks[8], n_cn_single, lambda k: init_linear(k, d, d, dtype=dtype, zero=True))
    if cc.use_shared_expert:
        p["shared_expert"] = {
            "weave_cond": init_flux_double_block(ks[9], d, heads, hd, dtype=dtype),
            "weave_text": init_flux_double_block(ks[10], d, heads, hd, dtype=dtype),
        }
    if cc.use_consis_module:
        k_a, k_b = jax.random.split(ks[11])
        p["consis"] = {"block0": init_flux_double_block(k_a, d, heads, hd, dtype=dtype),
                       "block1": init_flux_double_block(k_b, d, heads, hd, dtype=dtype)}

    if cc.use_transformer_params and base_params is not None:
        p = warm_start_control(p, base_params, n_cn, n_cn_single)
    return p


def warm_start_control(control: dict, base: dict, n_cn: int, n_cn_single: int) -> dict:
    """init_control_param: copy base weights into the control branch."""
    control = dict(control)
    control["x_embedder"] = jax.tree.map(jnp.copy, base["x_embedder"])
    control["time_text_embed"] = jax.tree.map(jnp.copy, base["time_text_embed"])
    control["condition_embed"] = jax.tree.map(jnp.copy, base["time_text_embed"])
    control["double_blocks"] = jax.tree.map(
        lambda x: jnp.copy(x[:n_cn]), base["double_blocks"])
    if "single_blocks" in control:
        control["single_blocks"] = jax.tree.map(
            lambda x: jnp.copy(x[:n_cn_single]), base["single_blocks"])
    return control


def init_unigen_flux_params(key, cfg: UniGenConfig, *, dtype=jnp.float32) -> dict:
    kb, kc = jax.random.split(key)
    base = init_flux_params(kb, cfg.flux, dtype=dtype)
    control = init_unigen_flux_control(kc, cfg, dtype=dtype, base_params=base)
    return {"base": base, "control": control}


class PreprocessOutput(NamedTuple):
    moe_hidden: jnp.ndarray       # control-block-0 input
    control_enc: jnp.ndarray      # fixed control context stream
    control_temb: jnp.ndarray
    block_temb: jnp.ndarray       # condition temb (merged for multi-condition)
    aux_loss: jnp.ndarray
    expert_counts: jnp.ndarray


def _moe_with_weave(ctrl: dict, cfg: UniGenConfig, h0, cond_h, control_enc,
                    control_temb, cond_temb, pooled, condition_pooled,
                    img_rope_ids, cond_ids, txt_ids, *, rng, training,
                    attn_impl, expert_axis) -> moe_lib.MoEOutput:
    """moe_forward: route+experts, then consis (opt), then shared-expert weave
    (reference UniGenTransformer.py:969-1026)."""
    bb = cfg.flux
    cc = cfg.control
    heads = bb.num_attention_heads
    num_experts = cc.moe.num_experts(cfg.condition_nums)

    streams = {"temb": control_temb, "condition_temb": cond_temb,
               "pooled": pooled, "condition_pooled": condition_pooled}
    out = moe_lib.moe_apply(ctrl["moe"], cc, num_experts, h0, cond_h, streams,
                            block_apply=flux_single_block, heads=heads,
                            rng=rng, training=training, expert_axis=expert_axis)
    exp_h, exp_c = out.expert_hidden, out.expert_condition

    if "consis" in ctrl:
        # V2 consis: reference uses consis_module[0] for BOTH calls
        # (UniGenTransformer.py:994,998) — kept verbatim; block1 exists for
        # checkpoint-shape parity.
        rope_cc = flux_rope(bb, jnp.concatenate([cond_ids, cond_ids], 0)) if cc.use_rope else None
        _, consis_c = flux_double_block(ctrl["consis"]["block0"], exp_c, cond_h,
                                        cond_temb, rope_cc, heads=heads,
                                        context_first=False, attn_impl=attn_impl)
        rope_hc = flux_rope(bb, jnp.concatenate([img_rope_ids, cond_ids, img_rope_ids], 0)) \
            if cc.use_rope else None
        _, hc = flux_double_block(ctrl["consis"]["block0"],
                                  jnp.concatenate([exp_h, consis_c], axis=1), h0,
                                  control_temb, rope_hc, heads=heads,
                                  context_first=False, attn_impl=attn_impl)
        s = exp_h.shape[1]
        exp_h = exp_h + hc[:, :s]
        exp_c = exp_c + hc[:, s:]

    if "shared_expert" in ctrl:
        # weave 1: img stream <-> condition context (temb = condition temb)
        rope1 = flux_rope(bb, jnp.concatenate([img_rope_ids, cond_ids], 0)) if cc.use_rope else None
        cond_states, hidden_states = flux_double_block(
            ctrl["shared_expert"]["weave_cond"], h0, cond_h, cond_temb, rope1,
            heads=heads, context_first=False, attn_impl=attn_impl)
        # weave 2: [img | cond] stream <-> text context (temb = control temb)
        rope2 = flux_rope(bb, jnp.concatenate([img_rope_ids, cond_ids, txt_ids], 0)) \
            if cc.use_rope else None
        hc_in = jnp.concatenate([hidden_states, cond_states], axis=1)
        _, hc = flux_double_block(ctrl["shared_expert"]["weave_text"], hc_in,
                                  control_enc, control_temb, rope2, heads=heads,
                                  context_first=False, attn_impl=attn_impl)
        s = hidden_states.shape[1]
        exp_h = hc[:, :s] + exp_h
        exp_c = hc[:, s:] + exp_c

    return moe_lib.MoEOutput(exp_h, exp_c, out.aux_loss, out.expert_counts)


def preprocess_moe(ctrl: dict, cfg: UniGenConfig, h0, enc0, condition,
                   pooled, condition_pooled, timestep, guidance,
                   img_ids, txt_ids, condition_ids, *, rng=None,
                   training=False, attn_impl="auto",
                   expert_axis=None) -> PreprocessOutput:
    """preprocess_moe_forward for single ([B,Sc,C] condition) and multi
    (leading condition axis [K,B,Sc,C]) condition modes."""
    bb = cfg.flux
    cc = cfg.control
    dtype = h0.dtype

    ctrl_pooled = pooled if cc.use_pooled_prompt_embeds else jnp.zeros_like(pooled)
    t1000 = timestep.astype(jnp.float32) * 1000.0
    g1000 = None if guidance is None else guidance.astype(jnp.float32) * 1000.0
    control_temb = combined_time_text(ctrl["time_text_embed"], t1000, ctrl_pooled,
                                      g1000, dtype=dtype)
    control_enc = linear(ctrl["context_embedder"], enc0)

    multi = condition.ndim == 4
    conds = condition if multi else condition[None]
    cond_pooleds = condition_pooled if multi else condition_pooled[None]
    cond_id_list = condition_ids if multi else condition_ids[None]
    k_conditions = conds.shape[0]

    moe_hidden_sum = jnp.zeros_like(h0)
    block_temb_sum = jnp.zeros_like(control_temb)
    aux = jnp.zeros((), jnp.float32)
    counts = None
    for k in range(k_conditions):  # static small K
        cond_h = linear(ctrl["x_embedder"], conds[k])
        cond_temb = combined_time_text(ctrl["condition_embed"], t1000,
                                       cond_pooleds[k], g1000, dtype=dtype)
        out = _moe_with_weave(ctrl, cfg, h0, cond_h, control_enc, control_temb,
                              cond_temb, pooled, cond_pooleds[k], img_ids,
                              cond_id_list[k], txt_ids, rng=rng,
                              training=training, attn_impl=attn_impl,
                              expert_axis=expert_axis)
        moe_hidden_sum = moe_hidden_sum + out.expert_hidden + out.expert_condition
        block_temb_sum = block_temb_sum + cond_temb
        aux = out.aux_loss          # last condition (reference behavior)
        counts = out.expert_counts
    return PreprocessOutput(moe_hidden_sum, control_enc, control_temb,
                            block_temb_sum, aux, counts)


def unigen_flux_forward(params: dict, cfg: UniGenConfig,
                        hidden: jnp.ndarray, condition: jnp.ndarray,
                        encoder: jnp.ndarray, pooled: jnp.ndarray,
                        condition_pooled: jnp.ndarray, timestep: jnp.ndarray,
                        img_ids: jnp.ndarray, txt_ids: jnp.ndarray,
                        condition_ids: jnp.ndarray,
                        guidance: Optional[jnp.ndarray] = None, *,
                        conditioning_scale: float = 1.0,
                        attn_impl: str = "auto", remat: bool = False,
                        rng: Optional[jax.Array] = None, training: bool = False,
                        expert_axis: Optional[str] = None,
                        control_residuals: Optional[Tuple] = None,
                        return_control_residuals: bool = False,
                        control_residuals_bits: int = 16
                        ) -> Tuple[jnp.ndarray, Dict, Dict]:
    """Full UniGenFlux forward. condition/condition_pooled/condition_ids may
    carry a leading condition axis for multi-condition joint control.

    Returns (pred [B, S, C], add_losses, add_outputs) matching the reference
    contract (UniGenTransformer.py:1261-1271).

    Control-residual caching (serving-only approximation, beyond reference
    parity — FORA/TeaCache-style step caching applied to the control branch
    only, which is ~46% of the serving step at full topology):
      * ``return_control_residuals=True``: also return the UNSCALED per-block
        control adds in ``add_outputs["control_residuals"]`` as
        ``(dbl [n_base,B,S_img,D], sgl [n_single,B,S_stream,D])``.
      * ``control_residuals=(dbl, sgl)``: skip the MoE preprocess and every
        control block; add the cached residuals (times the CURRENT
        conditioning_scale) at the same sites. aux loss/counts are zeros.
    The prediction with residuals captured at the same state is bit-identical
    to the plain forward (tests/test_control_cache.py).

    ``control_residuals_bits=8`` captures each block's residual as int8 with
    per-token scales (``ops/quant.quantize_residual``) INSIDE the scan, so
    the bf16 residual stack never materialises — each leaf becomes
    ``{"q": int8 [L, B, S, D], "s": f32 [L, B, S, 1]}``. Replay auto-detects
    the dict structure and dequantizes per block. Halves the residual-cache
    HBM residency (the StepServer slot-count constraint) at a small,
    measured fidelity cost."""
    base, ctrl = params["base"], params["control"]
    bb = cfg.flux
    cc = cfg.control
    heads = bb.num_attention_heads
    # a strongly-typed f32 scale (e.g. a schedule-array element) must not
    # promote the bf16 residual stream — cast to the activation dtype
    scale = jnp.asarray(conditioning_scale, hidden.dtype)

    h, enc, temb = flux_embed_inputs(base, bb, hidden, encoder, pooled,
                                     timestep, guidance)
    rope_base = flux_rope(bb, jnp.concatenate([txt_ids, img_ids], axis=0))
    # control double blocks: sample-first [img | txt] order
    rope_cn_double = flux_rope(bb, jnp.concatenate([img_ids, txt_ids], axis=0)) \
        if cc.use_rope else None
    rope_single = rope_base if cc.use_rope else None

    n_base = bb.num_layers
    n_cn = n_base // cc.single_control_dev
    cn_table = jnp.asarray(control_block_index_table(n_base, n_cn))

    reuse = control_residuals is not None
    assert not (reuse and return_control_residuals), \
        "pass either control_residuals or return_control_residuals, not both"
    assert control_residuals_bits in (4, 8, 16)
    # int8/int4 residual capture/replay (ops/quant.quantize_residual):
    # capture quantizes per block INSIDE the scan (the bf16 stack never
    # materialises); replay auto-detects the {"q"/"q4","s"} dict leaves
    from functools import partial as _partial
    from unigen_tpu.ops import quant as quant_lib
    _cap = (_partial(quant_lib.quantize_residual,
                     bits=control_residuals_bits)
            if return_control_residuals and control_residuals_bits < 16
            else (lambda r: r))
    _deq = (lambda r: quant_lib.dequantize_residual(r, hidden.dtype)
            if isinstance(r, dict) else r)
    _res_at0 = (lambda res: _deq(jax.tree.map(lambda r: r[0], res))
                if isinstance(res, dict) else res[0])
    _res_rest = (lambda res: jax.tree.map(lambda r: r[1:], res)
                 if isinstance(res, dict) else res[1:])

    # ---- base double block 0 + MoE preprocess (the i==0 special case)
    block0 = index_params(base["double_blocks"], 0)
    enc, h = flux_double_block(block0, h, enc, temb, rope_base, heads=heads,
                               attn_impl=attn_impl)
    if reuse:
        dbl_res_in, sgl_res_in = control_residuals
        pre = None
        h = h + _res_at0(dbl_res_in) * scale
    else:
        pre = preprocess_moe(ctrl, cfg, h, enc, condition, pooled,
                             condition_pooled, timestep, guidance, img_ids,
                             txt_ids, condition_ids, rng=rng, training=training,
                             attn_impl=attn_impl, expert_axis=expert_axis)
        cn0 = index_params(ctrl["double_blocks"], 0)
        _, cn_out = flux_double_block(cn0, pre.moe_hidden, pre.control_enc,
                                      pre.block_temb, rope_cn_double,
                                      heads=heads, context_first=False,
                                      attn_impl=attn_impl)
        res0 = linear(index_params(ctrl["add_double"], 0), cn_out)
        h = h + res0 * scale

    # ---- double blocks 1..n-1 (scan over indices; blocks gathered by index —
    # avoids materialising a sliced copy of the stacked params)
    if reuse:
        def double_body(carry, xs):
            h, enc = carry
            i, res = xs
            block_p = index_params(base["double_blocks"], i)
            enc, h = flux_double_block(block_p, h, enc, temb, rope_base,
                                       heads=heads, attn_impl=attn_impl)
            h = h + _deq(res) * scale
            return (h, enc), None

        body = remat_wrap(double_body, remat)
        (h, enc), _ = jax.lax.scan(body, (h, enc),
                                   (jnp.arange(1, n_base),
                                    _res_rest(dbl_res_in)))
    else:
        def double_body(carry, i):
            h, enc = carry
            block_p = index_params(base["double_blocks"], i)
            enc, h = flux_double_block(block_p, h, enc, temb, rope_base,
                                       heads=heads, attn_impl=attn_impl)
            cn_p = index_params(ctrl["double_blocks"], cn_table[i])
            _, cn_out = flux_double_block(cn_p, h, pre.control_enc,
                                          pre.block_temb, rope_cn_double,
                                          heads=heads, context_first=False,
                                          attn_impl=attn_impl)
            add_p = index_params(ctrl["add_double"], cn_table[i])
            res = linear(add_p, cn_out)
            h = h + res * scale
            return (h, enc), (_cap(res) if return_control_residuals else None)

        body = remat_wrap(double_body, remat)
        (h, enc), dbl_ys = jax.lax.scan(body, (h, enc), jnp.arange(1, n_base))

    # ---- single blocks over [txt | img]
    stream = jnp.concatenate([enc, h], axis=1)
    enc_len = enc.shape[1]

    if cc.use_single_trans_blocks and "single_blocks" in ctrl:
        n_s = bb.num_single_layers
        n_cn_s = n_s // cc.single_control_dev
        cn_s_table = jnp.asarray(control_block_index_table(n_s, n_cn_s))

        def _apply_single_add(stream, zc):
            if cc.single_block_control_method == "overall_add":
                return stream + zc
            # single_add: image section only
            return jnp.concatenate(
                [stream[:, :enc_len], stream[:, enc_len:] + zc[:, enc_len:]],
                axis=1)

        if reuse:
            def single_body(stream, xs):
                block_p, res = xs
                stream = flux_single_block(block_p, stream, temb, rope_base,
                                           heads=heads, attn_impl=attn_impl)
                return _apply_single_add(stream, _deq(res) * scale), None

            sbody = remat_wrap(single_body, remat)
            stream, _ = jax.lax.scan(sbody, stream,
                                     (base["single_blocks"], sgl_res_in))
        else:
            def single_body(stream, xs):
                block_p, cn_idx = xs
                stream = flux_single_block(block_p, stream, temb, rope_base,
                                           heads=heads, attn_impl=attn_impl)
                cn_p = index_params(ctrl["single_blocks"], cn_idx)
                cn_out = flux_single_block(cn_p, stream, pre.block_temb,
                                           rope_single, heads=heads,
                                           attn_impl=attn_impl)
                add_p = index_params(ctrl["add_single"], cn_idx)
                res = linear(add_p, cn_out)
                stream = _apply_single_add(stream, res * scale)
                return stream, (_cap(res) if return_control_residuals
                                else None)

            sbody = remat_wrap(single_body, remat)
            stream, sgl_ys = jax.lax.scan(sbody, stream,
                                          (base["single_blocks"], cn_s_table))
    else:
        def single_body_plain(stream, block_p):
            return flux_single_block(block_p, stream, temb, rope_base,
                                     heads=heads, attn_impl=attn_impl), None
        sbody = remat_wrap(single_body_plain, remat)
        stream, _ = jax.lax.scan(sbody, stream, base["single_blocks"])

    h = stream[:, enc_len:]
    h = adaln_continuous(base["norm_out"], h, temb)
    pred = linear(base["proj_out"], h)

    if reuse:
        add_losses = {"moe_loss": jnp.zeros((), jnp.float32)}
        add_outputs: Dict[str, Any] = {"expert_counts": None}
    else:
        add_losses = {"moe_loss": pre.aux_loss * cfg.control.moe.aux_loss_weight}
        add_outputs = {"expert_counts": pre.expert_counts}
    if return_control_residuals:
        assert cc.use_single_trans_blocks and "single_blocks" in ctrl, \
            "control-residual caching requires the single-block control path"
        add_outputs["control_residuals"] = (
            jax.tree.map(lambda a, b: jnp.concatenate([a[None], b], axis=0),
                         _cap(res0), dbl_ys), sgl_ys)
    return pred, add_losses, add_outputs
