"""SANA linear-attention DiT backbone + SANAUniGen control variant.

Re-design of the reference SANAUniGen (UniGenTransformer.py:1453-2112) on a
functional SanaTransformer2DModel equivalent: conv patch embed (patch 1, no
positional table), AdaLayerNormSingle time embedding (timestep on the raw
scheduler scale), PixArt caption projection + RMS caption norm, N blocks of
[linear self-attn -> text cross-attn -> GLUMBConv], scale-shift-table output
norm, unpatchify.

Control wiring (1:1 interleave by default): per base block, a control
SanaTransformerBlock runs on the live base hidden with the fixed control
caption stream and the control AdaLayerNormSingle projection; its output
passes a zero-init linear and adds into the base stream
(reference :1948-2003). MoE preprocessing runs once after base block 0; the
shared expert is ONE Sana block over [img | cond] with the caption stream as
cross-attn context (reference :1857-1896, second block of the pair exists
but is unused — kept for checkpoint parity).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from unigen_tpu.config import ControlConfig, SanaBackboneConfig, UniGenConfig
from unigen_tpu.layers.blocks_sana import (adaln_single, init_adaln_single,
                                           init_sana_block, sana_block)
from unigen_tpu.layers.core import (init_linear, init_rms_norm, layer_norm,
                                    linear, rms_norm)
from unigen_tpu.layers.embeddings import pixart_text_projection
from unigen_tpu.models import moe as moe_lib
from unigen_tpu.ops.packing import patchify, unpatchify
from unigen_tpu.utils import index_params, init_stacked


def init_sana_params(key, cfg: SanaBackboneConfig, *, dtype=jnp.float32) -> dict:
    d = cfg.inner_dim
    ks = jax.random.split(key, 7)
    return {
        "patch_embed": init_linear(ks[0], cfg.in_channels * cfg.patch_size ** 2,
                                   d, dtype=dtype),
        "time_embed": init_adaln_single(ks[1], d, dtype=dtype),
        "caption_projection": {"fc1": init_linear(ks[2], cfg.caption_channels, d, dtype=dtype),
                               "fc2": init_linear(ks[3], d, d, dtype=dtype)},
        "caption_norm": init_rms_norm(d, dtype=dtype),
        "blocks": init_stacked(ks[4], cfg.num_layers,
                               lambda k: init_sana_block(
                                   k, d, cfg.num_attention_heads,
                                   cfg.attention_head_dim,
                                   cross_heads=cfg.num_cross_attention_heads,
                                   cross_head_dim=cfg.cross_attention_head_dim,
                                   mlp_ratio=cfg.mlp_ratio, dtype=dtype)),
        "scale_shift_table": jax.random.normal(ks[5], (2, d), dtype) / d ** 0.5,
        "proj_out": init_linear(ks[6], d, cfg.patch_size ** 2 * cfg.out_channels,
                                dtype=dtype),
    }


def sana_embed_inputs(params, cfg: SanaBackboneConfig, hidden, encoder, timestep):
    h = linear(params["patch_embed"], patchify(hidden, cfg.patch_size))
    proj_t, embedded_t = adaln_single(params["time_embed"], timestep,
                                      dtype=h.dtype)
    # PixArtAlphaTextProjection default act: GELU(tanh), not silu —
    # pinned by the torch e2e golden (reference applies the diffusers
    # class at UniGenTransformer.py:2066)
    enc = pixart_text_projection(params["caption_projection"], encoder)
    enc = rms_norm(params["caption_norm"], enc, eps=1e-5)
    return h, enc, proj_t, embedded_t


def sana_forward(params: dict, cfg: SanaBackboneConfig,
                 hidden: jnp.ndarray,        # [B, C, H, W]
                 encoder: jnp.ndarray,       # [B, T, caption_channels]
                 timestep: jnp.ndarray,      # [B], scheduler scale
                 encoder_mask: Optional[jnp.ndarray] = None, *,
                 attn_impl: str = "auto") -> jnp.ndarray:
    b, c, height, width = hidden.shape
    hp, wp = height // cfg.patch_size, width // cfg.patch_size
    h, enc, proj_t, emb_t = sana_embed_inputs(params, cfg, hidden, encoder, timestep)

    def body(h, block_p):
        return sana_block(block_p, h, enc, proj_t, hp, wp,
                          heads=cfg.num_attention_heads,
                          cross_heads=cfg.num_cross_attention_heads,
                          ctx_mask=encoder_mask, attn_impl=attn_impl), None

    h, _ = jax.lax.scan(body, h, params["blocks"])

    mods = params["scale_shift_table"][None] + emb_t[:, None, :]
    shift, scale = mods[:, 0][:, None, :], mods[:, 1][:, None, :]
    h = layer_norm(h) * (1 + scale) + shift
    h = linear(params["proj_out"], h)
    return unpatchify(h, hp, wp, cfg.patch_size, cfg.out_channels)


# ------------------------------------------------------------ SANAUniGen

def init_sana_unigen_control(key, cfg: UniGenConfig, *, dtype=jnp.float32,
                             base_params: Optional[dict] = None) -> dict:
    bb: SanaBackboneConfig = cfg.sana
    cc: ControlConfig = cfg.control
    d = bb.inner_dim
    n_cn = cc.num_layers or bb.num_layers
    num_experts = cc.moe.num_experts(cfg.condition_nums)
    ks = jax.random.split(key, 8)

    def blk(k):
        return init_sana_block(k, d, bb.num_attention_heads, bb.attention_head_dim,
                               cross_heads=bb.num_cross_attention_heads,
                               cross_head_dim=bb.cross_attention_head_dim,
                               mlp_ratio=bb.mlp_ratio, dtype=dtype)

    p = {
        "pos_embed_input": init_linear(ks[0], bb.in_channels * bb.patch_size ** 2,
                                       d, dtype=dtype),
        "condition_embed": init_adaln_single(ks[1], d, dtype=dtype),
        "context_embedder": init_linear(ks[2], d, d, dtype=dtype),
        "blocks": init_stacked(ks[3], n_cn, blk),
        "add_blocks": init_stacked(ks[4], n_cn,
                                   lambda k: init_linear(k, d, d, dtype=dtype, zero=True)),
        "moe": moe_lib.init_moe_params(
            ks[5], d, bb.pooled_projection_dim, num_experts,
            modulated=True,  # SANA block experts cannot take per-token temb
            dtype=dtype),
    }
    if cc.use_shared_expert:
        k_a, k_b = jax.random.split(ks[6])
        p["shared_expert"] = {"block0": blk(k_a), "block1": blk(k_b)}
    if cc.use_transformer_params and base_params is not None:
        p["pos_embed_input"] = jax.tree.map(jnp.copy, base_params["patch_embed"])
        p["condition_embed"] = jax.tree.map(jnp.copy, base_params["time_embed"])
        p["blocks"] = jax.tree.map(lambda x: jnp.copy(x[:n_cn]),
                                   base_params["blocks"])
    return p


def init_sana_unigen_params(key, cfg: UniGenConfig, *, dtype=jnp.float32) -> dict:
    kb, kc = jax.random.split(key)
    base = init_sana_params(kb, cfg.sana, dtype=dtype)
    return {"base": base,
            "control": init_sana_unigen_control(kc, cfg, dtype=dtype,
                                                base_params=base)}


class SanaPreprocess(NamedTuple):
    moe_hidden: jnp.ndarray
    control_enc: jnp.ndarray
    cond_temb: jnp.ndarray
    aux_loss: jnp.ndarray
    expert_counts: jnp.ndarray


def sana_unigen_forward(params: dict, cfg: UniGenConfig,
                        hidden: jnp.ndarray, condition: jnp.ndarray,
                        encoder: jnp.ndarray, pooled: jnp.ndarray,
                        condition_pooled: jnp.ndarray, timestep: jnp.ndarray,
                        encoder_mask: Optional[jnp.ndarray] = None, *,
                        conditioning_scale: float = 1.0,
                        attn_impl: str = "auto",
                        rng: Optional[jax.Array] = None,
                        training: bool = False,
                        control_residuals: Optional[jnp.ndarray] = None,
                        return_control_residuals: bool = False,
                        control_residuals_bits: int = 16
                        ) -> Tuple[jnp.ndarray, Dict, Dict]:
    """Control-residual step caching (serving-only approximation, same scheme
    as ``unigen_flux_forward``): the cached tensor is the RAW per-base-block
    control block output stacked [n_base, B, S, D] (pre-add-linear, unscaled).
    ``control_residuals=...`` skips the MoE preprocess + every control block
    and replays the cached adds; ``return_control_residuals=True`` captures
    them. Bit-identical to the plain forward when replayed at the same state
    (tests/test_control_cache.py)."""
    base, ctrl = params["base"], params["control"]
    bb, cc = cfg.sana, cfg.control
    b, c, height, width = hidden.shape
    # keep a strongly-typed f32 scale from promoting bf16 activations
    conditioning_scale = jnp.asarray(conditioning_scale, hidden.dtype)
    hp, wp = height // bb.patch_size, width // bb.patch_size
    heads, xheads = bb.num_attention_heads, bb.num_cross_attention_heads
    num_experts = cc.moe.num_experts(cfg.condition_nums)

    h, enc, proj_t, emb_t = sana_embed_inputs(base, bb, hidden, encoder, timestep)
    # stack depth from whichever weight form is present (bf16 'w' or the
    # quantized w_q/w_q4 serving layouts — leading axis is the stack either way)
    ab = ctrl["add_blocks"]
    n_cn = next(ab[k] for k in ("w", "w_q", "w_q4") if k in ab).shape[0]
    interval = bb.num_layers / n_cn

    reuse = control_residuals is not None
    assert not (reuse and return_control_residuals), \
        "pass either control_residuals or return_control_residuals, not both"
    assert control_residuals_bits in (4, 8, 16)
    # int8/int4 residual capture/replay (same contract as
    # unigen_flux_forward): capture quantizes per block inside the scan;
    # replay auto-detects the {"q"/"q4","s"} dict leaves per block
    from functools import partial as _partial
    from unigen_tpu.ops import quant as quant_lib
    _cap = (_partial(quant_lib.quantize_residual,
                     bits=control_residuals_bits)
            if return_control_residuals and control_residuals_bits < 16
            else (lambda r: r))
    _deq = (lambda r: quant_lib.dequantize_residual(r, hidden.dtype)
            if isinstance(r, dict) else r)
    cn_table = jnp.asarray([int(i / interval) for i in range(bb.num_layers)])

    # ---- base block 0 + MoE preprocess (the i==0 special case)
    h = sana_block(index_params(base["blocks"], 0), h, enc, proj_t, hp, wp,
                   heads=heads, cross_heads=xheads, ctx_mask=encoder_mask,
                   attn_impl=attn_impl)
    if reuse:
        def add_cached(h, cn_out, cn_idx):
            return h + linear(index_params(ctrl["add_blocks"], cn_idx),
                              _deq(cn_out)) * conditioning_scale

        quantized = isinstance(control_residuals, dict)
        first = (jax.tree.map(lambda r: r[0], control_residuals)
                 if quantized else control_residuals[0])
        rest = (jax.tree.map(lambda r: r[1:], control_residuals)
                if quantized else control_residuals[1:])
        h = add_cached(h, first, 0)

        def body_reuse(h, xs):
            i, cn_out = xs
            h = sana_block(index_params(base["blocks"], i), h, enc, proj_t,
                           hp, wp, heads=heads, cross_heads=xheads,
                           ctx_mask=encoder_mask, attn_impl=attn_impl)
            return add_cached(h, cn_out, cn_table[i]), None

        h, _ = jax.lax.scan(body_reuse, h,
                            (jnp.arange(1, bb.num_layers), rest))
        pre = None
    else:
        cond_tokens = linear(ctrl["pos_embed_input"],
                             patchify(condition, bb.patch_size))
        cond_proj_t, _ = adaln_single(ctrl["condition_embed"], timestep,
                                      dtype=h.dtype)
        control_enc = linear(ctrl["context_embedder"], enc)
        streams = {"temb": cond_proj_t, "condition_temb": cond_proj_t,
                   "pooled": pooled, "condition_pooled": condition_pooled}
        out = moe_lib.moe_apply(ctrl["moe"], cc, num_experts, h,
                                cond_tokens, streams, rng=rng, training=training)
        exp_h, exp_c = out.expert_hidden, out.expert_condition
        if "shared_expert" in ctrl:
            hc = jnp.concatenate([h, cond_tokens], axis=1)
            hc = sana_block(ctrl["shared_expert"]["block0"], hc, control_enc,
                            cond_proj_t, 2 * hp, wp, heads=heads,
                            cross_heads=xheads, ctx_mask=encoder_mask,
                            attn_impl=attn_impl)
            s = h.shape[1]
            exp_h = hc[:, :s] + exp_h
            exp_c = hc[:, s:] + exp_c
        pre = SanaPreprocess(exp_h + exp_c, control_enc, cond_proj_t,
                             out.aux_loss, out.expert_counts)

        def cn_apply(cn_in, h, cn_idx):
            cn_out = sana_block(index_params(ctrl["blocks"], cn_idx), cn_in,
                                pre.control_enc, pre.cond_temb, hp, wp,
                                heads=heads, cross_heads=xheads,
                                ctx_mask=encoder_mask, attn_impl=attn_impl)
            h = h + linear(index_params(ctrl["add_blocks"], cn_idx), cn_out) \
                * conditioning_scale
            return h, cn_out

        h, cn0 = cn_apply(pre.moe_hidden, h, 0)

        # ---- blocks 1..n-1 under lax.scan (blocks gathered by index, like
        # unigen_flux — the unrolled loop compiled 5x slower and scheduled
        # poorly at batch >1 on device)
        def body(h, i):
            h = sana_block(index_params(base["blocks"], i), h, enc, proj_t, hp,
                           wp, heads=heads, cross_heads=xheads,
                           ctx_mask=encoder_mask, attn_impl=attn_impl)
            h, cn_out = cn_apply(h, h, cn_table[i])
            return h, (_cap(cn_out) if return_control_residuals else None)

        h, cn_ys = jax.lax.scan(body, h, jnp.arange(1, bb.num_layers))

    mods = base["scale_shift_table"][None] + emb_t[:, None, :]
    shift, scale = mods[:, 0][:, None, :], mods[:, 1][:, None, :]
    h = layer_norm(h) * (1 + scale) + shift
    h = linear(base["proj_out"], h)
    out_img = unpatchify(h, hp, wp, bb.patch_size, bb.out_channels)
    if reuse:
        add_losses = {"moe_loss": jnp.zeros((), jnp.float32)}
        add_outputs: Dict[str, Any] = {"expert_counts": None}
    else:
        add_losses = {"moe_loss": pre.aux_loss * cc.moe.aux_loss_weight}
        add_outputs = {"expert_counts": pre.expert_counts}
    if return_control_residuals:
        add_outputs["control_residuals"] = jax.tree.map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0),
            _cap(cn0), cn_ys)
    return out_img, add_losses, add_outputs
