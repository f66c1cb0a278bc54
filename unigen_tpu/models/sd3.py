"""SD3 / SD3.5 MMDiT backbone, TPU-native.

Functional equivalent of the frozen ``SD3Transformer2DModel`` base (used by
the reference's UniGenBase/UniGenSD3, forward semantics at reference
UniGenTransformer.py:452-488,663-710): conv patch embed + cropped sincos
table, combined timestep+pooled-text embedding (timestep on the raw 0..1000
scale), caption projection, N joint blocks (dual attention on the configured
layers, final block context-pre-only), AdaLN-continuous head, unpatchify.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from unigen_tpu.config import SD3BackboneConfig
from unigen_tpu.layers.adaln import adaln_continuous, init_adaln
from unigen_tpu.layers.blocks_sd3 import init_sd3_joint_block, sd3_joint_block
from unigen_tpu.layers.core import init_linear, linear
from unigen_tpu.layers.embeddings import (combined_time_text,
                                          init_combined_time_text,
                                          init_patch_embed, patch_embed)
from unigen_tpu.ops.packing import unpatchify
from unigen_tpu.utils import index_params


def init_sd3_params(key, cfg: SD3BackboneConfig, *, dtype=jnp.float32) -> dict:
    d = cfg.inner_dim
    ks = jax.random.split(key, 6)
    base_size = cfg.sample_size // cfg.patch_size
    # dual-attention blocks have a different tree structure (attn2, 9-chunk
    # norm); store the two groups as separate stacks.
    dual = set(cfg.dual_attention_layers)
    dual_idx = [i for i in range(cfg.num_layers) if i in dual]
    plain_idx = [i for i in range(cfg.num_layers) if i not in dual]

    def make_block(k, i):
        return init_sd3_joint_block(
            k, d, cfg.num_attention_heads, cfg.attention_head_dim,
            context_pre_only=(i == cfg.num_layers - 1), qk_norm=cfg.qk_norm,
            use_dual_attention=(i in dual), dtype=dtype)

    keys = jax.random.split(ks[3], cfg.num_layers)
    blocks = [make_block(keys[i], i) for i in range(cfg.num_layers)]
    from unigen_tpu.utils import stack_params
    p = {
        "pos_embed": init_patch_embed(ks[0], cfg.patch_size, cfg.in_channels, d,
                                      cfg.pos_embed_max_size, base_size, dtype=dtype),
        "time_text_embed": init_combined_time_text(ks[1], d,
                                                   cfg.pooled_projection_dim, dtype=dtype),
        "context_embedder": init_linear(ks[2], cfg.joint_attention_dim, d, dtype=dtype),
        "dual_blocks": stack_params([blocks[i] for i in dual_idx]) if dual_idx else None,
        "plain_blocks": stack_params([blocks[i] for i in plain_idx[:-1]])
            if len(plain_idx) > 1 else None,
        "last_block": blocks[cfg.num_layers - 1],
        "norm_out": init_adaln(ks[4], d, 2, dtype=dtype),
        "proj_out": init_linear(ks[5], d,
                                cfg.patch_size ** 2 * cfg.out_channels, dtype=dtype),
    }
    return {k: v for k, v in p.items() if v is not None}


def sd3_block_list(params: dict, cfg: SD3BackboneConfig):
    """Reconstruct the ordered per-block param list (python-side)."""
    dual = sorted(cfg.dual_attention_layers)
    plain = [i for i in range(cfg.num_layers) if i not in set(dual)]
    out = [None] * cfg.num_layers
    if "dual_blocks" in params:
        for j, i in enumerate(dual):
            out[i] = index_params(params["dual_blocks"], j)
    if "plain_blocks" in params:
        for j, i in enumerate(plain[:-1]):
            out[i] = index_params(params["plain_blocks"], j)
    out[cfg.num_layers - 1] = params["last_block"]
    return out


def sd3_embed_inputs(params: dict, cfg: SD3BackboneConfig, hidden, encoder,
                     pooled, timestep):
    """hidden [B,C,H,W] -> tokens; timestep on the 0..1000 scale (SD3
    convention — no x1000 rescale, unlike Flux)."""
    h = patch_embed(params["pos_embed"], hidden, cfg.patch_size,
                    cfg.pos_embed_max_size)
    enc = linear(params["context_embedder"], encoder)
    temb = combined_time_text(params["time_text_embed"],
                              timestep.astype(jnp.float32), pooled,
                              dtype=h.dtype)
    return h, enc, temb


def sd3_forward(params: dict, cfg: SD3BackboneConfig,
                hidden: jnp.ndarray,       # [B, C, H, W] latents
                encoder: jnp.ndarray,      # [B, T, joint_dim]
                pooled: jnp.ndarray,       # [B, pooled_dim]
                timestep: jnp.ndarray,     # [B], 0..1000
                *, attn_impl: str = "auto") -> jnp.ndarray:
    """Plain base forward (no control) -> [B, out_ch, H, W]."""
    b, c, height, width = hidden.shape
    h, enc, temb = sd3_embed_inputs(params, cfg, hidden, encoder, pooled, timestep)
    heads = cfg.num_attention_heads
    for block in sd3_block_list(params, cfg):
        enc_out, h = sd3_joint_block(block, h, enc, temb, heads=heads,
                                     attn_impl=attn_impl)
        enc = enc_out if enc_out is not None else enc
    h = adaln_continuous(params["norm_out"], h, temb)
    h = linear(params["proj_out"], h)
    hp, wp = height // cfg.patch_size, width // cfg.patch_size
    return unpatchify(h, hp, wp, cfg.patch_size, cfg.out_channels)
