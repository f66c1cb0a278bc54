"""FLUX.1 MMDiT backbone, TPU-native.

Functional re-design of the frozen base transformer the reference builds on
(``FluxTransformer2DModel``; forward semantics at reference
UniGenTransformer.py:1182-1271 minus the control branch): x/context embedders,
combined timestep(+guidance)+pooled-text embedding, 19 double-stream blocks,
38 single-stream blocks over the concatenated [txt | img] stream, AdaLN
continuous output norm, linear head.

Blocks are stored STACKED (leading block axis) and applied with ``lax.scan``
— one trace per block type instead of 57, which keeps XLA compile times flat
and the HLO small. Optional rematerialisation wraps the scan bodies.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from unigen_tpu.config import FluxBackboneConfig
from unigen_tpu.layers.adaln import adaln_continuous, init_adaln
from unigen_tpu.layers.blocks_flux import (flux_double_block, flux_single_block,
                                           init_flux_double_block,
                                           init_flux_single_block)
from unigen_tpu.layers.core import init_linear, linear
from unigen_tpu.layers.embeddings import combined_time_text, init_combined_time_text
from unigen_tpu.ops.rope import rope_multi_axis
from unigen_tpu.utils import init_stacked


def init_flux_params(key, cfg: FluxBackboneConfig, *, dtype=jnp.float32) -> dict:
    d = cfg.inner_dim
    ks = jax.random.split(key, 7)
    return {
        "x_embedder": init_linear(ks[0], cfg.in_channels, d, dtype=dtype),
        "context_embedder": init_linear(ks[1], cfg.joint_attention_dim, d, dtype=dtype),
        "time_text_embed": init_combined_time_text(
            ks[2], d, cfg.pooled_projection_dim, guidance=cfg.guidance_embeds, dtype=dtype),
        "double_blocks": init_stacked(
            ks[3], cfg.num_layers,
            lambda k: init_flux_double_block(k, d, cfg.num_attention_heads,
                                             cfg.attention_head_dim, dtype=dtype)),
        "single_blocks": init_stacked(
            ks[4], cfg.num_single_layers,
            lambda k: init_flux_single_block(k, d, cfg.num_attention_heads,
                                             cfg.attention_head_dim, dtype=dtype)),
        "norm_out": init_adaln(ks[5], d, 2, dtype=dtype),
        "proj_out": init_linear(ks[6], d, cfg.out_channels, dtype=dtype),
    }


def flux_rope(cfg: FluxBackboneConfig, ids: jnp.ndarray):
    """(cos, sin) tables for id rows [S, 3] with the backbone axes_dim."""
    return rope_multi_axis(ids, cfg.axes_dims_rope, float(cfg.rope_theta))


def flux_embed_inputs(params: dict, cfg: FluxBackboneConfig, hidden, encoder,
                      pooled, timestep, guidance):
    """Shared input embedding: returns (h, enc, temb). timestep/guidance are
    raw [0,1]-scale values; the x1000 scaling happens here (reference
    UniGenTransformer.py:1218-1220)."""
    dtype = hidden.dtype
    h = linear(params["x_embedder"], hidden)
    enc = linear(params["context_embedder"], encoder)
    g = None if guidance is None else guidance.astype(jnp.float32) * 1000.0
    temb = combined_time_text(params["time_text_embed"],
                              timestep.astype(jnp.float32) * 1000.0,
                              pooled, g, dtype=dtype)
    return h, enc, temb


def flux_forward(params: dict, cfg: FluxBackboneConfig,
                 hidden: jnp.ndarray,          # [B, S_img, in_channels] packed
                 encoder: jnp.ndarray,         # [B, S_txt, joint_dim]
                 pooled: jnp.ndarray,          # [B, pooled_dim]
                 timestep: jnp.ndarray,        # [B] in [0, 1]
                 img_ids: jnp.ndarray,         # [S_img, 3]
                 txt_ids: jnp.ndarray,         # [S_txt, 3]
                 guidance: Optional[jnp.ndarray] = None,  # [B]
                 *, attn_impl: str = "auto", remat: bool = False) -> jnp.ndarray:
    """Plain (no control branch) forward: packed latent prediction [B, S, C]."""
    h, enc, temb = flux_embed_inputs(params, cfg, hidden, encoder, pooled,
                                     timestep, guidance)
    rope = flux_rope(cfg, jnp.concatenate([txt_ids, img_ids], axis=0))
    heads = cfg.num_attention_heads

    def double_body(carry, block_p):
        h, enc = carry
        enc, h = flux_double_block(block_p, h, enc, temb, rope, heads=heads,
                                   attn_impl=attn_impl)
        return (h, enc), None

    def single_body(carry, block_p):
        return flux_single_block(block_p, carry, temb, rope, heads=heads,
                                 attn_impl=attn_impl), None

    from unigen_tpu.utils import remat_wrap
    double_body = remat_wrap(double_body, remat)
    single_body = remat_wrap(single_body, remat)

    (h, enc), _ = jax.lax.scan(double_body, (h, enc), params["double_blocks"])
    stream = jnp.concatenate([enc, h], axis=1)
    stream, _ = jax.lax.scan(single_body, stream, params["single_blocks"])
    h = stream[:, enc.shape[1]:]

    h = adaln_continuous(params["norm_out"], h, temb)
    return linear(params["proj_out"], h)
