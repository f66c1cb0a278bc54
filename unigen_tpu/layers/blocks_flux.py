"""FLUX MMDiT blocks (double-stream and single-stream), functional.

These serve both the frozen base stacks and the trainable control stacks:
the reference's missing ``FluxJointRoPETransformerBlock`` /
``FluxSingleRoPETransformerBlock`` (UniGenTransformer.py:746,763 — defined
nowhere in the published source) are structurally the same blocks with RoPE
tables built from explicitly passed ids, so one implementation covers both.
``context_first`` selects the stream concat order: the diffusers base block
puts context first; the reference's control-branch RoPE processor puts the
sample stream first (src/UniGenUtils.py:587-593).

All apply fns accept temb of shape [B, D] or token-wise [B, S, D] (the MoE
expert path dispatches temb per token).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from unigen_tpu.layers.adaln import (adaln_zero, adaln_zero_single, init_adaln,
                                     modulate)
from unigen_tpu.layers.attention import init_joint_attention, joint_attention
from unigen_tpu.layers.core import (gelu_tanh, init_linear, init_mlp,
                                    layer_norm, linear, mlp)


def init_flux_double_block(key, dim: int, heads: int, head_dim: int, *,
                           dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 5)
    return {
        "norm1": init_adaln(ks[0], dim, 6, dtype=dtype),
        "norm1_context": init_adaln(ks[1], dim, 6, dtype=dtype),
        "attn": init_joint_attention(ks[2], dim, heads, head_dim, context=True,
                                     qk_norm="rms_norm", dtype=dtype),
        "ff": init_mlp(ks[3], dim, dtype=dtype),
        "ff_context": init_mlp(ks[4], dim, dtype=dtype),
    }


def flux_double_block(p: dict, x: jnp.ndarray, ctx: jnp.ndarray,
                      temb: jnp.ndarray,
                      rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None, *,
                      heads: int, context_first: bool = True,
                      attn_impl: str = "auto"
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (ctx_out, x_out) — the diffusers FluxTransformerBlock order."""
    nx, g_msa, s_mlp, sc_mlp, g_mlp = adaln_zero(p["norm1"], x, temb)
    nc, cg_msa, cs_mlp, csc_mlp, cg_mlp = adaln_zero(p["norm1_context"], ctx, temb)

    attn_x, attn_c = joint_attention(p["attn"], nx, nc, heads=heads, rope=rope,
                                     context_first=context_first,
                                     attn_impl=attn_impl)
    x = x + g_msa * attn_x
    nx2 = modulate(layer_norm(x), s_mlp, sc_mlp)
    x = x + g_mlp * mlp(p["ff"], nx2)

    ctx = ctx + cg_msa * attn_c
    nc2 = modulate(layer_norm(ctx), cs_mlp, csc_mlp)
    ctx = ctx + cg_mlp * mlp(p["ff_context"], nc2)
    return ctx, x


def init_flux_single_block(key, dim: int, heads: int, head_dim: int, *,
                           mlp_ratio: int = 4, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 4)
    return {
        "norm": init_adaln(ks[0], dim, 3, dtype=dtype),
        "attn": init_joint_attention(ks[1], dim, heads, head_dim, context=False,
                                     pre_only=True, qk_norm="rms_norm", dtype=dtype),
        "proj_mlp": init_linear(ks[2], dim, dim * mlp_ratio, dtype=dtype),
        "proj_out": init_linear(ks[3], dim + dim * mlp_ratio, dim, dtype=dtype),
    }


def flux_single_block(p: dict, x: jnp.ndarray, temb: jnp.ndarray,
                      rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None, *,
                      heads: int, attn_impl: str = "auto") -> jnp.ndarray:
    """Parallel attention + MLP with fused output projection."""
    residual = x
    nx, g = adaln_zero_single(p["norm"], x, temb)
    mlp_h = gelu_tanh(linear(p["proj_mlp"], nx))
    attn_h, _ = joint_attention(p["attn"], nx, None, heads=heads, rope=rope,
                                attn_impl=attn_impl)
    out = linear(p["proj_out"], jnp.concatenate([attn_h, mlp_h], axis=-1))
    return residual + g * out
