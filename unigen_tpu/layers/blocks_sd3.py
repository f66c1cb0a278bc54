"""SD3 MMDiT blocks: joint double-stream block (with optional dual attention)
and the self-attention-only single block.

Cover both the frozen SD3.5 base stack and the reference's control-branch
variants (``JointTransformerBlock`` / ``SD3SingleTransformerBlock`` /
``*RoPETransformerBlock`` in src/UniGenUtils.py:375-530): RoPE variants are
the same blocks with rope tables passed in; token-wise temb is handled by the
AdaLN layer natively. SD3 attention concatenates the sample stream FIRST
(diffusers JointAttnProcessor2_0 convention — unlike Flux).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from unigen_tpu.layers.adaln import (adaln_continuous, adaln_sd35x, adaln_zero,
                                     init_adaln, modulate)
from unigen_tpu.layers.attention import init_joint_attention, joint_attention
from unigen_tpu.layers.core import init_mlp, layer_norm, mlp


def init_sd3_joint_block(key, dim: int, heads: int, head_dim: int, *,
                         context_pre_only: bool = False,
                         qk_norm: Optional[str] = None,
                         use_dual_attention: bool = False,
                         condition_kv: bool = False,
                         dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 6)
    p = {
        "norm1": init_adaln(ks[0], dim, 9 if use_dual_attention else 6, dtype=dtype),
        "norm1_context": init_adaln(ks[1], dim, 2 if context_pre_only else 6, dtype=dtype),
        "attn": init_joint_attention(ks[2], dim, heads, head_dim, context=True,
                                     context_pre_only=context_pre_only,
                                     qk_norm=qk_norm, condition_kv=condition_kv,
                                     dtype=dtype),
        "ff": init_mlp(ks[3], dim, dtype=dtype),
    }
    if not context_pre_only:
        p["ff_context"] = init_mlp(ks[4], dim, dtype=dtype)
    if use_dual_attention:
        p["attn2"] = init_joint_attention(ks[5], dim, heads, head_dim,
                                          context=False, qk_norm=qk_norm,
                                          dtype=dtype)
    return p


def sd3_joint_block(p: dict, x: jnp.ndarray, ctx: jnp.ndarray, temb: jnp.ndarray,
                    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None, *,
                    heads: int,
                    condition_kv_states: Optional[jnp.ndarray] = None,
                    attn_impl: str = "auto"
                    ) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
    """Returns (ctx_out, x_out); ctx_out is None for context_pre_only blocks.

    ``condition_kv_states`` feeds the KV-append condition attention
    (cn2base_method="CrossAttn")."""
    dual = "attn2" in p
    if dual:
        nx, g_msa, s_mlp, sc_mlp, g_mlp, nx2d, g_msa2 = adaln_sd35x(p["norm1"], x, temb)
    else:
        nx, g_msa, s_mlp, sc_mlp, g_mlp = adaln_zero(p["norm1"], x, temb)

    context_pre_only = "ff_context" not in p
    if context_pre_only:
        nc = adaln_continuous(p["norm1_context"], ctx, temb)
    else:
        nc, cg_msa, cs_mlp, csc_mlp, cg_mlp = adaln_zero(p["norm1_context"], ctx, temb)

    attn_x, attn_c = joint_attention(p["attn"], nx, nc, heads=heads, rope=rope,
                                     context_first=False,
                                     condition_kv_states=condition_kv_states,
                                     attn_impl=attn_impl)
    x = x + g_msa * attn_x

    if dual:
        attn_x2, _ = joint_attention(p["attn2"], nx2d, None, heads=heads,
                                     rope=rope, attn_impl=attn_impl)
        x = x + g_msa2 * attn_x2

    nx_ff = modulate(layer_norm(x), s_mlp, sc_mlp)
    x = x + g_mlp * mlp(p["ff"], nx_ff)

    if context_pre_only:
        return None, x
    ctx = ctx + cg_msa * attn_c
    nc_ff = modulate(layer_norm(ctx), cs_mlp, csc_mlp)
    ctx = ctx + cg_mlp * mlp(p["ff_context"], nc_ff)
    return ctx, x


def init_sd3_single_block(key, dim: int, heads: int, head_dim: int, *,
                          qk_norm: Optional[str] = None, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 3)
    return {
        "norm1": init_adaln(ks[0], dim, 6, dtype=dtype),
        "attn": init_joint_attention(ks[1], dim, heads, head_dim, context=False,
                                     qk_norm=qk_norm, dtype=dtype),
        "ff": init_mlp(ks[2], dim, dtype=dtype),
    }


def sd3_single_block(p: dict, x: jnp.ndarray, temb: jnp.ndarray,
                     rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None, *,
                     heads: int, attn_impl: str = "auto") -> jnp.ndarray:
    nx, g_msa, s_mlp, sc_mlp, g_mlp = adaln_zero(p["norm1"], x, temb)
    attn_x, _ = joint_attention(p["attn"], nx, None, heads=heads, rope=rope,
                                attn_impl=attn_impl)
    x = x + g_msa * attn_x
    nx_ff = modulate(layer_norm(x), s_mlp, sc_mlp)
    return x + g_mlp * mlp(p["ff"], nx_ff)
