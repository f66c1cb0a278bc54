"""MMDiT joint attention over concatenated streams.

One flexible module covering every attention shape in the system:
  * Flux double block: sample + context streams, qk RMSNorm, context
    concatenated FIRST (diffusers FluxAttnProcessor convention).
  * Flux single block: sample stream only, pre_only (no output projection).
  * SD3 joint block: sample + context, optional qk norm, sample-first order
    in the RoPE control variant (reference JointAttnRopeProcessor,
    src/UniGenUtils.py:532-622 puts sample first then context).
  * KV-append condition attention for cn2base_method="CrossAttn"
    (reference JointConditionAttnProcessor, src/UniGenUtils.py:625-735):
    condition tokens contribute keys/values only.

RoPE, when given, is applied to q and k of the full concatenation; callers
build (cos, sin) tables whose row order matches the stream concat order.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from unigen_tpu.layers.core import init_linear, init_rms_norm, linear, rms_norm
from unigen_tpu.ops.attention import merge_heads, sdpa, split_heads


def init_joint_attention(key, dim: int, heads: int, head_dim: int, *,
                         context: bool = True, context_pre_only: bool = False,
                         pre_only: bool = False, qk_norm: Optional[str] = "rms_norm",
                         added_qk_norm: Optional[str] = None,
                         condition_kv: bool = False, dtype=jnp.float32) -> dict:
    """Build attention params. ``added_qk_norm`` defaults to ``qk_norm`` when a
    context stream exists."""
    inner = heads * head_dim
    ks = iter(jax.random.split(key, 12))
    p = {
        "to_q": init_linear(next(ks), dim, inner, dtype=dtype),
        "to_k": init_linear(next(ks), dim, inner, dtype=dtype),
        "to_v": init_linear(next(ks), dim, inner, dtype=dtype),
    }
    if qk_norm == "rms_norm":
        p["norm_q"] = init_rms_norm(head_dim, dtype=dtype)
        p["norm_k"] = init_rms_norm(head_dim, dtype=dtype)
    if not pre_only:
        p["to_out"] = init_linear(next(ks), inner, dim, dtype=dtype)
    if context:
        p["add_q"] = init_linear(next(ks), dim, inner, dtype=dtype)
        p["add_k"] = init_linear(next(ks), dim, inner, dtype=dtype)
        p["add_v"] = init_linear(next(ks), dim, inner, dtype=dtype)
        aqk = qk_norm if added_qk_norm is None else added_qk_norm
        if aqk == "rms_norm":
            p["norm_added_q"] = init_rms_norm(head_dim, dtype=dtype)
            p["norm_added_k"] = init_rms_norm(head_dim, dtype=dtype)
        if not context_pre_only:
            p["to_add_out"] = init_linear(next(ks), inner, dim, dtype=dtype)
    if condition_kv:
        p["condition_k"] = init_linear(next(ks), dim, inner, dtype=dtype)
        p["condition_v"] = init_linear(next(ks), dim, inner, dtype=dtype)
        if qk_norm == "rms_norm":
            p["condition_k_norm"] = init_rms_norm(head_dim, dtype=dtype)
    return p


def joint_attention(p: dict, x: jnp.ndarray, ctx: Optional[jnp.ndarray] = None, *,
                    heads: int,
                    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                    context_first: bool = True,
                    condition_kv_states: Optional[jnp.ndarray] = None,
                    attn_impl: str = "auto"
                    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Joint attention. Returns (x_out, ctx_out); ctx_out is None when there is
    no context stream or the module is context_pre_only.

    rope: (cos, sin) over the concatenated sequence in concat order.
    condition_kv_states: KV-only condition stream appended after all K/V.
    """
    qw = next(p["to_q"][k] for k in ("w", "w_q", "w_q4") if k in p["to_q"])
    head_dim = qw.shape[-1] // heads  # out-dim is unpacked in every format
    sx = x.shape[1]

    q = split_heads(linear(p["to_q"], x), heads)
    k = split_heads(linear(p["to_k"], x), heads)
    v = split_heads(linear(p["to_v"], x), heads)
    if "norm_q" in p:
        q = rms_norm(p["norm_q"], q)
        k = rms_norm(p["norm_k"], k)

    if ctx is not None:
        cq = split_heads(linear(p["add_q"], ctx), heads)
        ck = split_heads(linear(p["add_k"], ctx), heads)
        cv = split_heads(linear(p["add_v"], ctx), heads)
        if "norm_added_q" in p:
            cq = rms_norm(p["norm_added_q"], cq)
            ck = rms_norm(p["norm_added_k"], ck)
        if context_first:
            q = jnp.concatenate([cq, q], axis=2)
            k = jnp.concatenate([ck, k], axis=2)
            v = jnp.concatenate([cv, v], axis=2)
        else:
            q = jnp.concatenate([q, cq], axis=2)
            k = jnp.concatenate([k, ck], axis=2)
            v = jnp.concatenate([v, cv], axis=2)

    fused_rope = rope
    if rope is not None and condition_kv_states is not None:
        # KV-append mode rotates only the pre-append K; the appended
        # condition keys stay unrotated (reference JointConditionAttnProcessor
        # applies no rope to them, src/UniGenUtils.py:684-707). Extend the
        # K-side tables with identity-rotation rows (cos=1, sin=0) so the
        # whole thing still runs through ONE fused Pallas kernel.
        cos, sin = rope
        n_app = condition_kv_states.shape[1]
        kcos = jnp.concatenate([cos, jnp.ones((n_app, cos.shape[-1]), cos.dtype)])
        ksin = jnp.concatenate([sin, jnp.zeros((n_app, sin.shape[-1]), sin.dtype)])
        fused_rope = (cos, sin, kcos, ksin)

    if condition_kv_states is not None:
        dk = split_heads(linear(p["condition_k"], condition_kv_states), heads)
        dv = split_heads(linear(p["condition_v"], condition_kv_states), heads)
        if "condition_k_norm" in p:
            dk = rms_norm(p["condition_k_norm"], dk)
        k = jnp.concatenate([k, dk], axis=2)
        v = jnp.concatenate([v, dv], axis=2)

    out = merge_heads(sdpa(q, k, v, impl=attn_impl, rope=fused_rope))

    if ctx is None:
        if "to_out" in p:
            out = linear(p["to_out"], out)
        return out, None

    if context_first:
        ctx_out, x_out = out[:, :ctx.shape[1]], out[:, ctx.shape[1]:]
    else:
        x_out, ctx_out = out[:, :sx], out[:, sx:]

    if "to_out" in p:
        x_out = linear(p["to_out"], x_out)
    if "to_add_out" in p:
        ctx_out = linear(p["to_add_out"], ctx_out)
    else:
        ctx_out = None
    return x_out, ctx_out
