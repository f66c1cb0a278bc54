"""SANA blocks: ReLU linear attention, cross-attention to text, GLUMBConv FF,
AdaLayerNormSingle-style per-block scale/shift tables.

Functional equivalents of diffusers ``SanaTransformerBlock`` /
``AdaLayerNormSingle`` used by the reference's SANAUniGen
(UniGenTransformer.py:1453-2112). Token-wise temb (the MoE-dispatch case) is
supported natively: the 6-way modulation tensor may be [B, 6, D] or
[B, S, 6, D] — the reference's non-modulated SANA expert path cannot handle
per-token temb at all (its reshape garbles the axes), one of the latent
defects we do not replicate.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from unigen_tpu.layers.core import init_linear, layer_norm, linear
from unigen_tpu.ops.attention import merge_heads, sdpa, split_heads


# ------------------------------------------------------------ time embed

def init_adaln_single(key, dim: int, *, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 3)
    return {"timestep": {"fc1": init_linear(ks[0], 256, dim, dtype=dtype),
                         "fc2": init_linear(ks[1], dim, dim, dtype=dtype)},
            "linear": init_linear(ks[2], dim, 6 * dim, dtype=dtype)}


def adaln_single(p: dict, timestep: jnp.ndarray, dtype=jnp.float32
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """timestep [B] (0..1000 scale) -> (proj [B, 6D], embedded [B, D])."""
    from unigen_tpu.layers.embeddings import timestep_sinusoidal
    feat = timestep_sinusoidal(timestep.astype(jnp.float32)).astype(dtype)
    embedded = linear(p["timestep"]["fc2"],
                      jax.nn.silu(linear(p["timestep"]["fc1"], feat)))
    proj = linear(p["linear"], jax.nn.silu(embedded))
    return proj, embedded


# ------------------------------------------------------------ linear attention

def init_linear_attention(key, dim: int, heads: int, head_dim: int, *,
                          dtype=jnp.float32) -> dict:
    inner = heads * head_dim
    ks = jax.random.split(key, 4)
    return {"to_q": init_linear(ks[0], dim, inner, bias=False, dtype=dtype),
            "to_k": init_linear(ks[1], dim, inner, bias=False, dtype=dtype),
            "to_v": init_linear(ks[2], dim, inner, bias=False, dtype=dtype),
            "to_out": init_linear(ks[3], inner, dim, dtype=dtype)}


def linear_attention(p: dict, x: jnp.ndarray, *, heads: int) -> jnp.ndarray:
    """ReLU-kernel lite linear attention (SanaLinearAttnProcessor semantics):
    out = (relu(q) @ [relu(k)^T v]) / (relu(q) @ [relu(k)^T 1]); fp32 accum."""
    q = split_heads(linear(p["to_q"], x), heads).astype(jnp.float32)
    k = split_heads(linear(p["to_k"], x), heads).astype(jnp.float32)
    v = split_heads(linear(p["to_v"], x), heads).astype(jnp.float32)
    q, k = jax.nn.relu(q), jax.nn.relu(k)
    kv = jnp.einsum("bhsd,bhse->bhde", k, v)            # [B,H,D,D]
    z = jnp.einsum("bhsd,bhd->bhs", q, jnp.sum(k, axis=2))  # normaliser
    out = jnp.einsum("bhsd,bhde->bhse", q, kv) / (z[..., None] + 1e-15)
    return linear(p["to_out"], merge_heads(out.astype(x.dtype)))


def init_cross_attention(key, dim: int, heads: int, head_dim: int,
                         kv_dim: Optional[int] = None, *, dtype=jnp.float32) -> dict:
    inner = heads * head_dim
    kv_dim = kv_dim or dim
    ks = jax.random.split(key, 4)
    return {"to_q": init_linear(ks[0], dim, inner, dtype=dtype),
            "to_k": init_linear(ks[1], kv_dim, inner, dtype=dtype),
            "to_v": init_linear(ks[2], kv_dim, inner, dtype=dtype),
            "to_out": init_linear(ks[3], inner, dim, dtype=dtype)}


def cross_attention(p: dict, x: jnp.ndarray, ctx: jnp.ndarray, *, heads: int,
                    ctx_mask: Optional[jnp.ndarray] = None,
                    attn_impl: str = "auto") -> jnp.ndarray:
    q = split_heads(linear(p["to_q"], x), heads)
    k = split_heads(linear(p["to_k"], ctx), heads)
    v = split_heads(linear(p["to_v"], ctx), heads)
    mask = None
    if ctx_mask is not None:  # [B, Sctx] boolean
        mask = ctx_mask[:, None, None, :]
    return linear(p["to_out"], merge_heads(sdpa(q, k, v, mask, impl="xla")))


# ------------------------------------------------------------ GLUMBConv FF

def init_glumb_conv(key, dim: int, mlp_ratio: float = 2.5, *,
                    dtype=jnp.float32) -> dict:
    hidden = int(dim * mlp_ratio)
    ks = jax.random.split(key, 3)
    kd = jax.random.uniform(ks[1], (3, 3, 1, 2 * hidden), dtype,
                            -1.0 / 3.0, 1.0 / 3.0)
    return {"inverted": init_linear(ks[0], dim, 2 * hidden, dtype=dtype),
            "depth": {"w": kd, "b": jnp.zeros((2 * hidden,), dtype)},
            "point": init_linear(ks[2], hidden, dim, bias=False, dtype=dtype)}


def glumb_conv(p: dict, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[B, S=h*w, C] inverted-residual GLU conv block (fused MBConv)."""
    b, s, c = x.shape
    y = jax.nn.silu(linear(p["inverted"], x))              # [B, S, 2H]
    y = y.reshape(b, h, w, -1)
    y = jax.lax.conv_general_dilated(
        y, p["depth"]["w"], (1, 1), "SAME",
        feature_group_count=y.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["depth"]["b"]
    y = y.reshape(b, s, -1)
    main, gate = jnp.split(y, 2, axis=-1)
    return linear(p["point"], main * jax.nn.silu(gate))


# ------------------------------------------------------------ block

def init_sana_block(key, dim: int, heads: int, head_dim: int, *,
                    cross_heads: int, cross_head_dim: int,
                    mlp_ratio: float = 2.5, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 4)
    return {
        "scale_shift_table": jax.random.normal(ks[0], (6, dim), dtype) / dim ** 0.5,
        "attn1": init_linear_attention(ks[1], dim, heads, head_dim, dtype=dtype),
        "attn2": init_cross_attention(ks[2], dim, cross_heads, cross_head_dim,
                                      dtype=dtype),
        "ff": init_glumb_conv(ks[3], dim, mlp_ratio, dtype=dtype),
    }


def _mod6(table: jnp.ndarray, temb: jnp.ndarray):
    """table [6, D] + temb [B, 6D] or [B, S, 6D] -> six tensors broadcastable
    over [B, S, D]."""
    d = table.shape[-1]
    if temb.ndim == 2:
        t = temb.reshape(temb.shape[0], 1, 6, d)
    else:
        t = temb.reshape(temb.shape[0], temb.shape[1], 6, d)
    mods = table[None, None] + t
    return [mods[..., i, :] for i in range(6)]


def sana_block(p: dict, x: jnp.ndarray, ctx: jnp.ndarray, temb: jnp.ndarray,
               h: int, w: int, *, heads: int, cross_heads: int,
               ctx_mask: Optional[jnp.ndarray] = None,
               attn_impl: str = "auto") -> jnp.ndarray:
    """SanaTransformerBlock: linear self-attn -> text cross-attn -> GLUMBConv,
    modulated by per-block scale_shift_table + projected timestep."""
    s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = _mod6(p["scale_shift_table"], temb)
    nx = layer_norm(x) * (1 + sc_msa) + s_msa
    x = x + g_msa * linear_attention(p["attn1"], nx, heads=heads)
    if ctx is not None:
        x = x + cross_attention(p["attn2"], x, ctx, heads=cross_heads,
                                ctx_mask=ctx_mask, attn_impl=attn_impl)
    nx = layer_norm(x) * (1 + sc_mlp) + s_mlp
    return x + g_mlp * glumb_conv(p["ff"], nx, h, w)
