"""Parameter primitives: linear / layernorm / rmsnorm / mlp.

Functional style: ``init_*`` builds a param dict, ``*_apply`` is a pure
function. Weight layout is JAX-native [in, out]; the torch-checkpoint bridge
(unigen_tpu/io/torch_bridge.py) transposes on load.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- linear

def init_linear(key, in_dim: int, out_dim: int, *, bias: bool = True,
                dtype=jnp.float32, zero: bool = False) -> dict:
    """Torch-default init: U(-k, k), k = 1/sqrt(in_dim). ``zero=True`` gives the
    ControlNet-style zero-init gate entry (reference UniGenUtils.py:194-197)."""
    if zero:
        p = {"w": jnp.zeros((in_dim, out_dim), dtype)}
        if bias:
            p["b"] = jnp.zeros((out_dim,), dtype)
        return p
    kw, kb = jax.random.split(key)
    k = 1.0 / jnp.sqrt(in_dim)
    p = {"w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -k, k)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_dim,), dtype, -k, k)
    return p


def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    if "w_q" in p:  # int8 serving path (ops/quant.py)
        from unigen_tpu.ops.quant import int8_matmul
        y = int8_matmul(x, p["w_q"], p["w_scale"])
    elif "w_q4" in p:  # W4A8 serving path (nibble-packed, ops/quant.py)
        from unigen_tpu.ops.quant import int4_matmul
        y = int4_matmul(x, p["w_q4"], p["w_scale"])
    else:
        y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


# ---------------------------------------------------------------- norms

def layer_norm(x: jnp.ndarray, *, eps: float = 1e-6,
               weight: Optional[jnp.ndarray] = None,
               bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """LayerNorm over the last axis, stats in float32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out.astype(x.dtype)
    if weight is not None:
        out = out * weight
    if bias is not None:
        out = out + bias
    return out


def init_layer_norm(dim: int, *, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm_affine(p: dict, x: jnp.ndarray, *, eps: float = 1e-6) -> jnp.ndarray:
    return layer_norm(x, eps=eps, weight=p["scale"], bias=p["bias"])


def init_rms_norm(dim: int, *, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype)}


def rms_norm(p: dict, x: jnp.ndarray, *, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm with fp32 accumulation (qk-norm in MMDiT attention)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return out * p["scale"]


# ---------------------------------------------------------------- mlp

def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


def init_mlp(key, dim: int, *, mult: int = 4, out_dim: Optional[int] = None,
             dtype=jnp.float32) -> dict:
    """FeedForward with gelu-approximate (MMDiT blocks)."""
    k1, k2 = jax.random.split(key)
    hidden = dim * mult
    return {
        "fc1": init_linear(k1, dim, hidden, dtype=dtype),
        "fc2": init_linear(k2, hidden, out_dim or dim, dtype=dtype),
    }


def mlp(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    return linear(p["fc2"], gelu_tanh(linear(p["fc1"], x)))
