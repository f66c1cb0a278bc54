"""Scaled dot-product attention — XLA path with fp32 softmax.

This is the portable baseline; the Pallas fused kernel
(unigen_tpu/ops/pallas/flash_attention.py) is selected at the call site for
TPU hot paths. Both compute q@k^T and the probability-weighted sum with
float32 accumulation so bf16 runs keep numeric parity with the reference's
fused SDPA (reference src/UniGenUtils.py:601).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def sdpa_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """q, k, v: [B, H, S, Dh] -> [B, H, Sq, Dh]. Softmax in float32."""
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.asarray(-1e30, logits.dtype))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
         mask: Optional[jnp.ndarray] = None, *, impl: str = "auto") -> jnp.ndarray:
    """Dispatch between the Pallas fused kernel and the XLA path.

    impl: "auto" (Pallas on TPU when shapes allow), "xla", "pallas".
    """
    if impl == "pallas":
        from unigen_tpu.ops.pallas.flash_attention import flash_attention
        return flash_attention(q, k, v, mask=mask)
    if impl == "auto" and mask is None and jax.default_backend() == "tpu":
        # v5e sweep at [1,24,1536,128]: pallas bq=768 3.85ms vs XLA 4.53ms
        try:
            from unigen_tpu.ops.pallas.flash_attention import (flash_attention,
                                                               supported)
            if supported(q, k, v):
                return flash_attention(q, k, v, mask=mask)
        except Exception:
            pass
    return sdpa_xla(q, k, v, mask)


def split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """[B, S, H*Dh] -> [B, H, S, Dh]."""
    b, s, d = x.shape
    return x.reshape(b, s, heads, d // heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, S, Dh] -> [B, S, H*Dh]."""
    b, h, s, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)
