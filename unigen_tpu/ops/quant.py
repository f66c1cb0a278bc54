"""Int8 quantized serving path (weights + dynamic activation quantization).

v5e's int8 MXU peak is ~2x bf16 (394 vs 197 TOPS), so for serving we offer
AQT-style W8A8: per-output-channel symmetric weight scales, per-token dynamic
activation scales, int8 x int8 -> int32 matmul, fp rescale. Layers opt in by
param shape: ``layers/core.linear`` dispatches to the quantized kernel when a
param dict carries ``w_q``/``w_scale`` instead of ``w``. ``quantize_tree``
converts every eligible linear of a pytree in one pass (stacked block weights
quantize per block x out-channel).

This is a serving-speed feature — training and parity testing use the bf16/
fp32 path; SSIM-grade numerics are NOT claimed for W8A8.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray) -> dict:
    """[..., in, out] -> int8 with per-(block, out-channel) scales."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127
                 ).astype(jnp.int8)
    return {"w_q": q, "w_scale": scale.astype(jnp.float32)}


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
                out_dtype=None) -> jnp.ndarray:
    """Dynamic per-token activation quantization + int8 MXU matmul.

    x [..., N, in] fp; w_q [in, out] int8; w_scale [1, out]."""
    if w_q.ndim != 2:
        raise ValueError(
            f"int8_matmul needs a 2-D weight [in, out], got {w_q.shape}; "
            "stacked per-block quantized weights must be gathered to one "
            "block (inside the lax.scan) before the matmul")
    out_dtype = out_dtype or x.dtype
    xf = x.astype(jnp.float32)
    xmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.where(xmax > 0, xmax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, w_q, (((xq.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs * w_scale.reshape(-1)).astype(out_dtype)


def is_quantized(p: dict) -> bool:
    return isinstance(p, dict) and "w_q" in p


def _eligible(path_names, leaf_dict, *, min_dim: int, skip: Sequence[str]) -> bool:
    if "w" not in leaf_dict or leaf_dict["w"].ndim < 2:
        return False
    joined = ".".join(path_names)
    if any(s in joined for s in skip):
        return False
    in_dim, out_dim = leaf_dict["w"].shape[-2:]
    return min(in_dim, out_dim) >= min_dim


def quantize_tree(params: Any, *, min_dim: int = 512,
                  skip: Sequence[str] = ("gate", "experts")) -> Any:
    """Convert every eligible {'w','b'} linear in a pytree to int8 form.
    Small layers (below min_dim), the router gate, and the MoE expert stacks
    (consumed by the batched-einsum path, not ``linear``) stay fp. AdaLN
    modulation linears DO quantize (they are ~37% of double-block weights);
    LayerNorm/RMSNorm params have no 'w' key and are never touched."""
    def _walk(node, path):
        if isinstance(node, dict):
            if "w" in node and isinstance(node["w"], jnp.ndarray):
                if _eligible(path, node, min_dim=min_dim, skip=skip):
                    q = quantize_weight(node["w"])
                    if "b" in node:
                        q["b"] = node["b"]
                    return q
                return node
            return {k: _walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(_walk(v, path) for v in node)
        return node
    return _walk(params, ())


def quantized_bytes(params: Any) -> int:
    return sum(int(x.size) * x.dtype.itemsize for x in jax.tree.leaves(params))
