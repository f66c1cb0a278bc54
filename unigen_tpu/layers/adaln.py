"""AdaLayerNorm family with token-wise (per-token temb) support.

The reference patches diffusers AdaLN forwards to accept 3-D temb because MoE
dispatch makes temb per-token (reference src/UniGenUtils.py:340-373). Here all
variants natively handle temb of shape [B, D] (broadcast over sequence) or
[B, S, D] (token-wise): modulation tensors are chunked on the LAST axis and
expanded with [:, None] only when temb is 2-D.

Chunk orders (must match checkpoints exactly):
  zero      (6): shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp
  single    (3): shift_msa, scale_msa, gate_msa
  continuous(2): scale, shift            <- scale FIRST (AdaLayerNormContinuous)
  sd35x     (9): shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp,
                 shift_msa2, scale_msa2, gate_msa2
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from unigen_tpu.layers.core import init_linear, layer_norm, linear


def _expand(parts, temb_is_2d: bool):
    """Insert a sequence axis into modulation chunks when temb is per-sample."""
    if temb_is_2d:
        return tuple(p[:, None, :] for p in parts)
    return tuple(parts)


def init_adaln(key, dim: int, n_chunks: int, *, cond_dim=None, dtype=jnp.float32) -> dict:
    return {"linear": init_linear(key, cond_dim or dim, n_chunks * dim, dtype=dtype)}


def _mod(p: dict, temb: jnp.ndarray, n: int):
    emb = linear(p["linear"], jax.nn.silu(temb))
    return jnp.split(emb, n, axis=-1), temb.ndim == 2


def adaln_zero(p: dict, x: jnp.ndarray, temb: jnp.ndarray
               ) -> Tuple[jnp.ndarray, ...]:
    """AdaLayerNormZero: returns (normed_x, gate_msa, shift_mlp, scale_mlp, gate_mlp)."""
    (s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp), is2d = _mod(p, temb, 6)
    s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = _expand(
        (s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp), is2d)
    out = layer_norm(x) * (1 + sc_msa) + s_msa
    return out, g_msa, s_mlp, sc_mlp, g_mlp


def adaln_zero_single(p: dict, x: jnp.ndarray, temb: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """AdaLayerNormZeroSingle: returns (normed_x, gate_msa)."""
    (s_msa, sc_msa, g_msa), is2d = _mod(p, temb, 3)
    s_msa, sc_msa, g_msa = _expand((s_msa, sc_msa, g_msa), is2d)
    out = layer_norm(x) * (1 + sc_msa) + s_msa
    return out, g_msa


def adaln_continuous(p: dict, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
    """AdaLayerNormContinuous (final norm_out): scale chunked FIRST."""
    (scale, shift), is2d = _mod(p, temb, 2)
    scale, shift = _expand((scale, shift), is2d)
    return layer_norm(x) * (1 + scale) + shift


def adaln_sd35x(p: dict, x: jnp.ndarray, temb: jnp.ndarray
                ) -> Tuple[jnp.ndarray, ...]:
    """SD35AdaLayerNormZeroX (dual attention): returns
    (normed_x, gate_msa, shift_mlp, scale_mlp, gate_mlp, normed_x2, gate_msa2)."""
    chunks, is2d = _mod(p, temb, 9)
    (s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp, s2, sc2, g2) = _expand(chunks, is2d)
    normed = layer_norm(x)
    out = normed * (1 + sc_msa) + s_msa
    out2 = normed * (1 + sc2) + s2
    return out, g_msa, s_mlp, sc_mlp, g_mlp, out2, g2


def gate(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Apply a gate that is already sequence-broadcastable (from _expand)."""
    return g * x


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return x * (1 + scale) + shift
