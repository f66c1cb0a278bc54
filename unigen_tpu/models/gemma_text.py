"""Gemma-2 text encoder in JAX — the SANA family's prompt encoder.

SANA conditions on Gemma-2's last hidden states (the role CLIP/T5 play for
FLUX/SD3). Decoder-only causal transformer, Gemma-2 specifics (all
golden-tested vs transformers Gemma2Model in tests/test_gemma_text.py):
  * RMSNorm applies (1 + weight) in fp32
  * token embeddings scaled by sqrt(hidden_size)
  * GQA (num_kv_heads <= num_heads), half-split rotate_half RoPE,
    query scale = query_pre_attn_scalar**-0.5
  * attention logit soft-capping: cap * tanh(logits / cap)
  * sandwich norms: post-attention and post-feedforward RMSNorms INSIDE the
    residual branches
  * GeGLU MLP with tanh-approximate gelu
  * alternating sliding-window/full attention — equivalent to full attention
    for SANA's 300-token prompts (window 4096), implemented via masking when
    sequences exceed the window.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from unigen_tpu.layers.core import linear


@dataclass(frozen=True)
class GemmaConfig:
    vocab_size: int = 256000
    hidden_size: int = 2304
    intermediate_size: int = 9216
    num_layers: int = 26
    num_heads: int = 8
    num_kv_heads: int = 4
    head_dim: int = 256
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    attn_logit_softcapping: float = 50.0
    query_pre_attn_scalar: float = 256.0
    sliding_window: int = 4096


def tiny_gemma_config(**overrides) -> GemmaConfig:
    base = dict(vocab_size=128, hidden_size=32, intermediate_size=64,
                num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
                query_pre_attn_scalar=8.0, sliding_window=16)
    base.update(overrides)
    return GemmaConfig(**base)


def _rms(p, x, eps):
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return (normed * (1.0 + p["scale"].astype(jnp.float32))).astype(x.dtype)


def _rope_tables(cfg: GemmaConfig, positions: jnp.ndarray):
    inv = 1.0 / (cfg.rope_theta ** (
        jnp.arange(0, cfg.head_dim, 2, dtype=jnp.float32) / cfg.head_dim))
    freqs = positions.astype(jnp.float32)[:, None] * inv[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)   # half-split layout
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _attention(p, cfg: GemmaConfig, x, cos, sin, mask):
    b, s, _ = x.shape
    h, kvh, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def proj(name, nh):
        # linear() dispatches the quantized {w_q,w_scale} serving leaves too
        return linear(p[name], x).reshape(b, s, nh, hd).transpose(0, 2, 1, 3)

    q, k, v = proj("q", h), proj("k", kvh), proj("v", kvh)
    q = q * cos + _rotate_half(q) * sin
    k = k * cos + _rotate_half(k) * sin
    rep = h // kvh
    k = jnp.repeat(k, rep, axis=1)
    v = jnp.repeat(v, rep, axis=1)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (cfg.query_pre_attn_scalar ** -0.5)
    cap = cfg.attn_logit_softcapping
    logits = cap * jnp.tanh(logits / cap)
    logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, h * hd)
    return linear(p["o"], out)


def _layer(p, cfg: GemmaConfig, x, cos, sin, mask):
    h = _rms(p["input_ln"], x, cfg.rms_norm_eps)
    h = _attention(p["attn"], cfg, h, cos, sin, mask)
    x = x + _rms(p["post_attn_ln"], h, cfg.rms_norm_eps)
    h = _rms(p["pre_ff_ln"], x, cfg.rms_norm_eps)
    gate = jax.nn.gelu(linear(p["gate"], h), approximate=True)
    h = linear(p["down"], gate * linear(p["up"], h))
    return x + _rms(p["post_ff_ln"], h, cfg.rms_norm_eps)


def gemma_encode(params: dict, cfg: GemmaConfig, input_ids: jnp.ndarray,
                 attention_mask=None) -> jnp.ndarray:
    """[B, S] token ids -> last hidden states [B, S, hidden] (the SANA prompt
    embedding). Causal + optional padding mask; sliding layers mask beyond
    the window (no-op for S <= window)."""
    b, s = input_ids.shape
    x = params["embed"][input_ids] * jnp.asarray(
        cfg.hidden_size ** 0.5, params["embed"].dtype)
    positions = jnp.arange(s)
    cos, sin = _rope_tables(cfg, positions)
    cos, sin = cos[None, None], sin[None, None]

    causal = positions[:, None] >= positions[None, :]
    if attention_mask is not None:
        causal = causal[None, None] & (attention_mask[:, None, None, :] > 0)
    else:
        causal = causal[None, None]
    window = (positions[:, None] - positions[None, :]) < cfg.sliding_window
    sliding = causal & window[None, None]

    for i, lp in enumerate(params["layers"]):
        mask = sliding if i % 2 == 0 else causal   # gemma-2 layer_types order
        x = _layer(lp, cfg, x, cos, sin, mask)
    return _rms(params["final_ln"], x, cfg.rms_norm_eps)
