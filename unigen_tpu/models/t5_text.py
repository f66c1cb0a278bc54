"""T5 encoder (T5-XXL text tower for FLUX/SD3), functional JAX.

The sequence-prompt encoder (reference loads text_encoder_2 at
train.py:265-277, encodes via src/text_encoder.py:57-96). T5 v1.1 encoder:
RMSNorm (no bias, pre-norm), relative position bias on layer 0 shared across
layers, gated-GELU MLP, no attention scaling (1/sqrt(d) folded into init).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from unigen_tpu.layers.core import init_linear, init_rms_norm, linear, rms_norm
from unigen_tpu.ops.attention import merge_heads, split_heads
from unigen_tpu.utils import init_stacked


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6


def tiny_t5_config(**kw) -> T5Config:
    base = dict(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                num_heads=4)
    base.update(kw)
    return T5Config(**base)


def relative_position_buckets(qlen: int, klen: int, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """Bidirectional T5 relative-position bucketing (static table)."""
    ctx = np.arange(qlen)[:, None]
    mem = np.arange(klen)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    ret = (rel > 0).astype(np.int64) * nb
    n = np.abs(rel)
    max_exact = nb // 2
    is_small = n < max_exact
    large = max_exact + (np.log(n.clip(1) / max_exact) / np.log(max_distance / max_exact)
                         * (nb - max_exact)).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return ret + np.where(is_small, n, large)


def init_t5_layer(key, cfg: T5Config, *, dtype=jnp.float32) -> dict:
    d, inner = cfg.d_model, cfg.num_heads * cfg.d_kv
    ks = jax.random.split(key, 7)
    return {
        "ln1": init_rms_norm(d, dtype=dtype),
        "q": init_linear(ks[0], d, inner, bias=False, dtype=dtype),
        "k": init_linear(ks[1], d, inner, bias=False, dtype=dtype),
        "v": init_linear(ks[2], d, inner, bias=False, dtype=dtype),
        "o": init_linear(ks[3], inner, d, bias=False, dtype=dtype),
        "ln2": init_rms_norm(d, dtype=dtype),
        "wi_0": init_linear(ks[4], d, cfg.d_ff, bias=False, dtype=dtype),
        "wi_1": init_linear(ks[5], d, cfg.d_ff, bias=False, dtype=dtype),
        "wo": init_linear(ks[6], cfg.d_ff, d, bias=False, dtype=dtype),
    }


def init_t5_params(key, cfg: T5Config, *, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 3)
    return {
        "token_embedding": jax.random.normal(ks[0], (cfg.vocab_size, cfg.d_model), dtype) * 1.0,
        "rel_bias": jax.random.normal(ks[1], (cfg.relative_attention_num_buckets,
                                              cfg.num_heads), dtype) * 0.1,
        "layers": init_stacked(ks[2], cfg.num_layers,
                               lambda k: init_t5_layer(k, cfg, dtype=dtype)),
        "final_ln": init_rms_norm(cfg.d_model, dtype=dtype),
    }


def t5_encode(params: dict, cfg: T5Config, input_ids: jnp.ndarray,
              attention_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """input_ids [B, T] -> hidden states [B, T, d_model]."""
    b, t = input_ids.shape
    x = params["token_embedding"][input_ids]
    buckets = jnp.asarray(relative_position_buckets(
        t, t, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance))
    pos_bias = params["rel_bias"][buckets]                     # [T, T, H]
    bias = pos_bias.transpose(2, 0, 1)[None]                   # [1, H, T, T]
    if attention_mask is not None:
        neg = jnp.asarray(-1e9, bias.dtype)
        bias = bias + jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)
    heads = cfg.num_heads

    def layer_body(x, lp):
        h = rms_norm(lp["ln1"], x, eps=cfg.layer_norm_epsilon)
        q = split_heads(linear(lp["q"], h), heads)
        k = split_heads(linear(lp["k"], h), heads)
        v = split_heads(linear(lp["v"], h), heads)
        # T5: no 1/sqrt(d) scaling; additive position bias
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        x = x + linear(lp["o"], merge_heads(attn))
        h = rms_norm(lp["ln2"], x, eps=cfg.layer_norm_epsilon)
        ff = jax.nn.gelu(linear(lp["wi_0"], h), approximate=True) * linear(lp["wi_1"], h)
        return x + linear(lp["wo"], ff), None

    x, _ = jax.lax.scan(layer_body, x, params["layers"])
    return rms_norm(params["final_ln"], x, eps=cfg.layer_norm_epsilon)
