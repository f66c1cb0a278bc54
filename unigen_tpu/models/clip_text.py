"""CLIP text encoder (OpenAI ViT-L/14 text tower), functional JAX.

The pooled-prompt encoder of the FLUX/SD3 stacks (reference loads it at
train.py:260-277; used via src/text_encoder.py:4-54 which takes either the
EOS-pooled projection or hidden_state[-2]). Standard architecture: token +
learned position embeddings, pre-LN transformer with causal mask, quick-GELU
MLP, final LN; pooled output = EOS-token hidden state (+ optional projection).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from unigen_tpu.layers.core import init_layer_norm, init_linear, layer_norm_affine, linear
from unigen_tpu.ops.attention import merge_heads, sdpa_xla, split_heads
from unigen_tpu.utils import init_stacked


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    projection_dim: Optional[int] = None   # set for CLIPTextModelWithProjection
    eos_token_id: int = 49407


def tiny_clip_config(**kw) -> CLIPTextConfig:
    base = dict(vocab_size=128, hidden_size=32, intermediate_size=64,
                num_layers=2, num_heads=4, max_position_embeddings=16,
                eos_token_id=90)  # not 2: the legacy argmax pooling path needs real vocab
    base.update(kw)
    return CLIPTextConfig(**base)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def init_clip_layer(key, cfg: CLIPTextConfig, *, dtype=jnp.float32) -> dict:
    d = cfg.hidden_size
    ks = jax.random.split(key, 6)
    return {
        "ln1": init_layer_norm(d, dtype=dtype),
        "q": init_linear(ks[0], d, d, dtype=dtype),
        "k": init_linear(ks[1], d, d, dtype=dtype),
        "v": init_linear(ks[2], d, d, dtype=dtype),
        "o": init_linear(ks[3], d, d, dtype=dtype),
        "ln2": init_layer_norm(d, dtype=dtype),
        "fc1": init_linear(ks[4], d, cfg.intermediate_size, dtype=dtype),
        "fc2": init_linear(ks[5], cfg.intermediate_size, d, dtype=dtype),
    }


def init_clip_params(key, cfg: CLIPTextConfig, *, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 4)
    p = {
        "token_embedding": jax.random.normal(ks[0], (cfg.vocab_size, cfg.hidden_size), dtype) * 0.02,
        "position_embedding": jax.random.normal(ks[1], (cfg.max_position_embeddings, cfg.hidden_size), dtype) * 0.01,
        "layers": init_stacked(ks[2], cfg.num_layers,
                               lambda k: init_clip_layer(k, cfg, dtype=dtype)),
        "final_ln": init_layer_norm(cfg.hidden_size, dtype=dtype),
    }
    if cfg.projection_dim:
        p["text_projection"] = init_linear(ks[3], cfg.hidden_size,
                                           cfg.projection_dim, bias=False, dtype=dtype)
    return p


def clip_encode(params: dict, cfg: CLIPTextConfig, input_ids: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """input_ids [B, T] -> (last_hidden [B,T,D], penultimate_hidden, pooled [B,D']).

    pooled = hidden state at the EOS token (argmax of id==eos), projected when
    a text_projection exists — matching the reference's pooled path
    (src/text_encoder.py:23-41)."""
    b, t = input_ids.shape
    x = params["token_embedding"][input_ids] + params["position_embedding"][None, :t]
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
    heads = cfg.num_heads

    def layer_body(carry, lp):
        x, penult = carry
        h = layer_norm_affine(lp["ln1"], x, eps=1e-5)
        q = split_heads(linear(lp["q"], h), heads)
        k = split_heads(linear(lp["k"], h), heads)
        v = split_heads(linear(lp["v"], h), heads)
        x = x + linear(lp["o"], merge_heads(sdpa_xla(q, k, v, causal)))
        h = layer_norm_affine(lp["ln2"], x, eps=1e-5)
        x = x + linear(lp["fc2"], quick_gelu(linear(lp["fc1"], h)))
        return (x, penult), x

    (x, _), all_states = jax.lax.scan(layer_body, (x, x), params["layers"])
    penultimate = all_states[-2] if cfg.num_layers >= 2 else x
    last = layer_norm_affine(params["final_ln"], x, eps=1e-5)

    if cfg.eos_token_id == 2:
        # legacy HF CLIP configs say eos=2 but pool at argmax(ids) — which is
        # the true EOS (the highest token id) for real CLIP vocabularies;
        # transformers keeps this behavior and so do we.
        eos_pos = jnp.argmax(input_ids, axis=-1)
    else:
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32),
                             axis=-1)
    pooled = last[jnp.arange(b), eos_pos]
    if "text_projection" in params:
        pooled = linear(params["text_projection"], pooled)
    return last, penultimate, pooled
