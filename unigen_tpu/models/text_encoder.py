"""Aggregate prompt encoding for the FLUX and SD3 stacks.

Equivalent of the reference's src/text_encoder.py:4-134 helpers:
  * flux_encode_prompt: (T5 sequence embeds, CLIP-L pooled, zero text ids)
  * sd3_encode_prompt: CLIP-L + CLIP-G hidden-state[-2] concat (channel pad to
    T5 width) + T5 sequence appended; pooled = [CLIP-L pooled | CLIP-G pooled]
  * the 1-encoder mode returning pooled only — used to embed the condition
    task NAME as the condition pooled projection (reference train.py:568-570)
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from unigen_tpu.models.clip_text import CLIPTextConfig, clip_encode
from unigen_tpu.models.t5_text import T5Config, t5_encode


def _tokenize(tokenizer, prompts: Sequence[str], max_length: int):
    out = tokenizer(list(prompts), padding="max_length", max_length=max_length,
                    truncation=True, return_tensors="np")
    return jnp.asarray(out.input_ids), jnp.asarray(out.attention_mask)


def encode_pooled_only(clip_params, clip_cfg: CLIPTextConfig, tokenizer,
                       prompts: Sequence[str]) -> jnp.ndarray:
    """1-encoder mode: pooled CLIP embedding of e.g. the condition task name."""
    ids, _ = _tokenize(tokenizer, prompts, 77)
    _, _, pooled = jax.jit(partial(clip_encode, cfg=clip_cfg))(clip_params,
                                                               input_ids=ids)
    return pooled


def flux_encode_prompt(clip_params, clip_cfg, t5_params, t5_cfg: T5Config,
                       tokenizer, tokenizer_2, prompts: Sequence[str],
                       max_sequence_length: int = 512
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (prompt_embeds [B,T,4096], pooled [B,768], text_ids [T,3])."""
    pooled = encode_pooled_only(clip_params, clip_cfg, tokenizer, prompts)
    t5_ids, _ = _tokenize(tokenizer_2, prompts, max_sequence_length)
    embeds = jax.jit(partial(t5_encode, cfg=t5_cfg))(t5_params, input_ids=t5_ids)
    text_ids = jnp.zeros((embeds.shape[1], 3))
    return embeds, pooled, text_ids


def sd3_encode_prompt(clip_l, clip_l_cfg, clip_g, clip_g_cfg,
                      t5_params, t5_cfg: Optional[T5Config],
                      tokenizer, tokenizer_2, tokenizer_3,
                      prompts: Sequence[str], max_sequence_length: int = 256,
                      pad_to_dim: Optional[int] = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SD3 triple-encoder prompt embedding:
    context = [pad(concat(clip_l_h, clip_g_h)) ; t5_h], pooled = [l | g].
    Without T5, diffusers substitutes a ZERO t5 block (StableDiffusion3
    pipeline _get_t5_prompt_embeds with text_encoder_3=None): the CLIP
    concat is channel-padded to ``pad_to_dim`` (the transformer's
    joint_attention_dim) and a zero [B, max_sequence_length, pad_to_dim]
    block is appended along the sequence axis."""
    ids_l, _ = _tokenize(tokenizer, prompts, 77)
    ids_g, _ = _tokenize(tokenizer_2, prompts, 77)
    _, hid_l, pooled_l = jax.jit(partial(clip_encode, cfg=clip_l_cfg))(
        clip_l, input_ids=ids_l)
    _, hid_g, pooled_g = jax.jit(partial(clip_encode, cfg=clip_g_cfg))(
        clip_g, input_ids=ids_g)
    clip_h = jnp.concatenate([hid_l, hid_g], axis=-1)
    pooled = jnp.concatenate([pooled_l, pooled_g], axis=-1)
    if t5_params is not None:
        ids_t5, _ = _tokenize(tokenizer_3, prompts, max_sequence_length)
        t5_h = jax.jit(partial(t5_encode, cfg=t5_cfg))(t5_params,
                                                       input_ids=ids_t5)
        clip_h = jnp.pad(clip_h,
                         ((0, 0), (0, 0), (0, t5_h.shape[-1] - clip_h.shape[-1])))
        context = jnp.concatenate([clip_h, t5_h], axis=1)
    elif pad_to_dim is not None:
        t5_h = jnp.zeros((clip_h.shape[0], max_sequence_length, pad_to_dim),
                         clip_h.dtype)
        clip_h = jnp.pad(clip_h,
                         ((0, 0), (0, 0), (0, pad_to_dim - clip_h.shape[-1])))
        context = jnp.concatenate([clip_h, t5_h], axis=1)
    else:
        context = clip_h
    return context, pooled
