"""Timestep / pooled-text / patch embedders.

Functional equivalents of the embedders the reference builds or deep-copies
for its control branch (reference UniGenTransformer.py:66-76,727-742):
sinusoidal timestep projection -> MLP, pooled-text MLP, optional guidance
embedder, and the SD3 conv patch embedder with cropped sincos table.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from unigen_tpu.layers.core import init_linear, linear
from unigen_tpu.ops.packing import cropped_pos_embed, patchify, sincos_2d_pos_embed


def timestep_sinusoidal(t: jnp.ndarray, dim: int = 256, *, max_period: float = 10000.0,
                        flip_sin_to_cos: bool = True) -> jnp.ndarray:
    """Sinusoidal features [B, dim] for (already pre-scaled) timesteps [B].

    float32 throughout; flip_sin_to_cos=True yields [cos | sin] ordering.
    """
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    emb = t.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)


def init_timestep_embedder(key, in_dim: int, dim: int, *, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {"fc1": init_linear(k1, in_dim, dim, dtype=dtype),
            "fc2": init_linear(k2, dim, dim, dtype=dtype)}


def timestep_embedder(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    return linear(p["fc2"], jax.nn.silu(linear(p["fc1"], x)))


def pixart_text_projection(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """diffusers ``PixArtAlphaTextProjection`` at its DEFAULT
    ``act_fn='gelu_tanh'`` — what ``SanaTransformer2DModel`` builds for
    ``caption_projection`` (the reference's SANAUniGen applies it at
    UniGenTransformer.py:2066). NOT ``timestep_embedder``: the silu variant
    is only what ``CombinedTimestepTextProjEmbeddings`` passes explicitly
    for the flux/sd3 pooled-text embedders (act_fn='silu')."""
    return linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], x), approximate=True))


def init_combined_time_text(key, dim: int, pooled_dim: int, *,
                            guidance: bool = False, dtype=jnp.float32) -> dict:
    """CombinedTimestep(Guidance)TextProjEmbeddings."""
    ks = jax.random.split(key, 3)
    p = {"timestep": init_timestep_embedder(ks[0], 256, dim, dtype=dtype),
         "text": init_timestep_embedder(ks[1], pooled_dim, dim, dtype=dtype)}
    if guidance:
        p["guidance"] = init_timestep_embedder(ks[2], 256, dim, dtype=dtype)
    return p


def combined_time_text(p: dict, timestep: jnp.ndarray, pooled: jnp.ndarray,
                       guidance: Optional[jnp.ndarray] = None,
                       dtype=jnp.float32) -> jnp.ndarray:
    """temb [B, dim]. ``timestep``/``guidance`` must already be x1000-scaled
    (the callers do this, matching reference UniGenTransformer.py:1218-1220)."""
    t_feat = timestep_sinusoidal(timestep).astype(dtype)
    emb = timestep_embedder(p["timestep"], t_feat)
    if "guidance" in p and guidance is not None:
        g_feat = timestep_sinusoidal(guidance).astype(dtype)
        emb = emb + timestep_embedder(p["guidance"], g_feat)
    emb = emb + timestep_embedder(p["text"], pooled.astype(dtype))
    return emb


# ---------------------------------------------------------------- SD3 patch embed

def init_patch_embed(key, patch_size: int, in_channels: int, embed_dim: int,
                     pos_embed_max_size: int, base_size: int, *,
                     pos_embed_type: str = "sincos", dtype=jnp.float32) -> dict:
    """Conv patch embedder expressed as a linear over patchified pixels,
    plus a precomputed cropped sincos table (diffusers PatchEmbed semantics)."""
    p = {"proj": init_linear(key, in_channels * patch_size * patch_size, embed_dim, dtype=dtype)}
    if pos_embed_type == "sincos":
        table = sincos_2d_pos_embed(embed_dim, pos_embed_max_size, base_size)
        p["pos_embed"] = jnp.asarray(table, dtype=jnp.float32)
    return p


def patch_embed(p: dict, x: jnp.ndarray, patch_size: int,
                pos_embed_max_size: int) -> jnp.ndarray:
    """[B, C, H, W] -> [B, S, D] with center-cropped positional table."""
    b, c, h, w = x.shape
    hp, wp = h // patch_size, w // patch_size
    tokens = linear(p["proj"], patchify(x, patch_size))
    if "pos_embed" in p:
        pos = cropped_pos_embed(p["pos_embed"], pos_embed_max_size, hp, wp)
        tokens = tokens + pos.astype(tokens.dtype)[None]
    return tokens
