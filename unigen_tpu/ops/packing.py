"""Latent packing / position-id / patchify utilities.

TPU-native equivalents of the reference's latent plumbing:
  * Flux ``_pack_latents`` / ``_unpack_latents`` / ``_prepare_latent_image_ids``
    (used at reference train.py:529-587, src/UniGenPipeline.py:633-647)
  * SD3 patchify + cropped 2-D sincos positional table
    (diffusers ``PatchEmbed`` semantics used by reference UniGenTransformer.py:39-65)

All functions are shape-static and jit-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pack_latents(latents: jnp.ndarray) -> jnp.ndarray:
    """[B, C, H, W] -> [B, (H/2)*(W/2), C*4] (Flux 2x2 patch packing)."""
    b, c, h, w = latents.shape
    x = latents.reshape(b, c, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents(latents: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[B, (h/2)*(w/2), C*4] -> [B, C, h, w]; h, w are latent-grid dims."""
    b, s, c4 = latents.shape
    c = c4 // 4
    x = latents.reshape(b, h // 2, w // 2, c, 2, 2)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, h, w)


def prepare_latent_image_ids(h_half: int, w_half: int, offset_w: float = 0.0) -> jnp.ndarray:
    """Position ids for packed latents: [(h/2)*(w/2), 3] with (0, row, col).

    ``offset_w`` implements the subject-condition spatial-separation trick
    (reference src/condition.py:118-121: ``cond_ids[:, 2] += w/2``).
    """
    ids = jnp.zeros((h_half, w_half, 3), dtype=jnp.float32)
    ids = ids.at[..., 1].add(jnp.arange(h_half, dtype=jnp.float32)[:, None])
    ids = ids.at[..., 2].add(jnp.arange(w_half, dtype=jnp.float32)[None, :] + offset_w)
    return ids.reshape(h_half * w_half, 3)


def patchify(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, C, H, W] -> [B, (H/p)*(W/p), C*p*p] (SD3 patch embedding input)."""
    b, c, h, w = x.shape
    p = patch_size
    x = x.reshape(b, c, h // p, p, w // p, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (h // p) * (w // p), c * p * p)


def unpatchify(x: jnp.ndarray, h_patches: int, w_patches: int, patch_size: int,
               out_channels: int) -> jnp.ndarray:
    """[B, S, p*p*C] -> [B, C, h_patches*p, w_patches*p].

    Matches the reference's output reshape (UniGenTransformer.py:476-482:
    ``nhwpqc->nchpwq``).
    """
    b = x.shape[0]
    p = patch_size
    x = x.reshape(b, h_patches, w_patches, p, p, out_channels)
    x = x.transpose(0, 5, 1, 3, 2, 4)  # nhwpqc -> nchpwq
    return x.reshape(b, out_channels, h_patches * p, w_patches * p)


def _sincos_1d(embed_dim: int, pos: jnp.ndarray) -> jnp.ndarray:
    # float32 intermediates (the diffusers reference computes this table in
    # np.float64; without jax_enable_x64 a float64 request silently downcasts
    # anyway, so ask for what we get — drift vs float64 is ~1e-7 and the
    # stored table is float32 regardless)
    omega = jnp.arange(embed_dim // 2, dtype=jnp.float32) / (embed_dim / 2.0)
    omega = 1.0 / (10000.0 ** omega)
    out = jnp.einsum("m,d->md", pos.reshape(-1), omega)
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)


def sincos_2d_pos_embed(embed_dim: int, grid_size: int, base_size: int,
                        interpolation_scale: float = 1.0) -> jnp.ndarray:
    """2-D sincos table [grid_size**2, embed_dim] (diffusers PatchEmbed semantics).

    First half of channels encodes the H coordinate, second half the W
    coordinate; positions are rescaled by base_size/grid_size. Computed with
    jnp so a jitted init TRACES the table instead of embedding a
    [max_size^2, D] literal — at SD3.5 size (384^2 x 1536 fp32 = 906 MB)
    that literal blew the remote-compile request limit (HTTP 413).
    """
    grid_h = jnp.arange(grid_size, dtype=jnp.float32) / (grid_size / base_size) / interpolation_scale
    grid_w = jnp.arange(grid_size, dtype=jnp.float32) / (grid_size / base_size) / interpolation_scale
    grid = jnp.meshgrid(grid_w, grid_h)  # w goes first (diffusers convention)
    grid = jnp.stack(grid, axis=0).reshape(2, grid_size, grid_size)
    emb_h = _sincos_1d(embed_dim // 2, grid[0])
    emb_w = _sincos_1d(embed_dim // 2, grid[1])
    return jnp.concatenate([emb_h, emb_w], axis=1)  # [G*G, D]


def cropped_pos_embed(table: jnp.ndarray, max_size: int, h_patches: int,
                      w_patches: int) -> jnp.ndarray:
    """Center-crop a [max_size**2, D] sincos table to [h*w, D]."""
    top = (max_size - h_patches) // 2
    left = (max_size - w_patches) // 2
    t = table.reshape(max_size, max_size, -1)
    t = t[top:top + h_patches, left:left + w_patches]
    return t.reshape(h_patches * w_patches, -1)
