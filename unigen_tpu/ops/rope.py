"""Rotary position embeddings with FLUX multi-axis semantics.

Pure functions (no parameters). Matches the semantics of the reference's
``FluxPosEmbed(theta, axes_dim)`` + ``apply_rotary_emb`` usage
(reference src/UniGenUtils.py:595-599, src/UniGenTransformer.py:1238-1239):
per-axis 1-D rotary frequencies computed from integer position ids, cos/sin
interleave-repeated, concatenated across axes, applied in float32 with the
(-x2, x1) pairwise rotation.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def rope_freqs_1d(pos: jnp.ndarray, dim: int, theta: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1-D rotary cos/sin for positions ``pos`` [S] over ``dim`` channels.

    Returns (cos, sin), each [S, dim], where angle[k] repeats twice
    (interleaved pairs), angles computed in float32.
    """
    assert dim % 2 == 0, dim
    freqs = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))  # [dim/2]
    angles = pos.astype(jnp.float32)[:, None] * freqs[None, :]                  # [S, dim/2]
    cos = jnp.repeat(jnp.cos(angles), 2, axis=-1)
    sin = jnp.repeat(jnp.sin(angles), 2, axis=-1)
    return cos, sin


def rope_multi_axis(ids: jnp.ndarray, axes_dim: Sequence[int], theta: float = 10000.0
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-axis rotary table for id matrix ``ids`` [S, n_axes].

    Each column of ids drives axes_dim[i] channels; outputs concatenate to
    head_dim = sum(axes_dim). Returns (cos, sin), each [S, head_dim] float32.
    """
    n_axes = ids.shape[-1]
    assert n_axes == len(axes_dim), (ids.shape, axes_dim)
    cos_parts, sin_parts = [], []
    for i, d in enumerate(axes_dim):
        c, s = rope_freqs_1d(ids[:, i], d, theta)
        cos_parts.append(c)
        sin_parts.append(s)
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply interleaved-pair rotary to ``x`` [..., S, D] with cos/sin [S, D].

    out = x*cos + rotate_pairs(x)*sin, where rotate_pairs maps
    (x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...). Computed in float32,
    cast back to x.dtype.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    # pairwise rotate: view last dim as [..., D/2, 2]
    xr = xf.reshape(*xf.shape[:-1], -1, 2)
    rotated = jnp.stack([-xr[..., 1], xr[..., 0]], axis=-1).reshape(xf.shape)
    out = xf * cos + rotated * sin
    return out.astype(orig_dtype)
