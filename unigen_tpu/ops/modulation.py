"""StyleGAN-style weight modulation (reference ``modulated_flatten``,
src/UniGenUtils.py:204-228) as plain einsums under jit.

y[n, o] = sum_i W[o, i] * s[n, i] * x[n, i]  ==  ((s * x) @ W^T)

With JAX weight layout w [in, out] this is a single matmul on pre-scaled
inputs — the cuDNN grouped-conv trick in the reference is unnecessary on TPU.
Batched expert form keeps everything on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp


def modulated_linear(x: jnp.ndarray, w: jnp.ndarray, s: jnp.ndarray,
                     b: jnp.ndarray | None = None) -> jnp.ndarray:
    """x [..., N, I], w [I, O], s [..., I] (per-sample) or [..., N, I]
    (per-token). Returns [..., N, O]."""
    if s.ndim == x.ndim - 1:
        s = s[..., None, :]
    y = jnp.einsum("...ni,io->...no", x * s, w)
    if b is not None:
        y = y + b
    return y


def batched_modulated_linear(x: jnp.ndarray, w: jnp.ndarray, s: jnp.ndarray,
                             b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Expert-batched form: x [E, C, I], w [E, I, O], s [E, C, I] -> [E, C, O]."""
    y = jnp.einsum("eci,eio->eco", x * s, w)
    if b is not None:
        y = y + b[:, None, :]
    return y
