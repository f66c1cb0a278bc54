"""Ring attention — the long-context stretch alternative to Ulysses
(SURVEY.md §2.6/§5: absent in the reference; built here for >=1024^2
multi-condition sequences).

q, k, v are sequence-sharded [B, H, S/p, D] per shard. K/V blocks rotate
around the ring via lax.ppermute while each shard accumulates a numerically
stable online softmax (running max / denominator / weighted sum, all fp32),
so no shard ever materialises the full attention matrix or the full K/V.
Communication rides neighbour ICI links and overlaps with block compute
under XLA's scheduler.

Use inside shard_map over a mesh with a 'sequence' axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ring_sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              axis_name: str = "sequence") -> jnp.ndarray:
    """Sequence-sharded exact attention. In/out: [B, H, S_local, D]."""
    p = jax.lax.psum(1, axis_name)
    if p == 1:
        from unigen_tpu.ops.attention import sdpa
        return sdpa(q, k, v)

    b, h, s_local, d = q.shape
    scale = 1.0 / (d ** 0.5)
    qf = q.astype(jnp.float32)
    perm = [(i, (i + 1) % p) for i in range(p)]

    m = jnp.full((b, h, s_local, 1), -jnp.inf, jnp.float32)   # running max
    l = jnp.zeros((b, h, s_local, 1), jnp.float32)            # denominator
    o = jnp.zeros((b, h, s_local, d), jnp.float32)            # weighted sum
    k_blk, v_blk = k, v

    for _ in range(p):  # static: ring length known at trace time
        logits = jnp.einsum("bhqd,bhkd->bhqk", qf,
                            k_blk.astype(jnp.float32)) * scale
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        probs = jnp.exp(logits - m_new)
        o = o * alpha + jnp.einsum("bhqk,bhkd->bhqd", probs,
                                   v_blk.astype(jnp.float32))
        l = l * alpha + jnp.sum(probs, axis=-1, keepdims=True)
        m = m_new
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)

    return (o / l).astype(q.dtype)
