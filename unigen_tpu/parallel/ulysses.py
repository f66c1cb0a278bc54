"""Ulysses-style sequence-parallel attention (head <-> sequence all_to_all).

The TPU-native long-context plan (SURVEY.md §2.6/§5: absent in the reference;
first-class here for >=1024^2 multi-condition runs): activations are sharded
on the 'sequence' mesh axis; inside attention two lax.all_to_all exchanges
convert sequence sharding into head sharding (each shard then holds ALL
tokens for H/sp heads), run the full fused attention locally, and convert
back. MMDiT's bidirectional fixed-length attention makes this the natural
fit; ring attention remains the stretch alternative.

Use inside shard_map over a mesh with a 'sequence' axis:

    out = ulysses_sdpa(q, k, v, axis_name="sequence")
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unigen_tpu.ops.attention import sdpa


def head_to_seq(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """[B, H/sp, S, D] -> [B, H, S/sp, D]."""
    return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                              tiled=True)


def seq_to_head(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """[B, H, S/sp, D] -> [B, H/sp, S, D]."""
    return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2,
                              tiled=True)


def ulysses_sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 axis_name: str = "sequence", *,
                 impl: str = "auto") -> jnp.ndarray:
    """Sequence-parallel SDPA. Inputs/outputs are sequence-sharded
    [B, H, S_local, D]; internally head-sharded with full sequence."""
    sp = jax.lax.psum(1, axis_name)
    if sp == 1:
        return sdpa(q, k, v, impl=impl)
    qh = seq_to_head(q, axis_name)
    kh = seq_to_head(k, axis_name)
    vh = seq_to_head(v, axis_name)
    out = sdpa(qh, kh, vh, impl=impl)
    return head_to_seq(out, axis_name)
