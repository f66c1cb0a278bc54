"""Scaled dot-product attention — XLA path with fp32 softmax.

This is the portable baseline; the Pallas fused kernel
(unigen_tpu/ops/pallas/flash_attention.py) is selected at the call site for
TPU hot paths. Both compute q@k^T and the probability-weighted sum with
float32 accumulation so bf16 runs keep numeric parity with the reference's
fused SDPA (reference src/UniGenUtils.py:601).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sdpa_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """q, k, v: [B, H, S, Dh] -> [B, H, Sq, Dh]. Softmax in float32."""
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.asarray(-1e30, logits.dtype))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
         mask: Optional[jnp.ndarray] = None, *, impl: str = "auto",
         rope=None) -> jnp.ndarray:
    """Dispatch between the Pallas fused kernels and the XLA path.

    impl: "auto" (Pallas on TPU when shapes allow — full-KV kernel for short
    streams, online-softmax streaming kernel for long), "xla", "pallas".
    rope: optional (cos, sin) [Sq, D] tables, or (cos, sin, kcos, ksin) with
    separate K-side tables (the KV-append CrossAttn convention) — fused into
    the Pallas kernels (rotary computed in VMEM, no HBM roundtrip),
    pre-applied on other paths.

    Sequence parallelism: when a parallel/sp.sequence_sharding context is
    active at trace time (and shapes divide), "auto" routes through the
    partial-manual Ulysses shard_map — the WHOLE forward runs sequence-
    sharded without the model threading a mesh. "auto_local" is "auto"
    minus that check (used INSIDE the manual region to avoid recursion).
    """
    sp_allowed = impl in ("auto", "ulysses")
    if impl == "auto_local":
        impl = "auto"
        sp_allowed = False
    if impl == "auto":
        import os
        impl = os.environ.get("UNIGEN_ATTN_IMPL", "auto")  # experiment knob

    if sp_allowed and impl in ("auto", "ulysses"):
        from unigen_tpu.parallel import sp as sp_lib
        ctx = sp_lib.current_sp()
        if ctx is not None and mask is None:
            mesh, axis, sp_impl = ctx
            if sp_lib.sp_divisible(q, k, mesh, axis, sp_impl):
                if rope is not None:
                    from unigen_tpu.ops.rope import apply_rotary
                    cos, sin = rope[0], rope[1]
                    kcos, ksin = (rope[2], rope[3]) if len(rope) == 4 else (cos, sin)
                    q = apply_rotary(q, cos, sin)
                    k = apply_rotary(k, kcos, ksin)
                if sp_impl == "ring":
                    return sp_lib.sharded_ring_sdpa(q, k, v, mesh, axis)
                return sp_lib.sharded_ulysses_sdpa(q, k, v, mesh, axis)

    def _rope4():
        if rope is None:
            return None
        cos, sin = rope[0], rope[1]
        kcos, ksin = (rope[2], rope[3]) if len(rope) == 4 else (cos, sin)
        return cos, sin, kcos, ksin

    def _pre_rope(q, k):
        if rope is None:
            return q, k
        from unigen_tpu.ops.rope import apply_rotary
        cos, sin, kcos, ksin = _rope4()
        return apply_rotary(q, cos, sin), apply_rotary(k, kcos, ksin)

    if impl == "ulysses":
        # sequence-parallel path: caller is inside shard_map with a 'sequence'
        # axis; rope uses the LOCAL position slice, the head<->sequence
        # all_to_all pair lives in parallel/ulysses.py
        from unigen_tpu.parallel.ulysses import ulysses_sdpa
        q, k = _pre_rope(q, k)
        return ulysses_sdpa(q, k, v, "sequence", impl="xla")

    use_pallas = False
    if impl in ("pallas", "pallas_rope", "pallas_stream"):
        use_pallas = True
    elif impl == "auto" and mask is None and jax.default_backend() == "tpu":
        # v5e sweep at [1,24,1536,128]: pallas bq=768 3.85ms vs XLA 4.53ms;
        # end-to-end +60% (XLA materialises fp32 logits to HBM)
        try:
            from unigen_tpu.ops.pallas.flash_attention import (
                streaming_supported, supported)
            use_pallas = supported(q, k, v) or streaming_supported(q, k, v)
        except Exception:
            use_pallas = False
    if use_pallas:
        from unigen_tpu.ops.pallas import flash_attention as fa
        # short streams take the full-KV-in-VMEM schedule (fastest); long
        # streams the online-softmax streaming schedule
        full_kv = fa.supported(q, k, v) and impl != "pallas_stream"
        r4 = _rope4()
        if impl != "pallas" and r4 is not None and mask is None \
                and r4[0].shape[0] == q.shape[2] \
                and r4[2].shape[0] == k.shape[2]:
            # fully-fused rotary+attention: rotation stays in VMEM, no HBM
            # roundtrip for rotated q/k — e2e 2.74 vs 2.50 img/s on the bench
            if full_kv:
                return fa.flash_attention_rope(q, k, v, *r4)
            return fa.flash_attention_streaming_rope(q, k, v, *r4)
        q, k = _pre_rope(q, k)
        if full_kv:
            return fa.flash_attention(q, k, v, mask=mask)
        if mask is None:
            return fa.flash_attention_streaming(q, k, v)
        return sdpa_xla(q, k, v, mask)
    q, k = _pre_rope(q, k)
    return sdpa_xla(q, k, v, mask)


def split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """[B, S, H*Dh] -> [B, H, S, Dh]."""
    b, s, d = x.shape
    return x.reshape(b, s, heads, d // heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, S, Dh] -> [B, S, H*Dh]."""
    b, h, s, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)
