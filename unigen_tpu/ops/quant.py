"""Quantized serving paths: W8A8 and W4A8 (weights + dynamic activation quant).

v5e's int8 MXU peak is ~2x bf16 (394 vs 197 TOPS), so for serving we offer
AQT-style W8A8: per-output-channel symmetric weight scales, per-token dynamic
activation scales, int8 x int8 -> int32 matmul, fp rescale. Layers opt in by
param shape: ``layers/core.linear`` dispatches to the quantized kernel when a
param dict carries ``w_q``/``w_scale`` (int8) or ``w_q4``/``w_scale`` (int4)
instead of ``w``. ``quantize_tree`` converts every eligible linear of a
pytree in one pass (stacked block weights quantize per block x out-channel).

W4A8 exists so the REAL 19/38 12B FLUX + 4.7B adapter fits ONE v5e chip
(int4 base ~6 GB + int8 adapter; bf16 needs 33 GB). int4 values are stored
NIBBLE-PACKED in an int8 carrier (two [-7,7] values per byte, paired along
the in-dim) because the axon runtime cannot pass S4 arrays across a jit
boundary (device_put layout recursion); the unpack is two VPU shifts inside
the jitted matmul. The MXU compute stays int8 x int8.

Measured output fidelity vs bf16 (same weights/inputs, on device, through
the full 4-step denoise + VAE decode; FIDELITY.json): W8A8 image-space SSIM
0.99945 (per-forward rel err 0.69%), W4A8 serving policy SSIM 0.99919
(1.96%) — both above the BASELINE SSIM>=0.99 gate. Training and golden
parity tests still use the bf16/fp32 path.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray) -> dict:
    """[..., in, out] -> int8 with per-(block, out-channel) scales."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127
                 ).astype(jnp.int8)
    return {"w_q": q, "w_scale": scale.astype(jnp.float32)}


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """int8 values in [-7, 7], [..., in, out] -> packed int8 [..., in/2, out].
    HALF-PAIRED along the in-dim: packed row j holds source row j in the low
    nibble and row j + in/2 in the high nibble. This layout keeps the Pallas
    fused kernel (ops/pallas/quant_matmul.py) free of row interleaves —
    unpack is two elementwise shifts + a concat, and in-kernel each nibble
    plane dots against its own contiguous K-slice of the activation."""
    assert q.shape[-2] % 2 == 0, f"in-dim must be even to nibble-pack: {q.shape}"
    half = q.shape[-2] // 2
    lo = q[..., :half, :] & jnp.int8(0x0F)
    hi = jnp.left_shift(q[..., half:, :], 4)
    return (lo | hi).astype(jnp.int8)


def unpack_int4(p: jnp.ndarray) -> jnp.ndarray:
    """packed int8 [..., in/2, out] -> int8 [..., in, out] (sign-extended)."""
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)      # arithmetic: sign-extend
    hi = jnp.right_shift(p, 4)
    return jnp.concatenate([lo, hi], axis=-2)


def quantize_weight_int4(w: jnp.ndarray) -> dict:
    """[..., in, out] -> nibble-packed int4 with per-(block, out-chan) scales.
    Symmetric [-7, 7] (the -8 code is unused, keeping the scale symmetric)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -7, 7
                 ).astype(jnp.int8)
    return {"w_q4": pack_int4(q), "w_scale": scale.astype(jnp.float32)}


def _quantize_act(x: jnp.ndarray):
    """Dynamic per-token symmetric activation quantization to int8."""
    xf = x.astype(jnp.float32)
    xmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.where(xmax > 0, xmax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def quantize_residual(r: jnp.ndarray, bits: int = 8) -> dict:
    """Per-token symmetric quantization of a cached activation residual
    (the control-residual step cache, serving_steps.StepServer /
    pipelines hybrid cache).

    bits=8: ``{"q": int8 [..., D], "s": f32 [..., 1]}`` — halves the HBM
    residency of the residual caches vs bf16 (the binding constraint for
    StepServer slot count at full topology: 0.47 GiB/slot bf16 at 512²,
    ~1.55 GiB/slot at 1024²). Values at the per-token amax map to ±127
    exactly, so no clip is needed.

    bits=4: ``{"q4": int8 [..., D/2], "s": f32 [..., 1]}`` — QUARTER the
    bf16 residency. Codes in [-7, 7], nibble-packed along the feature axis
    with the same half-pairing as :func:`pack_int4` (int8 carriers because
    jnp.int4 arrays cannot cross a jit boundary on the axon backend)."""
    rf = r.astype(jnp.float32)
    amax = jnp.max(jnp.abs(rf), axis=-1, keepdims=True)
    if bits == 4:
        assert r.shape[-1] % 2 == 0, \
            f"feature dim must be even to nibble-pack: {r.shape}"
        s = jnp.maximum(amax, 1e-8) / 7.0
        q = jnp.round(rf / s).astype(jnp.int8)
        half = q.shape[-1] // 2
        lo = q[..., :half] & jnp.int8(0x0F)
        hi = jnp.left_shift(q[..., half:], 4)
        return {"q4": (lo | hi).astype(jnp.int8), "s": s}
    assert bits == 8, bits
    s = jnp.maximum(amax, 1e-8) / 127.0
    return {"q": jnp.round(rf / s).astype(jnp.int8), "s": s}


def dequantize_residual(d: dict, dtype) -> jnp.ndarray:
    """Inverse of :func:`quantize_residual` (f32 multiply, cast to the
    activation dtype); dispatches on the leaf keys (int8 "q" / packed-int4
    "q4")."""
    if "q4" in d:
        p = d["q4"]
        lo = jnp.right_shift(jnp.left_shift(p, 4), 4)   # sign-extend
        hi = jnp.right_shift(p, 4)
        q = jnp.concatenate([lo, hi], axis=-1)
        return (q.astype(jnp.float32) * d["s"]).astype(dtype)
    return (d["q"].astype(jnp.float32) * d["s"]).astype(dtype)


def residual_buffer(shape, bits: int, dtype) -> Any:
    """A zeroed residual-cache buffer for one capture site: bf16/f32 array
    (bits=16), int8 codes + per-token scales (bits=8), or packed-int4 codes
    + scales (bits=4). The scale leaf keeps the token layout with a trailing
    singleton, so slot/batch axes sit at the same positions in every leaf
    (the StepServer gathers/scatters rely on that)."""
    if bits == 16:
        return jnp.zeros(shape, dtype)
    if bits == 8:
        return {"q": jnp.zeros(shape, jnp.int8),
                "s": jnp.zeros(shape[:-1] + (1,), jnp.float32)}
    assert bits == 4, bits
    assert shape[-1] % 2 == 0, shape
    return {"q4": jnp.zeros(shape[:-1] + (shape[-1] // 2,), jnp.int8),
            "s": jnp.zeros(shape[:-1] + (1,), jnp.float32)}


def _check_2d(w, name):
    if w.ndim != 2:
        raise ValueError(
            f"{name} needs a 2-D weight [in, out], got {w.shape}; "
            "stacked per-block quantized weights must be gathered to one "
            "block (inside the lax.scan) before the matmul")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
                out_dtype=None) -> jnp.ndarray:
    """Dynamic per-token activation quantization + int8 MXU matmul.

    x [..., N, in] fp; w_q [in, out] int8; w_scale [1, out].

    Differentiable w.r.t. x via a straight-through VJP (dx = g W_deq^T,
    the QLoRA convention) so gradients FLOW THROUGH a quantized frozen
    backbone into upstream adapter params; the integer weight itself gets
    no gradient (it is frozen by construction)."""
    return _int8_matmul_fwd_only(x, w_q, w_scale, out_dtype)


def _int8_matmul_fwd_only(x, w_q, w_scale, out_dtype=None):
    _check_2d(w_q, "int8_matmul")
    out_dtype = out_dtype or x.dtype
    xq, xs = _quantize_act(x)
    acc = jax.lax.dot_general(xq, w_q, (((xq.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs * w_scale.reshape(-1)).astype(out_dtype)


def quant_bwd_policy() -> str:
    """Backward-pass policy for the straight-through quantized matmuls
    (``UNIGEN_QUANT_BWD``, read at trace time):

    * ``"bf16"`` (default): dx = g_bf16 @ dequant_bf16(W)^T — the dequant
      fuses into the dot, weight traffic is the int8/int4 codes + a bf16
      MXU pass (the fp32 legacy read 4 B/elem dequant weights and ran the
      slow fp32 dot — backward is HBM/transpose-bound at full topology,
      TRAIN_PROFILE.json, so this is the direct lever).
    * ``"int8"``: dx = quantize_act(g * w_scale) @ W_q^T on the int8 MXU
      (2x bf16 peak, half the bf16 weight traffic). Exact up to the
      per-token int8 quantization of the incoming cotangent — adapter
      gradients keep >0.999 cosine vs fp32 (tests/test_quant.py).
    * ``"f32"``: the round-4 behavior (fp32 dequant + fp32 dot)."""
    p = os.environ.get("UNIGEN_QUANT_BWD", "bf16")
    if p not in ("f32", "bf16", "int8"):
        raise ValueError(
            f"UNIGEN_QUANT_BWD={p!r}: expected f32|bf16|int8")
    return p


def _bwd_dx(g, w_q_unpacked, w_scale, x_dtype):
    """dx = g @ (W_q * w_scale)^T under the active quant_bwd_policy.
    ``w_q_unpacked`` is int8 [in, out]; contraction is over the out axis
    (axis 1) — no materialized transpose, XLA lays the operand out for the
    MXU directly."""
    policy = quant_bwd_policy()
    nd = g.ndim - 1
    if policy == "int8":
        # dx = (g ⊙ w_scale) @ W_q^T exactly; quantize the scaled cotangent
        # per token so the contraction runs int8 x int8 -> int32
        h = g.astype(jnp.float32) * w_scale.reshape(-1)
        hq, hs = _quantize_act(h)
        acc = jax.lax.dot_general(hq, w_q_unpacked, (((nd,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * hs).astype(x_dtype)
    if policy == "bf16":
        w_deq = (w_q_unpacked.astype(jnp.float32) * w_scale
                 ).astype(jnp.bfloat16)
        dx = jax.lax.dot_general(g.astype(jnp.bfloat16), w_deq,
                                 (((nd,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return dx.astype(x_dtype)
    w_deq = w_q_unpacked.astype(jnp.float32) * w_scale       # [in, out]
    dx = jax.lax.dot_general(g.astype(jnp.float32), w_deq,
                             (((nd,), (1,)), ((), ())))
    return dx.astype(x_dtype)


def _int8_mm_fwd(x, w_q, w_scale, out_dtype):
    return _int8_matmul_fwd_only(x, w_q, w_scale, out_dtype), (x, w_q, w_scale)


def _int8_mm_bwd(out_dtype, res, g):
    x, w_q, w_scale = res
    return _bwd_dx(g, w_q, w_scale, x.dtype), None, None


int8_matmul.defvjp(_int8_mm_fwd, _int8_mm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def int4_matmul(x: jnp.ndarray, w_q4: jnp.ndarray, w_scale: jnp.ndarray,
                out_dtype=None) -> jnp.ndarray:
    """W4A8: unpack the nibble-packed weight (two VPU shifts) and run the
    int8 MXU matmul. x [..., N, in] fp; w_q4 [in/2, out] packed int8.
    Straight-through VJP like int8_matmul (QLoRA-style frozen base)."""
    return _int4_matmul_fwd_only(x, w_q4, w_scale, out_dtype)


def _int4_matmul_fwd_only(x, w_q4, w_scale, out_dtype=None):
    _check_2d(w_q4, "int4_matmul")
    out_dtype = out_dtype or x.dtype
    xq, xs = _quantize_act(x)
    if os.environ.get("UNIGEN_W4_KERNEL", "0") == "1" \
            and jax.default_backend() == "tpu":
        # fused dequant-matmul: packed weight read straight into VMEM,
        # nibble unpack on the VPU (ops/pallas/quant_matmul.py). A/B'd on
        # device at full topology b=8: 0.991 img/s vs 1.308 on this XLA
        # path — XLA pipelines the unpack+dot better than the hand kernel's
        # 256x512x1024 tiling, so the kernel stays OPT-IN (correctness is
        # pinned bit-identical by tests/test_quant.py).
        from unigen_tpu.ops.pallas import quant_matmul as qm
        if qm.supported(x, w_q4):
            lead = x.shape[:-1]
            out = qm.w4a8_matmul_pallas(
                xq.reshape(-1, x.shape[-1]), xs.reshape(-1, 1),
                w_q4, w_scale.reshape(1, -1), out_dtype)
            return out.reshape(*lead, -1)
    acc = jax.lax.dot_general(xq, unpack_int4(w_q4),
                              (((xq.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs * w_scale.reshape(-1)).astype(out_dtype)


def _int4_mm_fwd(x, w_q4, w_scale, out_dtype):
    return _int4_matmul_fwd_only(x, w_q4, w_scale, out_dtype), (x, w_q4, w_scale)


def _int4_mm_bwd(out_dtype, res, g):
    x, w_q4, w_scale = res
    return _bwd_dx(g, unpack_int4(w_q4), w_scale, x.dtype), None, None


int4_matmul.defvjp(_int4_mm_fwd, _int4_mm_bwd)


def is_quantized(p: dict) -> bool:
    return isinstance(p, dict) and ("w_q" in p or "w_q4" in p)


def _eligible(path_names, leaf_dict, *, min_dim: int, skip: Sequence[str]) -> bool:
    if "w" not in leaf_dict or leaf_dict["w"].ndim < 2:
        return False
    joined = ".".join(path_names)
    if any(s in joined for s in skip):
        return False
    in_dim, out_dim = leaf_dict["w"].shape[-2:]
    return min(in_dim, out_dim) >= min_dim


def quantize_tree(params: Any, *, min_dim: int = 512,
                  skip: Sequence[str] = ("gate", "experts"),
                  bits: int = 8) -> Any:
    """Convert every eligible {'w','b'} linear in a pytree to int8 (or
    nibble-packed int4, ``bits=4``) form. Small layers (below min_dim), the
    router gate, and the MoE expert stacks (consumed by the batched-einsum
    path, not ``linear``) stay fp. AdaLN modulation linears DO quantize (they
    are ~37% of double-block weights); LayerNorm/RMSNorm params have no 'w'
    key and are never touched."""
    assert bits in (4, 8), bits
    qfn = quantize_weight if bits == 8 else quantize_weight_int4

    def _walk(node, path):
        if isinstance(node, dict):
            if "w" in node and isinstance(node["w"], jnp.ndarray):
                if _eligible(path, node, min_dim=min_dim, skip=skip):
                    w = node["w"]
                    if bits == 4 and w.shape[-2] % 2 != 0:
                        return node            # odd in-dim: not packable
                    q = qfn(w)
                    if "b" in node:
                        q["b"] = node["b"]
                    return q
                return node
            return {k: _walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(_walk(v, path) for v in node)
        return node
    return _walk(params, ())


#: min(in,out) below which a text-tower linear stays fp. Module-level so
#: tests can exercise the loader wiring at tiny widths.
TEXT_QUANT_MIN_DIM = 512


def quantize_text_tower(params: Any, *, bits: int = 8,
                        min_dim: Optional[int] = None,
                        donate: bool = True) -> Any:
    """Serving quantization for prompt-encoder towers (T5/CLIP/Gemma).

    The reference serves every text encoder bf16 (infer.py:115-149) — on one
    v5e that makes T5-XXL (~9.4 GiB bf16) the single biggest tenant, bigger
    than the W4A8 12B transformer itself. int8 halves it (int4 quarters it)
    and every tower already routes its matmuls through ``layers.core.linear``,
    which dispatches the {w_q,w_scale}/{w_q4,w_scale} leaves.

    skip=() on purpose: text towers have no MoE router — Gemma's MLP "gate"
    is a real [d, ff] matmul (the default skip list is for UniGen control
    trees). Embedding tables / norms / rel-bias stay fp (raw arrays, no 'w'
    dict)."""
    md = TEXT_QUANT_MIN_DIM if min_dim is None else min_dim
    return quantize_tree_streaming(params, bits=bits, skip=(), min_dim=md,
                                   donate=donate)


def quantize_unigen_serving(params: dict, *, base_bits: int = 4,
                            adapter_block_bits: int = 4) -> dict:
    """The single-chip full-topology serving policy (VERDICT r1 #1): frozen
    12B base -> W4 (~5.6 GiB); adapter control-block stacks -> W4 (~2.7 GiB,
    ``adapter_block_bits=8`` for the higher-fidelity 12.1 GiB variant); the
    small adapter pieces (shared-expert weave, zero-init add linears,
    embedders) -> W8. Expert stacks / router stay bf16 (einsum path).

    Memory note: the axon v5e runtime needs ~4 GiB of free HBM for its
    host-transfer path — at 12.1 GiB resident every device->host read fails
    with ResourceExhausted, so the DEFAULT policy lands at ~9.5 GiB.
    (Reference serves everything bf16 across many A100s, infer.py:115-149.)"""
    out = dict(params)
    out["base"] = quantize_tree(params["base"], bits=base_bits)
    ctrl = {}
    for k, v in params["control"].items():
        bits = adapter_block_bits if k in ("double_blocks", "single_blocks") else 8
        ctrl[k] = quantize_tree(v, bits=bits)
    out["control"] = ctrl
    return out


def quantize_tree_streaming(params: Any, *, min_dim: int = 512,
                            skip: Sequence[str] = ("gate", "experts"),
                            bits: int = 8, donate: bool = True) -> Any:
    """quantize_tree with BOUNDED device memory: one jitted quantize call
    per eligible linear, deleting each bf16 source right after its quantized
    twin lands (``donate=True``). Peak HBM = source tree + one leaf, and it
    DECREASES as the walk proceeds — where ``jit(quantize_tree)`` transiently
    holds source + quantized trees together (observed RESOURCE_EXHAUSTED at
    8.6 GiB source on a 16 GB chip). This is the pattern for quantizing a
    real bf16 checkpoint for single-chip serving; the source tree is
    CONSUMED when donate=True."""
    assert bits in (4, 8), bits
    qfn = quantize_weight if bits == 8 else quantize_weight_int4
    jq = jax.jit(qfn)

    def _walk(node, path):
        if isinstance(node, dict):
            if "w" in node and isinstance(node["w"], jnp.ndarray):
                if _eligible(path, node, min_dim=min_dim, skip=skip):
                    w = node["w"]
                    if bits == 4 and w.shape[-2] % 2 != 0:
                        return node
                    q = jq(w)
                    jax.block_until_ready(q)
                    if donate:
                        try:
                            w.delete()
                        except Exception:
                            pass
                    if "b" in node:
                        q = dict(q)
                        q["b"] = node["b"]
                    return q
                return node
            return {k: _walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(_walk(v, path) for v in node)
        return node
    return _walk(params, ())


def quantize_unigen_serving_streaming(params: dict, *, base_bits: int = 4,
                                      adapter_block_bits: int = 4,
                                      donate: bool = True) -> dict:
    """quantize_unigen_serving with the bounded-memory streaming walk
    (consumes ``params`` when donate=True)."""
    out = dict(params)
    out["base"] = quantize_tree_streaming(params["base"], bits=base_bits,
                                          donate=donate)
    ctrl = {}
    for k, v in params["control"].items():
        bits = adapter_block_bits if k in ("double_blocks", "single_blocks") else 8
        ctrl[k] = quantize_tree_streaming(v, bits=bits, donate=donate)
    out["control"] = ctrl
    return out


def quantized_bytes(params: Any) -> int:
    return sum(int(x.size) * x.dtype.itemsize for x in jax.tree.leaves(params))


_FROZEN_KEYS = ("w_q", "w_q4", "w_scale")


def split_trainable(tree: Any):
    """Split a (partially) quantized tree into (trainable, frozen) trees of
    the SAME structure with complementary None leaves (None is an empty
    pytree node, so optimizers/grads simply skip the frozen side).

    Frozen = the quantized weight leaves (w_q/w_q4/w_scale); trainable =
    every fp leaf (MoE experts + gate, norm scales/biases, linear biases...).
    This is the single-chip full-topology fine-tune split: the serving-
    quantized 12B+adapter stays resident int4/int8 while the fp subset
    trains with AdamW (QLoRA-style straight-through VJPs through the
    quantized matmuls, reference ds_zero3.json's role)."""
    def walk(node):
        if isinstance(node, dict):
            t, f = {}, {}
            for k, v in node.items():
                if k in _FROZEN_KEYS:
                    t[k], f[k] = None, v
                else:
                    t[k], f[k] = walk(v)
            return t, f
        if isinstance(node, (list, tuple)):
            pairs = [walk(v) for v in node]
            return (type(node)(p[0] for p in pairs),
                    type(node)(p[1] for p in pairs))
        return node, None
    return walk(tree)


def merge_split(trainable: Any, frozen: Any):
    """Inverse of split_trainable (complementary-None merge)."""
    if trainable is None:
        return frozen
    if frozen is None:
        return trainable
    if isinstance(trainable, dict):
        return {k: merge_split(trainable.get(k), frozen.get(k))
                for k in {**trainable, **frozen}}
    if isinstance(trainable, (list, tuple)):
        return type(trainable)(merge_split(a, b)
                               for a, b in zip(trainable, frozen))
    return trainable
