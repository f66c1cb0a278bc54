"""Fused attention kernel for MMDiT joint attention (Pallas / TPU).

The hot op of every block: one SDPA over the concatenated
[txt | img (| cond)] streams (reference fuses via
F.scaled_dot_product_attention, src/UniGenUtils.py:601). UniGen sequence
lengths are short (<= ~5k tokens at 1024^2 multi-condition), so the fastest
TPU schedule is NOT a streaming flash kernel but a blocked-q kernel that
keeps the FULL K/V in VMEM (k+v at 5k x 128 bf16 = 2.6 MB << 16 MB VMEM),
computes q-block logits on the MXU with fp32 accumulation, does one exact
fp32 softmax (no online rescaling passes), and matmuls P*V back on the MXU.

grid = (B*H, Sq/BQ); every grid step reads a [BQ, D] q block and the whole
[Skv, D] K/V. Backward is fused too: a full-KV Pallas backward where it
fits VMEM (skv <= 2048), the kv-blocked LSE + dq/dkv kernels beyond that
(any skv — the 512² train step's 2560-token KV-append streams and every
1024² stream), and the XLA-recompute VJP only as the unsupported-dtype
fallback.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# interpret mode lets the kernels run (slowly) on CPU for testing
_INTERPRET = os.environ.get("UNIGEN_PALLAS_INTERPRET") == "1"

try:  # pallas TPU backend is unavailable on CPU hosts
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

DEFAULT_BQ = 768  # v5e sweep: bq=768 beats 256/512 and the XLA path


def _pick_bq(sq: int, skv_pad: int, d: int = 128) -> int:
    """bq=768 wins END-TO-END on v5e (a single 1536 q block looked ~6% faster
    per-op but loses ~7% e2e — one grid step per batch-head removes the
    DMA/compute overlap). The VMEM guard budgets ALL resident buffers
    (k, v, rotated-K scratch, fp32 cos/sin tables ~= 14 B per kv element)
    and shrinks bq so the fp32 logits block fits the remainder."""
    sq128 = _round_up(sq, 128)
    # Empirically verified schedule (v5e, d=128): Mosaic's scoped-vmem cost
    # is NOT linear in the modeled buffer bytes — measured on device:
    # (skv<=2048, bq 768) ok; (2560, 512) ok but (2560, 768) wants 17.46 MB
    # and FAILS; (4608, 256) ok but (4608, 128) wants 16.86 MB and FAILS.
    # A byte-budget formula cannot reproduce that table, so pick from the
    # verified points, scaled to d via the kv-resident footprint.
    # Two independent VMEM terms: the fixed K/V/rope buffers scale with
    # skv_pad*d, but the fp32 logits block is [bq, skv_pad] REGARDLESS of d
    # — so the gate must bound skv_pad itself too, or d=64 (SD3 head dim)
    # admits twice the logits bytes of any verified point.
    kv_rows_eq = skv_pad * d // 128          # d-normalised KV rows
    cap = DEFAULT_BQ if (kv_rows_eq <= 2048 and skv_pad <= 2048) else 512
    import os
    override = os.environ.get("UNIGEN_PALLAS_BQ")
    if override:
        # experiment knob (batch-sweep tuning): forces the q-block size but
        # never past the device-verified VMEM cap for this shape
        return min(sq128, cap, int(override))
    return min(sq128, cap)


def supported(q, k, v) -> bool:
    """True when the full-KV-in-VMEM schedule fits. Long KV streams (where
    k+v+rotated-K scratch+fp32 cos/sin ~=14 B/elem plus a minimal 128-row
    fp32 logits block would blow the VMEM budget) must take the streaming
    kernel (flash_attention_streaming) or the XLA path instead."""
    if not _HAS_PLTPU:
        return False
    if q.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    d = q.shape[-1]
    if not (d % 128 == 0 or d in (64, 128)):
        return False
    skv_pad = _round_up(k.shape[2], 128)
    # device-verified ceiling: (skv 2560, bq 512) compiles repeatably at
    # d=128; (skv 4608, bq 256) compiled once then failed scoped-vmem on a
    # later identical compile (the remote helper is not stable at the
    # margin), so longer KV takes the streaming kernel. Both the d-scaled
    # K/V footprint AND raw skv_pad (the d-independent logits width) are
    # bounded — see _pick_bq. The gate admits only up to the VERIFIED 2560
    # point (3072 was previously admitted but never compiled on device —
    # shapes in (2560, 3072] now take the streaming kernel instead of
    # risking a marginal scoped-vmem compile failure).
    return skv_pad * d // 128 <= 2560 and skv_pad <= 2560


def _rotate(x, cos, sin):
    """Interleaved-pair rotary inside the kernel (fp32, VMEM-resident).

    Reshape-free formulation (Mosaic cannot lower the [..., D/2, 2] view):
    rotated[2i] = -x[2i+1], rotated[2i+1] = x[2i]  ==
    where(lane even, -roll(x, -1), roll(x, +1))."""
    xf = x.astype(jnp.float32)
    d = xf.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, xf.shape, xf.ndim - 1)
    rot = jnp.where(lane % 2 == 0,
                    -pltpu.roll(xf, d - 1, axis=xf.ndim - 1),  # roll by -1
                    pltpu.roll(xf, 1, axis=xf.ndim - 1))
    return xf * cos + rot * sin


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    q = q_ref[0]                                   # [BQ, D]
    k = k_ref[0]                                   # [Skv_pad, D]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [BQ, Skv_pad]
    if kv_len < k.shape[0]:                        # mask the padded tail
        idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(idx < kv_len, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _attn_rope_kernel(q_ref, k_ref, v_ref, qcos_ref, qsin_ref, kcos_ref,
                      ksin_ref, o_ref, k_rot_ref, *, scale: float, kv_len: int):
    """Fused RoPE + attention: rotary applied in VMEM (fp32) — no HBM
    roundtrip for the rotated q/k (the flagship fusion, SURVEY.md §2.2
    'JointAttnRopeProcessor'). K is rotated once per batch-head (grid steps
    iterate q blocks fastest) and cached in VMEM scratch."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        k_rot_ref[:] = _rotate(k_ref[0], kcos_ref[:], ksin_ref[:]
                               ).astype(k_rot_ref.dtype)

    q = _rotate(q_ref[0], qcos_ref[:], qsin_ref[:])      # fp32 [BQ, D]
    k = k_rot_ref[:]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q.astype(v.dtype), k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if kv_len < k.shape[0]:
        idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(idx < kv_len, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, mask=None):
    """q,k,v: [B, H, S, D] -> [B, H, Sq, D]. mask unsupported (use XLA path)."""
    assert mask is None
    return _flash_fwd_impl(q, k, v)


def _flash_fwd_impl(q, k, v):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    skv_pad = _round_up(skv, 128)
    bq = _pick_bq(sq, skv_pad, d)
    sq_pad = _round_up(sq, bq)
    scale = 1.0 / (d ** 0.5)

    qr = q.reshape(b * h, sq, d)
    kr = k.reshape(b * h, skv, d)
    vr = v.reshape(b * h, skv, d)
    if sq_pad != sq:
        qr = jnp.pad(qr, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if skv_pad != skv:
        kr = jnp.pad(kr, ((0, 0), (0, skv_pad - skv), (0, 0)))
        vr = jnp.pad(vr, ((0, 0), (0, skv_pad - skv), (0, 0)))

    grid = (b * h, sq_pad // bq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, kv_len=skv),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * skv_pad * d,
            bytes_accessed=(qr.size + kr.size + vr.size) * qr.dtype.itemsize,
            transcendentals=b * h * sq_pad * skv_pad),
        interpret=_INTERPRET,
    )(qr, kr, vr)
    return out[:, :sq].reshape(b, h, sq, d)


def _ref_attn(q, k, v):
    from unigen_tpu.ops.attention import sdpa_xla
    return sdpa_xla(q, k, v)


def _bwd_supported(q, k, v) -> bool:
    """Full-KV backward fits VMEM (k+v+dk+dv+rot scratch + two fp32 row
    blocks); long sequences fall back to the XLA-recompute backward."""
    if not _HAS_PLTPU:
        return False
    d = q.shape[-1]
    skv_pad = _round_up(k.shape[2], 128)
    # calibrated on device: the rope-variant backward holds ~7 live fp32
    # [BQ, Skv] blocks on the Mosaic stack plus 24 B/kv-elem of fixed
    # buffers (measured 16.89 MB at skv 2560 / bq 128 -> refuse; 2048 fits)
    return skv_pad * (d * 24 + 128 * 4 * 7) <= 15 * 1024 * 1024


def _flash_fwd(q, k, v, mask):
    o = _flash_fwd_impl(q, k, v)
    return o, (q, k, v, o)


def _attn_debug(kind: str, q, k):
    """UNIGEN_ATTN_DEBUG=1: trace-time print of every backward dispatch
    decision (tracing happens once per shape — the audit tool VERDICT r4
    next-round #1a asked for)."""
    if os.environ.get("UNIGEN_ATTN_DEBUG") == "1":
        import sys as _sys
        print(f"# attn-bwd {kind} sq={q.shape[2]} skv={k.shape[2]} "
              f"bh={q.shape[0] * q.shape[1]} dtype={q.dtype}",
              file=_sys.stderr, flush=True)


def _flash_bwd(mask, res, g):
    q, k, v, o = res
    if _bwd_supported(q, k, v):
        _attn_debug("fullkv", q, k)
        return _flash_bwd_impl(q, k, v, g)
    if streaming_supported(q, k, v):
        _attn_debug("blocked", q, k)
        return _flash_bwd_blocked(q, k, v, g, o)
    _attn_debug("xla", q, k)
    _, vjp = jax.vjp(_ref_attn, q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# ------------------------------------------------------------ fused RoPE

@jax.custom_vjp
def flash_attention_rope(q, k, v, cos, sin, kcos, ksin):
    """Fused rotary + attention. q,k,v [B,H,S,D]; cos/sin [Sq,D] fp32 tables
    in concatenated stream order. kcos/ksin [Skv,D] are the K-side tables —
    identical to cos/sin for plain self-attention, EXTENDED tables for the
    KV-append CrossAttn mode (appended condition rows carry the identity
    rotation cos=1, sin=0, reference JointConditionAttnProcessor applies no
    rope to condition keys, src/UniGenUtils.py:684-707)."""
    return _flash_rope_impl(q, k, v, cos, sin, kcos, ksin)


def _flash_rope_impl(q, k, v, cos, sin, kcos, ksin):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    skv_pad = _round_up(skv, 128)
    bq = _pick_bq(sq, skv_pad, d)
    sq_pad = _round_up(sq, bq)
    scale = 1.0 / (d ** 0.5)

    qr = q.reshape(b * h, sq, d)
    kr = k.reshape(b * h, skv, d)
    vr = v.reshape(b * h, skv, d)
    qcos = cos.astype(jnp.float32)
    qsin = sin.astype(jnp.float32)
    kcos = kcos.astype(jnp.float32)
    ksin = ksin.astype(jnp.float32)
    if sq_pad != sq:
        qr = jnp.pad(qr, ((0, 0), (0, sq_pad - sq), (0, 0)))
        qcos = jnp.pad(qcos, ((0, sq_pad - sq), (0, 0)))
        qsin = jnp.pad(qsin, ((0, sq_pad - sq), (0, 0)))
    if skv_pad != skv:
        kr = jnp.pad(kr, ((0, 0), (0, skv_pad - skv), (0, 0)))
        vr = jnp.pad(vr, ((0, 0), (0, skv_pad - skv), (0, 0)))
        kcos = jnp.pad(kcos, ((0, skv_pad - skv), (0, 0)))
        ksin = jnp.pad(ksin, ((0, skv_pad - skv), (0, 0)))

    grid = (b * h, sq_pad // bq)
    out = pl.pallas_call(
        functools.partial(_attn_rope_kernel, scale=scale, kv_len=skv),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((skv_pad, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((skv_pad, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((skv_pad, d), q.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * skv_pad * d,
            bytes_accessed=(qr.size + kr.size + vr.size) * qr.dtype.itemsize,
            transcendentals=b * h * sq_pad * skv_pad),
        interpret=_INTERPRET,
    )(qr, kr, vr, qcos, qsin, kcos, ksin)
    return out[:, :sq].reshape(b, h, sq, d)


def _ref_attn_rope(q, k, v, cos, sin, kcos, ksin):
    from unigen_tpu.ops.attention import sdpa_xla
    from unigen_tpu.ops.rope import apply_rotary
    return sdpa_xla(apply_rotary(q, cos, sin), apply_rotary(k, kcos, ksin), v)


def _flash_rope_fwd(q, k, v, cos, sin, kcos, ksin):
    o = _flash_rope_impl(q, k, v, cos, sin, kcos, ksin)
    return o, (q, k, v, cos, sin, kcos, ksin, o)


def _flash_rope_bwd(res, g):
    q, k, v, cos, sin, kcos, ksin, o = res
    if _bwd_supported(q, k, v):
        _attn_debug("fullkv_rope", q, k)
        dq, dk, dv = _flash_bwd_impl(q, k, v, g, (cos, sin, kcos, ksin))
    elif streaming_supported(q, k, v):
        _attn_debug("blocked_rope", q, k)
        dq, dk, dv = _flash_bwd_blocked(q, k, v, g, o,
                                        (cos, sin, kcos, ksin))
    else:
        _attn_debug("xla_rope", q, k)
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _ref_attn_rope(q_, k_, v_, cos, sin, kcos, ksin),
            q, k, v)
        dq, dk, dv = vjp(g)
    return (dq, dk, dv, jnp.zeros_like(cos), jnp.zeros_like(sin),
            jnp.zeros_like(kcos), jnp.zeros_like(ksin))


flash_attention_rope.defvjp(_flash_rope_fwd, _flash_rope_bwd)


# ---------------------------------------------------- streaming (long KV)
#
# Online-softmax flash schedule for sequences whose full K/V does not fit
# VMEM (>~6k tokens at D=128: 1024^2 multi-condition streams, SURVEY §2.6).
# grid = (B*H, Sq/BQ, Skv/BK), kv innermost; the running max / sum / output
# accumulator live in VMEM scratch across kv steps ([BQ, 128] lane-replicated
# m/l — the efficient TPU layout for per-row scalars). Numerics: fp32
# logits/softmax state, bf16 MXU matmuls — same contract as the full-KV
# kernel, so outputs agree to bf16 tolerance.

#: streaming-schedule block sizes; env-overridable for device sweeps
#: (VERDICT r4 #4 — the long-KV path never got the bq-style tuning pass)
BQ_STREAM = int(os.environ.get("UNIGEN_PALLAS_BQ_STREAM", "512"))
BK_STREAM = int(os.environ.get("UNIGEN_PALLAS_BK_STREAM", "1024"))


def _stream_inner(logits, v, j, acc_ref, m_ref, l_ref, o_ref, *,
                  kv_len: int, bk: int):
    col = j * bk + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < kv_len, logits, -1e30)
    m_prev = m_ref[:]                                   # [BQ, 128]
    l_prev = l_ref[:]
    m_next = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_next)                    # [BQ, 128]
    p = jnp.exp(logits - m_next[:, :1])                 # [BQ, BK]
    m_ref[:] = m_next
    l_ref[:] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha[:, :1] + pv

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _stream_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                   scale: float, kv_len: int, bk: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    _stream_inner(logits, v, j, acc_ref, m_ref, l_ref, o_ref,
                  kv_len=kv_len, bk=bk)


def _stream_rope_kernel(q_ref, k_ref, v_ref, qcos_ref, qsin_ref, kcos_ref,
                        ksin_ref, o_ref, acc_ref, m_ref, l_ref, qrot_ref, *,
                        scale: float, kv_len: int, bk: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        qrot_ref[:] = _rotate(q_ref[0], qcos_ref[:], qsin_ref[:]
                              ).astype(qrot_ref.dtype)

    v = v_ref[0]
    k = _rotate(k_ref[0], kcos_ref[:], ksin_ref[:]).astype(v.dtype)
    logits = jax.lax.dot_general(qrot_ref[:].astype(v.dtype), k,
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    _stream_inner(logits, v, j, acc_ref, m_ref, l_ref, o_ref,
                  kv_len=kv_len, bk=bk)


def _stream_call(qr, kr, vr, rope_tables, *, scale, skv, d, bq, bk):
    bh, sq_pad, _ = qr.shape
    skv_pad = kr.shape[1]
    grid = (bh, sq_pad // bq, skv_pad // bk)
    qspec = pl.BlockSpec((1, bq, d), lambda i, jq, jk: (i, jq, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, bk, d), lambda i, jq, jk: (i, jk, 0),
                         memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((bq, d), jnp.float32),     # acc
               pltpu.VMEM((bq, 128), jnp.float32),   # running max
               pltpu.VMEM((bq, 128), jnp.float32)]   # running sum
    if rope_tables is None:
        kernel = functools.partial(_stream_kernel, scale=scale, kv_len=skv,
                                   bk=bk)
        in_specs = [qspec, kspec, kspec]
        args = (qr, kr, vr)
    else:
        kernel = functools.partial(_stream_rope_kernel, scale=scale,
                                   kv_len=skv, bk=bk)
        in_specs = [qspec, kspec, kspec,
                    pl.BlockSpec((bq, d), lambda i, jq, jk: (jq, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bq, d), lambda i, jq, jk: (jq, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bk, d), lambda i, jq, jk: (jk, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bk, d), lambda i, jq, jk: (jk, 0),
                                 memory_space=pltpu.VMEM)]
        args = (qr, kr, vr) + rope_tables
        scratch.append(pltpu.VMEM((bq, d), jnp.float32))  # rotated q cache
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, sq_pad, d), qr.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, d), lambda i, jq, jk: (i, jq, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq_pad * skv_pad * d,
            bytes_accessed=(qr.size + (kr.size + vr.size) * (sq_pad // bq))
            * qr.dtype.itemsize,
            transcendentals=bh * sq_pad * skv_pad),
        interpret=_INTERPRET,
    )(*args)


def _pick_bk_stream(skv: int) -> int:
    """KV block for the streaming schedule. Device sweep at the 1024² shapes
    (PROFILE_STREAM_SWEEP.json, VERDICT r4 #4): bk=1536 beats the old fixed
    1024 by 6.5% at skv 4608 (4.06 vs 4.34 ms) while 1024 stays best at
    skv 8704 (1536 would pad +6%) — pick the candidate minimising padded
    work, preferring the larger block on ties (fewer online-softmax rescale
    passes). UNIGEN_PALLAS_BK_STREAM overrides."""
    if os.environ.get("UNIGEN_PALLAS_BK_STREAM"):
        return BK_STREAM
    return min((1536, 1024), key=lambda bk: (_round_up(skv, bk), -bk))


def _stream_prep(q, k, v, cos=None, sin=None, kcos=None, ksin=None):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    bq, bk = min(BQ_STREAM, _round_up(sq, 128)), _pick_bk_stream(skv)
    sq_pad = _round_up(sq, bq)
    skv_pad = _round_up(skv, bk)
    qr = q.reshape(b * h, sq, d)
    kr = k.reshape(b * h, skv, d)
    vr = v.reshape(b * h, skv, d)
    if sq_pad != sq:
        qr = jnp.pad(qr, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if skv_pad != skv:
        kr = jnp.pad(kr, ((0, 0), (0, skv_pad - skv), (0, 0)))
        vr = jnp.pad(vr, ((0, 0), (0, skv_pad - skv), (0, 0)))
    tables = None
    if cos is not None:
        def padt(t, n):
            t = t.astype(jnp.float32)
            return jnp.pad(t, ((0, n - t.shape[0]), (0, 0))) \
                if t.shape[0] != n else t
        tables = (padt(cos, sq_pad), padt(sin, sq_pad),
                  padt(kcos, skv_pad), padt(ksin, skv_pad))
    return qr, kr, vr, tables, (b, h, sq, skv, d, bq, bk)


@jax.custom_vjp
def flash_attention_streaming(q, k, v):
    """Online-softmax KV-blocked attention for long streams. [B,H,S,D]."""
    return _flash_stream_impl(q, k, v)


def _flash_stream_impl(q, k, v):
    qr, kr, vr, _, (b, h, sq, skv, d, bq, bk) = _stream_prep(q, k, v)
    out = _stream_call(qr, kr, vr, None, scale=1.0 / (d ** 0.5), skv=skv,
                       d=d, bq=bq, bk=bk)
    return out[:, :sq].reshape(b, h, sq, d)


def _flash_stream_fwd(q, k, v):
    o = _flash_stream_impl(q, k, v)
    return o, (q, k, v, o)


def _flash_stream_bwd(res, g):
    q, k, v, o = res
    if streaming_supported(q, k, v):
        _attn_debug("blocked_stream", q, k)
        return _flash_bwd_blocked(q, k, v, g, o)
    _attn_debug("xla_stream", q, k)
    _, vjp = jax.vjp(_ref_attn, q, k, v)
    return vjp(g)


flash_attention_streaming.defvjp(_flash_stream_fwd, _flash_stream_bwd)


@jax.custom_vjp
def flash_attention_streaming_rope(q, k, v, cos, sin, kcos, ksin):
    """Streaming attention with in-VMEM rotary (separate q/k tables — see
    flash_attention_rope for the KV-append extended-table convention)."""
    return _flash_stream_rope_impl(q, k, v, cos, sin, kcos, ksin)


def _flash_stream_rope_impl(q, k, v, cos, sin, kcos, ksin):
    qr, kr, vr, tables, (b, h, sq, skv, d, bq, bk) = _stream_prep(
        q, k, v, cos, sin, kcos, ksin)
    out = _stream_call(qr, kr, vr, tables, scale=1.0 / (d ** 0.5), skv=skv,
                       d=d, bq=bq, bk=bk)
    return out[:, :sq].reshape(b, h, sq, d)


def _flash_stream_rope_fwd(q, k, v, cos, sin, kcos, ksin):
    o = _flash_stream_rope_impl(q, k, v, cos, sin, kcos, ksin)
    return o, (q, k, v, cos, sin, kcos, ksin, o)


def _flash_stream_rope_bwd(res, g):
    q, k, v, cos, sin, kcos, ksin, o = res
    if streaming_supported(q, k, v):
        _attn_debug("blocked_stream_rope", q, k)
        dq, dk, dv = _flash_bwd_blocked(q, k, v, g, o,
                                        (cos, sin, kcos, ksin))
    else:
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _ref_attn_rope(q_, k_, v_, cos, sin, kcos,
                                              ksin),
            q, k, v)
        dq, dk, dv = vjp(g)
    return (dq, dk, dv, jnp.zeros_like(cos), jnp.zeros_like(sin),
            jnp.zeros_like(kcos), jnp.zeros_like(ksin))


flash_attention_streaming_rope.defvjp(_flash_stream_rope_fwd,
                                      _flash_stream_rope_bwd)


# ------------------------------------------------------------ fused backward
#
# dP = dO V^T;  D = rowsum(dO * O);  dS = P * (dP - D) * scale
# dQ = dS K;  dK = dS^T Q;  dV = P^T dO          (non-causal, full attention)
#
# Full-KV schedule (training sequences are short: <=1536 tokens at 512^2):
# grid (B*H, Sq/BQ) with dK/dV accumulated in fp32 VMEM scratch across q
# blocks. The rope variant recomputes the rotation in VMEM and
# counter-rotates dQ/dK on the way out — valid because the tables are
# PAIR-CONSTANT (cos[2i]==cos[2i+1], true of every rope_multi_axis table and
# of the identity-extension rows), making each position's rotation an
# orthogonal 2x2 block whose transpose is rotate(., cos, -sin). Replaces the
# XLA-recompute backward that materialised fp32 logits to HBM (VERDICT r1
# weak #7).

def _pick_bq_bwd(sq: int, skv_pad: int, d: int) -> int:
    # resident: k+v bf16 + dk+dv fp32 acc + k_rot fp32 scratch + kcos/ksin
    # fp32 (the rope variant's worst case, 24 B/kv elem), plus FOUR live
    # fp32 [BQ, Skv] blocks — the block math keeps p/dp/ds (+ exp temp)
    # alive together (measured: skv 2048, bq 384 under the old two-block
    # model wants 17.14 MB scoped vmem and fails; four-block accounting
    # lands every shape under the 16 MB ceiling).
    fixed = skv_pad * d * (2 * 2 + 2 * 4 + 4 + 8)
    budget = max(15 * 1024 * 1024 - fixed, 2 * 1024 * 1024)
    bq = int(budget / (7 * 4 * skv_pad)) // 128 * 128
    return max(128, min(_round_up(sq, 128), 512, bq))


def _bwd_block_math(q, k, v, do, *, scale, kv_len):
    """Shared per-q-block backward math (fp32 in, fp32 out)."""
    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    if kv_len < k.shape[0]:
        idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(idx < kv_len, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)          # [BQ, Skv]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    dsum = jnp.sum(do * o, axis=-1, keepdims=True)      # [BQ, 1]
    ds = p * (dp - dsum) * scale                        # [BQ, Skv]
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk_c = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dv_c = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return dq, dk_c, dv_c


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     dk_acc, dv_acc, *, scale: float, kv_len: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    dq, dk_c, dv_c = _bwd_block_math(
        q_ref[0].astype(jnp.float32), k, v, do_ref[0].astype(jnp.float32),
        scale=scale, kv_len=kv_len)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_acc[:] += dk_c
    dv_acc[:] += dv_c

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _attn_bwd_rope_kernel(q_ref, k_ref, v_ref, do_ref, qcos_ref, qsin_ref,
                          kcos_ref, ksin_ref, dq_ref, dk_ref, dv_ref,
                          dk_acc, dv_acc, k_rot_ref, *, scale: float,
                          kv_len: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)
        k_rot_ref[:] = _rotate(k_ref[0], kcos_ref[:], ksin_ref[:])

    q = _rotate(q_ref[0], qcos_ref[:], qsin_ref[:])
    v = v_ref[0].astype(jnp.float32)
    dq_rot, dk_c, dv_c = _bwd_block_math(
        q, k_rot_ref[:], v, do_ref[0].astype(jnp.float32),
        scale=scale, kv_len=kv_len)
    # counter-rotate: dq = R^T dq_rot (R orthogonal per position)
    dq_ref[0] = _rotate(dq_rot, qcos_ref[:], -qsin_ref[:]).astype(dq_ref.dtype)
    dk_acc[:] += dk_c
    dv_acc[:] += dv_c

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        dk_ref[0] = _rotate(dk_acc[:], kcos_ref[:], -ksin_ref[:]
                            ).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, do, tables=None):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    skv_pad = _round_up(skv, 128)
    bq = _pick_bq_bwd(sq, skv_pad, d)
    sq_pad = _round_up(sq, bq)
    scale = 1.0 / (d ** 0.5)

    def flat(x, s, s_pad):
        x = x.reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0))) if s_pad != s else x

    qr, dor = flat(q, sq, sq_pad), flat(do, sq, sq_pad)
    kr, vr = flat(k, skv, skv_pad), flat(v, skv, skv_pad)

    qspec = pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, skv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [qspec, kspec, kspec, qspec]
    args = [qr, kr, vr, dor]
    scratch = [pltpu.VMEM((skv_pad, d), jnp.float32),
               pltpu.VMEM((skv_pad, d), jnp.float32)]
    if tables is None:
        kernel = functools.partial(_attn_bwd_kernel, scale=scale, kv_len=skv)
    else:
        qcos, qsin, kcos, ksin = tables

        def padt(t, n):
            t = t.astype(jnp.float32)
            return jnp.pad(t, ((0, n - t.shape[0]), (0, 0))) \
                if t.shape[0] != n else t
        args += [padt(qcos, sq_pad), padt(qsin, sq_pad),
                 padt(kcos, skv_pad), padt(ksin, skv_pad)]
        in_specs += [pl.BlockSpec((bq, d), lambda i, j: (j, 0),
                                  memory_space=pltpu.VMEM)] * 2 + \
                    [pl.BlockSpec((skv_pad, d), lambda i, j: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        scratch.append(pltpu.VMEM((skv_pad, d), jnp.float32))
        kernel = functools.partial(_attn_bwd_rope_kernel, scale=scale,
                                   kv_len=skv)

    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((b * h, sq_pad, d), q.dtype),
                   jax.ShapeDtypeStruct((b * h, skv_pad, d), k.dtype),
                   jax.ShapeDtypeStruct((b * h, skv_pad, d), v.dtype)),
        grid=(b * h, sq_pad // bq),
        in_specs=in_specs,
        out_specs=(qspec, kspec, kspec),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * sq_pad * skv_pad * d,
            bytes_accessed=3 * (qr.size + kr.size + vr.size) * qr.dtype.itemsize,
            transcendentals=b * h * sq_pad * skv_pad),
        interpret=_INTERPRET,
    )(*args)
    return (dq[:, :sq].reshape(b, h, sq, d),
            dk[:, :skv].reshape(b, h, skv, d),
            dv[:, :skv].reshape(b, h, skv, d))


def streaming_supported(q, k, v) -> bool:
    """dtype/head-dim gate for the streaming kernels (no KV length bound)."""
    if not _HAS_PLTPU:
        return False
    if q.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    d = q.shape[-1]
    return d % 128 == 0 or d in (64, 128)


# ------------------------------------------------- kv-blocked backward
#
# The full-KV backward above refuses past skv 2048 (its ~7 live fp32
# [BQ, Skv] blocks overflow VMEM — measured 16.89 MB at skv 2560/bq 128),
# which is EXACTLY the KV-append joint-attention shape of the 512² train
# step (1536-token stream + 1024 condition tokens = 2560): every control
# double/single block's attention backward fell through to the
# XLA-recompute VJP, which materialises [B,H,Sq,Skv] fp32 logits (and their
# cotangents) to HBM — ~750 MB per tensor per block application at the
# bench shapes (VERDICT r4 weak #1 / next-round #1a). This section is the
# VMEM-bounded replacement for ANY skv:
#
#   pass 1 (LSE): streaming logits pass -> lse = m + log(l)   [BH, Sq]
#   dsum = rowsum(dO * O) in XLA (O rides in the VJP residuals — free, the
#          forward already produced it)
#   pass 2 (DQ):  grid (BH, Sq/BQ, Skv/BK), kv inner; p recomputed per
#                 block as exp(logits - lse); dq accumulated in VMEM
#   pass 3 (DKV): grid (BH, Skv/BK, Sq/BQ), q inner; dk/dv accumulated
#
# Every live block is [BQ, BK] f32 (~0.5 MB at 256x512) — VMEM use is
# independent of the total sequence length. The rope variants rotate
# q/k in-kernel (pair-constant tables, same argument as the full-KV rope
# backward) and counter-rotate dq/dk on the way out.

BQ_BWD_BLK = int(os.environ.get("UNIGEN_PALLAS_BQ_BWDBLK", "512"))
BK_BWD_BLK = int(os.environ.get("UNIGEN_PALLAS_BK_BWDBLK", "0"))  # 0 = auto


def _pick_bk_bwd_blk(skv: int) -> int:
    """KV block for the kv-blocked backward. Device sweep at the train
    shape (b2·h24·sq1536·skv2560, PROFILE_BWD_SWEEP.json): larger blocks
    win decisively — (bq512, bk1280) 6.73 ms vs the first-cut (256, 512)
    8.74 ms (−23%); bq128 is uniformly worst. Per-pass efficiency factors
    measured there (bk512 ≈ 1.30×, bk1024 ≈ 1.08× interpolated, bk1280 =
    1.0×) weight the padded-work comparison so e.g. skv 4608 prefers
    bk1280 (+11% pad, −23% per pass) over the pad-free 512.
    (bq512, bk1280) is the device-verified VMEM ceiling (~14.5 MB modeled);
    UNIGEN_PALLAS_BK_BWDBLK overrides."""
    if BK_BWD_BLK:
        return BK_BWD_BLK
    cost = {1280: 1.0, 1024: 1.08, 512: 1.30}
    return min(cost, key=lambda bk: _round_up(skv, bk) * cost[bk])


def _lse_kernel(q_ref, k_ref, lse_ref, m_ref, l_ref, *, scale: float,
                kv_len: int, bk: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

    q, k = q_ref[0], k_ref[0]
    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    col = j * bk + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < kv_len, logits, -1e30)
    m_prev, l_prev = m_ref[:], l_ref[:]
    m_next = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(logits - m_next[:, :1])
    m_ref[:] = m_next
    l_ref[:] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        lse_ref[0] = m_ref[:] + jnp.log(jnp.maximum(l_ref[:], 1e-30))


def _lse_rope_kernel(q_ref, k_ref, qcos_ref, qsin_ref, kcos_ref, ksin_ref,
                     lse_ref, m_ref, l_ref, qrot_ref, *, scale: float,
                     kv_len: int, bk: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        qrot_ref[:] = _rotate(q_ref[0], qcos_ref[:], qsin_ref[:])

    k = _rotate(k_ref[0], kcos_ref[:], ksin_ref[:])
    logits = jax.lax.dot_general(qrot_ref[:], k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    col = j * bk + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < kv_len, logits, -1e30)
    m_prev, l_prev = m_ref[:], l_ref[:]
    m_next = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(logits - m_next[:, :1])
    m_ref[:] = m_next
    l_ref[:] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        lse_ref[0] = m_ref[:] + jnp.log(jnp.maximum(l_ref[:], 1e-30))


def _blk_ds(q, k, v, do, lse, dsum, *, scale, j, bk, kv_len):
    """Shared per-(q,kv)-block backward math. All fp32; returns (p, ds)."""
    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    col = j * bk + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < kv_len, logits, -1e30)
    p = jnp.exp(logits - lse[:, :1])                 # [BQ, BK]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dsum[:, :1]) * scale
    return p, ds


def _dq_blk_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, dq_ref,
                   dq_acc, *, scale: float, kv_len: int, bk: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    k = k_ref[0].astype(jnp.float32)
    _, ds = _blk_ds(q_ref[0].astype(jnp.float32), k,
                    v_ref[0].astype(jnp.float32),
                    do_ref[0].astype(jnp.float32),
                    lse_ref[0], dsum_ref[0], scale=scale, j=j, bk=bk,
                    kv_len=kv_len)
    dq_acc[:] += jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _dq_blk_rope_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                        qcos_ref, qsin_ref, kcos_ref, ksin_ref, dq_ref,
                        dq_acc, qrot_ref, *, scale: float, kv_len: int,
                        bk: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)
        qrot_ref[:] = _rotate(q_ref[0], qcos_ref[:], qsin_ref[:])

    k = _rotate(k_ref[0], kcos_ref[:], ksin_ref[:])
    _, ds = _blk_ds(qrot_ref[:], k, v_ref[0].astype(jnp.float32),
                    do_ref[0].astype(jnp.float32),
                    lse_ref[0], dsum_ref[0], scale=scale, j=j, bk=bk,
                    kv_len=kv_len)
    dq_acc[:] += jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        # counter-rotate: dq = R^T dq_rot (R orthogonal per position)
        dq_ref[0] = _rotate(dq_acc[:], qcos_ref[:], -qsin_ref[:]
                            ).astype(dq_ref.dtype)


def _dkv_blk_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, dsum_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float,
                    kv_len: int, bk: int):
    jq = pl.program_id(2)
    jk = pl.program_id(1)

    @pl.when(jq == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    p, ds = _blk_ds(q, k_ref[0].astype(jnp.float32),
                    v_ref[0].astype(jnp.float32), do,
                    lse_ref[0], dsum_ref[0], scale=scale, j=jk, bk=bk,
                    kv_len=kv_len)
    dk_acc[:] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dv_acc[:] += jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(jq == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _dkv_blk_rope_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, dsum_ref,
                         qcos_ref, qsin_ref, kcos_ref, ksin_ref,
                         dk_ref, dv_ref, dk_acc, dv_acc, krot_ref, *,
                         scale: float, kv_len: int, bk: int):
    jq = pl.program_id(2)
    jk = pl.program_id(1)

    @pl.when(jq == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)
        krot_ref[:] = _rotate(k_ref[0], kcos_ref[:], ksin_ref[:])

    q = _rotate(q_ref[0], qcos_ref[:], qsin_ref[:])
    do = do_ref[0].astype(jnp.float32)
    p, ds = _blk_ds(q, krot_ref[:], v_ref[0].astype(jnp.float32), do,
                    lse_ref[0], dsum_ref[0], scale=scale, j=jk, bk=bk,
                    kv_len=kv_len)
    dk_acc[:] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dv_acc[:] += jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(jq == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = _rotate(dk_acc[:], kcos_ref[:], -ksin_ref[:]
                            ).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_blocked(q, k, v, do, o, tables=None):
    """VMEM-bounded attention backward for any KV length (see section
    comment). q/k/v/do/o: [B, H, S(kv), D]; tables: optional
    (qcos, qsin, kcos, ksin)."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    bq = min(BQ_BWD_BLK, _round_up(sq, 128))
    bk = min(_pick_bk_bwd_blk(skv), _round_up(skv, 128))
    sq_pad, skv_pad = _round_up(sq, bq), _round_up(skv, bk)
    scale = 1.0 / (d ** 0.5)

    def flat(x, s, s_pad):
        x = x.reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0))) if s_pad != s else x

    qr, dor = flat(q, sq, sq_pad), flat(do, sq, sq_pad)
    kr, vr = flat(k, skv, skv_pad), flat(v, skv, skv_pad)
    bh = b * h
    grid_q = (bh, sq_pad // bq, skv_pad // bk)     # kv inner (LSE + DQ)
    grid_kv = (bh, skv_pad // bk, sq_pad // bq)    # q inner  (DKV)

    qspec_q = pl.BlockSpec((1, bq, d), lambda i, jq, jk: (i, jq, 0),
                           memory_space=pltpu.VMEM)
    kspec_q = pl.BlockSpec((1, bk, d), lambda i, jq, jk: (i, jk, 0),
                           memory_space=pltpu.VMEM)
    rspec_q = pl.BlockSpec((1, bq, 128), lambda i, jq, jk: (i, jq, 0),
                           memory_space=pltpu.VMEM)     # lse/dsum rows
    qspec_kv = pl.BlockSpec((1, bq, d), lambda i, jk, jq: (i, jq, 0),
                            memory_space=pltpu.VMEM)
    kspec_kv = pl.BlockSpec((1, bk, d), lambda i, jk, jq: (i, jk, 0),
                            memory_space=pltpu.VMEM)
    rspec_kv = pl.BlockSpec((1, bq, 128), lambda i, jk, jq: (i, jq, 0),
                            memory_space=pltpu.VMEM)

    if tables is not None:
        qcos, qsin, kcos, ksin = tables

        def padt(t, n):
            t = t.astype(jnp.float32)
            return jnp.pad(t, ((0, n - t.shape[0]), (0, 0))) \
                if t.shape[0] != n else t
        qcos, qsin = padt(qcos, sq_pad), padt(qsin, sq_pad)
        kcos, ksin = padt(kcos, skv_pad), padt(ksin, skv_pad)
        tq_q = [pl.BlockSpec((bq, d), lambda i, jq, jk: (jq, 0),
                             memory_space=pltpu.VMEM)] * 2
        tk_q = [pl.BlockSpec((bk, d), lambda i, jq, jk: (jk, 0),
                             memory_space=pltpu.VMEM)] * 2
        tq_kv = [pl.BlockSpec((bq, d), lambda i, jk, jq: (jq, 0),
                              memory_space=pltpu.VMEM)] * 2
        tk_kv = [pl.BlockSpec((bk, d), lambda i, jk, jq: (jk, 0),
                              memory_space=pltpu.VMEM)] * 2

    # ---- pass 1: LSE (streaming logits; [BH, Sq_pad, 128] lane-replicated)
    lse_scratch = [pltpu.VMEM((bq, 128), jnp.float32),
                   pltpu.VMEM((bq, 128), jnp.float32)]
    if tables is None:
        lse = pl.pallas_call(
            functools.partial(_lse_kernel, scale=scale, kv_len=skv, bk=bk),
            out_shape=jax.ShapeDtypeStruct((bh, sq_pad, 128), jnp.float32),
            grid=grid_q, in_specs=[qspec_q, kspec_q], out_specs=rspec_q,
            scratch_shapes=lse_scratch,
            cost_estimate=pl.CostEstimate(
                flops=2 * bh * sq_pad * skv_pad * d,
                bytes_accessed=(qr.size + kr.size) * qr.dtype.itemsize,
                transcendentals=bh * sq_pad * skv_pad),
            interpret=_INTERPRET,
        )(qr, kr)
    else:
        lse = pl.pallas_call(
            functools.partial(_lse_rope_kernel, scale=scale, kv_len=skv,
                              bk=bk),
            out_shape=jax.ShapeDtypeStruct((bh, sq_pad, 128), jnp.float32),
            grid=grid_q, in_specs=[qspec_q, kspec_q] + tq_q + tk_q,
            out_specs=rspec_q,
            scratch_shapes=lse_scratch + [pltpu.VMEM((bq, d), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * bh * sq_pad * skv_pad * d,
                bytes_accessed=(qr.size + kr.size) * qr.dtype.itemsize,
                transcendentals=bh * sq_pad * skv_pad),
            interpret=_INTERPRET,
        )(qr, kr, qcos, qsin, kcos, ksin)

    # dsum = rowsum(dO * O) — O from the VJP residuals (already computed by
    # the forward); lane-replicated to the same [BH, Sq_pad, 128] layout
    dsum = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    dsum = dsum.reshape(bh, sq)
    if sq_pad != sq:
        dsum = jnp.pad(dsum, ((0, 0), (0, sq_pad - sq)))
    dsum = jnp.broadcast_to(dsum[:, :, None], (bh, sq_pad, 128))

    cost2 = pl.CostEstimate(
        flops=5 * bh * sq_pad * skv_pad * d,
        bytes_accessed=(2 * qr.size + 2 * kr.size) * qr.dtype.itemsize,
        transcendentals=bh * sq_pad * skv_pad)

    # ---- pass 2: dQ (kv inner, dq accumulated in VMEM)
    if tables is None:
        dq = pl.pallas_call(
            functools.partial(_dq_blk_kernel, scale=scale, kv_len=skv, bk=bk),
            out_shape=jax.ShapeDtypeStruct((bh, sq_pad, d), q.dtype),
            grid=grid_q,
            in_specs=[qspec_q, kspec_q, kspec_q, qspec_q, rspec_q, rspec_q],
            out_specs=qspec_q,
            scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
            cost_estimate=cost2, interpret=_INTERPRET,
        )(qr, kr, vr, dor, lse, dsum)
    else:
        dq = pl.pallas_call(
            functools.partial(_dq_blk_rope_kernel, scale=scale, kv_len=skv,
                              bk=bk),
            out_shape=jax.ShapeDtypeStruct((bh, sq_pad, d), q.dtype),
            grid=grid_q,
            in_specs=[qspec_q, kspec_q, kspec_q, qspec_q, rspec_q, rspec_q]
            + tq_q + tk_q,
            out_specs=qspec_q,
            scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32),
                            pltpu.VMEM((bq, d), jnp.float32)],
            cost_estimate=cost2, interpret=_INTERPRET,
        )(qr, kr, vr, dor, lse, dsum, qcos, qsin, kcos, ksin)

    # ---- pass 3: dK/dV (q inner, dk/dv accumulated in VMEM)
    if tables is None:
        dk, dv = pl.pallas_call(
            functools.partial(_dkv_blk_kernel, scale=scale, kv_len=skv,
                              bk=bk),
            out_shape=(jax.ShapeDtypeStruct((bh, skv_pad, d), k.dtype),
                       jax.ShapeDtypeStruct((bh, skv_pad, d), v.dtype)),
            grid=grid_kv,
            in_specs=[kspec_kv, kspec_kv, qspec_kv, qspec_kv, rspec_kv,
                      rspec_kv],
            out_specs=(kspec_kv, kspec_kv),
            scratch_shapes=[pltpu.VMEM((bk, d), jnp.float32),
                            pltpu.VMEM((bk, d), jnp.float32)],
            cost_estimate=cost2, interpret=_INTERPRET,
        )(kr, vr, qr, dor, lse, dsum)
    else:
        dk, dv = pl.pallas_call(
            functools.partial(_dkv_blk_rope_kernel, scale=scale, kv_len=skv,
                              bk=bk),
            out_shape=(jax.ShapeDtypeStruct((bh, skv_pad, d), k.dtype),
                       jax.ShapeDtypeStruct((bh, skv_pad, d), v.dtype)),
            grid=grid_kv,
            in_specs=[kspec_kv, kspec_kv, qspec_kv, qspec_kv, rspec_kv,
                      rspec_kv] + tq_kv + tk_kv,
            out_specs=(kspec_kv, kspec_kv),
            scratch_shapes=[pltpu.VMEM((bk, d), jnp.float32),
                            pltpu.VMEM((bk, d), jnp.float32),
                            pltpu.VMEM((bk, d), jnp.float32)],
            cost_estimate=cost2, interpret=_INTERPRET,
        )(kr, vr, qr, dor, lse, dsum, qcos, qsin, kcos, ksin)

    return (dq[:, :sq].reshape(b, h, sq, d),
            dk[:, :skv].reshape(b, h, skv, d),
            dv[:, :skv].reshape(b, h, skv, d))
