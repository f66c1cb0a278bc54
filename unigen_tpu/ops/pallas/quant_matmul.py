"""Fused W4A8 dequant-matmul kernel (Pallas / TPU).

The XLA path for nibble-packed int4 weights materialises the unpacked int8
weight in HBM before the dot (write + read = 2 B/param on top of the packed
0.5 B read): at 12B full-topology weights that is ~13% of forward time by
roofline. This kernel reads the PACKED block HBM->VMEM, sign-extends the two
nibbles on the VPU, and feeds the int8 MXU directly — weight traffic stays
at 0.5 B/param.

Layout: x is pre-quantized per-token int8 (xq [M, K], scale xs [M, 1] —
the dynamic-activation step stays in XLA where it fuses with the producer);
w_q4 [K/2, N] packed int8 (ops/quant.pack_int4 pairing), w_scale [1, N].
grid = (M/BM, N/BN, K/BK), K innermost, int32 VMEM accumulator, fp32
epilogue applying xs * w_scale on the last K step.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INTERPRET = os.environ.get("UNIGEN_PALLAS_INTERPRET") == "1"

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

BM, BN, BK = 256, 512, 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _unpack_block(p):
    """packed int8 [BK/2, BN] -> int8 [BK, BN] (interleaved rows, matching
    ops/quant.pack_int4: even source row = low nibble, odd = high)."""
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)
    hi = jnp.right_shift(p, 4)
    half, bn = p.shape
    out = jnp.stack([lo, hi], axis=1)          # [BK/2, 2, BN]
    return out.reshape(half * 2, bn)


def _w4a8_kernel(xq_ref, wp_ref, xs_ref, ws_ref, o_ref, acc_ref, *, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_block(wp_ref[:])
    acc_ref[:] += jax.lax.dot_general(
        xq_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _():
        out = acc_ref[:].astype(jnp.float32) * xs_ref[:] * ws_ref[:]
        o_ref[:] = out.astype(o_ref.dtype)


def w4a8_matmul_pallas(xq: jnp.ndarray, xs: jnp.ndarray, w_q4: jnp.ndarray,
                       w_scale: jnp.ndarray, out_dtype=jnp.bfloat16
                       ) -> jnp.ndarray:
    """xq [M, K] int8, xs [M, 1] fp32, w_q4 [K/2, N] packed, w_scale [1, N]
    -> [M, N] out_dtype."""
    m, k = xq.shape
    n = w_q4.shape[1]
    m_pad, k_pad, n_pad = _round_up(m, BM), _round_up(k, BK), _round_up(n, BN)
    if (m_pad, k_pad) != (m, k):
        xq = jnp.pad(xq, ((0, m_pad - m), (0, k_pad - k)))
        xs = jnp.pad(xs, ((0, m_pad - m), (0, 0)))
    if (k_pad // 2, n_pad) != w_q4.shape:
        w_q4 = jnp.pad(w_q4, ((0, (k_pad - k) // 2), (0, n_pad - n)))
        w_scale = jnp.pad(w_scale, ((0, 0), (0, n_pad - n)))
    nk = k_pad // BK
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel, nk=nk),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype),
        grid=(m_pad // BM, n_pad // BN, nk),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK // 2, BN), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, 1), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k_pad,
            bytes_accessed=xq.size + w_q4.size + 2 * m_pad * n_pad,
            transcendentals=0),
        interpret=_INTERPRET,
    )(xq, w_q4, xs.astype(jnp.float32), w_scale.astype(jnp.float32))
    return out[:m, :n]


def supported(x, w_q4) -> bool:
    if not _HAS_PLTPU:
        return False
    # the kernel wants a real K to amortise; tiny layers stay on XLA
    return x.shape[-1] >= 1024 and w_q4.shape[-1] >= 256
