"""Sequence-parallel execution context: Ulysses attention through the FULL
model forward (SURVEY.md §2.6 — the repo's first-class long-context plan;
the reference has no equivalent).

Design: the model's attention call sites all go through ops/attention.sdpa.
When a sequence context is active at TRACE time, sdpa routes each attention
through a PARTIAL-MANUAL shard_map — only the 'sequence' axis is manual
(the head<->sequence all_to_all pair of parallel/ulysses), every other mesh
axis (data/expert/model) stays GSPMD-auto, so batch sharding, ZeRO gathers
and TP collectives keep composing around it. The shard_map's in/out specs
pin activations to sequence sharding at every attention boundary; XLA
propagates that sharding through the pointwise/matmul ops between blocks.

Usage (context active while the jit TRACES, e.g. around the first call):

    with sp.sequence_sharding(mesh):
        out = jax.jit(train_step)(...)

Caveat: the context influences tracing, not the jit cache key — trace a
given program either with or without a sequence context, not both. (The
train/bench paths trace exactly once, so in practice this is a non-issue;
tests use distinct jitted callables per mode.)

RoPE under SP is PRE-APPLIED at the (auto-sharded) call site — the rotation
is elementwise over [S, D] tables, which XLA shards along with q/k — and
the manual region receives already-rotated q/k, so the Pallas fused-rope
path is simply bypassed in SP mode.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

_state = threading.local()


def current_sp() -> Optional[Tuple[Mesh, str, str]]:
    """The active (mesh, axis_name, impl) sequence context, or None.
    impl is "ulysses" (head<->sequence all_to_all pair) or "ring"
    (K/V blocks rotate via ppermute, parallel/ring.py)."""
    return getattr(_state, "sp", None)


@contextlib.contextmanager
def sequence_sharding(mesh: Mesh, axis: str = "sequence",
                      impl: Optional[str] = None):
    """Activate sequence parallelism for attention calls traced inside this
    block. A mesh whose `axis` has size 1 is a no-op.

    impl: "ulysses" (default) or "ring"; None reads UNIGEN_SP_IMPL.
    Ulysses moves activations (two all_to_alls) and needs heads divisible
    by the axis size; ring moves K/V blocks over neighbour links
    (bandwidth ∝ KV size, no head-divisibility requirement) — the better
    fit when heads are few or KV is much smaller than the stream."""
    if impl is None:
        import os
        impl = os.environ.get("UNIGEN_SP_IMPL", "ulysses")
    assert impl in ("ulysses", "ring"), impl
    prev = getattr(_state, "sp", None)
    _state.sp = ((mesh, axis, impl)
                 if mesh.shape.get(axis, 1) > 1 else None)
    try:
        yield
    finally:
        _state.sp = prev


def sp_divisible(q, k, mesh: Mesh, axis: str, impl: str = "ulysses") -> bool:
    """Ulysses needs heads and BOTH sequence lengths divisible by the axis
    size (two tiled all_to_alls); ring only needs the sequence lengths
    (K/V blocks rotate whole)."""
    n = mesh.shape[axis]
    seq_ok = q.shape[2] % n == 0 and k.shape[2] % n == 0
    if impl == "ring":
        return seq_ok
    return seq_ok and q.shape[1] % n == 0


def sharded_ulysses_sdpa(q, k, v, mesh: Mesh, axis: str = "sequence"):
    """[B,H,S,D] q/k/v (rope pre-applied) -> attention output, computed
    sequence-sharded via a partial-manual shard_map: 'sequence' manual,
    all other mesh axes auto (GSPMD)."""
    from unigen_tpu.parallel.ulysses import ulysses_sdpa

    spec = P(None, None, axis, None)
    auto_inner = "auto_local"   # sdpa dispatch minus the SP-context check

    def run(q, k, v):
        return ulysses_sdpa(q, k, v, axis, impl=auto_inner)

    return jax.shard_map(run, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, axis_names={axis},
                         check_vma=False)(q, k, v)


def sharded_ring_sdpa(q, k, v, mesh: Mesh, axis: str = "sequence"):
    """[B,H,S,D] q/k/v (rope pre-applied) -> attention output via ring
    attention (parallel/ring.py): K/V blocks rotate around the 'sequence'
    ring over neighbour ICI links while each shard accumulates an online
    softmax. Same partial-manual composition as sharded_ulysses_sdpa."""
    from unigen_tpu.parallel.ring import ring_sdpa

    spec = P(None, None, axis, None)

    def run(q, k, v):
        return ring_sdpa(q, k, v, axis)

    return jax.shard_map(run, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, axis_names={axis},
                         check_vma=False)(q, k, v)
