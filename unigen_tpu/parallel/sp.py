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


def current_sp() -> Optional[Tuple[Mesh, str]]:
    """The active (mesh, axis_name) sequence context, or None."""
    return getattr(_state, "sp", None)


@contextlib.contextmanager
def sequence_sharding(mesh: Mesh, axis: str = "sequence"):
    """Activate Ulysses sequence parallelism for attention calls traced
    inside this block. A mesh whose `axis` has size 1 is a no-op."""
    prev = getattr(_state, "sp", None)
    _state.sp = (mesh, axis) if mesh.shape.get(axis, 1) > 1 else None
    try:
        yield
    finally:
        _state.sp = prev


def sp_divisible(q, k, mesh: Mesh, axis: str) -> bool:
    """Ulysses needs heads and BOTH sequence lengths divisible by the axis
    size (two tiled all_to_alls)."""
    n = mesh.shape[axis]
    return (q.shape[1] % n == 0 and q.shape[2] % n == 0
            and k.shape[2] % n == 0)


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
