"""GShard-style top-k gating + multi-stream dispatch/combine.

TPU-native re-design of the reference's DeepSpeed ``TopKGate`` + custom
``MOELayer`` (src/UniGenUtils.py:17-191):

  * gate: softmax -> top-1 (or top-2) -> capacity-limited one-hot dispatch
    mask [S, E, C] and combine weights carrying the gate probability; aux
    loss = E * sum(mean_gates * mean_mask) (GShard algorithm 2).
  * capacity is STATIC (computed from the trace-time token count), so the
    whole router is dense einsum work that XLA tiles onto the MXU — no
    gather/scatter, no dynamic shapes.
  * the multi-stream contract: every [B, S, C'] tensor kwarg is dispatched by
    the same mask; [B, C'] tensors are broadcast per-token first; tensors with
    a different sequence length pass through (reference UniGenUtils.py:103-120).
  * dropped tokens (over capacity) combine to zeros — reference behavior.
  * expert parallelism: when an 'expert' mesh axis is active the dispatched
    blocks are exchanged with lax.all_to_all (see unigen_tpu/parallel).
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp


class GateOutput(NamedTuple):
    combine_weights: jnp.ndarray  # [S, E, C] float
    dispatch_mask: jnp.ndarray    # [S, E, C] bool
    aux_loss: jnp.ndarray         # scalar
    expert_counts: jnp.ndarray    # [E] int32 (pre-capacity assignment counts)
    # token-level routing (top-1 only; None from top2_gate) — feeds the
    # gather-based fast dispatch (the tutel-equivalent, UniGenUtils.py:91-97)
    expert_idx: Optional[jnp.ndarray] = None   # [S] int32 chosen expert
    slot: Optional[jnp.ndarray] = None         # [S] int32 slot within expert
    gate_scalar: Optional[jnp.ndarray] = None  # [S] fp32 gate prob (0 if dropped)
    kept: Optional[jnp.ndarray] = None         # [S] fp32 in {0,1}


def compute_capacity(num_tokens: int, num_experts: int, capacity_factor: float,
                     min_capacity: int) -> int:
    cap = math.ceil(num_tokens / num_experts * capacity_factor)
    return max(cap, min_capacity)


def top1_gate(logits: jnp.ndarray, capacity: int, *,
              used_token: Optional[jnp.ndarray] = None,
              rng: Optional[jax.Array] = None,
              use_rts: bool = False) -> GateOutput:
    """Top-1 gate over logits [S, E].

    Capacity selection keeps the first ``capacity`` tokens per expert in token
    order (deterministic), or prioritises by uniform noise when ``use_rts``
    (random token selection, training-only).
    """
    s, e = logits.shape
    logits = logits.astype(jnp.float32)
    gates = jax.nn.softmax(logits, axis=-1)
    idx = jnp.argmax(gates, axis=-1)
    mask1 = jax.nn.one_hot(idx, e, dtype=jnp.float32)
    if used_token is not None:
        mask1 = mask1 * used_token[:, None]

    expert_counts = jnp.sum(mask1, axis=0).astype(jnp.int32)
    me = jnp.mean(gates, axis=0)
    ce = jnp.mean(mask1, axis=0)
    aux = jnp.sum(me * ce) * e

    if use_rts and rng is not None:
        priority = mask1 * jax.random.uniform(rng, mask1.shape)
        # rank tokens per expert by priority (descending); keep top `capacity`
        order = jnp.argsort(-priority, axis=0)               # [S, E]
        ranks = jnp.argsort(order, axis=0)                   # rank of each token
        keep = (ranks < capacity).astype(jnp.float32) * mask1
    else:
        positions = jnp.cumsum(mask1, axis=0) - mask1        # 0-based slot per expert
        keep = mask1 * (positions < capacity).astype(jnp.float32)

    locations = (jnp.cumsum(keep, axis=0) - keep)            # slot within expert
    loc_s = jnp.sum(locations * keep, axis=-1).astype(jnp.int32)   # [S]
    gate_s = jnp.sum(gates * keep, axis=-1)                  # [S] (0 if dropped)
    kept_any = jnp.sum(keep, axis=-1)                        # [S] in {0,1}

    loc_onehot = jax.nn.one_hot(loc_s, capacity, dtype=jnp.float32) * kept_any[:, None]
    combine = gate_s[:, None, None] * keep[:, :, None] * loc_onehot[:, None, :]
    dispatch = combine > 0
    return GateOutput(combine, dispatch, aux, expert_counts,
                      expert_idx=idx.astype(jnp.int32), slot=loc_s,
                      gate_scalar=gate_s * kept_any, kept=kept_any)


def top2_gate(logits: jnp.ndarray, capacity: int, *,
              rng: Optional[jax.Array] = None,
              second_expert_sampling: bool = False) -> GateOutput:
    """Top-2 gate (GShard): second expert optionally sampled; gate values of
    the two assignments renormalised."""
    s, e = logits.shape
    logits = logits.astype(jnp.float32)
    gates = jax.nn.softmax(logits, axis=-1)

    idx1 = jnp.argmax(gates, axis=-1)
    mask1 = jax.nn.one_hot(idx1, e, dtype=jnp.float32)
    logits_wo1 = jnp.where(mask1 > 0, -jnp.inf, logits)
    if second_expert_sampling and rng is not None:
        gumbel = -jnp.log(-jnp.log(jax.random.uniform(rng, logits.shape) + 1e-9) + 1e-9)
        idx2 = jnp.argmax(logits_wo1 + gumbel, axis=-1)
    else:
        idx2 = jnp.argmax(logits_wo1, axis=-1)
    mask2 = jax.nn.one_hot(idx2, e, dtype=jnp.float32)

    me = jnp.mean(gates, axis=0)
    ce = jnp.mean(mask1, axis=0)
    aux = jnp.sum(me * ce) * e

    pos1 = jnp.cumsum(mask1, axis=0) - mask1
    keep1 = mask1 * (pos1 < capacity)
    # DeepSpeed parity: locations2 offset by the PRE-capacity top-1 count, so
    # an expert whose top-1 demand exceeds capacity admits no top-2 tokens.
    pos2 = jnp.cumsum(mask2, axis=0) - mask2 + jnp.sum(mask1, axis=0, keepdims=True)
    keep2 = mask2 * (pos2 < capacity)

    g1 = jnp.sum(gates * keep1, axis=-1)
    g2 = jnp.sum(gates * keep2, axis=-1)
    denom = jnp.clip(g1 + g2, 1e-9)
    g1, g2 = g1 / denom, g2 / denom

    loc1 = jnp.sum(pos1 * keep1, axis=-1).astype(jnp.int32)
    loc2 = jnp.sum(pos2 * keep2, axis=-1).astype(jnp.int32)
    c1 = (g1[:, None, None] * keep1[:, :, None]
          * jax.nn.one_hot(loc1, capacity, dtype=jnp.float32)[:, None, :]
          * (jnp.sum(keep1, -1))[:, None, None])
    c2 = (g2[:, None, None] * keep2[:, :, None]
          * jax.nn.one_hot(loc2, capacity, dtype=jnp.float32)[:, None, :]
          * (jnp.sum(keep2, -1))[:, None, None])
    combine = c1 + c2
    counts = jnp.sum(mask1 + mask2, axis=0).astype(jnp.int32)
    return GateOutput(combine, combine > 0, aux, counts)


def dispatch(mask: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
    """[S, E, C] x [S, M] -> [E, C, M] (dense einsum; MXU-friendly)."""
    return jnp.einsum("sec,sm->ecm", mask.astype(tokens.dtype), tokens)


def combine(weights: jnp.ndarray, expert_out: jnp.ndarray,
            out_dtype=None) -> jnp.ndarray:
    """[S, E, C] x [E, C, M] -> [S, M]."""
    out = jnp.einsum("sec,ecm->sm", weights.astype(expert_out.dtype), expert_out)
    return out.astype(out_dtype) if out_dtype is not None else out


# ------------------------------------------------- gather-based fast path
#
# The reference's optional tutel dispatcher (UniGenUtils.py:91-97,137-138,
# 180-181) replaces the dense einsum dispatch with CUDA scatter kernels. The
# TPU-native equivalent: one TINY [E*C] int32 scatter builds the slot->token
# index once, then every stream moves by plain row gathers — O(S*M) per
# stream instead of the einsum's O(S*E*C*M), and XLA lowers row gathers onto
# the same fast path as embedding lookups. Top-1 only (serving mode).

def dispatch_slots(gate: GateOutput, capacity: int, num_experts: int
                   ) -> tuple:
    """-> (slot_token [E*C] int32 with S as the empty-slot sentinel,
           dest [S] int32 flat slot id, E*C for dropped tokens)."""
    s = gate.expert_idx.shape[0]
    trash = num_experts * capacity
    dest = jnp.where(gate.kept > 0,
                     gate.expert_idx * capacity + gate.slot,
                     trash).astype(jnp.int32)
    slot_token = jnp.full((trash + 1,), s, jnp.int32)
    slot_token = slot_token.at[dest].set(jnp.arange(s, dtype=jnp.int32),
                                         mode="drop")
    return slot_token[:trash], dest


def dispatch_gather(slot_token: jnp.ndarray, tokens: jnp.ndarray,
                    capacity: int, num_experts: int) -> jnp.ndarray:
    """[E*C] x [S, M] -> [E, C, M]; empty slots read a zero row."""
    pad = jnp.concatenate([tokens, jnp.zeros((1, tokens.shape[-1]),
                                             tokens.dtype)])
    return pad[slot_token].reshape(num_experts, capacity, tokens.shape[-1])


def combine_gather(gate: GateOutput, dest: jnp.ndarray,
                   expert_out: jnp.ndarray, out_dtype=None) -> jnp.ndarray:
    """[S] x [E, C, M] -> [S, M]: out[s] = gate_prob[s] * expert_out[dest[s]]
    (dropped tokens read the zero pad row — reference combine-to-zeros)."""
    e, c, m = expert_out.shape
    pad = jnp.concatenate([expert_out.reshape(e * c, m),
                           jnp.zeros((1, m), expert_out.dtype)])
    out = pad[dest] * gate.gate_scalar[:, None].astype(expert_out.dtype)
    return out.astype(out_dtype) if out_dtype is not None else out


def dispatch_streams_gather(gate: GateOutput, capacity: int, num_experts: int,
                            seq_len: int, streams: Dict[str, Any]
                            ) -> tuple:
    """Fast-path version of ``dispatch_streams`` (same routing contract);
    also returns ``dest`` for ``combine_gather``."""
    slot_token, dest = dispatch_slots(gate, capacity, num_experts)
    out = {}
    for name, v in streams.items():
        if not isinstance(v, jnp.ndarray):
            out[name] = v
            continue
        if v.ndim == 2:  # [B, C'] -> broadcast per token
            b, c = v.shape
            vv = jnp.broadcast_to(v[:, None, :], (b, seq_len, c)).reshape(-1, c)
            out[name] = dispatch_gather(slot_token, vv, capacity, num_experts)
        elif v.ndim == 3:
            if v.shape[1] != seq_len:
                out[name] = v  # passthrough (e.g. text stream)
            else:
                out[name] = dispatch_gather(slot_token,
                                            v.reshape(-1, v.shape[-1]),
                                            capacity, num_experts)
        else:
            raise ValueError(f"MoE dispatch got bad stream {name}: {v.shape}")
    return out, dest


def dispatch_streams(dispatch_mask: jnp.ndarray, seq_len: int,
                     streams: Dict[str, Any]) -> Dict[str, Any]:
    """The reference's dispatched-kwargs contract: route every compatible
    stream by one mask. Returns dict of [E, C, M] arrays (or passthroughs).

    dispatch_mask: [S_tok, E, C] where S_tok = B * seq_len.
    """
    out = {}
    for name, v in streams.items():
        if not isinstance(v, jnp.ndarray):
            out[name] = v
            continue
        if v.ndim == 2:  # [B, C'] -> broadcast per token
            b, c = v.shape
            vv = jnp.broadcast_to(v[:, None, :], (b, seq_len, c)).reshape(-1, c)
            out[name] = dispatch(dispatch_mask, vv)
        elif v.ndim == 3:
            if v.shape[1] != seq_len:
                out[name] = v  # passthrough (e.g. text stream)
            else:
                out[name] = dispatch(dispatch_mask, v.reshape(-1, v.shape[-1]))
        else:
            raise ValueError(f"MoE dispatch got bad stream {name}: {v.shape}")
    return out
