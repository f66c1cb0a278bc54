"""Condition-expert MoE module (expert modulation), TPU-native.

Re-design of the reference's DeepSpeed-MoE wiring (UniGenTransformer.py:
806-1026 for Flux, :160-296 for SD3): a GShard top-1 router whose dispatch
mask routes EVERY stream (hidden, condition, temb, condition_temb, pooled,
condition_pooled) identically, expert compute as batched modulated linears
(or per-expert single transformer blocks), einsum combine, then the optional
consis module and shared-expert condition-weaving double blocks.

Experts live as stacked tensors with a leading expert axis so the whole MoE
is dense batched-matmul work on the MXU. With an active 'expert' mesh axis
the dispatched blocks are exchanged via lax.all_to_all (the reference's
NCCL ``_AllToAll`` pair, UniGenUtils.py:149,171).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from unigen_tpu.config import ControlConfig
from unigen_tpu.layers.core import init_linear
from unigen_tpu.ops import gating
from unigen_tpu.ops.modulation import batched_modulated_linear
from unigen_tpu.utils import init_stacked


class MoEOutput(NamedTuple):
    expert_hidden: jnp.ndarray      # [B, S, D]
    expert_condition: jnp.ndarray   # [B, S, D]
    aux_loss: jnp.ndarray           # scalar
    expert_counts: jnp.ndarray      # [E]


def init_moe_params(key, dim: int, pooled_dim: int, num_experts: int, *,
                    modulated: bool = True,
                    expert_block_init: Optional[Callable] = None,
                    dtype=jnp.float32) -> dict:
    """modulated=True: each expert is two [Linear(d,d), Linear(pooled,d)]
    modulation pairs (the use_modulate|use_rope flavor). Otherwise each expert
    is a pair of single transformer blocks built by ``expert_block_init``."""
    ks = jax.random.split(key, 9)
    p: Dict[str, Any] = {
        # gate kept in fp32 (DeepSpeed convention)
        "gate": init_linear(ks[0], dim, num_experts, bias=False, dtype=jnp.float32),
    }
    if modulated:
        def stack_lin(key_, i, o):
            return init_stacked(key_, num_experts,
                                lambda k: init_linear(k, i, o, dtype=dtype))
        p["experts"] = {
            "cond_mod": stack_lin(ks[1], dim, dim),
            "cond_pool": stack_lin(ks[2], pooled_dim, dim),
            "hid_mod": stack_lin(ks[3], dim, dim),
            "hid_pool": stack_lin(ks[4], pooled_dim, dim),
        }
    else:
        assert expert_block_init is not None
        p["experts"] = {
            "hid_block": init_stacked(ks[1], num_experts, expert_block_init),
            "cond_block": init_stacked(ks[2], num_experts, expert_block_init),
        }
    return p


def _expert_compute_modulated(experts: dict, routed: Dict[str, jnp.ndarray]
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched expert-modulation (reference expert_forward use_modulate branch,
    UniGenTransformer.py:952-959):
        cond'  = W_c (.) Lc(cond_pooled)  @ cond + b_c
        hidden' = W_h (.) Lh(pooled) @ (hidden + cond') + b_h
    All inputs are dispatched [E, C, *]."""
    s_c = jnp.einsum("eci,eio->eco", routed["condition_pooled"],
                     experts["cond_pool"]["w"]) + experts["cond_pool"]["b"][:, None, :]
    cond_out = batched_modulated_linear(routed["condition"],
                                        experts["cond_mod"]["w"], s_c,
                                        experts["cond_mod"]["b"])
    s_h = jnp.einsum("eci,eio->eco", routed["pooled"],
                     experts["hid_pool"]["w"]) + experts["hid_pool"]["b"][:, None, :]
    hid_out = batched_modulated_linear(routed["hidden"] + cond_out,
                                       experts["hid_mod"]["w"], s_h,
                                       experts["hid_mod"]["b"])
    return hid_out, cond_out


def _expert_compute_blocks(experts: dict, routed: Dict[str, jnp.ndarray], *,
                           block_apply: Callable, heads: int
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-expert single-transformer-block experts (non-modulated flavor):
    vmapped over the expert axis; temb is token-wise [E, C, D]."""
    def one(hp, cp, h, c, th, tc):
        h_out = block_apply(hp, h[None], th[None], heads=heads)[0]
        c_out = block_apply(cp, c[None], tc[None], heads=heads)[0]
        return h_out, c_out
    return jax.vmap(one)(experts["hid_block"], experts["cond_block"],
                         routed["hidden"], routed["condition"],
                         routed["temb"], routed["condition_temb"])


def moe_apply(params: dict, cfg: ControlConfig, num_experts: int,
              hidden: jnp.ndarray, condition: jnp.ndarray,
              streams: Dict[str, jnp.ndarray], *,
              block_apply: Optional[Callable] = None, heads: Optional[int] = None,
              rng: Optional[jax.Array] = None, training: bool = False,
              expert_axis: Optional[str] = None) -> MoEOutput:
    """Route on (hidden + condition), dispatch all streams with one mask, run
    experts, combine. ``streams`` must include condition_pooled/pooled (+
    temb/condition_temb for block experts).

    expert_axis: name of an active mesh axis for expert parallelism — the
    dispatched [E, C, M] blocks are all_to_all'd so each shard computes its
    local experts (reference's two NCCL All-to-Alls).
    """
    if cfg.moe.batch_mode == "per_sample" and hidden.shape[0] > 1:
        # vmapped per-sample routing with per-sample capacity: dispatch cost
        # linear in batch (the "global" reference mode is quadratic). The
        # inner call sees b=1 so this branch cannot recurse.
        def one(h, c, p, cp, t, ct):
            st = {"pooled": p[None], "condition_pooled": cp[None],
                  "temb": t[None], "condition_temb": ct[None]}
            return moe_apply(params, cfg, num_experts, h[None], c[None], st,
                             block_apply=block_apply, heads=heads, rng=rng,
                             training=training, expert_axis=expert_axis)

        zeros = jnp.zeros((hidden.shape[0], hidden.shape[-1]), hidden.dtype)
        out = jax.vmap(one)(hidden, condition,
                            streams["pooled"], streams["condition_pooled"],
                            streams.get("temb", zeros),
                            streams.get("condition_temb", zeros))
        return MoEOutput(out.expert_hidden[:, 0], out.expert_condition[:, 0],
                         jnp.mean(out.aux_loss), jnp.sum(out.expert_counts, 0))

    b, s, d = hidden.shape
    choice = (hidden + condition).reshape(-1, d)
    logits = choice.astype(jnp.float32) @ params["gate"]["w"]
    cap_factor = cfg.moe.capacity_factor if training else cfg.moe.eval_capacity_factor
    capacity = gating.compute_capacity(b * s, num_experts, cap_factor,
                                       cfg.moe.min_capacity)
    if not cfg.moe.drop_tokens:
        # DeepSpeed drop_tokens=False: capacity covers the worst case (every
        # token to one expert) so nothing can drop — static shapes keep this
        # free of dynamic padding (reference UniGenUtils.py:18,35)
        capacity = b * s
    if cfg.moe.top_k == 2:
        gate_out = gating.top2_gate(logits, capacity, rng=rng)
    else:
        gate_out = gating.top1_gate(logits, capacity, rng=rng,
                                    use_rts=cfg.moe.use_rts and training)

    routed = {"hidden": hidden, "condition": condition}
    routed.update(streams)
    fast = cfg.moe.fast_dispatch and gate_out.expert_idx is not None
    if fast:
        routed, dest = gating.dispatch_streams_gather(
            gate_out, capacity, num_experts, s, routed)
    else:
        routed = gating.dispatch_streams(gate_out.dispatch_mask, s, routed)

    if expert_axis is not None:
        # EP: split the expert axis across shards, exchange over ICI.
        routed = {k: _all_to_all_ep(v, expert_axis) if isinstance(v, jnp.ndarray)
                  and v.ndim == 3 and v.shape[0] == num_experts else v
                  for k, v in routed.items()}

    if "cond_mod" in params["experts"]:
        hid_out, cond_out = _expert_compute_modulated(params["experts"], routed)
    else:
        hid_out, cond_out = _expert_compute_blocks(
            params["experts"], routed, block_apply=block_apply, heads=heads)

    if expert_axis is not None:
        hid_out = _all_to_all_ep(hid_out, expert_axis, inverse=True)
        cond_out = _all_to_all_ep(cond_out, expert_axis, inverse=True)

    if fast:
        out_h = gating.combine_gather(gate_out, dest, hid_out, hidden.dtype
                                      ).reshape(b, s, d)
        out_c = gating.combine_gather(gate_out, dest, cond_out, hidden.dtype
                                      ).reshape(b, s, d)
    else:
        out_h = gating.combine(gate_out.combine_weights, hid_out, hidden.dtype
                               ).reshape(b, s, d)
        out_c = gating.combine(gate_out.combine_weights, cond_out, hidden.dtype
                               ).reshape(b, s, d)
    return MoEOutput(out_h, out_c, gate_out.aux_loss, gate_out.expert_counts)


def _all_to_all_ep(x: jnp.ndarray, axis_name: str, inverse: bool = False) -> jnp.ndarray:
    """Exchange dispatched expert blocks over the 'expert' mesh axis:
    [E, C, M] (E global) <-> [E_local, C * ep, M] layout."""
    return jax.lax.all_to_all(x, axis_name, split_axis=0, concat_axis=1,
                              tiled=True) if not inverse else \
        jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=0, tiled=True)
