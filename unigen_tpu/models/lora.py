"""Per-condition LoRA experts with static trace-time fold-in.

TPU-native re-design of the reference's runtime adapter switching
(src/lora_switching_module.py:4-39 ``enable_lora`` zeroes the PEFT scaling of
non-selected adapters per forward; hook.py:29-84 saves/loads per-adapter
weights). On TPU the condition type is known at trace time, so instead of
runtime scaling flips the selected adapter's delta is FOLDED into the frozen
weights before jit: W' = W + scale * (A @ B). Switching adapters re-folds (a
cheap jitted add) — zero per-step overhead, and the fused qkv/mlp matmuls see
a single dense weight (the BASELINE north star).

API:
  init_lora_adapters(key, params, targets, rank, adapter_names)
  fold_adapter(params, loras, name, scale)  -> folded params (jit-safe)
  lora_delta(loras, name, path)             -> the raw delta for inspection
  enable_lora(...) context manager          -> parity convenience: yields
                                               folded params, restores nothing
                                               (functional — originals are
                                               never mutated)
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp


def _match(path_names: Tuple[str, ...], patterns: Sequence[str]) -> bool:
    joined = ".".join(path_names)
    return any(pat in joined for pat in patterns)


def _leaf_paths(params) -> List[Tuple[Tuple[str, ...], Any]]:
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = tuple(str(getattr(k, "key", k)) for k in path)
        out.append((names, leaf))
    return out


def init_lora_adapters(key, params, targets: Sequence[str], rank: int,
                       adapter_names: Sequence[str], *,
                       dtype=jnp.float32) -> Dict[str, Dict[str, dict]]:
    """Create {adapter_name: {dotted_path: {'a': [in,r], 'b': [r,out]}}} for
    every 'w' leaf whose path matches a target pattern (e.g. 'attn.to_q').
    'a' is gaussian-scaled, 'b' zero (standard LoRA init: delta starts at 0).
    Stacked-block weights [L, in, out] get per-block factors [L, in, r]."""
    adapters: Dict[str, Dict[str, dict]] = {}
    leaves = [(names, leaf) for names, leaf in _leaf_paths(params)
              if names[-1] == "w" and _match(names[:-1], targets)]
    keys = jax.random.split(key, max(len(leaves) * len(adapter_names), 1))
    ki = 0
    for name in adapter_names:
        adapters[name] = {}
        for names, leaf in leaves:
            *lead, in_dim, out_dim = leaf.shape
            a = jax.random.normal(keys[ki], (*lead, in_dim, rank), dtype) \
                / jnp.sqrt(in_dim)
            b = jnp.zeros((*lead, rank, out_dim), dtype)
            adapters[name][".".join(names[:-1])] = {"a": a, "b": b}
            ki += 1
    return adapters


def fold_adapter(params, adapters: Dict[str, Dict[str, dict]], name: str,
                 scale: float = 1.0):
    """Return params with the named adapter's deltas folded into 'w' leaves.
    Pure function — safe under jit; re-trace only when `name` changes."""
    lora = adapters[name]

    def _fold(path, leaf):
        names = tuple(str(getattr(k, "key", k)) for k in path)
        if names[-1] != "w":
            return leaf
        key = ".".join(names[:-1])
        if key not in lora:
            return leaf
        ab = lora[key]
        delta = jnp.einsum("...ir,...ro->...io", ab["a"], ab["b"])
        return leaf + scale * delta.astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(_fold, params)


def fold_condition_experts(params, adapters, condition_type: str,
                           scale: float = 1.0):
    """Trace-time per-condition expert selection: condition type -> adapter."""
    if condition_type not in adapters:
        raise KeyError(f"no LoRA adapter for condition '{condition_type}' "
                       f"(have {sorted(adapters)})")
    return fold_adapter(params, adapters, condition_type, scale)


@contextlib.contextmanager
def enable_lora(params, adapters, names: Sequence[str], scale: float = 1.0):
    """Parity convenience mirroring the reference context manager: yields
    params with the selected adapters folded in (others contribute nothing —
    functionally identical to zeroing their scaling)."""
    folded = params
    for name in names:
        folded = fold_adapter(folded, adapters, name, scale)
    yield folded
    # functional: nothing to restore


def merge_for_export(adapters: Dict[str, Dict[str, dict]], name: str
                     ) -> Dict[str, jnp.ndarray]:
    """Flatten one adapter to {path.a / path.b: array} for checkpointing."""
    flat = {}
    for path, ab in adapters[name].items():
        flat[f"{path}.lora_a"] = ab["a"]
        flat[f"{path}.lora_b"] = ab["b"]
    return flat
