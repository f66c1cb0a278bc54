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
  fold_adapter(params, loras, name, scale)  -> folded params (jit-safe; folds
                                               into bf16 'w' leaves AND
                                               quantized w_q/w_q4 leaf dicts
                                               via dequant-add-requant)
  LoraSwitcher(adapters, params)            -> runtime adapter switching with
                                               pristine host copies: switch()
                                               always refolds FROM the
                                               original weights, so cycling
                                               through adapters accumulates
                                               zero drift (bf16) and zero
                                               requantization error stacking
                                               (int8/int4 serving trees)
  enable_lora(...) context manager          -> parity convenience: yields
                                               folded params, restores nothing
                                               (functional — originals are
                                               never mutated)
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


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


# Default trainable surface for LoRA fine-tuning (scripts/train.py --rank):
# attention + feed-forward linears of the CONTROL branch only — the reference
# trains control modules (train.py:349 requires_grad filter) and its dormant
# PEFT path targets attn/mlp projections; 'control.' anchors keep base-branch
# leaves frozen. Patterns are substring matches against dotted paths.
#
# The add gates MUST be in the surface: they are zero-init (ControlNet-style,
# UniGenTransformer.py:118-123), so at init the whole control branch
# contributes nothing to the output and every factor INSIDE control blocks
# receives exactly zero gradient — the gates' own factors are the only ones
# with live grads at step 0, and the interior path opens as they move.
DEFAULT_LORA_TARGETS = (
    "control.add_double", "control.add_single",
    "control.double_blocks.attn", "control.double_blocks.ff",
    "control.single_blocks.attn", "control.single_blocks.proj_mlp",
    "control.single_blocks.proj_out",
)


def _delta(ab: dict, scale: float) -> jnp.ndarray:
    return scale * jnp.einsum("...ir,...ro->...io",
                              ab["a"].astype(jnp.float32),
                              ab["b"].astype(jnp.float32))


def fold_linear_node(node: dict, ab: dict, scale: float = 1.0) -> dict:
    """Fold one LoRA delta into one linear param dict — bf16/f32 {'w': ...}
    or quantized {'w_q'|'w_q4', 'w_scale'} (dequant + delta + requant with a
    freshly fitted scale, so the folded weight uses the full int range)."""
    from unigen_tpu.ops import quant
    out = dict(node)
    if "w" in node:
        out["w"] = node["w"] + _delta(ab, scale).astype(node["w"].dtype)
    elif "w_q" in node:
        w = node["w_q"].astype(jnp.float32) * node["w_scale"]
        out.update(quant.quantize_weight(w + _delta(ab, scale)))
    elif "w_q4" in node:
        w = quant.unpack_int4(node["w_q4"]).astype(jnp.float32) * node["w_scale"]
        out.update(quant.quantize_weight_int4(w + _delta(ab, scale)))
    else:
        raise ValueError(f"not a linear param dict: {sorted(node)}")
    return out


def _is_linear_node(node) -> bool:
    return isinstance(node, dict) and any(k in node for k in ("w", "w_q", "w_q4"))


def fold_adapter(params, adapters: Dict[str, Dict[str, dict]], name: str,
                 scale: float = 1.0):
    """Return params with the named adapter's deltas folded into its linears
    (fp 'w' leaves and quantized w_q/w_q4 dicts alike). Pure function — safe
    under jit; re-trace only when `name` changes."""
    lora = adapters[name]

    def _walk(node, path):
        if _is_linear_node(node):
            key = ".".join(path)
            if key in lora:
                return fold_linear_node(node, lora[key], scale)
            return node
        if isinstance(node, dict):
            return {k: _walk(v, path + (k,)) for k, v in node.items()}
        return node

    return _walk(params, ())


def fold_for_training(params, lora: Dict[str, dict], scale: float = 1.0):
    """Differentiable fold for LoRA TRAINING (the QLoRA recipe): return
    ``params`` with every targeted linear replaced by a plain floating
    ``w = W_frozen + scale * (A @ B)`` node. Quantized leaves are
    DEQUANTIZED, never requantized — the requantization round is not
    differentiable; serving refolds (fold_adapter / LoraSwitcher) keep the
    int path. Gradients flow to the 'a'/'b' factors only; the frozen weight
    enters as a constant.

    Reference: train.py:349 builds the optimizer over requires_grad (LoRA)
    params while the transformer rides frozen in weight_dtype; hook.py:29-84
    saves/loads the resulting per-adapter weights.

    ``lora`` paths are rooted at the same tree as ``params`` (for UniGen
    training: the full {'base','control'} tree with 'control.*' targets).
    Untouched subtrees are shared, not copied."""
    from unigen_tpu.ops import quant

    def _fold(node, ab):
        out = {k: v for k, v in node.items()
               if k not in ("w_q", "w_q4", "w_scale")}
        if "w" in node:
            w = node["w"].astype(jnp.float32)
            out_dtype = node["w"].dtype
        elif "w_q" in node:
            w = node["w_q"].astype(jnp.float32) * node["w_scale"]
            out_dtype = (node["b"].dtype if hasattr(node.get("b"), "dtype")
                         else jnp.bfloat16)
        elif "w_q4" in node:
            w = (quant.unpack_int4(node["w_q4"]).astype(jnp.float32)
                 * node["w_scale"])
            out_dtype = (node["b"].dtype if hasattr(node.get("b"), "dtype")
                         else jnp.bfloat16)
        else:
            raise ValueError(f"not a linear param dict: {sorted(node)}")
        out["w"] = (w + _delta(ab, scale)).astype(out_dtype)
        return out

    folded = params
    for path, ab in lora.items():
        folded = tree_set(folded, path, _fold(tree_get(folded, path), ab))
    return folded


def fold_condition_experts(params, adapters, condition_type: str,
                           scale: float = 1.0):
    """Trace-time per-condition expert selection: condition type -> adapter."""
    if condition_type not in adapters:
        raise KeyError(f"no LoRA adapter for condition '{condition_type}' "
                       f"(have {sorted(adapters)})")
    return fold_adapter(params, adapters, condition_type, scale)


# ------------------------------------------------------------ path utilities

def tree_get(tree, dotted: str):
    node = tree
    for part in dotted.split("."):
        node = node[part]
    return node


def tree_set(tree, dotted: str, value):
    """Functional set: returns a tree with `dotted` replaced; dicts along the
    path are shallow-copied, every other subtree is shared."""
    parts = dotted.split(".")

    def _go(node, i):
        out = dict(node)
        out[parts[i]] = value if i == len(parts) - 1 else _go(node[parts[i]], i + 1)
        return out

    return _go(tree, 0)


# ------------------------------------------------------------ switching

class LoraSwitcher:
    """Runtime per-condition adapter switching over a LIVE (possibly
    quantized) param tree — the TPU answer to the reference's PEFT scaling
    flips (src/lora_switching_module.py:11-39).

    At construction, a pristine copy is kept of every linear node any
    adapter touches. ``switch(params, name)`` refolds each affected node
    FROM its pristine copy, so:
      * switching is exact — no fold/unfold drift on bf16, no stacked
        requantization error on int8/int4 (always one quantize of W+Δ);
      * nodes the new adapter doesn't touch are restored to pristine;
      * untouched subtrees are shared, not copied — the switch cost is the
        affected linears only (measured per-switch in the bench suite rung).
    The folded tree has identical shapes/dtypes, so jitted programs never
    retrace on a switch.

    pristine="device" (default) holds REFERENCES to the original device
    arrays — restore is zero-copy and folds read HBM directly (measured:
    host pristine cost ~21 s/switch through the axon tunnel's ~260 MB h2d;
    device pristine folds on-chip). The held references add only the
    affected-path bytes to residency (the rest of the tree is shared).
    pristine="host" keeps numpy copies instead — for HBM-tight setups."""

    def __init__(self, adapters: Dict[str, Dict[str, dict]], params, *,
                 pristine: str = "device"):
        assert pristine in ("device", "host"), pristine
        self.adapters = adapters
        self.active: Tuple[Tuple[str, float], ...] = ()
        paths = sorted({p for lora in adapters.values() for p in lora})
        self._pristine: Dict[str, Dict[str, Any]] = {}
        for p in paths:
            node = tree_get(params, p)
            if not _is_linear_node(node):
                raise KeyError(f"LoRA path '{p}' does not name a linear node")
            if pristine == "device":
                self._pristine[p] = {k: v for k, v in node.items() if k != "b"}
            else:
                self._pristine[p] = {k: np.asarray(v)
                                     for k, v in node.items() if k != "b"}
        self._fold_jit = jax.jit(fold_linear_node, static_argnames=("scale",))

    @property
    def names(self) -> List[str]:
        return sorted(self.adapters)

    def switch(self, params, names: Union[str, Sequence[str], None],
               scale: float = 1.0):
        """Return params with exactly `names` folded in (None/[] = all
        adapters disabled -> pristine weights)."""
        if names is None:
            names = []
        elif isinstance(names, str):
            names = [names]
        for n in names:
            if n not in self.adapters:
                raise KeyError(f"no LoRA adapter '{n}' (have {self.names})")
        want = tuple((n, scale) for n in names)
        if want == self.active:
            return params
        for path, host in self._pristine.items():
            node = dict(tree_get(params, path))
            fresh = {k: jnp.asarray(v) for k, v in host.items()}
            folded = dict(node, **fresh)
            for n in names:
                ab = self.adapters[n].get(path)
                if ab is not None:
                    folded = self._fold_jit(folded, ab, scale=scale)
            params = tree_set(params, path, folded)
        self.active = want
        return params


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
