"""Checkpoint bridge: HF/diffusers torch checkpoints -> JAX pytrees.

Covers the reference's pretrained-asset layer (SURVEY.md §2 L0) and its three
adapter checkpoint formats (reference hook.py:10-27 ``{module}_weights_{idx}.bin``,
safetensors glob at infer.py:136-140, DeepSpeed-consolidated fp32 state dicts
at infer.py:125-128):

  load_flux_transformer   diffusers FluxTransformer2DModel -> models/flux tree
  load_clip_text          transformers CLIPTextModel       -> models/clip_text
  load_t5_encoder         transformers T5EncoderModel      -> models/t5_text
  load_vae                diffusers AutoencoderKL          -> models/vae
  load_unigen_adapter     reference trainable_control_modules state dicts
                          -> models/unigen_flux control tree

Conventions: torch Linear [out,in] -> {"w": [in,out]}; LayerNorm weight/bias
-> scale/bias; RMSNorm weight -> scale; Conv2d OIHW -> HWIO.
"""

from __future__ import annotations

import glob as globlib
import os
import re
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------ raw readers

def read_safetensors(paths) -> Dict[str, np.ndarray]:
    from safetensors import safe_open
    out = {}
    if isinstance(paths, str):
        paths = sorted(globlib.glob(paths)) if any(c in paths for c in "*?") else [paths]
    for path in paths:
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                t = f.get_tensor(k)
                if t.dtype == np.dtype("V2"):  # bfloat16 raw view
                    t = t.view(np.uint16).astype(np.uint32) << 16
                    t = t.view(np.float32)
                out[k] = t
    return out


def read_torch_bin(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


def read_checkpoint_dir(path: str) -> Dict[str, np.ndarray]:
    """Load a HF model directory (safetensors shards or pytorch bins)."""
    st = sorted(globlib.glob(os.path.join(path, "*.safetensors")))
    if st:
        return read_safetensors(st)
    bins = sorted(globlib.glob(os.path.join(path, "*.bin")))
    out = {}
    for b in bins:
        out.update(read_torch_bin(b))
    return out


# ------------------------------------------------------------ leaf converters

def _lin(sd, name, dtype):
    p = {"w": jnp.asarray(sd[f"{name}.weight"].T, dtype)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def _ln(sd, name, dtype):
    return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype),
            "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}


def _rms(sd, name, dtype):
    return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype)}


def _conv(sd, name, dtype):
    return {"w": jnp.asarray(sd[f"{name}.weight"].transpose(2, 3, 1, 0), dtype),
            "b": jnp.asarray(sd[f"{name}.bias"], dtype)}


def _stack(trees: List[dict]):
    import jax
    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *trees)


class _TrackingSD:
    """Dict view recording which checkpoint keys the mapping consumed, so
    strict mode can report reference keys that mapped to NOTHING (the
    loader-audit the reference lacks — it logs load_state_dict(strict=False)
    results and moves on, infer.py:141)."""

    def __init__(self, sd):
        self._sd = sd
        self.used = set()

    def __getitem__(self, k):
        self.used.add(k)
        return self._sd[k]

    def __contains__(self, k):
        return k in self._sd

    def __iter__(self):
        return iter(self._sd)

    def unmapped(self):
        return sorted(set(self._sd) - self.used)


def _check_strict(tracker: "_TrackingSD", what: str):
    left = tracker.unmapped()
    if left:
        head = ", ".join(left[:12])
        more = f" (+{len(left) - 12} more)" if len(left) > 12 else ""
        raise ValueError(
            f"strict {what} load: {len(left)} checkpoint key(s) mapped to "
            f"nothing: {head}{more}")


# ------------------------------------------------------------ FLUX

def _flux_attn(sd, p, dtype, *, context: bool, pre_only: bool = False):
    a = {"to_q": _lin(sd, f"{p}.to_q", dtype), "to_k": _lin(sd, f"{p}.to_k", dtype),
         "to_v": _lin(sd, f"{p}.to_v", dtype),
         "norm_q": _rms(sd, f"{p}.norm_q", dtype),
         "norm_k": _rms(sd, f"{p}.norm_k", dtype)}
    if not pre_only:
        a["to_out"] = _lin(sd, f"{p}.to_out.0", dtype)
    if context:
        a.update({"add_q": _lin(sd, f"{p}.add_q_proj", dtype),
                  "add_k": _lin(sd, f"{p}.add_k_proj", dtype),
                  "add_v": _lin(sd, f"{p}.add_v_proj", dtype),
                  "norm_added_q": _rms(sd, f"{p}.norm_added_q", dtype),
                  "norm_added_k": _rms(sd, f"{p}.norm_added_k", dtype),
                  "to_add_out": _lin(sd, f"{p}.to_add_out", dtype)})
    return a


def _flux_double_block(sd, p, dtype):
    return {
        "norm1": {"linear": _lin(sd, f"{p}.norm1.linear", dtype)},
        "norm1_context": {"linear": _lin(sd, f"{p}.norm1_context.linear", dtype)},
        "attn": _flux_attn(sd, f"{p}.attn", dtype, context=True),
        "ff": {"fc1": _lin(sd, f"{p}.ff.net.0.proj", dtype),
               "fc2": _lin(sd, f"{p}.ff.net.2", dtype)},
        "ff_context": {"fc1": _lin(sd, f"{p}.ff_context.net.0.proj", dtype),
                       "fc2": _lin(sd, f"{p}.ff_context.net.2", dtype)},
    }


def _flux_single_block(sd, p, dtype):
    return {
        "norm": {"linear": _lin(sd, f"{p}.norm.linear", dtype)},
        "attn": _flux_attn(sd, f"{p}.attn", dtype, context=False, pre_only=True),
        "proj_mlp": _lin(sd, f"{p}.proj_mlp", dtype),
        "proj_out": _lin(sd, f"{p}.proj_out", dtype),
    }


def _time_text(sd, p, dtype, guidance: bool):
    out = {"timestep": {"fc1": _lin(sd, f"{p}.timestep_embedder.linear_1", dtype),
                        "fc2": _lin(sd, f"{p}.timestep_embedder.linear_2", dtype)},
           "text": {"fc1": _lin(sd, f"{p}.text_embedder.linear_1", dtype),
                    "fc2": _lin(sd, f"{p}.text_embedder.linear_2", dtype)}}
    if guidance and f"{p}.guidance_embedder.linear_1.weight" in sd:
        out["guidance"] = {"fc1": _lin(sd, f"{p}.guidance_embedder.linear_1", dtype),
                           "fc2": _lin(sd, f"{p}.guidance_embedder.linear_2", dtype)}
    return out


def load_flux_transformer(sd: Dict[str, np.ndarray], num_layers: int = 19,
                          num_single_layers: int = 38, *, dtype=jnp.bfloat16,
                          strict: bool = False) -> dict:
    if strict:
        sd = _TrackingSD(sd)
    guidance = "time_text_embed.guidance_embedder.linear_1.weight" in sd
    tree = {
        "x_embedder": _lin(sd, "x_embedder", dtype),
        "context_embedder": _lin(sd, "context_embedder", dtype),
        "time_text_embed": _time_text(sd, "time_text_embed", dtype, guidance),
        "double_blocks": _stack([_flux_double_block(sd, f"transformer_blocks.{i}", dtype)
                                 for i in range(num_layers)]),
        "single_blocks": _stack([_flux_single_block(sd, f"single_transformer_blocks.{i}", dtype)
                                 for i in range(num_single_layers)]),
        "norm_out": {"linear": _lin(sd, "norm_out.linear", dtype)},
        "proj_out": _lin(sd, "proj_out", dtype),
    }
    if strict:
        _check_strict(sd, "FLUX transformer")
    return tree


# ------------------------------------------------------------ UniGen adapter

def load_unigen_adapter(sd: Dict[str, np.ndarray], *, n_cn: int, n_cn_single: int,
                        num_experts: int, dtype=jnp.bfloat16,
                        guidance: bool = False, strict: bool = False) -> dict:
    """Map the reference's trainable_control_modules state dict (names rooted
    at control_* / moe / shared_expert, UniGenTransformer.py:719-891) onto the
    models/unigen_flux control tree.

    strict=True fails loudly when any checkpoint key maps to nothing —
    the de-risking audit for a future real-weights run (VERDICT r1 #8)."""
    if strict:
        sd = _TrackingSD(sd)
    ctrl = {
        "x_embedder": _lin(sd, "control_x_embedder", dtype),
        "context_embedder": _lin(sd, "control_context_embedder", dtype),
        "time_text_embed": _time_text(sd, "control_time_text_embed", dtype, guidance),
        "condition_embed": _time_text(sd, "control_condition_embed", dtype, guidance),
        "double_blocks": _stack([
            _flux_double_block(sd, f"control_joint_trans_blocks.{i}", dtype)
            for i in range(n_cn)]),
        "add_double": _stack([_lin(sd, f"controlnet_add_joint_blocks.{i}", dtype)
                              for i in range(n_cn)]),
    }
    if "control_single_trans_blocks.0.norm.linear.weight" in sd:
        ctrl["single_blocks"] = _stack([
            _flux_single_block(sd, f"control_single_trans_blocks.{i}", dtype)
            for i in range(n_cn_single)])
        ctrl["add_single"] = _stack([
            _lin(sd, f"controlnet_add_single_blocks.{i}", dtype)
            for i in range(n_cn_single)])

    # MoE: gate + per-expert modulation pairs
    # deepspeed layout: moe.moe_layer.gate.wg.weight [E, d];
    # experts.deepspeed_experts.{e}.{0:cond,1:hid}.{0:mod,1:pool}
    gate_key = next(k for k in sd if k.endswith("gate.wg.weight"))
    prefix = gate_key[: -len("gate.wg.weight")]
    moe = {"gate": {"w": jnp.asarray(sd[gate_key].T, jnp.float32)}}

    def expert_lin(e, pair, idx):
        name = f"{prefix}experts.deepspeed_experts.{e}.{pair}.{idx}"
        return _lin(sd, name, dtype)

    if f"{prefix}experts.deepspeed_experts.0.0.0.weight" in sd:
        moe["experts"] = {
            "cond_mod": _stack([expert_lin(e, 0, 0) for e in range(num_experts)]),
            "cond_pool": _stack([expert_lin(e, 0, 1) for e in range(num_experts)]),
            "hid_mod": _stack([expert_lin(e, 1, 0) for e in range(num_experts)]),
            "hid_pool": _stack([expert_lin(e, 1, 1) for e in range(num_experts)]),
        }
    ctrl["moe"] = moe

    if "shared_expert.0.norm1.linear.weight" in sd:
        ctrl["shared_expert"] = {
            "weave_cond": _flux_double_block(sd, "shared_expert.0", dtype),
            "weave_text": _flux_double_block(sd, "shared_expert.1", dtype),
        }
    if "consis_module.0.norm1.linear.weight" in sd:
        ctrl["consis"] = {
            "block0": _flux_double_block(sd, "consis_module.0", dtype),
            "block1": _flux_double_block(sd, "consis_module.1", dtype),
        }
    if strict:
        _check_strict(sd, "UniGen adapter")
    return ctrl


def load_adapter_checkpoint(work_dir: str, **kw) -> dict:
    """Adapter weights from any supported layout: the reference's
    ``{module}_weights_{idx}.bin`` shards (hook.py:16-21), a
    safetensors/torch-bin directory, or our own exported .npz
    (train/checkpoint.export_adapter_torch_compatible)."""
    sd: Dict[str, np.ndarray] = {}
    if os.path.isfile(work_dir) and work_dir.endswith(".npz"):
        sd = dict(np.load(work_dir))
    else:
        npzs = sorted(globlib.glob(os.path.join(work_dir, "*.npz")))
        bins = sorted(globlib.glob(os.path.join(work_dir, "*_weights_*.bin")))
        if npzs:
            for n in npzs:
                sd.update(dict(np.load(n)))
        elif bins:
            for b in bins:
                module = re.match(r"(.+)_weights_\d+\.bin",
                                  os.path.basename(b)).group(1)
                for k, v in read_torch_bin(b).items():
                    key = k if k.startswith(module) else f"{module}.{k}"
                    sd[key] = v
        else:
            sd = read_checkpoint_dir(work_dir)
    return load_unigen_adapter(sd, **kw)


# ------------------------------------------------------------ LoRA adapters
#
# The reference saves one PEFT LoRA per adapter (= per condition type) via
# FluxPipeline.save_lora_weights into {dir}/{adapter_name}/ (hook.py:29-45)
# and restores them with FluxPipeline.lora_state_dict +
# set_peft_model_state_dict (hook.py:48-76): keys are
# ``transformer.{module}.lora_A.weight`` [r, in] / ``lora_B.weight`` [out, r].
# Here those map onto models/lora adapter dicts {dotted_path: {'a','b'}} with
# stacked per-block factors ([L, in, r] / [L, r, out]) rooted at base./control.

_LORA_DOUBLE_SUB = {
    "norm1.linear": "norm1.linear",
    "norm1_context.linear": "norm1_context.linear",
    "attn.to_q": "attn.to_q", "attn.to_k": "attn.to_k", "attn.to_v": "attn.to_v",
    "attn.add_q_proj": "attn.add_q", "attn.add_k_proj": "attn.add_k",
    "attn.add_v_proj": "attn.add_v",
    "attn.to_out.0": "attn.to_out", "attn.to_add_out": "attn.to_add_out",
    "ff.net.0.proj": "ff.fc1", "ff.net.2": "ff.fc2",
    "ff_context.net.0.proj": "ff_context.fc1", "ff_context.net.2": "ff_context.fc2",
}
_LORA_SINGLE_SUB = {
    "norm.linear": "norm.linear",
    "attn.to_q": "attn.to_q", "attn.to_k": "attn.to_k", "attn.to_v": "attn.to_v",
    "proj_mlp": "proj_mlp", "proj_out": "proj_out",
}
# SD3 joint blocks (torch_bridge_sd3._sd3_block naming; attn2 = the
# SD3.5X dual-attention branch) and SANA blocks
_LORA_SD3_SUB = {
    "norm1.linear": "norm1.linear",
    "norm1_context.linear": "norm1_context.linear",
    "attn.to_q": "attn.to_q", "attn.to_k": "attn.to_k", "attn.to_v": "attn.to_v",
    "attn.add_q_proj": "attn.add_q", "attn.add_k_proj": "attn.add_k",
    "attn.add_v_proj": "attn.add_v",
    "attn.to_out.0": "attn.to_out", "attn.to_add_out": "attn.to_add_out",
    "attn2.to_q": "attn2.to_q", "attn2.to_k": "attn2.to_k",
    "attn2.to_v": "attn2.to_v", "attn2.to_out.0": "attn2.to_out",
    "ff.net.0.proj": "ff.fc1", "ff.net.2": "ff.fc2",
    "ff_context.net.0.proj": "ff_context.fc1",
    "ff_context.net.2": "ff_context.fc2",
}
_LORA_SANA_SUB = {
    "attn1.to_q": "attn1.to_q", "attn1.to_k": "attn1.to_k",
    "attn1.to_v": "attn1.to_v", "attn1.to_out.0": "attn1.to_out",
    "attn2.to_q": "attn2.to_q", "attn2.to_k": "attn2.to_k",
    "attn2.to_v": "attn2.to_v", "attn2.to_out.0": "attn2.to_out",
    "ff.conv_inverted": "ff.inverted", "ff.conv_point": "ff.point",
}
# torch stacked-module prefix -> CANDIDATE (jax stack path, within-block map)
# pairs; the loader keeps the first candidate whose stack exists in the
# target param tree (the same torch name means different stacks per family:
# flux `transformer_blocks` = double stream, SANA's = linear-attn blocks,
# SD3 control's = joint blocks)
_LORA_STACKS = {
    "transformer_blocks": [("base.double_blocks", _LORA_DOUBLE_SUB),
                           ("base.blocks", _LORA_SANA_SUB)],
    "single_transformer_blocks": [("base.single_blocks", _LORA_SINGLE_SUB)],
    "control_joint_trans_blocks": [("control.double_blocks", _LORA_DOUBLE_SUB)],
    "control_single_trans_blocks": [("control.single_blocks", _LORA_SINGLE_SUB)],
    "control_transformer_blocks": [("control.joint_blocks", _LORA_SD3_SUB),
                                   ("control.blocks", _LORA_SANA_SUB)],
}
# torch stacked modules that ARE a bare linear per block (no within-block
# tail): the zero-init ControlNet add gates (UniGenTransformer.py:118-123,
# :755-773) — LoRA on these is what opens the control branch's gradient
# path in LoRA training (the gates start at exactly 0, so factors inside
# control blocks get zero grad until the gate moves)
_LORA_STACK_LINEARS = {
    "controlnet_add_joint_blocks": "control.add_double",
    "controlnet_add_single_blocks": "control.add_single",
}
# torch non-stacked module prefix -> (jax path prefix, within map or None)
_LORA_FLAT = {
    "shared_expert.0": ("control.shared_expert.weave_cond", _LORA_DOUBLE_SUB),
    "shared_expert.1": ("control.shared_expert.weave_text", _LORA_DOUBLE_SUB),
    "consis_module.0": ("control.consis.block0", _LORA_DOUBLE_SUB),
    "consis_module.1": ("control.consis.block1", _LORA_DOUBLE_SUB),
    "x_embedder": ("base.x_embedder", None),
    "context_embedder": ("base.context_embedder", None),
    "proj_out": ("base.proj_out", None),
    "control_x_embedder": ("control.x_embedder", None),
    "control_context_embedder": ("control.context_embedder", None),
}


def _node_exists(params, dotted: str) -> bool:
    node = params
    for part in dotted.split("."):
        if not isinstance(node, dict) or part not in node:
            return False
        node = node[part]
    return True


def _lora_torch_to_jax(module: str, params=None):
    """torch module path -> (jax dotted path, block index or None).
    Ambiguous torch stack names (``transformer_blocks`` means flux double
    blocks, SANA blocks, ...) resolve against the TARGET tree when given."""
    candidates = []
    for prefix, options in _LORA_STACKS.items():
        if module.startswith(prefix + "."):
            rest = module[len(prefix) + 1:]
            idx, _, tail = rest.partition(".")
            if idx.isdigit():
                for stack, sub in options:
                    if tail in sub:
                        candidates.append((f"{stack}.{sub[tail]}", int(idx)))
    for prefix, stack in _LORA_STACK_LINEARS.items():
        if module.startswith(prefix + "."):
            idx = module[len(prefix) + 1:]
            if idx.isdigit():
                candidates.append((stack, int(idx)))
    for prefix, (jax_path, sub) in _LORA_FLAT.items():
        if module == prefix and sub is None:
            candidates.append((jax_path, None))
        elif sub is not None and module.startswith(prefix + "."):
            tail = module[len(prefix) + 1:]
            if tail in sub:
                candidates.append((f"{jax_path}.{sub[tail]}", None))
    if params is None:
        return candidates[0] if candidates else (None, None)
    for path, idx in candidates:
        if _node_exists(params, path):
            return path, idx
    return None, None


def load_lora_adapters(input_dir: str, params: dict,
                       adapter_names: Optional[List[str]] = None, *,
                       dtype=jnp.float32, strict: bool = True
                       ) -> Dict[str, Dict[str, dict]]:
    """Load per-adapter LoRA directories (the reference load_model_hook
    layout, hook.py:48-76) into a models/lora adapters dict usable by
    fold_adapter / LoraSwitcher.

    input_dir/{adapter_name}/pytorch_lora_weights.safetensors with
    ``transformer.``-prefixed PEFT keys. Per-module ``.alpha`` entries (PEFT
    rank-scaling) are folded into 'b' as alpha/rank. Stacked blocks with no
    LoRA weights get zero factors (delta 0). `params` supplies stack depths
    and weight shapes for validation."""
    import jax

    if adapter_names is None:
        adapter_names = sorted(
            d for d in os.listdir(input_dir)
            if os.path.isfile(os.path.join(
                input_dir, d, "pytorch_lora_weights.safetensors")))
        if not adapter_names:
            raise FileNotFoundError(
                f"no */pytorch_lora_weights.safetensors under {input_dir}")

    def node_shape(dotted):
        node = params
        for part in dotted.split("."):
            node = node[part]
        if "w" in node:
            return tuple(node["w"].shape)
        if "w_q" in node:
            return tuple(node["w_q"].shape)
        if "w_q4" in node:  # packed in-dim is halved
            s = node["w_q4"].shape
            return tuple(s[:-2]) + (s[-2] * 2, s[-1])
        raise KeyError(f"no weight under {dotted}")

    adapters: Dict[str, Dict[str, dict]] = {}
    for name in adapter_names:
        sd = read_checkpoint_dir(os.path.join(input_dir, name))
        per_path: Dict[str, dict] = {}   # jax path -> {idx|None: {a,b,alpha}}
        unmapped = []
        for key, val in sd.items():
            k = key[len("transformer."):] if key.startswith("transformer.") else key
            if k.endswith(".lora_A.weight"):
                module, part = k[: -len(".lora_A.weight")], "a"
            elif k.endswith(".lora_B.weight"):
                module, part = k[: -len(".lora_B.weight")], "b"
            elif k.endswith(".alpha"):
                module, part = k[: -len(".alpha")], "alpha"
            else:
                unmapped.append(key)
                continue
            jax_path, idx = _lora_torch_to_jax(module, params)
            if jax_path is None:
                unmapped.append(key)
                continue
            per_path.setdefault(jax_path, {}).setdefault(idx, {})[part] = val
        if strict and unmapped:
            head = ", ".join(unmapped[:8])
            raise ValueError(f"LoRA adapter '{name}': {len(unmapped)} key(s) "
                             f"mapped to nothing: {head}"
                             + (f" (+{len(unmapped) - 8} more)"
                                if len(unmapped) > 8 else ""))

        lora: Dict[str, dict] = {}
        for jax_path, blocks in per_path.items():
            shape = node_shape(jax_path)
            ranks = {b["a"].shape[0] for b in blocks.values() if "a" in b}
            assert len(ranks) == 1, \
                f"{jax_path}: mixed LoRA ranks {ranks} within one stack"
            r = ranks.pop()
            stacked = len(shape) == 3
            in_dim, out_dim = shape[-2], shape[-1]

            def factors(blk):
                # torch A [r, in] -> a [in, r]; B [out, r] -> b [r, out];
                # PEFT applies scale = alpha/r on the delta -> fold into b
                a = np.asarray(blk["a"], np.float32).T
                b = np.asarray(blk["b"], np.float32).T
                if "alpha" in blk:
                    b = b * (float(np.asarray(blk["alpha"])) / r)
                assert a.shape == (in_dim, r) and b.shape == (r, out_dim), \
                    f"{jax_path}: LoRA {a.shape}/{b.shape} vs weight {shape}"
                return a, b

            if stacked:
                n_blocks = shape[0]
                a_stack = np.zeros((n_blocks, in_dim, r), np.float32)
                b_stack = np.zeros((n_blocks, r, out_dim), np.float32)
                for idx, blk in blocks.items():
                    assert idx is not None and idx < n_blocks, \
                        f"{jax_path}: block index {idx} >= stack depth {n_blocks}"
                    a_stack[idx], b_stack[idx] = factors(blk)
                lora[jax_path] = {"a": jnp.asarray(a_stack, dtype),
                                  "b": jnp.asarray(b_stack, dtype)}
            else:
                (idx, blk), = blocks.items()
                assert idx is None, f"{jax_path}: unexpected block index {idx}"
                a, b = factors(blk)
                lora[jax_path] = {"a": jnp.asarray(a, dtype),
                                  "b": jnp.asarray(b, dtype)}
        adapters[name] = lora
    return adapters


def export_lora_adapters_reference(adapters: Dict[str, Dict[str, dict]],
                                   output_dir: str) -> List[str]:
    """Write adapters in the reference's per-adapter layout (hook.py:41-45):
    {output_dir}/{name}/pytorch_lora_weights.safetensors with
    ``transformer.``-prefixed PEFT-style keys. All-zero per-block factors
    (blocks the adapter never touched) are skipped, matching PEFT's
    target_modules behavior. Returns the written file paths."""
    from safetensors.numpy import save_file

    inv_stacks = {stack: (k, {j: t for t, j in sub.items()})
                  for k, options in _LORA_STACKS.items()
                  for stack, sub in options}
    inv_flat = {}
    for prefix, (jax_path, sub) in _LORA_FLAT.items():
        if sub is None:
            inv_flat[jax_path] = (prefix, None)
        else:
            inv_flat[jax_path] = (prefix, {j: t for t, j in sub.items()})

    inv_stack_linears = {v: k for k, v in _LORA_STACK_LINEARS.items()}

    def torch_module(jax_path, idx):
        if jax_path in inv_stack_linears:
            return f"{inv_stack_linears[jax_path]}.{idx}"
        for stack, (tprefix, inv) in inv_stacks.items():
            if jax_path.startswith(stack + "."):
                tail = jax_path[len(stack) + 1:]
                return f"{tprefix}.{idx}.{inv[tail]}"
        for jroot, (tprefix, inv) in inv_flat.items():
            if jax_path == jroot and inv is None:
                return tprefix
            if inv is not None and jax_path.startswith(jroot + "."):
                return f"{tprefix}.{inv[jax_path[len(jroot) + 1:]]}"
        raise KeyError(f"no torch name for LoRA path '{jax_path}'")

    written = []
    for name, lora in adapters.items():
        sd = {}
        for jax_path, ab in lora.items():
            a = np.asarray(ab["a"], np.float32)
            b = np.asarray(ab["b"], np.float32)
            if a.ndim == 3:
                for i in range(a.shape[0]):
                    if not (a[i].any() or b[i].any()):
                        continue
                    m = torch_module(jax_path, i)
                    sd[f"transformer.{m}.lora_A.weight"] = a[i].T.copy()
                    sd[f"transformer.{m}.lora_B.weight"] = b[i].T.copy()
            else:
                m = torch_module(jax_path, None)
                sd[f"transformer.{m}.lora_A.weight"] = a.T.copy()
                sd[f"transformer.{m}.lora_B.weight"] = b.T.copy()
        adapter_dir = os.path.join(output_dir, name)
        os.makedirs(adapter_dir, exist_ok=True)
        path = os.path.join(adapter_dir, "pytorch_lora_weights.safetensors")
        save_file(sd, path)
        written.append(path)
    return written


# ------------------------------------------------------------ CLIP / T5 / VAE

def load_clip_text(sd: Dict[str, np.ndarray], num_layers: int = 12, *,
                   dtype=jnp.float32) -> dict:
    pre = "text_model." if any(k.startswith("text_model.") for k in sd) else ""

    def layer(i):
        p = f"{pre}encoder.layers.{i}"
        return {"ln1": _ln(sd, f"{p}.layer_norm1", dtype),
                "q": _lin(sd, f"{p}.self_attn.q_proj", dtype),
                "k": _lin(sd, f"{p}.self_attn.k_proj", dtype),
                "v": _lin(sd, f"{p}.self_attn.v_proj", dtype),
                "o": _lin(sd, f"{p}.self_attn.out_proj", dtype),
                "ln2": _ln(sd, f"{p}.layer_norm2", dtype),
                "fc1": _lin(sd, f"{p}.mlp.fc1", dtype),
                "fc2": _lin(sd, f"{p}.mlp.fc2", dtype)}

    out = {
        "token_embedding": jnp.asarray(
            sd[f"{pre}embeddings.token_embedding.weight"], dtype),
        "position_embedding": jnp.asarray(
            sd[f"{pre}embeddings.position_embedding.weight"], dtype),
        "layers": _stack([layer(i) for i in range(num_layers)]),
        "final_ln": _ln(sd, f"{pre}final_layer_norm", dtype),
    }
    if "text_projection.weight" in sd:
        out["text_projection"] = {"w": jnp.asarray(sd["text_projection.weight"].T, dtype)}
    return out


def load_t5_encoder(sd: Dict[str, np.ndarray], num_layers: int = 24, *,
                    dtype=jnp.bfloat16) -> dict:
    def layer(i):
        p = f"encoder.block.{i}.layer"
        return {"ln1": _rms(sd, f"{p}.0.layer_norm", dtype),
                "q": _lin(sd, f"{p}.0.SelfAttention.q", dtype),
                "k": _lin(sd, f"{p}.0.SelfAttention.k", dtype),
                "v": _lin(sd, f"{p}.0.SelfAttention.v", dtype),
                "o": _lin(sd, f"{p}.0.SelfAttention.o", dtype),
                "ln2": _rms(sd, f"{p}.1.layer_norm", dtype),
                "wi_0": _lin(sd, f"{p}.1.DenseReluDense.wi_0", dtype),
                "wi_1": _lin(sd, f"{p}.1.DenseReluDense.wi_1", dtype),
                "wo": _lin(sd, f"{p}.1.DenseReluDense.wo", dtype)}

    return {
        "token_embedding": jnp.asarray(sd["shared.weight"], dtype),
        "rel_bias": jnp.asarray(
            sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"],
            dtype),
        "layers": _stack([layer(i) for i in range(num_layers)]),
        "final_ln": _rms(sd, "encoder.final_layer_norm", dtype),
    }


def load_vae(sd: Dict[str, np.ndarray], block_out_channels=(128, 256, 512, 512),
             layers_per_block: int = 2, *, dtype=jnp.float32) -> dict:
    n = len(block_out_channels)

    def attn(p):
        return {"norm": _ln(sd, f"{p}.group_norm", dtype),
                "q": _lin(sd, f"{p}.to_q", dtype), "k": _lin(sd, f"{p}.to_k", dtype),
                "v": _lin(sd, f"{p}.to_v", dtype), "o": _lin(sd, f"{p}.to_out.0", dtype)}

    def res(p):
        out = {"norm1": _ln(sd, f"{p}.norm1", dtype), "conv1": _conv(sd, f"{p}.conv1", dtype),
               "norm2": _ln(sd, f"{p}.norm2", dtype), "conv2": _conv(sd, f"{p}.conv2", dtype)}
        if f"{p}.conv_shortcut.weight" in sd:
            out["shortcut"] = _conv(sd, f"{p}.conv_shortcut", dtype)
        return out

    enc = {"conv_in": _conv(sd, "encoder.conv_in", dtype), "down": [],
           "mid": {"res1": res("encoder.mid_block.resnets.0"),
                   "attn": attn("encoder.mid_block.attentions.0"),
                   "res2": res("encoder.mid_block.resnets.1")},
           "norm_out": _ln(sd, "encoder.conv_norm_out", dtype),
           "conv_out": _conv(sd, "encoder.conv_out", dtype)}
    for i in range(n):
        block = {"resnets": [res(f"encoder.down_blocks.{i}.resnets.{j}")
                             for j in range(layers_per_block)]}
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            block["down"] = _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", dtype)
        enc["down"].append(block)

    dec = {"conv_in": _conv(sd, "decoder.conv_in", dtype), "up": [],
           "mid": {"res1": res("decoder.mid_block.resnets.0"),
                   "attn": attn("decoder.mid_block.attentions.0"),
                   "res2": res("decoder.mid_block.resnets.1")},
           "norm_out": _ln(sd, "decoder.conv_norm_out", dtype),
           "conv_out": _conv(sd, "decoder.conv_out", dtype)}
    for i in range(n):
        block = {"resnets": [res(f"decoder.up_blocks.{i}.resnets.{j}")
                             for j in range(layers_per_block + 1)]}
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            block["up"] = _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", dtype)
        dec["up"].append(block)
    return {"encoder": enc, "decoder": dec}


# ------------------------------------------------------------ Depth-Anything

def _conv_raw(sd, name, dtype, *, bias=True):
    """Conv kept in torch OIHW layout (models/depth.py convs expect OIHW)."""
    p = {"w": jnp.asarray(sd[f"{name}.weight"], dtype)}
    if bias and f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def load_depth_anything(sd: Dict[str, np.ndarray], cfg=None, *,
                        dtype=jnp.float32) -> dict:
    """transformers DepthAnythingForDepthEstimation state dict -> the
    models/depth.py tree (the reference's depth-anything-small-hf condition
    synthesizer, src/condition.py:52-60)."""
    from unigen_tpu.models.depth import DepthAnythingConfig
    cfg = cfg or DepthAnythingConfig()

    def layer(i):
        p = f"backbone.encoder.layer.{i}"
        out = {
            "norm1": _ln(sd, f"{p}.norm1", dtype),
            "attn": {"q": _lin(sd, f"{p}.attention.attention.query", dtype),
                     "k": _lin(sd, f"{p}.attention.attention.key", dtype),
                     "v": _lin(sd, f"{p}.attention.attention.value", dtype),
                     "out": _lin(sd, f"{p}.attention.output.dense", dtype)},
            "norm2": _ln(sd, f"{p}.norm2", dtype),
            "fc1": _lin(sd, f"{p}.mlp.fc1", dtype),
            "fc2": _lin(sd, f"{p}.mlp.fc2", dtype),
        }
        if f"{p}.layer_scale1.lambda1" in sd:
            out["ls1"] = jnp.asarray(sd[f"{p}.layer_scale1.lambda1"], dtype)
            out["ls2"] = jnp.asarray(sd[f"{p}.layer_scale2.lambda1"], dtype)
        return out

    backbone = {
        "cls_token": jnp.asarray(sd["backbone.embeddings.cls_token"], dtype),
        "pos_embed": jnp.asarray(sd["backbone.embeddings.position_embeddings"],
                                 dtype),
        "patch_embed": _conv_raw(
            sd, "backbone.embeddings.patch_embeddings.projection", dtype),
        "layers": [layer(i) for i in range(cfg.num_layers)],
        "norm": _ln(sd, "backbone.layernorm", dtype),
    }
    reassemble = []
    for i, factor in enumerate(cfg.reassemble_factors):
        p = f"neck.reassemble_stage.layers.{i}"
        r = {"proj": _conv_raw(sd, f"{p}.projection", dtype)}
        if factor > 1:
            # ConvTranspose2d weight stays [in, out, f, f]
            r["resize"] = {"w": jnp.asarray(sd[f"{p}.resize.weight"], dtype),
                           "b": jnp.asarray(sd[f"{p}.resize.bias"], dtype)}
        elif factor < 1:
            r["resize"] = _conv_raw(sd, f"{p}.resize", dtype)
        reassemble.append(r)
    fusion = []
    for i in range(len(cfg.neck_hidden_sizes)):
        p = f"neck.fusion_stage.layers.{i}"
        fusion.append({
            "proj": _conv_raw(sd, f"{p}.projection", dtype),
            "res1": {"conv1": _conv_raw(sd, f"{p}.residual_layer1.convolution1", dtype),
                     "conv2": _conv_raw(sd, f"{p}.residual_layer1.convolution2", dtype)},
            "res2": {"conv1": _conv_raw(sd, f"{p}.residual_layer2.convolution1", dtype),
                     "conv2": _conv_raw(sd, f"{p}.residual_layer2.convolution2", dtype)},
        })
    return {
        "backbone": backbone,
        "reassemble": reassemble,
        "neck_convs": [_conv_raw(sd, f"neck.convs.{i}", dtype, bias=False)
                       for i in range(len(cfg.neck_hidden_sizes))],
        "fusion": fusion,
        "head": {"conv1": _conv_raw(sd, "head.conv1", dtype),
                 "conv2": _conv_raw(sd, "head.conv2", dtype),
                 "conv3": _conv_raw(sd, "head.conv3", dtype)},
    }


# ------------------------------------------------------------ Gemma-2 (SANA)

def load_gemma_text(sd: Dict[str, np.ndarray], num_layers: int = 26, *,
                    dtype=jnp.float32) -> dict:
    """transformers Gemma2Model state dict -> models/gemma_text tree (the
    SANA family's prompt encoder)."""
    pre = "model." if any(k.startswith("model.") for k in sd) else ""

    def layer(i):
        p = f"{pre}layers.{i}"
        return {
            "input_ln": {"scale": jnp.asarray(sd[f"{p}.input_layernorm.weight"], dtype)},
            "post_attn_ln": {"scale": jnp.asarray(
                sd[f"{p}.post_attention_layernorm.weight"], dtype)},
            "pre_ff_ln": {"scale": jnp.asarray(
                sd[f"{p}.pre_feedforward_layernorm.weight"], dtype)},
            "post_ff_ln": {"scale": jnp.asarray(
                sd[f"{p}.post_feedforward_layernorm.weight"], dtype)},
            "attn": {"q": _lin(sd, f"{p}.self_attn.q_proj", dtype),
                     "k": _lin(sd, f"{p}.self_attn.k_proj", dtype),
                     "v": _lin(sd, f"{p}.self_attn.v_proj", dtype),
                     "o": _lin(sd, f"{p}.self_attn.o_proj", dtype)},
            "gate": _lin(sd, f"{p}.mlp.gate_proj", dtype),
            "up": _lin(sd, f"{p}.mlp.up_proj", dtype),
            "down": _lin(sd, f"{p}.mlp.down_proj", dtype),
        }

    return {
        "embed": jnp.asarray(sd[f"{pre}embed_tokens.weight"], dtype),
        "layers": [layer(i) for i in range(num_layers)],
        "final_ln": {"scale": jnp.asarray(sd[f"{pre}norm.weight"], dtype)},
    }
