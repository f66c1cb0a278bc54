"""Checkpoint / resume via orbax.

Replaces the reference's three checkpoint paths (SURVEY.md §5: DeepSpeed
engine save_checkpoint + ``latest`` tag, accelerator.save_state per
``checkpoint-{step}``, and the control-modules-only pre-save hook
(hook.py:10-27)) with one orbax layout that splits the frozen backbone from
the adapter tree:

  {dir}/
    step_{N}/adapter      trainable control pytree
    step_{N}/opt_state    optimizer state
    step_{N}/meta         {'step': N, ...}
    latest                text tag file (resume pointer, like DeepSpeed's)

The frozen backbone is NOT checkpointed (it is reproducible from the
pretrained assets) — matching the reference's save hook which persists only
``trainable_control_modules``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(work_dir: str, step: int) -> str:
    return os.path.join(work_dir, f"step_{step:08d}")


def save_train_state(work_dir: str, step: int, control, opt_state,
                     extra: Optional[Dict[str, Any]] = None) -> str:
    """EVERY process must call this in a multi-process job: orbax multihost
    saves are collective (each rank writes its addressable shards; the
    primary host commits). The json side-files are rank-0-only."""
    path = _ckpt_dir(work_dir, step)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "adapter"), control, force=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "opt_state"), opt_state, force=True)
    if jax.process_index() == 0:
        meta = {"step": step, **(extra or {})}
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(work_dir, "latest"), "w") as f:
            f.write(f"step_{step:08d}")
    return path


def latest_step(work_dir: str) -> Optional[int]:
    tag = os.path.join(work_dir, "latest")
    if not os.path.exists(tag):
        return None
    with open(tag) as f:
        name = f.read().strip()
    try:
        return int(name.split("_")[-1])
    except ValueError:
        return None


def restore_train_state(work_dir: str, control_like, opt_state_like,
                        step: Optional[int] = None
                        ) -> Optional[Tuple[Any, Any, Dict[str, Any]]]:
    """Restore (control, opt_state, meta); None when nothing to resume.
    ``*_like`` trees provide structure/sharding targets (abstract ok)."""
    step = step if step is not None else latest_step(work_dir)
    if step is None:
        return None
    path = _ckpt_dir(work_dir, step)
    if not os.path.isdir(path):
        return None
    with ocp.PyTreeCheckpointer() as ckptr:
        control = ckptr.restore(os.path.join(path, "adapter"),
                                item=control_like)
    with ocp.PyTreeCheckpointer() as ckptr:
        opt_state = ckptr.restore(os.path.join(path, "opt_state"),
                                  item=opt_state_like)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return control, opt_state, meta


def export_adapter_reference_shards(control, work_dir: str) -> list:
    """Write the adapter in the REFERENCE's exact shard format: one torch
    ``{module}_weights_{idx}.bin`` per trainable control module
    (reference hook.py:16-21), loadable by reference-ecosystem consumers and
    by io/torch_bridge.load_adapter_checkpoint. Returns written paths."""
    import tempfile

    import torch

    flat_npz = os.path.join(tempfile.mkdtemp(), "adapter.npz")
    export_adapter_torch_compatible(control, flat_npz)
    flat = dict(np.load(flat_npz))

    groups: Dict[str, Dict[str, Any]] = {}
    for key, arr in flat.items():
        module = key.split(".")[0]
        groups.setdefault(module, {})[key] = torch.tensor(np.asarray(arr))
    os.makedirs(work_dir, exist_ok=True)
    paths = []
    for idx, (module, sd) in enumerate(sorted(groups.items())):
        p = os.path.join(work_dir, f"{module}_weights_{idx}.bin")
        torch.save(sd, p)
        paths.append(p)
    return paths


def export_adapter_torch_compatible(control, path: str) -> None:
    """Write the adapter as a flat name->array .npz using the REFERENCE's
    module names (inverse of io/torch_bridge.load_unigen_adapter), so weights
    round-trip with the reference ecosystem's ``{module}_weights_{idx}.bin``
    consumers."""
    flat: Dict[str, np.ndarray] = {}

    def lin(name, p):
        flat[f"{name}.weight"] = np.asarray(p["w"]).T
        if "b" in p:
            flat[f"{name}.bias"] = np.asarray(p["b"])

    def time_text(name, p):
        lin(f"{name}.timestep_embedder.linear_1", p["timestep"]["fc1"])
        lin(f"{name}.timestep_embedder.linear_2", p["timestep"]["fc2"])
        lin(f"{name}.text_embedder.linear_1", p["text"]["fc1"])
        lin(f"{name}.text_embedder.linear_2", p["text"]["fc2"])
        if "guidance" in p:
            lin(f"{name}.guidance_embedder.linear_1", p["guidance"]["fc1"])
            lin(f"{name}.guidance_embedder.linear_2", p["guidance"]["fc2"])

    def attn(name, p, i):
        sub = jax.tree.map(lambda x: x[i], p)
        pairs = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v",
                 "to_out": "to_out.0", "add_q": "add_q_proj",
                 "add_k": "add_k_proj", "add_v": "add_v_proj",
                 "to_add_out": "to_add_out"}
        for ours, theirs in pairs.items():
            if ours in sub:
                lin(f"{name}.{theirs}", sub[ours])
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            if n in sub:
                flat[f"{name}.{n}.weight"] = np.asarray(sub[n]["scale"])

    def dbl(name, p, i):
        sub = jax.tree.map(lambda x: x[i], p)
        lin(f"{name}.norm1.linear", sub["norm1"]["linear"])
        lin(f"{name}.norm1_context.linear", sub["norm1_context"]["linear"])
        attn(f"{name}.attn", p["attn"], i)
        lin(f"{name}.ff.net.0.proj", sub["ff"]["fc1"])
        lin(f"{name}.ff.net.2", sub["ff"]["fc2"])
        lin(f"{name}.ff_context.net.0.proj", sub["ff_context"]["fc1"])
        lin(f"{name}.ff_context.net.2", sub["ff_context"]["fc2"])

    lin("control_x_embedder", control["x_embedder"])
    lin("control_context_embedder", control["context_embedder"])
    time_text("control_time_text_embed", control["time_text_embed"])
    time_text("control_condition_embed", control["condition_embed"])
    n_cn = control["add_double"]["w"].shape[0]
    for i in range(n_cn):
        dbl(f"control_joint_trans_blocks.{i}", control["double_blocks"], i)
        lin(f"controlnet_add_joint_blocks.{i}",
            jax.tree.map(lambda x: x[i], control["add_double"]))
    if "single_blocks" in control:
        n_s = control["add_single"]["w"].shape[0]
        for i in range(n_s):
            sub = jax.tree.map(lambda x: x[i], control["single_blocks"])
            lin(f"control_single_trans_blocks.{i}.norm.linear", sub["norm"]["linear"])
            attn(f"control_single_trans_blocks.{i}.attn",
                 control["single_blocks"]["attn"], i)
            lin(f"control_single_trans_blocks.{i}.proj_mlp", sub["proj_mlp"])
            lin(f"control_single_trans_blocks.{i}.proj_out", sub["proj_out"])
            lin(f"controlnet_add_single_blocks.{i}",
                jax.tree.map(lambda x: x[i], control["add_single"]))
    flat["moe.moe_layer.gate.wg.weight"] = np.asarray(control["moe"]["gate"]["w"]).T
    if "experts" in control["moe"] and "cond_mod" in control["moe"]["experts"]:
        ex = control["moe"]["experts"]
        e_num = ex["cond_mod"]["w"].shape[0]
        for e in range(e_num):
            for pair, mod, pool in ((0, "cond_mod", "cond_pool"),
                                    (1, "hid_mod", "hid_pool")):
                lin(f"moe.moe_layer.experts.deepspeed_experts.{e}.{pair}.0",
                    jax.tree.map(lambda x: x[e], ex[mod]))
                lin(f"moe.moe_layer.experts.deepspeed_experts.{e}.{pair}.1",
                    jax.tree.map(lambda x: x[e], ex[pool]))
    if "shared_expert" in control:
        for i, k in enumerate(("weave_cond", "weave_text")):
            p = control["shared_expert"][k]
            stacked = jax.tree.map(lambda x: x[None], p)
            dbl(f"shared_expert.{i}", stacked, 0)
    np.savez(path, **flat)
