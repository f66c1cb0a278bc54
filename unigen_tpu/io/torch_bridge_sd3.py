"""Checkpoint bridge for SD3/SD3.5 and SANA transformers + their UniGen
adapters (extends io/torch_bridge.py; same conventions)."""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from unigen_tpu.config import SanaBackboneConfig, SD3BackboneConfig
from unigen_tpu.io.torch_bridge import _lin, _rms, _stack


def _conv1x1_lin(sd, name, dtype, *, bias=True):
    """A 1x1 Conv2d treated as a linear. Real diffusers checkpoints store
    [out, in, 1, 1] (SANA GLUMBConv conv_inverted/conv_point); squeeze the
    spatial dims before the linear transpose. 2-D weights pass through."""
    w = sd[f"{name}.weight"]
    if w.ndim == 4:
        assert w.shape[-2:] == (1, 1), f"{name}: not a 1x1 conv {w.shape}"
        w = w[:, :, 0, 0]
    p = {"w": jnp.asarray(np.asarray(w).T, dtype)}
    if bias and f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def _sd3_attn(sd, p, dtype, *, context: bool, context_pre_only: bool = False,
              qk_norm: Optional[str] = None):
    a = {"to_q": _lin(sd, f"{p}.to_q", dtype), "to_k": _lin(sd, f"{p}.to_k", dtype),
         "to_v": _lin(sd, f"{p}.to_v", dtype),
         "to_out": _lin(sd, f"{p}.to_out.0", dtype)}
    if qk_norm and f"{p}.norm_q.weight" in sd:
        a["norm_q"] = _rms(sd, f"{p}.norm_q", dtype)
        a["norm_k"] = _rms(sd, f"{p}.norm_k", dtype)
    if context:
        a.update({"add_q": _lin(sd, f"{p}.add_q_proj", dtype),
                  "add_k": _lin(sd, f"{p}.add_k_proj", dtype),
                  "add_v": _lin(sd, f"{p}.add_v_proj", dtype)})
        if qk_norm and f"{p}.norm_added_q.weight" in sd:
            a["norm_added_q"] = _rms(sd, f"{p}.norm_added_q", dtype)
            a["norm_added_k"] = _rms(sd, f"{p}.norm_added_k", dtype)
        if not context_pre_only:
            a["to_add_out"] = _lin(sd, f"{p}.to_add_out", dtype)
    return a


def _sd3_block(sd, p, dtype, *, dual: bool, last: bool, qk_norm):
    out = {
        "norm1": {"linear": _lin(sd, f"{p}.norm1.linear", dtype)},
        "norm1_context": {"linear": _lin(sd, f"{p}.norm1_context.linear", dtype)},
        "attn": _sd3_attn(sd, f"{p}.attn", dtype, context=True,
                          context_pre_only=last, qk_norm=qk_norm),
        "ff": {"fc1": _lin(sd, f"{p}.ff.net.0.proj", dtype),
               "fc2": _lin(sd, f"{p}.ff.net.2", dtype)},
    }
    if not last:
        out["ff_context"] = {"fc1": _lin(sd, f"{p}.ff_context.net.0.proj", dtype),
                             "fc2": _lin(sd, f"{p}.ff_context.net.2", dtype)}
    if dual:
        out["attn2"] = _sd3_attn(sd, f"{p}.attn2", dtype, context=False,
                                 qk_norm=qk_norm)
    return out


def load_sd3_transformer(sd: Dict[str, np.ndarray], cfg: SD3BackboneConfig, *,
                         dtype=jnp.bfloat16) -> dict:
    """diffusers SD3Transformer2DModel state dict -> models/sd3 tree."""
    dual = set(cfg.dual_attention_layers)
    n = cfg.num_layers
    blocks = [_sd3_block(sd, f"transformer_blocks.{i}", dtype, dual=(i in dual),
                         last=(i == n - 1), qk_norm=cfg.qk_norm)
              for i in range(n)]
    dual_idx = [i for i in range(n) if i in dual]
    plain_idx = [i for i in range(n) if i not in dual]
    p = {
        "pos_embed": {"proj": {"w": jnp.asarray(
            sd["pos_embed.proj.weight"].reshape(cfg.inner_dim, -1).T, dtype),
            "b": jnp.asarray(sd["pos_embed.proj.bias"], dtype)},
            "pos_embed": jnp.asarray(sd["pos_embed.pos_embed"][0], jnp.float32)},
        "time_text_embed": {
            "timestep": {"fc1": _lin(sd, "time_text_embed.timestep_embedder.linear_1", dtype),
                         "fc2": _lin(sd, "time_text_embed.timestep_embedder.linear_2", dtype)},
            "text": {"fc1": _lin(sd, "time_text_embed.text_embedder.linear_1", dtype),
                     "fc2": _lin(sd, "time_text_embed.text_embedder.linear_2", dtype)}},
        "context_embedder": _lin(sd, "context_embedder", dtype),
        "last_block": blocks[n - 1],
        "norm_out": {"linear": _lin(sd, "norm_out.linear", dtype)},
        "proj_out": _lin(sd, "proj_out", dtype),
    }
    if dual_idx:
        p["dual_blocks"] = _stack([blocks[i] for i in dual_idx])
    if len(plain_idx) > 1:
        p["plain_blocks"] = _stack([blocks[i] for i in plain_idx[:-1]])
    return p


def load_sana_transformer(sd: Dict[str, np.ndarray], cfg: SanaBackboneConfig, *,
                          dtype=jnp.bfloat16) -> dict:
    """diffusers SanaTransformer2DModel state dict -> models/sana tree."""
    def block(i):
        p = f"transformer_blocks.{i}"
        return {
            "scale_shift_table": jnp.asarray(sd[f"{p}.scale_shift_table"], dtype),
            "attn1": {"to_q": _lin(sd, f"{p}.attn1.to_q", dtype),
                      "to_k": _lin(sd, f"{p}.attn1.to_k", dtype),
                      "to_v": _lin(sd, f"{p}.attn1.to_v", dtype),
                      "to_out": _lin(sd, f"{p}.attn1.to_out.0", dtype)},
            "attn2": {"to_q": _lin(sd, f"{p}.attn2.to_q", dtype),
                      "to_k": _lin(sd, f"{p}.attn2.to_k", dtype),
                      "to_v": _lin(sd, f"{p}.attn2.to_v", dtype),
                      "to_out": _lin(sd, f"{p}.attn2.to_out.0", dtype)},
            "ff": {"inverted": _conv1x1_lin(sd, f"{p}.ff.conv_inverted", dtype),
                   "depth": {"w": jnp.asarray(
                       sd[f"{p}.ff.conv_depth.weight"].transpose(2, 3, 1, 0), dtype),
                       "b": jnp.asarray(sd[f"{p}.ff.conv_depth.bias"], dtype)},
                   "point": _conv1x1_lin(sd, f"{p}.ff.conv_point", dtype,
                                        bias=False)},
        }

    return {
        "patch_embed": {"w": jnp.asarray(
            sd["patch_embed.proj.weight"].reshape(cfg.inner_dim, -1).T, dtype),
            "b": jnp.asarray(sd["patch_embed.proj.bias"], dtype)},
        "time_embed": {
            "timestep": {"fc1": _lin(sd, "time_embed.emb.timestep_embedder.linear_1", dtype),
                         "fc2": _lin(sd, "time_embed.emb.timestep_embedder.linear_2", dtype)},
            "linear": _lin(sd, "time_embed.linear", dtype)},
        "caption_projection": {"fc1": _lin(sd, "caption_projection.linear_1", dtype),
                               "fc2": _lin(sd, "caption_projection.linear_2", dtype)},
        "caption_norm": _rms(sd, "caption_norm", dtype),
        "blocks": _stack([block(i) for i in range(cfg.num_layers)]),
        "scale_shift_table": jnp.asarray(sd["scale_shift_table"], dtype),
        "proj_out": _lin(sd, "proj_out", dtype),
    }


def load_sd3_unigen_adapter(sd: Dict[str, np.ndarray], cfg: SD3BackboneConfig,
                            n_cn: int, num_experts: int, *,
                            dtype=jnp.bfloat16, modulated: bool = False) -> dict:
    """Reference UniGenSD3 trainable_control_modules state dict -> control tree
    (names rooted at control_* / moe / shared_expert,
    UniGenTransformer.py:26-223,490-494)."""
    ctrl = {
        "pos_embed_input": {"proj": {"w": jnp.asarray(
            sd["control_pos_embed_input.proj.weight"].reshape(cfg.inner_dim, -1).T,
            dtype),
            "b": jnp.asarray(sd["control_pos_embed_input.proj.bias"], dtype)}},
        "time_text_embed": {
            "timestep": {"fc1": _lin(sd, "control_time_text_embed.timestep_embedder.linear_1", dtype),
                         "fc2": _lin(sd, "control_time_text_embed.timestep_embedder.linear_2", dtype)},
            "text": {"fc1": _lin(sd, "control_time_text_embed.text_embedder.linear_1", dtype),
                     "fc2": _lin(sd, "control_time_text_embed.text_embedder.linear_2", dtype)}},
        "condition_embed": {
            "timestep": {"fc1": _lin(sd, "control_condition_embed.timestep_embedder.linear_1", dtype),
                         "fc2": _lin(sd, "control_condition_embed.timestep_embedder.linear_2", dtype)},
            "text": {"fc1": _lin(sd, "control_condition_embed.text_embedder.linear_1", dtype),
                     "fc2": _lin(sd, "control_condition_embed.text_embedder.linear_2", dtype)}},
        "context_embedder": _lin(sd, "control_context_embedder", dtype),
        "joint_blocks": _stack([
            _sd3_block(sd, f"control_transformer_blocks.{i}", dtype, dual=False,
                       last=False, qk_norm=cfg.qk_norm) for i in range(n_cn)]),
        "add_blocks": _stack([_lin(sd, f"controlnet_add_blocks.{i}", dtype)
                              for i in range(n_cn)]),
    }
    if "control_pos_embed_input.pos_embed" in sd:
        ctrl["pos_embed_input"]["pos_embed"] = jnp.asarray(
            sd["control_pos_embed_input.pos_embed"][0], jnp.float32)
    if "control_pos_embed.proj.weight" in sd:
        # use_pos_embed=True: trainable target-stream PatchEmbed (:53-65)
        ctrl["pos_embed"] = {"proj": {"w": jnp.asarray(
            sd["control_pos_embed.proj.weight"].reshape(cfg.inner_dim, -1).T,
            dtype),
            "b": jnp.asarray(sd["control_pos_embed.proj.bias"], dtype)}}
        if "control_pos_embed.pos_embed" in sd:
            ctrl["pos_embed"]["pos_embed"] = jnp.asarray(
                sd["control_pos_embed.pos_embed"][0], jnp.float32)

    gate_key = next(k for k in sd if k.endswith("gate.wg.weight"))
    prefix = gate_key[: -len("gate.wg.weight")]
    moe = {"gate": {"w": jnp.asarray(sd[gate_key].T, jnp.float32)}}
    if modulated:
        def expert_lin(e, pair, idx):
            return _lin(sd, f"{prefix}experts.deepspeed_experts.{e}.{pair}.{idx}",
                        dtype)
        moe["experts"] = {
            "cond_mod": _stack([expert_lin(e, 0, 0) for e in range(num_experts)]),
            "cond_pool": _stack([expert_lin(e, 0, 1) for e in range(num_experts)]),
            "hid_mod": _stack([expert_lin(e, 1, 0) for e in range(num_experts)]),
            "hid_pool": _stack([expert_lin(e, 1, 1) for e in range(num_experts)]),
        }
    else:
        # non-modulated: per-expert pairs of SD3 single blocks
        def single_block(name):
            return {"norm1": {"linear": _lin(sd, f"{name}.norm1.linear", dtype)},
                    "attn": _sd3_attn(sd, f"{name}.attn", dtype, context=False,
                                      qk_norm=cfg.qk_norm),
                    "ff": {"fc1": _lin(sd, f"{name}.ff.net.0.proj", dtype),
                           "fc2": _lin(sd, f"{name}.ff.net.2", dtype)}}
        moe["experts"] = {
            "hid_block": _stack([single_block(
                f"{prefix}experts.deepspeed_experts.{e}.0")
                for e in range(num_experts)]),
            "cond_block": _stack([single_block(
                f"{prefix}experts.deepspeed_experts.{e}.1")
                for e in range(num_experts)]),
        }
    ctrl["moe"] = moe
    if "shared_expert.0.norm1.linear.weight" in sd:
        ctrl["shared_expert"] = {
            "weave_cond": _sd3_block(sd, "shared_expert.0", dtype, dual=False,
                                     last=False, qk_norm=cfg.qk_norm),
            "weave_text": _sd3_block(sd, "shared_expert.1", dtype, dual=True,
                                     last=True, qk_norm=cfg.qk_norm),
        }
    return ctrl


def load_sana_unigen_adapter(sd: Dict[str, np.ndarray], cfg: SanaBackboneConfig,
                             n_cn: int, num_experts: int, *,
                             dtype=jnp.bfloat16) -> dict:
    """Reference SANAUniGen trainable_control_modules state dict -> control
    tree (names rooted at control_* / moe / shared_expert,
    UniGenTransformer.py:1458-1738)."""
    def sana_block(p):
        hidden_ff = int(cfg.inner_dim * cfg.mlp_ratio)
        return {
            "scale_shift_table": jnp.asarray(sd[f"{p}.scale_shift_table"], dtype),
            "attn1": {"to_q": _lin(sd, f"{p}.attn1.to_q", dtype),
                      "to_k": _lin(sd, f"{p}.attn1.to_k", dtype),
                      "to_v": _lin(sd, f"{p}.attn1.to_v", dtype),
                      "to_out": _lin(sd, f"{p}.attn1.to_out.0", dtype)},
            "attn2": {"to_q": _lin(sd, f"{p}.attn2.to_q", dtype),
                      "to_k": _lin(sd, f"{p}.attn2.to_k", dtype),
                      "to_v": _lin(sd, f"{p}.attn2.to_v", dtype),
                      "to_out": _lin(sd, f"{p}.attn2.to_out.0", dtype)},
            "ff": {"inverted": _conv1x1_lin(sd, f"{p}.ff.conv_inverted", dtype),
                   "depth": {"w": jnp.asarray(
                       sd[f"{p}.ff.conv_depth.weight"].transpose(2, 3, 1, 0), dtype),
                       "b": jnp.asarray(sd[f"{p}.ff.conv_depth.bias"], dtype)},
                   "point": _conv1x1_lin(sd, f"{p}.ff.conv_point", dtype,
                                        bias=False)},
        }

    ctrl = {
        "pos_embed_input": {"w": jnp.asarray(
            sd["control_pos_embed_input.proj.weight"].reshape(cfg.inner_dim, -1).T,
            dtype),
            "b": jnp.asarray(sd["control_pos_embed_input.proj.bias"], dtype)},
        "condition_embed": {
            "timestep": {"fc1": _lin(sd, "control_condition_embed.emb.timestep_embedder.linear_1", dtype),
                         "fc2": _lin(sd, "control_condition_embed.emb.timestep_embedder.linear_2", dtype)},
            "linear": _lin(sd, "control_condition_embed.linear", dtype)},
        "context_embedder": _lin(sd, "control_context_embedder", dtype),
        "blocks": _stack([sana_block(f"control_transformer_blocks.{i}")
                          for i in range(n_cn)]),
        "add_blocks": _stack([_lin(sd, f"controlnet_add_blocks.{i}", dtype)
                              for i in range(n_cn)]),
    }
    gate_key = next(k for k in sd if k.endswith("gate.wg.weight"))
    prefix = gate_key[: -len("gate.wg.weight")]
    moe = {"gate": {"w": jnp.asarray(sd[gate_key].T, jnp.float32)}}
    if f"{prefix}experts.deepspeed_experts.0.0.0.weight" in sd:
        def expert_lin(e, pair, idx):
            return _lin(sd, f"{prefix}experts.deepspeed_experts.{e}.{pair}.{idx}",
                        dtype)
        moe["experts"] = {
            "cond_mod": _stack([expert_lin(e, 0, 0) for e in range(num_experts)]),
            "cond_pool": _stack([expert_lin(e, 0, 1) for e in range(num_experts)]),
            "hid_mod": _stack([expert_lin(e, 1, 0) for e in range(num_experts)]),
            "hid_pool": _stack([expert_lin(e, 1, 1) for e in range(num_experts)]),
        }
    ctrl["moe"] = moe
    if "shared_expert.0.scale_shift_table" in sd:
        ctrl["shared_expert"] = {"block0": sana_block("shared_expert.0"),
                                 "block1": sana_block("shared_expert.1")}
    return ctrl
