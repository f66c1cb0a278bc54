"""Single dataclass config tree.

Replaces the reference's four-tier config system (argparse CLI + OmegaConf
``config/unigen.yaml`` + accelerate/DeepSpeed YAML/JSON + shell env vars;
reference ``train.py:127-183,297-301``) with one typed tree plus CLI overrides.
The mesh/sharding config replaces the DeepSpeed/accelerate tier entirely.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field, fields
from typing import Any, Optional, Tuple, Union


# The twelve MultiGen-20M spatial condition types plus subject-driven
# generation (reference README.md:77, src/dataloader.py:143).
CONDITION_TYPES: Tuple[str, ...] = (
    "hed", "canny", "hedsketch", "depth", "normal", "seg",
    "bbox", "openpose", "outpainting", "inpainting", "blur", "grayscale",
)
SUBJECT_CONDITION_TYPES: Tuple[str, ...] = ("depth", "canny", "subject", "openpose")


@dataclass(frozen=True)
class FluxBackboneConfig:
    """FLUX.1 MMDiT backbone hyperparameters (frozen pretrained base)."""
    in_channels: int = 64                  # packed latent channels (16 * 2 * 2)
    num_layers: int = 19                   # double-stream blocks
    num_single_layers: int = 38            # single-stream blocks
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096        # T5 embedding dim
    pooled_projection_dim: int = 768       # CLIP pooled dim
    guidance_embeds: bool = False          # schnell: False, dev: True
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    rope_theta: int = 10000

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def out_channels(self) -> int:
        return self.in_channels


@dataclass(frozen=True)
class SD3BackboneConfig:
    """SD3 / SD3.5 MMDiT backbone hyperparameters."""
    sample_size: int = 128
    patch_size: int = 2
    in_channels: int = 16
    num_layers: int = 24                   # SD3.5-medium: 24 (w/ dual attn 0..12)
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    caption_projection_dim: int = 1536
    pooled_projection_dim: int = 2048
    out_channels: int = 16
    pos_embed_max_size: int = 384
    dual_attention_layers: Tuple[int, ...] = tuple(range(13))
    qk_norm: Optional[str] = "rms_norm"

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


@dataclass(frozen=True)
class SanaBackboneConfig:
    """SANA linear-attention DiT backbone hyperparameters."""
    in_channels: int = 32
    out_channels: int = 32
    num_layers: int = 20
    attention_head_dim: int = 32
    num_attention_heads: int = 70
    num_cross_attention_heads: int = 20
    cross_attention_head_dim: int = 112
    cross_attention_dim: int = 2240
    caption_channels: int = 2304
    mlp_ratio: float = 2.5
    patch_size: int = 1
    sample_size: int = 32
    pooled_projection_dim: int = 768   # pooled embed dim for MoE modulation

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


@dataclass(frozen=True)
class MoEConfig:
    """Condition-expert MoE (reference UniGenTransformer.py:806-923).

    expert_num defaults to (condition_nums + 1) * expert_num_each_condition.
    Routing is GShard top-k (k=1) with capacity_factor=1 and aux loss x0.1.
    """
    expert_num: Optional[int] = None
    expert_num_each_condition: int = 3
    top_k: int = 1
    capacity_factor: float = 1.0
    eval_capacity_factor: float = 1.0
    min_capacity: int = 4
    drop_tokens: bool = True
    use_rts: bool = False                  # random token selection on overflow (train-only)
    aux_loss_weight: float = 0.1
    # informational: the ACTUAL expert-parallel degree is MeshConfig.expert
    # (moe_apply(expert_axis=...) reads the live mesh); kept for
    # reference-config compatibility (DeepSpeed MoE ep_size)
    ep_size: int = 1
    # "global": one router over all B*S tokens (reference parity; dispatch
    # cost grows ~quadratically with batch). "per_sample": vmapped per-sample
    # routing with per-sample capacity — linear in batch, the batched-serving
    # mode.
    batch_mode: str = "global"
    # Gather-based top-1 dispatch/combine (O(S*M) index gathers) instead of
    # the dense [S,E,C] einsum (O(S^2*M/E)) — the TPU answer to the
    # reference's optional tutel fast dispatcher (UniGenUtils.py:91-97).
    # Numerically equivalent for top-1; top-2 always uses the einsum path.
    fast_dispatch: bool = True

    def num_experts(self, condition_nums: int) -> int:
        if self.expert_num is not None:
            return self.expert_num
        return (condition_nums + 1) * self.expert_num_each_condition


@dataclass(frozen=True)
class ControlConfig:
    """Condition-weaving control branch (reference unigen.yaml + train.py:297-301).

    Note on ``use_rope``: the published reference hardcodes RoPE control blocks
    for the Flux family (UniGenTransformer.py:746,763) while its shipped yaml
    leaves use_rope unset (-> False), a configuration whose MoE experts cannot
    execute (3-D temb into diffusers AdaLayerNormZeroSingle chunks the wrong
    axis). We default use_rope=True for Flux — the only shape-consistent
    configuration — and False for SD3.
    """
    use_transformer_params: bool = True    # warm-start control branch from base
    use_pooled_prompt_embeds: bool = True
    use_encoder_hidden_states: bool = True
    use_single_trans_blocks: bool = True
    single_block_control_method: str = "overall_add"  # or "single_add"
    single_control_dev: int = 2            # base blocks per control block
    use_shared_expert: bool = True
    use_consis_module: bool = False
    use_modulate: bool = False
    use_rope: bool = True
    use_pos_embed: bool = False            # separate trainable control
    #   PatchEmbed for the TARGET stream in the UniGenBase variant
    #   (reference UniGenTransformer.py:53-65,311-314); False re-embeds the
    #   target through the frozen base pos_embed (the :314 else branch)
    cn2base_method: str = "add"            # or "CrossAttn"
    extra_conditioning_channels: int = 0   # SD3 only
    num_layers: Optional[int] = None       # SD3 control depth override
    moe: MoEConfig = field(default_factory=MoEConfig)


@dataclass(frozen=True)
class UniGenConfig:
    """Full model config: backbone family + control branch + conditions."""
    family: str = "flux"                   # flux | sd3 | sana
    flux: FluxBackboneConfig = field(default_factory=FluxBackboneConfig)
    sd3: SD3BackboneConfig = field(default_factory=SD3BackboneConfig)
    sana: SanaBackboneConfig = field(default_factory=SanaBackboneConfig)
    control: ControlConfig = field(default_factory=ControlConfig)
    condition_types: Tuple[str, ...] = ("canny",)

    @property
    def condition_nums(self) -> int:
        return len(self.condition_types)

    @property
    def backbone(self):
        return {"flux": self.flux, "sd3": self.sd3, "sana": self.sana}[self.family]


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh axes. Replaces NCCL/DeepSpeed process-group plumbing:
    sharding annotations over these axes make XLA emit the collectives."""
    data: int = 1          # DP / ZeRO-style fully-sharded params
    model: int = 1         # TP: attention heads + MLP hidden
    expert: int = 1        # EP: all_to_all expert dispatch
    sequence: int = 1      # SP: Ulysses-style head<->sequence all_to_all

    @property
    def axis_names(self) -> Tuple[str, ...]:
        return ("data", "expert", "sequence", "model")

    @property
    def shape(self) -> Tuple[int, ...]:
        return (self.data, self.expert, self.sequence, self.model)


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference train.py defaults)."""
    learning_rate: float = 1e-4
    lr_scheduler: str = "cosine"
    lr_warmup_steps: int = 500
    max_train_steps: int = 30000
    train_batch_size: int = 1              # per-process micro batch
    gradient_accumulation_steps: int = 1
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    weighting_scheme: str = "none"         # sigma_sqrt|logit_normal|mode|cosmap|none
    guidance_scale: float = 3.5
    max_sequence_length: int = 512
    resolution: int = 512
    seed: int = 12443
    mixed_precision: str = "bf16"
    checkpointing_steps: int = 1000
    # activation rematerialisation: True/"full" (blanket checkpoint — memory
    # floor), "dots" (save weight-matmul outputs, recompute attention +
    # elementwise — the MFU option), False/"none" (utils.remat_wrap)
    remat: Union[bool, str] = True
    # LoRA fine-tuning mode (reference --rank, train.py:137; PEFT adapter
    # save/load hooks hook.py:29-84 — dormant in the published v2, first-class
    # here): rank > 0 trains rank-r {a, b} factors over the FROZEN control
    # branch (quantized bases allowed — QLoRA-style dequant fold, see
    # models/lora.fold_for_training) instead of the control modules
    # themselves. targets = substring patterns over dotted param paths
    # (() -> models/lora.DEFAULT_LORA_TARGETS); adapter_name names the
    # exported reference-format adapter directory.
    lora_rank: int = 0
    lora_targets: tuple = ()
    lora_scale: float = 1.0
    lora_adapter_name: str = "default"


def control_overrides_from_yaml(path: Optional[str]) -> dict:
    """Load the reference control-config file (config/unigen.yaml layout:
    ``params.control_params.*``) into ControlConfig/MoEConfig override
    kwargs (reference train.py:297-301 consumes the same keys via OmegaConf).
    Accepts plain YAML/JSON; unknown keys error loudly; MoE keys
    (``expert_num_each_condition`` et al) fold into a ``moe=MoEConfig``
    override. Returns {} for a falsy path."""
    if not path:
        return {}
    import yaml
    with open(path) as f:
        doc = yaml.safe_load(f)
    params = (doc or {}).get("params", doc) or {}
    cp = dict(params.get("control_params", params) or {})
    moe_keys = {k: cp.pop(k) for k in list(cp)
                if k in ("expert_num_each_condition", "expert_num", "top_k",
                         "capacity_factor", "aux_loss_weight")}
    valid = {f.name for f in fields(ControlConfig)}
    unknown = set(cp) - valid
    if unknown:
        raise ValueError(f"control config {path}: unknown control_params "
                         f"keys {sorted(unknown)}; valid: {sorted(valid)}")
    if moe_keys:
        cp["moe"] = MoEConfig(**moe_keys)
    return cp


def tiny_flux_config(**overrides) -> FluxBackboneConfig:
    """A miniature Flux config for tests (same topology, tiny dims)."""
    base = dict(
        in_channels=16, num_layers=2, num_single_layers=4,
        attention_head_dim=16, num_attention_heads=4,
        joint_attention_dim=32, pooled_projection_dim=24,
        guidance_embeds=False, axes_dims_rope=(4, 6, 6),
    )
    base.update(overrides)
    return FluxBackboneConfig(**base)


def tiny_sd3_config(**overrides) -> SD3BackboneConfig:
    base = dict(
        sample_size=16, patch_size=2, in_channels=4, num_layers=4,
        attention_head_dim=8, num_attention_heads=4, joint_attention_dim=32,
        caption_projection_dim=32, pooled_projection_dim=24, out_channels=4,
        pos_embed_max_size=32, dual_attention_layers=(0, 1), qk_norm="rms_norm",
    )
    base.update(overrides)
    return SD3BackboneConfig(**base)


def tiny_sana_config(**overrides) -> SanaBackboneConfig:
    base = dict(
        in_channels=4, out_channels=4, num_layers=2, attention_head_dim=8,
        num_attention_heads=4, num_cross_attention_heads=2,
        cross_attention_head_dim=16, cross_attention_dim=32,
        caption_channels=24, mlp_ratio=2.5, patch_size=1, sample_size=8,
        pooled_projection_dim=16,
    )
    base.update(overrides)
    return SanaBackboneConfig(**base)


def asdict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def to_json(cfg: Any) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, default=str)


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)
