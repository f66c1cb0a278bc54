"""Named model presets.

``flux_schnell`` / ``flux_dev`` / ``sd35_medium`` carry the real checkpoint
hyperparameters; the ``*_mini`` / ``*_bench`` presets keep the exact topology
(block counts, control interleave, MoE wiring) at reduced width/depth for
compile checks and single-chip benchmarking (FLUX.1 @ 12B + the ~4.7B adapter
exceeds one v5e's 16 GB HBM in bf16 — multi-chip or quantized serving is the
production path; see parallel/ and ops/quant.py).
"""

from __future__ import annotations

from unigen_tpu import config as C


def flux_schnell(condition_types=("canny",), **ctrl_overrides) -> C.UniGenConfig:
    return C.UniGenConfig(
        family="flux",
        flux=C.FluxBackboneConfig(guidance_embeds=False),
        control=C.ControlConfig(**ctrl_overrides),
        condition_types=tuple(condition_types),
    )


def flux_dev(condition_types=("canny",), **ctrl_overrides) -> C.UniGenConfig:
    return C.UniGenConfig(
        family="flux",
        flux=C.FluxBackboneConfig(guidance_embeds=True),
        control=C.ControlConfig(**ctrl_overrides),
        condition_types=tuple(condition_types),
    )


def sd35_medium(condition_types=("depth",), **ctrl_overrides) -> C.UniGenConfig:
    ctrl_overrides.setdefault("use_rope", False)
    return C.UniGenConfig(
        family="sd3",
        sd3=C.SD3BackboneConfig(),
        control=C.ControlConfig(**ctrl_overrides),
        condition_types=tuple(condition_types),
    )


def flux_mini(condition_types=("canny",)) -> C.UniGenConfig:
    """Full FLUX topology (19 double / 38 single, 9+19 control blocks, MoE,
    shared expert) at width 512 — the compile-check flagship."""
    return C.UniGenConfig(
        family="flux",
        flux=C.FluxBackboneConfig(
            in_channels=64, num_layers=19, num_single_layers=38,
            attention_head_dim=64, num_attention_heads=8,
            joint_attention_dim=1024, pooled_projection_dim=256,
            guidance_embeds=False, axes_dims_rope=(8, 28, 28)),
        control=C.ControlConfig(),
        condition_types=tuple(condition_types),
    )


def flux_bench(condition_types=("canny",)) -> C.UniGenConfig:
    """Single-v5e-chip benchmark preset: REAL FLUX width (3072, 24 heads x 128)
    with reduced depth (6 double / 12 single; 3+6 control blocks) so the full
    UniGen stack (~4.3B params, ~8.6GB bf16) plus activations fits one 16 GB
    chip. Per-block math is identical to the real model, so per-block timings
    extrapolate."""
    return C.UniGenConfig(
        family="flux",
        flux=C.FluxBackboneConfig(
            in_channels=64, num_layers=6, num_single_layers=12,
            attention_head_dim=128, num_attention_heads=24,
            joint_attention_dim=4096, pooled_projection_dim=768,
            guidance_embeds=False, axes_dims_rope=(16, 56, 56)),
        # per-sample routing keeps the router linear in batch (serving mode)
        control=C.ControlConfig(moe=C.MoEConfig(batch_mode="per_sample")),
        condition_types=tuple(condition_types),
    )


def flux_full(condition_types=("canny",)) -> C.UniGenConfig:
    """The REAL FLUX.1 topology — 19 double / 38 single base blocks at width
    3072 (24 heads x 128), 9 + 19 control blocks, full MoE + shared expert:
    BASELINE config #1's exact model (reference UniGenTransformer.py:744,
    infer.py:115-149). bf16 needs ~35 GiB (multi-chip path, parallel/);
    single-chip serving quantizes with ops/quant.quantize_unigen_serving
    (W4 base + W4 adapter blocks + W8 small pieces = 9.4 GiB, leaving the
    HBM headroom the axon runtime's host-transfer path requires)."""
    return C.UniGenConfig(
        family="flux",
        flux=C.FluxBackboneConfig(guidance_embeds=False),
        # per-sample routing keeps the router linear in batch (serving mode)
        control=C.ControlConfig(moe=C.MoEConfig(batch_mode="per_sample")),
        condition_types=tuple(condition_types),
    )


def flux_train_bench(condition_types=("canny",), *,
                     shared_expert: bool = True) -> C.UniGenConfig:
    """Single-chip TRAIN-step benchmark preset: real width (3072), 2 double /
    4 single base blocks (1 + 2 control blocks). Training quadruples adapter
    bytes (params + grads + AdamW m/v), so even with the frozen base in int4
    (QLoRA-style straight-through matmuls, ops/quant.py) full depth cannot
    fit one v5e — per-block step time extrapolates. ``shared_expert=False``
    is the smaller fallback rung (the 2-block weave is ~45% of the tiny
    adapter)."""
    return C.UniGenConfig(
        family="flux",
        flux=C.FluxBackboneConfig(
            in_channels=64, num_layers=2, num_single_layers=4,
            attention_head_dim=128, num_attention_heads=24,
            joint_attention_dim=4096, pooled_projection_dim=768,
            guidance_embeds=False, axes_dims_rope=(16, 56, 56)),
        control=C.ControlConfig(use_shared_expert=shared_expert),
        condition_types=tuple(condition_types),
    )


def tiny(condition_types=("canny",)) -> C.UniGenConfig:
    return C.UniGenConfig(family="flux", flux=C.tiny_flux_config(),
                          condition_types=tuple(condition_types))


# The five BASELINE.json benchmark configurations as runnable presets.
MULTIGEN_CONDITIONS = ("hed", "canny", "hedsketch", "depth", "normal", "seg",
                       "bbox", "openpose", "outpainting", "inpainting",
                       "blur", "grayscale")


def baseline_configs() -> dict:
    """BASELINE.md presets (model config + run settings). Full-width FLUX
    needs >=2 chips in bf16 or int8 serving (ops/quant.py)."""
    return {
        # 1. UniGenFlux canny single-condition (FLUX.1-schnell, 512^2, 4-step)
        "flux_canny_4step": dict(cfg=flux_schnell(("canny",)),
                                 steps=4, resolution=512, guidance=3.5),
        # 2. UniGenSD3 depth single-condition (SD3.5-medium, 28-step)
        "sd3_depth_28step": dict(cfg=sd35_medium(("depth",)),
                                 steps=28, resolution=512, guidance=7.0),
        # 3. Full MultiGen-20M condition suite w/ LoRA expert switching
        "multigen_suite": dict(cfg=flux_schnell(MULTIGEN_CONDITIONS),
                               steps=4, resolution=512, guidance=3.5,
                               lora_rank=4),
        # 4. Multi-condition joint control (depth+canny+openpose)
        "multi_condition_joint": dict(
            cfg=flux_schnell(("depth", "canny", "openpose")),
            steps=4, resolution=512, guidance=3.5, multi_condition=True),
        # 5. Subjects-200K subject-driven + single-condition train step (b16)
        "subjects200k_train": dict(cfg=flux_schnell(("subject",)),
                                   train_batch_size=16, resolution=512,
                                   steps=4, guidance=3.5, training=True),
    }
