#!/usr/bin/env python
"""Inference / evaluation entry point (reference infer.py:36-247): batched
held-out-split generation with saved target/result/condition images and an
info.json manifest."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="UniGen-TPU inference")
    p.add_argument("--basemodel", default="UniGenFlux")
    p.add_argument("--pretrained_model_name_or_path", required=True)
    p.add_argument("--ckpt_path", default=None, help="UniGen adapter dir")
    p.add_argument("--data_path", default=None)
    p.add_argument("--save_path", default="output/infer")
    p.add_argument("--condition_types", nargs="+", default=["canny"])
    p.add_argument("--prompt", default=None, help="single-prompt mode")
    p.add_argument("--control_image", default=None)
    p.add_argument("--num_inference_steps", type=int, default=28)
    p.add_argument("--guidance_scale", type=float, default=3.5)
    p.add_argument("--true_cfg_scale", type=float, default=1.0)
    p.add_argument("--conditioning_scale", type=float, default=1.0)
    p.add_argument("--control_cache_interval", type=int, default=1,
                   help="recompute the control branch every k-th step "
                        "(serving approximation; see CACHE.json fidelity)")
    p.add_argument("--control_cache_threshold", type=float, default=0.0,
                   help="adaptive variant: refresh when the latent drifts "
                        "more than this relative L1 since the last refresh "
                        "(overrides the fixed interval)")
    p.add_argument("--cfg_cache", action="store_true",
                   help="with a caching mode + true_cfg_scale>1: replay "
                        "steps skip the negative stream and reuse the "
                        "cached guidance delta")
    p.add_argument("--model_cache_interval", type=int, default=1,
                   help="FULL-MODEL output caching: replay steps skip the "
                        "entire transformer and reuse the cached prediction "
                        "(most aggressive cache rung). Combined with a "
                        "LARGER --control_cache_interval it divides, selects "
                        "the HYBRID three-level cache (SERVING.md rung 3c)")
    p.add_argument("--model_cache_threshold", type=float, default=0.0,
                   help="adaptive variant of --model_cache_interval")
    p.add_argument("--model_cache_order", type=int, default=0, choices=[0, 1],
                   help="0 = zero-order hold, 1 = first-order Taylor "
                        "extrapolation from the two most recent refreshes")
    p.add_argument("--quality_profile", default=None,
                   choices=["exact", "balanced", "fast"],
                   help="measured serving operating point (SERVING.md); "
                        "mutually exclusive with the raw cache knobs")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--max_sequence_length", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--max_samples", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lora_dir", default=None,
                   help="per-condition LoRA experts (reference hook.py "
                        "per-adapter layout); auto-switched by condition type")
    p.add_argument("--cn_config", type=str, default=None,
                   help="reference-format control config YAML "
                        "(config/unigen.yaml layout); the --single_* flags "
                        "override it (reference infer.py builds the model "
                        "with the same knobs as train.py)")
    p.add_argument("--single_control_dev", type=int, default=2)
    p.add_argument("--single_block_control_method", default="overall_add")
    p.add_argument("--disable_single_trans_blocks", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import numpy as np
    from PIL import Image

    from unigen_tpu.data import conditions as C
    from unigen_tpu.data.datasets import Subjects200K
    from unigen_tpu.observability import param_report, setup_logging
    from unigen_tpu.pipelines.loading import load_flux_pipeline

    os.makedirs(args.save_path, exist_ok=True)
    logger = setup_logging(args.save_path)

    from unigen_tpu.config import control_overrides_from_yaml
    control_overrides = control_overrides_from_yaml(args.cn_config)
    control_overrides.update(
        single_control_dev=args.single_control_dev,
        single_block_control_method=args.single_block_control_method,
        use_single_trans_blocks=not args.disable_single_trans_blocks)
    pipe = load_flux_pipeline(args.pretrained_model_name_or_path,
                              condition_types=args.condition_types,
                              adapter_dir=args.ckpt_path,
                              lora_dir=args.lora_dir,
                              control_overrides=control_overrides)
    param_report(pipe.params["base"], "base")
    param_report(pipe.params["control"], "adapter")

    if args.prompt is not None:
        img = np.asarray(Image.open(args.control_image).convert("RGB")
                         .resize((args.resolution, args.resolution)))
        control = C.to_model_range(img)[None]
        imgs = pipe(prompt=args.prompt,
                    condition_prompt=args.condition_types[0],
                    control_image=control,
                    height=args.resolution, width=args.resolution,
                    num_inference_steps=args.num_inference_steps,
                    guidance_scale=args.guidance_scale,
                    true_cfg_scale=args.true_cfg_scale,
                    conditioning_scale=args.conditioning_scale,
                    control_cache_interval=args.control_cache_interval,
                    control_cache_threshold=args.control_cache_threshold,
                    cfg_cache=args.cfg_cache,
                    model_cache_interval=args.model_cache_interval,
                    model_cache_threshold=args.model_cache_threshold,
                    model_cache_order=args.model_cache_order,
                    quality_profile=args.quality_profile,
                    seed=args.seed)
        Image.fromarray(imgs[0]).save(os.path.join(args.save_path, "res.png"))
        logger.info("saved %s", os.path.join(args.save_path, "res.png"))
        return

    # batched test-set generation (reference infer.py:160-232)
    ds = Subjects200K(args.data_path, args.condition_types[0],
                      resolution=args.resolution, split="test")
    n = min(len(ds), args.max_samples)
    manifest = []
    for start in range(0, n, args.batch_size):
        idxs = range(start, min(start + args.batch_size, n))
        samples = [ds[i] for i in idxs]
        control = np.stack([C.to_model_range(s["condition_image"])
                            for s in samples])
        prompts = [s["descriptions"] for s in samples]
        imgs = pipe(prompt=prompts, condition_prompt=args.condition_types[0],
                    control_image=control, height=args.resolution,
                    width=args.resolution,
                    num_inference_steps=args.num_inference_steps,
                    guidance_scale=args.guidance_scale,
                    conditioning_scale=args.conditioning_scale,
                    control_cache_interval=args.control_cache_interval,
                    control_cache_threshold=args.control_cache_threshold,
                    model_cache_interval=args.model_cache_interval,
                    model_cache_threshold=args.model_cache_threshold,
                    model_cache_order=args.model_cache_order,
                    quality_profile=args.quality_profile,
                    seed=args.seed + start)
        for j, (i, s) in enumerate(zip(idxs, samples)):
            d = os.path.join(args.save_path, f"{i:05d}")
            os.makedirs(d, exist_ok=True)
            Image.fromarray(s["target_image"]).save(os.path.join(d, "target.png"))
            Image.fromarray(imgs[j]).save(os.path.join(d, "res.png"))
            Image.fromarray(s["condition_image"]).save(os.path.join(d, "condition.png"))
            manifest.append({"index": i, "prompt": s["descriptions"],
                             "condition": args.condition_types[0]})
        logger.info("generated %d/%d", min(start + args.batch_size, n), n)
    with open(os.path.join(args.save_path, "info.json"), "w") as f:
        json.dump(manifest, f, indent=2)


if __name__ == "__main__":
    main()
