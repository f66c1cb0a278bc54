#!/usr/bin/env python
"""Training entry point — the reference train.py CLI surface on the TPU stack.

accelerate/DeepSpeed launch plumbing is replaced by jax.distributed +
mesh/sharding config: run one process per host (GKE/xpk style), pass
--coordinator/--num-processes/--process-id, and pick mesh axes with
--mesh-data/--mesh-expert/--mesh-sequence/--mesh-model.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="UniGen-TPU training")
    p.add_argument("--basemodel", default="UniGenFlux",
                   choices=["UniGenFlux", "MultiCondtionUniGenFlux", "UniGenSD3",
                            "SANAUniGen"])
    p.add_argument("--pretrained_model_name_or_path", required=True)
    p.add_argument("--data_path", default="")
    p.add_argument("--dataset_name", default="Subjects200K",
                   choices=["Subjects200K", "MultiGen", "MultiConditionSubjects200K"])
    p.add_argument("--condition_types", nargs="+", default=["depth", "canny"])
    p.add_argument("--work_dir", default="output/train_result")
    p.add_argument("--resume_from_checkpoint", default=None)
    p.add_argument("--max_train_steps", type=int, default=30000)
    p.add_argument("--train_batch_size", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--scale_lr", action="store_true", default=False,
                   help="scale LR by grad_accum * batch * num_processes "
                        "(reference train.py:341-342)")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--num_train_epochs", type=int, default=None,
                   help="alternative to --max_train_steps: epochs over the "
                        "dataset (reference train.py:438-440)")
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--lr_scheduler", type=str, default="cosine",
                   choices=["linear", "cosine", "cosine_with_restarts",
                            "polynomial", "constant", "constant_with_warmup"],
                   help="LR schedule shape (reference train.py:160-161)")
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--weighting_scheme", default="none",
                   choices=["sigma_sqrt", "logit_normal", "mode", "cosmap", "none"])
    p.add_argument("--guidance_scale", type=float, default=3.5)
    p.add_argument("--max_sequence_length", type=int, default=512)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--checkpointing_steps", type=int, default=1000)
    p.add_argument("--seed", type=int, default=12443)
    p.add_argument("--mixed_precision", default="bf16",
                   choices=["bf16", "fp32", "no"],
                   help="dtype the FROZEN base weights are loaded/ridden in "
                        "(reference accelerate --mixed_precision casts "
                        "non-trainable weights, train.py:251); trainable "
                        "adapter params stay fp32 either way")
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--rank", type=int, default=0,
                   help="LoRA rank (reference train.py:137 --rank; dormant "
                        "there, first-class here): > 0 trains rank-r LoRA "
                        "factors over the FROZEN control branch instead of "
                        "the control modules, and exports the adapter in "
                        "the reference per-adapter layout "
                        "({work_dir}/lora_adapters/{name}/"
                        "pytorch_lora_weights.safetensors, hook.py:29-45) "
                        "at every checkpoint")
    p.add_argument("--lora_targets", nargs="+", default=None,
                   help="substring patterns over dotted param paths picking "
                        "the LoRA-adapted linears (default: control-branch "
                        "attn + ff, models/lora.DEFAULT_LORA_TARGETS)")
    p.add_argument("--lora_scale", type=float, default=1.0)
    p.add_argument("--lora_adapter_name", default=None,
                   help="adapter directory name for the reference-format "
                        "export (default: the joined condition types)")
    p.add_argument("--cn_config", type=str, default=None,
                   help="reference-format control config YAML/JSON "
                        "(unigen.yaml: params.control_params.* keys map "
                        "onto ControlConfig/MoEConfig; the explicit "
                        "--single_* CLI flags override it, reference "
                        "train.py:297-301)")
    p.add_argument("--single_control_dev", type=int, default=2)
    p.add_argument("--single_block_control_method", default="overall_add")
    p.add_argument("--disable_single_trans_blocks", action="store_true")
    p.add_argument("--mesh-data", type=int, default=0, help="0 = all devices")
    p.add_argument("--mesh-expert", type=int, default=1)
    p.add_argument("--mesh-sequence", type=int, default=1)
    p.add_argument("--mesh-model", type=int, default=1)
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    return p.parse_args(argv)


def load_cn_config(path):
    """Reference --cn_config YAML -> ControlConfig override kwargs
    (config.control_overrides_from_yaml; SystemExit on unknown keys so the
    CLI fails loudly)."""
    from unigen_tpu import config as C
    try:
        return C.control_overrides_from_yaml(path)
    except ValueError as e:
        raise SystemExit(f"--cn_config: {e}")


def main(argv=None):
    args = parse_args(argv)
    from unigen_tpu.utils import apply_env_platform
    apply_env_platform()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unigen_tpu import config as C, observability
    from unigen_tpu.data.datasets import (ConcatDataset,
                                          MultiConditionSubjects200K, MultiGen,
                                          Subjects200K, collate)
    from unigen_tpu.data.sampler import MultiTaskMixedBatchSampler
    from unigen_tpu.models import vae as vae_lib
    from unigen_tpu.models.clip_text import clip_encode
    from unigen_tpu.models.t5_text import t5_encode
    from unigen_tpu.parallel.mesh import build_mesh, multihost_init
    from unigen_tpu.pipelines.loading import load_flux_pipeline
    from unigen_tpu.train.loop import Trainer

    multihost_init(args.coordinator, args.num_processes, args.process_id)
    os.makedirs(args.work_dir, exist_ok=True)
    logger = observability.setup_logging(args.work_dir)

    # pre-check: exit if this run already completed (reference train.py:717-722)
    from unigen_tpu.train import checkpoint as ckpt_lib
    done = ckpt_lib.latest_step(args.work_dir)
    if (done is not None and args.num_train_epochs is None
            and done >= args.max_train_steps):
        # (epochs mode re-derives max_steps from the dataset below and
        # re-checks before training starts)
        logger.info("training already completed at step %d", done)
        return

    mesh_cfg = C.MeshConfig(
        data=args.mesh_data or (jax.device_count() // (args.mesh_expert *
                                args.mesh_sequence * args.mesh_model)),
        expert=args.mesh_expert, sequence=args.mesh_sequence,
        model=args.mesh_model)
    mesh = build_mesh(mesh_cfg)
    logger.info("mesh: %s", dict(mesh.shape))

    control_overrides = load_cn_config(args.cn_config)
    # CLI flags override the config file (reference train.py:298-301)
    control_overrides.update(
        single_control_dev=args.single_control_dev,
        single_block_control_method=args.single_block_control_method,
        use_single_trans_blocks=not args.disable_single_trans_blocks)
    pipe = load_flux_pipeline(
        args.pretrained_model_name_or_path,
        condition_types=args.condition_types,
        control_overrides=control_overrides,
        dtype=(jnp.bfloat16 if args.mixed_precision == "bf16"
               else jnp.float32))
    observability.param_report(pipe.params["base"], "base")
    observability.param_report(pipe.params["control"], "adapter")

    if args.dataset_name == "MultiGen":
        datasets = [MultiGen(args.data_path, t, args.resolution)
                    for t in args.condition_types]
    elif args.dataset_name == "MultiConditionSubjects200K":
        datasets = [MultiConditionSubjects200K(args.data_path,
                                               args.condition_types,
                                               resolution=args.resolution)]
    else:
        datasets = [Subjects200K(args.data_path, t, args.resolution)
                    for t in args.condition_types]
    concat = ConcatDataset(datasets)
    sampler = MultiTaskMixedBatchSampler(
        [len(d) for d in datasets], args.train_batch_size,
        num_replicas=jax.process_count(), rank=jax.process_index(),
        shuffle=True, seed=args.seed)

    lr = args.learning_rate
    if args.scale_lr:
        # reference train.py:341-342: LR scales with the effective global
        # batch (accumulation x per-host batch x process count)
        lr = (lr * args.gradient_accumulation_steps * args.train_batch_size
              * jax.process_count())
    max_steps = args.max_train_steps
    if args.num_train_epochs is not None:
        # reference train.py:438-440: epochs -> optimizer-update steps over
        # the sampler's epoch length (ceil over accumulation)
        import math as _math
        epoch_len = _math.ceil(len(concat) / args.train_batch_size)
        max_steps = args.num_train_epochs * _math.ceil(
            epoch_len / args.gradient_accumulation_steps)
        logger.info("num_train_epochs=%d -> max_train_steps=%d",
                    args.num_train_epochs, max_steps)
        if done is not None and done >= max_steps:
            logger.info("training already completed at step %d", done)
            return

    tcfg = C.TrainConfig(
        learning_rate=lr, lr_warmup_steps=args.lr_warmup_steps,
        lr_scheduler=args.lr_scheduler,
        max_train_steps=max_steps,
        train_batch_size=args.train_batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        weighting_scheme=args.weighting_scheme,
        guidance_scale=args.guidance_scale,
        max_sequence_length=args.max_sequence_length,
        resolution=args.resolution, seed=args.seed,
        checkpointing_steps=args.checkpointing_steps,
        max_grad_norm=args.max_grad_norm,
        mixed_precision=args.mixed_precision,
        adam_beta1=args.adam_beta1, adam_beta2=args.adam_beta2,
        adam_weight_decay=args.adam_weight_decay,
        adam_epsilon=args.adam_epsilon,
        lora_rank=args.rank,
        lora_targets=tuple(args.lora_targets or ()),
        lora_scale=args.lora_scale,
        lora_adapter_name=(args.lora_adapter_name
                           or "_".join(args.condition_types)))

    def encode_text(prompts):
        embeds, pooled = pipe.encode_prompt(list(prompts),
                                            args.max_sequence_length)
        return {"prompt_embeds": embeds, "pooled": pooled}

    vae_encode_jit = jax.jit(functools.partial(
        vae_lib.vae_encode, pipe.vae_params, pipe.vae_cfg))

    def encode_images(px):
        return vae_encode_jit(jnp.asarray(px, jnp.float32))

    if args.rank > 0:
        # LoRA fine-tuning: rank-r factors over the frozen control branch
        # (reference --rank + PEFT hooks, dormant there). The adapter paths
        # are rooted at the full {'base','control'} tree so they match the
        # reference-format export/load maps directly.
        from unigen_tpu.models.lora import (DEFAULT_LORA_TARGETS,
                                            init_lora_adapters)
        targets = list(tcfg.lora_targets or DEFAULT_LORA_TARGETS)
        adapters = init_lora_adapters(
            jax.random.PRNGKey(args.seed), pipe.params,
            targets=targets, rank=args.rank,
            adapter_names=[tcfg.lora_adapter_name])
        lora = adapters[tcfg.lora_adapter_name]
        if not lora:
            raise SystemExit(f"--rank {args.rank}: no linear weights match "
                             f"--lora_targets {targets}")
        logger.info("LoRA mode: rank %d, %d target stacks, adapter '%s'",
                    args.rank, len(lora), tcfg.lora_adapter_name)
        trainer = Trainer(pipe.cfg, tcfg,
                          base_params={"base": pipe.params["base"],
                                       "control_frozen": pipe.params["control"]},
                          control_params=lora,
                          encode_text=encode_text, encode_images=encode_images,
                          work_dir=args.work_dir, mesh=mesh)
    else:
        trainer = Trainer(pipe.cfg, tcfg, base_params=pipe.params["base"],
                          control_params=pipe.params["control"],
                          encode_text=encode_text, encode_images=encode_images,
                          work_dir=args.work_dir, mesh=mesh)
    trainer.maybe_resume()

    def batch_stream():
        while True:
            for idxs in sampler:
                samples = [concat[i] for i in idxs]
                yield collate(samples,
                              condition_types=(args.condition_types
                                               if args.dataset_name ==
                                               "MultiConditionSubjects200K"
                                               else None))

    from unigen_tpu.data.prefetch import Prefetcher
    trainer.train(Prefetcher(batch_stream(), depth=4, workers=2))
    logger.info("training complete at step %d", trainer.global_step)


if __name__ == "__main__":
    main()
