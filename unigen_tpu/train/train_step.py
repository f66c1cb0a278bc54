"""Flow-matching training step for UniGen models.

One jit-compiled program reproducing the reference step (train.py:517-697,
SURVEY.md §3.1): sample timestep density, add flow-matching noise, pack,
UniGen forward, weighted MSE + 0.1 aux MoE loss, AdamW on the adapter tree
only (the frozen backbone never receives gradients), cosine LR with warmup,
global-norm clip.

ZeRO-equivalence: optimizer state lives on the same shardings as the adapter
params (see parallel/sharding.py) — there is no engine; XLA's partitioner is
the engine.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unigen_tpu.config import TrainConfig, UniGenConfig
from unigen_tpu.models.unigen_flux import unigen_flux_forward
from unigen_tpu.ops.packing import pack_latents, prepare_latent_image_ids, unpack_latents
from unigen_tpu.pipelines import scheduling


class TrainState(NamedTuple):
    control: Any          # trainable adapter pytree
    opt_state: Any
    step: jnp.ndarray


def lr_schedule(cfg: TrainConfig):
    """The reference's six HF ``get_scheduler`` choices (train.py:160-161),
    re-derived in optax with HF's semantics: linear warmup 0→peak over
    ``lr_warmup_steps``, then per-type decay over the remaining steps
    (HF defaults: polynomial power=1.0 ending at lr_end=1e-7;
    cosine_with_restarts num_cycles=1 — one hard-restart cycle, which HF
    shapes as cos(π·(progress % 1)) and equals plain cosine)."""
    total = max(cfg.max_train_steps, 1)
    warmup = min(cfg.lr_warmup_steps, max(total - 1, 1))
    decay = max(total - warmup, 1)
    peak = cfg.learning_rate
    kind = cfg.lr_scheduler

    if kind == "constant":
        return optax.constant_schedule(peak)

    ramp = optax.linear_schedule(0.0, peak, warmup)
    if kind == "constant_with_warmup":
        tail = optax.constant_schedule(peak)
    elif kind == "linear":
        tail = optax.linear_schedule(peak, 0.0, decay)
    elif kind == "polynomial":
        tail = optax.polynomial_schedule(peak, 1e-7, power=1.0,
                                         transition_steps=decay)
    elif kind in ("cosine", "cosine_with_restarts"):
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=peak,
            warmup_steps=warmup, decay_steps=total, end_value=0.0)
    else:
        raise ValueError(f"unknown lr_scheduler {kind!r}; expected one of "
                         "linear/cosine/cosine_with_restarts/polynomial/"
                         "constant/constant_with_warmup (reference "
                         "train.py:161)")
    return optax.join_schedules([ramp, tail], [warmup])


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(lr_schedule(cfg), b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                    eps=cfg.adam_epsilon, weight_decay=cfg.adam_weight_decay),
    )
    if cfg.gradient_accumulation_steps > 1:
        # micro-batch accumulation (reference accelerator.accumulate,
        # train.py:623): params update every k-th step, grads averaged
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx


def init_train_state(control_params, cfg: TrainConfig) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(control=control_params, opt_state=tx.init(control_params),
                      step=jnp.zeros((), jnp.int32))


def flow_matching_loss(pred_packed: jnp.ndarray, latents: jnp.ndarray,
                       noise: jnp.ndarray, sigmas: jnp.ndarray,
                       weighting_scheme: str) -> jnp.ndarray:
    """weighted MSE against the flow target (noise - x); pred is packed
    [B, S, C*4], latents/noise are [B, C, H, W] (train.py:636-652)."""
    h, w = latents.shape[-2:]
    pred = unpack_latents(pred_packed, h, w)
    weighting = scheduling.loss_weighting(sigmas, weighting_scheme)
    weighting = jnp.reshape(weighting, (-1,) + (1,) * (latents.ndim - 1))
    target = noise - latents
    per_sample = jnp.mean(
        (weighting * (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
         ).reshape(latents.shape[0], -1), axis=1)
    return jnp.mean(per_sample)


def make_loss_builder(ucfg: UniGenConfig, tcfg: TrainConfig, *,
                      guidance_embeds: Optional[bool] = None,
                      attn_impl: str = "auto"):
    """Returns ``build(base_params, batch, rng) -> loss_fn(control)`` — the
    EXACT closure make_train_step differentiates (noise/timestep sampling,
    packing, forward, weighted flow loss). Exposed separately so
    scripts/profile_train.py can time forward / forward+backward on the
    production loss without duplicating it."""
    lora_mode = tcfg.lora_rank > 0
    sigma_table = jnp.asarray(scheduling.training_sigmas(
        scheduling.FlowMatchConfig(shift=1.0)))
    n_train = sigma_table.shape[0]
    use_guidance = (ucfg.flux.guidance_embeds if guidance_embeds is None
                    else guidance_embeds)

    def build(base_params, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        latents = batch["latents"]
        b, c, h, w = latents.shape
        r_noise, r_t, r_moe = jax.random.split(rng, 3)

        u = scheduling.sample_timestep_density(r_t, b, tcfg.weighting_scheme)
        idx = jnp.clip((u * n_train).astype(jnp.int32), 0, n_train - 1)
        sigmas = sigma_table[idx]
        t_scaled = sigmas  # timestep/1000 == sigma (shift=1 training schedule)
        noise = jax.random.normal(r_noise, latents.shape, latents.dtype)
        noisy = scheduling.scale_noise(latents, noise, sigmas)

        packed_noisy = pack_latents(noisy)
        cond = batch["condition_latents"]
        multi = cond.ndim == 5
        packed_cond = (jax.vmap(pack_latents)(cond) if multi
                       else pack_latents(cond))
        img_ids = prepare_latent_image_ids(h // 2, w // 2)
        cond_h, cond_w = (cond.shape[-2:])
        cond_ids = prepare_latent_image_ids(cond_h // 2, cond_w // 2)
        if multi:
            cond_ids = jnp.broadcast_to(cond_ids[None],
                                        (cond.shape[0],) + cond_ids.shape)
        txt_ids = jnp.zeros((batch["prompt_embeds"].shape[1], 3))
        guidance = (jnp.full((b,), tcfg.guidance_scale, latents.dtype)
                    if use_guidance else None)

        has_frozen = (isinstance(base_params, dict)
                      and "control_frozen" in base_params)
        split = has_frozen and not lora_mode
        base = base_params["base"] if has_frozen else base_params
        if lora_mode:
            assert has_frozen, ("LoRA mode (tcfg.lora_rank > 0) needs "
                                "base_params={'base', 'control_frozen'}")

        def loss_fn(control):
            if split:
                from unigen_tpu.ops.quant import merge_split
                control = merge_split(control, base_params["control_frozen"])
            if lora_mode:
                from unigen_tpu.models.lora import fold_for_training
                folded = fold_for_training(
                    {"base": base,
                     "control": base_params["control_frozen"]},
                    control, scale=tcfg.lora_scale)
                base_t, control = folded["base"], folded["control"]
            else:
                base_t = base
            pred, add_losses, add_outputs = unigen_flux_forward(
                {"base": base_t, "control": control}, ucfg,
                hidden=packed_noisy, condition=packed_cond,
                encoder=batch["prompt_embeds"], pooled=batch["pooled"],
                condition_pooled=batch["condition_pooled"],
                timestep=t_scaled, img_ids=img_ids, txt_ids=txt_ids,
                condition_ids=cond_ids, guidance=guidance,
                attn_impl=attn_impl, remat=tcfg.remat, rng=r_moe,
                training=True)
            flow = flow_matching_loss(pred, latents, noise, sigmas,
                                      tcfg.weighting_scheme)
            total = flow + sum(add_losses.values())
            return total, {"flow_loss": flow, **add_losses,
                           "expert_counts": add_outputs["expert_counts"]}

        return loss_fn

    return build


def make_train_step(ucfg: UniGenConfig, tcfg: TrainConfig, *,
                    guidance_embeds: Optional[bool] = None,
                    attn_impl: str = "auto"):
    """Returns train_step(state, base_params, batch, rng) -> (state, metrics).

    batch (all device arrays):
      latents            [B, C, H, W]   VAE-encoded targets
      condition_latents  [B, C, H, W] or [K, B, C, H, W]
      prompt_embeds      [B, T, joint_dim]
      pooled             [B, pooled_dim]
      condition_pooled   [B, pooled_dim] or [K, B, pooled_dim]

    base_params is either the frozen base tree, or a dict
    {"base": ..., "control_frozen": ...} for the single-chip full-topology
    fine-tune split (ops/quant.split_trainable): state.control then holds
    only the fp trainable subset and the quantized control leaves ride along
    frozen — gradients flow through their straight-through VJPs but stop at
    the int weights.

    LoRA mode (tcfg.lora_rank > 0, reference --rank train.py:137):
    base_params must be {"base": ..., "control_frozen": ...} with the FULL
    frozen control tree (fp or quantized), and state.control holds a
    models/lora adapter dict {dotted_path: {'a', 'b'}} rooted at the full
    {'base','control'} tree. The step folds the factors into the frozen
    weights inside the program (models/lora.fold_for_training — dequant
    fold, differentiable w.r.t. a/b only), so the optimizer/checkpoint
    state is just the rank-r factors.
    """
    tx = make_optimizer(tcfg)
    loss_builder = make_loss_builder(ucfg, tcfg,
                                     guidance_embeds=guidance_embeds,
                                     attn_impl=attn_impl)

    def train_step(state: TrainState, base_params, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        loss_fn = loss_builder(base_params, batch, rng)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.control)
        updates, opt_state = tx.update(grads, state.opt_state, state.control)
        control = optax.apply_updates(state.control, updates)
        metrics = {"step_loss": loss, "flow_loss": aux["flow_loss"],
                   "moe_loss": aux.get("moe_loss", jnp.zeros(())),
                   "grad_norm": optax.global_norm(grads),
                   "lr": lr_schedule(tcfg)(state.step),
                   "expert_counts": aux["expert_counts"]}
        return TrainState(control, opt_state, state.step + 1), metrics

    return train_step
