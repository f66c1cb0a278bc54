"""Training loop driver — the reference train.py:206-712 as a library class.

Per step (SURVEY.md §3.1): text-encode prompts + condition task names
(separate jit programs, no_grad by construction), VAE-encode target +
condition images, then ONE jit-compiled train step (noise sampling, packing,
UniGen forward, flow-matching loss + MoE aux, AdamW on the adapter tree).
Checkpoints via orbax every N steps with a ``latest`` resume tag; rank-0
logging of step_loss/flow_loss/moe_loss/lr/expert_counts (reference
train.py:687-695).

Multi-host / sharded: pass ``mesh`` and the Trainer becomes the distributed
engine the reference delegates to DeepSpeed (script/train.sh:44-61 +
config/ds_zero3.json): params and optimizer state are placed by
parallel/sharding.param_spec (ZeRO-style stacked-axis sharding over 'data',
TP over 'model', experts over 'expert'), the jitted step runs under the mesh
so XLA emits the collectives, and per-process batches are assembled into
global arrays with jax.make_array_from_process_local_data over the 'data'
axis (single-process: the same call just places the shards locally).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from unigen_tpu.config import TrainConfig, UniGenConfig
from unigen_tpu.train import checkpoint as ckpt_lib
from unigen_tpu.train.train_step import (TrainState, init_train_state,
                                         make_train_step)

logger = logging.getLogger("unigen_tpu.train")


class Trainer:
    def __init__(self, ucfg: UniGenConfig, tcfg: TrainConfig, *,
                 base_params, control_params,
                 encode_text: Callable[[Sequence[str]], Dict[str, jnp.ndarray]],
                 encode_images: Callable[[np.ndarray], jnp.ndarray],
                 work_dir: Optional[str] = None, mesh=None):
        """encode_text(prompts) -> {'prompt_embeds', 'pooled'};
        encode_text(task_names)['pooled'] doubles as the condition embed.
        encode_images(pixels [B,3,H,W]) -> latents [B,C,h,w] (jitted VAE)."""
        self.ucfg, self.tcfg = ucfg, tcfg
        self.encode_text = encode_text
        self.encode_images = encode_images
        self.work_dir = work_dir
        self.mesh = mesh
        # reference train.py:346: "only upcast trainable parameters (LoRA)
        # into fp32" — the frozen base rides in its loaded dtype
        # (--mixed_precision), trainable floating leaves train in fp32
        control_params = jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, control_params)
        if mesh is not None:
            # distributed placement: frozen base + trainable adapter go onto
            # the mesh per the sharding rules; the optimizer state created
            # from the sharded adapter INHERITS its placement (zeros_like
            # preserves sharding) — the ZeRO-3 equivalence, with XLA
            # scheduling the gather-on-use collectives
            from unigen_tpu.parallel.sharding import shard_params
            base_params = shard_params(base_params, mesh)
            control_params = shard_params(control_params, mesh)
        self.base_params = base_params
        self.state = init_train_state(control_params, tcfg)
        self.global_step = 0
        self._step_fn = jax.jit(make_train_step(ucfg, tcfg),
                                donate_argnums=(0,))
        self._rng = jax.random.PRNGKey(tcfg.seed)

    # ------------------------------------------------------------ resume

    def maybe_resume(self) -> bool:
        if not self.work_dir:
            return False
        try:
            restored = ckpt_lib.restore_train_state(
                self.work_dir, self.state.control, self.state.opt_state)
        except Exception as e:
            # corrupt/incompatible checkpoint -> restart from 0 (the
            # reference catches load errors the same way, train.py:473-475)
            logger.warning("checkpoint restore failed (%s); starting fresh", e)
            return False
        if restored is None:
            return False
        control, opt_state, meta = restored
        if self.mesh is not None:
            # re-place restored state on the mesh (restore lands host-local
            # and FULL on every process); shardings are read off the live
            # pre-restore state trees. make_array_from_callback assembles
            # each rank's addressable shards from its own full host copy —
            # a plain device_put here needs a cross-host transfer, which the
            # CPU backend refuses (caught by tests/test_multiprocess.py)
            def _place(x, ref):
                if isinstance(x, jax.Array) and not x.is_fully_addressable:
                    # orbax restored straight to the template's global
                    # sharding (multi-process restore path) — nothing to do
                    return x
                arr = np.asarray(x)
                return jax.make_array_from_callback(
                    arr.shape, ref.sharding, lambda idx: arr[idx])
            control = jax.tree.map(_place, control, self.state.control)
            opt_state = jax.tree.map(_place, opt_state,
                                     self.state.opt_state)
        self.state = TrainState(control=control, opt_state=opt_state,
                                step=jnp.asarray(meta["step"], jnp.int32))
        self.global_step = int(meta["step"])
        logger.info("resumed from step %d", self.global_step)
        return True

    # ------------------------------------------------------------ one step

    def prepare_batch(self, batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        text = self.encode_text(batch["descriptions"])
        latents = self.encode_images(np.asarray(batch["pixel_values"]))
        cond_px = np.asarray(batch["condition_pixels"])
        multi = cond_px.ndim == 5
        if multi:
            cond_lat = jnp.stack([self.encode_images(cond_px[k])
                                  for k in range(cond_px.shape[0])])
            cond_pooled = jnp.stack(
                [self.encode_text([t] * latents.shape[0])["pooled"]
                 for t in batch["condition_types"]])
        else:
            cond_lat = self.encode_images(cond_px)
            cond_pooled = self.encode_text(batch["task_names"])["pooled"]
        return dict(latents=latents, condition_latents=cond_lat,
                    prompt_embeds=text["prompt_embeds"], pooled=text["pooled"],
                    condition_pooled=cond_pooled)

    def _global_batch(self, device_batch: Dict[str, jnp.ndarray]
                      ) -> Dict[str, jnp.ndarray]:
        """Assemble per-process encoder outputs into GLOBAL arrays sharded
        over the 'data' mesh axis (the make_array_from_process_local_data
        step the reference delegates to the DeepSpeed dataloader). The batch
        axis of multi-condition arrays [K, B, ...] is axis 1."""
        if self.mesh is None:
            return device_batch
        from jax.sharding import NamedSharding, PartitionSpec as P
        multi = device_batch["condition_latents"].ndim == 5
        out = {}
        for k, v in device_batch.items():
            arr = np.asarray(v)
            lead = 1 if (multi and k.startswith("condition_")) else 0
            spec = [None] * arr.ndim
            spec[lead] = "data"
            out[k] = jax.make_array_from_process_local_data(
                NamedSharding(self.mesh, P(*spec)), arr)
        return out

    def step(self, batch: Dict[str, Any]) -> Dict[str, float]:
        import contextlib
        device_batch = self._global_batch(self.prepare_batch(batch))
        self._rng, step_rng = jax.random.split(self._rng)
        # a mesh with sequence>1 activates sequence parallelism for the
        # step's attention calls (parallel/sp; no-op when sequence == 1);
        # backend = ulysses unless UNIGEN_SP_IMPL=ring
        ctx = contextlib.nullcontext()
        if self.mesh is not None:
            from unigen_tpu.parallel import sp
            ctx = sp.sequence_sharding(self.mesh)
        with ctx:
            self.state, metrics = self._step_fn(self.state, self.base_params,
                                                device_batch, step_rng)
        self.global_step += 1
        return metrics

    # ------------------------------------------------------------ loop

    def train(self, batches: Iterable[Dict[str, Any]],
              log_every: int = 10) -> Dict[str, float]:
        from unigen_tpu.observability import log_step_metrics
        last = {}
        t0 = time.time()
        for batch in batches:
            metrics = self.step(batch)
            if self.global_step % log_every == 0:
                last = {k: float(np.asarray(v)) for k, v in metrics.items()
                        if np.asarray(v).ndim == 0}
                last["s_per_it"] = (time.time() - t0) / log_every
                log_step_metrics(logger, self.global_step, metrics)
                t0 = time.time()
            if (self.work_dir and self.tcfg.checkpointing_steps
                    and self.global_step % self.tcfg.checkpointing_steps == 0):
                self.save()
            if self.global_step >= self.tcfg.max_train_steps:
                break
        if self.work_dir:
            self.save()
        return last

    def save(self) -> None:
        # collective: orbax multihost saves need EVERY rank (each writes its
        # addressable shards) — an early non-zero-rank return deadlocks or
        # drops shards in a real multi-process job (caught by
        # tests/test_multiprocess.py); the torch-format adapter export below
        # stays rank-0-only (adapter factors ride replicated)
        ckpt_lib.save_train_state(self.work_dir, self.global_step,
                                  self.state.control, self.state.opt_state)
        if jax.process_index() != 0:
            return
        if self.tcfg.lora_rank > 0:
            # LoRA mode: state.control IS the adapter dict — also export it
            # in the reference per-adapter layout every checkpoint
            # (hook.py:29-45 save_model_hook -> FluxPipeline.save_lora_weights
            # into {dir}/{adapter_name}/), so the artifact is loadable by
            # load_lora_adapters / the reference pipeline at any point
            from unigen_tpu.io.torch_bridge import \
                export_lora_adapters_reference
            out = os.path.join(self.work_dir, "lora_adapters")
            export_lora_adapters_reference(
                {self.tcfg.lora_adapter_name: self.state.control}, out)
            logger.info("exported LoRA adapter '%s' to %s",
                        self.tcfg.lora_adapter_name, out)
        logger.info("saved checkpoint at step %d", self.global_step)
