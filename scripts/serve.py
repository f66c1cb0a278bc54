#!/usr/bin/env python
"""Serving entry point: micro-batched UniGen image generation.

Wraps the family pipeline (--family flux|sd3|sana; or a random tiny flux
model when no checkpoint is given) in serving.MicroBatchServer at the
throughput-optimal batch (v5e: 8 -> 1.308 img/s/chip at 512^2, bench.py).
Requests arrive as JSON lines on stdin, images leave as PNGs:

  {"prompt": "a cat", "condition": "canny", "control": "path/in.png",
   "out": "path/out.png"}

Under --step-server, {"cancel": "path/out.png"} abandons that in-flight
request (its slot stops consuming step compute at the next tick).

The reference ships only a dataset-loop infer script (infer.py:115-219);
this is the deployment-shaped equivalent for a TPU serving box. Demo mode:

  python scripts/serve.py --demo         # tiny random model, synthetic load
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _demo_steps(batch_size: int, cache_k: int = 1, cache_order: int = 0,
                cache_c: int = 1, res_bits: int = 16,
                thr_m: float = 0.0, thr_c: float = 0.0,
                adaptive_lag: int = 0):
    """Tiny random-model StepServer demo (CPU-safe): full request lifecycle
    — VAE encode on admit, per-slot denoise ticks, VAE decode on retire —
    with staggered arrivals, optionally at a model-cache operating point."""
    import jax
    jax.config.update("jax_platforms", os.environ.get("UNIGEN_SERVE_PLATFORM",
                                                      "cpu"))
    import jax.numpy as jnp
    from unigen_tpu import config as cfg_lib
    from unigen_tpu.models import vae as vae_lib
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.serving_steps import StepServer

    cfg = cfg_lib.UniGenConfig(
        family="flux", flux=cfg_lib.tiny_flux_config(),
        condition_types=("canny",),
        control=cfg_lib.ControlConfig(
            moe=cfg_lib.MoEConfig(batch_mode="per_sample")))
    params = init_unigen_flux_params(jax.random.PRNGKey(0), cfg)
    vae_cfg = vae_lib.tiny_vae_config(
        latent_channels=cfg.flux.in_channels // 4)
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), vae_cfg)
    srv = StepServer(cfg, params, vae_cfg, vae_params,
                     batch_size=batch_size, num_inference_steps=4,
                     height=32, width=32, model_cache_interval=cache_k,
                     model_cache_order=cache_order,
                     control_cache_interval=cache_c,
                     model_cache_threshold=thr_m,
                     control_cache_threshold=thr_c,
                     adaptive_lag=adaptive_lag,
                     residual_cache_bits=res_bits, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    mk = lambda *shape: rng.standard_normal(shape).astype(np.float32)
    bb = cfg.flux
    n_req = 2 * batch_size + 1
    t0 = time.time()
    # mixed per-request knobs: one server serves different step counts and
    # keep-windows concurrently (serving_steps.StepServer.submit)
    per_req = [dict(num_inference_steps=3 + (i % 3),
                    control_guidance_end=1.0 - 0.2 * (i % 2))
               for i in range(n_req)]
    futs = [srv.submit(prompt_embeds=mk(1, 16, bb.joint_attention_dim),
                       pooled=mk(1, bb.pooled_projection_dim),
                       cond_pooled=mk(1, bb.pooled_projection_dim),
                       control_pixels=mk(1, 3, 32, 32), wait=True, **k)
            for k in per_req]
    outs = [f.result(timeout=600) for f in futs]
    dt = time.time() - t0
    st = srv.stats()
    srv.close()
    print(f"step-server demo: {n_req} requests in {dt:.2f}s "
          f"({n_req/dt:.1f} req/s, {batch_size} slots, "
          f"model_cache_interval={cache_k}, mixed per-request steps 3-5); "
          f"out shape {outs[0].shape}; stats {json.dumps(st)}")


def _demo(batch_size: int):
    import jax
    jax.config.update("jax_platforms", os.environ.get("UNIGEN_SERVE_PLATFORM",
                                                      "cpu"))
    import jax.numpy as jnp
    from unigen_tpu import config as cfg_lib
    from unigen_tpu.models.unigen_flux import (init_unigen_flux_params,
                                               unigen_flux_forward)
    from unigen_tpu.ops.packing import prepare_latent_image_ids
    from unigen_tpu.serving import MicroBatchServer

    cfg = cfg_lib.UniGenConfig(family="flux", flux=cfg_lib.tiny_flux_config(),
                               condition_types=("canny",))
    params = init_unigen_flux_params(jax.random.PRNGKey(0), cfg)
    bb = cfg.flux
    hw, t = 8, 16
    s = hw * hw
    ids = prepare_latent_image_ids(hw, hw)
    tids = jnp.zeros((t, 3))

    @jax.jit
    def program(hidden, condition, encoder, pooled, cond_pooled):
        pred, _, _ = unigen_flux_forward(
            params, cfg, hidden=hidden, condition=condition, encoder=encoder,
            pooled=pooled, condition_pooled=cond_pooled,
            timestep=jnp.full((hidden.shape[0],), 0.5),
            img_ids=ids, txt_ids=tids, condition_ids=ids)
        return pred

    srv = MicroBatchServer(
        lambda inputs: program(**{k: jnp.asarray(v) for k, v in inputs.items()}),
        batch_size=batch_size, max_wait_ms=25)

    rng = np.random.default_rng(0)
    mk = lambda *shape: rng.standard_normal(shape).astype(np.float32)
    n_req = 3 * batch_size + 1
    t0 = time.time()
    futs = [srv.submit(hidden=mk(1, s, bb.in_channels),
                       condition=mk(1, s, bb.in_channels),
                       encoder=mk(1, t, bb.joint_attention_dim),
                       pooled=mk(1, bb.pooled_projection_dim),
                       cond_pooled=mk(1, bb.pooled_projection_dim))
            for _ in range(n_req)]
    outs = [f.result(timeout=600) for f in futs]
    dt = time.time() - t0
    srv.close()
    print(f"demo: {n_req} requests in {dt:.2f}s "
          f"({n_req/dt:.1f} req/s), {srv.stats.batches} batches, "
          f"{srv.stats.padded_samples} padded samples; "
          f"out shape {outs[0].shape}")


def _serve_steps(pipe, args, mesh=None):
    """Checkpoint-backed StepServer loop: same stdin JSON-lines protocol as
    the request-batched path, but each request is admitted into a free slot
    the moment one exists (blocking submit keeps occupancy at the slot
    count under load)."""
    from PIL import Image

    from unigen_tpu import config as C
    from unigen_tpu.serving_steps import AdmissionRejected, StepServer

    # StepServer requires row-independent routing; retrace-only change
    cfg = C.replace(pipe.cfg, control=C.replace(
        pipe.cfg.control, moe=C.replace(pipe.cfg.control.moe,
                                        batch_mode="per_sample")))
    kw = {}
    if cfg.family == "sana":
        kw = dict(ae_encode=pipe.ae_encode, ae_decode=pipe.ae_decode,
                  ae_downscale=pipe.ae_downscale)
    else:
        kw = dict(vae_cfg=pipe.vae_cfg, vae_params=pipe.vae_params)
    if cfg.family == "sd3" and args.guidance_scale is not None:
        kw["guidance_scale"] = args.guidance_scale
    elif cfg.family == "sd3":
        kw["guidance_scale"] = 7.0       # the sd3 pipeline default
    common = dict(batch_size=args.batch_size,
                  num_inference_steps=args.steps,
                  scheduler=pipe.scheduler,
                  model_cache_interval=args.model_cache_interval,
                  model_cache_order=args.model_cache_order,
                  control_cache_interval=args.control_cache_interval,
                  model_cache_threshold=args.model_cache_threshold,
                  control_cache_threshold=args.control_cache_threshold,
                  adaptive_lag=args.adaptive_lag,
                  residual_cache_bits=args.residual_cache_bits,
                  max_waiters=args.max_waiters,
                  multi_tick=args.multi_tick,
                  mesh=mesh, **kw)
    if args.resolutions:
        # mixed-resolution serving: one shared weight tree, a StepServer
        # bucket per resolution; per-request routing below by the JSON
        # "resolution" key (default --resolution)
        from unigen_tpu.serving_steps import MultiResolutionStepServer
        buckets = {}
        for part in args.resolutions.split(","):
            r, _, s = part.partition(":")
            buckets[int(r)] = dict(batch_size=int(s)) if s else {}
        if args.resolution not in buckets:
            buckets[args.resolution] = {}
        srv = MultiResolutionStepServer(cfg, pipe.params, buckets=buckets,
                                        **common)
    else:
        srv = StepServer(cfg, pipe.params,
                         height=args.resolution, width=args.resolution,
                         **common)
    if args.warmup:
        # pre-compile the whole program ladder before reading stdin: the
        # deployment text length comes from encoding a dummy prompt through
        # the same padded encode path real requests use
        t0 = time.time()
        we = pipe.encode_prompt("warmup")[0]
        t_len = we.shape[2] if cfg.family == "sd3" and we.ndim == 4 \
            else we.shape[1]
        n = srv.warmup(int(t_len))
        print(f"# warmup: {n} synthetic requests (t_len={t_len}) in "
              f"{time.time()-t0:.1f}s", file=sys.stderr)
    print(f"# step-server ready: slots={args.batch_size} steps={args.steps} "
          f"res={args.resolution} quant={args.quant} "
          f"model_cache_interval={args.model_cache_interval} "
          f"control_cache_interval={args.control_cache_interval}; "
          f"JSON lines on stdin", file=sys.stderr)
    res = args.resolution

    import itertools as _it
    _done_seq = _it.count(1)

    def _save(out_path):
        def cb(fut):
            if fut.cancelled() or fut.exception() is not None:
                print(f"# {out_path}: "
                      f"{'cancelled' if fut.cancelled() else fut.exception()}",
                      file=sys.stderr)
                return
            Image.fromarray(fut.result()[0]).save(out_path)
            print(out_path, flush=True)
            # live observability: periodic counter/latency/throughput
            # snapshot to stderr every N completed requests
            if args.stats_every and next(_done_seq) % args.stats_every == 0:
                print(f"# stats: {json.dumps(srv.stats())}", file=sys.stderr)
        return cb

    pending = {}                  # out path -> in-flight Future
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        req = json.loads(line)
        if "cancel" in req:
            # {"cancel": "<out path>"}: abandon an in-flight request — its
            # slot stops consuming step compute at the next tick boundary
            # (StepServer sweeps cancelled futures). Best-effort: a request
            # whose image already landed refuses the cancel.
            f = pending.get(req["cancel"])
            ok = bool(f is not None and f.cancel())
            print(f"# cancel {req['cancel']}: "
                  f"{'ok' if ok else 'not pending'}", file=sys.stderr)
            continue
        # per-request resolution (multi-resolution server: the router picks
        # the bucket from the control image's [..., H, W] shape)
        r = int(req.get("resolution", res))
        pil = Image.open(req["control"]).convert("RGB").resize(
            (r, r), Image.LANCZOS)
        img = (np.asarray(pil, np.float32) / 127.5 - 1.0
               ).transpose(2, 0, 1)[None]
        cond_name = req.get("condition", args.condition_types[0])
        extra = {}
        if cfg.family == "sana":
            embeds, mask = pipe.encode_prompt(req["prompt"])
            pooled = pipe.encode_pooled(req["prompt"])
            cond_pooled = pipe.encode_pooled(cond_name)
            extra["prompt_mask"] = np.asarray(mask)
        else:
            embeds, pooled = pipe.encode_prompt(req["prompt"])
            cond_pooled = pipe.encode_condition_prompt(cond_name)
            if cfg.family == "sd3" and req.get("negative"):
                neg_e, neg_p = pipe.encode_prompt(req["negative"])
                extra["neg_embeds"] = np.asarray(neg_e)
                extra["neg_pooled"] = np.asarray(neg_p)
        # per-request knobs (serving_steps.StepServer.submit): the server
        # freely mixes step counts / guidance / keep-windows across slots
        for json_key, kw_key in (("steps", "num_inference_steps"),
                                 ("guidance", "guidance_scale"),
                                 ("control_start", "control_guidance_start"),
                                 ("control_end", "control_guidance_end"),
                                 ("conditioning_scale", "conditioning_scale"),
                                 ("priority", "priority"),
                                 ("timeout", "timeout"),
                                 ("seed", "seed")):
            if json_key in req:
                extra[kw_key] = req[json_key]
        try:
            fut = srv.submit(prompt_embeds=np.asarray(embeds),
                             pooled=np.asarray(pooled),
                             cond_pooled=np.asarray(cond_pooled),
                             control_pixels=img, wait=True, **extra)
        except (TimeoutError, AdmissionRejected) as e:
            # admission timeout / backpressure rejection: shed this request
            # and keep serving (the caller sees the reason on stderr).
            # Other RuntimeErrors (server closed, internal faults) surface.
            print(f"# {req['out']}: rejected ({e})", file=sys.stderr)
            continue
        pending[req["out"]] = fut
        fut.add_done_callback(_save(req["out"]))
        fut.add_done_callback(lambda _f, k=req["out"]: pending.pop(k, None))
    srv.drain()
    st = srv.stats()
    srv.close()
    print(f"# step-server stats: {json.dumps(st)}", file=sys.stderr)


def main(argv=None):
    # honor JAX_PLATFORMS / UNIGEN_SERVE_PLATFORM before any backend touch —
    # on the deployment image the env var alone does NOT steer JAX (a TPU
    # plugin is force-registered via sitecustomize), so without this the
    # checkpoint path silently serves on the TPU even when the caller asked
    # for CPU (the demo paths already force it per-function)
    want = os.environ.get("UNIGEN_SERVE_PLATFORM",
                          os.environ.get("JAX_PLATFORMS", "")).strip()
    if want:
        import jax
        jax.config.update("jax_platforms", want)
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="diffusers checkpoint dir (family layout)")
    ap.add_argument("--family", default="flux", choices=["flux", "sd3", "sana"],
                    help="model family served from --ckpt (flux: FLUX.1 "
                         "layout; sd3: SD3.5 triple-encoder layout; sana: "
                         "SANA layout with Gemma-2 text encoder + native "
                         "DC-AE — see pipelines/loading.py)")
    ap.add_argument("--clip-dir", default=None,
                    help="sana only: CLIP-L dir for the pooled prompt/"
                         "condition stream")
    ap.add_argument("--guidance-scale", type=float, default=None,
                    help="override the family's default guidance scale "
                         "(flux embedded guidance / sd3 CFG; sana has none)")
    ap.add_argument("--adapter", help="UniGen adapter dir")
    ap.add_argument("--condition-types", nargs="+", default=["canny"])
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--batch-sizes", type=int, nargs="+", default=None,
                    help="program-size ladder (e.g. 1 2 8): each dispatch "
                         "runs the smallest compiled batch that fits, so low "
                         "load stops paying max-batch pad compute")
    ap.add_argument("--lora-dir", default=None,
                    help="per-condition LoRA experts (reference per-adapter "
                         "layout); switched by condition type")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--control-cache-interval", type=int, default=1,
                    help="recompute the control branch every k-th denoise "
                         "step, replay cached residual adds in between "
                         "(serving approximation; measure fidelity first — "
                         "see bench.py UNIGEN_BENCH_CACHE / CACHE.json)")
    ap.add_argument("--control-cache-threshold", type=float, default=0.0,
                    help="adaptive variant: refresh the control cache when "
                         "the latent drifts more than this relative L1 "
                         "since the last refresh (overrides the fixed "
                         "interval; pipelines/caching.py)")
    ap.add_argument("--model-cache-interval", type=int, default=1,
                    help="FULL-MODEL output caching: replay steps skip the "
                         "entire transformer and reuse the cached "
                         "prediction (most aggressive cache rung). Combined "
                         "with a LARGER --control-cache-interval it divides, "
                         "selects the HYBRID three-level cache (SERVING.md "
                         "rung 3c)")
    ap.add_argument("--model-cache-threshold", type=float, default=0.0,
                    help="adaptive variant of --model-cache-interval")
    ap.add_argument("--adaptive-lag", type=int, default=0, choices=[0, 1],
                    help="step-server adaptive modes only: 1 = pipelined "
                         "drift decisions (one tick stale — the per-tick "
                         "drift pull no longer serializes ticks; "
                         "serving_steps.StepServer docstring)")
    ap.add_argument("--model-cache-order", type=int, default=0,
                    choices=[0, 1],
                    help="0 = zero-order hold, 1 = first-order Taylor "
                         "extrapolation from the two most recent refreshes")
    ap.add_argument("--residual-cache-bits", type=int, default=16,
                    choices=[4, 8, 16],
                    help="8 stores the control-residual cache int8 with "
                         "per-token scales (HALF the cache HBM — the "
                         "step-server slot-count lever at 1024²); 4 packs "
                         "int4 nibbles (QUARTER); requires a control-cache "
                         "or hybrid mode")
    ap.add_argument("--quality-profile", default=None,
                    choices=["exact", "balanced", "fast"],
                    help="measured serving operating point (SERVING.md): "
                         "exact = no caching; balanced = hybrid three-level "
                         "cache; fast = full-model cache. Mutually exclusive "
                         "with the raw cache knobs")
    ap.add_argument("--prompt-cache", type=int, default=32,
                    help="LRU size for prompt/condition embeddings (0 "
                         "disables; serving repeats the negative prompt and "
                         "condition task name every request — each flux "
                         "repeat otherwise costs a full T5-XXL forward)")
    ap.add_argument("--mesh-data", type=int, default=1,
                    help="multi-chip serving: data-parallel mesh axis "
                         "(batch shards; flux family)")
    ap.add_argument("--mesh-expert", type=int, default=1,
                    help="multi-chip serving: expert-parallel mesh axis")
    ap.add_argument("--mesh-model", type=int, default=1,
                    help="multi-chip serving: tensor-parallel mesh axis; "
                         "the serving tree (incl. quantized leaves) shards "
                         "by parallel/sharding.py rules and GSPMD partitions "
                         "the denoise program over ICI")
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--quant", default="w4a8", choices=["w4a8", "w8a8", "bf16"])
    ap.add_argument("--quant-text", default=None, choices=["w8a8", "w4a8"],
                    help="serving quantization for the prompt-encoder towers "
                         "(T5/CLIP/Gemma; ops/quant.quantize_text_tower). "
                         "bf16 T5-XXL alone is ~9.4 GiB — this is what makes "
                         "the full flux prompt->image stack single-chip "
                         "resident. Default keeps the load dtype")
    ap.add_argument("--serving-cache", default=None,
                    help="directory for the persisted QUANTIZED transformer "
                         "tree (io/serving_cache.py): restarts read the "
                         "small quantized tree directly instead of the bf16 "
                         "checkpoint + streaming quantization; written on "
                         "first start when missing")
    ap.add_argument("--step-server", action="store_true",
                    help="step-level continuous batching (serving_steps."
                         "StepServer), all three families: requests join "
                         "mid-denoise at their own step index — admission "
                         "latency bounded by ONE step; sd3 slots carry the "
                         "CFG pair (JSON key 'negative' sets the negative "
                         "prompt). Supports --model-cache-interval/-order, "
                         "--control-cache-interval (per-slot schedules), "
                         "--quality-profile (fixed-interval operating "
                         "points), and the adaptive --*-cache-threshold "
                         "knobs (per-slot drift-triggered refresh)")
    ap.add_argument("--resolutions", default=None,
                    help="step-server only: comma-separated 'res[:slots]' "
                         "list (e.g. '512:4,1024:2') — serve MIXED "
                         "resolutions from ONE weight tree, a StepServer "
                         "bucket per resolution (serving_steps."
                         "MultiResolutionStepServer); requests route by the "
                         "JSON 'resolution' key (default --resolution). "
                         "Unlisted knobs are shared; per-bucket ':slots' "
                         "overrides --batch-size (fewer, bigger slots at "
                         "high resolutions)")
    ap.add_argument("--stats-every", type=int, default=0,
                    help="step-server: print a stats() snapshot to stderr "
                         "every N completed requests (0 = only at drain)")
    ap.add_argument("--max-waiters", type=int, default=None,
                    help="step-server backpressure: reject wait=True "
                         "admissions beyond this many queued waiters "
                         "(stats()['rejected']); default unbounded")
    ap.add_argument("--multi-tick", type=int, default=1,
                    help="step-server, exact schedule only: fuse up to K "
                         "consecutive ticks into one device program when "
                         "every slot is busy (lax.scan window; never "
                         "crosses a retirement, so admission latency is "
                         "unchanged) - sustained throughput stops "
                         "depending on host scheduling jitter; "
                         "incompatible with cache/adaptive knobs")
    ap.add_argument("--warmup", action="store_true",
                    help="step-server only: pre-compile the whole gathered-"
                         "program ladder with synthetic requests before "
                         "reading stdin (StepServer.warmup) — otherwise the "
                         "first real requests pay the compiles inside their "
                         "latency")
    ap.add_argument("--demo", action="store_true",
                    help="tiny random model + synthetic load (no checkpoint)")
    args = ap.parse_args(argv)

    if args.adaptive_lag and not (args.step_server and (
            args.model_cache_threshold > 0 or args.control_cache_threshold > 0)):
        ap.error("--adaptive-lag 1 needs --step-server with an adaptive "
                 "--*-cache-threshold (it pipelines the per-tick drift "
                 "decision; one-shot pipelines trace the drift rule inside "
                 "the scan and have no host sync to hide)")

    if args.step_server and args.quality_profile:
        # resolve the named operating point to the family's fixed per-slot
        # intervals (every PROFILE_TABLES entry is fixed-interval, so the
        # same measured points serve both serving modes); mixing the profile
        # with raw knobs is rejected inside quality_profile_knobs
        from unigen_tpu.pipelines import caching
        knobs = caching.quality_profile_knobs(
            args.quality_profile, caching.PROFILE_TABLES[args.family],
            dict(control_cache_interval=args.control_cache_interval,
                 model_cache_interval=args.model_cache_interval,
                 model_cache_order=args.model_cache_order,
                 control_cache_threshold=args.control_cache_threshold,
                 model_cache_threshold=args.model_cache_threshold,
                 residual_cache_bits=(args.residual_cache_bits
                                      if args.residual_cache_bits != 16
                                      else 0)),
            # schedule-aware selection: without this, "fast" on the default
            # 4-step schedule resolves to the sub-0.99-SSIM operating point
            # the min_steps gate exists to block
            num_steps=args.steps)
        args.control_cache_interval = knobs.get(
            "control_cache_interval", args.control_cache_interval)
        args.model_cache_interval = knobs.get(
            "model_cache_interval", args.model_cache_interval)
        args.model_cache_order = knobs.get(
            "model_cache_order", args.model_cache_order)
        args.residual_cache_bits = knobs.get(
            "residual_cache_bits", args.residual_cache_bits)
        print(f"# quality-profile {args.quality_profile} -> per-slot "
              f"control_cache_interval={args.control_cache_interval} "
              f"model_cache_interval={args.model_cache_interval} "
              f"model_cache_order={args.model_cache_order} "
              f"residual_cache_bits={args.residual_cache_bits}",
              file=sys.stderr)
        args.quality_profile = None      # consumed: StepServer takes knobs
    if args.multi_tick > 1:
        # validate BEFORE model load (the StepServer constructor assertion
        # would otherwise fire after minutes of quantized-tree init); note
        # the check runs after profile resolution so a cache-mapping
        # --quality-profile is caught too
        if not args.step_server:
            ap.error("--multi-tick is wired for --step-server")
        if (args.model_cache_interval > 1 or args.control_cache_interval > 1
                or args.model_cache_threshold > 0
                or args.control_cache_threshold > 0):
            ap.error("--multi-tick fuses EXACT ticks only; drop the "
                     "cache/adaptive knobs (or a --quality-profile that "
                     "maps to them)")
    if args.warmup and not args.step_server:
        ap.error("--warmup is wired for --step-server (the request-batched "
                 "server compiles each ladder size lazily on first use)")
    if args.resolutions and not args.step_server:
        ap.error("--resolutions (mixed-resolution buckets) is wired for "
                 "--step-server; the request-batched server is single-"
                 "resolution (--resolution)")
    if args.demo or not args.ckpt:
        if args.step_server:
            return _demo_steps(args.batch_size, args.model_cache_interval,
                               args.model_cache_order,
                               args.control_cache_interval,
                               args.residual_cache_bits,
                               args.model_cache_threshold,
                               args.control_cache_threshold,
                               args.adaptive_lag)
        return _demo(args.batch_size)

    from PIL import Image

    from unigen_tpu.pipelines.loading import (load_flux_pipeline,
                                              load_sana_pipeline,
                                              load_sd3_pipeline)
    from unigen_tpu.serving import MicroBatchServer

    fam = args.family
    if fam != "flux":
        for flag, name in ((args.lora_dir, "--lora-dir"),
                           (args.serving_cache, "--serving-cache")):
            if flag:
                ap.error(f"{name} is wired for the flux family")
    if fam == "flux":
        pipe = load_flux_pipeline(args.ckpt,
                                  condition_types=args.condition_types,
                                  adapter_dir=args.adapter,
                                  quantize=args.quant,
                                  quantize_text=args.quant_text,
                                  lora_dir=args.lora_dir,
                                  serving_cache=args.serving_cache)
    elif fam == "sd3":
        pipe = load_sd3_pipeline(
            args.ckpt, condition_types=args.condition_types,
            adapter_dir=args.adapter,
            quantize=None if args.quant == "bf16" else args.quant,
            quantize_text=args.quant_text)
    else:
        pipe = load_sana_pipeline(
            args.ckpt, condition_types=args.condition_types,
            adapter_dir=args.adapter,
            quantize=None if args.quant == "bf16" else args.quant,
            quantize_text=args.quant_text,
            clip_dir=args.clip_dir)
    mesh = None
    if args.mesh_data * args.mesh_expert * args.mesh_model > 1:
        if fam == "sana" and not args.step_server:
            ap.error("--mesh-* request-batched serving is wired for the flux "
                     "and sd3 families (the SANA DC-AE codec rides in "
                     "closures; shard() would not re-place it) — sana "
                     "multi-chip serving goes through --step-server, which "
                     "places the tree itself and runs the codec as separate "
                     "single-chip programs")
        from unigen_tpu import config as cfg_lib
        from unigen_tpu.parallel.mesh import build_mesh
        mesh = build_mesh(cfg_lib.MeshConfig(
            data=args.mesh_data, expert=args.mesh_expert,
            sequence=1, model=args.mesh_model))
        if args.step_server:
            # StepServer shards its own tree (mesh= below) — don't
            # double-place through pipe.shard
            print(f"# sharded step-server: mesh {dict(mesh.shape)}",
                  file=sys.stderr)
        else:
            pipe.shard(mesh)
            print(f"# sharded serving: mesh {dict(mesh.shape)}",
                  file=sys.stderr)
    if args.prompt_cache > 0:
        from unigen_tpu.pipelines.caching import PromptLRU
        pipe.prompt_cache_size = args.prompt_cache
        pipe._prompt_cache = PromptLRU(args.prompt_cache)
    if args.lora_dir and args.condition_types:
        pipe._auto_switch(args.condition_types[0])

    if args.step_server:
        return _serve_steps(pipe, args, mesh=mesh)

    def run_batch(inputs):
        kw = dict(height=args.resolution, width=args.resolution,
                  num_inference_steps=args.steps,
                  control_cache_interval=args.control_cache_interval,
                  control_cache_threshold=args.control_cache_threshold,
                  model_cache_interval=args.model_cache_interval,
                  model_cache_threshold=args.model_cache_threshold,
                  model_cache_order=args.model_cache_order,
                  residual_cache_bits=args.residual_cache_bits,
                  quality_profile=args.quality_profile)
        if fam != "sana" and args.guidance_scale is not None:
            kw["guidance_scale"] = args.guidance_scale
        if fam == "sana":
            kw["prompt_mask"] = inputs["prompt_mask"]
        return pipe.generate(
            prompt_embeds=inputs["prompt_embeds"], pooled=inputs["pooled"],
            cond_pooled=inputs["cond_pooled"],
            control_pixels=inputs["control_pixels"], **kw)

    srv = MicroBatchServer(run_batch, batch_size=args.batch_size,
                           batch_sizes=args.batch_sizes)
    print(f"# serving ready: family={fam} batch={args.batch_size} "
          f"steps={args.steps} res={args.resolution} quant={args.quant}; "
          f"JSON lines on stdin", file=sys.stderr)
    def _save(out_path):
        def cb(fut):
            if fut.cancelled() or fut.exception() is not None:
                print(f"# {out_path}: "
                      f"{'cancelled' if fut.cancelled() else fut.exception()}",
                      file=sys.stderr)
                return
            Image.fromarray(fut.result()[0]).save(out_path)
            print(out_path, flush=True)
        return cb

    pending = []
    res = args.resolution
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        req = json.loads(line)
        # every control image is resized to the server's fixed resolution:
        # the compiled program (and the micro-batch concat) is shape-static
        pil = Image.open(req["control"]).convert("RGB").resize(
            (res, res), Image.LANCZOS)
        img = (np.asarray(pil, np.float32) / 127.5 - 1.0).transpose(2, 0, 1)[None]
        cond_name = req.get("condition", args.condition_types[0])
        extra = {}
        if fam == "sana":
            # Gemma-2 context + CLIP pooled streams (pipelines/sana.py)
            embeds, mask = pipe.encode_prompt(req["prompt"])
            pooled = pipe.encode_pooled(req["prompt"])
            cond_pooled = pipe.encode_pooled(cond_name)
            extra["prompt_mask"] = np.asarray(mask)
        else:
            embeds, pooled = pipe.encode_prompt(req["prompt"])
            cond_pooled = pipe.encode_condition_prompt(cond_name)
        fut = srv.submit(prompt_embeds=np.asarray(embeds),
                         pooled=np.asarray(pooled),
                         cond_pooled=np.asarray(cond_pooled),
                         control_pixels=img, **extra)
        fut.add_done_callback(_save(req["out"]))   # saves as batches finish
        pending.append(fut)
    srv.close()          # drains; callbacks have all fired by join()


if __name__ == "__main__":
    main()
