"""Benchmark: UniGenFlux single-condition 512x512 4-step denoise throughput on
one TPU chip (BASELINE.json config #1).

Default preset: ``flux_full`` — the REAL FLUX.1 topology (19 double /
38 single base blocks at width 3072, 9+19 control blocks, MoE + shared
expert; reference src/UniGenTransformer.py:744, infer.py:115-149), served
single-chip via W4A8 (int4 frozen base ~5.6 GiB) + W8A8 (adapter ~6.6 GiB):
12.1 GiB total against 15.7 GiB usable v5e HBM. bf16 full-topology needs
~35 GiB = the multi-chip path (parallel/).

Env knobs:
  UNIGEN_BENCH_PRESET   full (default) | proxy  (proxy = round-1's 6/12-depth
                        comparability preset, fits bf16 on one chip)
  UNIGEN_BENCH_QUANT    w4a8 | w8a8 | bf16  (default: full->w4a8, proxy->w8a8)
  UNIGEN_BENCH_INT8=0   legacy alias for UNIGEN_BENCH_QUANT=bf16
  UNIGEN_BENCH_RES      image resolution (default 512)
  UNIGEN_BENCH_BATCHES  comma list (default "2,4,8"; measured full-topology
                        1.185/1.371/1.360/1.309 img/s at b=1/2/4/8 after the
                        half-paired int4 layout change — b=2 is the knee,
                        b=1 latency 844 ms/image)
  UNIGEN_BENCH_CACHE_INTERVAL  >1 runs the headline (and sd3/sana family)
                        denoise with control-residual step caching at that
                        interval — opt-in approximate serving mode; the
                        default headline stays EXACT. Fidelity: CACHE.json
                        (cached-vs-exact) + measure_fidelity --cache-interval
                        (absolute vs bf16).
  UNIGEN_BENCH_HYBRID_CACHE=<c:m[,c2:m2]>  hybrid three-level cache rungs
                        (full / base-with-control-replay / prediction
                        replay — SERVING.md rung 3c): the flux sweep runs
                        bench_cache (CACHE.json hybrid_rows); the sd3/sana
                        family rungs take ONE pair.
  UNIGEN_BENCH_STEP_RESBITS=8  StepServer rungs only: store the per-slot
                        control-residual cache int8 with per-token scales
                        (ops/quant.quantize_residual) — half the cache HBM,
                        the slot-count lever at full topology / 1024².
  UNIGEN_BENCH_TRAIN_LORA=<rank>  with UNIGEN_BENCH_TRAIN=1: LoRA fine-tune
                        rung at full topology — rank-r factors over the
                        FROZEN W4A8 tree (TrainConfig.lora_rank; surface
                        ladder shrinks on OOM) -> TRAIN_LORA.json rows.
  UNIGEN_BENCH_STEP_MULTIRES=<res[:slots[:resbits]],...>  flux StepServer
                        rung only: MIXED-resolution serving — one weight
                        tree, a StepServer bucket per resolution
                        (MultiResolutionStepServer), saturating load fed
                        concurrently to every bucket; per-slot hybrid cache
                        from _STEP_CACHE/_STEP_HYBRID (defaults 2/4)
                        -> STEPSERVE_MULTIRES.json.
  UNIGEN_BENCH_STEP_ADAPTIVE=<tc:tm[:lag]>  flux StepServer rung only:
                        adaptive per-slot drift thresholds instead of fixed
                        intervals ("0.05:0.02" fully-adaptive hybrid,
                        ":0.02" adaptive model cache, "0.05:" adaptive
                        control cache; third field 1 = pipelined one-tick-
                        stale decisions) -> STEPSERVE_ADAPTIVE.json rows.

Output: one JSON line {"metric", "value", "unit", "vs_baseline", "config"}.
  value       — images/sec for the jitted 4-step denoise loop (text encode /
                VAE excluded; the transformer loop dominates end-to-end time).
  vs_baseline — measured / estimated reference throughput for the same
                compute on ONE A100-80GB: est_ref = A100_bf16_peak (312e12)
                * 0.35 assumed MFU / model_flops_per_image. The reference
                publishes no numbers (SURVEY.md §6), so the denominator is a
                principled roofline estimate, held constant across rounds.

Quantization fidelity (vs bf16, SAME weights/inputs, measured on-device;
FIDELITY.json, scripts/measure_fidelity.py): the full config is bracketed
on BOTH axes — the real-width 6/12-depth proxy gives e2e SSIM 0.99937
(W8A8) / 0.99901 (W4A8, per-forward rel err 1.97%), and the FULL-DEPTH
19/38 run at half width (--full-topology; full-depth bf16 at real width is
33 GiB and cannot fit the chip) gives 0.99959 (W8A8) / 0.99883 (W4A8,
rel err 3.29%) — depth compounds quantization error measurably but every
bracket point stays ABOVE the BASELINE SSIM>=0.99 parity gate, so the
quantized throughput is the legitimate headline number. Caveat: these SSIMs are RELATIVE fidelity on
randomly initialized weights (no released checkpoint is reachable in this
environment); real checkpoints typically carry outlier channels that
quantize worse, so the gate should be re-measured via
scripts/validate_real_ckpt.py the moment real weights are available.

Timing note: through the axon tunnel block_until_ready() can return before
device completion — every timed section syncs via a scalar host read.
"""

import json
import os
import sys
import time

import numpy as np


def model_flops_per_forward(cfg, s_img: int, s_txt: int, s_cond: int) -> float:
    """Dense matmul FLOPs of one UniGenFlux forward (2*m*n*k terms + attention)."""
    bb = cfg.flux
    d = bb.inner_dim
    s_all = s_img + s_txt

    def attn_flops(s_q, s_kv):
        return 2 * s_q * s_kv * d * 2  # qk^T + pv

    # per token: double block = qkv+o (4 d^2 MACs) + 2-linear 4x MLP (8 d^2 MACs)
    double = 2 * (4 * d * d) * s_all + 2 * (8 * d * d) * s_all + attn_flops(s_all, s_all)
    single = 2 * (3 * d * d + 4 * d * d + 5 * d * d) * s_all + attn_flops(s_all, s_all)
    total = (bb.num_layers * double + bb.num_single_layers * single
             + bb.num_layers * double  # control double applied per base block
             + bb.num_single_layers * single  # control single per base block
             )
    # MoE (capacity ~= tokens) + shared expert (2 double blocks over img+cond)
    total += 2 * (4 * d * d) * (s_img + s_cond) * 2  # modulated experts
    total += 2 * (2 * (4 * d * d) * (s_img + s_cond) * 3)  # shared-expert weave approx
    return float(total)


def sd3_flops_per_forward(cfg, s_img: int, s_txt: int) -> float:
    """Dense matmul FLOPs of one UniGenSD3 forward (base + interleaved
    control + MoE preprocess), one CFG branch."""
    bb = cfg.sd3
    d = bb.inner_dim
    s_all = s_img + s_txt

    def attn(sq, skv):
        return 2 * sq * skv * d * 2

    # joint block: per-token qkv/o (4d^2) + 4x FF (8d^2) + adaln (6d^2) on
    # BOTH streams, + joint attention
    joint = 2 * (18 * d * d) * s_all + attn(s_all, s_all)
    dual_extra = 2 * (7 * d * d) * s_img + attn(s_img, s_img)
    base = bb.num_layers * joint + len(bb.dual_attention_layers) * dual_extra
    control = bb.num_layers * joint          # one control block per base block
    moe = 2 * (2 * 13 * d * d) * (2 * s_img)  # expert single-block pairs
    shared = 2 * joint                        # 2-block weave approx
    return float(base + control + moe + shared)


def _parse_hybrid_env():
    """UNIGEN_BENCH_HYBRID_CACHE=<c:m> -> (c, m); (1, 1) when unset.
    Validates m > 1, c > m, m | c (the hybrid_cache_scan contract)."""
    spec = os.environ.get("UNIGEN_BENCH_HYBRID_CACHE", "")
    if not spec or "," in spec:            # families take ONE pair
        return 1, 1
    c, m = (int(x) for x in spec.split(":"))
    assert m > 1 and c > m and c % m == 0, \
        f"UNIGEN_BENCH_HYBRID_CACHE={spec}: need m>1, c>m, m|c"
    return c, m


def record_family_cache_rows(family, results, *, res, num_steps, config,
                             cache_k=1, model_k=1, cfg_cache=False,
                             model_order=0, hybrid=(1, 1)):
    """Merge measured family rungs (sd3/sana) into CACHE.json ``families``.

    Exact runs (no cache knob active) refresh ``ips_exact`` (canonical
    batch) / ``ips_exact_b{b}`` so later cached sweeps can compute
    speedups; cached runs land in typed row lists (control cache ->
    ``rows``, CFG delta cache -> ``cfg_rows``, full-model cache ->
    ``model_rows``, three-level hybrid -> ``hybrid_rows``) keyed by
    (interval, order, batch) so repeated sweeps merge instead of
    duplicating. ``results`` maps batch -> img/s."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "CACHE.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except Exception:
        doc = {}
    fam = doc.setdefault("families", {}).setdefault(family, {})
    fam.setdefault("config", config)
    fam["res"], fam["num_steps"] = res, num_steps
    for r in fam.get("rows", []):          # older rows predate the batch tag
        r.setdefault("batch", fam.get("batch"))

    def exact_ips(b):
        if fam.get("batch") == b:
            return fam.get("ips_exact")
        return fam.get(f"ips_exact_b{b}")

    if cache_k <= 1 and model_k <= 1 and not cfg_cache and hybrid[1] <= 1:
        for b, ips in results.items():
            if fam.get("batch") in (None, b):
                fam["batch"], fam["ips_exact"] = b, round(ips, 4)
            else:
                fam[f"ips_exact_b{b}"] = round(ips, 4)
    elif hybrid[1] > 1:
        c, m = hybrid
        keyed = {(r.get("control_interval"), r.get("model_interval"),
                  r.get("order", 0), r.get("batch")): r
                 for r in fam.get("hybrid_rows", [])}
        for b, ips in results.items():
            row = {"control_interval": c, "model_interval": m,
                   "batch": b, "ips": round(ips, 4)}
            if model_order:
                row["order"] = model_order
            base = exact_ips(b)
            if base:
                row["speedup"] = round(ips / base, 3)
            keyed[(c, m, row.get("order", 0), b)] = row
        fam["hybrid_rows"] = [keyed[k] for k in
                              sorted(keyed, key=lambda t: (t[0] or 0, t[1],
                                                           t[2], t[3] or 0))]
    else:
        kind = ("model_rows" if model_k > 1
                else "cfg_rows" if cfg_cache else "rows")
        interval = model_k if model_k > 1 else cache_k
        keyed = {(r.get("interval"), r.get("order", 0), r.get("batch")): r
                 for r in fam.get(kind, [])}
        for b, ips in results.items():
            row = {"interval": interval, "batch": b, "ips": round(ips, 4)}
            if model_k > 1 and model_order:
                row["order"] = model_order
            base = exact_ips(b)
            if base:
                row["speedup"] = round(ips / base, 3)
            keyed[(interval, row.get("order", 0), b)] = row
        fam[kind] = [keyed[k] for k in
                     sorted(keyed, key=lambda t: (t[0] or 0, t[1], t[2] or 0))]
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


def bench_sd3():
    """UNIGEN_BENCH_FAMILY=sd3: BASELINE config #2 — UniGenSD3 depth control
    on SD3.5-medium (24 joint blocks, dual-attn 0..12, width 1536), 512^2,
    28-step flow denoise WITH CFG (guidance 7.0 doubles the transformer
    batch per step, reference UniGenPipeline sd3 path). bf16 fits one v5e
    (~7 GiB base+adapter), so this measures the parity-grade dtype."""
    import gc

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/unigen_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from unigen_tpu import presets
    from unigen_tpu.models.unigen_sd3 import (init_unigen_sd3_params,
                                              unigen_sd3_forward)
    from unigen_tpu.ops.quant import quantized_bytes
    from unigen_tpu.pipelines import scheduling

    res = int(os.environ.get("UNIGEN_BENCH_RES", "512"))
    num_steps = 28
    t_len = 77 + 256                       # CLIP + T5 joint context
    lat = res // 8
    s_img = (lat // 2) ** 2                # patch 2
    batch_sizes = [int(x) for x in
                   os.environ.get("UNIGEN_BENCH_BATCHES", "1,2,4").split(",")]
    quant = os.environ.get("UNIGEN_BENCH_QUANT", "bf16")
    cache_k = int(os.environ.get("UNIGEN_BENCH_CACHE_INTERVAL", "1"))
    # UNIGEN_BENCH_CFG_CACHE=1 (+ cache interval >1): replay steps run only
    # the positive stream at half batch and reuse the cached guidance delta
    # (pipelines/sd3.py cfg_cache) — the uncond stream refreshes on the same
    # schedule as the control cache
    cfg_cache = (os.environ.get("UNIGEN_BENCH_CFG_CACHE", "0") == "1"
                 and cache_k > 1)
    # UNIGEN_BENCH_MODEL_CACHE_INTERVAL>1: FULL-MODEL output caching —
    # replay steps skip the entire transformer and reuse the cached guided
    # prediction (pipelines model_cache_*); the biggest lever on the 28-step
    # CFG denoise. Mutually exclusive with the control-cache knobs.
    model_k = int(os.environ.get("UNIGEN_BENCH_MODEL_CACHE_INTERVAL", "1"))
    if model_k > 1:
        assert cache_k <= 1 and not cfg_cache, \
            "model cache and control cache are mutually exclusive"
    # UNIGEN_BENCH_HYBRID_CACHE=<c:m>: three-level hybrid cache (full /
    # base-with-control-replay / prediction replay; SERVING.md rung 3c)
    hyb_c, hyb_m = _parse_hybrid_env()
    if hyb_m > 1:
        assert cache_k <= 1 and model_k <= 1 and not cfg_cache, \
            "hybrid cache excludes the other cache knobs"

    cfg = presets.sd35_medium()
    bb = cfg.sd3
    dtype = jnp.bfloat16

    def _init(k):
        p = init_unigen_sd3_params(k, cfg, dtype=dtype)
        if quant == "w8a8":
            from unigen_tpu.ops.quant import quantize_tree
            p = quantize_tree(p)
        elif quant == "w4a8":
            # serving split mirroring the flux policy: frozen base int4,
            # adapter int8 (SD3 control uses joint_blocks/add_blocks keys,
            # so quantize_unigen_serving's flux key map doesn't apply)
            from unigen_tpu.ops.quant import quantize_tree
            p = {"base": quantize_tree(p["base"], bits=4),
                 "control": quantize_tree(p["control"], bits=8)}
        return p

    t0 = time.time()
    if quant == "bf16":
        params = jax.jit(_init)(jax.random.PRNGKey(0))
    else:
        params = direct_quantized_init(jax.random.PRNGKey(0), _init)
    jax.block_until_ready(params)
    print(f"# sd3 init {time.time()-t0:.1f}s quant={quant} "
          f"resident={quantized_bytes(params)/2**30:.2f}GiB", file=sys.stderr)

    sigmas = np.asarray(scheduling.inference_sigmas(
        scheduling.FlowMatchConfig(shift=3.0), num_steps)[0])
    flops_image = sd3_flops_per_forward(cfg, s_img, t_len) * num_steps * 2
    est_ref = 312e12 * 0.35 / flops_image

    def measure(b: int) -> float:
        ks = jax.random.split(jax.random.PRNGKey(1), 6)
        prompt = jax.random.normal(ks[0], (2 * b, t_len, bb.joint_attention_dim), dtype)
        pooled = jax.random.normal(ks[1], (2 * b, bb.pooled_projection_dim), dtype)
        cond_pooled = jax.random.normal(ks[2], (2 * b, bb.pooled_projection_dim), dtype)
        condition = jax.random.normal(ks[3], (b, bb.in_channels, lat, lat), dtype)
        latents0 = jax.random.normal(ks[4], (b, bb.in_channels, lat, lat), dtype)
        guidance = 7.0

        def denoise(params, latents, condition, prompt, pooled, cond_pooled):
            sig = jnp.asarray(sigmas)
            cond2 = jnp.concatenate([condition, condition], 0)

            def fwd(lat, i, **kw):
                lat2 = jnp.concatenate([lat, lat], 0)
                t = jnp.full((2 * b,), sig[i] * 1000.0, dtype)
                pred, _, outs = unigen_sd3_forward(
                    params, cfg, hidden=lat2, condition=cond2,
                    encoder=prompt, pooled=pooled,
                    condition_pooled=cond_pooled, timestep=t,
                    attn_impl="auto", **kw)
                uncond, text = pred[:b], pred[b:]
                return uncond + guidance * (text - uncond), outs, text - uncond

            def fwd_pos(lat, i, res_pos):
                t = jnp.full((b,), sig[i] * 1000.0, dtype)
                pred, _, _ = unigen_sd3_forward(
                    params, cfg, hidden=lat, condition=condition,
                    encoder=prompt[b:], pooled=pooled[b:],
                    condition_pooled=cond_pooled[b:], timestep=t,
                    attn_impl="auto", control_residuals=res_pos)
                return pred

            if cache_k <= 1 and model_k <= 1 and hyb_m <= 1:
                def step(lat, i):
                    pred, _, _ = fwd(lat, i)
                    return scheduling.euler_step(lat, pred, sig[i],
                                                 sig[i + 1]), None

                latents, _ = jax.lax.scan(step, latents, jnp.arange(num_steps))
                return latents

            if model_k > 1:
                # full-model output caching: replay steps cost zero
                # transformer compute (UNIGEN_BENCH_MODEL_CACHE_ORDER=1 ->
                # first-order Taylor replay)
                from unigen_tpu.pipelines import caching
                latents, _ = caching.model_cache_scan(
                    lambda l, i: fwd(l, i)[0], latents, sig, num_steps,
                    cache_interval=model_k,
                    order=int(os.environ.get("UNIGEN_BENCH_MODEL_CACHE_ORDER",
                                             "0")))
                return latents

            if hyb_m > 1:
                # HYBRID three-level cache (SERVING.md rung 3c): full
                # refresh every hyb_c steps, base-with-control-replay every
                # hyb_m between, prediction replay otherwise — the big
                # composition on the 28-step CFG denoise
                from unigen_tpu.pipelines import caching
                zero = jnp.zeros((bb.num_layers, 2 * b, s_img, bb.inner_dim),
                                 dtype)
                latents, _, _ = caching.hybrid_cache_scan(
                    lambda l, i: (lambda pr, o, _d:
                                  (pr, o["control_residuals"]))(
                        *fwd(l, i, return_control_residuals=True)),
                    lambda l, i, r: fwd(l, i, control_residuals=r)[0],
                    latents, sig, num_steps, control_interval=hyb_c,
                    model_interval=hyb_m, residuals_init=zero,
                    order=int(os.environ.get("UNIGEN_BENCH_MODEL_CACHE_ORDER",
                                             "0")))
                return latents

            # opt-in control-residual step caching (one cache; the CFG
            # duplication rides in the batch axis); with cfg_cache the
            # replay step also skips the uncond stream
            zero = jnp.zeros((bb.num_layers, 2 * b, s_img, bb.inner_dim),
                             dtype)

            def step(carry, i):
                lat, res, delta = carry

                def full():
                    pred, outs, d = fwd(lat, i, return_control_residuals=True)
                    return pred, outs["control_residuals"], d

                if cfg_cache:
                    def replay():
                        pos = fwd_pos(lat, i, res[:, b:])
                        return pos + (guidance - 1.0) * delta, res, delta
                else:
                    def replay():
                        pred, _, d = fwd(lat, i, control_residuals=res)
                        return pred, res, delta

                pred, res_n, delta_n = jax.lax.cond(i % cache_k == 0, full,
                                                    replay)
                return (scheduling.euler_step(lat, pred, sig[i], sig[i + 1]),
                        res_n, delta_n), None

            delta0 = jnp.zeros_like(latents)
            (latents, _, _), _ = jax.lax.scan(step, (latents, zero, delta0),
                                              jnp.arange(num_steps))
            return latents

        jfn = jax.jit(denoise)
        fn = lambda: jfn(params, latents0, condition, prompt, pooled, cond_pooled)
        t0 = time.time()
        _ = float(jnp.sum(fn().astype(jnp.float32)))
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            _ = float(jnp.sum(out.astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        ips = b / dt
        peak = 197e12 if quant == "bf16" else 394e12
        print(f"# sd3 b={b} compile={compile_s:.1f}s denoise={dt*1000:.0f}ms "
              f"ips={ips:.3f} mfu={flops_image*ips/peak:.3f}", file=sys.stderr)
        return ips

    results = {}
    for b in batch_sizes:
        try:
            results[b] = measure(b)
        except Exception as e:
            print(f"# sd3 b={b} failed: {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr)
            gc.collect()
    if not results:
        print(json.dumps({"metric":
                          f"unigen_sd3_bench_{res}px_28step_cfg_images_per_sec",
                          "value": 0.0, "unit": "images/sec/chip",
                          "vs_baseline": 0.0, "error": "all batches failed"}))
        return
    best_b = max(results, key=results.get)
    print(json.dumps({
        "metric": f"unigen_sd3_bench_{res}px_28step_cfg_images_per_sec",
        "value": round(results[best_b], 4), "unit": "images/sec/chip",
        "vs_baseline": round(results[best_b] / est_ref, 3),
        "config": f"sd35m_{bb.num_layers}blk_w{bb.inner_dim}_{quant}_cfg"
                  + (f"_ctrlcache{cache_k}" if cache_k > 1 else "")
                  + ("_cfgcache" if cfg_cache else "")
                  + (f"_modelcache{model_k}" + ("_o1" if os.environ.get("UNIGEN_BENCH_MODEL_CACHE_ORDER") == "1" else "") if model_k > 1 else "")
                  + (f"_hybc{hyb_c}m{hyb_m}" if hyb_m > 1 else "")}))
    print(f"# best_batch={best_b} est_ref_a100={est_ref:.3f}img/s",
          file=sys.stderr)
    if quant != "bf16":                 # cached/exact quantized serving rungs
        record_family_cache_rows(
            "sd3", results, res=res, num_steps=num_steps,
            config=f"sd35m_{bb.num_layers}blk_w{bb.inner_dim}_{quant}_cfg",
            cache_k=cache_k, model_k=model_k, cfg_cache=cfg_cache,
            model_order=int(os.environ.get("UNIGEN_BENCH_MODEL_CACHE_ORDER",
                                           "0")),
            hybrid=(hyb_c, hyb_m))


def bench_sana():
    """UNIGEN_BENCH_FAMILY=sana: SANA-1.6B UniGen control (20 linear-attn
    blocks, width 2240, DC-AE f32 latents), 1024^2, 20-step flow denoise —
    beyond parity (the reference builds SANAUniGen but ships no pipeline or
    numbers for it)."""
    import gc

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/unigen_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from unigen_tpu import config as C
    from unigen_tpu.models.sana import (init_sana_unigen_params,
                                        sana_unigen_forward)
    from unigen_tpu.pipelines import scheduling

    res = int(os.environ.get("UNIGEN_BENCH_RES", "1024"))
    num_steps = 20
    t_len = 300
    lat = res // 32                       # DC-AE f32
    s_img = lat * lat
    batch_sizes = [int(x) for x in
                   os.environ.get("UNIGEN_BENCH_BATCHES", "1,2,4").split(",")]

    cfg = C.UniGenConfig(
        family="sana", sana=C.SanaBackboneConfig(),
        # per-sample routing keeps the router linear in batch (serving mode,
        # same choice as the flux presets; global mode measured 0.817 ->
        # 0.657 img/s from b=1 to b=4 — the quadratic router dominates)
        control=C.ControlConfig(moe=C.MoEConfig(batch_mode="per_sample")),
        condition_types=("canny",))
    bb = cfg.sana
    d = bb.inner_dim
    dtype = jnp.bfloat16
    quant = os.environ.get("UNIGEN_BENCH_QUANT", "bf16")
    cache_k = int(os.environ.get("UNIGEN_BENCH_CACHE_INTERVAL", "1"))
    model_k = int(os.environ.get("UNIGEN_BENCH_MODEL_CACHE_INTERVAL", "1"))
    if model_k > 1:
        assert cache_k <= 1, \
            "model cache and control cache are mutually exclusive"
    hyb_c, hyb_m = _parse_hybrid_env()
    if hyb_m > 1:
        assert cache_k <= 1 and model_k <= 1, \
            "hybrid cache excludes the other cache knobs"

    def _init(k):
        p = init_sana_unigen_params(k, cfg, dtype=dtype)
        if quant == "w8a8":
            from unigen_tpu.ops.quant import quantize_tree
            p = quantize_tree(p)
        return p

    t0 = time.time()
    if quant == "bf16":
        params = jax.jit(_init)(jax.random.PRNGKey(0))
    else:
        params = direct_quantized_init(jax.random.PRNGKey(0), _init)
    jax.block_until_ready(params)
    from unigen_tpu.ops.quant import quantized_bytes
    print(f"# sana init {time.time()-t0:.1f}s quant={quant} "
          f"resident={quantized_bytes(params)/2**30:.2f}GiB", file=sys.stderr)

    sigmas = np.asarray(scheduling.inference_sigmas(
        scheduling.FlowMatchConfig(shift=3.0), num_steps)[0])
    timesteps = sigmas[:-1] * 1000.0
    # linear attention is O(S d^2/heads): negligible next to the projections
    per_tok = 2 * ((4 + 2 * 2.5 + 2.5 * 0.28) * d * d)   # attn+GLUMB+cross
    flops_image = (bb.num_layers * 2 + 3) * per_tok * s_img * num_steps
    est_ref = 312e12 * 0.35 / flops_image

    def measure(b: int) -> float:
        ks = jax.random.split(jax.random.PRNGKey(1), 5)
        prompt = jax.random.normal(ks[0], (b, t_len, bb.caption_channels), dtype)
        pooled = jax.random.normal(ks[1], (b, bb.pooled_projection_dim), dtype)
        cond_pooled = jax.random.normal(ks[2], (b, bb.pooled_projection_dim), dtype)
        condition = jax.random.normal(ks[3], (b, bb.in_channels, lat, lat), dtype)
        latents0 = jax.random.normal(ks[4], (b, bb.in_channels, lat, lat), dtype)

        def denoise(params, latents, condition, prompt, pooled, cond_pooled):
            sig = jnp.asarray(sigmas)
            tst = jnp.asarray(timesteps)

            def fwd(lat_x, i, **kw):
                pred, _, outs = sana_unigen_forward(
                    params, cfg, hidden=lat_x, condition=condition,
                    encoder=prompt, pooled=pooled,
                    condition_pooled=cond_pooled,
                    timestep=jnp.full((b,), tst[i], dtype), **kw)
                return pred, outs

            if cache_k <= 1 and model_k <= 1 and hyb_m <= 1:
                def step(lat_x, i):
                    pred, _ = fwd(lat_x, i)
                    return scheduling.euler_step(lat_x, pred, sig[i],
                                                 sig[i + 1]), None

                latents, _ = jax.lax.scan(step, latents, jnp.arange(num_steps))
                return latents

            if model_k > 1:
                # full-model output caching: replay steps cost zero
                # transformer compute (UNIGEN_BENCH_MODEL_CACHE_ORDER=1 ->
                # first-order Taylor replay)
                from unigen_tpu.pipelines import caching
                latents, _ = caching.model_cache_scan(
                    lambda l, i: fwd(l, i)[0], latents, sig, num_steps,
                    cache_interval=model_k,
                    order=int(os.environ.get("UNIGEN_BENCH_MODEL_CACHE_ORDER",
                                             "0")))
                return latents

            zero = jnp.zeros((bb.num_layers, b, s_img, d), dtype)

            if hyb_m > 1:
                # HYBRID three-level cache (SERVING.md rung 3c)
                from unigen_tpu.pipelines import caching
                latents, _, _ = caching.hybrid_cache_scan(
                    lambda l, i: (lambda pr, o:
                                  (pr, o["control_residuals"]))(
                        *fwd(l, i, return_control_residuals=True)),
                    lambda l, i, r: fwd(l, i, control_residuals=r)[0],
                    latents, sig, num_steps, control_interval=hyb_c,
                    model_interval=hyb_m, residuals_init=zero,
                    order=int(os.environ.get("UNIGEN_BENCH_MODEL_CACHE_ORDER",
                                             "0")))
                return latents

            def step(carry, i):
                lat_x, res = carry

                def full():
                    pred, outs = fwd(lat_x, i, return_control_residuals=True)
                    return pred, outs["control_residuals"]

                def replay():
                    pred, _ = fwd(lat_x, i, control_residuals=res)
                    return pred, res

                pred, res = jax.lax.cond(i % cache_k == 0, full, replay)
                return (scheduling.euler_step(lat_x, pred, sig[i],
                                              sig[i + 1]), res), None

            (latents, _), _ = jax.lax.scan(step, (latents, zero),
                                           jnp.arange(num_steps))
            return latents

        jfn = jax.jit(denoise)
        fn = lambda: jfn(params, latents0, condition, prompt, pooled, cond_pooled)
        t0 = time.time()
        _ = float(jnp.sum(fn().astype(jnp.float32)))
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            _ = float(jnp.sum(out.astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        ips = b / min(times)
        peak = 197e12 if quant == "bf16" else 394e12
        print(f"# sana b={b} compile={compile_s:.1f}s denoise="
              f"{min(times)*1000:.0f}ms ips={ips:.3f} "
              f"mfu={flops_image*ips/peak:.3f}", file=sys.stderr)
        return ips

    results = {}
    for b in batch_sizes:
        try:
            results[b] = measure(b)
        except Exception as e:
            print(f"# sana b={b} failed: {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr)
            gc.collect()
    if not results:
        print(json.dumps({"metric":
                          f"unigen_sana_bench_{res}px_20step_images_per_sec",
                          "value": 0.0, "unit": "images/sec/chip",
                          "vs_baseline": 0.0, "error": "all batches failed"}))
        return
    best_b = max(results, key=results.get)
    print(json.dumps({
        "metric": f"unigen_sana_bench_{res}px_20step_images_per_sec",
        "value": round(results[best_b], 4), "unit": "images/sec/chip",
        "vs_baseline": round(results[best_b] / est_ref, 3),
        "config": f"sana1.6b_{bb.num_layers}blk_w{d}_{quant}"
                  + (f"_ctrlcache{cache_k}" if cache_k > 1 else "")
                  + (f"_modelcache{model_k}" + ("_o1" if os.environ.get("UNIGEN_BENCH_MODEL_CACHE_ORDER") == "1" else "") if model_k > 1 else "")
                  + (f"_hybc{hyb_c}m{hyb_m}" if hyb_m > 1 else "")}))
    if quant != "bf16":                 # cached/exact quantized serving rungs
        record_family_cache_rows(
            "sana", results, res=res, num_steps=num_steps,
            config=f"sana1.6b_{bb.num_layers}blk_w{d}_{quant}",
            cache_k=cache_k, model_k=model_k,
            model_order=int(os.environ.get("UNIGEN_BENCH_MODEL_CACHE_ORDER",
                                           "0")),
            hybrid=(hyb_c, hyb_m))


def bench_train_data():
    """UNIGEN_BENCH_TRAIN=1 UNIGEN_BENCH_TRAIN_DATA=disk (VERDICT r4 #2):
    train-step throughput FROM REAL DATA ON DISK — the measured rung the
    synthetic-tensor TRAIN.json rows never covered. Chain = JPEG files in
    the Subjects-200K layout -> data/datasets.Subjects200K (decode, LANCZOS4
    resize, on-the-fly canny, native-C++ normalize) -> data/collate ->
    data/prefetch.Prefetcher (bounded queue, worker threads) -> device VAE
    encode of target+condition pixels -> the FULL-topology W4A8 train step
    (same config as TRAIN.json micro-batch rows). Reference analog:
    train.py:517-697 consuming torch DataLoader workers.

    Three measured phases:
      input_only  — host pipeline alone (no device): samples/s
      step_only   — device step on pregenerated tensors (the TRAIN.json
                    baseline, re-measured in-process)
      e2e         — prefetcher feeding VAE encode + step, with the consumer
                    STARVATION fraction (Prefetcher.stats wait-time over the
                    window wall) — the input-boundness answer on this 1-core
                    host.
    Text embeds ride as fixed device tensors (per-step prompt encoding is
    the text-tower rungs' subject; the reference also encodes per step —
    noted in the artifact). Writes TRAIN_DATA.json + merges a
    'data_pipeline' pointer row into TRAIN.json.

    Env: UNIGEN_BENCH_RES (512), UNIGEN_BENCH_TRAIN_BATCH (2),
    UNIGEN_BENCH_TRAIN_ACCUM (8), UNIGEN_BENCH_PRESET full|tiny (tiny = CPU
    smoke: tiny flux + tiny VAE at 64px, no artifact),
    UNIGEN_BENCH_DATA_ITEMS (32), UNIGEN_BENCH_DATA_WORKERS (2),
    UNIGEN_BENCH_DATA_DEPTH (4)."""
    import gc

    import jax
    import jax.numpy as jnp

    from unigen_tpu import config as C, presets
    from unigen_tpu.data.datasets import Subjects200K, collate
    from unigen_tpu.data.prefetch import Prefetcher
    from unigen_tpu.models import vae as vae_lib
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.ops.quant import (quantize_unigen_serving, quantized_bytes,
                                      split_trainable)
    from unigen_tpu.train import train_step as ts

    preset = os.environ.get("UNIGEN_BENCH_PRESET", "full")
    tiny = preset == "tiny"
    res = 64 if tiny else int(os.environ.get("UNIGEN_BENCH_RES", "512"))
    b = int(os.environ.get("UNIGEN_BENCH_TRAIN_BATCH", "2"))
    accum = int(os.environ.get("UNIGEN_BENCH_TRAIN_ACCUM", "8"))
    n_items = int(os.environ.get("UNIGEN_BENCH_DATA_ITEMS", "32"))
    workers = int(os.environ.get("UNIGEN_BENCH_DATA_WORKERS", "2"))
    depth = int(os.environ.get("UNIGEN_BENCH_DATA_DEPTH", "4"))
    dtype = jnp.bfloat16
    lat_hw = res // 8

    # --- synthetic Subjects-200K files on disk (persistent across runs)
    from PIL import Image
    root = f"/tmp/unigen_bench_subjects_{res}_{n_items}"
    if not os.path.isdir(os.path.join(root, "score_5")):
        os.makedirs(os.path.join(root, "score_5"), exist_ok=True)
        rs = np.random.RandomState(0)
        for i in range(n_items):
            base = os.path.join(root, "score_5", f"item{i:03d}")
            # structured content so canny finds edges / JPEG does real work
            img = rs.randint(0, 255, (res, res, 3)).astype(np.uint8)
            img[res // 4:-res // 4, res // 4:-res // 4] = \
                rs.randint(0, 255, 3)
            Image.fromarray(img).save(base + "_target_0.jpg", quality=92)
            Image.fromarray(img[::-1]).save(base + "_subject_0.jpg",
                                            quality=92)
            with open(base + "_target_0.json", "w") as f:
                json.dump({"description": f"bench item {i}"}, f)
        print(f"# wrote {n_items} synthetic Subjects-200K items -> {root}",
              file=sys.stderr)
    ds = Subjects200K(root, "canny", resolution=res, split="train")
    n = len(ds)

    def index_stream():
        i = 0
        while True:
            yield [(i + j) % n for j in range(b)]
            i += b

    def fetch(sel):
        return collate([ds[j] for j in sel])

    # --- phase A: host pipeline alone
    pf = Prefetcher(index_stream(), depth=depth, workers=workers,
                    map_fn=fetch)
    it = iter(pf)
    for _ in range(2):
        next(it)                                   # warm caches/threads
    k_host = max(8, 2 * depth)
    t0 = time.perf_counter()
    for _ in range(k_host):
        next(it)
    input_sps = b * k_host / (time.perf_counter() - t0)
    pf.close()
    print(f"# input pipeline alone: {input_sps:.2f} samples/s "
          f"(workers={workers})", file=sys.stderr)

    # --- device setup: the TRAIN.json full-topology config (or tiny smoke)
    if tiny:
        cfg = C.UniGenConfig(family="flux", flux=C.tiny_flux_config(),
                             condition_types=("canny",))
        p = init_unigen_flux_params(jax.random.PRNGKey(0), cfg)
        trainable, frozen = split_trainable(p["control"])
        frozen_arg = {"base": p["base"], "control_frozen": frozen}
        vae_cfg = vae_lib.tiny_vae_config(
            latent_channels=cfg.flux.in_channels // 4)
    else:
        cfg = presets.flux_full()
        params = direct_quantized_init(
            jax.random.PRNGKey(0),
            lambda k: quantize_unigen_serving(
                init_unigen_flux_params(k, cfg, dtype=dtype)))
        jax.block_until_ready(params)
        trainable, frozen = split_trainable(params["control"])
        frozen_arg = {"base": params["base"], "control_frozen": frozen}
        vae_cfg = vae_lib.VAEConfig()
    bb = cfg.flux
    t_len = 64 if tiny else 512
    tcfg = C.TrainConfig(train_batch_size=b, remat="full",
                         gradient_accumulation_steps=accum)
    state = jax.jit(lambda c: ts.init_train_state(c, tcfg))(trainable)
    jax.block_until_ready(state)
    vae_params = jax.jit(lambda k: vae_lib.init_vae_params(
        k, vae_cfg, dtype=jnp.float32))(jax.random.PRNGKey(7))
    jax.block_until_ready(vae_params)
    if not tiny:
        resident = (quantized_bytes(params) + quantized_bytes(state)
                    + quantized_bytes(vae_params)) / 2 ** 30
        print(f"# resident {resident:.2f} GiB incl. VAE", file=sys.stderr)

    step_fn = jax.jit(ts.make_train_step(cfg, tcfg, attn_impl="auto"),
                      donate_argnums=(0,))
    enc = jax.jit(lambda vp, px: vae_lib.vae_encode(vp, vae_cfg, px
                                                    ).astype(dtype))
    # fixed text embeds (see docstring)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    text = {
        "prompt_embeds": jax.random.normal(
            ks[0], (b, t_len, bb.joint_attention_dim), dtype),
        "pooled": jax.random.normal(ks[1], (b, bb.pooled_projection_dim),
                                    dtype),
        "condition_pooled": jax.random.normal(
            ks[2], (b, bb.pooled_projection_dim), dtype)}

    def device_batch(host_batch):
        px = jnp.asarray(np.asarray(host_batch["pixel_values"], np.float32))
        cpx = jnp.asarray(np.asarray(host_batch["condition_pixels"],
                                     np.float32))
        return dict(latents=enc(vae_params, px),
                    condition_latents=enc(vae_params, cpx), **text)

    # --- phase B: step-only baseline (pregenerated tensors)
    pf = Prefetcher(index_stream(), depth=depth, workers=workers,
                    map_fn=fetch)
    it = iter(pf)
    fixed = device_batch(next(it))
    jax.block_until_ready(fixed)
    rng = jax.random.PRNGKey(2)
    t0 = time.time()
    state, metrics = step_fn(state, frozen_arg, fixed, rng)
    loss0 = float(metrics["step_loss"])
    print(f"# compile {time.time()-t0:.1f}s loss0={loss0:.3f}",
          file=sys.stderr)
    k_dev = 4 if tiny else 8
    t0 = time.perf_counter()
    for _ in range(k_dev):
        state, metrics = step_fn(state, frozen_arg, fixed, rng)
    _ = float(metrics["step_loss"])
    step_sps = b * k_dev / (time.perf_counter() - t0)

    # --- phase C: end-to-end overlap + starvation accounting
    w0 = pf.stats()["wait_s"]
    t0 = time.perf_counter()
    for _ in range(k_dev):
        state, metrics = step_fn(state, frozen_arg, device_batch(next(it)),
                                 rng)
    _ = float(metrics["step_loss"])
    wall = time.perf_counter() - t0
    starvation = (pf.stats()["wait_s"] - w0) / wall
    e2e_sps = b * k_dev / wall
    pf.close()

    flops_image = 3 * model_flops_per_forward(
        cfg, (res // 16) ** 2, t_len, (res // 16) ** 2)
    est_ref_a100 = 312e12 * 0.35 / flops_image
    print(f"# step-only {step_sps:.3f} samples/s | e2e-from-disk "
          f"{e2e_sps:.3f} | input-only {input_sps:.2f} | starvation "
          f"{starvation*100:.1f}%", file=sys.stderr)

    doc = {"config": f"flux_{bb.num_layers}dbl_{bb.num_single_layers}sgl_"
                     f"w{bb.inner_dim}_train_from_disk",
           "res": res, "micro_batch": b, "accum": accum,
           "dataset": {"layout": "subjects200k", "items": n_items,
                       "condition": "canny_on_the_fly",
                       "workers": workers, "queue_depth": depth},
           "input_only_samples_per_sec": round(input_sps, 3),
           "step_only_samples_per_sec": round(step_sps, 4),
           "e2e_samples_per_sec": round(e2e_sps, 4),
           "starvation_fraction": round(starvation, 4),
           "weights": "random",
           "note": "text embeds fixed on device (per-step prompt encoding "
                   "measured separately by the text-tower rungs); VAE "
                   "encode of target+condition pixels runs on-stream per "
                   "step"}
    if not tiny:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "TRAIN_DATA.json"), "w") as f:
            json.dump(doc, f, indent=1)
        tj = os.path.join(here, "TRAIN.json")
        if os.path.exists(tj):
            with open(tj) as f:
                tdoc = json.load(f)
            tdoc["data_pipeline"] = {
                "see": "TRAIN_DATA.json",
                "e2e_samples_per_sec": doc["e2e_samples_per_sec"],
                "step_only_samples_per_sec": doc["step_only_samples_per_sec"],
                "starvation_fraction": doc["starvation_fraction"]}
            with open(tj, "w") as f:
                json.dump(tdoc, f, indent=1)
    print(json.dumps({
        "metric": f"unigen_flux_train_from_disk_{res}px_samples_per_sec",
        "value": round(e2e_sps, 4), "unit": "samples/sec/chip",
        "vs_baseline": round(e2e_sps / est_ref_a100, 3),
        "config": doc["config"]}))


def bench_train():
    """UNIGEN_BENCH_TRAIN=1: one-chip flow-matching train-step throughput
    (BASELINE config #5's hot loop, reference train.py:517-697). Real width
    at reduced depth (presets.flux_train_bench: 2 double / 4 single — the
    adapter's params+grads+AdamW state quadruple its bytes, so full depth is
    the multi-chip/ZeRO path just as the reference needs ZeRO-3 + CPU
    offload, ds_zero3.json). The frozen base runs QLoRA-style in int4
    (straight-through quantized matmuls, ops/quant.py); adapter + optimizer
    in bf16; micro-batch 1 (reference per-GPU batch, ds_zero3.json:30);
    remat on. Fallback rung drops the shared-expert weave (~45% of the tiny
    adapter) and is labelled accordingly."""
    import gc

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/unigen_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from unigen_tpu import config as C, presets
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.ops.quant import quantize_tree, quantized_bytes
    from unigen_tpu.train import train_step as ts

    res = int(os.environ.get("UNIGEN_BENCH_RES", "512"))
    b = int(os.environ.get("UNIGEN_BENCH_TRAIN_BATCH", "1"))
    # UNIGEN_BENCH_TRAIN_REMAT=full|dots|none: rematerialisation policy
    # (utils.remat_wrap). "dots" saves the weight-matmul outputs and
    # recomputes only attention/elementwise in backward - the MFU option
    # when the activation memory fits (VERDICT r3 #3)
    remat = os.environ.get("UNIGEN_BENCH_TRAIN_REMAT", "full")
    try:
        remat = {"full": "full", "dots": "dots", "none": "none",
                 "1": "full", "0": "none"}[remat]
    except KeyError:
        raise ValueError(
            f"UNIGEN_BENCH_TRAIN_REMAT={remat!r}: expected full|dots|none"
            " (or 1|0)") from None
    lat_hw, t_len = res // 8, 512
    tcfg = C.TrainConfig(train_batch_size=b, remat=remat)
    dtype = jnp.bfloat16

    def run(shared_expert: bool):
        cfg = presets.flux_train_bench(shared_expert=shared_expert)
        bb = cfg.flux
        t0 = time.time()

        def _init(k):
            p = init_unigen_flux_params(k, cfg, dtype=dtype)
            # frozen base -> int4 (QLoRA); adapter stays bf16 for training
            return {"base": quantize_tree(p["base"], bits=4),
                    "control": p["control"]}

        params = jax.jit(_init)(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        state = jax.jit(lambda c: ts.init_train_state(c, tcfg))(params["control"])
        jax.block_until_ready(state)
        resident = (quantized_bytes(params) + quantized_bytes(state)) / 2 ** 30
        print(f"# train init {time.time()-t0:.1f}s shared_expert="
              f"{shared_expert} resident={resident:.2f}GiB", file=sys.stderr)

        ks = jax.random.split(jax.random.PRNGKey(1), 5)
        batch = {
            "latents": jax.random.normal(ks[0], (b, 16, lat_hw, lat_hw), dtype),
            "condition_latents": jax.random.normal(
                ks[1], (b, 16, lat_hw, lat_hw), dtype),
            "prompt_embeds": jax.random.normal(
                ks[2], (b, t_len, bb.joint_attention_dim), dtype),
            "pooled": jax.random.normal(ks[3], (b, bb.pooled_projection_dim),
                                        dtype),
            "condition_pooled": jax.random.normal(
                ks[4], (b, bb.pooled_projection_dim), dtype),
        }
        step_fn = jax.jit(ts.make_train_step(cfg, tcfg, attn_impl="auto"),
                          donate_argnums=(0,))
        rng = jax.random.PRNGKey(2)

        t0 = time.time()
        state2, metrics = step_fn(state, params["base"], batch, rng)
        loss0 = float(metrics["step_loss"])  # d2h sync
        compile_s = time.time() - t0
        K = 4
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K):
                state2, metrics = step_fn(state2, params["base"], batch, rng)
            _ = float(metrics["step_loss"])
            times.append((time.perf_counter() - t0) / K)
        dt = min(times)
        flops_image = 3 * model_flops_per_forward(
            cfg, (res // 16) ** 2, t_len, (res // 16) ** 2)  # fwd+bwd ~= 3x fwd
        est_ref_a100 = 312e12 * 0.35 / flops_image
        sps = b / dt
        print(f"# train b={b} compile={compile_s:.1f}s step={dt*1000:.1f}ms "
              f"loss0={loss0:.3f} mfu={flops_image*sps/394e12:.3f} "
              f"(int8 peak; int4 base + bf16 adapter)", file=sys.stderr)
        se = "" if shared_expert else "_noshared"
        print(json.dumps({
            "metric": f"unigen_flux_train_step_{res}px_samples_per_sec",
            "value": round(sps, 4), "unit": "samples/sec/chip",
            "vs_baseline": round(sps / est_ref_a100, 3),
            "config": f"flux_{bb.num_layers}dbl_{bb.num_single_layers}sgl_"
                      f"w{bb.inner_dim}_w4base_bf16adapter_train{se}",
        }))

    def run_full(accum: int):
        """FULL 19/38 topology single-chip fine-tune (BASELINE config #5 at
        the real depth): serving-quantized tree resident (int4 base+blocks,
        int8 small pieces), trainable = the fp subset (MoE experts + gate +
        norms + biases, ops/quant.split_trainable) under AdamW with
        gradient accumulation to the reference's global batch 16
        (train.sh:60, README.md:74 — optax.MultiSteps)."""
        from unigen_tpu.ops.quant import (quantize_unigen_serving,
                                          split_trainable)
        cfg = presets.flux_full()
        bb = cfg.flux
        tcfg_f = C.TrainConfig(train_batch_size=b, remat=remat,
                               gradient_accumulation_steps=accum)
        t0 = time.time()

        def _init(k):
            return quantize_unigen_serving(
                init_unigen_flux_params(k, cfg, dtype=dtype))

        params = direct_quantized_init(jax.random.PRNGKey(0), _init)
        jax.block_until_ready(params)
        trainable, frozen = split_trainable(params["control"])
        state = jax.jit(lambda c: ts.init_train_state(c, tcfg_f))(trainable)
        jax.block_until_ready(state)
        resident = (quantized_bytes(params) + quantized_bytes(state)) / 2 ** 30
        n_train = sum(int(x.size) for x in jax.tree.leaves(trainable))
        print(f"# train-full init {time.time()-t0:.1f}s accum={accum} "
              f"trainable={n_train/1e6:.0f}M resident={resident:.2f}GiB",
              file=sys.stderr)
        frozen_arg = {"base": params["base"], "control_frozen": frozen}

        ks = jax.random.split(jax.random.PRNGKey(1), 5)
        batch = {
            "latents": jax.random.normal(ks[0], (b, 16, lat_hw, lat_hw), dtype),
            "condition_latents": jax.random.normal(
                ks[1], (b, 16, lat_hw, lat_hw), dtype),
            "prompt_embeds": jax.random.normal(
                ks[2], (b, t_len, bb.joint_attention_dim), dtype),
            "pooled": jax.random.normal(ks[3], (b, bb.pooled_projection_dim),
                                        dtype),
            "condition_pooled": jax.random.normal(
                ks[4], (b, bb.pooled_projection_dim), dtype),
        }
        step_fn = jax.jit(ts.make_train_step(cfg, tcfg_f, attn_impl="auto"),
                          donate_argnums=(0,))
        t0 = time.time()
        state2, metrics = step_fn(state, frozen_arg, batch, jax.random.PRNGKey(2))
        loss0 = float(metrics["step_loss"])
        compile_s = time.time() - t0
        K = 4
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K):
                state2, metrics = step_fn(state2, frozen_arg, batch,
                                          jax.random.PRNGKey(2))
            _ = float(metrics["step_loss"])
            times.append((time.perf_counter() - t0) / K)
        dt = min(times)
        sps = b / dt
        flops_image = 3 * model_flops_per_forward(
            cfg, (res // 16) ** 2, t_len, (res // 16) ** 2)
        est_ref_a100 = 312e12 * 0.35 / flops_image
        print(f"# train-full b={b}x{accum} compile={compile_s:.1f}s "
              f"step={dt*1000:.1f}ms loss0={loss0:.3f} "
              f"mfu={flops_image*sps/394e12:.3f} (int8 peak)", file=sys.stderr)
        print(json.dumps({
            "metric": f"unigen_flux_train_step_{res}px_samples_per_sec",
            "value": round(sps, 4), "unit": "samples/sec/chip",
            "vs_baseline": round(sps / est_ref_a100, 3),
            "config": f"flux_{bb.num_layers}dbl_{bb.num_single_layers}sgl_"
                      f"w{bb.inner_dim}_w4a8frozen_fp_subset_train_"
                      f"globalbatch{b * accum}"
                      + ("" if remat == "full" else f"_remat_{remat}"),
        }))

    def run_lora(rank: int, accum: int):
        """LoRA fine-tune at FULL topology (TrainConfig.lora_rank — the
        reference's dormant --rank made first-class): serving-quantized
        W4A8 tree resident and FROZEN, trainable = rank-r {a,b} factors
        folded into the frozen weights inside the step
        (models/lora.fold_for_training, QLoRA dequant fold). HBM note: each
        folded target stack materialises a bf16 transient AND its
        scan-carried gradient, so the rung ladder shrinks the surface until
        it fits — default (attn+ff+gates, ~7 GiB of transients at 19/38),
        gates + double attn (~4 GiB), zero-init gates only (~1 GiB; the
        gates are the grad gateway anyway, models/lora.DEFAULT_LORA_TARGETS
        docstring). Records TRAIN_LORA.json rows keyed by surface."""
        from unigen_tpu.models.lora import (DEFAULT_LORA_TARGETS,
                                            init_lora_adapters)
        from unigen_tpu.ops.quant import quantize_unigen_serving
        cfg = presets.flux_full()
        bb = cfg.flux
        t0 = time.time()

        def _init(k):
            return quantize_unigen_serving(
                init_unigen_flux_params(k, cfg, dtype=dtype))

        params = direct_quantized_init(jax.random.PRNGKey(0), _init)
        jax.block_until_ready(params)
        frozen_arg = {"base": params["base"],
                      "control_frozen": params["control"]}
        # factor shapes come from the fp tree's SHAPES only (eval_shape —
        # the bf16 tree never materialises; quantized trees have no 'w'
        # leaves for init_lora_adapters to match)
        shapes = jax.eval_shape(
            lambda k: init_unigen_flux_params(k, cfg, dtype=dtype),
            jax.random.PRNGKey(0))
        print(f"# train-lora init {time.time()-t0:.1f}s rank={rank} "
              f"resident={quantized_bytes(params)/2**30:.2f}GiB",
              file=sys.stderr)

        ks = jax.random.split(jax.random.PRNGKey(1), 5)
        batch = {
            "latents": jax.random.normal(ks[0], (b, 16, lat_hw, lat_hw), dtype),
            "condition_latents": jax.random.normal(
                ks[1], (b, 16, lat_hw, lat_hw), dtype),
            "prompt_embeds": jax.random.normal(
                ks[2], (b, t_len, bb.joint_attention_dim), dtype),
            "pooled": jax.random.normal(ks[3], (b, bb.pooled_projection_dim),
                                        dtype),
            "condition_pooled": jax.random.normal(
                ks[4], (b, bb.pooled_projection_dim), dtype),
        }
        surfaces = [
            ("default", list(DEFAULT_LORA_TARGETS)),
            ("gates_dblattn", ["control.add_double", "control.add_single",
                               "control.double_blocks.attn"]),
            ("gates", ["control.add_double", "control.add_single"]),
        ]
        for tag, targets in surfaces:
            try:
                tcfg_l = C.TrainConfig(train_batch_size=b, remat=remat,
                                       gradient_accumulation_steps=accum,
                                       lora_rank=rank,
                                       lora_targets=tuple(targets))
                adapters = init_lora_adapters(
                    jax.random.PRNGKey(3), shapes, targets=targets,
                    rank=rank, adapter_names=["bench"])
                lora = adapters["bench"]
                n_fac = sum(int(x.size) for x in jax.tree.leaves(lora))
                state = jax.jit(
                    lambda c: ts.init_train_state(c, tcfg_l))(lora)
                jax.block_until_ready(state)
                step_fn = jax.jit(
                    ts.make_train_step(cfg, tcfg_l, attn_impl="auto"),
                    donate_argnums=(0,))
                t0 = time.time()
                state2, metrics = step_fn(state, frozen_arg, batch,
                                          jax.random.PRNGKey(2))
                loss0 = float(metrics["step_loss"])
                compile_s = time.time() - t0
                K = 4
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(K):
                        state2, metrics = step_fn(state2, frozen_arg, batch,
                                                  jax.random.PRNGKey(2))
                    _ = float(metrics["step_loss"])
                    times.append((time.perf_counter() - t0) / K)
                dt = min(times)
                sps = b / dt
                flops_image = 3 * model_flops_per_forward(
                    cfg, (res // 16) ** 2, t_len, (res // 16) ** 2)
                est_ref_a100 = 312e12 * 0.35 / flops_image
                print(f"# train-lora[{tag}] rank={rank} b={b}x{accum} "
                      f"factors={n_fac/1e6:.1f}M compile={compile_s:.1f}s "
                      f"step={dt*1000:.1f}ms loss0={loss0:.3f} "
                      f"mfu={flops_image*sps/394e12:.3f} (int8 peak)",
                      file=sys.stderr)
                doc = {"surface": tag, "targets": targets, "rank": rank,
                       "factors_M": round(n_fac / 1e6, 2),
                       "samples_per_sec": round(sps, 4),
                       "step_ms": round(dt * 1000, 1),
                       "global_batch": b * accum,
                       "compile_s": round(compile_s, 1)}
                path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "TRAIN_LORA.json")
                merged = {"rows": {}}
                if os.path.exists(path):
                    with open(path) as f:
                        merged = json.load(f)
                merged["rows"][f"{tag}_r{rank}"] = doc
                with open(path, "w") as f:
                    json.dump(merged, f, indent=1)
                print(json.dumps({
                    "metric": f"unigen_flux_train_lora_step_{res}px_"
                              "samples_per_sec",
                    "value": round(sps, 4), "unit": "samples/sec/chip",
                    "vs_baseline": round(sps / est_ref_a100, 3),
                    "config": f"flux_{bb.num_layers}dbl_{bb.num_single_layers}"
                              f"sgl_w{bb.inner_dim}_w4a8frozen_lora_r{rank}_"
                              f"{tag}_globalbatch{b * accum}",
                }))
                return
            except Exception as e:
                print(f"# train-lora[{tag}] failed: {type(e).__name__}: "
                      f"{str(e)[:200]}", file=sys.stderr)
                gc.collect()
                time.sleep(30)
        raise RuntimeError("all LoRA surfaces failed")

    if os.environ.get("UNIGEN_BENCH_TRAIN_DATA") == "disk":
        return bench_train_data()
    accum = int(os.environ.get("UNIGEN_BENCH_TRAIN_ACCUM", "16"))
    lora_rank = int(os.environ.get("UNIGEN_BENCH_TRAIN_LORA", "0"))
    if lora_rank > 0:
        return run_lora(lora_rank, accum)
    rungs = [lambda: run_full(accum), lambda: run(True), lambda: run(False)]
    if os.environ.get("UNIGEN_BENCH_TRAIN_PRESET") == "reduced":
        rungs = rungs[1:]
    for rung in rungs:
        try:
            rung()
            return
        except Exception as e:
            print(f"# train rung failed: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
            gc.collect()
            time.sleep(30)
    print(json.dumps({"metric": f"unigen_flux_train_step_{res}px_samples_per_sec",
                      "value": 0.0, "unit": "samples/sec/chip",
                      "vs_baseline": 0.0, "error": "all rungs failed"}))


def bench_suite():
    """UNIGEN_BENCH_SUITE=1: BASELINE config #3 — the full MultiGen condition
    suite with per-condition LoRA expert switching (reference
    lora_switching_module.py:4-39 + hook.py:29-84; README.md:77 lists the
    twelve spatial conditions). Full 19/38 W4A8 serving tree on one chip;
    per condition type: fold that type's LoRA expert into the live quantized
    weights (models/lora.LoraSwitcher — refold from pristine host copies,
    timed) and run the 4-step 512² denoise (timed). Writes SUITE.json with
    per-type rows {type, ips, switch_ms} and prints the suite-mean JSON line.

    Env: UNIGEN_BENCH_SUITE_TYPES (comma list, default the 12 MultiGen types),
    UNIGEN_BENCH_SUITE_BATCH (default 2), UNIGEN_BENCH_RES (default 512)."""
    import jax
    import jax.numpy as jnp

    from unigen_tpu import presets
    from unigen_tpu.config import CONDITION_TYPES
    from unigen_tpu.models.lora import LoraSwitcher, init_lora_adapters
    from unigen_tpu.models.unigen_flux import unigen_flux_forward, \
        init_unigen_flux_params
    from unigen_tpu.ops.packing import prepare_latent_image_ids
    from unigen_tpu.ops.quant import quantize_unigen_serving, quantized_bytes
    from unigen_tpu.pipelines import scheduling

    res = int(os.environ.get("UNIGEN_BENCH_RES", "512"))
    b = int(os.environ.get("UNIGEN_BENCH_SUITE_BATCH", "2"))
    types = os.environ.get("UNIGEN_BENCH_SUITE_TYPES", "")
    types = types.split(",") if types else list(CONDITION_TYPES)
    hw, t_len = res // 16, 512
    s_img = hw * hw
    num_steps = 4
    preset = os.environ.get("UNIGEN_BENCH_PRESET", "full")
    cfg = {"full": presets.flux_full, "proxy": presets.flux_bench,
           "tiny": presets.tiny}[preset]()
    bb = cfg.flux
    if preset == "tiny":   # CPU smoke: shrink the token budget too
        hw, t_len = 4, 8
        s_img = hw * hw
    dtype = jnp.bfloat16

    img_ids = np.asarray(prepare_latent_image_ids(hw, hw))
    txt_ids = np.zeros((t_len, 3), np.float32)
    sigmas = np.asarray(scheduling.inference_sigmas(
        scheduling.FlowMatchConfig(shift=1.0), num_steps)[0])

    def _init(k):
        return quantize_unigen_serving(init_unigen_flux_params(k, cfg, dtype=dtype))

    t0 = time.time()
    params = direct_quantized_init(jax.random.PRNGKey(0), _init)
    jax.block_until_ready(params)
    print(f"# suite init {time.time()-t0:.1f}s resident="
          f"{quantized_bytes(params)/2**30:.2f}GiB", file=sys.stderr)

    # Per-condition LoRA experts over the control attention projections
    # (rank 16; random non-zero factors — the fold work is content-agnostic).
    # Factor shapes come from an abstract UNQUANTIZED tiny eval_shape... the
    # real path: shapes derive from the quantized tree directly.
    targets = ["double_blocks.attn.to_q", "double_blocks.attn.to_v",
               "single_blocks.attn.to_q", "single_blocks.attn.to_v"]
    n_cn = bb.num_layers // cfg.control.single_control_dev
    n_cn_s = bb.num_single_layers // cfg.control.single_control_dev
    d = bb.inner_dim
    rank = 16
    adapters = {}
    kr = jax.random.PRNGKey(42)
    for ti, name in enumerate(types):
        lora = {}
        for path in targets:
            L = n_cn if path.startswith("double") else n_cn_s
            ka, kb = jax.random.split(jax.random.fold_in(kr, ti * 8 + len(lora)))
            lora[f"control.{path}"] = {
                "a": jax.random.normal(ka, (L, d, rank), jnp.float32) / np.sqrt(d),
                "b": 0.01 * jax.random.normal(kb, (L, rank, d), jnp.float32)}
        adapters[name] = lora
    t0 = time.time()
    switcher = LoraSwitcher(adapters, params)   # device pristine refs
    print(f"# switcher init {time.time()-t0:.1f}s", file=sys.stderr)

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    prompt = jax.random.normal(ks[0], (b, t_len, bb.joint_attention_dim), dtype)
    pooled = jax.random.normal(ks[1], (b, bb.pooled_projection_dim), dtype)
    cond_pooled = jax.random.normal(ks[2], (b, bb.pooled_projection_dim), dtype)
    condition = jax.random.normal(ks[3], (b, s_img, bb.in_channels), dtype)
    latents0 = jax.random.normal(ks[4], (b, s_img, bb.in_channels), dtype)

    # UNIGEN_BENCH_HYBRID_CACHE=<c:m>: run the suite at the hybrid cache
    # operating point — LoRA switching composes with the cache rungs (the
    # fold happens in the weights, the cache in the schedule)
    hyb_c, hyb_m = _parse_hybrid_env()

    def denoise(params, latents, condition, prompt, pooled, cond_pooled):
        sig = jnp.asarray(sigmas)
        ids_i = jnp.asarray(img_ids)
        ids_t = jnp.asarray(txt_ids)

        def fwd(lat, i, **kw):
            pred, _, outs = unigen_flux_forward(
                params, cfg, hidden=lat, condition=condition,
                encoder=prompt, pooled=pooled, condition_pooled=cond_pooled,
                timestep=jnp.full((b,), sig[i], dtype),
                img_ids=ids_i, txt_ids=ids_t, condition_ids=ids_i,
                attn_impl="auto", **kw)
            return pred, outs

        if hyb_m > 1:
            from unigen_tpu.pipelines import caching
            d = bb.inner_dim
            zero = (jnp.zeros((bb.num_layers, b, s_img, d), dtype),
                    jnp.zeros((bb.num_single_layers, b, t_len + s_img, d),
                              dtype))
            latents, _, _ = caching.hybrid_cache_scan(
                lambda l, i: (lambda pr, o: (pr, o["control_residuals"]))(
                    *fwd(l, i, return_control_residuals=True)),
                lambda l, i, r: fwd(l, i, control_residuals=r)[0],
                latents, sig, num_steps, control_interval=hyb_c,
                model_interval=hyb_m, residuals_init=zero)
            return latents

        def step(lat, i):
            pred, _ = fwd(lat, i)
            return scheduling.euler_step(lat, pred, sig[i], sig[i + 1]), None
        latents, _ = jax.lax.scan(step, latents, jnp.arange(num_steps))
        return latents

    jfn = jax.jit(denoise)
    t0 = time.time()
    _ = sync(jfn(params, latents0, condition, prompt, pooled, cond_pooled))
    print(f"# suite compile {time.time()-t0:.1f}s", file=sys.stderr)

    rows = []
    flops_image = model_flops_per_forward(cfg, s_img, t_len, s_img) * num_steps
    est_ref = 312e12 * 0.35 / flops_image
    for name in types:
        t0 = time.perf_counter()
        params = switcher.switch(params, name)
        jax.block_until_ready(jax.tree.leaves(params)[0])
        # sync the refolded leaves via a scalar reduce of one replaced node
        node = params["control"]["double_blocks"]["attn"]["to_q"]
        _ = sync(node.get("w_scale", next(iter(node.values()))))
        switch_ms = (time.perf_counter() - t0) * 1000
        K = max(1, 4 // b)
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(K):
                out = jfn(params, latents0, condition, prompt, pooled, cond_pooled)
            _ = sync(out)
            times.append((time.perf_counter() - t0) / K)
        ips = b / min(times)
        rows.append({"type": name, "ips": round(ips, 4),
                     "switch_ms": round(switch_ms, 1)})
        print(f"# {name}: {ips:.3f} img/s switch={switch_ms:.0f}ms", file=sys.stderr)

    mean_ips = float(np.mean([r["ips"] for r in rows]))
    suffix = f"_hybc{hyb_c}m{hyb_m}" if hyb_m > 1 else ""
    suite = {"config": f"flux_{bb.num_layers}dbl_{bb.num_single_layers}sgl_"
                       f"w{bb.inner_dim}_w4a8_lora_suite{suffix}",
             "res": res, "batch": b, "rank": rank, "targets": targets,
             "rows": rows, "mean_ips": round(mean_ips, 4),
             "mean_switch_ms": round(float(np.mean(
                 [r["switch_ms"] for r in rows])), 1)}
    # cached suite runs get their own artifact so the exact SUITE.json
    # survives (same pattern as MULTI_CACHE.json)
    out_name = "SUITE_CACHE.json" if hyb_m > 1 else "SUITE.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           out_name), "w") as f:
        json.dump(suite, f, indent=1)
    print(json.dumps({
        "metric": f"unigen_flux_condition_suite_{res}px_images_per_sec",
        "value": round(mean_ips, 4), "unit": "images/sec/chip",
        "vs_baseline": round(mean_ips / est_ref, 3),
        "config": suite["config"]}))


def bench_subject():
    """UNIGEN_BENCH_SUBJECT=1: BASELINE config #5's GENERATION half —
    subject-driven generation on Subjects-200K-style inputs. The subject
    condition image is NOT spatially aligned with the target, so the
    reference separates the two token streams in RoPE space by offsetting
    the condition ids' width coordinate by w/2 (reference
    src/condition.py:107-135; data/conditions.condition_id_offset).

    Drives the FULL UniGenFluxPipeline.generate — VAE encode of the subject
    pixels, id-offset denoise, VAE decode, uint8 images — at the serving
    topology (full 19/38 W4A8 by default), 4-step 512². Before timing it
    runs an ENGAGE PROOF on a tiny real-init tree: one jitted forward with
    the condition ids as a traced argument must change its prediction under
    the w/2 offset (the serving tree itself is value-blind —
    direct_quantized_init's random magnitudes saturate the final LayerNorm;
    see the inline comment). The pipeline-level wiring
    (generate(subject_offset=True) changes the image) is pinned separately
    by tests/test_entry_contract.py::test_pipeline_true_cfg_and_subject_offset.
    Writes SUBJECT.json + the JSON line. The fidelity half lives in
    scripts/measure_fidelity.py --subject (proxy-preset live-gates bf16 vs
    W8A8/W4A8 SSIM -> FIDELITY_SUBJECT.json).

    Env: UNIGEN_BENCH_PRESET (full|proxy|tiny), UNIGEN_BENCH_RES (512),
    UNIGEN_BENCH_BATCHES (default "1,2")."""
    import jax
    import jax.numpy as jnp

    from unigen_tpu import presets
    from unigen_tpu.models import vae as vae_lib
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.ops.quant import quantize_unigen_serving, quantized_bytes
    from unigen_tpu.pipelines.flux import UniGenFluxPipeline

    res = int(os.environ.get("UNIGEN_BENCH_RES", "512"))
    batches = [int(x) for x in
               os.environ.get("UNIGEN_BENCH_BATCHES", "1,2").split(",")]
    num_steps = 4
    preset = os.environ.get("UNIGEN_BENCH_PRESET", "full")
    cfg = {"full": presets.flux_full, "proxy": presets.flux_bench,
           "tiny": presets.tiny}[preset]()
    bb = cfg.flux
    dtype = jnp.bfloat16
    t_len = 512
    if preset == "tiny":
        res, t_len = 64, 8

    def _init(k):
        p = init_unigen_flux_params(k, cfg, dtype=dtype)
        return quantize_unigen_serving(p) if preset != "tiny" else p

    t0 = time.time()
    params = (direct_quantized_init(jax.random.PRNGKey(0), _init)
              if preset != "tiny" else jax.jit(_init)(jax.random.PRNGKey(0)))
    jax.block_until_ready(params)
    if preset == "tiny":
        # fresh init zeroes the ControlNet-style gates (add_double/add_single,
        # layers/core.init_linear(zero=True)) which nulls the whole control
        # branch — the subject-offset engage-check below would trivially
        # pass/fail on nothing. Trained adapters have non-zero gates, and
        # direct_quantized_init fills them randomly on the full/proxy rungs;
        # mirror that here with small noise.
        kf = jax.random.PRNGKey(9)
        for name in ("add_double", "add_single"):
            if name in params["control"]:
                kf, ku = jax.random.split(kf)
                params["control"][name] = jax.tree.map(
                    lambda x: 0.02 * jax.random.normal(
                        ku, x.shape, jnp.float32).astype(x.dtype),
                    params["control"][name])
    print(f"# subject init {time.time()-t0:.1f}s resident="
          f"{quantized_bytes(params)/2**30:.2f}GiB", file=sys.stderr)

    vae_cfg = (vae_lib.tiny_vae_config(latent_channels=bb.in_channels // 4)
               if preset == "tiny" else vae_lib.VAEConfig())
    vae_params = jax.jit(lambda k: vae_lib.init_vae_params(k, vae_cfg))(
        jax.random.PRNGKey(1))
    pipe = UniGenFluxPipeline(cfg=cfg, params=params, vae_cfg=vae_cfg,
                              vae_params=vae_params, dtype=dtype)

    s_img = (res // 16) ** 2
    flops_image = model_flops_per_forward(cfg, s_img, t_len, s_img) * num_steps
    est_ref = 312e12 * 0.35 / flops_image

    def gen(b, subject: bool, seed=7):
        ks = jax.random.split(jax.random.PRNGKey(2), 4)
        # Subjects-200K-style sample: a normalized subject crop in [-1, 1]
        # (data/datasets.Subjects200K emits exactly this layout)
        subj_px = np.asarray(jax.random.uniform(
            ks[3], (b, 3, res, res), minval=-1, maxval=1), np.float32)
        return pipe.generate(
            prompt_embeds=jax.random.normal(
                ks[0], (b, t_len, bb.joint_attention_dim), dtype),
            pooled=jax.random.normal(ks[1], (b, bb.pooled_projection_dim),
                                     dtype),
            cond_pooled=jax.random.normal(
                ks[2], (b, bb.pooled_projection_dim), dtype),
            control_pixels=subj_px, height=res, width=res,
            num_inference_steps=num_steps, seed=seed,
            subject_offset=subject)

    rows = []
    for bi, b in enumerate(batches):
        try:
            t0 = time.time()
            img = gen(b, True)          # compile + warm
            compile_s = time.time() - t0
            if bi == 0:
                # WIRING proof on a tiny real-init tree (same code path as
                # the serving topology): the offset must change the
                # prediction through one jitted forward with the ids as a
                # traced argument. The check cannot run on the serving tree
                # itself: direct_quantized_init's random magnitudes explode
                # activations ~1e28 by the single blocks and the final
                # LayerNorm's variance overflows, saturating BOTH runs to
                # the same output (measured: moe_hidden delta 36 -> pred
                # delta 0.0 at full topology) - fine for timing, blind for
                # values. Real init keeps magnitudes sane; the zero-init
                # ControlNet gates are perturbed (trained gates are live).
                from unigen_tpu import config as _C
                from unigen_tpu.models.unigen_flux import (
                    init_unigen_flux_params, unigen_flux_forward)
                from unigen_tpu.ops.packing import prepare_latent_image_ids
                tcfg_chk = _C.UniGenConfig(
                    family="flux", flux=_C.tiny_flux_config(),
                    condition_types=("subject",))
                tparams = init_unigen_flux_params(jax.random.PRNGKey(0),
                                                  tcfg_chk)
                kf = jax.random.PRNGKey(9)
                for gname in ("add_double", "add_single"):
                    if gname in tparams["control"]:
                        kf, ku = jax.random.split(kf)
                        tparams["control"][gname] = jax.tree.map(
                            lambda x: 0.02 * jax.random.normal(
                                ku, x.shape, jnp.float32).astype(x.dtype),
                            tparams["control"][gname])
                tb_ = tcfg_chk.flux
                hw_c, t_c = 4, 8
                kc = jax.random.split(jax.random.PRNGKey(5), 6)
                fb = dict(
                    hidden=jax.random.normal(
                        kc[0], (1, hw_c * hw_c, tb_.in_channels)),
                    condition=jax.random.normal(
                        kc[1], (1, hw_c * hw_c, tb_.in_channels)),
                    encoder=jax.random.normal(
                        kc[2], (1, t_c, tb_.joint_attention_dim)),
                    pooled=jax.random.normal(
                        kc[3], (1, tb_.pooled_projection_dim)),
                    condition_pooled=jax.random.normal(
                        kc[4], (1, tb_.pooled_projection_dim)),
                    timestep=jnp.full((1,), 0.5),
                    img_ids=jnp.asarray(
                        np.asarray(prepare_latent_image_ids(hw_c, hw_c))),
                    txt_ids=jnp.zeros((t_c, 3)))
                jf = jax.jit(lambda p, ids, fb: unigen_flux_forward(
                    p, tcfg_chk, condition_ids=ids, **fb)[0])
                from unigen_tpu.data.conditions import condition_id_offset
                ids0 = prepare_latent_image_ids(hw_c, hw_c)
                # full packed-width separation, same as the serving path
                # (latent width = 2*hw_c)
                ids1 = prepare_latent_image_ids(
                    hw_c, hw_c, condition_id_offset("subject", 2 * hw_c))
                delta = float(jnp.max(jnp.abs(
                    jf(tparams, ids1, fb).astype(jnp.float32)
                    - jf(tparams, ids0, fb).astype(jnp.float32))))
                del tparams
                assert delta > 0, (
                    "subject id-offset did not change the model prediction")
                print(f"# subject-offset engaged (pred max delta {delta:.2e})",
                      file=sys.stderr)
            K = max(1, 2 // b)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(K):
                    out = gen(b, True)
                times.append((time.perf_counter() - t0) / K)
            dt = min(times)   # generate() returns host uint8 — already synced
            rows.append({"batch": b, "ips": round(b / dt, 4),
                         "latency_ms": round(dt * 1000, 1)})
            print(f"# subject b={b} compile={compile_s:.1f}s "
                  f"ips={b/dt:.3f} lat={dt*1000:.0f}ms", file=sys.stderr)
        except Exception as e:
            print(f"# subject b={b} failed: {type(e).__name__}: "
                  f"{str(e)[:300]}", file=sys.stderr)
    if not rows:
        print(json.dumps({"metric": "unigen_flux_subject_images_per_sec",
                          "value": 0.0, "unit": "images/sec/chip",
                          "vs_baseline": 0.0, "error": "all batches failed"}))
        return
    best = max(rows, key=lambda r: r["ips"])
    sub = {"config": f"flux_{bb.num_layers}dbl_{bb.num_single_layers}sgl_"
                     f"w{bb.inner_dim}_{'w4a8' if preset != 'tiny' else 'fp32'}"
                     f"_subject",
           "res": res, "steps": num_steps, "weights": "random",
           "e2e": "VAE encode + id-offset denoise + VAE decode (pipeline)",
           "rows": rows}
    # merge by resolution so a 1024^2 run doesn't clobber the 512^2 rows
    # (tiny CPU smokes skip the artifact)
    if preset != "tiny":
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "SUBJECT.json")
        merged = {}
        if os.path.exists(path):
            with open(path) as f:
                old_doc = json.load(f)
            if "runs" in old_doc:
                merged = old_doc
            elif "res" in old_doc:       # migrate the single-run layout
                merged = {"runs": {f"res_{old_doc['res']}": old_doc}}
        merged.setdefault("runs", {})[f"res_{res}"] = sub
        with open(path, "w") as f:
            json.dump(merged, f, indent=1)
    print(json.dumps({
        "metric": f"unigen_flux_subject_{res}px_images_per_sec",
        "value": best["ips"], "unit": "images/sec/chip",
        "vs_baseline": round(best["ips"] / est_ref, 3),
        "config": sub["config"]}))


def bench_multi():
    """UNIGEN_BENCH_MULTI=<K>: BASELINE config #4 — K-condition joint
    control (depth+canny+openpose style) at FULL 19/38 topology, W4A8, 512²
    4-step denoise. The MultiCondtion forward runs the MoE preprocess once
    per condition (summed expert outputs + tembs, reference
    UniGenTransformer.py:1274-1450); throughput + per-forward latency are
    recorded in MULTI.json and the JSON line."""
    import jax
    import jax.numpy as jnp

    from unigen_tpu import presets
    from unigen_tpu.models.unigen_flux import (init_unigen_flux_params,
                                               unigen_flux_forward)
    from unigen_tpu.ops.packing import prepare_latent_image_ids
    from unigen_tpu.ops.quant import quantize_unigen_serving, quantized_bytes
    from unigen_tpu.pipelines import scheduling

    k_cond = int(os.environ.get("UNIGEN_BENCH_MULTI", "3"))
    res = int(os.environ.get("UNIGEN_BENCH_RES", "512"))
    batches = [int(x) for x in
               os.environ.get("UNIGEN_BENCH_BATCHES", "1,2").split(",")]
    preset = os.environ.get("UNIGEN_BENCH_PRESET", "full")
    cfg = {"full": presets.flux_full, "proxy": presets.flux_bench,
           "tiny": presets.tiny}[preset]()
    bb = cfg.flux
    hw, t_len = res // 16, 512
    if preset == "tiny":
        hw, t_len = 4, 8
    s_img = hw * hw
    num_steps = 4
    dtype = jnp.bfloat16

    img_ids = np.asarray(prepare_latent_image_ids(hw, hw))
    txt_ids = np.zeros((t_len, 3), np.float32)
    sigmas = np.asarray(scheduling.inference_sigmas(
        scheduling.FlowMatchConfig(shift=1.0), num_steps)[0])

    def _init(k):
        p = init_unigen_flux_params(k, cfg, dtype=dtype)
        if preset != "tiny":
            p = quantize_unigen_serving(p)
        return p

    t0 = time.time()
    params = (direct_quantized_init(jax.random.PRNGKey(0), _init)
              if preset != "tiny" else jax.jit(_init)(jax.random.PRNGKey(0)))
    jax.block_until_ready(params)
    print(f"# multi init {time.time()-t0:.1f}s resident="
          f"{quantized_bytes(params)/2**30:.2f}GiB", file=sys.stderr)

    flops_image = model_flops_per_forward(cfg, s_img, t_len, s_img)
    # the MoE preprocess + weave runs per condition; approximate the extra
    # conditions' cost as the weave+expert term repeated (k-1) more times
    flops_image = flops_image * num_steps
    est_ref = 312e12 * 0.35 / flops_image

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    def measure(b):
        ks = jax.random.split(jax.random.PRNGKey(1), 6)
        prompt = jax.random.normal(ks[0], (b, t_len, bb.joint_attention_dim), dtype)
        pooled = jax.random.normal(ks[1], (b, bb.pooled_projection_dim), dtype)
        cond_pooled = jax.random.normal(
            ks[2], (k_cond, b, bb.pooled_projection_dim), dtype)
        condition = jax.random.normal(
            ks[3], (k_cond, b, s_img, bb.in_channels), dtype)
        latents0 = jax.random.normal(ks[4], (b, s_img, bb.in_channels), dtype)

        cache_k = int(os.environ.get("UNIGEN_BENCH_CACHE_INTERVAL", "1"))
        # UNIGEN_BENCH_CACHE_THRESHOLD: adaptive drift-refresh variant
        # (pipelines/caching.py) — the threshold rides as a traced scalar
        cache_thr = float(os.environ.get("UNIGEN_BENCH_CACHE_THRESHOLD", "0"))
        adaptive = cache_thr > 0.0
        # UNIGEN_BENCH_MODEL_CACHE_INTERVAL>1: full-model output caching
        model_k = int(os.environ.get("UNIGEN_BENCH_MODEL_CACHE_INTERVAL", "1"))
        if model_k > 1:
            assert cache_k <= 1 and not adaptive, \
                "model cache and control cache are mutually exclusive"
        # UNIGEN_BENCH_HYBRID_CACHE=<c:m>: three-level hybrid cache
        hyb_c, hyb_m = _parse_hybrid_env()
        if hyb_m > 1:
            assert cache_k <= 1 and model_k <= 1 and not adaptive, \
                "hybrid cache excludes the other cache knobs"

        def denoise(params, latents, condition, prompt, pooled, cond_pooled,
                    threshold=None):
            from unigen_tpu.pipelines import caching
            sig = jnp.asarray(sigmas)
            ids_i = jnp.asarray(img_ids)
            ids_t = jnp.asarray(txt_ids)
            ids_c = jnp.broadcast_to(ids_i[None],
                                     (k_cond,) + ids_i.shape)

            def fwd(lat, i, **kw):
                pred, _, outs = unigen_flux_forward(
                    params, cfg, hidden=lat, condition=condition,
                    encoder=prompt, pooled=pooled,
                    condition_pooled=cond_pooled,
                    timestep=jnp.full((b,), sig[i], dtype),
                    img_ids=ids_i, txt_ids=ids_t, condition_ids=ids_c,
                    attn_impl="auto", **kw)
                return pred, outs

            if (cache_k <= 1 and not adaptive and model_k <= 1
                    and hyb_m <= 1):
                def step(lat, i):
                    pred, _ = fwd(lat, i)
                    return scheduling.euler_step(lat, pred, sig[i],
                                                 sig[i + 1]), None
                latents, _ = jax.lax.scan(step, latents,
                                          jnp.arange(num_steps))
                return latents

            if model_k > 1:
                # FULL-MODEL output caching (UNIGEN_BENCH_MODEL_CACHE_ORDER=1
                # -> first-order Taylor replay)
                latents, _ = caching.model_cache_scan(
                    lambda l, i: fwd(l, i)[0], latents, sig, num_steps,
                    cache_interval=model_k,
                    order=int(os.environ.get("UNIGEN_BENCH_MODEL_CACHE_ORDER",
                                             "0")))
                return latents

            # control-residual caching pays off MOST here: the cached branch
            # includes the per-condition MoE preprocess (xK conditions)
            d = bb.inner_dim
            zero = (jnp.zeros((bb.num_layers, b, s_img, d), dtype),
                    jnp.zeros((bb.num_single_layers, b, t_len + s_img, d),
                              dtype))

            if hyb_m > 1:
                # HYBRID three-level cache (SERVING.md rung 3c)
                latents, _, _ = caching.hybrid_cache_scan(
                    lambda l, i: (lambda pr, o:
                                  (pr, o["control_residuals"]))(
                        *fwd(l, i, return_control_residuals=True)),
                    lambda l, i, r: fwd(l, i, control_residuals=r)[0],
                    latents, sig, num_steps, control_interval=hyb_c,
                    model_interval=hyb_m, residuals_init=zero,
                    order=int(os.environ.get("UNIGEN_BENCH_MODEL_CACHE_ORDER",
                                             "0")))
                return latents

            def step(carry, i):
                if adaptive:
                    lat, res, lat_ref = carry
                    refresh = caching.refresh_decision(i, lat, lat_ref,
                                                       threshold)
                else:
                    lat, res = carry
                    refresh = (i % cache_k) == 0

                def full():
                    pred, outs = fwd(lat, i, return_control_residuals=True)
                    return pred, outs["control_residuals"]

                def replay():
                    pred, _ = fwd(lat, i, control_residuals=res)
                    return pred, res

                pred, res = jax.lax.cond(refresh, full, replay)
                nxt = scheduling.euler_step(lat, pred, sig[i], sig[i + 1])
                if adaptive:
                    return (nxt, res, jnp.where(refresh, lat, lat_ref)), None
                return (nxt, res), None

            if adaptive:
                (latents, _, _), _ = jax.lax.scan(
                    step, (latents, zero, latents), jnp.arange(num_steps))
            else:
                (latents, _), _ = jax.lax.scan(step, (latents, zero),
                                               jnp.arange(num_steps))
            return latents

        jfn = jax.jit(denoise)
        if adaptive:
            fn = lambda: jfn(params, latents0, condition, prompt, pooled,
                             cond_pooled, jnp.float32(cache_thr))
        else:
            fn = lambda: jfn(params, latents0, condition, prompt, pooled,
                             cond_pooled)
        t0 = time.time()
        _ = sync(fn())
        compile_s = time.time() - t0
        K = max(1, 2 // b)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K):
                out = fn()
            _ = sync(out)
            times.append((time.perf_counter() - t0) / K)
        dt = min(times)
        print(f"# multi k={k_cond} b={b} compile={compile_s:.1f}s "
              f"step={dt*1000:.1f}ms ips={b/dt:.3f} "
              f"fwd_ms={dt*1000/num_steps:.1f}", file=sys.stderr)
        return b / dt, dt * 1000 / num_steps

    results = {}
    for b in batches:
        try:
            ips, fwd_ms = measure(b)
            results[b] = {"ips": round(ips, 4), "fwd_ms": round(fwd_ms, 1)}
        except Exception as e:
            print(f"# multi b={b} failed: {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr)
    if not results:
        print(json.dumps({"metric": "unigen_flux_multicond_images_per_sec",
                          "value": 0.0, "unit": "images/sec/chip",
                          "vs_baseline": 0.0, "error": "all batches failed"}))
        return
    best = max(results, key=lambda b: results[b]["ips"])
    cache_k = int(os.environ.get("UNIGEN_BENCH_CACHE_INTERVAL", "1"))
    cache_thr = float(os.environ.get("UNIGEN_BENCH_CACHE_THRESHOLD", "0"))
    model_k = int(os.environ.get("UNIGEN_BENCH_MODEL_CACHE_INTERVAL", "1"))
    model_o = os.environ.get("UNIGEN_BENCH_MODEL_CACHE_ORDER") == "1"
    hyb_c, hyb_m = _parse_hybrid_env()
    suffix = (f"_hybc{hyb_c}m{hyb_m}{'_o1' if model_o else ''}" if hyb_m > 1
              else f"_modelcache{model_k}{'_o1' if model_o else ''}" if model_k > 1
              else f"_ctrlcache_thr{cache_thr}" if cache_thr > 0
              else f"_ctrlcache{cache_k}" if cache_k > 1 else "")
    doc = {"config": f"flux_{bb.num_layers}dbl_{bb.num_single_layers}sgl_"
                     f"w{bb.inner_dim}_w4a8_multi{k_cond}{suffix}",
           "res": res, "k_conditions": k_cond, "rows": results}
    # cached runs get their own artifact so the exact MULTI.json survives;
    # MULTI_CACHE.json merges across intervals/thresholds (one section each)
    here = os.path.dirname(os.path.abspath(__file__))
    if cache_k > 1 or cache_thr > 0 or model_k > 1 or hyb_m > 1:
        path = os.path.join(here, "MULTI_CACHE.json")
        merged = {}
        if os.path.exists(path):
            with open(path) as f:
                merged = json.load(f)
        key = (f"hybrid_{hyb_c}_{hyb_m}{'_o1' if model_o else ''}"
               if hyb_m > 1
               else f"model_{model_k}{'_o1' if model_o else ''}" if model_k > 1
               else f"threshold_{cache_thr}" if cache_thr > 0
               else f"interval_{cache_k}")
        merged[key] = doc
        with open(path, "w") as f:
            json.dump(merged, f, indent=1)
    else:
        with open(os.path.join(here, "MULTI.json"), "w") as f:
            json.dump(doc, f, indent=1)
    print(json.dumps({
        "metric": f"unigen_flux_multicond{k_cond}_{res}px_images_per_sec",
        "value": results[best]["ips"], "unit": "images/sec/chip",
        "vs_baseline": round(results[best]["ips"] / est_ref, 3),
        "config": doc["config"]}))


def bench_cache():
    """UNIGEN_BENCH_CACHE=<k[,k2]>: control-residual step caching (the
    control branch — MoE preprocess + control double/single blocks + gated
    adds — is ~46% of the serving step at full topology, PROFILE_FULL.json;
    recomputing it every k-th denoise step and replaying the cached
    per-block residual adds in between trades fidelity for throughput,
    FORA/TeaCache-style but scoped to the control branch only so the base
    trajectory always gets fresh compute).

    Full 19/38 W4A8, 512² 4-step denoise. For each k: throughput of the
    cached program vs the exact program on the same weights/inputs, plus
    image-space SSIM/PSNR between their outputs through the tiny-VAE decode
    (same relative-fidelity method as measure_fidelity). Writes CACHE.json
    and prints the best cached rung as the JSON line.

    UNIGEN_BENCH_CACHE_ADAPTIVE=<thr[,thr2]> additionally measures the
    adaptive drift-threshold mode (pipelines/caching.py): the control cache
    refreshes when the latent drifts more than thr (relative L1) since the
    last refresh — refreshes concentrate early in the sigma schedule where
    the trajectory moves fastest; rows record the data-dependent refresh
    count.

    UNIGEN_BENCH_MODEL_CACHE=<k[,k2]> / UNIGEN_BENCH_MODEL_CACHE_ADAPTIVE=
    <thr[,thr2]> measure FULL-MODEL output caching (replay steps skip the
    entire transformer and reuse the cached prediction — the most
    aggressive cache rung; pipelines model_cache_*). Rows land in
    CACHE.json model_rows / model_adaptive_rows with the same
    SSIM-vs-exact gate.

    UNIGEN_BENCH_HYBRID_CACHE=<c:m[,c2:m2]> measures the HYBRID three-level
    cache (docs/SERVING.md rung 3c): full refresh every c steps, base
    transformer with control-residual replay every m steps between,
    prediction replay otherwise (caching.hybrid_cache_scan; m must divide
    c). Rows land in CACHE.json hybrid_rows.

    UNIGEN_BENCH_HYBRID_ADAPTIVE=<cthr:mthr[,...]> measures the
    fully-ADAPTIVE hybrid: both refresh decisions are drift thresholds
    riding as traced scalars, so ONE compiled program serves the whole
    sweep (cthr > mthr; rows → CACHE.json hybrid_adaptive_rows)."""
    import jax
    import jax.numpy as jnp

    from unigen_tpu import presets
    from unigen_tpu.models import vae as vae_lib
    from unigen_tpu.models.unigen_flux import (init_unigen_flux_params,
                                               unigen_flux_forward)
    from unigen_tpu.ops.packing import prepare_latent_image_ids, unpack_latents
    from unigen_tpu.ops.quant import quantize_unigen_serving, quantized_bytes
    from unigen_tpu.pipelines import scheduling

    intervals = [int(x) for x in
                 os.environ.get("UNIGEN_BENCH_CACHE", "").split(",") if x]
    res = int(os.environ.get("UNIGEN_BENCH_RES", "512"))
    b = int(os.environ.get("UNIGEN_BENCH_CACHE_BATCH", "2"))
    preset = os.environ.get("UNIGEN_BENCH_PRESET", "full")
    cfg = {"full": presets.flux_full, "proxy": presets.flux_bench,
           "tiny": presets.tiny}[preset]()
    bb = cfg.flux
    hw, t_len = res // 16, 512
    if preset == "tiny":
        hw, t_len = 4, 8
    s_img = hw * hw
    num_steps = 4
    dtype = jnp.bfloat16

    img_ids = np.asarray(prepare_latent_image_ids(hw, hw))
    txt_ids = np.zeros((t_len, 3), np.float32)
    sigmas = np.asarray(scheduling.inference_sigmas(
        scheduling.FlowMatchConfig(shift=1.0), num_steps)[0])

    def _init(k):
        p = init_unigen_flux_params(k, cfg, dtype=dtype)
        # the gated add projections are ZERO-initialised (ControlNet
        # convention) — with them at zero the control branch contributes
        # nothing and cached-vs-exact fidelity is trivially exact. This
        # matters on the tiny/CPU path which runs _init for real; the full
        # preset goes through direct_quantized_init, whose random-byte leaf
        # fill already gives the adds (and every other leaf) non-zero
        # weight. Bump here so BOTH paths measure a live control branch.
        def bump(tree, key):
            leaves, treedef = jax.tree.flatten(tree)
            ks = jax.random.split(key, len(leaves))
            return jax.tree.unflatten(treedef, [
                x + 0.01 * jax.random.normal(kk, x.shape, x.dtype)
                if x.ndim >= 2 else x for x, kk in zip(leaves, ks)])
        ctrl = dict(p["control"])
        ctrl["add_double"] = bump(ctrl["add_double"], jax.random.PRNGKey(7))
        ctrl["add_single"] = bump(ctrl["add_single"], jax.random.PRNGKey(8))
        p = {"base": p["base"], "control": ctrl}
        if preset != "tiny":
            p = quantize_unigen_serving(p)
        return p

    t0 = time.time()
    params = (direct_quantized_init(jax.random.PRNGKey(0), _init)
              if preset != "tiny" else jax.jit(_init)(jax.random.PRNGKey(0)))
    jax.block_until_ready(params)
    print(f"# cache init {time.time()-t0:.1f}s resident="
          f"{quantized_bytes(params)/2**30:.2f}GiB", file=sys.stderr)

    flops_image = model_flops_per_forward(cfg, s_img, t_len, s_img) * num_steps
    est_ref = 312e12 * 0.35 / flops_image

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    prompt = jax.random.normal(ks[0], (b, t_len, bb.joint_attention_dim), dtype)
    pooled = jax.random.normal(ks[1], (b, bb.pooled_projection_dim), dtype)
    cond_pooled = jax.random.normal(ks[2], (b, bb.pooled_projection_dim), dtype)
    condition = jax.random.normal(ks[3], (b, s_img, bb.in_channels), dtype)
    latents0 = jax.random.normal(ks[4], (b, s_img, bb.in_channels), dtype)

    model_order = int(os.environ.get("UNIGEN_BENCH_MODEL_CACHE_ORDER", "0"))

    # UNIGEN_BENCH_RESBITS=8: store the control-residual cache int8 with
    # per-token scales (ops/quant.quantize_residual) — halves the carry HBM;
    # applies to the control-cache and hybrid rungs (the model cache has no
    # residual cache)
    res_bits = int(os.environ.get("UNIGEN_BENCH_RESBITS", "16"))

    def make_denoise(interval: int, adaptive: bool = False,
                     model_cache: bool = False, hybrid: int = 1,
                     hybrid_adaptive: bool = False):
        # adaptive: the threshold rides as a traced scalar argument — ONE
        # compiled program serves the whole threshold sweep (each baked-in
        # threshold would otherwise be a fresh 5-8 min remote compile).
        # model_cache: replay steps skip the ENTIRE transformer and reuse
        # the cached prediction (pipelines model_cache_*;
        # UNIGEN_BENCH_MODEL_CACHE_ORDER=1 -> first-order Taylor replay).
        # hybrid>1: three-level cache — full refresh every `interval`
        # steps, base-with-control-replay every `hybrid` steps between,
        # prediction replay otherwise (caching.hybrid_cache_scan)

        def denoise(params, latents, condition, prompt, pooled, cond_pooled,
                    threshold=None, threshold2=None):
            from unigen_tpu.pipelines import caching
            sig = jnp.asarray(sigmas)
            ids_i = jnp.asarray(img_ids)
            ids_t = jnp.asarray(txt_ids)

            def fwd(lat, i, **kw):
                pred, _, outs = unigen_flux_forward(
                    params, cfg, hidden=lat, condition=condition,
                    encoder=prompt, pooled=pooled, condition_pooled=cond_pooled,
                    timestep=jnp.full((b,), sig[i], dtype),
                    img_ids=ids_i, txt_ids=ids_t, condition_ids=ids_i,
                    attn_impl="auto", **kw)
                return pred, outs

            if (interval <= 1 and not adaptive and hybrid <= 1
                    and not hybrid_adaptive):
                def step(lat, i):
                    pred, _ = fwd(lat, i)
                    return scheduling.euler_step(lat, pred, sig[i],
                                                 sig[i + 1]), None
                latents, _ = jax.lax.scan(step, latents,
                                          jnp.arange(num_steps))
                return latents, jnp.asarray(num_steps, jnp.int32)

            if model_cache:
                return caching.model_cache_scan(
                    lambda l, i: fwd(l, i)[0], latents, sig, num_steps,
                    cache_interval=interval, adaptive=adaptive,
                    threshold=threshold if adaptive else None,
                    order=model_order)

            d = bb.inner_dim
            shapes = ((bb.num_layers, b, s_img, d),
                      (bb.num_single_layers, b, t_len + s_img, d))
            if res_bits == 8:
                zero = tuple({"q": jnp.zeros(s, jnp.int8),
                              "s": jnp.zeros(s[:-1] + (1,), jnp.float32)}
                             for s in shapes)
            else:
                zero = tuple(jnp.zeros(s, dtype) for s in shapes)

            if hybrid > 1 or hybrid_adaptive:
                latents, n_full, n_base = caching.hybrid_cache_scan(
                    lambda l, i: (lambda pr, o:
                                  (pr, o["control_residuals"]))(
                        *fwd(l, i, return_control_residuals=True,
                             control_residuals_bits=res_bits)),
                    lambda l, i, r: fwd(l, i, control_residuals=r)[0],
                    latents, sig, num_steps, control_interval=interval,
                    model_interval=hybrid, residuals_init=zero,
                    order=model_order, adaptive=hybrid_adaptive,
                    control_threshold=threshold, model_threshold=threshold2)
                return latents, jnp.asarray(n_full + n_base, jnp.int32)

            def step(carry, i):
                if adaptive:
                    lat, res, lat_ref, n_ref = carry
                    refresh = caching.refresh_decision(i, lat, lat_ref,
                                                       threshold)
                else:
                    lat, res = carry
                    refresh = (i % interval) == 0

                def full():
                    pred, outs = fwd(lat, i,
                                     return_control_residuals=True,
                                     control_residuals_bits=res_bits)
                    return pred, outs["control_residuals"]

                def replay():
                    pred, _ = fwd(lat, i, control_residuals=res)
                    return pred, res

                pred, res = jax.lax.cond(refresh, full, replay)
                lat_next = scheduling.euler_step(lat, pred, sig[i], sig[i + 1])
                if adaptive:
                    lat_ref = jnp.where(refresh, lat, lat_ref)
                    n_ref = n_ref + refresh.astype(jnp.int32)
                    return (lat_next, res, lat_ref, n_ref), None
                return (lat_next, res), None

            if adaptive:
                (latents, _, _, n_ref), _ = jax.lax.scan(
                    step, (latents, zero, latents, jnp.zeros((), jnp.int32)),
                    jnp.arange(num_steps))
                return latents, n_ref
            (latents, _), _ = jax.lax.scan(step, (latents, zero),
                                           jnp.arange(num_steps))
            return latents, jnp.asarray(num_steps // interval
                                        + (1 if num_steps % interval else 0),
                                        jnp.int32)
        return denoise

    # tiny-VAE decode for image-space relative fidelity (host vae params —
    # no device closure constants)
    vae_cfg = vae_lib.tiny_vae_config(latent_channels=bb.in_channels // 4)
    vae_host = jax.tree.map(lambda x: np.asarray(x, np.float32),
                            vae_lib.init_vae_params(jax.random.PRNGKey(2),
                                                    vae_cfg))
    lh = lw = hw * 2

    @jax.jit
    def decode(lat, vae_params):
        px = vae_lib.vae_decode(vae_params, vae_cfg,
                                unpack_latents(lat.astype(jnp.float32), lh, lw))
        return jnp.clip(px, -1, 1)

    def to_u8(px):
        return ((np.asarray(px, np.float32).transpose(0, 2, 3, 1) + 1)
                * 127.5).round().astype(np.uint8)

    _adaptive_jfn = {}  # one compiled program per mode, reused across sweeps

    def run(interval: int, threshold: float = 0.0, model_cache: bool = False,
            hybrid: int = 1, hybrid_thr=None):
        if hybrid_thr is not None:
            # BOTH thresholds traced: one compiled program serves the sweep
            if "hybrid" not in _adaptive_jfn:
                _adaptive_jfn["hybrid"] = jax.jit(
                    make_denoise(1, hybrid_adaptive=True))
            jfn = _adaptive_jfn["hybrid"]
            fn = lambda: jfn(params, latents0, condition, prompt, pooled,
                             cond_pooled, jnp.float32(hybrid_thr[0]),
                             jnp.float32(hybrid_thr[1]))
        elif threshold > 0:
            if model_cache not in _adaptive_jfn:
                _adaptive_jfn[model_cache] = jax.jit(
                    make_denoise(1, adaptive=True, model_cache=model_cache))
            jfn = _adaptive_jfn[model_cache]
            fn = lambda: jfn(params, latents0, condition, prompt, pooled,
                             cond_pooled, jnp.float32(threshold))
        else:
            jfn = jax.jit(make_denoise(interval, model_cache=model_cache,
                                       hybrid=hybrid))
            fn = lambda: jfn(params, latents0, condition, prompt, pooled,
                             cond_pooled)
        t0 = time.time()
        out, n_ref = fn()
        _ = sync(out)
        compile_s = time.time() - t0
        n_refresh = int(n_ref)
        img = to_u8(decode(out, vae_host))
        K = max(1, 4 // b)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K):
                out, _n = fn()
            _ = sync(out)
            times.append((time.perf_counter() - t0) / K)
        dt = min(times)
        tag = (f"thr_c={hybrid_thr[0]} thr_m={hybrid_thr[1]}"
               if hybrid_thr is not None
               else f"threshold={threshold}" if threshold > 0
               else f"c={interval} m={hybrid}" if hybrid > 1
               else f"interval={interval}")
        if model_cache:
            tag = "model_" + tag
        elif hybrid > 1 or hybrid_thr is not None:
            tag = "hybrid " + tag
        print(f"# cache {tag} b={b} compile={compile_s:.1f}s "
              f"step={dt*1000:.1f}ms ips={b/dt:.3f} refreshes={n_refresh}",
              file=sys.stderr)
        return b / dt, img, n_refresh

    from unigen_tpu.eval import image_metrics
    ips_exact, img_exact, _ = run(1)

    def fidelity_row(ips_k, img_k, extra):
        m = image_metrics(img_exact, img_k)
        mae = float(np.mean(np.abs(img_exact.astype(np.float32)
                                   - img_k.astype(np.float32))))
        row = dict(extra, ips=round(ips_k, 4),
                   speedup=round(ips_k / ips_exact, 3),
                   ssim_vs_exact=round(m["ssim"], 5),
                   psnr_vs_exact=round(m["psnr"], 2),
                   mae_u8=round(mae, 3))
        print(f"# {extra}: {ips_k:.3f} img/s ({ips_k/ips_exact:.2f}x) "
              f"ssim={m['ssim']:.5f}", file=sys.stderr)
        return row

    rows = []
    for k in intervals:
        if k <= 1:
            continue
        try:
            ips_k, img_k, _ = run(k)
        except Exception as e:
            print(f"# cache interval={k} failed: {type(e).__name__}: "
                  f"{str(e)[:300]}", file=sys.stderr)
            continue
        extra_r = {"interval": k}
        if res_bits != 16:
            extra_r["residual_bits"] = res_bits
        rows.append(fidelity_row(ips_k, img_k, extra_r))

    # adaptive drift-threshold rows (pipelines/caching.py):
    # UNIGEN_BENCH_CACHE_ADAPTIVE=<thr[,thr2]> — refresh count is
    # data-dependent, recorded per row
    adaptive_rows = []
    for thr in [float(x) for x in
                os.environ.get("UNIGEN_BENCH_CACHE_ADAPTIVE", "").split(",")
                if x]:
        try:
            ips_t, img_t, n_ref = run(1, threshold=thr)
        except Exception as e:
            print(f"# cache threshold={thr} failed: {type(e).__name__}: "
                  f"{str(e)[:300]}", file=sys.stderr)
            continue
        adaptive_rows.append(fidelity_row(
            ips_t, img_t, {"threshold": thr, "refreshes": n_ref,
                           "num_steps": num_steps}))

    # FULL-MODEL output caching rows (replay steps skip the entire
    # transformer): UNIGEN_BENCH_MODEL_CACHE=<k[,k2]> and
    # UNIGEN_BENCH_MODEL_CACHE_ADAPTIVE=<thr[,thr2]>
    model_rows, model_adaptive_rows = [], []
    for k in [int(x) for x in
              os.environ.get("UNIGEN_BENCH_MODEL_CACHE", "").split(",") if x]:
        if k <= 1:
            continue
        try:
            ips_k, img_k, n_ref = run(k, model_cache=True)
        except Exception as e:
            print(f"# model cache interval={k} failed: {type(e).__name__}: "
                  f"{str(e)[:300]}", file=sys.stderr)
            continue
        extra = {"interval": k, "refreshes": n_ref}
        if model_order:
            extra["order"] = model_order
        model_rows.append(fidelity_row(ips_k, img_k, extra))
    for thr in [float(x) for x in
                os.environ.get("UNIGEN_BENCH_MODEL_CACHE_ADAPTIVE",
                               "").split(",") if x]:
        try:
            ips_t, img_t, n_ref = run(1, threshold=thr, model_cache=True)
        except Exception as e:
            print(f"# model cache threshold={thr} failed: "
                  f"{type(e).__name__}: {str(e)[:300]}", file=sys.stderr)
            continue
        extra = {"threshold": thr, "refreshes": n_ref, "num_steps": num_steps}
        if model_order:
            extra["order"] = model_order
        model_adaptive_rows.append(fidelity_row(ips_t, img_t, extra))

    # HYBRID three-level cache rows: UNIGEN_BENCH_HYBRID_CACHE=<c:m[,c2:m2]>
    # — full refresh every c steps, base-with-control-replay every m steps
    # between, prediction replay otherwise (caching.hybrid_cache_scan)
    hybrid_rows = []
    for spec in os.environ.get("UNIGEN_BENCH_HYBRID_CACHE", "").split(","):
        if not spec:
            continue
        c, m = (int(x) for x in spec.split(":"))
        if m <= 1 or c <= m or c % m:
            print(f"# hybrid cache {spec} skipped: need m>1, c>m, m|c",
                  file=sys.stderr)
            continue
        try:
            ips_k, img_k, _ = run(c, hybrid=m)
        except Exception as e:
            print(f"# hybrid cache {spec} failed: {type(e).__name__}: "
                  f"{str(e)[:300]}", file=sys.stderr)
            continue
        extra = {"control_interval": c, "model_interval": m}
        if model_order:
            extra["order"] = model_order
        if res_bits != 16:
            extra["residual_bits"] = res_bits
        hybrid_rows.append(fidelity_row(ips_k, img_k, extra))

    # fully-ADAPTIVE hybrid rows: UNIGEN_BENCH_HYBRID_ADAPTIVE=
    # <cthr:mthr[,cthr2:mthr2]> — both thresholds ride traced, so ONE
    # compiled program serves the whole sweep
    hybrid_adaptive_rows = []
    for spec in os.environ.get("UNIGEN_BENCH_HYBRID_ADAPTIVE",
                               "").split(","):
        if not spec:
            continue
        tc, tm = (float(x) for x in spec.split(":"))
        if tc <= tm:
            print(f"# adaptive hybrid {spec} skipped: need cthr > mthr",
                  file=sys.stderr)
            continue
        try:
            ips_k, img_k, n_ref = run(1, hybrid_thr=(tc, tm))
        except Exception as e:
            print(f"# adaptive hybrid {spec} failed: {type(e).__name__}: "
                  f"{str(e)[:300]}", file=sys.stderr)
            continue
        extra = {"control_threshold": tc, "model_threshold": tm,
                 "refreshes": n_ref, "num_steps": num_steps}
        if model_order:
            extra["order"] = model_order
        hybrid_adaptive_rows.append(fidelity_row(ips_k, img_k, extra))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "CACHE.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except Exception:
        doc = {}
    if preset != "tiny":                   # tiny smokes must not clobber
        doc["config"] = (f"flux_{bb.num_layers}dbl_{bb.num_single_layers}"
                         f"sgl_w{bb.inner_dim}_w4a8_ctrlcache")
    doc["num_steps"] = num_steps
    # honesty label: every fidelity/threshold operating point in this file
    # was measured on randomly initialized weights (no released checkpoint
    # reachable here). Post-step-0 drift on random weights is only ~2-5%;
    # real-weight drift sits higher, so adaptive thresholds need a retune
    # (cheap: thresholds are traced scalars, no recompile) — see
    # scripts/validate_real_ckpt.py checklist.
    doc["weights"] = "random"
    doc["weights_note"] = ("adaptive thresholds tuned on random-weight "
                           "drift; retune on real checkpoints via "
                           "scripts/validate_real_ckpt.py")
    doc.setdefault("res", 512)             # runs.b{N} rows are 512² ones;
    runs = doc.setdefault("runs", {})      # other resolutions get their own
    rk = f"b{b}" if res == doc["res"] else f"b{b}_r{res}"   # res-tagged key
    if preset == "tiny":
        rk += "_tiny"                      # keep smoke runs out of real rows
    prev = runs.get(rk, {})
    _rk_ = lambda r: (r["interval"], r.get("residual_bits", 16))
    merged = {_rk_(r): r for r in prev.get("rows", [])}
    merged.update({_rk_(r): r for r in rows})
    merged_a = {r["threshold"]: r for r in prev.get("adaptive_rows", [])}
    merged_a.update({r["threshold"]: r for r in adaptive_rows})
    # model rows key on (interval|threshold, order) so zero-order and
    # first-order Taylor replay rungs coexist in the artifact
    _mk = lambda r, f: (r[f], r.get("order", 0))
    merged_m = {_mk(r, "interval"): r for r in prev.get("model_rows", [])}
    merged_m.update({_mk(r, "interval"): r for r in model_rows})
    merged_ma = {_mk(r, "threshold"): r
                 for r in prev.get("model_adaptive_rows", [])}
    merged_ma.update({_mk(r, "threshold"): r for r in model_adaptive_rows})
    _hk = lambda r: (r["control_interval"], r["model_interval"],
                     r.get("order", 0), r.get("residual_bits", 16))
    merged_h = {_hk(r): r for r in prev.get("hybrid_rows", [])}
    merged_h.update({_hk(r): r for r in hybrid_rows})
    _hak = lambda r: (r["control_threshold"], r["model_threshold"],
                      r.get("order", 0))
    merged_ha = {_hak(r): r for r in prev.get("hybrid_adaptive_rows", [])}
    merged_ha.update({_hak(r): r for r in hybrid_adaptive_rows})
    runs[rk] = {"ips_exact": round(ips_exact, 4),
                "rows": [merged[k] for k in sorted(merged)]}
    if res != doc["res"]:
        runs[rk]["res"] = res
    if merged_a:
        runs[rk]["adaptive_rows"] = [merged_a[t] for t in sorted(merged_a)]
    if merged_m:
        runs[rk]["model_rows"] = [merged_m[k] for k in sorted(merged_m)]
    if merged_ma:
        runs[rk]["model_adaptive_rows"] = [merged_ma[t]
                                           for t in sorted(merged_ma)]
    if merged_h:
        runs[rk]["hybrid_rows"] = [merged_h[k] for k in sorted(merged_h)]
    if merged_ha:
        runs[rk]["hybrid_adaptive_rows"] = [merged_ha[k]
                                            for k in sorted(merged_ha)]
    doc.pop("batch", None); doc.pop("ips_exact", None); doc.pop("rows", None)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    all_rows = rows + adaptive_rows
    hybrid_rows = hybrid_rows + hybrid_adaptive_rows
    if not (all_rows or model_rows or model_adaptive_rows or hybrid_rows):
        print(json.dumps({"metric": "unigen_flux_ctrlcache_images_per_sec",
                          "value": 0.0, "unit": "images/sec/chip",
                          "vs_baseline": 0.0, "error": "all intervals failed"}))
        return
    # the headline cached rung stays the control cache (base trajectory
    # always fresh); model-cache/hybrid rows are reported in CACHE.json
    # only, unless they are the only rows measured this run
    pool = (all_rows or (model_rows + model_adaptive_rows)
            or hybrid_rows)
    best = max(pool, key=lambda r: r["ips"])
    prefix = ("ctrlcache" if all_rows
              else "modelcache" if (model_rows or model_adaptive_rows)
              else "hybridcache")
    tag = (f"{prefix}{best['interval']}" if "interval" in best
           else f"{prefix}_thr{best['threshold']}" if "threshold" in best
           else f"{prefix}_c{best['control_interval']}"
                f"m{best['model_interval']}" if "control_interval" in best
           else f"{prefix}_adaptive_c{best['control_threshold']}"
                f"m{best['model_threshold']}")
    print(json.dumps({
        "metric": f"unigen_flux_{tag}_{res}px_images_per_sec",
        "value": best["ips"], "unit": "images/sec/chip",
        "vs_baseline": round(best["ips"] / est_ref, 3),
        "config": doc["config"], "ssim_vs_exact": best["ssim_vs_exact"]}))


def bench_stepserver():
    """UNIGEN_BENCH_STEPSERVER=1: step-level continuous batching
    (serving_steps.StepServer) at full topology W4A8 — measures (a) the
    per-tick step time at full occupancy, (b) cold single-request latency
    (the bound on admission delay), and (c) sustained throughput with
    staggered arrivals, vs the request-batched ideal. Writes STEPSERVE.json."""
    import jax
    import jax.numpy as jnp

    from unigen_tpu import config as C, presets
    from unigen_tpu.models import vae as vae_lib
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.ops.quant import quantize_unigen_serving, quantized_bytes
    from unigen_tpu.serving_steps import StepServer

    fam = os.environ.get("UNIGEN_BENCH_STEP_FAMILY", "flux")
    if fam == "sana":
        return bench_stepserver_sana()
    if fam == "sd3":
        return bench_stepserver_sd3()
    if os.environ.get("UNIGEN_BENCH_STEP_MULTIRES"):
        return bench_stepserver_multires()
    res = int(os.environ.get("UNIGEN_BENCH_RES", "512"))
    B = int(os.environ.get("UNIGEN_BENCH_STEP_SLOTS", "4"))
    # UNIGEN_BENCH_STEP_CACHE=k composes the per-slot model cache with
    # continuous batching (serving_steps docstring): replay ticks gather
    # only the refreshing slots into the smallest compiled program
    cache_k = int(os.environ.get("UNIGEN_BENCH_STEP_CACHE", "1"))
    cache_order = int(os.environ.get("UNIGEN_BENCH_STEP_CACHE_ORDER", "0"))
    # UNIGEN_BENCH_STEP_HYBRID=c adds the per-slot control-residual cache on
    # top: full refresh every c-th OWN step, base-with-control-replay every
    # k-th, prediction replay otherwise (the hybrid three-level schedule)
    cache_c = int(os.environ.get("UNIGEN_BENCH_STEP_HYBRID", "1"))
    # UNIGEN_BENCH_STEP_RESBITS=8 stores the per-slot control-residual cache
    # int8 with per-token scales (half the cache HBM — the slot-count lever:
    # bf16 residuals are 0.47 GiB/slot at 512², ~1.9 GiB/slot at 1024²)
    res_bits = int(os.environ.get("UNIGEN_BENCH_STEP_RESBITS", "16"))
    # UNIGEN_BENCH_STEP_ADAPTIVE="tc:tm[:lag]" replaces the fixed per-slot
    # intervals with the adaptive drift thresholds (host-pulled per-slot
    # drift vector; serving_steps docstring): "0.05:0.02" = fully-adaptive
    # hybrid, ":0.02" = adaptive model cache, "0.05:" = adaptive control
    # cache. Optional third field 1 = adaptive_lag (pipelined one-tick-stale
    # drift decisions — the pull no longer serializes ticks).
    # Mutually exclusive with _STEP_CACHE/_STEP_HYBRID.
    thr_spec = os.environ.get("UNIGEN_BENCH_STEP_ADAPTIVE", "")
    thr_c = thr_m = 0.0
    adaptive_lag = 0
    if thr_spec:
        parts = thr_spec.split(":")
        thr_c = float(parts[0]) if parts[0] else 0.0
        thr_m = float(parts[1]) if len(parts) > 1 and parts[1] else 0.0
        adaptive_lag = int(parts[2]) if len(parts) > 2 and parts[2] else 0
    # UNIGEN_BENCH_STEP_MULTITICK=K (exact schedule only): fuse up to K
    # consecutive full-occupancy ticks into one device program - sustained
    # throughput decouples from host scheduling jitter (1-core box)
    multi_tick = int(os.environ.get("UNIGEN_BENCH_STEP_MULTITICK", "1"))
    # UNIGEN_BENCH_STEP_NUMSTEPS: longer schedules make the multi-tick
    # window engage under per-tick staggering (4-step staggered slots pin
    # min-remaining-steps to 1, so K never exceeds 1 in steady state)
    num_steps = int(os.environ.get("UNIGEN_BENCH_STEP_NUMSTEPS", "4"))
    preset = os.environ.get("UNIGEN_BENCH_PRESET", "full")
    cfg_base = {"full": presets.flux_full, "proxy": presets.flux_bench,
                "tiny": presets.tiny}[preset]()
    # per-sample routing is a StepServer requirement (row independence)
    cfg = C.replace(cfg_base, control=C.replace(
        cfg_base.control, moe=C.replace(cfg_base.control.moe,
                                        batch_mode="per_sample")))
    bb = cfg.flux
    dtype = jnp.bfloat16
    if preset == "tiny":
        res = 64

    def _init(k):
        p = init_unigen_flux_params(k, cfg, dtype=dtype)
        return quantize_unigen_serving(p) if preset != "tiny" else p

    t0 = time.time()
    params = (direct_quantized_init(jax.random.PRNGKey(0), _init)
              if preset != "tiny" else jax.jit(_init)(jax.random.PRNGKey(0)))
    jax.block_until_ready(params)
    print(f"# stepserver init {time.time()-t0:.1f}s resident="
          f"{quantized_bytes(params)/2**30:.2f}GiB", file=sys.stderr)

    vae_cfg = (vae_lib.tiny_vae_config(latent_channels=bb.in_channels // 4)
               if preset == "tiny" else vae_lib.VAEConfig())
    vae_params = jax.jit(lambda k: vae_lib.init_vae_params(k, vae_cfg))(
        jax.random.PRNGKey(1))
    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=B,
                     num_inference_steps=num_steps, height=res, width=res,
                     model_cache_interval=cache_k,
                     model_cache_order=cache_order,
                     control_cache_interval=cache_c,
                     control_cache_threshold=thr_c,
                     model_cache_threshold=thr_m,
                     adaptive_lag=adaptive_lag,
                     residual_cache_bits=res_bits,
                     multi_tick=multi_tick, dtype=dtype)
    t_len = 16 if preset == "tiny" else 512

    def request(i):
        ks = jax.random.split(jax.random.PRNGKey(1000 + i), 4)
        return dict(
            prompt_embeds=jax.random.normal(
                ks[0], (1, t_len, bb.joint_attention_dim), dtype),
            pooled=jax.random.normal(
                ks[1], (1, bb.pooled_projection_dim), dtype),
            cond_pooled=jax.random.normal(
                ks[2], (1, bb.pooled_projection_dim), dtype),
            control_pixels=jax.random.normal(ks[3], (1, 3, res, res),
                                             jnp.float32))

    # cold request: includes program compile; then a warm single request =
    # the true admission-to-image latency bound
    t0 = time.time()
    srv.submit(**request(0)).result(timeout=3600)
    cold_s = time.time() - t0
    t0 = time.perf_counter()
    srv.submit(**request(1)).result(timeout=600)
    single_lat = time.perf_counter() - t0
    print(f"# cold={cold_s:.1f}s warm single-request latency="
          f"{single_lat*1000:.0f}ms", file=sys.stderr)

    # untimed warmup at full occupancy: the cached server compiles one
    # gathered program per refresh-subset size actually hit (m=1 was warmed
    # by the single requests; full-batch and tail sizes appear only under
    # load) — without this the first timed window pays those compiles
    t0 = time.time()
    wfuts = [srv.submit(**request(500 + i), wait=True) for i in range(2 * B)]
    for f in wfuts:
        f.result(timeout=3600)
    srv.prewarm_multi_tick()   # fused-window programs (no-op at multi_tick 1)
    print(f"# warmup {2*B} requests {time.time()-t0:.1f}s", file=sys.stderr)

    # sustained saturating load: blocking submit refills a slot the moment
    # one retires, so occupancy holds at B.
    # UNIGEN_BENCH_STEP_CPUHOG=1: spin a competing CPU process during the
    # window - the host-robustness A/B for multi_tick (StepServer sustained
    # collapses ~8x under concurrent CPU work when every tick round-trips
    # the host; fused windows keep the device fed)
    hog = None
    if os.environ.get("UNIGEN_BENCH_STEP_CPUHOG") == "1":
        import subprocess
        hog = subprocess.Popen(
            [sys.executable, "-c",
             "while True:\n sum(i*i for i in range(10000))"])
        print(f"# cpu hog pid={hog.pid}", file=sys.stderr)
    n_req = 4 * B
    try:
        t0 = time.perf_counter()
        futs = [srv.submit(**request(2 + i), wait=True) for i in range(n_req)]
        for f in futs:
            f.result(timeout=600)
        sustained = n_req / (time.perf_counter() - t0)
    finally:
        if hog is not None:
            hog.kill()
            hog.wait()
    srv.close()
    print(f"# sustained {sustained:.3f} img/s over {n_req} staggered requests "
          f"({B} slots)" + (" [cpu-hogged]" if hog else ""), file=sys.stderr)

    ctag = f"_cache{cache_k}o{cache_order}" if cache_k > 1 else ""
    if cache_c > 1:
        ctag += f"_hybrid{cache_c}"
        if res_bits == 8:
            ctag += "_res8"
    if thr_spec:
        ctag = f"_adaptive{thr_c:g}_{thr_m:g}"
        if adaptive_lag:
            ctag += "_lag1"
        if res_bits != 16 and thr_c > 0:
            ctag += f"_res{res_bits}"
    if multi_tick > 1:
        ctag += f"_mt{multi_tick}"
    if os.environ.get("UNIGEN_BENCH_STEP_CPUHOG") == "1":
        ctag += "_cpuhog"
    if num_steps != 4:
        ctag += f"_steps{num_steps}"
    doc = {"config": f"flux_{bb.num_layers}dbl_{bb.num_single_layers}sgl_"
                     f"w{bb.inner_dim}_stepserver{B}slots{ctag}",
           "res": res, "slots": B, "num_steps": num_steps,
           "model_cache_interval": cache_k, "model_cache_order": cache_order,
           "control_cache_interval": cache_c,
           "control_cache_threshold": thr_c, "model_cache_threshold": thr_m,
           "adaptive_lag": adaptive_lag,
           "residual_cache_bits": res_bits,
           "multi_tick": multi_tick,
           "warm_single_request_latency_ms": round(single_lat * 1000, 1),
           "sustained_img_per_sec": round(sustained, 4),
           "note": "admission latency bounded by ONE denoise step (vs a full "
                   "previous denoise under request batching); sustained "
                   "includes per-request VAE encode+decode on the same "
                   "stream, which the transformer-only headline excludes — "
                   "use MicroBatchServer when peak batch throughput beats "
                   "admission latency"}
    if thr_spec:
        # honesty label: the recorded thresholds were chosen on
        # random-weight drift (~2-5% post step 0); real weights drift more,
        # so retune (traced scalars, no recompile) on a real checkpoint
        doc["weights"] = "random"
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "STEPSERVE_ADAPTIVE.json")
        merged = {"rows": {}}
        if os.path.exists(path):
            with open(path) as f:
                merged = json.load(f)
        merged["rows"][doc["config"]] = doc
        with open(path, "w") as f:
            json.dump(merged, f, indent=1)
    else:
        # EXPERIMENT configs (multi-tick, cpu-hog, non-default schedule or
        # preset) must not clobber the canonical baseline artifacts the docs
        # cite — they merge into STEPSERVE_MT.json keyed by config instead
        # (this bit us: an mt4_cpuhog_steps16 run overwrote the 1.008
        # STEPSERVE.json baseline)
        experiment = (multi_tick > 1 or num_steps != 4 or preset != "full"
                      or os.environ.get("UNIGEN_BENCH_STEP_CPUHOG") == "1")
        if preset == "tiny":
            pass                      # CPU smoke: no artifact
        elif experiment:
            path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "STEPSERVE_MT.json")
            merged = {}
            if os.path.exists(path):
                with open(path) as f:
                    merged = json.load(f)
            if merged and "runs" not in merged:
                # migrate the legacy flat single-document A/B summary under
                # runs[config] (same discipline as the SUBJECT.json merge)
                # instead of setdefault-ing beside its stale flat keys
                legacy_key = merged.get("config", "legacy_flat")
                merged = {"runs": {legacy_key: merged}}
            merged.setdefault("runs", {})[doc["config"]] = doc
            with open(path, "w") as f:
                json.dump(merged, f, indent=1)
        else:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "STEPSERVE_HYBRID.json" if cache_c > 1
                                   else "STEPSERVE_CACHE.json" if cache_k > 1
                                   else "STEPSERVE.json"), "w") as f:
                json.dump(doc, f, indent=1)
    print(json.dumps({
        "metric": f"unigen_flux_stepserver{ctag}_{res}px_images_per_sec",
        "value": round(sustained, 4), "unit": "images/sec/chip",
        "vs_baseline": 0.0, "config": doc["config"]}))


def bench_stepserver_multires():
    """UNIGEN_BENCH_STEPSERVER=1 UNIGEN_BENCH_STEP_MULTIRES=
    "res[:slots[:resbits]],..." (e.g. "512:2:8,1024:1:4"): MIXED-resolution
    step serving — ONE full-topology W4A8 weight tree, a StepServer bucket
    per resolution (serving_steps.MultiResolutionStepServer), saturating
    load fed CONCURRENTLY to every bucket (one feeder thread per bucket —
    a blocking submit on one bucket must not starve the others). Per-slot
    hybrid cache from UNIGEN_BENCH_STEP_CACHE / _STEP_HYBRID (defaults
    (4, 2) — the measured record schedule); per-bucket ':resbits' overrides
    the residual-cache dtype (int4 is the 1024² residency lever). Measures
    per-bucket warm single-request latency + per-bucket AND aggregate
    sustained under co-residency. Writes STEPSERVE_MULTIRES.json."""
    import threading

    import jax
    import jax.numpy as jnp

    from unigen_tpu import config as C, presets
    from unigen_tpu.models import vae as vae_lib
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.ops.quant import quantize_unigen_serving, quantized_bytes
    from unigen_tpu.serving_steps import MultiResolutionStepServer

    spec = os.environ["UNIGEN_BENCH_STEP_MULTIRES"]
    cache_k = int(os.environ.get("UNIGEN_BENCH_STEP_CACHE", "2"))
    cache_c = int(os.environ.get("UNIGEN_BENCH_STEP_HYBRID", "4"))
    res_bits = int(os.environ.get("UNIGEN_BENCH_STEP_RESBITS", "8"))
    num_steps = 4
    preset = os.environ.get("UNIGEN_BENCH_PRESET", "full")
    cfg_base = {"full": presets.flux_full, "proxy": presets.flux_bench,
                "tiny": presets.tiny}[preset]()
    cfg = C.replace(cfg_base, control=C.replace(
        cfg_base.control, moe=C.replace(cfg_base.control.moe,
                                        batch_mode="per_sample")))
    bb = cfg.flux
    dtype = jnp.bfloat16

    buckets = {}
    for part in spec.split(","):
        fields = part.split(":")
        r, kw = int(fields[0]), {}
        if len(fields) > 1 and fields[1]:
            kw["batch_size"] = int(fields[1])
        if len(fields) > 2 and fields[2]:
            kw["residual_cache_bits"] = int(fields[2])
        buckets[r] = kw

    def _init(k):
        p = init_unigen_flux_params(k, cfg, dtype=dtype)
        return quantize_unigen_serving(p) if preset != "tiny" else p

    t0 = time.time()
    params = (direct_quantized_init(jax.random.PRNGKey(0), _init)
              if preset != "tiny" else jax.jit(_init)(jax.random.PRNGKey(0)))
    jax.block_until_ready(params)
    print(f"# multires init {time.time()-t0:.1f}s resident="
          f"{quantized_bytes(params)/2**30:.2f}GiB buckets={buckets}",
          file=sys.stderr)

    vae_cfg = (vae_lib.tiny_vae_config(latent_channels=bb.in_channels // 4)
               if preset == "tiny" else vae_lib.VAEConfig())
    vae_params = jax.jit(lambda k: vae_lib.init_vae_params(k, vae_cfg))(
        jax.random.PRNGKey(1))
    srv = MultiResolutionStepServer(
        cfg, params, vae_cfg, vae_params, buckets=buckets,
        num_inference_steps=num_steps,
        model_cache_interval=cache_k, control_cache_interval=cache_c,
        residual_cache_bits=res_bits, dtype=dtype)
    t_len = 16 if preset == "tiny" else 512

    def request(i, r):
        ks = jax.random.split(jax.random.PRNGKey(1000 + i), 4)
        return dict(
            prompt_embeds=jax.random.normal(
                ks[0], (1, t_len, bb.joint_attention_dim), dtype),
            pooled=jax.random.normal(
                ks[1], (1, bb.pooled_projection_dim), dtype),
            cond_pooled=jax.random.normal(
                ks[2], (1, bb.pooled_projection_dim), dtype),
            control_pixels=jax.random.normal(ks[3], (1, 3, r, r),
                                             jnp.float32))

    # per bucket, sequentially: cold request (compiles), warm single-request
    # latency, then full-occupancy warmup so every gathered program size the
    # schedule can hit is compiled before the timed mixed window
    rows = {}
    for bi, ((h, w), bucket) in enumerate(srv.servers.items()):
        t0 = time.time()
        srv.submit(resolution=(h, w), **request(bi * 100, h)).result(
            timeout=3600)
        cold_s = time.time() - t0
        t0 = time.perf_counter()
        srv.submit(resolution=(h, w), **request(bi * 100 + 1, h)).result(
            timeout=600)
        lat = time.perf_counter() - t0
        t0 = time.time()
        wf = [srv.submit(resolution=(h, w), wait=True,
                         **request(bi * 100 + 2 + j, h))
              for j in range(2 * bucket.B)]
        for f in wf:
            f.result(timeout=3600)
        print(f"# bucket {h}x{w}: cold={cold_s:.1f}s warm latency="
              f"{lat*1000:.0f}ms, warmup {2*bucket.B} reqs "
              f"{time.time()-t0:.1f}s", file=sys.stderr)
        rows[f"{h}x{w}"] = {"slots": bucket.B,
                            "residual_cache_bits": bucket.res_bits,
                            "warm_single_request_latency_ms":
                                round(lat * 1000, 1)}

    # sustained MIXED load: one feeder per bucket so each bucket's blocking
    # admission holds ITS occupancy at the slot count while the others run —
    # the device interleaves the buckets' tick programs
    n_per = {k: 4 * b.B for k, b in srv.servers.items()}
    done, errs = {}, []
    barrier = threading.Barrier(len(srv.servers) + 1)

    def feeder(hw_key):
        h, w = hw_key
        try:
            barrier.wait()
            futs = [srv.submit(resolution=hw_key, wait=True,
                               **request(5000 + hash(hw_key) % 97 + j, h))
                    for j in range(n_per[hw_key])]
            for f in futs:
                f.result(timeout=600)
            done[hw_key] = time.perf_counter()
        except Exception as e:              # pragma: no cover - bench path
            errs.append(e)

    threads = [threading.Thread(target=feeder, args=(k,), daemon=True)
               for k in srv.servers]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    assert not errs, errs
    wall = time.perf_counter() - t0
    st = srv.stats()
    srv.close()
    agg = sum(n_per.values()) / wall
    for k, n in n_per.items():
        key = f"{k[0]}x{k[1]}"
        # per-bucket rate over ITS OWN completion window (feeders start
        # together; a bucket that finishes early would otherwise understate)
        rows[key]["sustained_img_per_sec"] = round(
            n / (done[k] - t0), 4)
        rows[key]["requests"] = n
        print(f"# bucket {key}: {rows[key]['sustained_img_per_sec']} img/s "
              f"({n} reqs co-resident)", file=sys.stderr)
    print(f"# aggregate {agg:.3f} img/s over {sum(n_per.values())} mixed "
          f"requests in {wall:.1f}s", file=sys.stderr)

    doc = {"config": f"flux_{bb.num_layers}dbl_{bb.num_single_layers}sgl_"
                     f"w{bb.inner_dim}_multires_{spec.replace(',', '_')}"
                     f"_hybrid{cache_c}k{cache_k}",
           "buckets": rows, "num_steps": num_steps,
           "model_cache_interval": cache_k,
           "control_cache_interval": cache_c,
           "residual_cache_bits_default": res_bits,
           "aggregate_img_per_sec": round(agg, 4),
           "stats": st,
           "note": "mixed-resolution serving from ONE weight tree; "
                   "per-bucket sustained is measured CO-RESIDENT (all "
                   "buckets under saturating load simultaneously) — compare "
                   "against the single-resolution STEPSERVE_* records to "
                   "read the interleaving cost"}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "STEPSERVE_MULTIRES.json"), "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({
        "metric": f"unigen_flux_stepserver_multires_{spec.replace(',', '_')}"
                  f"_images_per_sec",
        "value": round(agg, 4), "unit": "images/sec/chip",
        "vs_baseline": 0.0, "config": doc["config"]}))


def bench_stepserver_sana():
    """UNIGEN_BENCH_STEPSERVER=1 UNIGEN_BENCH_STEP_FAMILY=sana: step-level
    continuous batching for the SANA family (1024², 20-step, W8A8 — the
    measured SANA serving dtype) with the REAL-shape DC-AE codec on-stream
    (random weights; the codec cost is architectural). Knobs as the flux
    rung: UNIGEN_BENCH_STEP_SLOTS / _STEP_CACHE / _STEP_HYBRID."""
    import jax
    import jax.numpy as jnp

    from unigen_tpu import config as C
    from unigen_tpu.models import dcae
    from unigen_tpu.models.sana import init_sana_unigen_params
    from unigen_tpu.ops.quant import quantize_tree, quantized_bytes
    from unigen_tpu.serving_steps import StepServer

    res = int(os.environ.get("UNIGEN_BENCH_RES", "1024"))
    B = int(os.environ.get("UNIGEN_BENCH_STEP_SLOTS", "2"))
    cache_k = int(os.environ.get("UNIGEN_BENCH_STEP_CACHE", "1"))
    cache_order = int(os.environ.get("UNIGEN_BENCH_STEP_CACHE_ORDER", "0"))
    cache_c = int(os.environ.get("UNIGEN_BENCH_STEP_HYBRID", "1"))
    res_bits = int(os.environ.get("UNIGEN_BENCH_STEP_RESBITS", "16"))
    multi_tick = int(os.environ.get("UNIGEN_BENCH_STEP_MULTITICK", "1"))
    num_steps = 20
    cfg = C.UniGenConfig(
        family="sana", sana=C.SanaBackboneConfig(),
        control=C.ControlConfig(moe=C.MoEConfig(batch_mode="per_sample")),
        condition_types=("canny",))
    bb = cfg.sana
    dtype = jnp.bfloat16

    t0 = time.time()
    params = direct_quantized_init(
        jax.random.PRNGKey(0),
        lambda k: quantize_tree(init_sana_unigen_params(k, cfg, dtype=dtype)))
    ae_cfg = dcae.DCAEConfig(latent_channels=bb.in_channels)
    ae_params = jax.jit(lambda k: dcae.init_dcae_params(k, ae_cfg))(
        jax.random.PRNGKey(1))
    jax.block_until_ready((params, ae_params))
    print(f"# sana stepserver init {time.time()-t0:.1f}s resident="
          f"{quantized_bytes(params)/2**30:.2f}GiB transformer "
          f"+ {quantized_bytes(ae_params)/2**30:.2f}GiB codec",
          file=sys.stderr)

    srv = StepServer(
        cfg, params,
        ae_encode=lambda vp, px: dcae.dcae_encode(vp, ae_cfg, px),
        ae_decode=lambda vp, lat: dcae.dcae_decode(vp, ae_cfg, lat),
        ae_params=ae_params, ae_downscale=ae_cfg.downscale,
        batch_size=B, num_inference_steps=num_steps,
        height=res, width=res, model_cache_interval=cache_k,
        model_cache_order=cache_order, control_cache_interval=cache_c,
        residual_cache_bits=res_bits, multi_tick=multi_tick, dtype=dtype)
    t_len = 300

    def request(i):
        ks = jax.random.split(jax.random.PRNGKey(1000 + i), 4)
        return dict(
            prompt_embeds=jax.random.normal(
                ks[0], (1, t_len, bb.caption_channels), dtype),
            pooled=jax.random.normal(
                ks[1], (1, bb.pooled_projection_dim), dtype),
            cond_pooled=jax.random.normal(
                ks[2], (1, bb.pooled_projection_dim), dtype),
            control_pixels=jax.random.normal(ks[3], (1, 3, res, res),
                                             jnp.float32))

    t0 = time.time()
    srv.submit(**request(0)).result(timeout=3600)
    cold_s = time.time() - t0
    t0 = time.perf_counter()
    srv.submit(**request(1)).result(timeout=600)
    single_lat = time.perf_counter() - t0
    print(f"# cold={cold_s:.1f}s warm single-request latency="
          f"{single_lat*1000:.0f}ms", file=sys.stderr)

    t0 = time.time()
    wfuts = [srv.submit(**request(500 + i), wait=True) for i in range(2 * B)]
    for f in wfuts:
        f.result(timeout=3600)
    srv.prewarm_multi_tick()   # fused-window programs (no-op at multi_tick 1)
    print(f"# warmup {2*B} requests {time.time()-t0:.1f}s", file=sys.stderr)

    n_req = 4 * B
    t0 = time.perf_counter()
    futs = [srv.submit(**request(2 + i), wait=True) for i in range(n_req)]
    for f in futs:
        f.result(timeout=1200)
    sustained = n_req / (time.perf_counter() - t0)
    srv.close()
    print(f"# sustained {sustained:.3f} img/s over {n_req} staggered "
          f"requests ({B} slots)", file=sys.stderr)

    ctag = f"_cache{cache_k}o{cache_order}" if cache_k > 1 else ""
    if cache_c > 1:
        ctag += f"_hybrid{cache_c}"
        if res_bits == 8:
            ctag += "_res8"
    if multi_tick > 1:
        ctag += f"_mt{multi_tick}"
    doc = {"config": f"sana_{bb.num_layers}blk_w{bb.inner_dim}_"
                     f"stepserver{B}slots{ctag}",
           "res": res, "slots": B, "num_steps": num_steps,
           "model_cache_interval": cache_k, "model_cache_order": cache_order,
           "control_cache_interval": cache_c, "quant": "w8a8",
           "residual_cache_bits": res_bits,
           "warm_single_request_latency_ms": round(single_lat * 1000, 1),
           "sustained_img_per_sec": round(sustained, 4),
           "note": "SANA family StepServer (no CFG — fits the slot model "
                   "exactly); sustained includes per-request REAL-shape "
                   "DC-AE encode+decode on-stream"}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "STEPSERVE_SANA.json"), "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({
        "metric": f"unigen_sana_stepserver{ctag}_{res}px_images_per_sec",
        "value": round(sustained, 4), "unit": "images/sec/chip",
        "vs_baseline": 0.0, "config": doc["config"]}))


def bench_stepserver_sd3():
    """UNIGEN_BENCH_STEPSERVER=1 UNIGEN_BENCH_STEP_FAMILY=sd3: step-level
    continuous batching for the SD3 family (SD3.5-medium, 512², 28-step
    CFG denoise, W8A8 — the measured SD3 serving dtype). CFG-aware slots:
    each slot holds one latent + a stacked (neg, pos) stream pair, so a
    tick's transformer batch is 2× the refreshing slot count. Knobs as the
    flux rung: UNIGEN_BENCH_STEP_SLOTS / _STEP_CACHE / _STEP_HYBRID /
    _STEP_RESBITS."""
    import jax
    import jax.numpy as jnp

    from unigen_tpu import config as C, presets
    from unigen_tpu.models import vae as vae_lib
    from unigen_tpu.models.unigen_sd3 import init_unigen_sd3_params
    from unigen_tpu.ops.quant import quantize_tree, quantized_bytes
    from unigen_tpu.serving_steps import StepServer

    res = int(os.environ.get("UNIGEN_BENCH_RES", "512"))
    B = int(os.environ.get("UNIGEN_BENCH_STEP_SLOTS", "2"))
    cache_k = int(os.environ.get("UNIGEN_BENCH_STEP_CACHE", "1"))
    cache_order = int(os.environ.get("UNIGEN_BENCH_STEP_CACHE_ORDER", "0"))
    cache_c = int(os.environ.get("UNIGEN_BENCH_STEP_HYBRID", "1"))
    res_bits = int(os.environ.get("UNIGEN_BENCH_STEP_RESBITS", "16"))
    multi_tick = int(os.environ.get("UNIGEN_BENCH_STEP_MULTITICK", "1"))
    num_steps = 28
    t_len = 77 + 256                       # CLIP + T5 joint context
    cfg_base = presets.sd35_medium()
    cfg = C.replace(cfg_base, control=C.replace(
        cfg_base.control, moe=C.replace(cfg_base.control.moe,
                                        batch_mode="per_sample")))
    bb = cfg.sd3
    dtype = jnp.bfloat16

    t0 = time.time()
    params = direct_quantized_init(
        jax.random.PRNGKey(0),
        lambda k: quantize_tree(init_unigen_sd3_params(k, cfg, dtype=dtype)))
    vae_cfg = vae_lib.VAEConfig(scaling_factor=1.5305, shift_factor=0.0609)
    vae_params = jax.jit(lambda k: vae_lib.init_vae_params(k, vae_cfg))(
        jax.random.PRNGKey(1))
    jax.block_until_ready((params, vae_params))
    print(f"# sd3 stepserver init {time.time()-t0:.1f}s resident="
          f"{quantized_bytes(params)/2**30:.2f}GiB", file=sys.stderr)

    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=B,
                     num_inference_steps=num_steps, height=res, width=res,
                     guidance_scale=7.0, model_cache_interval=cache_k,
                     model_cache_order=cache_order,
                     control_cache_interval=cache_c,
                     residual_cache_bits=res_bits,
                     multi_tick=multi_tick, dtype=dtype)

    def request(i):
        ks = jax.random.split(jax.random.PRNGKey(1000 + i), 5)
        return dict(
            prompt_embeds=jax.random.normal(
                ks[0], (1, t_len, bb.joint_attention_dim), dtype),
            neg_embeds=jax.random.normal(
                ks[1], (1, t_len, bb.joint_attention_dim), dtype),
            pooled=jax.random.normal(
                ks[2], (1, bb.pooled_projection_dim), dtype),
            neg_pooled=jax.random.normal(
                ks[3], (1, bb.pooled_projection_dim), dtype),
            cond_pooled=jnp.zeros((1, bb.pooled_projection_dim), dtype),
            control_pixels=jax.random.normal(ks[4], (1, 3, res, res),
                                             jnp.float32))

    t0 = time.time()
    srv.submit(**request(0)).result(timeout=3600)
    cold_s = time.time() - t0
    t0 = time.perf_counter()
    srv.submit(**request(1)).result(timeout=600)
    single_lat = time.perf_counter() - t0
    print(f"# cold={cold_s:.1f}s warm single-request latency="
          f"{single_lat*1000:.0f}ms", file=sys.stderr)

    t0 = time.time()
    wfuts = [srv.submit(**request(500 + i), wait=True) for i in range(2 * B)]
    for f in wfuts:
        f.result(timeout=3600)
    srv.prewarm_multi_tick()   # fused-window programs (no-op at multi_tick 1)
    print(f"# warmup {2*B} requests {time.time()-t0:.1f}s", file=sys.stderr)

    n_req = 4 * B
    t0 = time.perf_counter()
    futs = [srv.submit(**request(2 + i), wait=True) for i in range(n_req)]
    for f in futs:
        f.result(timeout=1200)
    sustained = n_req / (time.perf_counter() - t0)
    srv.close()
    print(f"# sustained {sustained:.3f} img/s over {n_req} staggered "
          f"requests ({B} slots)", file=sys.stderr)

    ctag = f"_cache{cache_k}o{cache_order}" if cache_k > 1 else ""
    if cache_c > 1:
        ctag += f"_hybrid{cache_c}"
        if res_bits != 16:
            ctag += f"_res{res_bits}"
    if multi_tick > 1:
        ctag += f"_mt{multi_tick}"
    doc = {"config": f"sd35m_{bb.num_layers}blk_w{bb.inner_dim}_"
                     f"stepserver{B}slots{ctag}",
           "res": res, "slots": B, "num_steps": num_steps,
           "model_cache_interval": cache_k, "model_cache_order": cache_order,
           "control_cache_interval": cache_c, "quant": "w8a8",
           "residual_cache_bits": res_bits,
           "warm_single_request_latency_ms": round(single_lat * 1000, 1),
           "sustained_img_per_sec": round(sustained, 4),
           "note": "SD3 CFG-aware slots: a tick's transformer batch is 2x "
                   "the refreshing slot count (neg+pos streams in-program); "
                   "sustained includes per-request VAE encode+decode "
                   "on-stream"}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "STEPSERVE_SD3.json")
    merged = {"rows": {}}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        merged = prev if "rows" in prev else {"rows": {prev["config"]: prev}}
    merged["rows"][doc["config"]] = doc
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({
        "metric": f"unigen_sd3_stepserver{ctag}_{res}px_images_per_sec",
        "value": round(sustained, 4), "unit": "images/sec/chip",
        "vs_baseline": 0.0, "config": doc["config"]}))


def direct_quantized_init(key, init_quantized_fn):
    """Build the quantized serving tree leaf-by-leaf from its eval_shape
    structure, never materialising the bf16 source tree.

    The one-shot ``jit(init -> quantize)`` program relies on XLA freeing each
    bf16 leaf right after its quantized twin is produced; at full 19/38
    topology XLA's scheduling keeps enough of the ~33 GiB bf16 tree live to
    RESOURCE_EXHAUST a 16 GB chip (observed repeatedly on a clean relay).
    Bench weights are random either way, so content doesn't matter — only
    shapes/dtypes/layout do: fill int leaves with uniform int8 (random bytes
    == random packed int4 nibbles), ``w_scale`` leaves with the magnitude a
    real quantize of N(0, 0.02) weights would produce, other float leaves
    with N(0, 0.02). Transient HBM = one leaf; resident = the quantized tree
    only. The measured forward program is IDENTICAL to the real-checkpoint
    one (scripts/measure_fidelity.py exercises the real quantize path)."""
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(init_quantized_fn, key)
    flat, treedef = jax.tree.flatten_with_path(shapes)

    def fill(k, name, shape, dtype):
        if jnp.issubdtype(dtype, jnp.integer):
            return jax.random.randint(k, shape, -127, 128,
                                      jnp.int32).astype(dtype)
        if "w_scale" in name:
            return jax.random.uniform(k, shape, dtype, 1e-4, 1e-3)
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

    jfill = jax.jit(fill, static_argnums=(1, 2, 3))
    leaves = []
    for i, (path, s) in enumerate(flat):
        leaves.append(jfill(jax.random.fold_in(key, i), str(path[-1]),
                            tuple(s.shape), s.dtype))
    return jax.tree.unflatten(treedef, leaves)


def main():
    import gc

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/unigen_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if os.environ.get("UNIGEN_BENCH_TRAIN") == "1":
        return bench_train()
    if os.environ.get("UNIGEN_BENCH_SUITE") == "1":
        return bench_suite()
    if os.environ.get("UNIGEN_BENCH_SUBJECT") == "1":
        return bench_subject()
    if os.environ.get("UNIGEN_BENCH_MULTI"):
        return bench_multi()
    if os.environ.get("UNIGEN_BENCH_STEPSERVER") == "1":
        return bench_stepserver()
    family = os.environ.get("UNIGEN_BENCH_FAMILY", "flux")
    if family == "flux" and (
            os.environ.get("UNIGEN_BENCH_CACHE")
            or os.environ.get("UNIGEN_BENCH_MODEL_CACHE")
            or os.environ.get("UNIGEN_BENCH_MODEL_CACHE_ADAPTIVE")
            or os.environ.get("UNIGEN_BENCH_HYBRID_CACHE")
            or os.environ.get("UNIGEN_BENCH_HYBRID_ADAPTIVE")):
        return bench_cache()
    if family == "sd3":
        return bench_sd3()
    if family == "sana":
        return bench_sana()

    from unigen_tpu import presets
    from unigen_tpu.models.unigen_flux import (init_unigen_flux_params,
                                               unigen_flux_forward)
    from unigen_tpu.ops.packing import prepare_latent_image_ids
    from unigen_tpu.ops.quant import quantized_bytes
    from unigen_tpu.pipelines import scheduling

    res = int(os.environ.get("UNIGEN_BENCH_RES", "512"))
    hw, t_len = res // 16, 512         # res^2 -> (res/8)^2 latents -> packed
    s_img = hw * hw
    num_steps = 4
    batch_sizes = [int(x) for x in
                   os.environ.get("UNIGEN_BENCH_BATCHES", "2,4,8").split(",")]
    adapter_bits = int(os.environ.get("UNIGEN_BENCH_ADAPTER_BITS", "4"))

    # ALL trace-time constants as HOST numpy BEFORE the big init: pulling a
    # device array into a jit as a closure constant does a device->host read,
    # and the axon runtime's d2h path fails when HBM residency is high
    # (observed hard at >=12 GiB, intermittently lower when the relay holds
    # zombie buffers from crashed sessions).
    img_ids = np.asarray(prepare_latent_image_ids(hw, hw))
    txt_ids = np.zeros((t_len, 3), np.float32)
    sigmas = np.asarray(scheduling.inference_sigmas(
        scheduling.FlowMatchConfig(shift=1.0), num_steps)[0])

    def run_preset(preset: str, quant: str):
        """Init + measure one (preset, quant) rung; returns (results,
        config_desc, est_ref) with results possibly empty."""
        cfg = presets.flux_full() if preset == "full" else presets.flux_bench()
        bb = cfg.flux
        dtype = jnp.bfloat16

        def _init(k):
            p = init_unigen_flux_params(k, cfg, dtype=dtype)
            if quant == "w4a8":
                from unigen_tpu.ops.quant import quantize_unigen_serving
                p = quantize_unigen_serving(p, adapter_block_bits=adapter_bits)
            elif quant == "w8a8":
                from unigen_tpu.ops.quant import quantize_tree
                p = quantize_tree(p)
            return p

        t_init = time.time()
        if quant == "bf16":
            params = jax.jit(_init)(jax.random.PRNGKey(0))
        else:
            # leaf-wise direct fill: the one-shot init->quantize program OOMs
            # at full topology (see direct_quantized_init docstring)
            params = direct_quantized_init(jax.random.PRNGKey(0), _init)
        jax.block_until_ready(params)
        print(f"# param init {time.time()-t_init:.1f}s preset={preset} "
              f"quant={quant} resident={quantized_bytes(params)/2**30:.2f}GiB",
              file=sys.stderr)

        flops_image = model_flops_per_forward(cfg, s_img, t_len, s_img) * num_steps
        est_ref = 312e12 * 0.35 / flops_image   # A100 roofline, see docstring

        def sync(x):
            return float(jnp.sum(x.astype(jnp.float32)))

        # preflight: the runtime's d2h path is the fragile piece at high
        # residency, not program memory — probe it before timing
        for attempt in range(3):
            try:
                _ = float(jax.jit(lambda: jnp.float32(1.0))())
                break
            except Exception:
                print(f"# d2h preflight failed (attempt {attempt}); "
                      "sleeping 90s", file=sys.stderr)
                time.sleep(90)

        def measure(b: int) -> float:
            ks = jax.random.split(jax.random.PRNGKey(1), 6)
            prompt = jax.random.normal(ks[0], (b, t_len, bb.joint_attention_dim), dtype)
            pooled = jax.random.normal(ks[1], (b, bb.pooled_projection_dim), dtype)
            cond_pooled = jax.random.normal(ks[2], (b, bb.pooled_projection_dim), dtype)
            condition = jax.random.normal(ks[3], (b, s_img, bb.in_channels), dtype)
            latents0 = jax.random.normal(ks[4], (b, s_img, bb.in_channels), dtype)

            cache_k = int(os.environ.get("UNIGEN_BENCH_CACHE_INTERVAL", "1"))

            def denoise(params, latents, condition, prompt, pooled, cond_pooled):
                sig = jnp.asarray(sigmas)      # host constant, no d2h
                ids_i = jnp.asarray(img_ids)
                ids_t = jnp.asarray(txt_ids)

                def fwd(lat, i, **kw):
                    pred, _, outs = unigen_flux_forward(
                        params, cfg, hidden=lat, condition=condition,
                        encoder=prompt, pooled=pooled,
                        condition_pooled=cond_pooled,
                        timestep=jnp.full((b,), sig[i], dtype),
                        img_ids=ids_i, txt_ids=ids_t, condition_ids=ids_i,
                        attn_impl="auto", **kw)
                    return pred, outs

                if cache_k <= 1:
                    def step(lat, i):
                        pred, _ = fwd(lat, i)
                        lat = scheduling.euler_step(lat, pred, sig[i],
                                                    sig[i + 1])
                        return lat, None
                    latents, _ = jax.lax.scan(step, latents,
                                              jnp.arange(num_steps))
                    return latents

                # opt-in control-residual step caching (CACHE.json fidelity)
                d = bb.inner_dim
                zero = (jnp.zeros((bb.num_layers, b, s_img, d), dtype),
                        jnp.zeros((bb.num_single_layers, b, t_len + s_img, d),
                                  dtype))

                def step(carry, i):
                    lat, res = carry

                    def full():
                        pred, outs = fwd(lat, i,
                                         return_control_residuals=True)
                        return pred, outs["control_residuals"]

                    def replay():
                        pred, _ = fwd(lat, i, control_residuals=res)
                        return pred, res

                    pred, res = jax.lax.cond(i % cache_k == 0, full, replay)
                    return (scheduling.euler_step(lat, pred, sig[i],
                                                  sig[i + 1]), res), None

                (latents, _), _ = jax.lax.scan(step, (latents, zero),
                                               jnp.arange(num_steps))
                return latents

            jfn = jax.jit(denoise)
            fn = lambda: jfn(params, latents0, condition, prompt, pooled, cond_pooled)
            t0 = time.time()
            _ = sync(fn())
            compile_s = time.time() - t0
            # burst timing: queue K calls, one sync — amortises tunnel latency
            K = max(1, 4 // b)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(K):
                    out = fn()
                _ = sync(out)
                times.append((time.perf_counter() - t0) / K)
            dt = min(times)
            ips = b / dt
            # v5e peaks: 197 bf16 TFLOP/s, 394 int8 TOP/s — report against
            # the peak of the path actually measured
            peak = 197e12 if quant == "bf16" else 394e12
            print(f"# b={b} compile={compile_s:.1f}s step={dt*1000:.1f}ms "
                  f"ips={ips:.3f} mfu={flops_image*ips/peak:.3f} "
                  f"({'bf16' if quant == 'bf16' else 'int8'} peak)",
                  file=sys.stderr)
            return ips

        results = {}
        for b in batch_sizes:
            try:
                results[b] = measure(b)
            except Exception as e:  # e.g. batch too large for HBM
                print(f"# b={b} failed: {type(e).__name__}: {str(e)[:300]}",
                      file=sys.stderr)
        desc = (f"flux_{bb.num_layers}dbl_{bb.num_single_layers}sgl_"
                f"w{bb.inner_dim}_{quant}")
        return results, desc, est_ref

    # Fallback ladder: the full 19/38 W4A8 serving config first; if the
    # tunnel/HBM state can't carry it (zombie buffers from crashed sessions
    # shrink usable capacity for tens of minutes), degrade to the round-1
    # proxy preset rather than record nothing. Explicit env knobs pin a
    # single rung.
    preset_env = os.environ.get("UNIGEN_BENCH_PRESET", "")
    quant_env = os.environ.get("UNIGEN_BENCH_QUANT", "")
    if os.environ.get("UNIGEN_BENCH_INT8") == "0" and not quant_env:
        quant_env = "bf16"
    if preset_env or quant_env:
        preset_env = preset_env or "full"
        ladder = [(preset_env, quant_env or
                   ("w4a8" if preset_env == "full" else "w8a8"))]
    else:
        ladder = [("full", "w4a8"), ("proxy", "w8a8"), ("proxy", "bf16")]

    # Per-rung retry with tunnel-health probing (round-3 lesson: a single
    # transient remote-compile failure — "read body: response body closed" —
    # dropped the driver artifact from the full 19/38 topology to the proxy
    # preset even though a ~15 s cached retry would have succeeded). Policy:
    #  * before each attempt, probe the tunnel with a tiny matmul (bounded
    #    by a watchdog thread — a WEDGED tunnel hangs rather than erroring);
    #    on a failed probe, idle in 3-min slices up to ~24 min (CLAUDE.md:
    #    wedges self-recover in 10-40 min) before burning the attempt;
    #  * a rung that fails with a TRANSIENT error (remote-compile/relay
    #    hiccup, RESOURCE_EXHAUSTED zombie buffers, timeouts) retries up to
    #    3x with growing backoff — the persistent compile cache makes a
    #    retry ~15 s — before the ladder descends;
    #  * a deterministic error (shape/type bugs) descends immediately;
    #  * the attempt history and any fallback are recorded in the JSON.
    # STRONG transients (relay plumbing: retry the full budget) vs WEAK ones
    # ('remote_compile'/'internal' HTTP 500s can be DETERMINISTIC — a
    # program the compile helper can never build fails identically every
    # time and each retry burns a multi-minute failing compile; one retry
    # distinguishes a wedge from a real compile failure)
    TRANSIENT_PAT = ("read body", "resource_exhausted",
                     "deadline", "timed out", "timeout", "unavailable",
                     "connection", "aborted", "socket",
                     "response body", "eof")
    WEAK_TRANSIENT_PAT = ("remote_compile", "internal")

    def _is_transient(e: Exception, attempt: int = 1) -> bool:
        s = f"{type(e).__name__}: {e}".lower()
        if any(p in s for p in TRANSIENT_PAT):
            return True
        return attempt < 2 and any(p in s for p in WEAK_TRANSIENT_PAT)

    def _tunnel_probe(timeout_s: float = 120.0) -> bool:
        """True iff a tiny matmul round-trips (incl. d2h) within the
        window. Runs on a watchdog thread because a wedged tunnel HANGS
        trivial ops for tens of minutes instead of erroring."""
        import threading
        got: list = []

        def work():
            try:
                x = jnp.ones((8, 8), jnp.bfloat16)
                got.append(abs(float(jnp.sum(x @ x)) - 512.0) < 1.0)
            except Exception as e:
                print(f"# tunnel probe error: {type(e).__name__}: "
                      f"{str(e)[:120]}", file=sys.stderr)
                got.append(False)

        th = threading.Thread(target=work, daemon=True)
        th.start()
        th.join(timeout_s)
        return bool(got and got[0])

    def _wait_for_tunnel() -> None:
        for i in range(8):                    # <= ~24 min of 3-min slices
            if _tunnel_probe():
                return
            print(f"# tunnel unhealthy (probe {i}); idling 180s for the "
                  "relay to recover", file=sys.stderr)
            time.sleep(180)

    results, config_desc, est_ref = {}, "none", 1.0
    attempt_log: list = []
    fell_back = False
    for ri, (preset, quant) in enumerate(ladder):
        rung_ok = False
        for attempt in range(1, 4):
            _wait_for_tunnel()
            try:
                results, config_desc, est_ref = run_preset(preset, quant)
            except Exception as e:
                msg = f"{type(e).__name__}: {str(e)[:200]}"
                transient = _is_transient(e, attempt)
                attempt_log.append({"rung": f"{preset},{quant}",
                                    "attempt": attempt, "error": msg,
                                    "transient": transient})
                print(f"# rung ({preset},{quant}) attempt {attempt} failed "
                      f"({'transient' if transient else 'deterministic'}): "
                      f"{msg}", file=sys.stderr)
                gc.collect()
                if transient and attempt < 3:
                    time.sleep(60 * attempt)
                    continue
                break                          # descend the ladder
            if results:
                # sanity floor: a DEGRADED tunnel can complete a run with
                # catastrophic timings instead of erroring (observed: 39 s
                # steps -> 0.051 img/s recorded as success while b=4/8
                # crashed the TPU worker). Anything under 30% of the A100
                # roofline estimate is not a real measurement of this
                # config — retry like a transient; if it persists, keep the
                # number but mark it suspect.
                best = max(results.values())
                if best < 0.3 * est_ref and attempt < 3:
                    attempt_log.append({"rung": f"{preset},{quant}",
                                        "attempt": attempt,
                                        "error": f"suspect degraded tunnel: "
                                                 f"ips {best:.3f} < 0.3x "
                                                 f"est_ref {est_ref:.3f}",
                                        "transient": True})
                    print(f"# rung ({preset},{quant}) attempt {attempt}: "
                          f"ips {best:.3f} under the degraded-tunnel floor "
                          f"(0.3x {est_ref:.3f}); retrying", file=sys.stderr)
                    results = {}
                    gc.collect()
                    time.sleep(120 * attempt)
                    continue
                rung_ok = True
                if best < 0.3 * est_ref:
                    attempt_log.append({"rung": f"{preset},{quant}",
                                        "attempt": attempt,
                                        "error": "suspect_degraded kept "
                                                 "after retries",
                                        "transient": False})
                break
            # no exception but zero batches measured: per-batch failures
            # inside measure() — treat as one more transient attempt
            attempt_log.append({"rung": f"{preset},{quant}",
                                "attempt": attempt,
                                "error": "no batch completed",
                                "transient": True})
            gc.collect()
            if attempt < 3:
                time.sleep(60 * attempt)
        if rung_ok:
            fell_back = ri > 0
            break

    if not results:
        print(json.dumps({"metric":
                          "unigen_flux_bench_512px_4step_denoise_images_per_sec",
                          "value": 0.0, "unit": "images/sec/chip",
                          "vs_baseline": 0.0, "config": config_desc,
                          "error": "all rungs failed",
                          "attempts": attempt_log}))
        return
    best_b = max(results, key=results.get)
    images_per_sec = results[best_b]
    line = {
        "metric": f"unigen_flux_bench_{res}px_4step_denoise_images_per_sec",
        "value": round(images_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / est_ref, 3),
        "config": config_desc,
    }
    if attempt_log:
        line["attempts"] = attempt_log
    if fell_back:
        line["fallback"] = True
    # the headline stays the EXACT denoise (same math as the reference);
    # surface the best recorded approximate serving rung (control cache,
    # CACHE.json — measured on this chip with its SSIM-vs-exact gate) as an
    # informational field so one JSON line carries the whole serving story
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "CACHE.json")) as f:
            cache_doc = json.load(f)
        rows = []
        for rk, rv in cache_doc.get("runs", {}).items():
            if "_" in rk:        # other-resolution / tiny-smoke rungs
                continue         # (b1_r1024, b2_tiny): not headline-res
            for kind in ("rows", "adaptive_rows", "model_rows",
                         "model_adaptive_rows", "hybrid_rows",
                         "hybrid_adaptive_rows"):
                for r in rv.get(kind, []):
                    if r.get("ssim_vs_exact", 0) >= 0.99:
                        rows.append((r["ips"], kind, rk, r))
        if rows:
            ips, kind, rk, r = max(rows, key=lambda t: t[0])
            mode = {"rows": "control_cache",
                    "adaptive_rows": "control_cache_adaptive",
                    "model_rows": "model_cache",
                    "model_adaptive_rows": "model_cache_adaptive",
                    "hybrid_rows": "hybrid_cache",
                    "hybrid_adaptive_rows": "hybrid_cache_adaptive"}[kind]
            line["serving_optimized"] = {
                "ips": ips, "mode": mode,
                "batch": rk, "ssim_vs_exact": r["ssim_vs_exact"],
                "vs_baseline": round(ips / est_ref, 3),
                "knob": dict(({"interval": r["interval"]} if "interval" in r
                              else {"threshold": r["threshold"]}
                              if "threshold" in r
                              else {"control_interval": r["control_interval"],
                                    "model_interval": r["model_interval"]}
                              if "control_interval" in r
                              else {"control_threshold":
                                    r["control_threshold"],
                                    "model_threshold": r["model_threshold"]}),
                             **({"order": r["order"]} if "order" in r
                                else {}))}
    except Exception:
        pass
    print(json.dumps(line))
    print(f"# best_batch={best_b} est_ref_a100={est_ref:.3f}img/s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
