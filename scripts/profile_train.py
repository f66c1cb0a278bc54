#!/usr/bin/env python
"""Train-step phase attribution + remat-policy sweep (VERDICT r3 #3).

The serving MFU at full topology is 0.615; the train step recorded 0.395.
This script attributes the gap on device by timing, on the PRODUCTION loss
(train.make_loss_builder — the exact closure make_train_step differentiates):

  fwd        — jit(loss) alone
  fwd+bwd    — jit(value_and_grad(loss))
  step       — the full make_train_step program (fwd+bwd+AdamW+clip)

for each remat policy in UNIGEN_TRAIN_REMATS (default "full,dots"):
  full — blanket jax.checkpoint on every scan body (the r3 default;
         backward re-runs the whole forward: ~4/3x backward FLOPs, memory
         floor)
  dots — dots_with_no_batch_dims_saveable (weight-matmul outputs saved,
         attention + elementwise recomputed: near-no-remat backward speed
         for a fraction of no-remat's activation memory)
  none — no remat (fits only at reduced depth / small batch)

Shapes mirror bench.py's train-full rung: full 19/38 topology W4A8-frozen
tree + fp trainable subset (ops/quant.split_trainable), 512², micro-batch
UNIGEN_BENCH_TRAIN_BATCH (default 1). UNIGEN_BENCH_PRESET=trainbench uses
the reduced-depth preset instead (where "none" also fits, bracketing the
remat cost). Writes TRAIN_PROFILE.json: per-policy {fwd_ms, bwd_ms, opt_ms,
step_ms, mfu} with bwd_ms = (fwd+bwd) - fwd and opt_ms = step - (fwd+bwd)
(timed as independent programs, so XLA fusion differences land in opt_ms —
the attribution is program-level, same convention as profile_forward.py).

MFU convention matches bench.py: fwd+bwd ~= 3x forward FLOPs against the
394 TF/s int8 peak (int4/int8 frozen matmuls dominate) — blanket remat's
recompute makes the TRUE executed FLOPs ~4x, which is exactly the point:
the recompute tax shows up as lower MFU on useful FLOPs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_want_platform = os.environ.get("JAX_PLATFORMS", "").strip().lower()
if _want_platform:
    import jax as _jax
    try:
        _jax.config.update("jax_platforms", _want_platform)
    except Exception:
        pass


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/unigen_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench as B
    from unigen_tpu import config as C, presets
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.ops.quant import (quantize_tree, quantize_unigen_serving,
                                      quantized_bytes, split_trainable)
    from unigen_tpu.train import train_step as ts

    preset = os.environ.get("UNIGEN_BENCH_PRESET", "full")
    policies = os.environ.get("UNIGEN_TRAIN_REMATS", "full,dots").split(",")
    b = int(os.environ.get("UNIGEN_BENCH_TRAIN_BATCH", "1"))
    res = int(os.environ.get("UNIGEN_BENCH_RES", "512"))
    accum = int(os.environ.get("UNIGEN_BENCH_TRAIN_ACCUM", "1"))
    dtype = jnp.bfloat16
    lat_hw, t_len = res // 8, 512

    if preset == "tiny":
        cfg = presets.tiny()
        res, lat_hw, t_len = 64, 8, 8
    elif preset == "trainbench":
        cfg = presets.flux_train_bench()
    else:
        cfg = presets.flux_full()
    bb = cfg.flux

    t0 = time.time()
    if preset == "full":
        def _init(k):
            return quantize_unigen_serving(
                init_unigen_flux_params(k, cfg, dtype=dtype))
        params = B.direct_quantized_init(jax.random.PRNGKey(0), _init)
        jax.block_until_ready(params)
        trainable, frozen = split_trainable(params["control"])
        frozen_arg = {"base": params["base"], "control_frozen": frozen}
    elif preset == "trainbench":
        def _init(k):
            p = init_unigen_flux_params(k, cfg, dtype=dtype)
            return {"base": quantize_tree(p["base"], bits=4),
                    "control": p["control"]}
        params = jax.jit(_init)(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        trainable, frozen_arg = params["control"], params["base"]
    else:
        params = jax.jit(lambda k: init_unigen_flux_params(k, cfg))(
            jax.random.PRNGKey(0))
        trainable, frozen_arg = params["control"], params["base"]
    print(f"# profile_train init {time.time()-t0:.1f}s preset={preset} "
          f"resident={quantized_bytes(params)/2**30:.2f}GiB", file=sys.stderr)

    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    c_lat = 16 if preset != "tiny" else bb.in_channels // 4
    batch = {
        "latents": jax.random.normal(ks[0], (b, c_lat, lat_hw, lat_hw), dtype),
        "condition_latents": jax.random.normal(
            ks[1], (b, c_lat, lat_hw, lat_hw), dtype),
        "prompt_embeds": jax.random.normal(
            ks[2], (b, t_len, bb.joint_attention_dim), dtype),
        "pooled": jax.random.normal(ks[3], (b, bb.pooled_projection_dim),
                                    dtype),
        "condition_pooled": jax.random.normal(
            ks[4], (b, bb.pooled_projection_dim), dtype),
    }
    rng = jax.random.PRNGKey(2)
    s_img = (res // 16) ** 2
    flops_step = 3 * B.model_flops_per_forward(cfg, s_img, t_len, s_img) * b
    peak = 394e12 if preset != "tiny" else 394e12

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    def timeit(jfn, *args, donate_first=False):
        t0 = time.time()
        out = jfn(*args)
        _ = sync(out)
        compile_s = time.time() - t0
        K = 2
        times = []
        # donated TrainState: the compile call consumed args[0]; keep
        # threading the fresh state forward
        arg0 = out[0] if donate_first else args[0]
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K):
                out = jfn(arg0, *args[1:])
                if donate_first:
                    arg0 = out[0]   # donated TrainState flows forward
            _ = sync(out)
            times.append((time.perf_counter() - t0) / K)
        return min(times) * 1000, compile_s

    rows = {}
    for policy in policies:
        policy = policy.strip()
        tcfg = C.TrainConfig(train_batch_size=b, remat=policy,
                             gradient_accumulation_steps=accum)
        row = {}
        try:
            builder = ts.make_loss_builder(cfg, tcfg, attn_impl="auto")

            def loss_only(control, frozen_arg, batch, rng):
                return builder(frozen_arg, batch, rng)(control)[0]

            def loss_grad(control, frozen_arg, batch, rng):
                (l, _), g = jax.value_and_grad(
                    builder(frozen_arg, batch, rng), has_aux=True)(control)
                return l, g

            ms, cs = timeit(jax.jit(loss_only), trainable, frozen_arg, batch,
                            rng)
            row["fwd_ms"] = round(ms, 1)
            print(f"# {policy:5s} fwd      {ms:8.1f} ms (compile {cs:.0f}s)",
                  file=sys.stderr)
            ms, cs = timeit(jax.jit(loss_grad), trainable, frozen_arg, batch,
                            rng)
            row["fwd_bwd_ms"] = round(ms, 1)
            print(f"# {policy:5s} fwd+bwd  {ms:8.1f} ms (compile {cs:.0f}s)",
                  file=sys.stderr)

            state = jax.jit(lambda c: ts.init_train_state(c, tcfg))(trainable)
            jax.block_until_ready(state)
            step_fn = jax.jit(ts.make_train_step(cfg, tcfg, attn_impl="auto"),
                              donate_argnums=(0,))
            ms, cs = timeit(step_fn, state, frozen_arg, batch, rng,
                            donate_first=True)
            row["step_ms"] = round(ms, 1)
            row["bwd_ms"] = round(row["fwd_bwd_ms"] - row["fwd_ms"], 1)
            row["opt_ms"] = round(row["step_ms"] - row["fwd_bwd_ms"], 1)
            row["mfu"] = round(flops_step / (ms / 1000) / peak, 3)
            row["samples_per_sec"] = round(b / (ms / 1000), 3)
            print(f"# {policy:5s} step     {ms:8.1f} ms (compile {cs:.0f}s) "
                  f"mfu={row['mfu']:.3f}", file=sys.stderr)
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {str(e)[:300]}"
            print(f"# {policy} failed: {row['error']}", file=sys.stderr)
        rows[policy] = row
        # free this policy's state/programs before the next one: leftover
        # donated-state chains and compiled executables stack up and a later
        # policy can RESOURCE_EXHAUST spuriously (observed at trainbench
        # after a failed full-topology run left zombie buffers)
        import gc
        state = step_fn = None
        gc.collect()
        jax.clear_caches()

    out = {"preset": preset, "res": res, "batch": b, "accum": accum,
           "weights": "random", "flops_step_model": flops_step,
           "policies": rows}
    line = json.dumps(out)
    print(line)
    dest = os.environ.get("UNIGEN_PROFILE_OUT")
    if dest is None:
        dest = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "TRAIN_PROFILE.json")
    if dest:
        with open(dest, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
