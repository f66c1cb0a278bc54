#!/usr/bin/env python
"""Quantization fidelity measurement (VERDICT r1 items 1-2).

Measures, on device, with IDENTICAL weights and inputs:
  1. per-forward numeric fidelity (rel err + cosine) of the W8A8 and
     W4A8-serving-policy paths vs the parity-grade bf16 path, on the proxy
     preset (6/12 depth at REAL width 3072 — bf16 of the full 19/38 topology
     needs 35 GiB and cannot coexist with its quantized twin on one chip;
     per-block math is identical, depth compounds error and is reported
     per-block too);
  2. end-to-end image-space SSIM/PSNR through the FULL pipeline program
     (4-step denoise + VAE decode) between bf16 and each quantized path
     (--ssim; the BASELINE gate metric, unigen_tpu/eval.py).

HBM discipline (CLAUDE.md: d2h fails at >=~12 GiB residency): the three
param trees are 8.6 + 4.3 + 2.4 GiB — never resident together. Each path
re-derives its tree from the deterministic PRNGKey-0 init, runs, pulls its
output to host, and deletes the tree before the next path starts. The only
d2h reads happen at <=8.6 GiB residency.

Writes one JSON line to stdout and (optionally) FIDELITY.json.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# honor an explicit JAX_PLATFORMS request (the env var alone does not steer
# JAX here — the image's sitecustomize force-registers the axon plugin)
_want_platform = os.environ.get("JAX_PLATFORMS", "").strip().lower()
if _want_platform:
    import jax as _jax
    try:
        _jax.config.update("jax_platforms", _want_platform)
    except Exception:
        pass


def _delete_tree(tree):
    import jax
    for leaf in jax.tree.leaves(tree):
        try:
            leaf.delete()
        except Exception:
            pass
    gc.collect()


def _fidelity(a, r):
    a = np.asarray(a, np.float64).ravel()
    r = np.asarray(r, np.float64).ravel()
    rel = float(np.linalg.norm(a - r) / np.linalg.norm(r))
    cos = float(np.dot(a, r) / (np.linalg.norm(a) * np.linalg.norm(r)))
    return rel, cos



def _liven_gates(params):
    """Fresh random init zeroes the ControlNet-style gate linears
    (add_double/add_single/add_blocks — layers/core.init_linear(zero=True)),
    which nulls the ENTIRE control branch: a zero-gate fidelity run never
    sees control-path quantization error, and --subject measures nothing
    (the condition ids reach the output only through the control adds).
    Give the gates small random weights BEFORE each path quantizes the tree,
    so bf16/w8a8/w4a8 all see the same live control branch. --ckpt paths
    never pass through here (trained gates are already live)."""
    import jax
    import jax.numpy as jnp
    ctrl = dict(params["control"])
    key = jax.random.PRNGKey(77)
    for name in ("add_double", "add_single", "add_blocks"):
        if name in ctrl:
            key, ku = jax.random.split(key)
            ctrl[name] = jax.tree.map(
                lambda x: (0.02 * jax.random.normal(
                    ku, x.shape, jnp.float32)).astype(x.dtype),
                ctrl[name])
    return {**params, "control": ctrl}

def main_sd3(args):
    """--family sd3: W8A8 vs bf16 on the FULL SD3.5-medium UniGen stack
    (bf16 fits one chip, so no proxy is needed; trees run one at a time
    like the flux path). e2e = 28-step CFG denoise + tiny-VAE decode."""
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/unigen_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from unigen_tpu import presets
    from unigen_tpu.models import vae as vae_lib
    from unigen_tpu.models.unigen_sd3 import (init_unigen_sd3_params,
                                              unigen_sd3_forward)
    from unigen_tpu.ops.quant import quantize_tree_streaming
    from unigen_tpu.pipelines import scheduling

    dtype = jnp.bfloat16
    if args.ckpt:
        # real weights at the checkpoint's own topology (ROADMAP r3 gap #2:
        # SD3 real-weights fidelity — mirrors the flux --ckpt branch)
        from unigen_tpu import config as _C
        from unigen_tpu.io import torch_bridge as _tb
        from unigen_tpu.io import torch_bridge_sd3 as _tb3
        from unigen_tpu.models.unigen_sd3 import init_unigen_sd3_control
        from unigen_tpu.pipelines.loading import _subcfg, sd3_backbone_from_json
        sd3 = sd3_backbone_from_json(_subcfg(args.ckpt, "transformer"))
        cfg = _C.UniGenConfig(family="sd3", sd3=sd3,
                              control=_C.ControlConfig(use_rope=False),
                              condition_types=("depth",))
        bb = cfg.sd3

        def init_fn(_k):
            sd = _tb.read_checkpoint_dir(os.path.join(args.ckpt, "transformer"))
            base = _tb3.load_sd3_transformer(sd, bb, dtype=dtype)
            if args.adapter:
                n_cn = cfg.control.num_layers or bb.num_layers
                control = _tb3.load_sd3_unigen_adapter(
                    _tb.read_checkpoint_dir(args.adapter), bb, n_cn,
                    cfg.control.moe.num_experts(cfg.condition_nums),
                    dtype=dtype,
                    modulated=(cfg.control.use_modulate or cfg.control.use_rope))
            else:
                control = init_unigen_sd3_control(jax.random.PRNGKey(0), cfg,
                                                  dtype=dtype, base_params=base)
            return {"base": base, "control": control}
    else:
        cfg = presets.sd35_medium()
        bb = cfg.sd3
        init_fn = jax.jit(lambda k: _liven_gates(
            init_unigen_sd3_params(k, cfg, dtype=dtype)))
    res = args.res
    lat, t_len, b = res // 8, 77 + 256, 1

    def make_params(path):
        params = init_fn(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        if path == "bf16":
            return params
        if path == "w4a8":
            # the SD3 serving split (bench_sd3): frozen base int4, adapter int8
            return {"base": quantize_tree_streaming(params["base"], bits=4),
                    "control": quantize_tree_streaming(params["control"],
                                                       bits=8)}
        return quantize_tree_streaming(params)

    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    _h = lambda x: np.asarray(x.astype(jnp.float32))
    batch = dict(
        hidden=_h(jax.random.normal(ks[0], (b, bb.in_channels, lat, lat), dtype)),
        condition=_h(jax.random.normal(ks[1], (b, bb.in_channels, lat, lat), dtype)),
        encoder=_h(jax.random.normal(ks[2], (2 * b, t_len, bb.joint_attention_dim), dtype)),
        pooled=_h(jax.random.normal(ks[3], (2 * b, bb.pooled_projection_dim), dtype)),
        condition_pooled=_h(jax.random.normal(
            ks[4], (2 * b, bb.pooled_projection_dim), dtype)),
    )

    @jax.jit
    def fwd(p, batch):
        inp = {k: jnp.asarray(v, dtype) for k, v in batch.items()}
        out, _, _ = unigen_sd3_forward(
            p, cfg, hidden=inp["hidden"], condition=inp["condition"],
            encoder=inp["encoder"][:b], pooled=inp["pooled"][:b],
            condition_pooled=inp["condition_pooled"][:b],
            timestep=jnp.full((b,), 500.0, dtype), attn_impl="auto")
        return out.astype(jnp.float32)

    num_steps = 28
    sig_host = np.asarray(scheduling.inference_sigmas(
        scheduling.FlowMatchConfig(shift=3.0), num_steps)[0])
    vae_cfg = vae_lib.tiny_vae_config(latent_channels=bb.in_channels)
    vae_host = jax.tree.map(lambda x: np.asarray(x, np.float32),
                            vae_lib.init_vae_params(jax.random.PRNGKey(2),
                                                    vae_cfg))

    def make_jdd(interval: int, threshold: float = 0.0,
                 cfg_cache: bool = False, model_cache: bool = False,
                 hybrid: int = 1):
        """interval>1 or threshold>0: control-residual step caching on this
        path (the bf16 reference path always runs exact). cfg_cache: replay
        steps also skip the uncond stream (half-batch pos forward + cached
        guidance delta, pipelines/sd3.py cfg_cache). model_cache: replay
        steps reuse the whole cached guided prediction instead. hybrid>1:
        three-level cache (full / base-with-control-replay / prediction
        replay, caching.hybrid_cache_scan)."""
        from unigen_tpu.pipelines import caching
        adaptive = threshold > 0.0
        assert not (model_cache and cfg_cache)
        assert not (hybrid > 1 and (model_cache or cfg_cache or adaptive))

        def jdd(p, batch, vae_params):
            inp = {k: jnp.asarray(v, dtype) for k, v in batch.items()}
            sig = jnp.asarray(sig_host)
            cond2 = jnp.concatenate([inp["condition"]] * 2, 0)

            def f(lat_x, i, **kw):
                lat2 = jnp.concatenate([lat_x, lat_x], 0)
                pred, _, outs = unigen_sd3_forward(
                    p, cfg, hidden=lat2, condition=cond2,
                    encoder=inp["encoder"], pooled=inp["pooled"],
                    condition_pooled=inp["condition_pooled"],
                    timestep=jnp.full((2 * b,), sig[i] * 1000.0, dtype),
                    attn_impl="auto", **kw)
                uncond, text = pred[:b], pred[b:]
                return (uncond + 7.0 * (text - uncond), outs,
                        text - uncond)

            def f_pos(lat_x, i, res_pos):
                pred, _, _ = unigen_sd3_forward(
                    p, cfg, hidden=lat_x, condition=inp["condition"],
                    encoder=inp["encoder"][b:], pooled=inp["pooled"][b:],
                    condition_pooled=inp["condition_pooled"][b:],
                    timestep=jnp.full((b,), sig[i] * 1000.0, dtype),
                    attn_impl="auto", control_residuals=res_pos)
                return pred

            if interval <= 1 and not adaptive:
                def step(lat_x, i):
                    pred, _, _ = f(lat_x, i)
                    return scheduling.euler_step(lat_x, pred, sig[i],
                                                 sig[i + 1]), None

                lat_x, _ = jax.lax.scan(step, inp["hidden"],
                                        jnp.arange(num_steps))
            elif model_cache:
                lat_x, _ = caching.model_cache_scan(
                    lambda l, i: f(l, i)[0], inp["hidden"], sig, num_steps,
                    cache_interval=interval, adaptive=adaptive,
                    threshold=threshold if adaptive else None,
                    order=getattr(args, "model_cache_order", 0))
            elif hybrid > 1:
                s_tok = (lat // 2) ** 2
                zero = jnp.zeros((bb.num_layers, 2 * b, s_tok,
                                  bb.inner_dim), dtype)
                lat_x, _, _ = caching.hybrid_cache_scan(
                    lambda l, i: (lambda pr, o, _d:
                                  (pr, o["control_residuals"]))(
                        *f(l, i, return_control_residuals=True)),
                    lambda l, i, r: f(l, i, control_residuals=r)[0],
                    inp["hidden"], sig, num_steps, control_interval=interval,
                    model_interval=hybrid, residuals_init=zero,
                    order=getattr(args, "model_cache_order", 0))
            else:
                s_tok = (lat // 2) ** 2
                zero = jnp.zeros((bb.num_layers, 2 * b, s_tok,
                                  bb.inner_dim), dtype)

                def step(carry, i):
                    if adaptive:
                        lat_x, res, delta, lat_ref, n_ref = carry
                        refresh = caching.refresh_decision(i, lat_x, lat_ref,
                                                           threshold)
                    else:
                        lat_x, res, delta = carry
                        refresh = (i % interval) == 0

                    def full():
                        pred, outs, d = f(lat_x, i,
                                          return_control_residuals=True)
                        return pred, outs["control_residuals"], d

                    if cfg_cache:
                        def replay():
                            pos = f_pos(lat_x, i, res[:, b:])
                            return pos + 6.0 * delta, res, delta
                    else:
                        def replay():
                            pred, _, _ = f(lat_x, i,
                                           control_residuals=res)
                            return pred, res, delta

                    pred, res, delta = jax.lax.cond(refresh, full, replay)
                    nxt = scheduling.euler_step(lat_x, pred, sig[i],
                                                sig[i + 1])
                    if adaptive:
                        return (nxt, res, delta,
                                jnp.where(refresh, lat_x, lat_ref),
                                n_ref + refresh.astype(jnp.int32)), None
                    return (nxt, res, delta), None

                delta0 = jnp.zeros_like(inp["hidden"])
                if adaptive:
                    (lat_x, _, _, _, _), _ = jax.lax.scan(
                        step, (inp["hidden"], zero, delta0, inp["hidden"],
                               jnp.zeros((), jnp.int32)),
                        jnp.arange(num_steps))
                else:
                    (lat_x, _, _), _ = jax.lax.scan(
                        step, (inp["hidden"], zero, delta0),
                        jnp.arange(num_steps))
            px = vae_lib.vae_decode(vae_params, vae_cfg,
                                    lat_x.astype(jnp.float32))
            return jnp.clip(px, -1, 1)
        return jax.jit(jdd)

    jdd = make_jdd(1)
    jdd_cached = (make_jdd(args.cache_interval, args.cache_threshold,
                           getattr(args, "cfg_cache", False),
                           getattr(args, "model_cache", False),
                           getattr(args, "hybrid_model_interval", 1))
                  if args.cache_interval > 1 or args.cache_threshold > 0
                  else jdd)

    def to_u8(px):
        return ((np.asarray(px, np.float32).transpose(0, 2, 3, 1) + 1)
                * 127.5).round().astype(np.uint8)

    host = {}
    for path in ("bf16", "w8a8", "w4a8"):
        t0 = time.time()
        params = make_params(path)
        rec = {"fwd": np.asarray(fwd(params, batch))}
        if args.ssim:
            run_jdd = jdd if path == "bf16" else jdd_cached
            rec["img"] = to_u8(run_jdd(params, batch, vae_host))
        _delete_tree(params)
        host[path] = rec
        print(f"# sd3 {path} path done in {time.time()-t0:.0f}s",
              file=sys.stderr)

    out = {"family": "sd3",
           "topology": f"sd3_{bb.num_layers}blk_w{bb.inner_dim}",
           "weights": "real-ckpt" if args.ckpt else "random-init",
           "control_gates": "trained" if args.ckpt else "live-N(0,0.02)",
           "res": res}
    if args.cache_interval > 1:
        out["cache_interval"] = args.cache_interval
    if args.cache_threshold > 0:
        out["cache_threshold"] = args.cache_threshold
    if getattr(args, "cfg_cache", False):
        out["cfg_cache"] = True
    if getattr(args, "model_cache", False):
        out["model_cache"] = True
    if getattr(args, "hybrid_model_interval", 1) > 1:
        out["hybrid_model_interval"] = args.hybrid_model_interval
    for name in ("w8a8", "w4a8"):
        rel, cos = _fidelity(host[name]["fwd"], host["bf16"]["fwd"])
        out[name] = {"rel_err": round(rel, 5), "cosine": round(cos, 6)}
        if args.ssim:
            from unigen_tpu.eval import image_metrics
            m = image_metrics(host["bf16"]["img"], host[name]["img"])
            out[name]["e2e_ssim"] = round(m["ssim"], 5)
            out[name]["e2e_psnr"] = round(m["psnr"], 2)
    if args.ssim:
        out["e2e"] = f"{num_steps}-step CFG denoise + VAE decode @ {res}px"
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


def main_sana(args):
    """--family sana: W8A8 vs bf16 on the full SANA-1.6B UniGen stack
    (3.2 GiB bf16 — both trees trivially fit one at a time). e2e = 20-step
    denoise + tiny-VAE decode on the f32 latent grid."""
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/unigen_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from unigen_tpu import config as C
    from unigen_tpu.models import vae as vae_lib
    from unigen_tpu.models.sana import (init_sana_unigen_params,
                                        sana_unigen_forward)
    from unigen_tpu.ops.quant import quantize_tree_streaming
    from unigen_tpu.pipelines import scheduling

    dtype = jnp.bfloat16
    if args.ckpt:
        # real weights at the checkpoint's own topology (ROADMAP r3 gap #2)
        from unigen_tpu.io import torch_bridge as _tb
        from unigen_tpu.io import torch_bridge_sd3 as _tb3
        from unigen_tpu.models.sana import init_sana_unigen_control
        from unigen_tpu.pipelines.loading import (_subcfg,
                                                  sana_backbone_from_json)
        sana_bb = sana_backbone_from_json(_subcfg(args.ckpt, "transformer"))
        cfg = C.UniGenConfig(
            family="sana", sana=sana_bb,
            control=C.ControlConfig(moe=C.MoEConfig(batch_mode="per_sample")),
            condition_types=("canny",))
        bb = cfg.sana

        def init_fn(_k):
            sd = _tb.read_checkpoint_dir(os.path.join(args.ckpt, "transformer"))
            base = _tb3.load_sana_transformer(sd, bb, dtype=dtype)
            if args.adapter:
                n_cn = cfg.control.num_layers or bb.num_layers
                control = _tb3.load_sana_unigen_adapter(
                    _tb.read_checkpoint_dir(args.adapter), bb, n_cn,
                    cfg.control.moe.num_experts(cfg.condition_nums),
                    dtype=dtype)
            else:
                control = init_sana_unigen_control(jax.random.PRNGKey(0), cfg,
                                                   dtype=dtype,
                                                   base_params=base)
            return {"base": base, "control": control}
    else:
        cfg = C.UniGenConfig(
            family="sana", sana=C.SanaBackboneConfig(),
            control=C.ControlConfig(moe=C.MoEConfig(batch_mode="per_sample")),
            condition_types=("canny",))
        init_fn = jax.jit(lambda k: _liven_gates(
            init_sana_unigen_params(k, cfg, dtype=dtype)))
    bb = cfg.sana
    res = args.res if args.res != 256 else 512
    lat, t_len, b = res // 32, 300, 1

    def make_params(path):
        params = init_fn(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        return params if path == "bf16" else quantize_tree_streaming(params)

    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    _h = lambda x: np.asarray(x.astype(jnp.float32))
    batch = dict(
        hidden=_h(jax.random.normal(ks[0], (b, bb.in_channels, lat, lat), dtype)),
        condition=_h(jax.random.normal(ks[1], (b, bb.in_channels, lat, lat), dtype)),
        encoder=_h(jax.random.normal(ks[2], (b, t_len, bb.caption_channels), dtype)),
        pooled=_h(jax.random.normal(ks[3], (b, bb.pooled_projection_dim), dtype)),
        condition_pooled=_h(jax.random.normal(
            ks[4], (b, bb.pooled_projection_dim), dtype)),
    )

    @jax.jit
    def fwd(p, batch):
        inp = {k: jnp.asarray(v, dtype) for k, v in batch.items()}
        out, _, _ = sana_unigen_forward(
            p, cfg, hidden=inp["hidden"], condition=inp["condition"],
            encoder=inp["encoder"], pooled=inp["pooled"],
            condition_pooled=inp["condition_pooled"],
            timestep=jnp.full((b,), 500.0, dtype))
        return out.astype(jnp.float32)

    num_steps = 20
    sig_host = np.asarray(scheduling.inference_sigmas(
        scheduling.FlowMatchConfig(shift=3.0), num_steps)[0])
    vae_cfg = vae_lib.tiny_vae_config(latent_channels=bb.in_channels)
    vae_host = jax.tree.map(lambda x: np.asarray(x, np.float32),
                            vae_lib.init_vae_params(jax.random.PRNGKey(2),
                                                    vae_cfg))

    def make_jdd(interval: int, threshold: float = 0.0,
                 model_cache: bool = False, hybrid: int = 1):
        """interval>1 or threshold>0: control-residual step caching on this
        path (the bf16 reference path always runs exact). model_cache:
        replay steps reuse the whole cached prediction instead. hybrid>1:
        three-level cache (caching.hybrid_cache_scan)."""
        from unigen_tpu.pipelines import caching
        adaptive = threshold > 0.0

        def jdd(p, batch, vae_params):
            inp = {k: jnp.asarray(v, dtype) for k, v in batch.items()}
            sig = jnp.asarray(sig_host)

            def f(lat_x, i, **kw):
                pred, _, outs = sana_unigen_forward(
                    p, cfg, hidden=lat_x, condition=inp["condition"],
                    encoder=inp["encoder"], pooled=inp["pooled"],
                    condition_pooled=inp["condition_pooled"],
                    timestep=jnp.full((b,), sig[i] * 1000.0, dtype), **kw)
                return pred, outs

            if interval <= 1 and not adaptive:
                def step(lat_x, i):
                    pred, _ = f(lat_x, i)
                    return scheduling.euler_step(lat_x, pred, sig[i],
                                                 sig[i + 1]), None

                lat_x, _ = jax.lax.scan(step, inp["hidden"],
                                        jnp.arange(num_steps))
            elif model_cache:
                lat_x, _ = caching.model_cache_scan(
                    lambda l, i: f(l, i)[0], inp["hidden"], sig, num_steps,
                    cache_interval=interval, adaptive=adaptive,
                    threshold=threshold if adaptive else None,
                    order=getattr(args, "model_cache_order", 0))
            elif hybrid > 1:
                s_tok = (lat // bb.patch_size) ** 2
                zero = jnp.zeros((bb.num_layers, b, s_tok, bb.inner_dim),
                                 dtype)
                lat_x, _, _ = caching.hybrid_cache_scan(
                    lambda l, i: (lambda pr, o:
                                  (pr, o["control_residuals"]))(
                        *f(l, i, return_control_residuals=True)),
                    lambda l, i, r: f(l, i, control_residuals=r)[0],
                    inp["hidden"], sig, num_steps, control_interval=interval,
                    model_interval=hybrid, residuals_init=zero,
                    order=getattr(args, "model_cache_order", 0))
            else:
                s_tok = (lat // bb.patch_size) ** 2
                zero = jnp.zeros((bb.num_layers, b, s_tok, bb.inner_dim),
                                 dtype)

                def step(carry, i):
                    if adaptive:
                        lat_x, res_c, lat_ref, n_ref = carry
                        refresh = caching.refresh_decision(i, lat_x, lat_ref,
                                                           threshold)
                    else:
                        lat_x, res_c = carry
                        refresh = (i % interval) == 0

                    def full():
                        pred, outs = f(lat_x, i,
                                       return_control_residuals=True)
                        return pred, outs["control_residuals"]

                    def replay():
                        pred, _ = f(lat_x, i, control_residuals=res_c)
                        return pred, res_c

                    pred, res_c = jax.lax.cond(refresh, full, replay)
                    nxt = scheduling.euler_step(lat_x, pred, sig[i],
                                                sig[i + 1])
                    if adaptive:
                        return (nxt, res_c,
                                jnp.where(refresh, lat_x, lat_ref),
                                n_ref + refresh.astype(jnp.int32)), None
                    return (nxt, res_c), None

                if adaptive:
                    (lat_x, _, _, _), _ = jax.lax.scan(
                        step, (inp["hidden"], zero, inp["hidden"],
                               jnp.zeros((), jnp.int32)),
                        jnp.arange(num_steps))
                else:
                    (lat_x, _), _ = jax.lax.scan(step, (inp["hidden"], zero),
                                                 jnp.arange(num_steps))
            px = vae_lib.vae_decode(vae_params, vae_cfg,
                                    lat_x.astype(jnp.float32))
            return jnp.clip(px, -1, 1)
        return jax.jit(jdd)

    jdd = make_jdd(1)
    jdd_cached = (make_jdd(args.cache_interval, args.cache_threshold,
                           getattr(args, "model_cache", False),
                           getattr(args, "hybrid_model_interval", 1))
                  if args.cache_interval > 1 or args.cache_threshold > 0
                  else jdd)

    def to_u8(px):
        return ((np.asarray(px, np.float32).transpose(0, 2, 3, 1) + 1)
                * 127.5).round().astype(np.uint8)

    host = {}
    for path in ("bf16", "w8a8"):
        t0 = time.time()
        params = make_params(path)
        rec = {"fwd": np.asarray(fwd(params, batch))}
        if args.ssim:
            run_jdd = jdd if path == "bf16" else jdd_cached
            rec["img"] = to_u8(run_jdd(params, batch, vae_host))
        _delete_tree(params)
        host[path] = rec
        print(f"# sana {path} path done in {time.time()-t0:.0f}s",
              file=sys.stderr)

    rel, cos = _fidelity(host["w8a8"]["fwd"], host["bf16"]["fwd"])
    out = {"family": "sana",
           "topology": f"sana_{bb.num_layers}blk_w{bb.inner_dim}",
           "weights": "real-ckpt" if args.ckpt else "random-init",
           "res": res,
           "control_gates": "trained" if args.ckpt else "live-N(0,0.02)",
           "w8a8": {"rel_err": round(rel, 5), "cosine": round(cos, 6)}}
    if args.cache_interval > 1:
        out["cache_interval"] = args.cache_interval
    if args.cache_threshold > 0:
        out["cache_threshold"] = args.cache_threshold
    if getattr(args, "model_cache", False):
        out["model_cache"] = True
    if getattr(args, "hybrid_model_interval", 1) > 1:
        out["hybrid_model_interval"] = args.hybrid_model_interval
    if args.ssim:
        from unigen_tpu.eval import image_metrics
        m = image_metrics(host["bf16"]["img"], host["w8a8"]["img"])
        out["w8a8"]["e2e_ssim"] = round(m["ssim"], 5)
        out["w8a8"]["e2e_psnr"] = round(m["psnr"], 2)
        out["e2e"] = f"{num_steps}-step denoise + VAE decode @ {res}px"
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ssim", action="store_true",
                   help="also run the e2e denoise+VAE SSIM comparison")
    p.add_argument("--res", type=int, default=256,
                   help="image resolution for the e2e SSIM pass")
    p.add_argument("--family", default="flux", choices=["flux", "sd3", "sana"])
    p.add_argument("--out", default=None, help="write JSON here too")
    p.add_argument("--ckpt", default=None,
                   help="diffusers-layout checkpoint dir: measure fidelity "
                        "on REAL weights at the checkpoint's own topology "
                        "(all 3 families; scripts/validate_real_ckpt.py "
                        "stage 3) instead of the random-init proxy")
    p.add_argument("--adapter", default=None,
                   help="UniGen adapter dir for --ckpt mode (default: "
                        "warm-started control branch)")
    p.add_argument("--full-topology", action="store_true",
                   help="fidelity at FULL 19/38 DEPTH on device, at width "
                        "1536: full-depth bf16 at real width is 33 GiB and "
                        "full-depth W8A8 18.6 GiB — neither fits the chip, "
                        "and host compute is hypervisor-throttled to "
                        "~10 MB/s first-touch, so the depth-compounding "
                        "check runs all three dtypes through every one of "
                        "the 19+38 (+9+19 control) blocks at half width "
                        "(8.6/4.4/2.4 GiB sequential trees). Combined with "
                        "the default real-width 6/12-depth proxy, the two "
                        "runs bracket the full config on both axes.")
    p.add_argument("--cache-interval", type=int, default=1,
                   dest="cache_interval",
                   help="with --ssim (all families): run the QUANTIZED "
                        "paths with control-residual step caching at this "
                        "interval (bf16 stays exact) — measures the "
                        "ABSOLUTE quantization+caching fidelity")
    p.add_argument("--cache-threshold", type=float, default=0.0,
                   dest="cache_threshold",
                   help="with --ssim (all families): adaptive cache variant "
                        "— refresh when the latent drifts more than this "
                        "relative L1 since the last refresh "
                        "(pipelines/caching.py; overrides --cache-interval)")
    p.add_argument("--cfg-cache", action="store_true", dest="cfg_cache",
                   help="sd3 family: replay steps also skip the uncond "
                        "stream (half-batch pos forward + cached guidance "
                        "delta); requires --cache-interval/-threshold")
    p.add_argument("--model-cache", action="store_true", dest="model_cache",
                   help="all families: reinterpret --cache-interval/"
                        "-threshold as FULL-MODEL output caching (replay "
                        "steps skip the entire transformer and reuse the "
                        "cached guided prediction — pipelines "
                        "model_cache_*); incompatible with --cfg-cache")
    p.add_argument("--model-cache-order", type=int, default=0,
                   dest="model_cache_order", choices=[0, 1],
                   help="with --model-cache: 0 = zero-order hold (reuse the "
                        "last prediction), 1 = first-order Taylor "
                        "extrapolation from the two most recent refreshes "
                        "(caching.model_cache_scan)")
    p.add_argument("--hybrid-model-interval", type=int, default=1,
                   dest="hybrid_model_interval",
                   help="all families: three-level HYBRID cache — full "
                        "refresh every --cache-interval steps, base "
                        "transformer with control replay every this-many "
                        "steps between, prediction replay otherwise "
                        "(caching.hybrid_cache_scan; must divide "
                        "--cache-interval; fixed intervals only)")
    p.add_argument("--subject", action="store_true",
                   help="subject-driven conditioning (flux only): offset the "
                        "condition position ids by w/2 — the Subjects-200K "
                        "spatial-separation trick (reference "
                        "src/condition.py:107-135) — so the fidelity rows "
                        "cover BASELINE config #5's generation path")
    p.add_argument("--routing", default=None,
                   choices=["per_sample", "global"],
                   help="override MoE batch_mode: 'global' measures fidelity "
                        "in the reference-parity routing the serving presets "
                        "don't use (VERDICT r2 weak #7)")
    args = p.parse_args(argv)
    if args.hybrid_model_interval > 1:
        h, c = args.hybrid_model_interval, args.cache_interval
        if (c <= h or c % h or args.cache_threshold > 0
                or args.model_cache or args.cfg_cache):
            p.error("--hybrid-model-interval requires a larger "
                    "--cache-interval it divides, and no "
                    "--cache-threshold/--model-cache/--cfg-cache")
    if args.subject and args.family != "flux":
        p.error("--subject is a flux-family path (Subjects-200K)")
    if args.family in ("sd3", "sana"):
        return main_sd3(args) if args.family == "sd3" else main_sana(args)

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/unigen_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from unigen_tpu import presets
    from unigen_tpu.models.unigen_flux import (init_unigen_flux_params,
                                               unigen_flux_forward)
    from unigen_tpu.ops.packing import prepare_latent_image_ids
    from unigen_tpu.ops.quant import (quantize_tree_streaming,
                                      quantize_unigen_serving_streaming)
    from unigen_tpu.pipelines import scheduling

    dtype = jnp.bfloat16
    if args.ckpt:
        # real weights at the checkpoint's own topology (the re-measurement
        # the random-weight caveat in bench.py calls for)
        import json as _json
        import os as _os
        from unigen_tpu import config as _C
        with open(_os.path.join(args.ckpt, "transformer", "config.json")) as f:
            tcfg = _json.load(f)
        cfg = _C.UniGenConfig(
            family="flux",
            flux=_C.FluxBackboneConfig(
                in_channels=tcfg.get("in_channels", 64),
                num_layers=tcfg.get("num_layers", 19),
                num_single_layers=tcfg.get("num_single_layers", 38),
                attention_head_dim=tcfg.get("attention_head_dim", 128),
                num_attention_heads=tcfg.get("num_attention_heads", 24),
                joint_attention_dim=tcfg.get("joint_attention_dim", 4096),
                pooled_projection_dim=tcfg.get("pooled_projection_dim", 768),
                guidance_embeds=tcfg.get("guidance_embeds", False),
                axes_dims_rope=tuple(tcfg.get("axes_dims_rope", (16, 56, 56)))),
            condition_types=("canny",))
    elif args.full_topology:
        from unigen_tpu import config as _C
        cfg = _C.UniGenConfig(
            family="flux",
            flux=_C.FluxBackboneConfig(
                in_channels=64, num_layers=19, num_single_layers=38,
                attention_head_dim=128, num_attention_heads=12,
                joint_attention_dim=4096, pooled_projection_dim=768,
                axes_dims_rope=(16, 56, 56)),
            condition_types=("canny",))
    else:
        cfg = presets.flux_bench()
    if args.routing:
        from unigen_tpu import config as _Cr
        cfg = _Cr.replace(cfg, control=_Cr.replace(
            cfg.control, moe=_Cr.replace(cfg.control.moe,
                                         batch_mode=args.routing)))
    bb = cfg.flux
    res = args.res
    hw, t_len = res // 16, 512
    s_img = hw * hw
    b = 1

    if args.ckpt:
        from unigen_tpu.io import torch_bridge as _tb
        from unigen_tpu.models.unigen_flux import init_unigen_flux_control

        def init_fn(_k):
            import os as _os
            sd = _tb.read_checkpoint_dir(_os.path.join(args.ckpt, "transformer"))
            base = _tb.load_flux_transformer(sd, bb.num_layers,
                                             bb.num_single_layers, dtype=dtype)
            n_cn = bb.num_layers // cfg.control.single_control_dev
            n_cn_s = bb.num_single_layers // cfg.control.single_control_dev
            if args.adapter:
                control = _tb.load_adapter_checkpoint(
                    args.adapter, n_cn=n_cn, n_cn_single=n_cn_s,
                    num_experts=cfg.control.moe.num_experts(cfg.condition_nums),
                    dtype=dtype, guidance=bb.guidance_embeds)
            else:
                control = init_unigen_flux_control(jax.random.PRNGKey(0), cfg,
                                                   dtype=dtype, base_params=base)
            return {"base": base, "control": control}
    else:
        init_fn = jax.jit(lambda k: _liven_gates(
            init_unigen_flux_params(k, cfg, dtype=dtype)))
    quantizers = {"bf16": None, "w8a8": quantize_tree_streaming,
                  "w4a8_serving": quantize_unigen_serving_streaming}

    def make_params(path: str):
        """Fresh tree for one path. The streaming quantizers consume the
        bf16 source leaf-by-leaf (donate=True), so peak HBM stays at the
        source tree + one leaf — jit(quantize)(tree) holds source +
        quantized together and RESOURCE_EXHAUSTs at this size."""
        params = init_fn(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        q = quantizers[path]
        if q is None:
            return params
        return q(params)

    # batch stays HOST numpy: closing a jit over device arrays does a
    # trace-time d2h pull, the exact fragile path this script avoids
    # (CLAUDE.md closure-constants rule); jnp conversion happens inside the
    # jitted programs from host buffers.
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    _h = lambda x: np.asarray(x.astype(jnp.float32))
    _FP = ("hidden", "condition", "encoder", "pooled", "condition_pooled")
    batch = dict(
        hidden=_h(jax.random.normal(ks[0], (b, s_img, bb.in_channels), dtype)),
        condition=_h(jax.random.normal(ks[1], (b, s_img, bb.in_channels), dtype)),
        encoder=_h(jax.random.normal(ks[2], (b, t_len, bb.joint_attention_dim),
                                     dtype)),
        pooled=_h(jax.random.normal(ks[3], (b, bb.pooled_projection_dim), dtype)),
        condition_pooled=_h(jax.random.normal(
            ks[4], (b, bb.pooled_projection_dim), dtype)),
        img_ids=np.asarray(prepare_latent_image_ids(hw, hw)),
        txt_ids=np.zeros((t_len, 3), np.float32),
        condition_ids=np.asarray(prepare_latent_image_ids(hw, hw)),
    )
    if args.subject:
        # subject-driven generation: condition tokens sit BESIDE the image
        # grid (cond_ids[:, 2] += w/2, reference src/condition.py:118-121)
        from unigen_tpu.data.conditions import condition_id_offset
        # hw is the PACKED grid width; the offset takes the LATENT width
        # (2*hw) and returns the full packed width, like the serving path
        batch["condition_ids"] = np.asarray(prepare_latent_image_ids(
            hw, hw, condition_id_offset("subject", 2 * hw)))

    def _cast(batch):
        return {k: jnp.asarray(v, dtype if k in _FP else None)
                for k, v in batch.items()}

    @jax.jit
    def fwd(p, batch):
        out, _, _ = unigen_flux_forward(
            p, cfg, **_cast(batch), timestep=jnp.full((b,), 0.5, dtype),
            attn_impl="auto")
        return out.astype(jnp.float32)

    def fidelity(a, r):
        a = np.asarray(a, np.float64).ravel()
        r = np.asarray(r, np.float64).ravel()
        rel = float(np.linalg.norm(a - r) / np.linalg.norm(r))
        cos = float(np.dot(a, r) / (np.linalg.norm(a) * np.linalg.norm(r)))
        return rel, cos

    # --- optional e2e denoise+decode program (shared across paths) ---
    if args.ssim:
        from unigen_tpu.models import vae as vae_lib
        from unigen_tpu.ops.packing import unpack_latents
        vae_cfg = vae_lib.tiny_vae_config(latent_channels=bb.in_channels // 4)
        # vae params built ON HOST (numpy tree) so jdd takes them as an
        # argument — no device-array closures (CLAUDE.md)
        vae_host = jax.tree.map(
            lambda x: np.asarray(x, np.float32),
            vae_lib.init_vae_params(jax.random.PRNGKey(2), vae_cfg))
        num_steps = 4
        sig_host, _ = scheduling.inference_sigmas(
            scheduling.FlowMatchConfig(shift=1.0), num_steps)
        sig_host = np.asarray(sig_host)
        lh = lw = (res // 16) * 2

        def make_jdd(interval: int, threshold: float = 0.0,
                     model_cache: bool = False, hybrid: int = 1):
            """interval>1 or threshold>0: control-residual step caching on
            this path (the bf16 reference path always runs exact) — measures
            the ABSOLUTE quantization+caching fidelity, vs CACHE.json's
            cached-vs-exact. model_cache=True: replay steps reuse the whole
            cached prediction instead (pipelines model_cache_*). hybrid>1:
            three-level cache — full refresh every `interval` steps, base
            transformer with control replay every `hybrid` steps between,
            prediction replay otherwise (caching.hybrid_cache_scan)."""
            from unigen_tpu.pipelines import caching
            adaptive = threshold > 0.0

            def jdd(p, batch, vae_params):
                inp = _cast(batch)
                lat = inp["hidden"]
                sigmas = jnp.asarray(sig_host)

                def fwd(lat, i, **kw):
                    pred, _, outs = unigen_flux_forward(
                        p, cfg, **{**inp, "hidden": lat},
                        timestep=jnp.full((b,), sigmas[i], dtype),
                        attn_impl="auto", **kw)
                    return pred, outs

                if interval <= 1 and not adaptive:
                    def step(lat, i):
                        pred, _ = fwd(lat, i)
                        return scheduling.euler_step(
                            lat, pred, sigmas[i], sigmas[i + 1]), None
                    lat, _ = jax.lax.scan(step, lat, jnp.arange(num_steps))
                elif model_cache:
                    lat, _ = caching.model_cache_scan(
                        lambda l, i: fwd(l, i)[0], lat, sigmas, num_steps,
                        cache_interval=interval, adaptive=adaptive,
                        threshold=threshold if adaptive else None,
                        order=getattr(args, "model_cache_order", 0))
                elif hybrid > 1:
                    d = bb.inner_dim
                    zero = (jnp.zeros((bb.num_layers, b, s_img, d), dtype),
                            jnp.zeros((bb.num_single_layers, b,
                                       t_len + s_img, d), dtype))
                    lat, _, _ = caching.hybrid_cache_scan(
                        lambda l, i: (lambda pr, o:
                                      (pr, o["control_residuals"]))(
                            *fwd(l, i, return_control_residuals=True)),
                        lambda l, i, r: fwd(l, i, control_residuals=r)[0],
                        lat, sigmas, num_steps, control_interval=interval,
                        model_interval=hybrid, residuals_init=zero,
                        order=getattr(args, "model_cache_order", 0))
                else:
                    d = bb.inner_dim
                    zero = (jnp.zeros((bb.num_layers, b, s_img, d), dtype),
                            jnp.zeros((bb.num_single_layers, b,
                                       t_len + s_img, d), dtype))

                    def step(carry, i):
                        if adaptive:
                            lat, res, lat_ref, n_ref = carry
                            refresh = caching.refresh_decision(
                                i, lat, lat_ref, threshold)
                        else:
                            lat, res = carry
                            refresh = (i % interval) == 0

                        def full():
                            pred, outs = fwd(
                                lat, i, return_control_residuals=True)
                            return pred, outs["control_residuals"]

                        def replay():
                            pred, _ = fwd(lat, i, control_residuals=res)
                            return pred, res

                        pred, res = jax.lax.cond(refresh, full, replay)
                        nxt = scheduling.euler_step(lat, pred, sigmas[i],
                                                    sigmas[i + 1])
                        if adaptive:
                            return (nxt, res,
                                    jnp.where(refresh, lat, lat_ref),
                                    n_ref + refresh.astype(jnp.int32)), None
                        return (nxt, res), None

                    if adaptive:
                        (lat, _, _, _), _ = jax.lax.scan(
                            step, (lat, zero, lat, jnp.zeros((), jnp.int32)),
                            jnp.arange(num_steps))
                    else:
                        (lat, _), _ = jax.lax.scan(step, (lat, zero),
                                                   jnp.arange(num_steps))
                px = vae_lib.vae_decode(
                    vae_params, vae_cfg,
                    unpack_latents(lat.astype(jnp.float32), lh, lw))
                return jnp.clip(px, -1, 1)
            return jax.jit(jdd)

        jdd = make_jdd(1)
        jdd_cached = (make_jdd(args.cache_interval, args.cache_threshold,
                               getattr(args, "model_cache", False),
                               getattr(args, "hybrid_model_interval", 1))
                      if args.cache_interval > 1 or args.cache_threshold > 0
                      else jdd)

        def to_u8(px):
            return ((np.asarray(px, np.float32).transpose(0, 2, 3, 1) + 1)
                    * 127.5).round().astype(np.uint8)

    # --- one path at a time: derive tree -> run -> pull -> delete ---
    host = {}
    for path in ("bf16", "w8a8", "w4a8_serving"):
        t0 = time.time()
        params = make_params(path)
        rec = {"fwd": np.asarray(fwd(params, batch))}
        if args.ssim:
            # bf16 is the exact reference; quantized paths additionally run
            # the control cache when --cache-interval > 1
            run_jdd = jdd if path == "bf16" else jdd_cached
            rec["img"] = to_u8(run_jdd(params, batch, vae_host))
        _delete_tree(params)
        host[path] = rec
        print(f"# {path} path done in {time.time()-t0:.0f}s", file=sys.stderr)

    topo_key = ("full_depth_topology" if args.full_topology
                else "proxy_topology")
    out = {topo_key:
           f"{bb.num_layers}dbl_{bb.num_single_layers}sgl_w{bb.inner_dim}",
           "res": res,
           "control_gates": "trained" if args.ckpt else "live-N(0,0.02)"}
    if args.cache_interval > 1:
        out["cache_interval"] = args.cache_interval
    if args.cache_threshold > 0:
        out["cache_threshold"] = args.cache_threshold
    if getattr(args, "model_cache", False):
        out["model_cache"] = True
    if getattr(args, "hybrid_model_interval", 1) > 1:
        out["hybrid_model_interval"] = args.hybrid_model_interval
    if args.subject:
        out["condition"] = "subject"
    for name in ("w8a8", "w4a8_serving"):
        rel, cos = fidelity(host[name]["fwd"], host["bf16"]["fwd"])
        out[name] = {"rel_err": round(rel, 5), "cosine": round(cos, 6)}
    if args.ssim:
        from unigen_tpu.eval import image_metrics
        for name in ("w8a8", "w4a8_serving"):
            m = image_metrics(host["bf16"]["img"], host[name]["img"])
            out[name]["e2e_ssim"] = round(m["ssim"], 5)
            out[name]["e2e_psnr"] = round(m["psnr"], 2)
        out["e2e"] = f"{num_steps}-step denoise + VAE decode @ {res}px"

    line = json.dumps(out)
    print(line)
    if args.full_topology:
        # merge the full-depth section into FIDELITY.json alongside the
        # real-width proxy numbers (the two runs bracket the full config)
        fid_path = args.out or os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "FIDELITY.json")
        try:
            with open(fid_path) as f:
                fid = json.load(f)
        except Exception:
            fid = {}
        fid["full_depth"] = out
        with open(fid_path, "w") as f:
            json.dump(fid, f)
            f.write("\n")
    elif args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
