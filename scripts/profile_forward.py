#!/usr/bin/env python
"""Per-phase forward-time attribution on device (guides bf16 optimization:
VERDICT r1 'weak #1' asks bf16 toward 2x the A100 roofline estimate).

Times, at bench shapes, separate jitted programs for:
  embed     — input/context/time embedders + both rope tables
  double    — base double-block stack alone (scan, no control)
  double+cn — double stack with interleaved control blocks + gated adds
  moe       — MoE preprocess (route + experts + shared-expert weave)
  single    — base single-block stack alone
  single+cn — single stack with control
  full      — the real unigen_flux_forward

Phase times do not sum exactly to the full program (XLA fuses across phase
boundaries there) but the deltas (double+cn minus double, etc.) attribute
control-branch and MoE cost, and phase/full ratios expose where the HBM
roofline binds. Burst-timed (K calls, one scalar host-read sync) because the
axon tunnel adds ~4 ms dispatch per call and block_until_ready can return
early (CLAUDE.md).

Usage: UNIGEN_BENCH_PRESET=proxy|full UNIGEN_PROFILE_BATCH=2 python
scripts/profile_forward.py

Batch-scaling attribution (VERDICT r3 #2): UNIGEN_PROFILE_BATCHES=1,2,4,8
sweeps batch sizes in one process (tree initialised once) and reports every
phase per batch PLUS per-image normalisation (ms/img = ms/b) and an isolated
"attn" phase (the fused attention kernel alone at the stream length, scanned
over the layer count) — per-image time that RISES with batch localises the
negative batch scaling to a phase. UNIGEN_PROFILE_OUT=<path> writes the
sweep JSON there too.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/unigen_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from unigen_tpu import presets
    from unigen_tpu.layers.blocks_flux import flux_double_block, flux_single_block
    from unigen_tpu.layers.core import linear
    from unigen_tpu.models.flux import flux_embed_inputs, flux_rope
    from unigen_tpu.models.unigen_flux import (control_block_index_table,
                                               init_unigen_flux_params,
                                               preprocess_moe,
                                               unigen_flux_forward)
    from unigen_tpu.ops.packing import prepare_latent_image_ids
    from unigen_tpu.utils import index_params

    preset = os.environ.get("UNIGEN_BENCH_PRESET", "proxy")
    quant = os.environ.get("UNIGEN_BENCH_QUANT", "bf16")
    bs_env = os.environ.get("UNIGEN_PROFILE_BATCHES", "")
    batches = ([int(x) for x in bs_env.split(",")] if bs_env
               else [int(os.environ.get("UNIGEN_PROFILE_BATCH", "2"))])
    res = int(os.environ.get("UNIGEN_BENCH_RES", "512"))
    cfg = {"full": presets.flux_full, "tiny": presets.tiny}.get(
        preset, presets.flux_bench)()
    if preset == "tiny":  # CPU smoke: force the host backend before first use
        jax.config.update("jax_platforms", "cpu")
    bb, cc = cfg.flux, cfg.control
    dtype = jnp.bfloat16
    hw, t_len = res // 16, 512
    s_img = hw * hw
    heads = bb.num_attention_heads

    img_ids = np.asarray(prepare_latent_image_ids(hw, hw))
    txt_ids = np.zeros((t_len, 3), np.float32)

    def _init(k):
        p = init_unigen_flux_params(k, cfg, dtype=dtype)
        if quant == "w4a8":
            from unigen_tpu.ops.quant import quantize_unigen_serving
            p = quantize_unigen_serving(p)
        elif quant == "w8a8":
            from unigen_tpu.ops.quant import quantize_tree
            p = quantize_tree(p)
        return p

    if quant == "bf16":
        params = jax.jit(_init)(jax.random.PRNGKey(0))
    else:
        # leaf-wise fill: one-shot jit(init->quantize) OOMs at full topology
        import bench as B
        params = B.direct_quantized_init(jax.random.PRNGKey(0), _init)
    jax.block_until_ready(params)

    n_base, n_single = bb.num_layers, bb.num_single_layers
    n_cn = n_base // cc.single_control_dev
    n_cn_s = n_single // cc.single_control_dev
    cn_table_host = control_block_index_table(n_base, n_cn)
    cn_s_table_host = control_block_index_table(n_single, n_cn_s)

    def embed_phase(params, hidden, encoder, pooled, timestep):
        base = params["base"]
        h, enc, temb = flux_embed_inputs(base, bb, hidden, encoder, pooled,
                                         timestep, None)
        rope_base = flux_rope(bb, jnp.concatenate(
            [jnp.asarray(txt_ids), jnp.asarray(img_ids)], axis=0))
        return h, enc, temb, rope_base[0]

    def double_phase(params, hidden, encoder, pooled, timestep):
        base = params["base"]
        h, enc, temb = flux_embed_inputs(base, bb, hidden, encoder, pooled,
                                         timestep, None)
        rope_base = flux_rope(bb, jnp.concatenate(
            [jnp.asarray(txt_ids), jnp.asarray(img_ids)], axis=0))

        def body(carry, i):
            h, enc = carry
            enc, h = flux_double_block(index_params(base["double_blocks"], i),
                                       h, enc, temb, rope_base, heads=heads)
            return (h, enc), None
        (h, enc), _ = jax.lax.scan(body, (h, enc), jnp.arange(n_base))
        return h

    def double_cn_phase(params, hidden, condition, encoder, pooled,
                        cond_pooled, timestep):
        base, ctrl = params["base"], params["control"]
        h, enc, temb = flux_embed_inputs(base, bb, hidden, encoder, pooled,
                                         timestep, None)
        ids_i, ids_t = jnp.asarray(img_ids), jnp.asarray(txt_ids)
        rope_base = flux_rope(bb, jnp.concatenate([ids_t, ids_i], axis=0))
        rope_cn = flux_rope(bb, jnp.concatenate([ids_i, ids_t], axis=0))
        cn_table = jnp.asarray(cn_table_host)
        # fixed stand-ins for the preprocess outputs (same shapes/costs)
        control_enc = linear(ctrl["context_embedder"], enc)
        block_temb = temb

        def body(carry, i):
            h, enc = carry
            enc, h = flux_double_block(index_params(base["double_blocks"], i),
                                       h, enc, temb, rope_base, heads=heads)
            _, cn_out = flux_double_block(
                index_params(ctrl["double_blocks"], cn_table[i]), h,
                control_enc, block_temb, rope_cn, heads=heads,
                context_first=False)
            h = h + linear(index_params(ctrl["add_double"], cn_table[i]), cn_out)
            return (h, enc), None
        (h, enc), _ = jax.lax.scan(body, (h, enc), jnp.arange(n_base))
        return h

    def moe_phase(params, hidden, condition, encoder, pooled, cond_pooled,
                  timestep):
        base, ctrl = params["base"], params["control"]
        h, enc, temb = flux_embed_inputs(base, bb, hidden, encoder, pooled,
                                         timestep, None)
        ids_i, ids_t = jnp.asarray(img_ids), jnp.asarray(txt_ids)
        pre = preprocess_moe(ctrl, cfg, h, enc, condition, pooled, cond_pooled,
                             timestep, None, ids_i, ids_t, ids_i)
        return pre.moe_hidden

    def single_phase(params, hidden, encoder, pooled, timestep):
        base = params["base"]
        h, enc, temb = flux_embed_inputs(base, bb, hidden, encoder, pooled,
                                         timestep, None)
        rope_base = flux_rope(bb, jnp.concatenate(
            [jnp.asarray(txt_ids), jnp.asarray(img_ids)], axis=0))
        stream = jnp.concatenate([enc, h], axis=1)

        def body(stream, block_p):
            return flux_single_block(block_p, stream, temb, rope_base,
                                     heads=heads), None
        stream, _ = jax.lax.scan(body, stream, base["single_blocks"])
        return stream

    def single_cn_phase(params, hidden, encoder, pooled, timestep):
        base, ctrl = params["base"], params["control"]
        h, enc, temb = flux_embed_inputs(base, bb, hidden, encoder, pooled,
                                         timestep, None)
        rope_base = flux_rope(bb, jnp.concatenate(
            [jnp.asarray(txt_ids), jnp.asarray(img_ids)], axis=0))
        stream = jnp.concatenate([enc, h], axis=1)
        cn_s_table = jnp.asarray(cn_s_table_host)

        def body(stream, xs):
            block_p, cn_idx = xs
            stream = flux_single_block(block_p, stream, temb, rope_base,
                                       heads=heads)
            cn_out = flux_single_block(index_params(ctrl["single_blocks"], cn_idx),
                                       stream, temb, rope_base, heads=heads)
            stream = stream + linear(index_params(ctrl["add_single"], cn_idx),
                                     cn_out)
            return stream, None
        stream, _ = jax.lax.scan(body, stream,
                                 (base["single_blocks"], cn_s_table))
        return stream

    def full_phase(params, hidden, condition, encoder, pooled, cond_pooled,
                   timestep):
        pred, _, _ = unigen_flux_forward(
            params, cfg, hidden=hidden, condition=condition, encoder=encoder,
            pooled=pooled, condition_pooled=cond_pooled, timestep=timestep,
            img_ids=jnp.asarray(img_ids), txt_ids=jnp.asarray(txt_ids),
            condition_ids=jnp.asarray(img_ids), attn_impl="auto")
        return pred

    def attn_phase(params, q, k, v):
        """The attention kernel ALONE at the stream length, scanned over the
        full layer count (n_base + n_single) — isolates kernel-grid /
        batch-tiling effects from the surrounding matmuls. RoPE tables fused
        the way the real blocks fuse them."""
        from unigen_tpu.ops.attention import sdpa
        rope = flux_rope(bb, jnp.concatenate(
            [jnp.asarray(txt_ids), jnp.asarray(img_ids)], axis=0))

        def body(x, _):
            # real carry dependence (a *0 term would let XLA hoist the sdpa
            # out of the scan and time one call instead of N)
            q_i = q + jnp.asarray(1e-6, q.dtype) * x[:, None]
            out = sdpa(q_i, k, v, impl="auto", rope=rope)
            return out.mean(axis=1), None
        x0 = jnp.zeros((q.shape[0], q.shape[2], q.shape[3]), q.dtype)
        x, _ = jax.lax.scan(body, x0, jnp.arange(n_base + n_single))
        return x

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    def run_batch(b):
        ks = jax.random.split(jax.random.PRNGKey(1), 8)
        hidden = jax.random.normal(ks[0], (b, s_img, bb.in_channels), dtype)
        condition = jax.random.normal(ks[1], (b, s_img, bb.in_channels), dtype)
        encoder = jax.random.normal(ks[2], (b, t_len, bb.joint_attention_dim),
                                    dtype)
        pooled = jax.random.normal(ks[3], (b, bb.pooled_projection_dim), dtype)
        cond_pooled = jax.random.normal(ks[4], (b, bb.pooled_projection_dim),
                                        dtype)
        timestep = jnp.full((b,), 0.5, dtype)
        s_tot = t_len + s_img
        hd = bb.attention_head_dim
        q = jax.random.normal(ks[5], (b, heads, s_tot, hd), dtype)
        k = jax.random.normal(ks[6], (b, heads, s_tot, hd), dtype)
        v = jax.random.normal(ks[7], (b, heads, s_tot, hd), dtype)

        phases = {
            "embed": (embed_phase, (params, hidden, encoder, pooled, timestep)),
            "attn": (attn_phase, (params, q, k, v)),
            "double": (double_phase, (params, hidden, encoder, pooled,
                                      timestep)),
            "double_cn": (double_cn_phase, (params, hidden, condition, encoder,
                                            pooled, cond_pooled, timestep)),
            "moe": (moe_phase, (params, hidden, condition, encoder, pooled,
                                cond_pooled, timestep)),
            "single": (single_phase, (params, hidden, encoder, pooled,
                                      timestep)),
            "single_cn": (single_cn_phase, (params, hidden, encoder, pooled,
                                            timestep)),
            "full": (full_phase, (params, hidden, condition, encoder, pooled,
                                  cond_pooled, timestep)),
        }

        want = os.environ.get("UNIGEN_PROFILE_PHASES", "")
        if want:
            keep = [w.strip() for w in want.split(",")]
            phases = {k2: v for k2, v in phases.items() if k2 in keep}

        report = {}
        for name, (fn, args) in phases.items():
            jfn = jax.jit(fn)
            t0 = time.time()
            try:
                out = jfn(*args)
                _ = sync(out)
            except Exception as e:
                print(f"# b={b} {name} failed: {type(e).__name__}: "
                      f"{str(e)[:200]}", file=sys.stderr)
                continue
            compile_s = time.time() - t0
            K = 4
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(K):
                    out = jfn(*args)
                _ = sync(out)
                times.append((time.perf_counter() - t0) / K)
            ms = min(times) * 1000
            report[name] = round(ms, 2)
            print(f"# b={b} {name:10s} {ms:8.2f} ms  {ms/b:8.2f} ms/img  "
                  f"(compile {compile_s:.1f}s)", file=sys.stderr)

        if "double_cn" in report and "double" in report:
            report["control_double_ms"] = round(
                report["double_cn"] - report["double"], 2)
        if "single_cn" in report and "single" in report:
            report["control_single_ms"] = round(
                report["single_cn"] - report["single"], 2)
        return report

    sweep = []
    for b in batches:
        report = run_batch(b)
        sweep.append({"batch": b, "phase_ms": report,
                      "phase_ms_per_img": {k2: round(v / b, 2)
                                           for k2, v in report.items()}})

    out = {"preset": preset, "quant": quant, "res": res, "batches": batches,
           "weights": "random"}
    if len(sweep) == 1:
        out.update({"batch": batches[0], "phase_ms": sweep[0]["phase_ms"]})
    else:
        out["sweep"] = sweep
        # per-image scaling of each phase, largest/smallest batch — the
        # negative-batch-scaling attribution in one number per phase
        lo, hi = sweep[0], sweep[-1]
        out["per_img_scaling"] = {
            k2: round(hi["phase_ms_per_img"][k2] / lo["phase_ms_per_img"][k2], 3)
            for k2 in hi["phase_ms_per_img"]
            if k2 in lo["phase_ms_per_img"] and lo["phase_ms_per_img"][k2] > 0}
    line = json.dumps(out)
    print(line)
    dest = os.environ.get("UNIGEN_PROFILE_OUT")
    if dest:
        with open(dest, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
