#!/usr/bin/env python
"""Real-checkpoint validation harness — ready to execute the moment a
weights-available environment appears (VERDICT r2 #10; the standing
environment-blocked item: no released FLUX/SD3/SANA checkpoint is reachable
from this machine, so all fidelity gates so far are random-weight relative).

Given a diffusers-layout checkpoint directory this runs, in order:

  1. STRICT load audit — every component through the io/torch_bridge
     loaders with strict=True, so any checkpoint key that maps to nothing
     fails loudly (the reference logs strict=False results and moves on,
     infer.py:141).
  2. Per-block goldens vs diffusers — when ``diffusers``+``torch`` are
     importable, run the REAL FluxTransformer2DModel (etc.) block-by-block
     against our functional blocks on the same weights (tolerance 2e-3,
     matching tests/test_torch_*_golden.py which pin the same contract on
     random weights).
  3. Quantization fidelity at real weights — bf16 vs W8A8 vs W4A8 e2e SSIM
     through the 4-step denoise + VAE decode (the BASELINE >=0.99 gate,
     re-measured on REAL weight distributions; see the caveat in bench.py).

Usage:
  python scripts/validate_real_ckpt.py --ckpt /path/to/FLUX.1-schnell \
      [--family flux] [--adapter /path/to/unigen_adapter] [--skip-diffusers]

Exit code 0 = all executed stages passed; stages that cannot run in this
environment (no torch/diffusers, no weights) are reported SKIPPED.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="validate a real checkpoint")
    p.add_argument("--ckpt", required=True, help="diffusers-layout model dir")
    p.add_argument("--family", default="flux",
                   choices=["flux", "sd3", "sana"])
    p.add_argument("--adapter", default=None,
                   help="UniGen adapter checkpoint dir (any supported format)")
    p.add_argument("--lora-dir", default=None,
                   help="per-adapter LoRA dir (reference hook.py layout)")
    p.add_argument("--skip-diffusers", action="store_true")
    p.add_argument("--ssim-gate", type=float, default=0.99)
    p.add_argument("--res", type=int, default=512,
                   help="resolution for the fidelity stage")
    p.add_argument("--out", default="VALIDATE_REAL.json")
    return p.parse_args(argv)


def stage_strict_load(args, report):
    """Stage 1: strict-mode transformer audit + full-pipeline component load
    (load_flux_pipeline reads each subfolder's config.json, so VAE/CLIP/T5
    load at the checkpoint's own shapes)."""
    import json as _json

    import jax.numpy as jnp

    from unigen_tpu.io import torch_bridge as tb

    results = {}
    tdir = os.path.join(args.ckpt, "transformer")
    if args.family == "flux":
        sd = tb.read_checkpoint_dir(tdir)
        with open(os.path.join(tdir, "config.json")) as f:
            tcfg = _json.load(f)
        base = tb.load_flux_transformer(
            sd, tcfg.get("num_layers", 19), tcfg.get("num_single_layers", 38),
            dtype=jnp.bfloat16, strict=True)
        results["transformer"] = f"ok ({sum(x.size for x in _leaves(base))} params, strict)"
        from unigen_tpu.pipelines.loading import load_flux_pipeline
        pipe = load_flux_pipeline(args.ckpt, adapter_dir=args.adapter,
                                  lora_dir=args.lora_dir)
        for comp, tree in (("vae", pipe.vae_params),
                           ("text_encoder", pipe.clip_params),
                           ("text_encoder_2", pipe.t5_params)):
            results[comp] = (f"ok ({sum(x.size for x in _leaves(tree))} params)"
                             if tree is not None else "absent")
        if args.adapter:
            results["adapter"] = \
                f"ok ({sum(x.size for x in _leaves(pipe.params['control']))} params)"
        if args.lora_dir:
            results["lora"] = f"ok ({sorted(pipe._lora.adapters)})"
    elif args.family == "sd3":
        from unigen_tpu.pipelines.loading import load_sd3_pipeline
        pipe = load_sd3_pipeline(args.ckpt, adapter_dir=args.adapter)
        results["transformer"] = \
            f"ok ({sum(x.size for x in _leaves(pipe.params))} params)"
        results["vae"] = (f"ok ({sum(x.size for x in _leaves(pipe.vae_params))}"
                          " params)" if pipe.vae_params is not None else "absent")
        if pipe.text_encoders is not None:
            results["text_encoders"] = \
                f"ok ({sorted(k for k, v in pipe.text_encoders.items() if v)})"
    else:
        from unigen_tpu.pipelines.loading import load_sana_pipeline
        pipe = load_sana_pipeline(args.ckpt, adapter_dir=args.adapter)
        results["transformer"] = \
            f"ok ({sum(x.size for x in _leaves(pipe.params))} params)"
        results["text_encoder"] = (
            f"ok ({sum(x.size for x in _leaves(pipe.gemma_params))} params)"
            if pipe.gemma_params is not None else "absent")
    report["strict_load"] = results


def _leaves(tree):
    import jax
    return jax.tree.leaves(tree)


def stage_diffusers_goldens(args, report):
    """Stage 2: our blocks vs the REAL diffusers module on the same weights."""
    try:
        import torch
        from diffusers import FluxTransformer2DModel
    except Exception as e:
        report["diffusers_goldens"] = f"SKIPPED (no diffusers: {e})"
        return
    import numpy as np

    import jax.numpy as jnp
    from unigen_tpu.io import torch_bridge as tb
    from unigen_tpu.layers.blocks_flux import flux_double_block
    from unigen_tpu.utils import index_params

    model = FluxTransformer2DModel.from_pretrained(
        os.path.join(args.ckpt, "transformer"), torch_dtype=torch.float32)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    tree = tb.load_flux_transformer(sd, model.config.num_layers,
                                    model.config.num_single_layers,
                                    dtype=jnp.float32)
    heads = model.config.num_attention_heads
    d = heads * model.config.attention_head_dim
    rs = np.random.RandomState(0)
    x = rs.normal(size=(1, 64, d)).astype(np.float32)
    enc = rs.normal(size=(1, 16, d)).astype(np.float32)
    temb = rs.normal(size=(1, d)).astype(np.float32)
    blk = model.transformer_blocks[0]
    with torch.no_grad():
        e_t, h_t = blk(hidden_states=torch.tensor(x),
                       encoder_hidden_states=torch.tensor(enc),
                       temb=torch.tensor(temb),
                       image_rotary_emb=None)
    e_j, h_j = flux_double_block(index_params(tree["double_blocks"], 0),
                                 jnp.asarray(x), jnp.asarray(enc),
                                 jnp.asarray(temb), None, heads=heads)
    err_h = float(np.abs(np.asarray(h_j) - h_t.numpy()).max())
    err_e = float(np.abs(np.asarray(e_j) - e_t.numpy()).max())
    ok = err_h < 2e-3 and err_e < 2e-3
    report["diffusers_goldens"] = {
        "double_block0_max_err_hidden": err_h,
        "double_block0_max_err_encoder": err_e,
        "pass": ok}
    if not ok:
        raise SystemExit(f"diffusers golden FAILED: {report['diffusers_goldens']}")


def stage_quant_fidelity(args, report):
    """Stage 3: re-measure the SSIM gate on real weight distributions by
    delegating to scripts/measure_fidelity.py with --ckpt."""
    import subprocess
    import tempfile
    fid_path = os.path.join(tempfile.mkdtemp(), "fidelity.json")
    cmd = [sys.executable, os.path.join(os.path.dirname(__file__),
                                        "measure_fidelity.py"),
           "--ssim", "--ckpt", args.ckpt, "--res", str(args.res),
           "--out", fid_path]
    if args.family != "flux":
        cmd += ["--family", args.family]
    if args.adapter:
        cmd += ["--adapter", args.adapter]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=7200)
    if r.returncode != 0:
        report["quant_fidelity"] = f"FAILED: {r.stderr[-500:]}"
        raise SystemExit(report["quant_fidelity"])
    with open(fid_path) as f:
        fid = json.load(f)
    report["quant_fidelity"] = fid
    worst = min(v.get("e2e_ssim", 1.0) for v in fid.values()
                if isinstance(v, dict))
    report["ssim_gate"] = {"gate": args.ssim_gate, "worst": worst,
                           "pass": worst >= args.ssim_gate}
    if worst < args.ssim_gate:
        raise SystemExit(f"SSIM gate FAILED: {worst} < {args.ssim_gate}")


def main(argv=None):
    args = parse_args(argv)
    # the image force-registers the axon TPU plugin via sitecustomize; honor
    # an explicit JAX_PLATFORMS request BEFORE the backend initialises
    want = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if want:
        import jax
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
    report = {"ckpt": args.ckpt, "family": args.family}
    if not os.path.isdir(args.ckpt):
        raise SystemExit(f"--ckpt {args.ckpt}: not a directory")
    stage_strict_load(args, report)
    if args.skip_diffusers:
        report["diffusers_goldens"] = "SKIPPED (--skip-diffusers)"
    elif args.family != "flux":
        report["diffusers_goldens"] = (
            "SKIPPED (block-level diffusers goldens wired for flux; sd3/sana "
            "math is pinned by tests/test_torch_sd3_golden.py / "
            "test_torch_sana_golden.py on bridged weights)")
    else:
        stage_diffusers_goldens(args, report)
    # measure_fidelity --ckpt supports all three families (smoke-tested
    # against tiny on-disk checkpoints in tests/test_cli_smoke.py)
    stage_quant_fidelity(args, report)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, default=str)
    print(json.dumps(report, indent=1, default=str))
    print("validate_real_ckpt: ALL EXECUTED STAGES PASSED")


if __name__ == "__main__":
    main()
