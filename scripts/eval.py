#!/usr/bin/env python
"""Evaluation over generated artifacts: SSIM/PSNR/MAE between result and
target images saved by scripts/infer.py (the reference's evaluation is visual
inspection of the same artifact layout, infer.py:219-232; we add the metric
pass BASELINE.md asks for)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from unigen_tpu.utils import apply_env_platform
    apply_env_platform()
    p = argparse.ArgumentParser(description="UniGen-TPU artifact evaluation")
    p.add_argument("--results_dir", required=True,
                   help="dir of {index}/target.png,res.png from scripts/infer.py")
    p.add_argument("--against", default="target.png",
                   help="filename to compare res.png against")
    p.add_argument("--out", default=None, help="write metrics json here")
    p.add_argument("--fid", action="store_true",
                   help="Fréchet distance between the res.png and target "
                        "sets (distribution-level, needs >=2 pairs)")
    p.add_argument("--dists", action="store_true",
                   help="DISTS perceptual distance per pair (arXiv:2004.07728)")
    p.add_argument("--extractor", default="test",
                   help="feature tower for --fid/--dists: 'test' (fixed "
                        "random-init VGG16 — plumbing/CI; NOT a comparable "
                        "metric), 'vgg16:<torch .pth/.bin>' (torchvision "
                        "vgg16 state dict), or 'dinov2:<checkpoint dir>' "
                        "(FD-DINOv2 via the depth tower's HF-parity "
                        "backbone). Real weights are environment-blocked "
                        "like every checkpoint — the harness runs today on "
                        "'test'.")
    args = p.parse_args(argv)

    import numpy as np
    from PIL import Image

    from unigen_tpu.eval import image_metrics

    rows = []
    for name in sorted(os.listdir(args.results_dir)):
        d = os.path.join(args.results_dir, name)
        res_p = os.path.join(d, "res.png")
        tgt_p = os.path.join(d, args.against)
        if not (os.path.isdir(d) and os.path.exists(res_p)
                and os.path.exists(tgt_p)):
            continue
        res = np.asarray(Image.open(res_p).convert("RGB"))
        tgt = np.asarray(Image.open(tgt_p).convert("RGB"))
        if res.shape != tgt.shape:
            continue
        m = image_metrics(tgt, res)
        m["index"] = name
        m["_paths"] = (res_p, tgt_p)
        rows.append(m)

    if not rows:
        print(json.dumps({"error": "no comparable image pairs found"}))
        return
    agg = {k: float(np.mean([r[k] for r in rows]))
           for k in ("ssim", "psnr", "mae")}
    agg["count"] = len(rows)

    if args.fid or args.dists:
        agg.update(_feature_metrics(args, rows))

    for r in rows:
        r.pop("_paths", None)
    print(json.dumps(agg))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"aggregate": agg, "per_image": rows}, f, indent=2)


def _load_pixels(path):
    """PNG -> [1, 3, H, W] float32 in [0, 1]."""
    import numpy as np
    from PIL import Image
    a = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return a.transpose(2, 0, 1)[None]


def _make_extractor(spec: str):
    """-> (feature_fn(pixels [B,3,H,W] in [0,1]) -> [B, D] np, vgg_params or
    None for --dists). See --extractor help for the registry."""
    import jax
    import jax.numpy as jnp

    from unigen_tpu.models import vgg as vgg_lib
    if spec == "test":
        params = vgg_lib.init_vgg16_params(jax.random.PRNGKey(0))
        return (lambda px: jax.device_get(
            vgg_lib.vgg16_fid_features(params, jnp.asarray(px)))), params
    if spec.startswith("vgg16:"):
        from unigen_tpu.io.torch_bridge import read_torch_bin
        params = vgg_lib.load_vgg16_features(read_torch_bin(spec[6:]))
        return (lambda px: jax.device_get(
            vgg_lib.vgg16_fid_features(params, jnp.asarray(px)))), params
    if spec.startswith("dinov2:"):
        from unigen_tpu.io.torch_bridge import (load_depth_anything,
                                                read_checkpoint_dir)
        from unigen_tpu.models import depth as depth_lib
        from unigen_tpu.models.vgg import IMAGENET_MEAN, IMAGENET_STD
        import numpy as np
        dparams, dcfg = load_depth_anything(read_checkpoint_dir(spec[7:]))

        def feats(px):
            x = (np.asarray(px) - IMAGENET_MEAN[None, :, None, None]) \
                / IMAGENET_STD[None, :, None, None]
            return jax.device_get(depth_lib.dinov2_features(
                dparams, dcfg, jnp.asarray(x)))
        return feats, None
    raise SystemExit(f"--extractor {spec!r}: expected test | vgg16:<path> "
                     "| dinov2:<dir>")


def _feature_metrics(args, rows) -> dict:
    """--fid / --dists over the collected pairs (streamed, host float64
    statistics — unigen_tpu.eval.FeatureStats / dists)."""
    import jax.numpy as jnp
    import numpy as np

    from unigen_tpu import eval as E

    feature_fn, vgg_params = _make_extractor(args.extractor)
    out = {"extractor": args.extractor}
    if args.extractor == "test":
        out["extractor_note"] = ("random-init tower: validates the metric "
                                 "plumbing, not a comparable score")
    stats_res = stats_tgt = None
    dists_vals = []
    for r in rows:
        res_p, tgt_p = r["_paths"]
        res_px, tgt_px = _load_pixels(res_p), _load_pixels(tgt_p)
        if args.fid:
            fr = feature_fn(res_px)
            ft = feature_fn(tgt_px)
            if stats_res is None:
                stats_res = E.FeatureStats(fr.shape[1])
                stats_tgt = E.FeatureStats(ft.shape[1])
            stats_res.update(fr)
            stats_tgt.update(ft)
        if args.dists:
            if vgg_params is None:
                raise SystemExit("--dists needs a VGG16 extractor "
                                 "(test or vgg16:<path>)")
            d = E.dists(vgg_params, jnp.asarray(res_px), jnp.asarray(tgt_px))
            val = float(np.asarray(d)[0])
            r["dists"] = val
            dists_vals.append(val)
    if args.fid:
        if stats_res is None or stats_res.n < 2:
            out["fid"] = None
            out["fid_note"] = "needs >= 2 image pairs"
        else:
            out["fid"] = E.frechet_distance(*stats_res.finalize(),
                                            *stats_tgt.finalize())
    if args.dists:
        out["dists"] = float(np.mean(dists_vals)) if dists_vals else None
    return out


if __name__ == "__main__":
    main()
