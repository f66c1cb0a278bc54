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
        rows.append(m)

    if not rows:
        print(json.dumps({"error": "no comparable image pairs found"}))
        return
    agg = {k: float(np.mean([r[k] for r in rows]))
           for k in ("ssim", "psnr", "mae")}
    agg["count"] = len(rows)
    print(json.dumps(agg))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"aggregate": agg, "per_image": rows}, f, indent=2)


if __name__ == "__main__":
    main()
