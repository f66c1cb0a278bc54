"""CLI smoke tests: eval.py aggregates metrics; example demo generates."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           JAX_COMPILATION_CACHE_DIR="/root/.cache/unigen_jax_cache")


def test_eval_cli(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(2):
        d = tmp_path / f"{i:05d}"
        d.mkdir()
        a = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        Image.fromarray(a).save(d / "target.png")
        Image.fromarray(np.clip(a.astype(int) + 3, 0, 255).astype(np.uint8)
                        ).save(d / "res.png")
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "eval.py"),
         "--results_dir", str(tmp_path), "--out", str(tmp_path / "m.json")],
        capture_output=True, text=True, env=ENV, timeout=240)
    assert out.returncode == 0, out.stderr[-500:]
    agg = json.loads(out.stdout.strip().splitlines()[-1])
    assert agg["count"] == 2 and agg["ssim"] > 0.9
    assert os.path.exists(tmp_path / "m.json")


def test_example_demo(tmp_path):
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "examples", "generate.py"),
             "--out", str(tmp_path / "demo.png"), "--steps", "1"],
            capture_output=True, text=True, env=ENV, timeout=800)
    except subprocess.TimeoutExpired:
        pytest.skip("single-CPU box too slow for the subprocess demo")
    assert out.returncode == 0, out.stderr[-500:]
    assert os.path.exists(tmp_path / "demo.png")
