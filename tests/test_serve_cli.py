"""serve.py end-to-end: the stdin JSON-lines protocol against a fake flux
checkpoint directory — request-batched AND step-server modes, on CPU at the
default bf16 load dtype (the deployment configuration; regression for the
bf16 pipeline-path bugs the CLIs surfaced)."""

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
           UNIGEN_SERVE_PLATFORM="cpu",
           JAX_COMPILATION_CACHE_DIR="/root/.cache/unigen_jax_cache")


@pytest.fixture(scope="module")
def serve_world(tmp_path_factory):
    import tests.test_from_pretrained as tfp
    root = tfp.fake_ckpt.__wrapped__(tmp_path_factory)
    ctrl = os.path.join(root, "serve_ctrl.png")
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
                    ).save(ctrl)
    return root, ctrl


def _run_serve(extra_args, requests, timeout=600):
    proc = subprocess.Popen(
        [sys.executable, os.path.join(ROOT, "scripts", "serve.py")]
        + extra_args,
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, env=ENV)
    stdin = "".join(json.dumps(r) + "\n" for r in requests)
    out, err = proc.communicate(stdin, timeout=timeout)
    return proc.returncode, out, err


@pytest.mark.parametrize("mode", ["batched", "step_server"])
def test_serve_cli_end_to_end(serve_world, tmp_path, mode):
    root, ctrl = serve_world
    out_png = str(tmp_path / f"{mode}.png")
    args = ["--ckpt", root, "--quant", "bf16", "--batch-size", "1",
            "--steps", "2", "--resolution", "32", "--prompt-cache", "0"]
    if mode == "step_server":
        args.append("--step-server")
    rc, out, err = _run_serve(
        args, [{"prompt": "a cat", "condition": "canny",
                "control": ctrl, "out": out_png}])
    assert rc == 0, err[-2000:]
    assert os.path.exists(out_png), (out, err[-2000:])
    img = np.asarray(Image.open(out_png))
    assert img.shape == (32, 32, 3)


def test_serve_cli_step_server_warmup(serve_world, tmp_path):
    """--warmup pre-compiles the program ladder via StepServer.warmup before
    reading stdin (t_len derived by encoding a dummy prompt through the
    deployment encode path); the real request after it still round-trips."""
    root, ctrl = serve_world
    out_png = str(tmp_path / "warmed.png")
    rc, out, err = _run_serve(
        ["--ckpt", root, "--quant", "bf16", "--batch-size", "2",
         "--steps", "2", "--resolution", "32", "--prompt-cache", "0",
         "--step-server", "--warmup"],
        [{"prompt": "a cat", "condition": "canny",
          "control": ctrl, "out": out_png}])
    assert rc == 0, err[-2000:]
    assert "# warmup: 4 synthetic requests" in err, err[-2000:]
    assert os.path.exists(out_png), (out, err[-2000:])


def test_serve_cli_step_server_adaptive_demo(tmp_path):
    """--step-server now accepts the adaptive drift thresholds (per-slot
    refresh decisions from the host-pulled drift vector) — the demo rung
    runs the fully-adaptive hybrid end-to-end through the CLI."""
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "serve.py"),
         "--demo", "--step-server", "--control-cache-threshold", "0.05",
         "--model-cache-threshold", "0.02", "--batch-size", "2"],
        capture_output=True, text=True, env=ENV, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "step-server demo:" in proc.stdout, proc.stdout


def test_serve_cli_adaptive_lag_demo_and_validation(tmp_path):
    """--adaptive-lag 1 (pipelined one-tick-stale drift decisions) drives
    the demo rung; without an adaptive threshold it is rejected at the
    argparse level."""
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "serve.py"),
         "--demo", "--step-server", "--model-cache-threshold", "0.02",
         "--adaptive-lag", "1", "--batch-size", "2"],
        capture_output=True, text=True, env=ENV, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "step-server demo:" in proc.stdout, proc.stdout
    bad = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "serve.py"),
         "--demo", "--step-server", "--adaptive-lag", "1"],
        capture_output=True, text=True, env=ENV, timeout=120)
    assert bad.returncode != 0
    assert "--adaptive-lag 1 needs" in bad.stderr, bad.stderr[-1000:]


def test_serve_cli_step_server_quality_profile(tmp_path):
    """--step-server --quality-profile resolves the named operating point to
    the family's fixed per-slot intervals (PROFILE_TABLES — the same measured
    points the one-shot pipelines use) before building the server; mixing
    the profile with raw cache knobs is rejected like the pipeline API."""
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "serve.py"),
         "--demo", "--step-server", "--quality-profile", "balanced",
         "--batch-size", "2"],
        capture_output=True, text=True, env=ENV, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert ("# quality-profile balanced -> per-slot "
            "control_cache_interval=4 model_cache_interval=2 "
            "model_cache_order=0 residual_cache_bits=8") in proc.stderr, \
        proc.stderr[-2000:]

    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "serve.py"),
         "--demo", "--step-server", "--quality-profile", "balanced",
         "--model-cache-interval", "3"],
        capture_output=True, text=True, env=ENV, timeout=600)
    assert proc.returncode != 0
    assert "quality_profile" in proc.stderr, proc.stderr[-2000:]

    # schedule-aware gate ON THE SERVING PATH: "fast" over the default
    # 4-step schedule must degrade to "balanced" (sub-0.99-SSIM point) —
    # serve.py must pass num_steps into quality_profile_knobs
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "serve.py"),
         "--demo", "--step-server", "--quality-profile", "fast",
         "--batch-size", "2"],
        capture_output=True, text=True, env=ENV, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "degrading to 'balanced'" in proc.stderr, proc.stderr[-2000:]
    assert ("control_cache_interval=4 model_cache_interval=2"
            in proc.stderr), proc.stderr[-2000:]


def test_serve_cli_multi_resolution(serve_world, tmp_path):
    """--resolutions serves MIXED resolutions from one weight tree
    (serving_steps.MultiResolutionStepServer): requests route by the JSON
    'resolution' key (default --resolution) and each lands at its own output
    size; --resolutions without --step-server is rejected."""
    root, ctrl = serve_world
    out32 = str(tmp_path / "r32.png")
    out64 = str(tmp_path / "r64.png")
    rc, out, err = _run_serve(
        ["--ckpt", root, "--quant", "bf16", "--batch-size", "1",
         "--steps", "2", "--resolution", "32", "--prompt-cache", "0",
         "--step-server", "--resolutions", "32,64:1"],
        [{"prompt": "a cat", "condition": "canny",
          "control": ctrl, "out": out32},
         {"prompt": "a dog", "condition": "canny", "resolution": 64,
          "control": ctrl, "out": out64}])
    assert rc == 0, err[-2000:]
    for path, h in ((out32, 32), (out64, 64)):
        assert os.path.exists(path), (out, err[-2000:])
        assert np.asarray(Image.open(path)).shape == (h, h, 3)
    bad = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "serve.py"),
         "--demo", "--resolutions", "32,64"],
        capture_output=True, text=True, env=ENV, timeout=120)
    assert bad.returncode != 0
    assert "--resolutions" in bad.stderr, bad.stderr[-1000:]


@pytest.fixture(scope="module")
def sd3_serve_world(tmp_path_factory):
    import tests.test_from_pretrained as tfp
    root = str(tmp_path_factory.mktemp("sd3_ckpt"))
    tfp.make_fake_sd3_root(root)
    ctrl = os.path.join(root, "serve_ctrl.png")
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
                    ).save(ctrl)
    return root, ctrl


def test_serve_cli_sd3_step_server(sd3_serve_world, tmp_path):
    """SD3 through the CFG-aware StepServer end-to-end: checkpoint load,
    dual-CLIP prompt encoding (incl. a per-request negative prompt), VAE
    codec on-stream, stdin JSON-lines protocol."""
    root, ctrl = sd3_serve_world
    out_png = str(tmp_path / "sd3_steps.png")
    rc, out, err = _run_serve(
        ["--ckpt", root, "--family", "sd3", "--quant", "bf16",
         "--batch-size", "1", "--steps", "2", "--resolution", "32",
         "--prompt-cache", "0", "--step-server", "--condition-types",
         "depth"],
        [{"prompt": "a cat", "negative": "a dog", "condition": "depth",
          "control": ctrl, "out": out_png}])
    assert rc == 0, err[-2000:]
    assert os.path.exists(out_png), (out, err[-2000:])
    img = np.asarray(Image.open(out_png))
    assert img.shape == (32, 32, 3)
