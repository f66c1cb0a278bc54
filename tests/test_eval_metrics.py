"""FID / DISTS metric plumbing (VERDICT r4 #8): Fréchet statistics against
analytic Gaussians, the JAX VGG16 tower against an independently-built torch
cfg-D network, DISTS axioms, and the eval-CLI end-to-end path with the test
extractor. Real feature weights are environment-blocked; these tests pin
everything that does not need them."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_frechet_distance_analytic():
    from unigen_tpu.eval import frechet_distance
    rng = np.random.default_rng(0)
    d = 8
    a = rng.normal(size=(d, d))
    sigma = a @ a.T + d * np.eye(d)
    mu = rng.normal(size=d)
    # identical distributions -> 0 (the eps regulariser keeps it tiny)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6
    # equal covariances -> ||dmu||^2 exactly
    dmu = rng.normal(size=d)
    got = frechet_distance(mu, sigma, mu + dmu, sigma)
    assert abs(got - float(dmu @ dmu)) < 1e-6
    # diagonal covariances: closed form sum (sqrt(s1)-sqrt(s2))^2
    s1 = np.diag(np.asarray([1.0, 4.0, 9.0, 16.0, 1.0, 1.0, 1.0, 1.0]))
    s2 = np.diag(np.asarray([4.0, 4.0, 1.0, 9.0, 1.0, 1.0, 1.0, 1.0]))
    expect = float(np.sum((np.sqrt(np.diag(s1)) - np.sqrt(np.diag(s2))) ** 2))
    got = frechet_distance(np.zeros(d), s1, np.zeros(d), s2)
    assert abs(got - expect) < 1e-3


def test_feature_stats_streaming_matches_numpy():
    from unigen_tpu.eval import FeatureStats, fid
    rng = np.random.default_rng(1)
    x = rng.normal(size=(257, 12))
    st = FeatureStats(12)
    for chunk in np.array_split(x, 7):
        st.update(chunk)
    mu, sigma = st.finalize()
    np.testing.assert_allclose(mu, x.mean(0), atol=1e-10)
    np.testing.assert_allclose(sigma, np.cov(x, rowvar=False), atol=1e-10)
    # distribution separation is monotone in the mean shift
    y_near = x + 0.1
    y_far = x + 2.0
    assert fid(x, y_near) < fid(x, y_far)


def test_vgg16_matches_independent_torch_build():
    """The JAX tower against a torch nn.Sequential built straight from
    torchvision cfg 'D' (torchvision itself is not in the image; the cfg is
    the architecture contract). Also pins the state-dict key layout that
    load_vgg16_features expects (features.{i}.weight)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from unigen_tpu.models.vgg import (VGG16_CFG, init_vgg16_params,
                                       load_vgg16_features, vgg16_stages)

    layers = []
    c_in = 3
    for c in VGG16_CFG:
        if c == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(c_in, c, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=False))
            c_in = c
    net = torch.nn.Sequential(*layers)

    params = init_vgg16_params(jax.random.PRNGKey(0))
    sd = {}
    idx = 0
    pi = 0
    for c in VGG16_CFG:
        if c == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = np.asarray(params[pi]["w"])
        sd[f"features.{idx}.bias"] = np.asarray(params[pi]["b"])
        idx += 2
        pi += 1
    net.load_state_dict({k.replace("features.", ""): torch.from_numpy(v)
                         for k, v in sd.items()})

    rng = np.random.default_rng(2)
    px = rng.random((2, 3, 64, 64)).astype(np.float32)
    from unigen_tpu.models.vgg import IMAGENET_MEAN, IMAGENET_STD
    with torch.no_grad():
        ref = net(torch.from_numpy(
            (px - IMAGENET_MEAN[None, :, None, None])
            / IMAGENET_STD[None, :, None, None])).numpy()
    got = np.asarray(vgg16_stages(params, jnp.asarray(px), pool="max")[-1])
    # my stages return relu5_3 (pre-pool); torch Sequential ends after the
    # final pool — pool the jax stage the same way for comparison
    got_pooled = got.reshape(*got.shape[:2], 2, 2, 2, 2)  # 4x4 -> pooled 2x2
    got_pooled = got_pooled.max(axis=(3, 5))
    np.testing.assert_allclose(got_pooled, ref, rtol=2e-4, atol=2e-4)

    # the strict loader round-trips the torch key layout
    params2 = load_vgg16_features(sd)
    got2 = np.asarray(vgg16_stages(params2, jnp.asarray(px), pool="max")[-1])
    np.testing.assert_allclose(got2, got, atol=0)


def test_dists_axioms():
    import jax
    import jax.numpy as jnp

    from unigen_tpu.eval import dists
    from unigen_tpu.models.vgg import init_vgg16_params
    params = init_vgg16_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.random((1, 3, 64, 64)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(1, 3, 64, 64)).astype(np.float32))
    d_same = float(np.asarray(dists(params, a, a))[0])
    d_small = float(np.asarray(dists(params, a,
                                     jnp.clip(a + 0.05 * noise, 0, 1)))[0])
    d_big = float(np.asarray(dists(params, a,
                                   jnp.clip(a + 0.5 * noise, 0, 1)))[0])
    assert abs(d_same) < 1e-5
    assert d_same < d_small < d_big


def test_dinov2_features_matches_hf_cls():
    """FD-DINOv2 features == the HF backbone's final-layer post-norm CLS
    token (the depth tower reuse, models/depth.dinov2_features)."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    import jax.numpy as jnp

    from tests.test_depth_model import _tiny_hf_model
    from unigen_tpu.io.torch_bridge import load_depth_anything
    from unigen_tpu.models.depth import dinov2_features, tiny_depth_config
    model = _tiny_hf_model()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = tiny_depth_config()
    params = load_depth_anything(sd, cfg)
    rng = np.random.default_rng(5)
    px = rng.normal(size=(2, 3, 56, 56)).astype(np.float32)
    f = np.asarray(dinov2_features(params, cfg, jnp.asarray(px)))
    assert f.shape == (2, cfg.hidden_size)
    with torch.no_grad():
        hs = model.backbone(torch.tensor(px)).feature_maps[-1]
    # out_features=None + apply_layernorm -> feature_maps[-1] is the
    # final-layer hidden state post shared layernorm, CLS at position 0
    np.testing.assert_allclose(f, hs[:, 0].numpy(), rtol=2e-4, atol=2e-4)


def test_eval_cli_fid_dists(tmp_path):
    """scripts/eval.py --fid --dists --extractor test over synthetic pairs:
    the full real-weight-day code path minus the weights."""
    from PIL import Image
    rng = np.random.default_rng(4)
    for i in range(3):
        d = tmp_path / str(i)
        d.mkdir()
        tgt = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        res = np.clip(tgt.astype(int)
                      + rng.integers(-20, 20, tgt.shape), 0, 255
                      ).astype(np.uint8)
        Image.fromarray(tgt).save(d / "target.png")
        Image.fromarray(res).save(d / "res.png")
    out = tmp_path / "metrics.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "eval.py"),
         "--results_dir", str(tmp_path), "--fid", "--dists",
         "--extractor", "test", "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    agg = json.loads(r.stdout.strip().splitlines()[-1])
    assert agg["count"] == 3
    assert np.isfinite(agg["fid"]) and agg["fid"] >= 0
    assert 0 <= agg["dists"] <= 1
    assert "extractor_note" in agg
    per = json.loads(out.read_text())["per_image"]
    assert all("dists" in r_ and "_paths" not in r_ for r_ in per)
