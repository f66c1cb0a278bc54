"""VGG16 feature tower (torchvision cfg "D" features) — the DISTS / FD-VGG
backbone.

The reference installs dists-pytorch + pytorch-fid (environment.yaml) but
never calls them in-repo (SURVEY.md §4); this module is the runnable half of
that eval story: the exact torchvision ``vgg16().features`` graph in JAX with
a strict state-dict bridge (``load_vgg16_features``), so the day real weights
are reachable the metric needs zero new code (VERDICT r4 next-round #8).

Two pooling modes:

* ``pool="max"`` — torchvision semantics (FD-VGG feature extraction).
* ``pool="l2"``  — DISTS semantics (Ding et al., arXiv:2004.07728): max-pool
  layers replaced by Hanning-windowed L2 pooling, which makes the tower
  shift-robust; the DISTS score consumes the 5 relu-stage outputs + the
  input image.

Architecture is fixed by torchvision cfg "D": 64,64,M,128,128,M,256,256,256,
M,512,512,512,M,512,512,512,M (3x3 convs, pad 1, ReLU). Parity is pinned by
tests/test_eval_metrics.py against an independently-built torch
nn.Sequential of the same cfg (torchvision itself is not in this image).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

#: torchvision cfg "D" channel plan; "M" marks a pooling site
VGG16_CFG: Tuple = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                    512, 512, 512, "M", 512, 512, 512, "M")

#: ImageNet normalization (torchvision transforms; DISTS official repo)
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _conv3x3(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + p["b"].astype(x.dtype)[None, :, None, None]


def _max_pool(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def _l2_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Hanning-windowed L2 pooling (DISTS official L2pooling: 3x3 hann
    outer-product window, normalized, stride 2, pad 1): sqrt(conv(x², w))."""
    win = np.hanning(5)[1:-1]                      # torch.hann_window(3+2)[1:-1]
    w2 = np.outer(win, win)
    w2 = (w2 / w2.sum()).astype(np.float32)
    c = x.shape[1]
    k = jnp.asarray(w2, x.dtype)[None, None].repeat(c, axis=0)  # [C,1,3,3]
    sq = jax.lax.conv_general_dilated(
        x * x, k, (2, 2), ((1, 1), (1, 1)), feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return jnp.sqrt(jnp.maximum(sq, 1e-12))


def init_vgg16_params(rng, dtype=jnp.float32) -> List[dict]:
    """Random-init conv params (tests / the 'test' extractor)."""
    params = []
    c_in = 3
    for c in VGG16_CFG:
        if c == "M":
            continue
        rng, k1 = jax.random.split(rng)
        scale = float(np.sqrt(2.0 / (9 * c_in)))
        params.append({
            "w": (jax.random.normal(k1, (c, c_in, 3, 3)) * scale).astype(dtype),
            "b": jnp.zeros((c,), dtype)})
        c_in = c
    return params


def load_vgg16_features(sd: Dict[str, np.ndarray], *, prefix: str = "features.",
                        dtype=jnp.float32) -> List[dict]:
    """torchvision ``vgg16().state_dict()`` (or its ``features.`` subset) ->
    conv param list. Strict: every expected ``features.{i}.weight/bias`` must
    exist with cfg-D shapes."""
    params = []
    idx = 0
    c_in = 3
    for c in VGG16_CFG:
        if c == "M":
            idx += 1                         # the pool occupies a slot
            continue
        w = np.asarray(sd[f"{prefix}{idx}.weight"])
        b = np.asarray(sd[f"{prefix}{idx}.bias"])
        assert w.shape == (c, c_in, 3, 3), (idx, w.shape)
        params.append({"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, dtype)})
        c_in = c
        idx += 2                             # conv + relu
    return params


def vgg16_stages(params: List[dict], pixels: jnp.ndarray, *,
                 pool: str = "max") -> List[jnp.ndarray]:
    """pixels [B,3,H,W] in [0,1] -> the 5 relu-stage outputs
    (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3), ImageNet-normalized
    input. ``pool``: "max" (torchvision) or "l2" (DISTS)."""
    assert pool in ("max", "l2"), pool
    x = (pixels - jnp.asarray(IMAGENET_MEAN)[None, :, None, None]) \
        / jnp.asarray(IMAGENET_STD)[None, :, None, None]
    stages = []
    pi = 0
    pool_fn = _max_pool if pool == "max" else _l2_pool
    for c in VGG16_CFG:
        if c == "M":
            stages.append(x)                 # output BEFORE the pool = reluN_M
            x = pool_fn(x)
        else:
            x = jax.nn.relu(_conv3x3(params[pi], x))
            pi += 1
    return stages


def vgg16_fid_features(params: List[dict], pixels: jnp.ndarray) -> jnp.ndarray:
    """Global-average-pooled relu5_3 ([B, 512]) — the FD-VGG feature vector
    (classic FID uses InceptionV3 pool3; FD-VGG/FD-DINOv2 are the drop-in
    statistics over a different tower, arXiv:2306.04675)."""
    s = vgg16_stages(params, pixels, pool="max")[-1]
    return jnp.mean(s, axis=(2, 3))
