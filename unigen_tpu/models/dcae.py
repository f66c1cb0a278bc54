"""DC-AE — deep-compression autoencoder (SANA's latent codec), functional JAX.

The reference repo ships no SANA pipeline or autoencoder (its train/infer
paths load AutoencoderKL only, train.py:289); this module goes beyond parity
so the SANA family (models/sana.py + pipelines/sana.py) has a native latent
codec. Architecture follows the DC-AE paper (arXiv 2410.10733, the
dc-ae-f32c32 family used by SANA):

  * residual autoencoding — every resolution change carries a NON-PARAMETRIC
    shortcut: space-to-channel (pixel-unshuffle) + channel-group averaging on
    the way down, channel duplication + channel-to-space (pixel-shuffle) on
    the way up; the latent projection in/out convs carry the same averaging/
    duplication shortcuts over the channel axis.
  * stages — early stages are plain ResBlocks (conv3x3 -> silu -> conv3x3 ->
    RMSNorm, residual), deep stages are EfficientViT blocks (LiteMLA ReLU
    linear attention + GLUMBConv inverted-residual FF).
  * deterministic: no KL posterior — encode is a plain projection scaled by
    ``scaling_factor`` (SANA convention), decode divides it back out.

Weight bridging to released dc-ae checkpoints needs a weights-available
environment (ROADMAP); layer granularity and naming mirror the published
structure so the bridge is a rename pass. Default hyperparameters follow the
f32c32 family; exact released widths/depths are pinned at bridge time.

Layout: NCHW activations, HWIO conv kernels, matching models/vae.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from unigen_tpu.models.vae import conv, init_conv


@dataclass(frozen=True)
class DCAEConfig:
    in_channels: int = 3
    latent_channels: int = 32
    # one entry per stage; resolution halves BETWEEN stages (n-1 transitions,
    # plus a final stride-2 latent projection = 2**n total downscale = 32x
    # for the default 5 stages... see `downscale`)
    widths: Tuple[int, ...] = (128, 256, 512, 512, 1024, 1024)
    encoder_depths: Tuple[int, ...] = (2, 2, 2, 3, 3, 3)
    decoder_depths: Tuple[int, ...] = (3, 3, 3, 3, 3, 3)
    # stages with index >= attention_start use EfficientViT blocks (LiteMLA +
    # GLUMBConv); earlier stages use ResBlocks
    attention_start: int = 3
    head_dim: int = 32
    mlp_ratio: float = 4.0
    scaling_factor: float = 0.41407          # SANA dc-ae-f32c32

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.widths) - 1)


def tiny_dcae_config(**kw) -> DCAEConfig:
    base = dict(latent_channels=4, widths=(8, 16, 32), encoder_depths=(1, 1, 1),
                decoder_depths=(1, 1, 1), attention_start=2, head_dim=8,
                mlp_ratio=2.0, scaling_factor=1.0)
    base.update(kw)
    return DCAEConfig(**base)


# ---------------------------------------------------- space<->channel moves

def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B,C,H,W] -> [B,C*r*r,H/r,W/r] (torch PixelUnshuffle ordering)."""
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // r, r, w // r, r)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(b, c * r * r, h // r, w // r)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B,C*r*r,H,W] -> [B,C,H*r,W*r] (torch PixelShuffle ordering)."""
    b, c, h, w = x.shape
    co = c // (r * r)
    x = x.reshape(b, co, r, r, h, w)
    return x.transpose(0, 1, 4, 2, 5, 3).reshape(b, co, h * r, w * r)


def channel_average(x: jnp.ndarray, out_ch: int) -> jnp.ndarray:
    """Group-average C -> out_ch (the paper's non-parametric down shortcut)."""
    b, c, h, w = x.shape
    assert c % out_ch == 0, (c, out_ch)
    return x.reshape(b, out_ch, c // out_ch, h, w).mean(axis=2)


def channel_duplicate(x: jnp.ndarray, out_ch: int) -> jnp.ndarray:
    """Tile C -> out_ch (the paper's non-parametric up shortcut)."""
    b, c, h, w = x.shape
    assert out_ch % c == 0, (c, out_ch)
    return jnp.repeat(x, out_ch // c, axis=1)


# ---------------------------------------------------- norms / blocks

def init_rms2d(ch: int, *, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((ch,), dtype)}


def rms2d(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm over the channel axis of NCHW (dc-ae 'rms2d')."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=1, keepdims=True)
    xf = xf * jax.lax.rsqrt(ms + eps)
    return (xf * p["scale"][None, :, None, None]).astype(x.dtype)


def init_res_block(key, ch: int, *, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {"conv1": init_conv(k1, ch, ch, dtype=dtype),
            "conv2": init_conv(k2, ch, ch, dtype=dtype),
            "norm": init_rms2d(ch, dtype=dtype)}


def res_block(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.silu(conv(p["conv1"], x))
    h = rms2d(p["norm"], conv(p["conv2"], h))
    return x + h


def init_lite_mla(key, ch: int, head_dim: int, *, dtype=jnp.float32) -> dict:
    """LiteMLA: 1x1 qkv conv, depthwise 5x5 multi-scale aggregation branch,
    ReLU linear attention, 1x1 out conv + RMSNorm (paper §3 / EfficientViT)."""
    ks = jax.random.split(key, 3)
    kd = jax.random.uniform(ks[1], (5, 5, 1, 3 * ch), dtype, -0.2, 0.2)
    return {"qkv": init_conv(ks[0], ch, 3 * ch, k=1, dtype=dtype),
            "aggreg": {"w": kd, "b": jnp.zeros((3 * ch,), dtype)},
            "proj": init_conv(ks[2], 2 * ch, ch, k=1, dtype=dtype),
            "norm": init_rms2d(ch, dtype=dtype)}


def _relu_linear_attention(q, k, v):
    """q,k,v [B,H,S,D] -> [B,H,S,D]; fp32 accum, ReLU kernel."""
    q = jax.nn.relu(q.astype(jnp.float32))
    k = jax.nn.relu(k.astype(jnp.float32))
    vf = v.astype(jnp.float32)
    kv = jnp.einsum("bhsd,bhse->bhde", k, vf)
    z = jnp.einsum("bhsd,bhd->bhs", q, jnp.sum(k, axis=2))
    return jnp.einsum("bhsd,bhde->bhse", q, kv) / (z[..., None] + 1e-15)


def lite_mla(p: dict, x: jnp.ndarray, head_dim: int) -> jnp.ndarray:
    b, c, h, w = x.shape
    qkv = conv(p["qkv"], x)                                   # [B,3C,H,W]
    # multi-scale branch: depthwise 5x5 over the qkv maps (second "scale")
    ms = jax.lax.conv_general_dilated(
        qkv.transpose(0, 2, 3, 1), p["aggreg"]["w"], (1, 1), "SAME",
        feature_group_count=3 * c,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["aggreg"]["b"]
    ms = ms.transpose(0, 3, 1, 2)

    def attend(qkv_maps):
        qm, km, vm = jnp.split(qkv_maps, 3, axis=1)           # [B,C,H,W] each

        def heads(t):
            return t.reshape(b, c // head_dim, head_dim, h * w).transpose(0, 1, 3, 2)
        o = _relu_linear_attention(heads(qm), heads(km), heads(vm))
        return o.transpose(0, 1, 3, 2).reshape(b, c, h, w).astype(x.dtype)

    out = jnp.concatenate([attend(qkv), attend(ms)], axis=1)  # [B,2C,H,W]
    return x + rms2d(p["norm"], conv(p["proj"], out))


def init_glumb2d(key, ch: int, mlp_ratio: float, *, dtype=jnp.float32) -> dict:
    hidden = int(ch * mlp_ratio)
    ks = jax.random.split(key, 3)
    kd = jax.random.uniform(ks[1], (3, 3, 1, 2 * hidden), dtype, -1 / 3, 1 / 3)
    return {"inverted": init_conv(ks[0], ch, 2 * hidden, k=1, dtype=dtype),
            "depth": {"w": kd, "b": jnp.zeros((2 * hidden,), dtype)},
            "point": init_conv(ks[2], hidden, ch, k=1, dtype=dtype),
            "norm": init_rms2d(ch, dtype=dtype)}


def glumb2d(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    y = jax.nn.silu(conv(p["inverted"], x))
    y = jax.lax.conv_general_dilated(
        y.transpose(0, 2, 3, 1), p["depth"]["w"], (1, 1), "SAME",
        feature_group_count=y.shape[1],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["depth"]["b"]
    y = y.transpose(0, 3, 1, 2)
    main, gate = jnp.split(y, 2, axis=1)
    return x + rms2d(p["norm"], conv(p["point"], main * jax.nn.silu(gate)))


def init_vit_block(key, ch: int, head_dim: int, mlp_ratio: float, *,
                   dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {"attn": init_lite_mla(k1, ch, head_dim, dtype=dtype),
            "ff": init_glumb2d(k2, ch, mlp_ratio, dtype=dtype)}


def vit_block(p: dict, x: jnp.ndarray, head_dim: int) -> jnp.ndarray:
    return glumb2d(p["ff"], lite_mla(p["attn"], x, head_dim))


# ---------------------------------------------------- resolution changes

def init_downsample(key, in_ch: int, out_ch: int, *, dtype=jnp.float32) -> dict:
    # main: conv3x3 stride 2; shortcut: pixel-unshuffle + channel averaging
    return {"conv": init_conv(key, in_ch, out_ch, dtype=dtype)}


def downsample(p: dict, x: jnp.ndarray, out_ch: int) -> jnp.ndarray:
    main = conv(p["conv"], jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1))),
                stride=2, padding="VALID")
    return main + channel_average(pixel_unshuffle(x, 2), out_ch)


def init_upsample(key, in_ch: int, out_ch: int, *, dtype=jnp.float32) -> dict:
    # main: conv3x3 -> 4*out_ch -> pixel-shuffle; shortcut: duplicate+shuffle
    return {"conv": init_conv(key, in_ch, 4 * out_ch, dtype=dtype)}


def upsample(p: dict, x: jnp.ndarray, out_ch: int) -> jnp.ndarray:
    # widths never more than halve between decoder stages, so 4*out_ch is
    # always a multiple of in_ch and the paper's duplicate-then-shuffle
    # shortcut applies exactly
    main = pixel_shuffle(conv(p["conv"], x), 2)
    return main + pixel_shuffle(channel_duplicate(x, 4 * out_ch), 2)


# ---------------------------------------------------- encoder / decoder

def _init_stage(key, width: int, depth: int, is_vit: bool, cfg: DCAEConfig, *,
                dtype) -> list:
    ks = jax.random.split(key, max(depth, 1))
    if is_vit:
        return [init_vit_block(ks[j], width, cfg.head_dim, cfg.mlp_ratio,
                               dtype=dtype) for j in range(depth)]
    return [init_res_block(ks[j], width, dtype=dtype) for j in range(depth)]


def _run_stage(blocks: list, x: jnp.ndarray, is_vit: bool,
               cfg: DCAEConfig) -> jnp.ndarray:
    for bp in blocks:
        x = vit_block(bp, x, cfg.head_dim) if is_vit else res_block(bp, x)
    return x


def init_dcae_params(key, cfg: DCAEConfig, *, dtype=jnp.float32) -> dict:
    ws = cfg.widths
    ks = iter(jax.random.split(key, 4 * len(ws) + 8))
    enc = {"conv_in": init_conv(next(ks), cfg.in_channels, ws[0], dtype=dtype),
           "stages": [], "downs": [],
           "conv_out": init_conv(next(ks), ws[-1], cfg.latent_channels,
                                 dtype=dtype)}
    for i, w in enumerate(ws):
        enc["stages"].append(_init_stage(next(ks), w, cfg.encoder_depths[i],
                                         i >= cfg.attention_start, cfg,
                                         dtype=dtype))
        if i < len(ws) - 1:
            enc["downs"].append(init_downsample(next(ks), w, ws[i + 1],
                                                dtype=dtype))

    rws = list(reversed(ws))
    rdepths = list(reversed(cfg.decoder_depths))
    dec = {"conv_in": init_conv(next(ks), cfg.latent_channels, rws[0],
                                dtype=dtype),
           "stages": [], "ups": [],
           "norm_out": init_rms2d(rws[-1], dtype=dtype),
           "conv_out": init_conv(next(ks), rws[-1], cfg.in_channels,
                                 dtype=dtype)}
    n = len(ws)
    for i, w in enumerate(rws):
        is_vit = (n - 1 - i) >= cfg.attention_start
        dec["stages"].append(_init_stage(next(ks), w, rdepths[i], is_vit, cfg,
                                         dtype=dtype))
        if i < n - 1:
            dec["ups"].append(init_upsample(next(ks), w, rws[i + 1],
                                            dtype=dtype))
    return {"encoder": enc, "decoder": dec}


def save_dcae_native(path: str, params: dict, cfg: DCAEConfig) -> None:
    """Persist a DC-AE tree in the framework-native format: a flat npz of
    leaves in canonical pytree order + a config.json. Released dc-ae
    checkpoints bridge into this format once a weights-available environment
    pins the released naming (module docstring / ROADMAP #1); everything
    downstream (load_sana_pipeline) consumes only this."""
    import dataclasses
    import json
    import os

    import numpy as np
    os.makedirs(path, exist_ok=True)
    leaves = jax.tree_util.tree_leaves(params)
    np.savez(os.path.join(path, "dcae_native.npz"),
             **{f"leaf_{i:04d}": np.asarray(l) for i, l in enumerate(leaves)})
    with open(os.path.join(path, "dcae_config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=1)


def has_dcae_native(path: str) -> bool:
    import os
    return os.path.isfile(os.path.join(path, "dcae_native.npz"))


def load_dcae_native(path: str, *, dtype=jnp.float32):
    """Inverse of save_dcae_native -> (params, cfg). The tree structure is
    rebuilt from the saved config (init_dcae_params is deterministic in
    structure), so leaf count mismatches fail loudly."""
    import json
    import os

    import numpy as np
    with open(os.path.join(path, "dcae_config.json")) as f:
        raw = json.load(f)
    for k in ("widths", "encoder_depths", "decoder_depths"):
        raw[k] = tuple(raw[k])
    cfg = DCAEConfig(**raw)
    z = np.load(os.path.join(path, "dcae_native.npz"))
    struct = jax.eval_shape(
        lambda: init_dcae_params(jax.random.PRNGKey(0), cfg))
    treedef = jax.tree_util.tree_structure(struct)
    names = sorted(z.files)
    assert len(names) == treedef.num_leaves, \
        f"dcae_native.npz has {len(names)} leaves, config implies " \
        f"{treedef.num_leaves}"
    params = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(z[n], dtype) for n in names])
    shapes = jax.tree_util.tree_leaves(struct)
    for got, want in zip(jax.tree_util.tree_leaves(params), shapes):
        assert got.shape == want.shape, (got.shape, want.shape)
    return params, cfg


def dcae_encode(params: dict, cfg: DCAEConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels [B,3,H,W] in [-1,1] -> latents [B,C,H/f,W/f] * scaling_factor.
    Deterministic (no posterior) — the dc-ae convention."""
    enc = params["encoder"]
    ws = cfg.widths
    # run at the codec's own parameter precision regardless of pipeline dtype
    pixels = pixels.astype(enc["conv_in"]["w"].dtype)
    x = conv(enc["conv_in"], pixels)
    for i in range(len(ws)):
        x = _run_stage(enc["stages"][i], x, i >= cfg.attention_start, cfg)
        if i < len(ws) - 1:
            x = downsample(enc["downs"][i], x, ws[i + 1])
    # latent projection with the averaging shortcut over channels
    z = conv(enc["conv_out"], x) + channel_average(x, cfg.latent_channels)
    return z * cfg.scaling_factor


def dcae_decode(params: dict, cfg: DCAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """latents -> pixels [B,3,H,W]; inverse of dcae_encode's scaling."""
    dec = params["decoder"]
    rws = list(reversed(cfg.widths))
    n = len(rws)
    latents = latents.astype(dec["conv_in"]["w"].dtype)
    z = latents / cfg.scaling_factor
    # latent in-projection with the duplication shortcut
    x = conv(dec["conv_in"], z) + channel_duplicate(z, rws[0])
    for i in range(n):
        x = _run_stage(dec["stages"][i], x, (n - 1 - i) >= cfg.attention_start,
                       cfg)
        if i < n - 1:
            x = upsample(dec["ups"][i], x, rws[i + 1])
    return conv(dec["conv_out"], jax.nn.silu(rms2d(dec["norm_out"], x)))
