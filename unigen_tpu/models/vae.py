"""AutoencoderKL (FLUX / SD3 image VAE), functional JAX.

The pipeline's latent codec (loaded at reference train.py:289, used for
encode at train.py:527-572 / UniGenPipeline.py:633-647 and decode at
UniGenPipeline.py:793-799). Standard diffusers topology: conv_in, 4
down/up blocks of ResnetBlock2D (+ single-head attention mid-block),
GroupNorm(32) + SiLU heads. FLUX/SD3 variants have no quant convs and use
(shift_factor, scaling_factor) latent normalisation.

Layout: NCHW activations, HWIO conv kernels (JAX native); the torch bridge
transposes OIHW -> HWIO on load.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 16               # FLUX/SD3; SD1.5 uses 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.3611          # FLUX
    shift_factor: float = 0.1159            # FLUX (SD3: 0.0609 / 1.5305)

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


def tiny_vae_config(**kw) -> VAEConfig:
    base = dict(latent_channels=4, block_out_channels=(8, 16), layers_per_block=1,
                norm_num_groups=4, scaling_factor=1.0, shift_factor=0.0)
    base.update(kw)
    return VAEConfig(**base)


# ------------------------------------------------------------ primitives

def init_conv(key, in_ch, out_ch, k=3, *, dtype=jnp.float32) -> dict:
    kw, kb = jax.random.split(key)
    fan_in = in_ch * k * k
    bound = 1.0 / jnp.sqrt(fan_in)
    return {"w": jax.random.uniform(kw, (k, k, in_ch, out_ch), dtype, -bound, bound),
            "b": jax.random.uniform(kb, (out_ch,), dtype, -bound, bound)}


def conv(p, x, *, stride=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    return y + p["b"][None, :, None, None]


def init_group_norm(ch, *, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}


def group_norm(p, x, groups: int, eps: float = 1e-6):
    b, c, h, w = x.shape
    xf = x.astype(jnp.float32).reshape(b, groups, c // groups, h, w)
    mean = xf.mean(axis=(2, 3, 4), keepdims=True)
    var = xf.var(axis=(2, 3, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, c, h, w).astype(x.dtype)
    return xf * p["scale"][None, :, None, None] + p["bias"][None, :, None, None]


def init_resnet(key, in_ch, out_ch, *, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 3)
    p = {"norm1": init_group_norm(in_ch, dtype=dtype),
         "conv1": init_conv(ks[0], in_ch, out_ch, dtype=dtype),
         "norm2": init_group_norm(out_ch, dtype=dtype),
         "conv2": init_conv(ks[1], out_ch, out_ch, dtype=dtype)}
    if in_ch != out_ch:
        p["shortcut"] = init_conv(ks[2], in_ch, out_ch, k=1, dtype=dtype)
    return p


def resnet(p, x, groups):
    h = conv(p["conv1"], jax.nn.silu(group_norm(p["norm1"], x, groups)))
    h = conv(p["conv2"], jax.nn.silu(group_norm(p["norm2"], h, groups)))
    if "shortcut" in p:
        x = conv(p["shortcut"], x)
    return x + h


def init_attn_block(key, ch, *, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 4)
    def lin(k):
        bound = 1.0 / jnp.sqrt(ch)
        kw, kb = jax.random.split(k)
        return {"w": jax.random.uniform(kw, (ch, ch), dtype, -bound, bound),
                "b": jax.random.uniform(kb, (ch,), dtype, -bound, bound)}
    return {"norm": init_group_norm(ch, dtype=dtype),
            "q": lin(ks[0]), "k": lin(ks[1]), "v": lin(ks[2]), "o": lin(ks[3])}


def attn_block(p, x, groups):
    b, c, h, w = x.shape
    n = group_norm(p["norm"], x, groups)
    t = n.reshape(b, c, h * w).transpose(0, 2, 1)          # [B, HW, C]
    q = t @ p["q"]["w"] + p["q"]["b"]
    k = t @ p["k"]["w"] + p["k"]["b"]
    v = t @ p["v"]["w"] + p["v"]["b"]
    logits = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32) / jnp.sqrt(c)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bqk,bkc->bqc", probs, v)
    o = o @ p["o"]["w"] + p["o"]["b"]
    return x + o.transpose(0, 2, 1).reshape(b, c, h, w)


# ------------------------------------------------------------ encoder/decoder

def init_vae_params(key, cfg: VAEConfig, *, dtype=jnp.float32) -> dict:
    chs = cfg.block_out_channels
    ks = iter(jax.random.split(key, 64))
    enc = {"conv_in": init_conv(next(ks), cfg.in_channels, chs[0], dtype=dtype),
           "down": [], "norm_out": init_group_norm(chs[-1], dtype=dtype),
           "conv_out": init_conv(next(ks), chs[-1], 2 * cfg.latent_channels, dtype=dtype)}
    in_ch = chs[0]
    for i, out_ch in enumerate(chs):
        block = {"resnets": []}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(init_resnet(next(ks), in_ch if j == 0 else out_ch,
                                                out_ch, dtype=dtype))
        if i < len(chs) - 1:
            block["down"] = init_conv(next(ks), out_ch, out_ch, dtype=dtype)
        enc["down"].append(block)
        in_ch = out_ch
    enc["mid"] = {"res1": init_resnet(next(ks), chs[-1], chs[-1], dtype=dtype),
                  "attn": init_attn_block(next(ks), chs[-1], dtype=dtype),
                  "res2": init_resnet(next(ks), chs[-1], chs[-1], dtype=dtype)}

    rev = list(reversed(chs))
    dec = {"conv_in": init_conv(next(ks), cfg.latent_channels, rev[0], dtype=dtype),
           "mid": {"res1": init_resnet(next(ks), rev[0], rev[0], dtype=dtype),
                   "attn": init_attn_block(next(ks), rev[0], dtype=dtype),
                   "res2": init_resnet(next(ks), rev[0], rev[0], dtype=dtype)},
           "up": [], "norm_out": init_group_norm(rev[-1], dtype=dtype),
           "conv_out": init_conv(next(ks), rev[-1], cfg.in_channels, dtype=dtype)}
    in_ch = rev[0]
    for i, out_ch in enumerate(rev):
        block = {"resnets": []}
        for j in range(cfg.layers_per_block + 1):
            block["resnets"].append(init_resnet(next(ks), in_ch if j == 0 else out_ch,
                                                out_ch, dtype=dtype))
        if i < len(rev) - 1:
            block["up"] = init_conv(next(ks), out_ch, out_ch, dtype=dtype)
        dec["up"].append(block)
        in_ch = out_ch
    return {"encoder": enc, "decoder": dec}


def vae_encode(params: dict, cfg: VAEConfig, pixels: jnp.ndarray,
               sample_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """pixels [B,3,H,W] in [-1,1] -> normalised latents [B,C,H/8,W/8].

    With sample_rng the posterior is sampled; otherwise the mean is used
    (deterministic, inference default)."""
    g = cfg.norm_num_groups
    enc = params["encoder"]
    # the VAE runs at its own parameter precision (fp32 by default) even when
    # the surrounding pipeline is bf16 — cast at the boundary like the decode
    # side does (pipelines/flux.py casts latents to fp32 before vae_decode)
    pixels = pixels.astype(enc["conv_in"]["w"].dtype)
    x = conv(enc["conv_in"], pixels)
    for block in enc["down"]:
        for r in block["resnets"]:
            x = resnet(r, x, g)
        if "down" in block:
            # diffusers downsampler pads (0,1,0,1) then convs stride 2 VALID
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1)))
            x = conv(block["down"], x, stride=2, padding="VALID")
    x = resnet(enc["mid"]["res1"], x, g)
    x = attn_block(enc["mid"]["attn"], x, g)
    x = resnet(enc["mid"]["res2"], x, g)
    x = conv(enc["conv_out"], jax.nn.silu(group_norm(enc["norm_out"], x, g)))
    mean, logvar = jnp.split(x, 2, axis=1)
    if sample_rng is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mean = mean + std * jax.random.normal(sample_rng, mean.shape, mean.dtype)
    return (mean - cfg.shift_factor) * cfg.scaling_factor


def vae_decode(params: dict, cfg: VAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """normalised latents -> pixels [B,3,H,W] in [-1,1]."""
    g = cfg.norm_num_groups
    dec = params["decoder"]
    z = latents / cfg.scaling_factor + cfg.shift_factor
    x = conv(dec["conv_in"], z)
    x = resnet(dec["mid"]["res1"], x, g)
    x = attn_block(dec["mid"]["attn"], x, g)
    x = resnet(dec["mid"]["res2"], x, g)
    for block in dec["up"]:
        for r in block["resnets"]:
            x = resnet(r, x, g)
        if "up" in block:
            b, c, h, w = x.shape
            x = jax.image.resize(x, (b, c, 2 * h, 2 * w), method="nearest")
            x = conv(block["up"], x)
    return conv(dec["conv_out"], jax.nn.silu(group_norm(dec["norm_out"], x, g)))
