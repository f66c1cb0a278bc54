"""Cross-framework golden: an independently written torch implementation of
the Flux double-stream block (diffusers semantics: AdaLN-Zero 6-chunk,
context-first concat, qk RMSNorm, interleaved rotary, gelu-tanh FF) must
match layers/blocks_flux.flux_double_block when fed the bridged weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from unigen_tpu import config as cfg_lib
from unigen_tpu.io.torch_bridge import _flux_double_block
from unigen_tpu.layers.blocks_flux import flux_double_block
from unigen_tpu.ops.rope import rope_multi_axis


def _torch_rotary(x, cos, sin):
    # x [B,H,S,D]; cos/sin [S,D]; interleaved pairs
    xf = x.float()
    x2 = xf.reshape(*xf.shape[:-1], -1, 2)
    rot = torch.stack([-x2[..., 1], x2[..., 0]], dim=-1).reshape(xf.shape)
    return xf * cos + rot * sin


def _torch_flux_double(sd, x, ctx, temb, cos, sin, heads):
    def lin(name, v):
        w = torch.tensor(sd[f"{name}.weight"])
        b = torch.tensor(sd[f"{name}.bias"])
        return v @ w.T + b

    def adaln(prefix, v, t):
        emb = lin(f"{prefix}.linear", torch.nn.functional.silu(t))
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = emb.chunk(6, dim=-1)
        normed = torch.nn.functional.layer_norm(v, v.shape[-1:], eps=1e-6)
        out = normed * (1 + sc_msa[:, None]) + s_msa[:, None]
        return out, g_msa[:, None], s_mlp[:, None], sc_mlp[:, None], g_mlp[:, None]

    def rms(name, v):
        w = torch.tensor(sd[f"{name}.weight"])
        var = v.float().pow(2).mean(-1, keepdim=True)
        return (v.float() * torch.rsqrt(var + 1e-6)) * w

    b, s, d = x.shape
    hd = d // heads
    nx, g_msa, s_mlp, sc_mlp, g_mlp = adaln("norm1", x, temb)
    nc, cg_msa, cs_mlp, csc_mlp, cg_mlp = adaln("norm1_context", ctx, temb)

    def split(v):
        return v.reshape(b, -1, heads, hd).transpose(1, 2)

    q = rms("attn.norm_q", split(lin("attn.to_q", nx)))
    k = rms("attn.norm_k", split(lin("attn.to_k", nx)))
    v = split(lin("attn.to_v", nx))
    cq = rms("attn.norm_added_q", split(lin("attn.add_q_proj", nc)))
    ck = rms("attn.norm_added_k", split(lin("attn.add_k_proj", nc)))
    cv = split(lin("attn.add_v_proj", nc))
    # context FIRST (diffusers Flux convention)
    q = torch.cat([cq, q], dim=2)
    k = torch.cat([ck, k], dim=2)
    v = torch.cat([cv, v], dim=2)
    q = _torch_rotary(q, cos, sin)
    k = _torch_rotary(k, cos, sin)
    attn = torch.softmax(q @ k.transpose(-1, -2) / hd ** 0.5, dim=-1) @ v.float()
    attn = attn.transpose(1, 2).reshape(b, -1, d)
    attn_c, attn_x = attn[:, :ctx.shape[1]], attn[:, ctx.shape[1]:]

    x = x + g_msa * lin("attn.to_out.0", attn_x)
    nx2 = torch.nn.functional.layer_norm(x, x.shape[-1:], eps=1e-6)
    nx2 = nx2 * (1 + sc_mlp) + s_mlp
    ff = lin("ff.net.2", torch.nn.functional.gelu(lin("ff.net.0.proj", nx2),
                                                  approximate="tanh"))
    x = x + g_mlp * ff

    ctx = ctx + cg_msa * lin("attn.to_add_out", attn_c)
    nc2 = torch.nn.functional.layer_norm(ctx, ctx.shape[-1:], eps=1e-6)
    nc2 = nc2 * (1 + csc_mlp) + cs_mlp
    ffc = lin("ff_context.net.2",
              torch.nn.functional.gelu(lin("ff_context.net.0.proj", nc2),
                                       approximate="tanh"))
    ctx = ctx + cg_mlp * ffc
    return ctx, x


def test_flux_double_block_matches_torch_reference():
    from tests.test_torch_bridge import _flux_tiny_sd
    cfg = cfg_lib.tiny_flux_config()
    full_sd = _flux_tiny_sd(cfg)
    prefix = "transformer_blocks.0."
    sd = {k[len(prefix):]: v for k, v in full_sd.items() if k.startswith(prefix)}

    params = _flux_double_block(full_sd, "transformer_blocks.0", jnp.float32)
    rng = np.random.default_rng(0)
    b, s, t, d = 2, 12, 5, cfg.inner_dim
    x = rng.normal(size=(b, s, d)).astype(np.float32)
    ctx = rng.normal(size=(b, t, d)).astype(np.float32)
    temb = rng.normal(size=(b, d)).astype(np.float32)
    ids = np.stack([np.zeros(s + t), np.arange(s + t) // 4,
                    np.arange(s + t) % 4], -1)
    cos, sin = rope_multi_axis(jnp.asarray(ids), cfg.axes_dims_rope)

    ctx_j, x_j = flux_double_block(params, jnp.asarray(x), jnp.asarray(ctx),
                                   jnp.asarray(temb), (cos, sin),
                                   heads=cfg.num_attention_heads)
    with torch.no_grad():
        ctx_t, x_t = _torch_flux_double(
            sd, torch.tensor(x), torch.tensor(ctx), torch.tensor(temb),
            torch.tensor(np.asarray(cos)), torch.tensor(np.asarray(sin)),
            cfg.num_attention_heads)
    np.testing.assert_allclose(np.asarray(x_j), x_t.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ctx_j), ctx_t.numpy(), rtol=2e-3, atol=2e-3)
