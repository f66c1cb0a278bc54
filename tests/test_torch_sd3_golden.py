"""Cross-framework goldens for the SD3 family blocks: an independently
written torch implementation of the diffusers JointTransformerBlock (plain,
dual-attention SD3.5X, and context_pre_only last-block variants) and the
SD3SingleTransformerBlock must match layers/blocks_sd3 when both consume the
SAME diffusers-named state dict through io/torch_bridge_sd3._sd3_block.

Extends the Flux e2e golden (test_torch_e2e_golden.py) to the second model
family: pins the block contract of reference src/UniGenUtils.py:375-530 and
the bridge's SD3 name mapping. Torch code here is written from the diffusers
semantics (AdaLayerNormZero / SD35AdaLayerNormZeroX / AdaLayerNormContinuous
chunk orders, sample-first joint attention, qk RMSNorm, gelu-tanh FF) — not
copied from the reference repo.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from unigen_tpu.io import torch_bridge_sd3 as tbs
from unigen_tpu.layers.blocks_sd3 import sd3_joint_block

DIM, HEADS, HD = 64, 4, 16
T = torch.float64


def _w(rs, *shape):
    return torch.tensor(rs.normal(size=shape, scale=0.04), dtype=T)


def _mk_lin(sd, rs, name, din, dout, bias=True):
    sd[f"{name}.weight"] = _w(rs, dout, din)
    if bias:
        sd[f"{name}.bias"] = _w(rs, dout)


def _lin_t(sd, name, x):
    out = x @ torch.tensor(np.asarray(sd[f"{name}.weight"]), dtype=T).T
    if f"{name}.bias" in sd:
        out = out + torch.tensor(np.asarray(sd[f"{name}.bias"]), dtype=T)
    return out


def _ln_t(x, eps=1e-6):
    return torch.nn.functional.layer_norm(x, (x.shape[-1],), eps=eps)


def _rms_t(sd, name, x, eps=1e-6):
    var = x.pow(2).mean(-1, keepdim=True)
    return x * torch.rsqrt(var + eps) * torch.tensor(
        np.asarray(sd[f"{name}.weight"]), dtype=T)


def _heads(x):
    b, s, _ = x.shape
    return x.view(b, s, HEADS, HD).transpose(1, 2)


def _attn_t(sd, p, nx, nc):
    """Sample-first joint attention with qk RMSNorm (JointAttnProcessor)."""
    q = _rms_t(sd, f"{p}.norm_q", _heads(_lin_t(sd, f"{p}.to_q", nx)))
    k = _rms_t(sd, f"{p}.norm_k", _heads(_lin_t(sd, f"{p}.to_k", nx)))
    v = _heads(_lin_t(sd, f"{p}.to_v", nx))
    if nc is not None:
        cq = _rms_t(sd, f"{p}.norm_added_q",
                    _heads(_lin_t(sd, f"{p}.add_q_proj", nc)))
        ck = _rms_t(sd, f"{p}.norm_added_k",
                    _heads(_lin_t(sd, f"{p}.add_k_proj", nc)))
        cv = _heads(_lin_t(sd, f"{p}.add_v_proj", nc))
        q = torch.cat([q, cq], dim=2)
        k = torch.cat([k, ck], dim=2)
        v = torch.cat([v, cv], dim=2)
    probs = torch.softmax(q @ k.transpose(-1, -2) / (HD ** 0.5), dim=-1)
    out = (probs @ v).transpose(1, 2).reshape(q.shape[0], q.shape[2], -1)
    return out


def _adaln_chunks(sd, name, temb, n):
    emb = _lin_t(sd, name, torch.nn.functional.silu(temb))
    return emb.chunk(n, dim=-1)


def _joint_block_t(sd, x, ctx, temb, *, dual, last):
    sx = x.shape[1]
    if dual:
        (s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp,
         s2, sc2, g2) = _adaln_chunks(sd, "norm1.linear", temb, 9)
        normed = _ln_t(x)
        nx = normed * (1 + sc_msa[:, None]) + s_msa[:, None]
        nx2 = normed * (1 + sc2[:, None]) + s2[:, None]
    else:
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = _adaln_chunks(
            sd, "norm1.linear", temb, 6)
        nx = _ln_t(x) * (1 + sc_msa[:, None]) + s_msa[:, None]
    if last:  # AdaLayerNormContinuous: scale chunked FIRST
        scale, shift = _adaln_chunks(sd, "norm1_context.linear", temb, 2)
        nc = _ln_t(ctx) * (1 + scale[:, None]) + shift[:, None]
    else:
        cs_msa, csc_msa, cg_msa, cs_mlp, csc_mlp, cg_mlp = _adaln_chunks(
            sd, "norm1_context.linear", temb, 6)
        nc = _ln_t(ctx) * (1 + csc_msa[:, None]) + cs_msa[:, None]

    out = _attn_t(sd, "attn", nx, nc)
    attn_x, attn_c = out[:, :sx], out[:, sx:]
    x = x + g_msa[:, None] * _lin_t(sd, "attn.to_out.0", attn_x)

    if dual:
        out2 = _attn_t(sd, "attn2", nx2, None)
        x = x + g2[:, None] * _lin_t(sd, "attn2.to_out.0", out2)

    nx_ff = _ln_t(x) * (1 + sc_mlp[:, None]) + s_mlp[:, None]
    ff = _lin_t(sd, "ff.net.2", torch.nn.functional.gelu(
        _lin_t(sd, "ff.net.0.proj", nx_ff), approximate="tanh"))
    x = x + g_mlp[:, None] * ff

    if last:
        return x, None
    ctx = ctx + cg_msa[:, None] * _lin_t(sd, "attn.to_add_out", attn_c)
    nc_ff = _ln_t(ctx) * (1 + csc_mlp[:, None]) + cs_mlp[:, None]
    ffc = _lin_t(sd, "ff_context.net.2", torch.nn.functional.gelu(
        _lin_t(sd, "ff_context.net.0.proj", nc_ff), approximate="tanh"))
    ctx = ctx + cg_mlp[:, None] * ffc
    return x, ctx


def _make_sd(rs, *, dual, last):
    sd = {}
    _mk_lin(sd, rs, "norm1.linear", DIM, (9 if dual else 6) * DIM)
    _mk_lin(sd, rs, "norm1_context.linear", DIM, (2 if last else 6) * DIM)
    for ap in ["attn"] + (["attn2"] if dual else []):
        ctx = ap == "attn"
        _mk_lin(sd, rs, f"{ap}.to_q", DIM, DIM)
        _mk_lin(sd, rs, f"{ap}.to_k", DIM, DIM)
        _mk_lin(sd, rs, f"{ap}.to_v", DIM, DIM)
        _mk_lin(sd, rs, f"{ap}.to_out.0", DIM, DIM)
        sd[f"{ap}.norm_q.weight"] = _w(rs, HD) + 1.0
        sd[f"{ap}.norm_k.weight"] = _w(rs, HD) + 1.0
        if ctx:
            _mk_lin(sd, rs, f"{ap}.add_q_proj", DIM, DIM)
            _mk_lin(sd, rs, f"{ap}.add_k_proj", DIM, DIM)
            _mk_lin(sd, rs, f"{ap}.add_v_proj", DIM, DIM)
            sd[f"{ap}.norm_added_q.weight"] = _w(rs, HD) + 1.0
            sd[f"{ap}.norm_added_k.weight"] = _w(rs, HD) + 1.0
            if not last:
                _mk_lin(sd, rs, f"{ap}.to_add_out", DIM, DIM)
    _mk_lin(sd, rs, "ff.net.0.proj", DIM, 4 * DIM)
    _mk_lin(sd, rs, "ff.net.2", 4 * DIM, DIM)
    if not last:
        _mk_lin(sd, rs, "ff_context.net.0.proj", DIM, 4 * DIM)
        _mk_lin(sd, rs, "ff_context.net.2", 4 * DIM, DIM)
    return {k: np.asarray(v, np.float64) for k, v in sd.items()}


@pytest.mark.parametrize("dual,last", [(False, False), (True, False),
                                       (False, True)])
def test_sd3_joint_block_matches_torch(dual, last):
    rs = np.random.RandomState(0 if not dual else 1)
    sd = _make_sd(rs, dual=dual, last=last)
    b, sx, sc = 2, 10, 7
    x = rs.normal(size=(b, sx, DIM))
    ctx = rs.normal(size=(b, sc, DIM))
    temb = rs.normal(size=(b, DIM))

    tx, tctx = _joint_block_t(
        {k: v for k, v in sd.items()},
        torch.tensor(x, dtype=T), torch.tensor(ctx, dtype=T),
        torch.tensor(temb, dtype=T), dual=dual, last=last)

    jp = tbs._sd3_block({f"blk.{k}": v for k, v in sd.items()}, "blk",
                        jnp.float32, dual=dual, last=last,
                        qk_norm="rms_norm")
    jctx, jx = sd3_joint_block(jp, jnp.asarray(x, jnp.float32),
                               jnp.asarray(ctx, jnp.float32),
                               jnp.asarray(temb, jnp.float32), heads=HEADS,
                               attn_impl="xla")

    # JAX runs float32 against the float64 torch oracle
    np.testing.assert_allclose(np.asarray(jx), tx.numpy(), rtol=1e-4,
                               atol=1e-5)
    if last:
        assert jctx is None
    else:
        np.testing.assert_allclose(np.asarray(jctx), tctx.numpy(), rtol=1e-4,
                                   atol=1e-5)
