"""SD3/SANA checkpoint bridge + SD3 pipeline end-to-end on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu import config as cfg_lib
from unigen_tpu.io import torch_bridge_sd3 as tb3
from unigen_tpu.models import vae as vae_lib


def _g():
    r = np.random.default_rng(0)
    return lambda *shape: r.normal(size=shape).astype(np.float32) * 0.05


def _sd3_state_dict(cfg):
    g = _g()
    d = cfg.inner_dim
    sd = {}

    def lin(name, i, o, bias=True):
        sd[f"{name}.weight"] = g(o, i)
        if bias:
            sd[f"{name}.bias"] = g(o)

    sd["pos_embed.proj.weight"] = g(d, cfg.in_channels, cfg.patch_size, cfg.patch_size)
    sd["pos_embed.proj.bias"] = g(d)
    sd["pos_embed.pos_embed"] = g(1, cfg.pos_embed_max_size ** 2, d)
    for e, ind in [("timestep_embedder", 256), ("text_embedder", cfg.pooled_projection_dim)]:
        lin(f"time_text_embed.{e}.linear_1", ind, d)
        lin(f"time_text_embed.{e}.linear_2", d, d)
    lin("context_embedder", cfg.joint_attention_dim, d)

    def attn(p, context, pre_only=False, qk=True):
        for n in ["to_q", "to_k", "to_v"]:
            lin(f"{p}.{n}", d, d)
        lin(f"{p}.to_out.0", d, d)
        if qk:
            sd[f"{p}.norm_q.weight"] = g(cfg.attention_head_dim)
            sd[f"{p}.norm_k.weight"] = g(cfg.attention_head_dim)
        if context:
            for n in ["add_q_proj", "add_k_proj", "add_v_proj"]:
                lin(f"{p}.{n}", d, d)
            if qk:
                sd[f"{p}.norm_added_q.weight"] = g(cfg.attention_head_dim)
                sd[f"{p}.norm_added_k.weight"] = g(cfg.attention_head_dim)
            if not pre_only:
                lin(f"{p}.to_add_out", d, d)

    dual = set(cfg.dual_attention_layers)
    for i in range(cfg.num_layers):
        p = f"transformer_blocks.{i}"
        last = i == cfg.num_layers - 1
        lin(f"{p}.norm1.linear", d, (9 if i in dual else 6) * d)
        lin(f"{p}.norm1_context.linear", d, (2 if last else 6) * d)
        attn(f"{p}.attn", True, pre_only=last)
        if i in dual:
            attn(f"{p}.attn2", False)
        lin(f"{p}.ff.net.0.proj", d, 4 * d)
        lin(f"{p}.ff.net.2", 4 * d, d)
        if not last:
            lin(f"{p}.ff_context.net.0.proj", d, 4 * d)
            lin(f"{p}.ff_context.net.2", 4 * d, d)
    lin("norm_out.linear", d, 2 * d)
    lin("proj_out", d, cfg.patch_size ** 2 * cfg.out_channels)
    return sd


def test_load_sd3_transformer_runs():
    from unigen_tpu.models.sd3 import sd3_forward
    cfg = cfg_lib.tiny_sd3_config()
    sd = _sd3_state_dict(cfg)
    params = tb3.load_sd3_transformer(sd, cfg, dtype=jnp.float32)
    assert params["dual_blocks"]["attn2"]["to_q"]["w"].shape[0] == 2
    b, hw, t = 1, 8, 5
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    out = sd3_forward(params, cfg,
                      jax.random.normal(ks[0], (b, cfg.in_channels, hw, hw)),
                      jax.random.normal(ks[1], (b, t, cfg.joint_attention_dim)),
                      jax.random.normal(ks[2], (b, cfg.pooled_projection_dim)),
                      jnp.full((b,), 400.0))
    assert out.shape == (b, cfg.out_channels, hw, hw)
    assert jnp.isfinite(out).all()
    # conv kernel flattening matches our patchify (c, p, q) channel order
    w = np.asarray(params["pos_embed"]["proj"]["w"])
    assert w.shape == (cfg.in_channels * cfg.patch_size ** 2, cfg.inner_dim)


def _sana_state_dict(cfg):
    g = _g()
    d = cfg.inner_dim
    inner_x = cfg.num_cross_attention_heads * cfg.cross_attention_head_dim
    hidden_ff = int(d * cfg.mlp_ratio)
    sd = {
        "patch_embed.proj.weight": g(d, cfg.in_channels, 1, 1),
        "patch_embed.proj.bias": g(d),
        "time_embed.emb.timestep_embedder.linear_1.weight": g(d, 256),
        "time_embed.emb.timestep_embedder.linear_1.bias": g(d),
        "time_embed.emb.timestep_embedder.linear_2.weight": g(d, d),
        "time_embed.emb.timestep_embedder.linear_2.bias": g(d),
        "time_embed.linear.weight": g(6 * d, d),
        "time_embed.linear.bias": g(6 * d),
        "caption_projection.linear_1.weight": g(d, cfg.caption_channels),
        "caption_projection.linear_1.bias": g(d),
        "caption_projection.linear_2.weight": g(d, d),
        "caption_projection.linear_2.bias": g(d),
        "caption_norm.weight": g(d),
        "scale_shift_table": g(2, d),
        "proj_out.weight": g(cfg.out_channels, d),
        "proj_out.bias": g(cfg.out_channels),
    }
    for i in range(cfg.num_layers):
        p = f"transformer_blocks.{i}"
        sd[f"{p}.scale_shift_table"] = g(6, d)
        for n, (i_, o_) in {"attn1.to_q": (d, d), "attn1.to_k": (d, d),
                            "attn1.to_v": (d, d), "attn1.to_out.0": (d, d),
                            "attn2.to_q": (d, inner_x),
                            "attn2.to_k": (d, inner_x),
                            "attn2.to_v": (d, inner_x),
                            "attn2.to_out.0": (inner_x, d)}.items():
            sd[f"{p}.{n}.weight"] = g(o_, i_)
            if "to_out" in n or "attn2" in n:
                sd[f"{p}.{n}.bias"] = g(o_)
        sd[f"{p}.ff.conv_inverted.weight"] = g(2 * hidden_ff, d)
        sd[f"{p}.ff.conv_inverted.bias"] = g(2 * hidden_ff)
        sd[f"{p}.ff.conv_depth.weight"] = g(2 * hidden_ff, 1, 3, 3)
        sd[f"{p}.ff.conv_depth.bias"] = g(2 * hidden_ff)
        sd[f"{p}.ff.conv_point.weight"] = g(d, hidden_ff, 1, 1)
    return sd


def test_load_sana_transformer_runs():
    from unigen_tpu.models.sana import sana_forward
    cfg = cfg_lib.tiny_sana_config()
    sd = _sana_state_dict(cfg)
    params = tb3.load_sana_transformer(sd, cfg, dtype=jnp.float32)
    b, hw, t = 1, 8, 5
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    out = sana_forward(params, cfg,
                       jax.random.normal(ks[0], (b, cfg.in_channels, hw, hw)),
                       jax.random.normal(ks[1], (b, t, cfg.caption_channels)),
                       jnp.full((b,), 400.0))
    assert out.shape == (b, cfg.out_channels, hw, hw)
    assert jnp.isfinite(out).all()


def test_sd3_pipeline_generate_tiny():
    from unigen_tpu.models.unigen_sd3 import init_unigen_sd3_params
    from unigen_tpu.pipelines.sd3 import UniGenSD3Pipeline

    cfg = cfg_lib.UniGenConfig(family="sd3", sd3=cfg_lib.tiny_sd3_config(),
                               control=cfg_lib.ControlConfig(use_rope=False),
                               condition_types=("depth",))
    params = init_unigen_sd3_params(jax.random.PRNGKey(0), cfg)
    vae_cfg = vae_lib.tiny_vae_config(latent_channels=cfg.sd3.in_channels)
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), vae_cfg)
    pipe = UniGenSD3Pipeline(cfg=cfg, params=params, vae_cfg=vae_cfg,
                             vae_params=vae_params, dtype=jnp.float32)
    b, h, w = 1, 16, 16
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    imgs = pipe.generate(
        prompt_embeds=jax.random.normal(ks[0], (b, 6, cfg.sd3.joint_attention_dim)),
        pooled=jax.random.normal(ks[1], (b, cfg.sd3.pooled_projection_dim)),
        cond_pooled=jax.random.normal(ks[2], (b, cfg.sd3.pooled_projection_dim)),
        control_pixels=jax.random.normal(ks[3], (b, 3, h, w)),
        height=h, width=w, num_inference_steps=2, guidance_scale=3.0)
    assert imgs.shape == (b, h, w, 3) and imgs.dtype == np.uint8


def test_load_sana_unigen_adapter():
    from unigen_tpu.models.sana import init_sana_unigen_params, sana_unigen_forward
    g = _g()
    cfg = cfg_lib.UniGenConfig(family="sana", sana=cfg_lib.tiny_sana_config(),
                               condition_types=("canny",))
    bb = cfg.sana
    expect = init_sana_unigen_params(jax.random.PRNGKey(0), cfg)["control"]
    d = bb.inner_dim
    hidden_ff = int(d * bb.mlp_ratio)
    inner_x = bb.num_cross_attention_heads * bb.cross_attention_head_dim
    e_num = cfg.control.moe.num_experts(1)
    n_cn = bb.num_layers
    sd = {}

    def lin(name, i, o):
        sd[f"{name}.weight"] = g(o, i)
        sd[f"{name}.bias"] = g(o)

    def blk(p):
        sd[f"{p}.scale_shift_table"] = g(6, d)
        for n, (i_, o_) in {"attn1.to_q": (d, d), "attn1.to_k": (d, d),
                            "attn1.to_v": (d, d), "attn1.to_out.0": (d, d),
                            "attn2.to_q": (d, inner_x), "attn2.to_k": (d, inner_x),
                            "attn2.to_v": (d, inner_x),
                            "attn2.to_out.0": (inner_x, d)}.items():
            sd[f"{p}.{n}.weight"] = g(o_, i_)
            if not (n.startswith("attn1.to_q") or n.startswith("attn1.to_k")
                    or n.startswith("attn1.to_v")):
                sd[f"{p}.{n}.bias"] = g(o_)  # linear-attn qkv has no bias
        sd[f"{p}.ff.conv_inverted.weight"] = g(2 * hidden_ff, d)
        sd[f"{p}.ff.conv_inverted.bias"] = g(2 * hidden_ff)
        sd[f"{p}.ff.conv_depth.weight"] = g(2 * hidden_ff, 1, 3, 3)
        sd[f"{p}.ff.conv_depth.bias"] = g(2 * hidden_ff)
        sd[f"{p}.ff.conv_point.weight"] = g(d, hidden_ff, 1, 1)

    sd["control_pos_embed_input.proj.weight"] = g(d, bb.in_channels, 1, 1)
    sd["control_pos_embed_input.proj.bias"] = g(d)
    lin("control_condition_embed.emb.timestep_embedder.linear_1", 256, d)
    lin("control_condition_embed.emb.timestep_embedder.linear_2", d, d)
    lin("control_condition_embed.linear", d, 6 * d)
    lin("control_context_embedder", d, d)
    for i in range(n_cn):
        blk(f"control_transformer_blocks.{i}")
        lin(f"controlnet_add_blocks.{i}", d, d)
    sd["moe.moe_layer.gate.wg.weight"] = g(e_num, d)
    for e in range(e_num):
        lin(f"moe.moe_layer.experts.deepspeed_experts.{e}.0.0", d, d)
        lin(f"moe.moe_layer.experts.deepspeed_experts.{e}.0.1",
            bb.pooled_projection_dim, d)
        lin(f"moe.moe_layer.experts.deepspeed_experts.{e}.1.0", d, d)
        lin(f"moe.moe_layer.experts.deepspeed_experts.{e}.1.1",
            bb.pooled_projection_dim, d)
    blk("shared_expert.0")
    blk("shared_expert.1")

    got = tb3.load_sana_unigen_adapter(sd, bb, n_cn, e_num, dtype=jnp.float32)
    assert (jax.tree.map(lambda x: x.shape, got)
            == jax.tree.map(lambda x: x.shape, expect))
    # loaded adapter runs end-to-end
    from unigen_tpu.models.sana import init_sana_params
    base = init_sana_params(jax.random.PRNGKey(1), bb, dtype=jnp.float32)
    batch_rng = jax.random.split(jax.random.PRNGKey(2), 5)
    out, losses, _ = sana_unigen_forward(
        {"base": base, "control": got}, cfg,
        hidden=jax.random.normal(batch_rng[0], (1, bb.in_channels, 8, 8)),
        condition=jax.random.normal(batch_rng[1], (1, bb.in_channels, 8, 8)),
        encoder=jax.random.normal(batch_rng[2], (1, 5, bb.caption_channels)),
        pooled=jax.random.normal(batch_rng[3], (1, bb.pooled_projection_dim)),
        condition_pooled=jax.random.normal(batch_rng[4],
                                           (1, bb.pooled_projection_dim)),
        timestep=jnp.full((1,), 400.0))
    assert jnp.isfinite(out).all()
