"""Checkpoint-bridge tests: synthetic torch-named state dicts (diffusers /
reference naming) load into our trees and run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unigen_tpu import config as cfg_lib
from unigen_tpu.io import torch_bridge as tb


def _rng_sd():
    r = np.random.default_rng(0)
    return lambda *shape: r.normal(size=shape).astype(np.float32)


def _flux_tiny_sd(cfg):
    """Enumerate diffusers FluxTransformer2DModel param names for a tiny config."""
    g = _rng_sd()
    d = cfg.inner_dim
    jd, pd, ic = cfg.joint_attention_dim, cfg.pooled_projection_dim, cfg.in_channels
    sd = {}

    def lin(name, i, o, bias=True):
        sd[f"{name}.weight"] = g(o, i)
        if bias:
            sd[f"{name}.bias"] = g(o)

    lin("x_embedder", ic, d)
    lin("context_embedder", jd, d)
    for e, ind in [("timestep_embedder", 256), ("text_embedder", pd)]:
        lin(f"time_text_embed.{e}.linear_1", ind, d)
        lin(f"time_text_embed.{e}.linear_2", d, d)

    def attn(p, context):
        for n in ["to_q", "to_k", "to_v"]:
            lin(f"{p}.{n}", d, d)
        sd[f"{p}.norm_q.weight"] = g(cfg.attention_head_dim)
        sd[f"{p}.norm_k.weight"] = g(cfg.attention_head_dim)
        if context:
            lin(f"{p}.to_out.0", d, d)
            for n in ["add_q_proj", "add_k_proj", "add_v_proj", "to_add_out"]:
                lin(f"{p}.{n}", d, d)
            sd[f"{p}.norm_added_q.weight"] = g(cfg.attention_head_dim)
            sd[f"{p}.norm_added_k.weight"] = g(cfg.attention_head_dim)

    for i in range(cfg.num_layers):
        p = f"transformer_blocks.{i}"
        lin(f"{p}.norm1.linear", d, 6 * d)
        lin(f"{p}.norm1_context.linear", d, 6 * d)
        attn(f"{p}.attn", True)
        for ff in ["ff", "ff_context"]:
            lin(f"{p}.{ff}.net.0.proj", d, 4 * d)
            lin(f"{p}.{ff}.net.2", 4 * d, d)
    for i in range(cfg.num_single_layers):
        p = f"single_transformer_blocks.{i}"
        lin(f"{p}.norm.linear", d, 3 * d)
        attn(f"{p}.attn", False)
        lin(f"{p}.proj_mlp", d, 4 * d)
        lin(f"{p}.proj_out", 5 * d, d)
    lin("norm_out.linear", d, 2 * d)
    lin("proj_out", d, cfg.in_channels)
    return sd


def test_load_flux_transformer_runs():
    from unigen_tpu.models.flux import flux_forward
    from unigen_tpu.ops.packing import prepare_latent_image_ids

    cfg = cfg_lib.tiny_flux_config()
    sd = _flux_tiny_sd(cfg)
    params = tb.load_flux_transformer(sd, cfg.num_layers, cfg.num_single_layers,
                                      dtype=jnp.float32)
    # linear transpose convention
    np.testing.assert_allclose(np.asarray(params["x_embedder"]["w"]),
                               sd["x_embedder.weight"].T)
    # stacked block leading axis
    assert params["double_blocks"]["attn"]["to_q"]["w"].shape == \
        (cfg.num_layers, cfg.inner_dim, cfg.inner_dim)

    b, hw, t = 1, 4, 6
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    out = flux_forward(params, cfg,
                       jax.random.normal(ks[0], (b, hw * hw, cfg.in_channels)),
                       jax.random.normal(ks[1], (b, t, cfg.joint_attention_dim)),
                       jax.random.normal(ks[2], (b, cfg.pooled_projection_dim)),
                       jnp.full((b,), 0.5),
                       prepare_latent_image_ids(hw, hw), jnp.zeros((t, 3)))
    assert out.shape == (b, hw * hw, cfg.in_channels)
    assert jnp.isfinite(out).all()


def test_load_unigen_adapter_from_reference_names():
    """Adapter state dict with the reference's trainable_control_modules names
    (control_*, moe.moe_layer.*, shared_expert.*) loads and matches shapes of
    our init tree."""
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params

    flux = cfg_lib.tiny_flux_config()
    ucfg = cfg_lib.UniGenConfig(family="flux", flux=flux, condition_types=("canny",))
    expect = init_unigen_flux_params(jax.random.PRNGKey(0), ucfg)["control"]

    g = _rng_sd()
    d, pd, ic = flux.inner_dim, flux.pooled_projection_dim, flux.in_channels
    hd = flux.attention_head_dim
    n_cn = flux.num_layers // ucfg.control.single_control_dev
    n_cn_s = flux.num_single_layers // ucfg.control.single_control_dev
    e_num = ucfg.control.moe.num_experts(1)
    sd = {}

    def lin(name, i, o):
        sd[f"{name}.weight"] = g(o, i)
        sd[f"{name}.bias"] = g(o)

    lin("control_x_embedder", ic, d)
    lin("control_context_embedder", d, d)
    for root in ["control_time_text_embed", "control_condition_embed"]:
        for e, ind in [("timestep_embedder", 256), ("text_embedder", pd)]:
            lin(f"{root}.{e}.linear_1", ind, d)
            lin(f"{root}.{e}.linear_2", d, d)

    def dbl(p):
        lin(f"{p}.norm1.linear", d, 6 * d)
        lin(f"{p}.norm1_context.linear", d, 6 * d)
        for n in ["to_q", "to_k", "to_v", "to_out.0", "add_q_proj", "add_k_proj",
                  "add_v_proj", "to_add_out"]:
            lin(f"{p}.attn.{n}", d, d)
        for n in ["norm_q", "norm_k", "norm_added_q", "norm_added_k"]:
            sd[f"{p}.attn.{n}.weight"] = g(hd)
        for ff in ["ff", "ff_context"]:
            lin(f"{p}.{ff}.net.0.proj", d, 4 * d)
            lin(f"{p}.{ff}.net.2", 4 * d, d)

    for i in range(n_cn):
        dbl(f"control_joint_trans_blocks.{i}")
        lin(f"controlnet_add_joint_blocks.{i}", d, d)
    for i in range(n_cn_s):
        p = f"control_single_trans_blocks.{i}"
        lin(f"{p}.norm.linear", d, 3 * d)
        for n in ["to_q", "to_k", "to_v"]:
            lin(f"{p}.attn.{n}", d, d)
        sd[f"{p}.attn.norm_q.weight"] = g(hd)
        sd[f"{p}.attn.norm_k.weight"] = g(hd)
        lin(f"{p}.proj_mlp", d, 4 * d)
        lin(f"{p}.proj_out", 5 * d, d)
        lin(f"controlnet_add_single_blocks.{i}", d, d)

    sd["moe.moe_layer.gate.wg.weight"] = g(e_num, d)
    for e in range(e_num):
        lin(f"moe.moe_layer.experts.deepspeed_experts.{e}.0.0", d, d)
        lin(f"moe.moe_layer.experts.deepspeed_experts.{e}.0.1", pd, d)
        lin(f"moe.moe_layer.experts.deepspeed_experts.{e}.1.0", d, d)
        lin(f"moe.moe_layer.experts.deepspeed_experts.{e}.1.1", pd, d)
    dbl("shared_expert.0")
    dbl("shared_expert.1")

    got = tb.load_unigen_adapter(sd, n_cn=n_cn, n_cn_single=n_cn_s,
                                 num_experts=e_num, dtype=jnp.float32)
    expect_shapes = jax.tree.map(lambda x: x.shape, expect)
    got_shapes = jax.tree.map(lambda x: x.shape, got)
    assert expect_shapes == got_shapes
    np.testing.assert_allclose(
        np.asarray(got["moe"]["experts"]["cond_pool"]["w"][2]),
        sd["moe.moe_layer.experts.deepspeed_experts.2.0.1.weight"].T)


def test_load_clip_and_t5_and_vae_shapes():
    from unigen_tpu.models.clip_text import clip_encode, tiny_clip_config
    from unigen_tpu.models.t5_text import t5_encode, tiny_t5_config
    from unigen_tpu.models import vae as vae_lib

    g = _rng_sd()
    ccfg = tiny_clip_config()
    d, it = ccfg.hidden_size, ccfg.intermediate_size
    sd = {"text_model.embeddings.token_embedding.weight": g(ccfg.vocab_size, d),
          "text_model.embeddings.position_embedding.weight": g(ccfg.max_position_embeddings, d)}
    for i in range(ccfg.num_layers):
        p = f"text_model.encoder.layers.{i}"
        for n, (i_, o_) in {"self_attn.q_proj": (d, d), "self_attn.k_proj": (d, d),
                            "self_attn.v_proj": (d, d), "self_attn.out_proj": (d, d),
                            "mlp.fc1": (d, it), "mlp.fc2": (it, d)}.items():
            sd[f"{p}.{n}.weight"] = g(o_, i_)
            sd[f"{p}.{n}.bias"] = g(o_)
        for n in ["layer_norm1", "layer_norm2"]:
            sd[f"{p}.{n}.weight"] = g(d)
            sd[f"{p}.{n}.bias"] = g(d)
    sd["text_model.final_layer_norm.weight"] = g(d)
    sd["text_model.final_layer_norm.bias"] = g(d)
    clip_params = tb.load_clip_text(sd, ccfg.num_layers, dtype=jnp.float32)
    ids = jnp.array([[3, 4, ccfg.eos_token_id, 0]])
    last, _, pooled = clip_encode(clip_params, ccfg, ids)
    assert pooled.shape == (1, d)

    tcfg = tiny_t5_config()
    dm, dff, inner = tcfg.d_model, tcfg.d_ff, tcfg.num_heads * tcfg.d_kv
    sd = {"shared.weight": g(tcfg.vocab_size, dm),
          "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight":
              g(tcfg.relative_attention_num_buckets, tcfg.num_heads),
          "encoder.final_layer_norm.weight": g(dm)}
    for i in range(tcfg.num_layers):
        p = f"encoder.block.{i}.layer"
        for n, (i_, o_) in {"0.SelfAttention.q": (dm, inner), "0.SelfAttention.k": (dm, inner),
                            "0.SelfAttention.v": (dm, inner), "0.SelfAttention.o": (inner, dm),
                            "1.DenseReluDense.wi_0": (dm, dff),
                            "1.DenseReluDense.wi_1": (dm, dff),
                            "1.DenseReluDense.wo": (dff, dm)}.items():
            sd[f"{p}.{n}.weight"] = g(o_, i_)
        sd[f"{p}.0.layer_norm.weight"] = g(dm)
        sd[f"{p}.1.layer_norm.weight"] = g(dm)
    t5_params = tb.load_t5_encoder(sd, tcfg.num_layers, dtype=jnp.float32)
    out = t5_encode(t5_params, tcfg, jnp.array([[1, 2, 3, 0]]))
    assert out.shape == (1, 4, dm)

    vcfg = vae_lib.tiny_vae_config()
    chs, lpb = vcfg.block_out_channels, vcfg.layers_per_block
    sd = {}

    def cv(name, ci, co, k=3):
        sd[f"{name}.weight"] = g(co, ci, k, k)
        sd[f"{name}.bias"] = g(co)

    def gn(name, c):
        sd[f"{name}.weight"] = g(c)
        sd[f"{name}.bias"] = g(c)

    def res(p, ci, co):
        gn(f"{p}.norm1", ci); cv(f"{p}.conv1", ci, co)
        gn(f"{p}.norm2", co); cv(f"{p}.conv2", co, co)
        if ci != co:
            cv(f"{p}.conv_shortcut", ci, co, 1)

    def at(p, c):
        gn(f"{p}.group_norm", c)
        for n in ["to_q", "to_k", "to_v", "to_out.0"]:
            sd[f"{p}.{n}.weight"] = g(c, c)
            sd[f"{p}.{n}.bias"] = g(c)

    cv("encoder.conv_in", 3, chs[0])
    ci = chs[0]
    for i, co in enumerate(chs):
        for j in range(lpb):
            res(f"encoder.down_blocks.{i}.resnets.{j}", ci if j == 0 else co, co)
        if i < len(chs) - 1:
            cv(f"encoder.down_blocks.{i}.downsamplers.0.conv", co, co)
        ci = co
    res("encoder.mid_block.resnets.0", chs[-1], chs[-1])
    at("encoder.mid_block.attentions.0", chs[-1])
    res("encoder.mid_block.resnets.1", chs[-1], chs[-1])
    gn("encoder.conv_norm_out", chs[-1])
    cv("encoder.conv_out", chs[-1], 2 * vcfg.latent_channels)
    rev = list(reversed(chs))
    cv("decoder.conv_in", vcfg.latent_channels, rev[0])
    res("decoder.mid_block.resnets.0", rev[0], rev[0])
    at("decoder.mid_block.attentions.0", rev[0])
    res("decoder.mid_block.resnets.1", rev[0], rev[0])
    ci = rev[0]
    for i, co in enumerate(rev):
        for j in range(lpb + 1):
            res(f"decoder.up_blocks.{i}.resnets.{j}", ci if j == 0 else co, co)
        if i < len(rev) - 1:
            cv(f"decoder.up_blocks.{i}.upsamplers.0.conv", co, co)
        ci = co
    gn("decoder.conv_norm_out", rev[-1])
    cv("decoder.conv_out", rev[-1], 3)
    vae_params = tb.load_vae(sd, chs, lpb, dtype=jnp.float32)
    px = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 16, 16))
    lat = vae_lib.vae_encode(vae_params, vcfg, px)
    out = vae_lib.vae_decode(vae_params, vcfg, lat)
    assert out.shape == px.shape


def test_strict_adapter_load_flags_unmapped_keys():
    """strict=True: a clean reference-name dict loads with every key consumed;
    one stray key fails loudly naming it (VERDICT r1 #8 loader audit)."""
    flux = cfg_lib.tiny_flux_config()
    ucfg = cfg_lib.UniGenConfig(family="flux", flux=flux, condition_types=("canny",))
    n_cn = flux.num_layers // ucfg.control.single_control_dev
    n_cn_s = flux.num_single_layers // ucfg.control.single_control_dev
    e_num = ucfg.control.moe.num_experts(1)

    # base: full diffusers name set consumed exactly
    base_sd = _flux_tiny_sd(flux)
    tb.load_flux_transformer(base_sd, flux.num_layers, flux.num_single_layers,
                             dtype=jnp.float32, strict=True)
    base_sd["transformer_blocks.0.attn.to_q.lora_A"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="lora_A"):
        tb.load_flux_transformer(base_sd, flux.num_layers,
                                 flux.num_single_layers, dtype=jnp.float32,
                                 strict=True)

    # adapter: reference names incl. the DeepSpeed-MoE expert key layout
    sd = _build_adapter_sd(flux, ucfg, n_cn, n_cn_s, e_num)
    tb.load_unigen_adapter(sd, n_cn=n_cn, n_cn_single=n_cn_s,
                           num_experts=e_num, dtype=jnp.float32, strict=True)
    sd["moe.moe_layer.experts.deepspeed_experts.99.0.0.weight"] = \
        np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="deepspeed_experts.99"):
        tb.load_unigen_adapter(sd, n_cn=n_cn, n_cn_single=n_cn_s,
                               num_experts=e_num, dtype=jnp.float32, strict=True)


def _build_adapter_sd(flux, ucfg, n_cn, n_cn_s, e_num):
    g = _rng_sd()
    d, pd, ic = flux.inner_dim, flux.pooled_projection_dim, flux.in_channels
    hd = flux.attention_head_dim
    sd = {}

    def lin(name, i, o):
        sd[f"{name}.weight"] = g(o, i)
        sd[f"{name}.bias"] = g(o)

    lin("control_x_embedder", ic, d)
    lin("control_context_embedder", d, d)
    for root in ["control_time_text_embed", "control_condition_embed"]:
        for e, ind in [("timestep_embedder", 256), ("text_embedder", pd)]:
            lin(f"{root}.{e}.linear_1", ind, d)
            lin(f"{root}.{e}.linear_2", d, d)

    def dbl(p):
        lin(f"{p}.norm1.linear", d, 6 * d)
        lin(f"{p}.norm1_context.linear", d, 6 * d)
        for n in ["to_q", "to_k", "to_v", "to_out.0", "add_q_proj",
                  "add_k_proj", "add_v_proj", "to_add_out"]:
            lin(f"{p}.attn.{n}", d, d)
        for n in ["norm_q", "norm_k", "norm_added_q", "norm_added_k"]:
            sd[f"{p}.attn.{n}.weight"] = g(hd)
        for ff in ["ff", "ff_context"]:
            lin(f"{p}.{ff}.net.0.proj", d, 4 * d)
            lin(f"{p}.{ff}.net.2", 4 * d, d)

    for i in range(n_cn):
        dbl(f"control_joint_trans_blocks.{i}")
        lin(f"controlnet_add_joint_blocks.{i}", d, d)
    for i in range(n_cn_s):
        p = f"control_single_trans_blocks.{i}"
        lin(f"{p}.norm.linear", d, 3 * d)
        for n in ["to_q", "to_k", "to_v"]:
            lin(f"{p}.attn.{n}", d, d)
        sd[f"{p}.attn.norm_q.weight"] = g(hd)
        sd[f"{p}.attn.norm_k.weight"] = g(hd)
        lin(f"{p}.proj_mlp", d, 4 * d)
        lin(f"{p}.proj_out", 5 * d, d)
        lin(f"controlnet_add_single_blocks.{i}", d, d)
    sd["moe.moe_layer.gate.wg.weight"] = g(e_num, d)
    for e in range(e_num):
        lin(f"moe.moe_layer.experts.deepspeed_experts.{e}.0.0", d, d)
        lin(f"moe.moe_layer.experts.deepspeed_experts.{e}.0.1", pd, d)
        lin(f"moe.moe_layer.experts.deepspeed_experts.{e}.1.0", d, d)
        lin(f"moe.moe_layer.experts.deepspeed_experts.{e}.1.1", pd, d)
    dbl("shared_expert.0")
    dbl("shared_expert.1")
    return sd


def test_strict_load_through_bin_shard_format():
    """strict mode applies identically through the {module}_weights_{idx}.bin
    shard layout (hook.py:16-21)."""
    torch = pytest.importorskip("torch")
    import tempfile, os
    flux = cfg_lib.tiny_flux_config()
    ucfg = cfg_lib.UniGenConfig(family="flux", flux=flux, condition_types=("canny",))
    n_cn = flux.num_layers // ucfg.control.single_control_dev
    n_cn_s = flux.num_single_layers // ucfg.control.single_control_dev
    e_num = ucfg.control.moe.num_experts(1)
    sd = _build_adapter_sd(flux, ucfg, n_cn, n_cn_s, e_num)

    with tempfile.TemporaryDirectory() as td:
        by_module = {}
        for k, v in sd.items():
            mod = k.split(".")[0]
            by_module.setdefault(mod, {})[k] = torch.tensor(v)
        for i, (mod, part) in enumerate(sorted(by_module.items())):
            torch.save(part, os.path.join(td, f"{mod}_weights_{i}.bin"))
        got = tb.load_adapter_checkpoint(td, n_cn=n_cn, n_cn_single=n_cn_s,
                                         num_experts=e_num, dtype=jnp.float32,
                                         strict=True)
        np.testing.assert_allclose(
            np.asarray(got["moe"]["experts"]["hid_pool"]["w"][1]),
            sd["moe.moe_layer.experts.deepspeed_experts.1.1.1.weight"].T)
