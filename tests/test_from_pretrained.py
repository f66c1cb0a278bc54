"""End-to-end from_pretrained: build a tiny diffusers-layout checkpoint
directory on disk (safetensors + config.json per subfolder), load the full
pipeline through io/torch_bridge, and generate an image."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safetensors.numpy import save_file

from unigen_tpu import config as cfg_lib


def _write(dirpath, sd, cfg_json):
    os.makedirs(dirpath, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              os.path.join(dirpath, "model.safetensors"))
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump(cfg_json, f)


@pytest.fixture(scope="module")
def fake_ckpt(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("flux_ckpt"))
    rng = np.random.default_rng(0)
    g = lambda *s: (rng.normal(size=s) * 0.05).astype(np.float32)

    # --- transformer (tiny flux) ---
    from tests.test_torch_bridge import _flux_tiny_sd
    flux = cfg_lib.tiny_flux_config()
    _write(os.path.join(root, "transformer"), _flux_tiny_sd(flux), {
        "in_channels": flux.in_channels, "num_layers": flux.num_layers,
        "num_single_layers": flux.num_single_layers,
        "attention_head_dim": flux.attention_head_dim,
        "num_attention_heads": flux.num_attention_heads,
        "joint_attention_dim": flux.joint_attention_dim,
        "pooled_projection_dim": flux.pooled_projection_dim,
        "guidance_embeds": False,
        "axes_dims_rope": list(flux.axes_dims_rope)})

    # --- vae (tiny) ---
    from unigen_tpu.models import vae as vae_lib
    vcfg = vae_lib.tiny_vae_config(latent_channels=flux.in_channels // 4)
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

    chs, lpb = vcfg.block_out_channels, vcfg.layers_per_block
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
    _write(os.path.join(root, "vae"), sd, {
        "latent_channels": vcfg.latent_channels,
        "block_out_channels": list(vcfg.block_out_channels),
        "layers_per_block": vcfg.layers_per_block,
        "norm_num_groups": vcfg.norm_num_groups,
        "scaling_factor": vcfg.scaling_factor,
        "shift_factor": vcfg.shift_factor})

    # --- text encoders (tiny clip + t5 via transformers names) ---
    from unigen_tpu.models.clip_text import tiny_clip_config
    # CLIP hidden must equal the flux pooled projection dim (real stack: 768)
    ccfg = tiny_clip_config(hidden_size=flux.pooled_projection_dim,
                            intermediate_size=2 * flux.pooled_projection_dim)
    d, it = ccfg.hidden_size, ccfg.intermediate_size
    sd = {"text_model.embeddings.token_embedding.weight": g(ccfg.vocab_size, d),
          "text_model.embeddings.position_embedding.weight": g(ccfg.max_position_embeddings, d),
          "text_model.final_layer_norm.weight": g(d),
          "text_model.final_layer_norm.bias": g(d)}
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
    _write(os.path.join(root, "text_encoder"), sd, {
        "vocab_size": ccfg.vocab_size, "hidden_size": d,
        "intermediate_size": it, "num_hidden_layers": ccfg.num_layers,
        "num_attention_heads": ccfg.num_heads,
        "max_position_embeddings": ccfg.max_position_embeddings,
        "eos_token_id": 1,  # <|endoftext|> in the toy vocab
        "architectures": ["CLIPTextModel"]})

    from unigen_tpu.models.t5_text import tiny_t5_config
    tcfg = tiny_t5_config(d_model=flux.joint_attention_dim)
    dm, dff, inner = tcfg.d_model, tcfg.d_ff, tcfg.num_heads * tcfg.d_kv
    sd = {"shared.weight": g(tcfg.vocab_size, dm),
          "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight":
              g(tcfg.relative_attention_num_buckets, tcfg.num_heads),
          "encoder.final_layer_norm.weight": g(dm)}
    for i in range(tcfg.num_layers):
        p = f"encoder.block.{i}.layer"
        for n, (i_, o_) in {"0.SelfAttention.q": (dm, inner),
                            "0.SelfAttention.k": (dm, inner),
                            "0.SelfAttention.v": (dm, inner),
                            "0.SelfAttention.o": (inner, dm),
                            "1.DenseReluDense.wi_0": (dm, dff),
                            "1.DenseReluDense.wi_1": (dm, dff),
                            "1.DenseReluDense.wo": (dff, dm)}.items():
            sd[f"{p}.{n}.weight"] = g(o_, i_)
        sd[f"{p}.0.layer_norm.weight"] = g(dm)
        sd[f"{p}.1.layer_norm.weight"] = g(dm)
    _write(os.path.join(root, "text_encoder_2"), sd, {
        "vocab_size": tcfg.vocab_size, "d_model": dm, "d_kv": tcfg.d_kv,
        "d_ff": dff, "num_layers": tcfg.num_layers, "num_heads": tcfg.num_heads})

    os.makedirs(os.path.join(root, "scheduler"), exist_ok=True)
    with open(os.path.join(root, "scheduler", "config.json"), "w") as f:
        json.dump({"shift": 1.0, "use_dynamic_shifting": False}, f)

    # --- minimal tokenizers (CLIP BPE files + T5 WordLevel tokenizer.json) ---
    os.makedirs(os.path.join(root, "tokenizer"), exist_ok=True)
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for i, w in enumerate(["a</w>", "cat</w>", "dog</w>", "hat</w>",
                           "canny</w>", "depth</w>", "wearing</w>"]):
        vocab[w] = 2 + i
    with open(os.path.join(root, "tokenizer", "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(root, "tokenizer", "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    try:
        from tokenizers import Tokenizer, models, pre_tokenizers, processors
        from transformers import T5TokenizerFast
        wl = models.WordLevel({"<pad>": 0, "</s>": 1, "<unk>": 2, "a": 3,
                               "cat": 4, "dog": 5, "hat": 6, "canny": 7},
                              unk_token="<unk>")
        t = Tokenizer(wl)
        t.pre_tokenizer = pre_tokenizers.Whitespace()
        t.post_processor = processors.TemplateProcessing(
            single="$A </s>", special_tokens=[("</s>", 1)])
        tmp = os.path.join(root, "t5_tok.json")
        t.save(tmp)
        T5TokenizerFast(tokenizer_file=tmp, pad_token="<pad>",
                        eos_token="</s>", unk_token="<unk>"
                        ).save_pretrained(os.path.join(root, "tokenizer_2"))
    except Exception:
        pass
    return root


def test_load_flux_pipeline_and_generate(fake_ckpt):
    from unigen_tpu.pipelines.loading import load_flux_pipeline
    pipe = load_flux_pipeline(fake_ckpt, condition_types=["canny"],
                              dtype=jnp.float32)
    assert pipe.cfg.flux.num_layers == 2
    assert pipe.vae_params is not None and pipe.t5_params is not None
    # control branch warm-started from base
    np.testing.assert_allclose(
        np.asarray(pipe.params["control"]["x_embedder"]["w"]),
        np.asarray(pipe.params["base"]["x_embedder"]["w"]))

    b, h, w = 1, 16, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    flux = pipe.cfg.flux
    imgs = pipe.generate(
        prompt_embeds=jax.random.normal(ks[0], (b, 8, flux.joint_attention_dim)),
        pooled=jax.random.normal(ks[1], (b, flux.pooled_projection_dim)),
        cond_pooled=jax.random.normal(ks[2], (b, flux.pooled_projection_dim)),
        control_pixels=jax.random.normal(ks[3], (b, 3, h, w)),
        height=h, width=w, num_inference_steps=2)
    assert imgs.shape == (b, h, w, 3) and imgs.dtype == np.uint8


def test_serving_cache_roundtrip_and_validation(fake_ckpt, tmp_path):
    """serving_cache persists the quantized transformer tree: the second
    load reads the cache (bit-identical tree, same generated image) and a
    topology/policy mismatch refuses to load (io/serving_cache.py)."""
    from unigen_tpu.io import serving_cache as sc
    from unigen_tpu.pipelines.loading import load_flux_pipeline
    cache = str(tmp_path / "scache")

    pipe1 = load_flux_pipeline(fake_ckpt, condition_types=["canny"],
                               dtype=jnp.float32, quantize="w8a8",
                               serving_cache=cache)
    assert sc.has_serving_tree(cache)
    pipe2 = load_flux_pipeline(fake_ckpt, condition_types=["canny"],
                               dtype=jnp.float32, quantize="w8a8",
                               serving_cache=cache)
    for a, b in zip(jax.tree.leaves(pipe1.params),
                    jax.tree.leaves(pipe2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    b_, h, w = 1, 16, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    flux = pipe1.cfg.flux
    kw = dict(
        prompt_embeds=jax.random.normal(ks[0], (b_, 8, flux.joint_attention_dim)),
        pooled=jax.random.normal(ks[1], (b_, flux.pooled_projection_dim)),
        cond_pooled=jax.random.normal(ks[2], (b_, flux.pooled_projection_dim)),
        control_pixels=jax.random.normal(ks[3], (b_, 3, h, w)),
        height=h, width=w, num_inference_steps=2)
    np.testing.assert_array_equal(pipe1.generate(**kw), pipe2.generate(**kw))

    # policy mismatch refuses
    with pytest.raises(ValueError):
        load_flux_pipeline(fake_ckpt, condition_types=["canny"],
                           dtype=jnp.float32, quantize="w4a8",
                           serving_cache=cache)
    # topology mismatch refuses (different condition set changes experts)
    with pytest.raises(ValueError):
        load_flux_pipeline(fake_ckpt, condition_types=["canny", "depth"],
                           dtype=jnp.float32, quantize="w8a8",
                           serving_cache=cache)


def test_load_sd3_pipeline_and_generate(tmp_path):
    """SD3 from_pretrained: tiny SD3 transformer + VAE layout -> pipeline."""
    from tests.test_sd3_bridge_pipeline import _sd3_state_dict
    from unigen_tpu.models import vae as vae_lib
    rng = np.random.default_rng(1)
    g = lambda *s: (rng.normal(size=s) * 0.05).astype(np.float32)

    sd3 = cfg_lib.tiny_sd3_config()
    root = str(tmp_path)
    _write(os.path.join(root, "transformer"), _sd3_state_dict(sd3), {
        "sample_size": sd3.sample_size, "patch_size": sd3.patch_size,
        "in_channels": sd3.in_channels, "num_layers": sd3.num_layers,
        "attention_head_dim": sd3.attention_head_dim,
        "num_attention_heads": sd3.num_attention_heads,
        "joint_attention_dim": sd3.joint_attention_dim,
        "caption_projection_dim": sd3.caption_projection_dim,
        "pooled_projection_dim": sd3.pooled_projection_dim,
        "out_channels": sd3.out_channels,
        "pos_embed_max_size": sd3.pos_embed_max_size,
        "dual_attention_layers": list(sd3.dual_attention_layers),
        "qk_norm": sd3.qk_norm})

    # reuse the flux fixture's vae builder inline (tiny 2-block)
    vcfg = vae_lib.tiny_vae_config(latent_channels=sd3.in_channels)
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

    chs, lpb = vcfg.block_out_channels, vcfg.layers_per_block
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
    _write(os.path.join(root, "vae"), sd, {
        "latent_channels": vcfg.latent_channels,
        "block_out_channels": list(vcfg.block_out_channels),
        "layers_per_block": vcfg.layers_per_block,
        "norm_num_groups": vcfg.norm_num_groups,
        "scaling_factor": 1.0, "shift_factor": 0.0})

    from unigen_tpu.pipelines.loading import load_sd3_pipeline
    pipe = load_sd3_pipeline(root, condition_types=["depth"])
    b, h, w = 1, 16, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    imgs = pipe.generate(
        prompt_embeds=jax.random.normal(ks[0], (b, 6, sd3.joint_attention_dim)),
        pooled=jax.random.normal(ks[1], (b, sd3.pooled_projection_dim)),
        cond_pooled=jax.random.normal(ks[2], (b, sd3.pooled_projection_dim)),
        control_pixels=jax.random.normal(ks[3], (b, 3, h, w)),
        height=h, width=w, num_inference_steps=2, guidance_scale=3.0)
    assert imgs.shape == (b, h, w, 3) and imgs.dtype == np.uint8


def test_full_text_to_image_call(fake_ckpt):
    """The complete reference-style call: pipe(prompt, condition_prompt,
    control_image) — tokenize -> CLIP/T5 encode -> VAE encode -> denoise ->
    VAE decode, end to end from a disk checkpoint."""
    from unigen_tpu.pipelines.loading import load_flux_pipeline
    pipe = load_flux_pipeline(fake_ckpt, condition_types=["canny"],
                              dtype=jnp.float32)
    assert pipe.tokenizer is not None and pipe.tokenizer_2 is not None
    h = w = 16
    rng = np.random.default_rng(3)
    control = (rng.normal(size=(1, 3, h, w)) * 0.5).astype(np.float32)
    imgs = pipe(prompt="a cat wearing a hat", condition_prompt="canny",
                control_image=control, height=h, width=w,
                num_inference_steps=2, max_sequence_length=8)
    assert imgs.shape == (1, h, w, 3) and imgs.dtype == np.uint8


def test_load_flux_pipeline_quantized(fake_ckpt):
    """quantize='w4a8' wires the streaming serving quantizer into loading;
    at tiny dims the policy is a no-op (min_dim gate) but the path must
    still produce a working pipeline."""
    from unigen_tpu.pipelines.loading import load_flux_pipeline
    pipe = load_flux_pipeline(fake_ckpt, condition_types=["canny"],
                              dtype=jnp.float32, quantize="w4a8")
    b, h, w = 1, 16, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    flux = pipe.cfg.flux
    imgs = pipe.generate(
        prompt_embeds=jax.random.normal(ks[0], (b, 8, flux.joint_attention_dim)),
        pooled=jax.random.normal(ks[1], (b, flux.pooled_projection_dim)),
        cond_pooled=jax.random.normal(ks[2], (b, flux.pooled_projection_dim)),
        control_pixels=jax.random.normal(ks[3], (b, 3, h, w)),
        height=h, width=w, num_inference_steps=2)
    assert imgs.shape == (b, h, w, 3) and imgs.dtype == np.uint8


def test_validate_real_ckpt_harness(fake_ckpt):
    """The real-checkpoint validation harness executes end-to-end against a
    (tiny, fake) diffusers-layout dir: strict load + fidelity stage; the
    diffusers-golden stage is skipped (no diffusers in this image)."""
    import json
    import subprocess
    import sys as _sys
    out = os.path.join(fake_ckpt, "validate.json")
    r = subprocess.run(
        [_sys.executable, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "validate_real_ckpt.py"),
         "--ckpt", fake_ckpt, "--skip-diffusers", "--res", "64",
         "--out", out],
        capture_output=True, text=True, timeout=1200,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    with open(out) as f:
        rep = json.load(f)
    assert rep["strict_load"]["transformer"].startswith("ok")
    assert rep["ssim_gate"]["pass"], rep


def test_load_sana_pipeline_and_generate(tmp_path):
    """load_sana_pipeline assembles the full SANA stack from an HF-layout
    dir: transformer bridge + warm-started control, Gemma-2 text encoder,
    native DC-AE codec; generate() runs end-to-end. Also pins the w8a8
    quantize knob on the loaded tree."""
    import jax
    import jax.numpy as jnp

    from tests.test_sd3_bridge_pipeline import _sana_state_dict
    from unigen_tpu import config as cfg_lib
    from unigen_tpu.models import dcae
    from unigen_tpu.pipelines.loading import load_sana_pipeline

    root = str(tmp_path / "sana_root")
    sana = cfg_lib.tiny_sana_config()
    _write(os.path.join(root, "transformer"), _sana_state_dict(sana), {
        "in_channels": sana.in_channels, "out_channels": sana.out_channels,
        "num_layers": sana.num_layers,
        "attention_head_dim": sana.attention_head_dim,
        "num_attention_heads": sana.num_attention_heads,
        "num_cross_attention_heads": sana.num_cross_attention_heads,
        "cross_attention_head_dim": sana.cross_attention_head_dim,
        "cross_attention_dim": sana.cross_attention_dim,
        "caption_channels": sana.caption_channels,
        "mlp_ratio": sana.mlp_ratio, "patch_size": sana.patch_size,
        "sample_size": sana.sample_size,
        "pooled_projection_dim": sana.pooled_projection_dim})

    # native DC-AE (the framework format released dc-ae weights bridge into)
    ae_cfg = dcae.tiny_dcae_config(latent_channels=sana.in_channels)
    ae_params = dcae.init_dcae_params(jax.random.PRNGKey(3), ae_cfg)
    dcae.save_dcae_native(os.path.join(root, "vae"), ae_params, ae_cfg)

    # Gemma-2 text encoder via transformers (bridge is golden-tested)
    import torch
    from transformers import Gemma2Config, Gemma2Model
    from unigen_tpu.models.gemma_text import tiny_gemma_config
    gcfg = tiny_gemma_config()
    hf_cfg = Gemma2Config(
        vocab_size=gcfg.vocab_size, hidden_size=gcfg.hidden_size,
        intermediate_size=gcfg.intermediate_size,
        num_hidden_layers=gcfg.num_layers,
        num_attention_heads=gcfg.num_heads,
        num_key_value_heads=gcfg.num_kv_heads, head_dim=gcfg.head_dim,
        query_pre_attn_scalar=gcfg.query_pre_attn_scalar,
        sliding_window=gcfg.sliding_window, attn_implementation="eager")
    torch.manual_seed(0)
    sd = {k: v.numpy() for k, v in Gemma2Model(hf_cfg).state_dict().items()}
    _write(os.path.join(root, "text_encoder"), sd, {
        "vocab_size": gcfg.vocab_size, "hidden_size": gcfg.hidden_size,
        "intermediate_size": gcfg.intermediate_size,
        "num_hidden_layers": gcfg.num_layers,
        "num_attention_heads": gcfg.num_heads,
        "num_key_value_heads": gcfg.num_kv_heads, "head_dim": gcfg.head_dim,
        "query_pre_attn_scalar": gcfg.query_pre_attn_scalar,
        "sliding_window": gcfg.sliding_window})

    pipe = load_sana_pipeline(root, condition_types=["canny"])
    assert pipe.gemma_params is not None
    assert pipe.ae_downscale == ae_cfg.downscale
    # DC-AE native round-trip: loaded codec == saved codec leaf-for-leaf
    loaded, loaded_cfg = dcae.load_dcae_native(os.path.join(root, "vae"))
    assert loaded_cfg == ae_cfg
    for a, b in zip(jax.tree_util.tree_leaves(loaded),
                    jax.tree_util.tree_leaves(ae_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    b, t, h = 1, 5, 4 * ae_cfg.downscale
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    imgs = pipe.generate(
        prompt_embeds=jax.random.normal(ks[0], (b, t, sana.caption_channels)),
        prompt_mask=jnp.ones((b, t), jnp.int32),
        pooled=jax.random.normal(ks[1], (b, sana.pooled_projection_dim)),
        cond_pooled=jax.random.normal(ks[2], (b, sana.pooled_projection_dim)),
        control_pixels=np.zeros((b, 3, h, h), np.float32),
        height=h, width=h, num_inference_steps=2)
    assert imgs.shape == (b, h, h, 3) and imgs.dtype == np.uint8

    # quantize knob on the loaded tree (tiny layers sit below the int8
    # min_dim=512 eligibility gate, so this pins only that the streaming
    # walk + generate still run through the loader path)
    pipe_q = load_sana_pipeline(root, condition_types=["canny"],
                                quantize="w8a8")
    imgs_q = pipe_q.generate(
        prompt_embeds=jax.random.normal(ks[0], (b, t, sana.caption_channels)),
        prompt_mask=jnp.ones((b, t), jnp.int32),
        pooled=jax.random.normal(ks[1], (b, sana.pooled_projection_dim)),
        cond_pooled=jax.random.normal(ks[2], (b, sana.pooled_projection_dim)),
        control_pixels=np.zeros((b, 3, h, h), np.float32),
        height=h, width=h, num_inference_steps=2)
    assert imgs_q.shape == (b, h, h, 3)


def test_load_sd3_pipeline_text_encoders(tmp_path):
    """The SD3 loader picks up the triple-encoder layout (CLIP-L + CLIP-G;
    T5 optional) so pipe(prompt=...) has a real text path."""
    import jax

    from tests.test_sd3_bridge_pipeline import _sd3_state_dict
    from unigen_tpu import config as cfg_lib
    from unigen_tpu.models import vae as vae_lib
    from unigen_tpu.models.clip_text import tiny_clip_config
    from unigen_tpu.pipelines.loading import load_sd3_pipeline

    root = str(tmp_path / "sd3_root")
    sd3 = cfg_lib.tiny_sd3_config()
    _write(os.path.join(root, "transformer"), _sd3_state_dict(sd3), {
        "sample_size": sd3.sample_size, "patch_size": sd3.patch_size,
        "in_channels": sd3.in_channels, "num_layers": sd3.num_layers,
        "attention_head_dim": sd3.attention_head_dim,
        "num_attention_heads": sd3.num_attention_heads,
        "joint_attention_dim": sd3.joint_attention_dim,
        "caption_projection_dim": sd3.caption_projection_dim,
        "pooled_projection_dim": sd3.pooled_projection_dim,
        "out_channels": sd3.out_channels,
        "pos_embed_max_size": sd3.pos_embed_max_size,
        "dual_attention_layers": list(sd3.dual_attention_layers),
        "qk_norm": sd3.qk_norm})

    rng = np.random.default_rng(0)
    g = lambda *s: (0.02 * rng.standard_normal(s)).astype(np.float32)

    def clip_sd(d, it, n_layers, vocab, maxp):
        sd = {"text_model.embeddings.token_embedding.weight": g(vocab, d),
              "text_model.embeddings.position_embedding.weight": g(maxp, d),
              "text_model.final_layer_norm.weight": g(d),
              "text_model.final_layer_norm.bias": g(d)}
        for i in range(n_layers):
            p = f"text_model.encoder.layers.{i}"
            for n, (i_, o_) in {
                    "self_attn.q_proj": (d, d), "self_attn.k_proj": (d, d),
                    "self_attn.v_proj": (d, d), "self_attn.out_proj": (d, d),
                    "mlp.fc1": (d, it), "mlp.fc2": (it, d)}.items():
                sd[f"{p}.{n}.weight"] = g(o_, i_)
                sd[f"{p}.{n}.bias"] = g(o_)
            for n in ["layer_norm1", "layer_norm2"]:
                sd[f"{p}.{n}.weight"] = g(d)
                sd[f"{p}.{n}.bias"] = g(d)
        return sd

    # pooled = [l | g] must equal the transformer's pooled_projection_dim
    dl = sd3.pooled_projection_dim // 2
    ccfg = tiny_clip_config(hidden_size=dl, intermediate_size=2 * dl)
    for sub in ("text_encoder", "text_encoder_2"):
        _write(os.path.join(root, sub),
               clip_sd(dl, 2 * dl, ccfg.num_layers, ccfg.vocab_size,
                       ccfg.max_position_embeddings), {
            "vocab_size": ccfg.vocab_size, "hidden_size": dl,
            "intermediate_size": 2 * dl,
            "num_hidden_layers": ccfg.num_layers,
            "num_attention_heads": ccfg.num_heads,
            "max_position_embeddings": ccfg.max_position_embeddings,
            "eos_token_id": 1, "architectures": ["CLIPTextModel"]})

    # tiny vae (same builder as the sd3 generate test)
    vcfg = vae_lib.tiny_vae_config(latent_channels=sd3.in_channels)

    def cv(name, ci, co, k=3):
        return {f"{name}.weight": g(co, ci, k, k), f"{name}.bias": g(co)}

    def gn(name, c):
        return {f"{name}.weight": g(c), f"{name}.bias": g(c)}

    def res(p, ci, co):
        sd = {}
        sd.update(gn(f"{p}.norm1", ci)); sd.update(cv(f"{p}.conv1", ci, co))
        sd.update(gn(f"{p}.norm2", co)); sd.update(cv(f"{p}.conv2", co, co))
        if ci != co:
            sd.update(cv(f"{p}.conv_shortcut", ci, co, k=1))
        return sd

    def at(p, c):
        sd = gn(f"{p}.group_norm", c)
        for n in ["to_q", "to_k", "to_v", "to_out.0"]:
            sd[f"{p}.{n}.weight"] = g(c, c)
            sd[f"{p}.{n}.bias"] = g(c)
        return sd

    bo = vcfg.block_out_channels
    lc = vcfg.latent_channels
    sd = {}
    sd.update(cv("encoder.conv_in", 3, bo[0]))
    for i, c in enumerate(bo):
        ci = bo[max(i - 1, 0)]
        for j in range(vcfg.layers_per_block):
            sd.update(res(f"encoder.down_blocks.{i}.resnets.{j}",
                          ci if j == 0 else c, c))
        if i < len(bo) - 1:
            sd.update(cv(f"encoder.down_blocks.{i}.downsamplers.0.conv",
                         c, c))
    c = bo[-1]
    sd.update(res("encoder.mid_block.resnets.0", c, c))
    sd.update(at("encoder.mid_block.attentions.0", c))
    sd.update(res("encoder.mid_block.resnets.1", c, c))
    sd.update(gn("encoder.conv_norm_out", c))
    sd.update(cv("encoder.conv_out", c, 2 * lc))
    sd.update(cv("decoder.conv_in", lc, c))
    sd.update(res("decoder.mid_block.resnets.0", c, c))
    sd.update(at("decoder.mid_block.attentions.0", c))
    sd.update(res("decoder.mid_block.resnets.1", c, c))
    rbo = list(reversed(bo))
    for i, cc in enumerate(rbo):
        ci = rbo[max(i - 1, 0)]
        for j in range(vcfg.layers_per_block + 1):
            sd.update(res(f"decoder.up_blocks.{i}.resnets.{j}",
                          ci if j == 0 else cc, cc))
        if i < len(rbo) - 1:
            sd.update(cv(f"decoder.up_blocks.{i}.upsamplers.0.conv", cc, cc))
    sd.update(gn("decoder.conv_norm_out", bo[0]))
    sd.update(cv("decoder.conv_out", bo[0], 3))
    _write(os.path.join(root, "vae"), sd, {
        "latent_channels": lc, "block_out_channels": list(bo),
        "layers_per_block": vcfg.layers_per_block,
        "norm_num_groups": vcfg.norm_num_groups,
        "scaling_factor": vcfg.scaling_factor,
        "shift_factor": vcfg.shift_factor})

    pipe = load_sd3_pipeline(root, condition_types=["depth"])
    assert pipe.text_encoders is not None
    assert pipe.text_encoders["t5"] is None          # no text_encoder_3 dir
    pl, pl_cfg, _ = pipe.text_encoders["clip_l"]
    assert pl_cfg.hidden_size == dl and pl is not None
    pg, pg_cfg, _ = pipe.text_encoders["clip_g"]
    assert pg_cfg.hidden_size == dl and pg is not None


def make_fake_vae_sd(vcfg, g):
    """Reusable tiny-VAE diffusers state dict (same layout the inline
    builders above construct) — for fixtures in other test files."""
    def cv(name, ci, co, k=3):
        return {f"{name}.weight": g(co, ci, k, k), f"{name}.bias": g(co)}

    def gn(name, c):
        return {f"{name}.weight": g(c), f"{name}.bias": g(c)}

    def res(p, ci, co):
        sd = {}
        sd.update(gn(f"{p}.norm1", ci)); sd.update(cv(f"{p}.conv1", ci, co))
        sd.update(gn(f"{p}.norm2", co)); sd.update(cv(f"{p}.conv2", co, co))
        if ci != co:
            sd.update(cv(f"{p}.conv_shortcut", ci, co, k=1))
        return sd

    def at(p, c):
        sd = gn(f"{p}.group_norm", c)
        for n in ["to_q", "to_k", "to_v", "to_out.0"]:
            sd[f"{p}.{n}.weight"] = g(c, c)
            sd[f"{p}.{n}.bias"] = g(c)
        return sd

    bo, lc = vcfg.block_out_channels, vcfg.latent_channels
    sd = {}
    sd.update(cv("encoder.conv_in", 3, bo[0]))
    for i, c in enumerate(bo):
        ci = bo[max(i - 1, 0)]
        for j in range(vcfg.layers_per_block):
            sd.update(res(f"encoder.down_blocks.{i}.resnets.{j}",
                          ci if j == 0 else c, c))
        if i < len(bo) - 1:
            sd.update(cv(f"encoder.down_blocks.{i}.downsamplers.0.conv",
                         c, c))
    c = bo[-1]
    sd.update(res("encoder.mid_block.resnets.0", c, c))
    sd.update(at("encoder.mid_block.attentions.0", c))
    sd.update(res("encoder.mid_block.resnets.1", c, c))
    sd.update(gn("encoder.conv_norm_out", c))
    sd.update(cv("encoder.conv_out", c, 2 * lc))
    sd.update(cv("decoder.conv_in", lc, c))
    sd.update(res("decoder.mid_block.resnets.0", c, c))
    sd.update(at("decoder.mid_block.attentions.0", c))
    sd.update(res("decoder.mid_block.resnets.1", c, c))
    rbo = list(reversed(bo))
    for i, cc in enumerate(rbo):
        ci = rbo[max(i - 1, 0)]
        for j in range(vcfg.layers_per_block + 1):
            sd.update(res(f"decoder.up_blocks.{i}.resnets.{j}",
                          ci if j == 0 else cc, cc))
        if i < len(rbo) - 1:
            sd.update(cv(f"decoder.up_blocks.{i}.upsamplers.0.conv", cc, cc))
    sd.update(gn("decoder.conv_norm_out", bo[0]))
    sd.update(cv("decoder.conv_out", bo[0], 3))
    return sd


def make_fake_sd3_root(root):
    """Full fake SD3 checkpoint root: transformer + vae + dual CLIP
    encoders + CLIP tokenizers — enough for load_sd3_pipeline with a real
    text path (serve.py end-to-end tests)."""
    from tests.test_sd3_bridge_pipeline import _sd3_state_dict
    from unigen_tpu.models import vae as vae_lib
    from unigen_tpu.models.clip_text import tiny_clip_config
    rng = np.random.default_rng(3)
    g = lambda *s: (0.02 * rng.standard_normal(s)).astype(np.float32)

    sd3 = cfg_lib.tiny_sd3_config()
    _write(os.path.join(root, "transformer"), _sd3_state_dict(sd3), {
        "sample_size": sd3.sample_size, "patch_size": sd3.patch_size,
        "in_channels": sd3.in_channels, "num_layers": sd3.num_layers,
        "attention_head_dim": sd3.attention_head_dim,
        "num_attention_heads": sd3.num_attention_heads,
        "joint_attention_dim": sd3.joint_attention_dim,
        "caption_projection_dim": sd3.caption_projection_dim,
        "pooled_projection_dim": sd3.pooled_projection_dim,
        "out_channels": sd3.out_channels,
        "pos_embed_max_size": sd3.pos_embed_max_size,
        "dual_attention_layers": list(sd3.dual_attention_layers),
        "qk_norm": sd3.qk_norm})

    vcfg = vae_lib.tiny_vae_config(latent_channels=sd3.in_channels)
    _write(os.path.join(root, "vae"), make_fake_vae_sd(vcfg, g), {
        "latent_channels": vcfg.latent_channels,
        "block_out_channels": list(vcfg.block_out_channels),
        "layers_per_block": vcfg.layers_per_block,
        "norm_num_groups": vcfg.norm_num_groups,
        "scaling_factor": 1.0, "shift_factor": 0.0})

    def clip_sd(d, it, n_layers, vocab, maxp):
        sd = {"text_model.embeddings.token_embedding.weight": g(vocab, d),
              "text_model.embeddings.position_embedding.weight": g(maxp, d),
              "text_model.final_layer_norm.weight": g(d),
              "text_model.final_layer_norm.bias": g(d)}
        for i in range(n_layers):
            p = f"text_model.encoder.layers.{i}"
            for n, (i_, o_) in {
                    "self_attn.q_proj": (d, d), "self_attn.k_proj": (d, d),
                    "self_attn.v_proj": (d, d),
                    "self_attn.out_proj": (d, d),
                    "mlp.fc1": (d, it), "mlp.fc2": (it, d)}.items():
                sd[f"{p}.{n}.weight"] = g(o_, i_)
                sd[f"{p}.{n}.bias"] = g(o_)
            for n in ["layer_norm1", "layer_norm2"]:
                sd[f"{p}.{n}.weight"] = g(d)
                sd[f"{p}.{n}.bias"] = g(d)
        return sd

    dl = sd3.pooled_projection_dim // 2
    # the CLIP tokenizer path pads to its 77-token model max
    ccfg = tiny_clip_config(hidden_size=dl, intermediate_size=2 * dl,
                            max_position_embeddings=77)
    for sub in ("text_encoder", "text_encoder_2"):
        _write(os.path.join(root, sub),
               clip_sd(dl, 2 * dl, ccfg.num_layers, ccfg.vocab_size,
                       ccfg.max_position_embeddings), {
            "vocab_size": ccfg.vocab_size, "hidden_size": dl,
            "intermediate_size": 2 * dl,
            "num_hidden_layers": ccfg.num_layers,
            "num_attention_heads": ccfg.num_heads,
            "max_position_embeddings": ccfg.max_position_embeddings,
            "eos_token_id": 1, "architectures": ["CLIPTextModel"]})

    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for i, w in enumerate(["a</w>", "cat</w>", "dog</w>", "hat</w>",
                           "canny</w>", "depth</w>", "wearing</w>"]):
        vocab[w] = 2 + i
    for tok_sub in ("tokenizer", "tokenizer_2"):
        os.makedirs(os.path.join(root, tok_sub), exist_ok=True)
        with open(os.path.join(root, tok_sub, "vocab.json"), "w") as f:
            json.dump(vocab, f)
        with open(os.path.join(root, tok_sub, "merges.txt"), "w") as f:
            f.write("#version: 0.2\n")

    os.makedirs(os.path.join(root, "scheduler"), exist_ok=True)
    with open(os.path.join(root, "scheduler", "config.json"), "w") as f:
        json.dump({"shift": 3.0, "use_dynamic_shifting": False}, f)
    return root
