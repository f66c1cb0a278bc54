"""LoRA expert fold-in + observability utilities."""

import logging

import jax
import jax.numpy as jnp
import numpy as np

from unigen_tpu import config as cfg_lib, observability as obs
from unigen_tpu.models import lora


def _tiny_params():
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    flux = cfg_lib.tiny_flux_config()
    cfg = cfg_lib.UniGenConfig(family="flux", flux=flux, condition_types=("canny",))
    return cfg, init_unigen_flux_params(jax.random.PRNGKey(0), cfg)


def test_lora_zero_init_is_identity():
    cfg, params = _tiny_params()
    adapters = lora.init_lora_adapters(
        jax.random.PRNGKey(1), params["control"],
        targets=["attn.to_q", "attn.to_v", "ff.fc1"], rank=2,
        adapter_names=["canny", "depth"])
    folded = lora.fold_adapter(params["control"], adapters, "canny")
    # B is zero-init -> folding changes nothing
    for a, b in zip(jax.tree.leaves(params["control"]), jax.tree.leaves(folded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lora_fold_math_and_switching():
    cfg, params = _tiny_params()
    adapters = lora.init_lora_adapters(
        jax.random.PRNGKey(1), params["control"], targets=["attn.to_q"],
        rank=2, adapter_names=["canny", "depth"])
    # give 'depth' a non-zero delta
    key = next(iter(adapters["depth"]))
    ab = adapters["depth"][key]
    adapters["depth"][key] = {"a": ab["a"],
                              "b": jnp.ones_like(ab["b"]) * 0.1}
    folded = lora.fold_condition_experts(params["control"], adapters, "depth",
                                         scale=2.0)
    w0 = params["control"]["double_blocks"]["attn"]["to_q"]["w"]
    w1 = folded["double_blocks"]["attn"]["to_q"]["w"]
    expect = w0 + 2.0 * jnp.einsum("...ir,...ro->...io", ab["a"],
                                   jnp.ones_like(ab["b"]) * 0.1)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(expect), rtol=1e-5)
    # canny stays identity
    folded_c = lora.fold_condition_experts(params["control"], adapters, "canny")
    np.testing.assert_array_equal(
        np.asarray(folded_c["double_blocks"]["attn"]["to_q"]["w"]),
        np.asarray(w0))


def test_enable_lora_context():
    cfg, params = _tiny_params()
    adapters = lora.init_lora_adapters(jax.random.PRNGKey(1), params["control"],
                                       ["attn.to_q"], 2, ["canny"])
    with lora.enable_lora(params["control"], adapters, ["canny"]) as folded:
        assert folded is not None
    flat = lora.merge_for_export(adapters, "canny")
    assert any(k.endswith(".lora_a") for k in flat)


def test_expert_histogram():
    h = obs.expert_histogram(jnp.array([10, 10, 10, 10]))
    assert h["moe/imbalance"] == 1.0 and h["moe/empty_experts"] == 0
    h = obs.expert_histogram(jnp.array([40, 0, 0, 0]))
    assert h["moe/imbalance"] == 4.0 and h["moe/empty_experts"] == 3


def test_param_report_and_logging(tmp_path):
    logger = obs.setup_logging(str(tmp_path))
    stats = obs.param_report({"w": jnp.ones((10, 10))}, "test")
    assert stats["params"] == 100
    obs.log_step_metrics(logger, 3, {"loss": jnp.asarray(1.5),
                                     "expert_counts": jnp.array([5, 5])})


def test_replica_consistency_single_device():
    x = jnp.ones((4, 4))
    obs.assert_replica_consistency(x)  # single shard -> trivially consistent


# ------------------------------------------------------------ round 3: end-to-end
# reference-format load path (hook.py:48-76), quantized-tree folding, and the
# LoraSwitcher runtime switching that pipelines/flux wires into __call__.

def _rooted_params():
    cfg, params = _tiny_params()
    return cfg, params


def _nonzero_adapters(params, names=("canny", "depth"), rank=2,
                      targets=("attn.to_q", "ff.fc1")):
    adapters = lora.init_lora_adapters(
        jax.random.PRNGKey(7), params, targets=list(targets), rank=rank,
        adapter_names=list(names))
    # non-zero deltas (b is zero-init by design)
    for name in names:
        for path, ab in adapters[name].items():
            key = jax.random.PRNGKey(hash((name, path)) % (2**31))
            adapters[name][path] = {
                "a": ab["a"],
                "b": 0.05 * jax.random.normal(key, ab["b"].shape, ab["b"].dtype)}
    return adapters


def test_lora_reference_roundtrip(tmp_path):
    """export (reference per-adapter layout) -> load -> identical factors and
    identical fold result."""
    from unigen_tpu.io import torch_bridge as tb
    cfg, params = _rooted_params()
    adapters = _nonzero_adapters(params)
    written = tb.export_lora_adapters_reference(adapters, str(tmp_path))
    assert all(p.endswith("pytorch_lora_weights.safetensors") for p in written)
    loaded = tb.load_lora_adapters(str(tmp_path), params)
    assert sorted(loaded) == sorted(adapters)
    for name in adapters:
        assert sorted(loaded[name]) == sorted(adapters[name])
        for path in adapters[name]:
            np.testing.assert_allclose(
                np.asarray(loaded[name][path]["a"]),
                np.asarray(adapters[name][path]["a"]), atol=1e-6)
            np.testing.assert_allclose(
                np.asarray(loaded[name][path]["b"]),
                np.asarray(adapters[name][path]["b"]), atol=1e-6)
    # fold equality through the loaded copy
    f1 = lora.fold_adapter(params, adapters, "depth")
    f2 = lora.fold_adapter(params, loaded, "depth")
    for a, b in zip(jax.tree.leaves(f1), jax.tree.leaves(f2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_lora_quantized_fold_matches_requantize():
    """Folding into a quantized tree == quantizing the bf16-folded weights."""
    from unigen_tpu.ops import quant
    cfg, params = _rooted_params()
    adapters = _nonzero_adapters(params)
    qtree = quant.quantize_tree(params, min_dim=8)
    folded_q = lora.fold_adapter(qtree, adapters, "canny")
    folded_then_q = quant.quantize_tree(
        lora.fold_adapter(params, adapters, "canny"), min_dim=8)
    leaf_q = folded_q["control"]["double_blocks"]["attn"]["to_q"]
    leaf_ref = folded_then_q["control"]["double_blocks"]["attn"]["to_q"]
    assert "w_q" in leaf_q, "tiny dims unexpectedly skipped quantization"
    # the quantized-tree fold starts from dequant(Q) = W +- scale/2, so its
    # refit scale differs from the bf16-fold scale by up to one quant step
    np.testing.assert_allclose(np.asarray(leaf_q["w_scale"]),
                               np.asarray(leaf_ref["w_scale"]), rtol=2e-2)
    # int codes may differ by 1 at rounding boundaries; compare dequantized
    deq = np.asarray(leaf_q["w_q"], np.float32) * np.asarray(leaf_q["w_scale"])
    deq_ref = (np.asarray(leaf_ref["w_q"], np.float32)
               * np.asarray(leaf_ref["w_scale"]))
    np.testing.assert_allclose(deq, deq_ref, atol=2e-2)


def test_lora_switcher_exact_restore():
    """x -> y -> disable cycles restore pristine weights EXACTLY (host
    pristine copies; no fold/unfold drift), for fp and quantized trees."""
    from unigen_tpu.ops import quant
    cfg, params = _rooted_params()
    adapters = _nonzero_adapters(params)
    for tree in (params, quant.quantize_tree(params, min_dim=8)):
        sw = lora.LoraSwitcher(adapters, tree)
        orig = {p: {k: np.asarray(v) for k, v in lora.tree_get(tree, p).items()}
                for p in sw._pristine}
        t1 = sw.switch(tree, "canny")
        t2 = sw.switch(t1, "depth")
        t3 = sw.switch(t2, None)
        changed = any(
            not np.array_equal(
                np.asarray(next(iter(orig[p].values()))),
                np.asarray(next(iter(
                    {k: v for k, v in lora.tree_get(t1, p).items()}.values()))))
            for p in sw._pristine)
        assert changed, "switch('canny') changed nothing"
        for p in sw._pristine:
            node = lora.tree_get(t3, p)
            for k, v in orig[p].items():
                np.testing.assert_array_equal(np.asarray(node[k]), v,
                                              err_msg=f"{p}.{k} not restored")


def test_pipeline_condition_switching():
    """__call__-level auto-switching: per-condition adapters produce
    different outputs; repeated same-condition calls reuse the fold."""
    import jax.numpy as jnp
    from unigen_tpu.models import vae as vae_lib
    from unigen_tpu.pipelines.flux import UniGenFluxPipeline
    cfg, params = _rooted_params()
    adapters = _nonzero_adapters(params, targets=("attn.to_q",))
    vae_cfg = vae_lib.VAEConfig(latent_channels=4, block_out_channels=(8, 16),
                                layers_per_block=1, norm_num_groups=4)
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), vae_cfg)
    pipe = UniGenFluxPipeline(cfg=cfg, params=params, vae_cfg=vae_cfg,
                              vae_params=vae_params, dtype=jnp.float32)
    pipe.load_lora(adapters)
    b = 1
    embeds = jax.random.normal(jax.random.PRNGKey(2), (b, 8, cfg.flux.joint_attention_dim), jnp.float32)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (b, cfg.flux.pooled_projection_dim), jnp.float32)
    ctrl = jnp.asarray(np.random.RandomState(0).rand(b, 3, 32, 32) * 2 - 1, jnp.float32)

    def gen():
        return pipe.generate(prompt_embeds=embeds, pooled=pooled,
                             cond_pooled=pooled, control_pixels=ctrl,
                             height=32, width=32, num_inference_steps=2)

    pipe.set_condition_adapter(None)
    base_img = gen()
    pipe.set_condition_adapter("canny")
    canny_img = gen()
    pipe.set_condition_adapter("depth")
    depth_img = gen()
    assert not np.array_equal(base_img, canny_img)
    assert not np.array_equal(canny_img, depth_img)
    # back to disabled == original run exactly (pristine restore + same program)
    pipe.set_condition_adapter(None)
    np.testing.assert_array_equal(gen(), base_img)
    # auto-switch path: _auto_switch picks the adapter from the condition type
    pipe._auto_switch("canny")
    assert pipe._lora.active == (("canny", 1.0),)


def test_lora_sd3_and_sana_mapping(tmp_path):
    """Reference-format LoRA round-trips for the SD3 control stack
    (control_transformer_blocks -> control.joint_blocks) and SANA blocks —
    ambiguous torch stack names resolve against the target tree."""
    from unigen_tpu import config as C
    from unigen_tpu.io import torch_bridge as tb
    from unigen_tpu.models.sana import init_sana_unigen_params
    from unigen_tpu.models.unigen_sd3 import init_unigen_sd3_params

    # --- SD3 control joint blocks
    sd3cfg = C.UniGenConfig(family="sd3", sd3=C.tiny_sd3_config(),
                            control=C.ControlConfig(use_rope=False),
                            condition_types=("depth",))
    p_sd3 = init_unigen_sd3_params(jax.random.PRNGKey(0), sd3cfg)
    ad = lora.init_lora_adapters(jax.random.PRNGKey(1), p_sd3,
                                 targets=["joint_blocks.attn.to_q"],
                                 rank=2, adapter_names=["depth"])
    (path,) = ad["depth"].keys()
    assert path == "control.joint_blocks.attn.to_q"
    ad["depth"][path]["b"] = jnp.ones_like(ad["depth"][path]["b"]) * 0.1
    tb.export_lora_adapters_reference(ad, str(tmp_path / "sd3"))
    loaded = tb.load_lora_adapters(str(tmp_path / "sd3"), p_sd3)
    np.testing.assert_allclose(np.asarray(loaded["depth"][path]["a"]),
                               np.asarray(ad["depth"][path]["a"]), atol=1e-6)
    folded = lora.fold_adapter(p_sd3, loaded, "depth")
    assert not np.array_equal(
        np.asarray(folded["control"]["joint_blocks"]["attn"]["to_q"]["w"]),
        np.asarray(p_sd3["control"]["joint_blocks"]["attn"]["to_q"]["w"]))

    # --- SANA base blocks (same torch name as flux double blocks)
    sanacfg = C.UniGenConfig(family="sana", sana=C.tiny_sana_config(),
                             condition_types=("canny",))
    p_sana = init_sana_unigen_params(jax.random.PRNGKey(0), sanacfg)
    ad2 = lora.init_lora_adapters(jax.random.PRNGKey(2), p_sana,
                                  targets=["blocks.attn1.to_q"],
                                  rank=2, adapter_names=["canny"])
    keys = sorted(ad2["canny"])
    assert "base.blocks.attn1.to_q" in keys, keys
    ad2 = {"canny": {"base.blocks.attn1.to_q":
                     ad2["canny"]["base.blocks.attn1.to_q"]}}
    tb.export_lora_adapters_reference(ad2, str(tmp_path / "sana"))
    loaded2 = tb.load_lora_adapters(str(tmp_path / "sana"), p_sana)
    assert sorted(loaded2["canny"]) == ["base.blocks.attn1.to_q"]


def test_pipeline_switching_on_quantized_tree():
    """The serving path: per-condition switching over an int8-quantized
    pipeline tree — same program reused across switches (no retrace), and
    disabling restores the exact pristine int codes."""
    import jax.numpy as jnp
    from unigen_tpu.models import vae as vae_lib
    from unigen_tpu.ops import quant
    from unigen_tpu.pipelines.flux import UniGenFluxPipeline
    cfg, params = _rooted_params()
    adapters = _nonzero_adapters(params, targets=("attn.to_q",))
    qparams = quant.quantize_tree(params, min_dim=8)
    vae_cfg = vae_lib.VAEConfig(latent_channels=4, block_out_channels=(8, 16),
                                layers_per_block=1, norm_num_groups=4)
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), vae_cfg)
    pipe = UniGenFluxPipeline(cfg=cfg, params=qparams, vae_cfg=vae_cfg,
                              vae_params=vae_params, dtype=jnp.float32)
    pipe.load_lora(adapters)
    b = 1
    embeds = jax.random.normal(jax.random.PRNGKey(2),
                               (b, 8, cfg.flux.joint_attention_dim), jnp.float32)
    pooled = jax.random.normal(jax.random.PRNGKey(3),
                               (b, cfg.flux.pooled_projection_dim), jnp.float32)
    ctrl = jnp.asarray(np.random.RandomState(0).rand(b, 3, 32, 32) * 2 - 1,
                       jnp.float32)

    def gen():
        return pipe.generate(prompt_embeds=embeds, pooled=pooled,
                             cond_pooled=pooled, control_pixels=ctrl,
                             height=32, width=32, num_inference_steps=2)

    base_img = gen()
    pristine_codes = np.asarray(
        pipe.params["control"]["double_blocks"]["attn"]["to_q"]["w_q"])
    pipe.set_condition_adapter("canny")
    canny_img = gen()
    assert not np.array_equal(base_img, canny_img)
    assert len(pipe._program_cache) == 1, "switch must not retrace"
    pipe.set_condition_adapter(None)
    np.testing.assert_array_equal(
        np.asarray(pipe.params["control"]["double_blocks"]["attn"]["to_q"]["w_q"]),
        pristine_codes)
    np.testing.assert_array_equal(gen(), base_img)
