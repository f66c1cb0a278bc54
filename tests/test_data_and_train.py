"""Data layer (sampler determinism, conditions, collate), checkpoint
round-trip, and a 2-step end-to-end training run on the tiny model."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu import config as cfg_lib
from unigen_tpu.data import conditions as C
from unigen_tpu.data.datasets import ConcatDataset, collate
from unigen_tpu.data.sampler import MultiTaskMixedBatchSampler


# ------------------------------------------------------------ sampler

def test_sampler_deterministic_and_mixed():
    s1 = MultiTaskMixedBatchSampler([10, 4, 7], batch_size=6, seed=7)
    s2 = MultiTaskMixedBatchSampler([10, 4, 7], batch_size=6, seed=7)
    b1, b2 = list(s1), list(s2)
    assert b1 == b2                       # deterministic
    assert all(len(b) == 6 for b in b1)
    # every batch mixes all three tasks: 2 samples per task
    ranges = [(0, 10), (10, 14), (14, 21)]
    for batch in b1:
        for lo, hi in ranges:
            assert sum(lo <= i < hi for i in batch) == 2


def test_sampler_rank_striding_disjoint_initial_pass():
    n = 32
    r0 = MultiTaskMixedBatchSampler([n], batch_size=4, num_replicas=2, rank=0, seed=3)
    r1 = MultiTaskMixedBatchSampler([n], batch_size=4, num_replicas=2, rank=1, seed=3)
    first0 = [i for b in list(r0)[:4] for i in b]
    first1 = [i for b in list(r1)[:4] for i in b]
    assert not set(first0) & set(first1)  # disjoint before wraparound


def test_sampler_oversampling_short_task():
    s = MultiTaskMixedBatchSampler([20, 3], batch_size=4, seed=0)
    seen_short = [i for b in s for i in b if i >= 20]
    assert len(seen_short) > 3            # short task oversampled


# ------------------------------------------------------------ conditions

def test_condition_synthesis():
    img = (np.random.default_rng(0).uniform(0, 255, (32, 32, 3))).astype(np.uint8)
    for ct in ["canny", "coloring", "deblurring"]:
        out = C.synthesize(ct, img)
        assert out.shape == img.shape and out.dtype == np.uint8
    chw = C.to_model_range(img)
    assert chw.shape == (3, 32, 32) and chw.min() >= -1 and chw.max() <= 1
    np.testing.assert_array_equal(C.from_model_range(chw), img)
    # latent width 32 -> full packed width 16, matching pipelines/flux.py
    # lw/2 (advisor r4: passing the packed width halved the separation)
    assert C.condition_id_offset("subject", 32) == 16.0
    assert C.condition_id_offset("canny", 32) == 0.0


def test_fill_and_inpaint_masks():
    img = np.full((8, 8, 3), 100, np.uint8)
    f = C.fill_mask(img, (2, 6, 2, 6))
    assert f[0, 0, 0] == 0 and f[3, 3, 0] == 100
    p = C.inpaint_mask(img, (2, 6, 2, 6))
    assert p[0, 0, 0] == 100 and p[3, 3, 0] == 0


def test_collate_and_concat():
    samples = [{"pixel_values": np.ones((3, 4, 4), np.float32) * i,
                "descriptions": f"p{i}", "task_names": "canny"}
               for i in range(3)]
    out = collate(samples)
    assert out["pixel_values"].shape == (3, 3, 4, 4)
    assert out["descriptions"] == ["p0", "p1", "p2"]

    class Fake:
        def __init__(self, n, tag):
            self.n, self.tag = n, tag
        def __len__(self):
            return self.n
        def __getitem__(self, i):
            return (self.tag, i)

    cat = ConcatDataset([Fake(3, "a"), Fake(2, "b")])
    assert len(cat) == 5
    assert cat[0] == ("a", 0) and cat[3] == ("b", 0) and cat[4] == ("b", 1)


# ------------------------------------------------------------ checkpoint

def test_checkpoint_roundtrip(tmp_path):
    from unigen_tpu.train import checkpoint as ck
    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones((4,))}}
    opt = {"m": jnp.zeros((2, 3))}
    ck.save_train_state(str(tmp_path), 5, tree, opt, extra={"note": "x"})
    assert ck.latest_step(str(tmp_path)) == 5
    got = ck.restore_train_state(str(tmp_path), tree, opt)
    assert got is not None
    control, opt2, meta = got
    np.testing.assert_array_equal(control["a"], tree["a"])
    np.testing.assert_array_equal(opt2["m"], opt["m"])
    assert meta["step"] == 5 and meta["note"] == "x"


def test_adapter_export_names(tmp_path):
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.train.checkpoint import export_adapter_torch_compatible
    from unigen_tpu.io.torch_bridge import load_unigen_adapter

    flux = cfg_lib.tiny_flux_config()
    cfg = cfg_lib.UniGenConfig(family="flux", flux=flux, condition_types=("canny",))
    params = init_unigen_flux_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "adapter.npz")
    export_adapter_torch_compatible(params["control"], path)
    sd = dict(np.load(path))
    # round-trip through the torch-name loader
    n_cn = flux.num_layers // cfg.control.single_control_dev
    n_s = flux.num_single_layers // cfg.control.single_control_dev
    back = load_unigen_adapter(sd, n_cn=n_cn, n_cn_single=n_s,
                               num_experts=cfg.control.moe.num_experts(1),
                               dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(back["double_blocks"]["attn"]["to_q"]["w"]),
        np.asarray(params["control"]["double_blocks"]["attn"]["to_q"]["w"]),
        rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back["moe"]["gate"]["w"]),
                               np.asarray(params["control"]["moe"]["gate"]["w"]),
                               rtol=1e-6)


# ------------------------------------------------------------ trainer e2e

def test_trainer_two_steps(tmp_path):
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.train.loop import Trainer

    flux = cfg_lib.tiny_flux_config()
    ucfg = cfg_lib.UniGenConfig(family="flux", flux=flux, condition_types=("canny",))
    tcfg = cfg_lib.TrainConfig(max_train_steps=2, train_batch_size=2,
                               checkpointing_steps=2, remat=False)
    params = init_unigen_flux_params(jax.random.PRNGKey(0), ucfg)

    rng = np.random.default_rng(0)

    def encode_text(prompts):
        b = len(prompts)
        g = np.random.default_rng(abs(hash(tuple(prompts))) % 2**31)
        return {"prompt_embeds": jnp.asarray(
                    g.normal(size=(b, 6, flux.joint_attention_dim)).astype(np.float32)),
                "pooled": jnp.asarray(
                    g.normal(size=(b, flux.pooled_projection_dim)).astype(np.float32))}

    def encode_images(px):
        b = px.shape[0]
        g = np.random.default_rng(1)
        return jnp.asarray(g.normal(size=(b, flux.in_channels // 4, 8, 8)
                                    ).astype(np.float32))

    trainer = Trainer(ucfg, tcfg, base_params=params["base"],
                      control_params=params["control"],
                      encode_text=encode_text, encode_images=encode_images,
                      work_dir=str(tmp_path))

    def batches():
        while True:
            yield {"descriptions": ["a cat", "a dog"],
                   "pixel_values": rng.normal(size=(2, 3, 64, 64)).astype(np.float32),
                   "condition_pixels": rng.normal(size=(2, 3, 64, 64)).astype(np.float32),
                   "task_names": ["canny", "canny"]}

    metrics = trainer.train(batches(), log_every=1)
    assert trainer.global_step == 2
    assert np.isfinite(metrics["step_loss"])
    # checkpoint written and resumable
    from unigen_tpu.train import checkpoint as ck
    assert ck.latest_step(str(tmp_path)) == 2
    trainer2 = Trainer(ucfg, tcfg, base_params=params["base"],
                       control_params=params["control"],
                       encode_text=encode_text, encode_images=encode_images,
                       work_dir=str(tmp_path))
    assert trainer2.maybe_resume() and trainer2.global_step == 2


def test_trainer_multi_condition_step():
    """Train step with a leading condition axis [K, B, ...] (the
    MultiCondtionUniGenFlux path, reference train.py:530-560)."""
    import jax
    import jax.numpy as jnp
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.train.train_step import init_train_state, make_train_step

    flux = cfg_lib.tiny_flux_config()
    ucfg = cfg_lib.UniGenConfig(family="flux", flux=flux,
                                condition_types=("depth", "canny"))
    tcfg = cfg_lib.TrainConfig(max_train_steps=5, remat=False,
                               train_batch_size=1, lr_warmup_steps=0)
    params = init_unigen_flux_params(jax.random.PRNGKey(0), ucfg)
    state = init_train_state(params["control"], tcfg)
    step = jax.jit(make_train_step(ucfg, tcfg))
    rng = np.random.default_rng(0)
    c, k, b = flux.in_channels // 4, 2, 1
    batch = dict(
        latents=jnp.asarray(rng.normal(size=(b, c, 8, 8)).astype(np.float32)),
        condition_latents=jnp.asarray(
            rng.normal(size=(k, b, c, 8, 8)).astype(np.float32)),
        prompt_embeds=jnp.asarray(
            rng.normal(size=(b, 6, flux.joint_attention_dim)).astype(np.float32)),
        pooled=jnp.asarray(
            rng.normal(size=(b, flux.pooled_projection_dim)).astype(np.float32)),
        condition_pooled=jnp.asarray(
            rng.normal(size=(k, b, flux.pooled_projection_dim)).astype(np.float32)),
    )
    state2, metrics = step(state, params["base"], batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(np.asarray(metrics["step_loss"])))
    assert float(np.asarray(metrics["grad_norm"])) > 0


def test_baseline_presets_constructible():
    from unigen_tpu.presets import baseline_configs
    cfgs = baseline_configs()
    assert set(cfgs) == {"flux_canny_4step", "sd3_depth_28step",
                         "multigen_suite", "multi_condition_joint",
                         "subjects200k_train"}
    assert cfgs["multigen_suite"]["cfg"].condition_nums == 12
    assert cfgs["multigen_suite"]["cfg"].control.moe.num_experts(12) == 39
    assert cfgs["sd3_depth_28step"]["cfg"].family == "sd3"


def test_adapter_disk_roundtrip_via_loader(tmp_path):
    """Full disk round-trip: export adapter -> load_adapter_checkpoint ->
    identical weights (the infer.py adapter-loading path)."""
    import jax
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.train.checkpoint import export_adapter_torch_compatible
    from unigen_tpu.io.torch_bridge import load_adapter_checkpoint

    flux = cfg_lib.tiny_flux_config()
    cfg = cfg_lib.UniGenConfig(family="flux", flux=flux, condition_types=("canny",))
    params = init_unigen_flux_params(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path / "adapter.npz")
    export_adapter_torch_compatible(params["control"], path)

    n_cn = flux.num_layers // cfg.control.single_control_dev
    n_s = flux.num_single_layers // cfg.control.single_control_dev
    back = load_adapter_checkpoint(str(tmp_path), n_cn=n_cn, n_cn_single=n_s,
                                   num_experts=cfg.control.moe.num_experts(1),
                                   dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(back["single_blocks"]["proj_out"]["w"]),
        np.asarray(params["control"]["single_blocks"]["proj_out"]["w"]),
        rtol=1e-6)


def test_adapter_reference_bin_shards_roundtrip(tmp_path):
    """Reference hook.py shard format: torch .bin shards written and read
    back through the reference-format loader path."""
    import jax
    pytest_torch = __import__("pytest").importorskip("torch")
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.train.checkpoint import export_adapter_reference_shards
    from unigen_tpu.io.torch_bridge import load_adapter_checkpoint

    flux = cfg_lib.tiny_flux_config()
    cfg = cfg_lib.UniGenConfig(family="flux", flux=flux, condition_types=("canny",))
    params = init_unigen_flux_params(jax.random.PRNGKey(5), cfg)
    paths = export_adapter_reference_shards(params["control"], str(tmp_path))
    assert any("control_joint_trans_blocks_weights_" in p for p in paths)
    assert any("moe_weights_" in p for p in paths)

    n_cn = flux.num_layers // cfg.control.single_control_dev
    n_s = flux.num_single_layers // cfg.control.single_control_dev
    back = load_adapter_checkpoint(str(tmp_path), n_cn=n_cn, n_cn_single=n_s,
                                   num_experts=cfg.control.moe.num_experts(1),
                                   dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(back["moe"]["experts"]["hid_mod"]["w"]),
        np.asarray(params["control"]["moe"]["experts"]["hid_mod"]["w"]),
        rtol=1e-6)


def test_sampler_wraparound_reshuffles_deterministically():
    """After a short task exhausts, its per-rank list reshuffles with the
    rank-offset seed — deterministic across constructions (reference
    UniGenUtils.py:316-321)."""
    a = [i for b in MultiTaskMixedBatchSampler([6, 3], batch_size=2, seed=11)
         for i in b]
    b_ = [i for b in MultiTaskMixedBatchSampler([6, 3], batch_size=2, seed=11)
          for i in b]
    assert a == b_
    # short-task indices (6..8) appear more than once -> wraparound happened
    short = [i for i in a if i >= 6]
    assert len(short) > len(set(short))
    # different seed -> different order
    c = [i for b in MultiTaskMixedBatchSampler([6, 3], batch_size=2, seed=12)
         for i in b]
    assert a != c


def test_lr_scheduler_choices_match_hf_semantics():
    """All six reference lr_scheduler choices (train.py:160-161) produce the
    HF get_scheduler shapes: linear warmup to peak, then the per-type decay
    (HF lambdas re-derived in numpy here)."""
    from unigen_tpu.train.train_step import lr_schedule
    peak, warm, total = 1e-4, 10, 50

    def mk(kind):
        return lr_schedule(cfg_lib.TrainConfig(
            learning_rate=peak, lr_warmup_steps=warm, max_train_steps=total,
            lr_scheduler=kind))

    steps = np.arange(total)

    def hf(kind, s):
        if kind == "constant":
            return peak
        if s < warm:
            return peak * s / warm
        p = (s - warm) / max(total - warm, 1)          # decay progress
        if kind == "constant_with_warmup":
            return peak
        if kind == "linear":
            return peak * (1.0 - p)
        if kind == "polynomial":                        # power=1, lr_end=1e-7
            return (peak - 1e-7) * (1.0 - p) + 1e-7
        # cosine / cosine_with_restarts (num_cycles=1): HF shapes both as
        # 0.5*(1+cos(pi*progress-over-TOTAL-after-warmup)); optax's
        # warmup_cosine uses decay over total incl. warmup — compare to that
        raise AssertionError(kind)

    for kind in ("linear", "polynomial", "constant", "constant_with_warmup"):
        sched = mk(kind)
        got = np.array([float(sched(s)) for s in steps])
        want = np.array([hf(kind, int(s)) for s in steps])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-12,
                                   err_msg=kind)

    # cosine family: monotone warmup then cosine decay to ~0 at the end
    for kind in ("cosine", "cosine_with_restarts"):
        sched = mk(kind)
        got = np.array([float(sched(s)) for s in steps])
        assert got[0] == 0.0 and abs(got[warm] - peak) / peak < 0.25
        assert np.all(np.diff(got[:warm]) > 0)          # warmup rises
        assert np.all(np.diff(got[warm + 1:]) < 0)      # decay falls
        assert got[-1] < 0.02 * peak

    with pytest.raises(ValueError):
        mk("nonsense")


def test_cn_config_yaml_maps_reference_keys(tmp_path):
    """--cn_config loads the reference config/unigen.yaml layout
    (params.control_params.*) into ControlConfig/MoEConfig overrides;
    unknown keys error loudly."""
    import importlib.util as ilu
    import os
    spec = ilu.spec_from_file_location(
        "train_cli", os.path.join(os.path.dirname(__file__), "..",
                                  "scripts", "train.py"))
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)

    y = tmp_path / "unigen.yaml"
    y.write_text(
        "params:\n  control_params:\n"
        "    use_transformer_params: True\n"
        "    use_pooled_prompt_embeds: True\n"
        "    use_encoder_hidden_states: True\n"
        "    extra_conditioning_channels: 0\n"
        "    expert_num_each_condition: 5\n"
        "    use_shared_expert: True\n"
        "    use_consis_module: False\n"
        "    use_modulate: False\n")
    ov = mod.load_cn_config(str(y))
    assert ov["use_transformer_params"] is True
    assert ov["extra_conditioning_channels"] == 0
    assert ov["moe"].expert_num_each_condition == 5
    cfg = cfg_lib.ControlConfig(**ov)            # constructible
    assert cfg.moe.expert_num_each_condition == 5
    assert mod.load_cn_config(None) == {}

    bad = tmp_path / "bad.yaml"
    bad.write_text("params:\n  control_params:\n    not_a_key: 1\n")
    with pytest.raises(SystemExit):
        mod.load_cn_config(str(bad))
