"""LoRA fine-tuning mode (reference --rank, train.py:137 + the dormant PEFT
save/load hooks hook.py:29-84, first-class here): rank-r {a,b} factors train
over the FROZEN control branch — fp or quantized (QLoRA-style dequant fold,
models/lora.fold_for_training) — and export in the reference per-adapter
layout at every checkpoint."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu import config as cfg_lib
from unigen_tpu.models import lora as lora_lib
from unigen_tpu.models.unigen_flux import init_unigen_flux_params

# a zero-init add gate (the only leaves with live grads at step 0 — see
# models/lora.DEFAULT_LORA_TARGETS) plus interior linears whose grad path
# opens once the gate moves
TARGETS = ["control.add_double", "control.add_single",
           "control.double_blocks.attn.to_q",
           "control.single_blocks.proj_mlp"]


def _world():
    flux = cfg_lib.tiny_flux_config()
    ucfg = cfg_lib.UniGenConfig(family="flux", flux=flux,
                                condition_types=("canny",))
    params = init_unigen_flux_params(jax.random.PRNGKey(0), ucfg)
    return flux, ucfg, params


def _batch(flux, b=2):
    g = np.random.default_rng(3)
    return dict(
        latents=jnp.asarray(g.normal(size=(b, flux.in_channels // 4, 8, 8))
                            .astype(np.float32)),
        condition_latents=jnp.asarray(
            g.normal(size=(b, flux.in_channels // 4, 8, 8)).astype(np.float32)),
        prompt_embeds=jnp.asarray(
            g.normal(size=(b, 6, flux.joint_attention_dim)).astype(np.float32)),
        pooled=jnp.asarray(
            g.normal(size=(b, flux.pooled_projection_dim)).astype(np.float32)),
        condition_pooled=jnp.asarray(
            g.normal(size=(b, flux.pooled_projection_dim)).astype(np.float32)))


def _nonzero(adapters, name, seed=9):
    """Give 'b' factors real values so deltas are nonzero."""
    g = np.random.default_rng(seed)
    out = {}
    for path, ab in adapters[name].items():
        out[path] = {"a": ab["a"],
                     "b": jnp.asarray(
                         0.05 * g.normal(size=ab["b"].shape).astype(np.float32))}
    return {name: out}


def test_fold_for_training_matches_fold_adapter_on_fp():
    """On an fp tree the training fold (plain w + delta, no requant) must
    equal the serving fold_adapter numerically."""
    _, _, params = _world()
    adapters = _nonzero(lora_lib.init_lora_adapters(
        jax.random.PRNGKey(1), params, targets=TARGETS, rank=2,
        adapter_names=["x"]), "x")
    served = lora_lib.fold_adapter(params, adapters, "x", scale=0.7)
    trained = lora_lib.fold_for_training(params, adapters["x"], scale=0.7)
    for path in adapters["x"]:
        w_s = lora_lib.tree_get(served, path)["w"]
        w_t = lora_lib.tree_get(trained, path)["w"]
        np.testing.assert_allclose(np.asarray(w_s, np.float32),
                                   np.asarray(w_t, np.float32),
                                   rtol=0, atol=1e-6)
    # untouched leaves are shared, not copied
    other = "control.double_blocks.attn.to_k"
    assert lora_lib.tree_get(trained, other) is lora_lib.tree_get(params, other)


@pytest.mark.parametrize("quantize", [False, True], ids=["fp", "quantized"])
def test_lora_train_step_learns(quantize):
    """The LoRA train step runs, produces finite loss, and pushes gradient
    into the factors (b starts zero -> becomes nonzero) while the frozen
    control tree is never part of the optimizer state. Covers the QLoRA
    path: a quantized frozen control branch trains the same way through the
    dequant fold."""
    from unigen_tpu.train.train_step import init_train_state, make_train_step

    flux, ucfg, params = _world()
    tcfg = cfg_lib.TrainConfig(max_train_steps=4, train_batch_size=2,
                               remat=False, lora_rank=2,
                               lora_targets=tuple(TARGETS),
                               learning_rate=1e-3, lr_warmup_steps=0,
                               lr_scheduler="constant")
    adapters = lora_lib.init_lora_adapters(
        jax.random.PRNGKey(1), params, targets=TARGETS, rank=2,
        adapter_names=["canny"])
    control_frozen = params["control"]
    if quantize:
        from unigen_tpu.ops.quant import quantize_tree
        control_frozen = quantize_tree(control_frozen)
    base_params = {"base": params["base"], "control_frozen": control_frozen}
    state = init_train_state(adapters["canny"], tcfg)
    step = jax.jit(make_train_step(ucfg, tcfg))

    state, metrics = step(state, base_params, _batch(flux),
                          jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["step_loss"]))
    assert float(metrics["grad_norm"]) > 0
    # step 0: ONLY the zero-init add gates have live grads (the control
    # branch enters the output through them and they start at exactly 0)
    for path, ab in state.control.items():
        moved = float(jnp.abs(ab["b"]).max()) > 0
        assert moved == path.startswith("control.add_"), (path, moved)
    # step 1: the gates moved, so the interior grad path is open
    state, metrics = step(state, base_params, _batch(flux),
                          jax.random.PRNGKey(6))
    assert np.isfinite(float(metrics["step_loss"]))
    for path, ab in state.control.items():
        assert float(jnp.abs(ab["b"]).max()) > 0, path
    # optimizer state is the rank-r factors only (tiny): every opt leaf
    # matches an adapter leaf shape
    adapter_shapes = {tuple(x.shape) for x in jax.tree.leaves(state.control)}
    for leaf in jax.tree.leaves(state.opt_state):
        if hasattr(leaf, "shape") and leaf.ndim > 0:
            assert tuple(leaf.shape) in adapter_shapes


def test_lora_trainer_checkpoints_and_exports_reference_format(tmp_path):
    """Trainer in LoRA mode: trains, checkpoints/resumes the adapter state,
    and exports the reference per-adapter layout
    ({work_dir}/lora_adapters/{name}/pytorch_lora_weights.safetensors,
    hook.py:41-45) that load_lora_adapters restores to the SAME factors."""
    from unigen_tpu.io.torch_bridge import load_lora_adapters
    from unigen_tpu.train.loop import Trainer

    flux, ucfg, params = _world()
    tcfg = cfg_lib.TrainConfig(max_train_steps=2, train_batch_size=2,
                               checkpointing_steps=2, remat=False,
                               lora_rank=2, lora_targets=tuple(TARGETS),
                               lora_adapter_name="canny",
                               learning_rate=1e-3, lr_warmup_steps=0,
                               lr_scheduler="constant")
    adapters = lora_lib.init_lora_adapters(
        jax.random.PRNGKey(1), params, targets=TARGETS, rank=2,
        adapter_names=["canny"])

    def encode_text(prompts):
        b = len(prompts)
        g = np.random.default_rng(abs(hash(tuple(prompts))) % 2**31)
        return {"prompt_embeds": jnp.asarray(
                    g.normal(size=(b, 6, flux.joint_attention_dim))
                    .astype(np.float32)),
                "pooled": jnp.asarray(
                    g.normal(size=(b, flux.pooled_projection_dim))
                    .astype(np.float32))}

    def encode_images(px):
        g = np.random.default_rng(1)
        return jnp.asarray(g.normal(size=(px.shape[0], flux.in_channels // 4,
                                          8, 8)).astype(np.float32))

    trainer = Trainer(ucfg, tcfg,
                      base_params={"base": params["base"],
                                   "control_frozen": params["control"]},
                      control_params=adapters["canny"],
                      encode_text=encode_text, encode_images=encode_images,
                      work_dir=str(tmp_path))

    rng = np.random.default_rng(0)

    def batches():
        while True:
            yield {"descriptions": ["a cat", "a dog"],
                   "pixel_values": rng.normal(size=(2, 3, 64, 64))
                   .astype(np.float32),
                   "condition_pixels": rng.normal(size=(2, 3, 64, 64))
                   .astype(np.float32),
                   "task_names": ["canny", "canny"]}

    metrics = trainer.train(batches(), log_every=1)
    assert trainer.global_step == 2 and np.isfinite(metrics["step_loss"])

    path = tmp_path / "lora_adapters" / "canny" / \
        "pytorch_lora_weights.safetensors"
    assert path.exists()
    loaded = load_lora_adapters(str(tmp_path / "lora_adapters"), params,
                                ["canny"])["canny"]
    assert set(loaded) == set(trainer.state.control)
    for p, ab in trainer.state.control.items():
        np.testing.assert_allclose(np.asarray(loaded[p]["a"]),
                                   np.asarray(ab["a"], np.float32),
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(loaded[p]["b"]),
                                   np.asarray(ab["b"], np.float32),
                                   rtol=0, atol=1e-6)

    # orbax resume restores the adapter structure
    trainer2 = Trainer(ucfg, tcfg,
                       base_params={"base": params["base"],
                                    "control_frozen": params["control"]},
                       control_params=adapters["canny"],
                       encode_text=encode_text, encode_images=encode_images,
                       work_dir=str(tmp_path))
    assert trainer2.maybe_resume() and trainer2.global_step == 2
    for p in trainer.state.control:
        np.testing.assert_allclose(
            np.asarray(trainer2.state.control[p]["b"]),
            np.asarray(trainer.state.control[p]["b"]), rtol=0, atol=0)


def test_train_cli_lora_end_to_end(tmp_path_factory, tmp_path):
    """scripts/train.py --rank: the whole deployment path — fake diffusers
    checkpoint dir, fake Subjects-200K on disk, 2 LoRA steps on CPU — must
    checkpoint AND leave a reference-format adapter
    ({work_dir}/lora_adapters/{types}/pytorch_lora_weights.safetensors)."""
    import subprocess
    import sys

    import tests.test_from_pretrained as tfp
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    ckpt = tfp.fake_ckpt.__wrapped__(tmp_path_factory)
    data = str(tmp_path / "subjects")
    rng = np.random.default_rng(0)
    for i in range(4):
        base = os.path.join(data, "score_5", f"item{i:03d}")
        os.makedirs(os.path.dirname(base), exist_ok=True)
        for tag in ("target", "depth_large", "subject", "openpose"):
            arr = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
            Image.fromarray(arr).save(f"{base}_{tag}_0.jpg")
        import json as _json
        with open(f"{base}_target_0.json", "w") as f:
            _json.dump({"description": f"item {i}"}, f)
    os.makedirs(os.path.join(data, "test_infos"), exist_ok=True)
    with open(os.path.join(data, "test_infos",
                           "depth_subject_pose.txt"), "w") as f:
        f.write("item003_target_0.jpg\n")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    work = str(tmp_path / "work")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR="/root/.cache/unigen_jax_cache")
    # don't inherit conftest's 8-device host sim: batch 2 can't shard data=8
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "train.py"),
         "--pretrained_model_name_or_path", ckpt,
         "--data_path", data, "--dataset_name", "Subjects200K",
         "--condition_types", "depth", "--work_dir", work,
         "--rank", "2", "--max_train_steps", "2",
         "--checkpointing_steps", "2", "--train_batch_size", "2",
         "--resolution", "32", "--max_sequence_length", "16",
         "--lr_warmup_steps", "0"],
        capture_output=True, text=True, env=env, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    adapter = os.path.join(work, "lora_adapters", "depth",
                           "pytorch_lora_weights.safetensors")
    assert os.path.exists(adapter), os.listdir(work)
    from unigen_tpu.train import checkpoint as ck
    assert ck.latest_step(work) == 2


def test_train_cli_parses_lora_flags():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "train_cli", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    args = mod.parse_args(["--pretrained_model_name_or_path", "x",
                           "--rank", "4", "--lora_scale", "0.5",
                           "--lora_targets", "control.double_blocks.attn"])
    assert args.rank == 4 and args.lora_scale == 0.5
    assert args.lora_targets == ["control.double_blocks.attn"]
