"""Sharded inference equivalence: the UniGenFlux forward jitted over a
(data=2, expert=2, model=2) mesh with the param sharding rules must produce
the same output as the single-device run — the serving-path counterpart of
the training dryrun."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from unigen_tpu import config as cfg_lib
from unigen_tpu.models.unigen_flux import (init_unigen_flux_params,
                                           unigen_flux_forward)
from unigen_tpu.ops.packing import prepare_latent_image_ids
from unigen_tpu.parallel.mesh import build_mesh
from unigen_tpu.parallel.sharding import shard_params

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


def test_sharded_inference_matches_single_device():
    flux = cfg_lib.tiny_flux_config()
    cfg = cfg_lib.UniGenConfig(
        family="flux", flux=flux, condition_types=("canny",),
        control=cfg_lib.ControlConfig(moe=cfg_lib.MoEConfig(expert_num=4)))
    params = init_unigen_flux_params(jax.random.PRNGKey(0), cfg)

    b, hw, t = 2, 4, 6
    ks = jax.random.split(jax.random.PRNGKey(7), 6)
    batch = dict(
        hidden=jax.random.normal(ks[0], (b, hw * hw, flux.in_channels)),
        condition=jax.random.normal(ks[1], (b, hw * hw, flux.in_channels)),
        encoder=jax.random.normal(ks[2], (b, t, flux.joint_attention_dim)),
        pooled=jax.random.normal(ks[3], (b, flux.pooled_projection_dim)),
        condition_pooled=jax.random.normal(ks[4], (b, flux.pooled_projection_dim)),
        timestep=jnp.full((b,), 0.5),
        img_ids=prepare_latent_image_ids(hw, hw),
        txt_ids=jnp.zeros((t, 3)),
        condition_ids=prepare_latent_image_ids(hw, hw),
    )

    fwd = jax.jit(lambda p, bt: unigen_flux_forward(p, cfg, **bt)[0])
    ref = fwd(params, batch)

    mesh = build_mesh(cfg_lib.MeshConfig(data=2, expert=2, sequence=1, model=2))
    sharded = shard_params(params, mesh)
    sharded_batch = {
        k: jax.device_put(v, NamedSharding(
            mesh, P("data", *([None] * (v.ndim - 1)))
            if v.ndim >= 1 and v.shape[0] == b else P()))
        for k, v in batch.items()}
    got = fwd(sharded, sharded_batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-5)


def _tiny_pipe(quantize=False):
    from unigen_tpu.models import vae as vae_lib
    from unigen_tpu.pipelines.flux import UniGenFluxPipeline

    flux = cfg_lib.tiny_flux_config()
    cfg = cfg_lib.UniGenConfig(
        family="flux", flux=flux, condition_types=("canny",),
        control=cfg_lib.ControlConfig(moe=cfg_lib.MoEConfig(expert_num=4)))
    params = init_unigen_flux_params(jax.random.PRNGKey(0), cfg)
    if quantize:
        from unigen_tpu.ops.quant import quantize_tree
        params = quantize_tree(params, min_dim=8)
    vae_cfg = vae_lib.tiny_vae_config(latent_channels=flux.in_channels // 4)
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), vae_cfg)
    return UniGenFluxPipeline(cfg=cfg, params=params, vae_cfg=vae_cfg,
                              vae_params=vae_params, dtype=jnp.float32)


def _gen(pipe, b=2):
    bb = pipe.cfg.flux
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    return pipe.generate(
        prompt_embeds=jax.random.normal(ks[0], (b, 6, bb.joint_attention_dim)),
        pooled=jax.random.normal(ks[1], (b, bb.pooled_projection_dim)),
        cond_pooled=jax.random.normal(ks[2], (b, bb.pooled_projection_dim)),
        control_pixels=np.asarray(
            jax.random.uniform(ks[3], (b, 3, 32, 32), minval=-1, maxval=1)),
        height=32, width=32, num_inference_steps=2, seed=5)


@pytest.mark.parametrize("quantize", [False, True],
                         ids=["fp32", "quantized"])
def test_sharded_pipeline_generate_matches_single_device(quantize):
    """Multi-chip serving through the PIPELINE API (serve.py --mesh-*):
    pipe.shard(mesh) places the tree (incl. w_q/w_scale leaves) by the
    sharding rules, generate() shards its batch inputs over 'data', and the
    denoise program partitions under GSPMD — output == single-device."""
    pipe = _tiny_pipe(quantize)
    ref = _gen(pipe)

    sharded = _tiny_pipe(quantize)
    mesh = build_mesh(cfg_lib.MeshConfig(data=2, expert=2, sequence=1,
                                         model=2))
    sharded.shard(mesh)
    if quantize:
        # the rules actually engaged on the quantized serving leaves
        from unigen_tpu.parallel.sharding import param_spec
        hit = []
        def _check(path, leaf):
            keys = [getattr(k, "key", None) for k in path]
            if keys and keys[-1] in ("w_q", "w_q4", "w_scale"):
                hit.append("model" in str(param_spec(path, leaf, mesh)))
            return leaf
        jax.tree_util.tree_map_with_path(_check, sharded.params)
        assert hit and any(hit), "no quantized leaf picked up a 'model' spec"
    got = _gen(sharded)
    assert got.shape == ref.shape
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.max() <= 1, f"max uint8 diff {diff.max()}"


def test_sharded_sd3_pipeline_matches_single_device():
    """UniGenSD3Pipeline.shard(mesh): same contract as the flux pipeline
    (serve.py --family sd3 --mesh-*)."""
    from unigen_tpu.models import vae as vae_lib
    from unigen_tpu.models.unigen_sd3 import init_unigen_sd3_params
    from unigen_tpu.pipelines.sd3 import UniGenSD3Pipeline

    cfg = cfg_lib.UniGenConfig(family="sd3", sd3=cfg_lib.tiny_sd3_config(),
                               control=cfg_lib.ControlConfig(use_rope=False),
                               condition_types=("depth",))

    def mk():
        params = init_unigen_sd3_params(jax.random.PRNGKey(0), cfg)
        vae_cfg = vae_lib.tiny_vae_config(latent_channels=cfg.sd3.in_channels)
        vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), vae_cfg)
        return UniGenSD3Pipeline(cfg=cfg, params=params, vae_cfg=vae_cfg,
                                 vae_params=vae_params, dtype=jnp.float32)

    b, h = 2, 16
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    kw = dict(
        prompt_embeds=jax.random.normal(ks[0],
                                        (b, 6, cfg.sd3.joint_attention_dim)),
        pooled=jax.random.normal(ks[1], (b, cfg.sd3.pooled_projection_dim)),
        cond_pooled=jax.random.normal(ks[2],
                                      (b, cfg.sd3.pooled_projection_dim)),
        control_pixels=np.asarray(
            jax.random.normal(ks[3], (b, 3, h, h))),
        height=h, width=h, num_inference_steps=2, guidance_scale=3.0,
        seed=0)
    ref = mk().generate(**kw)
    sharded = mk()
    sharded.shard(build_mesh(cfg_lib.MeshConfig(data=2, expert=2,
                                                sequence=1, model=2)))
    got = sharded.generate(**kw)
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.max() <= 1, f"max uint8 diff {diff.max()}"
