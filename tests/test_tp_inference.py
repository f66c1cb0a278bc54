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
