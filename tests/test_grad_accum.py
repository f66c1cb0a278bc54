"""Gradient accumulation: params freeze between boundaries, update at the
accumulation boundary."""

import jax
import jax.numpy as jnp
import numpy as np

from unigen_tpu import config as cfg_lib
from unigen_tpu.models.unigen_flux import init_unigen_flux_params
from unigen_tpu.train.train_step import init_train_state, make_train_step


def test_grad_accumulation_updates_at_boundary():
    flux = cfg_lib.tiny_flux_config()
    ucfg = cfg_lib.UniGenConfig(family="flux", flux=flux, condition_types=("canny",))
    tcfg = cfg_lib.TrainConfig(max_train_steps=10, gradient_accumulation_steps=2,
                               remat=False, train_batch_size=1,
                               lr_warmup_steps=0)  # lr=0 during warmup would mask the update
    params = init_unigen_flux_params(jax.random.PRNGKey(0), ucfg)
    state = init_train_state(params["control"], tcfg)
    step = jax.jit(make_train_step(ucfg, tcfg))

    rng = np.random.default_rng(0)
    c = flux.in_channels // 4
    batch = dict(
        latents=jnp.asarray(rng.normal(size=(1, c, 8, 8)).astype(np.float32)),
        condition_latents=jnp.asarray(rng.normal(size=(1, c, 8, 8)).astype(np.float32)),
        prompt_embeds=jnp.asarray(rng.normal(size=(1, 6, flux.joint_attention_dim)).astype(np.float32)),
        pooled=jnp.asarray(rng.normal(size=(1, flux.pooled_projection_dim)).astype(np.float32)),
        condition_pooled=jnp.asarray(rng.normal(size=(1, flux.pooled_projection_dim)).astype(np.float32)),
    )
    w0 = np.asarray(state.control["context_embedder"]["w"])
    state1, _ = step(state, params["base"], batch, jax.random.PRNGKey(1))
    w1 = np.asarray(state1.control["context_embedder"]["w"])
    np.testing.assert_array_equal(w0, w1)  # mid-accumulation: no update
    state2, _ = step(state1, params["base"], batch, jax.random.PRNGKey(2))
    w2 = np.asarray(state2.control["context_embedder"]["w"])
    assert not np.array_equal(w1, w2)      # boundary: params move
