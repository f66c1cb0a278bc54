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


def test_remat_policy_equivalence():
    """utils.remat_wrap policies never change VALUES — the train step under
    remat=False, remat='full' (blanket checkpoint) and remat='dots'
    (save-weight-matmuls policy, the MFU option) produces identical loss,
    grad norm and updated params on the same inputs."""
    import pytest
    flux = cfg_lib.tiny_flux_config()
    ucfg = cfg_lib.UniGenConfig(family="flux", flux=flux,
                                condition_types=("canny",))
    params = init_unigen_flux_params(jax.random.PRNGKey(0), ucfg)
    rng = np.random.default_rng(0)
    c = flux.in_channels // 4
    batch = dict(
        latents=jnp.asarray(rng.normal(size=(1, c, 8, 8)).astype(np.float32)),
        condition_latents=jnp.asarray(
            rng.normal(size=(1, c, 8, 8)).astype(np.float32)),
        prompt_embeds=jnp.asarray(
            rng.normal(size=(1, 6, flux.joint_attention_dim)).astype(np.float32)),
        pooled=jnp.asarray(
            rng.normal(size=(1, flux.pooled_projection_dim)).astype(np.float32)),
        condition_pooled=jnp.asarray(
            rng.normal(size=(1, flux.pooled_projection_dim)).astype(np.float32)),
    )

    outs = {}
    for remat in (False, "full", "dots"):
        tcfg = cfg_lib.TrainConfig(max_train_steps=10, remat=remat,
                                   train_batch_size=1, lr_warmup_steps=0)
        state = init_train_state(params["control"], tcfg)
        step = jax.jit(make_train_step(ucfg, tcfg))
        state1, m = step(state, params["base"], batch, jax.random.PRNGKey(1))
        outs[remat] = (float(m["step_loss"]), float(m["grad_norm"]),
                       np.asarray(state1.control["context_embedder"]["w"]))
    ref = outs[False]
    for remat in ("full", "dots"):
        got = outs[remat]
        np.testing.assert_allclose(got[0], ref[0], rtol=1e-6)
        np.testing.assert_allclose(got[1], ref[1], rtol=1e-5)
        np.testing.assert_allclose(got[2], ref[2], rtol=1e-6, atol=1e-7)

    with pytest.raises(ValueError):
        from unigen_tpu.utils import remat_wrap
        remat_wrap(lambda x: x, "bogus")


def test_split_trainable_roundtrip_and_split_train_step():
    """ops/quant.split_trainable: complementary-None split/merge round-trip,
    and a train step where the quantized control leaves ride frozen while
    the fp subset trains (the full-topology single-chip fine-tune mode)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from unigen_tpu import config as C
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.ops import quant
    from unigen_tpu.train import train_step as ts

    flux = C.tiny_flux_config()
    cfg = C.UniGenConfig(family="flux", flux=flux, condition_types=("canny",))
    params = init_unigen_flux_params(jax.random.PRNGKey(0), cfg)
    qcontrol = quant.quantize_tree(params["control"], min_dim=8)
    trainable, frozen = quant.split_trainable(qcontrol)
    # frozen holds the int leaves, trainable everything else; merge restores
    merged = quant.merge_split(trainable, frozen)
    for (pa, a), (pb, b_) in zip(
            jax.tree_util.tree_flatten_with_path(qcontrol)[0],
            jax.tree_util.tree_flatten_with_path(merged)[0]):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    froz_leaves = jax.tree.leaves(frozen)
    assert froz_leaves and all(
        l.dtype == jnp.int8 or l.dtype == jnp.float32 for l in froz_leaves)
    assert any(l.dtype == jnp.int8 for l in froz_leaves)

    tcfg = C.TrainConfig(train_batch_size=1, max_train_steps=10, remat=False,
                         gradient_accumulation_steps=2)
    state = ts.init_train_state(trainable, tcfg)
    b = 1
    ks = jax.random.split(jax.random.PRNGKey(5), 5)
    batch = dict(
        latents=jax.random.normal(ks[0], (b, 4, 8, 8)),
        condition_latents=jax.random.normal(ks[1], (b, 4, 8, 8)),
        prompt_embeds=jax.random.normal(ks[2], (b, 8, flux.joint_attention_dim)),
        pooled=jax.random.normal(ks[3], (b, flux.pooled_projection_dim)),
        condition_pooled=jax.random.normal(ks[4], (b, flux.pooled_projection_dim)),
    )
    step = jax.jit(ts.make_train_step(cfg, tcfg), donate_argnums=(0,))
    frozen_arg = {"base": params["base"], "control_frozen": frozen}
    state, m1 = step(state, frozen_arg, batch, jax.random.PRNGKey(7))
    state, m2 = step(state, frozen_arg, batch, jax.random.PRNGKey(8))
    assert np.isfinite(float(m1["step_loss"]))
    assert np.isfinite(float(m2["grad_norm"]))
