"""DC-AE (SANA latent codec) tests: space<->channel shortcut exactness,
pixel shuffle inverses, encode/decode shape contract, pipeline integration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu.models import dcae


def test_pixel_shuffle_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 8, 8))
    np.testing.assert_array_equal(
        np.asarray(dcae.pixel_shuffle(dcae.pixel_unshuffle(x, 2), 2)),
        np.asarray(x))


def test_pixel_unshuffle_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(2, 4, 6, 6).astype(np.float32)
    ours = np.asarray(dcae.pixel_unshuffle(jnp.asarray(x), 2))
    theirs = torch.nn.functional.pixel_unshuffle(torch.tensor(x), 2).numpy()
    np.testing.assert_allclose(ours, theirs, atol=0)
    ours_s = np.asarray(dcae.pixel_shuffle(jnp.asarray(ours), 2))
    theirs_s = torch.nn.functional.pixel_shuffle(torch.tensor(theirs), 2).numpy()
    np.testing.assert_allclose(ours_s, theirs_s, atol=0)


def test_channel_shortcuts():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 4, 4))
    avg = dcae.channel_average(x, 2)
    np.testing.assert_allclose(
        np.asarray(avg[0, 0]), np.asarray(x[0, :4].mean(axis=0)), rtol=1e-6)
    dup = dcae.channel_duplicate(x[:, :2], 8)
    np.testing.assert_array_equal(np.asarray(dup[0, 0]), np.asarray(dup[0, 1]))
    np.testing.assert_array_equal(np.asarray(dup[0, 0]), np.asarray(x[0, 0]))
    # averaging undoes duplication exactly (the paper's identity-init claim)
    np.testing.assert_allclose(np.asarray(dcae.channel_average(dup, 2)),
                               np.asarray(x[:, :2]), rtol=1e-6)


def test_dcae_shapes_and_downscale():
    cfg = dcae.tiny_dcae_config()
    assert cfg.downscale == 4
    params = dcae.init_dcae_params(jax.random.PRNGKey(0), cfg)
    px = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 16))
    z = dcae.dcae_encode(params, cfg, px)
    assert z.shape == (2, cfg.latent_channels, 4, 4)
    out = dcae.dcae_decode(params, cfg, z)
    assert out.shape == px.shape
    assert jnp.isfinite(out).all()


def test_dcae_full_width_config_consistent():
    """The f32c32 default config builds (init only at tiny spatial size is
    too heavy for CPU CI — just validate the divisibility contracts the
    shortcut math relies on)."""
    cfg = dcae.DCAEConfig()
    assert cfg.downscale == 32
    ws = cfg.widths
    for i in range(len(ws) - 1):
        assert (4 * ws[i]) % ws[i + 1] == 0       # down: unshuffle->average
        rin, rout = ws[len(ws) - 1 - i], ws[len(ws) - 2 - i]
        assert (4 * rout) % rin == 0              # up: duplicate->shuffle
    assert ws[-1] % cfg.latent_channels == 0      # latent avg shortcut
    assert ws[-1] % cfg.latent_channels == 0


def test_dcae_jit_grad():
    cfg = dcae.tiny_dcae_config()
    params = dcae.init_dcae_params(jax.random.PRNGKey(0), cfg)
    px = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8, 8))

    @jax.jit
    def loss(p):
        z = dcae.dcae_encode(p, cfg, px)
        return jnp.mean(dcae.dcae_decode(p, cfg, z) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree.leaves(g)
    assert all(jnp.isfinite(x).all() for x in flat)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)


def test_sana_pipeline_with_dcae():
    """UniGenSanaPipeline drives end-to-end with the DC-AE codec."""
    from unigen_tpu import config as cfg_lib
    from unigen_tpu.models.sana import init_sana_unigen_params
    from unigen_tpu.pipelines.sana import UniGenSanaPipeline

    ae_cfg = dcae.tiny_dcae_config(latent_channels=4)
    ae_params = dcae.init_dcae_params(jax.random.PRNGKey(3), ae_cfg)
    sana_bb = cfg_lib.tiny_sana_config()
    cfg = cfg_lib.UniGenConfig(
        family="sana",
        sana=dataclasses.replace(sana_bb, in_channels=4, out_channels=4),
        control=cfg_lib.ControlConfig(), condition_types=("canny",))
    params = init_sana_unigen_params(jax.random.PRNGKey(4), cfg)

    pipe = UniGenSanaPipeline(
        cfg=cfg, params=params,
        ae_encode=lambda px: dcae.dcae_encode(ae_params, ae_cfg, px),
        ae_decode=lambda z: dcae.dcae_decode(ae_params, ae_cfg, z),
        ae_downscale=ae_cfg.downscale)
    b, t = 1, 5
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    imgs = pipe.generate(
        prompt_embeds=jax.random.normal(ks[0], (b, t, cfg.sana.caption_channels)),
        prompt_mask=jnp.ones((b, t), jnp.int32),
        pooled=jax.random.normal(ks[1], (b, cfg.sana.pooled_projection_dim)),
        cond_pooled=jax.random.normal(ks[2], (b, cfg.sana.pooled_projection_dim)),
        control_pixels=np.zeros((b, 3, 16, 16), np.float32),
        height=16, width=16, num_inference_steps=2)
    assert imgs.shape == (b, 16, 16, 3)
    assert imgs.dtype == np.uint8
