"""Pallas kernel correctness in interpret mode (runs on CPU) and gradient
path checks. Hardware timings live in the bench; these tests pin the math."""

import importlib
import os

import numpy as np
import pytest


@pytest.fixture()
def flash_mod(monkeypatch):
    monkeypatch.setenv("UNIGEN_PALLAS_INTERPRET", "1")
    import unigen_tpu.ops.pallas.flash_attention as fa
    importlib.reload(fa)
    yield fa
    monkeypatch.delenv("UNIGEN_PALLAS_INTERPRET")
    importlib.reload(fa)


def test_flash_attention_matches_xla_interpret(flash_mod):
    import jax, jax.numpy as jnp
    from unigen_tpu.ops.attention import sdpa_xla
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 200, 128))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 150, 128))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 150, 128))
    out = flash_mod.flash_attention(q, k, v)
    ref = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_attention_rope_matches_interpret(flash_mod):
    import jax, jax.numpy as jnp
    from unigen_tpu.ops.attention import sdpa_xla
    from unigen_tpu.ops.rope import apply_rotary, rope_multi_axis
    s = 160
    ids = jnp.stack([jnp.zeros(s), jnp.arange(s) // 8, jnp.arange(s) % 8], -1)
    cos, sin = rope_multi_axis(ids, (16, 56, 56))
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, s, 128))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, s, 128))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, s, 128))
    out = flash_mod.flash_attention_rope(q, k, v, cos, sin, cos, sin)
    ref = sdpa_xla(apply_rotary(q, cos, sin), apply_rotary(k, cos, sin), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_flash_gradients_match_xla(flash_mod):
    import jax, jax.numpy as jnp
    from unigen_tpu.ops.attention import sdpa_xla
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 128, 128))

    g1 = jax.grad(lambda x: flash_mod.flash_attention(x, x, x).sum())(q)
    g2 = jax.grad(lambda x: sdpa_xla(x, x, x).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("sq,skv,d", [(64, 64, 64), (130, 257, 128),
                                      (777, 333, 128)])
def test_flash_attention_odd_shapes(flash_mod, sq, skv, d):
    import jax
    from unigen_tpu.ops.attention import sdpa_xla
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, sq, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, skv, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, skv, d))
    out = flash_mod.flash_attention(q, k, v)
    ref = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_streaming_kernels_match_xla(flash_mod):
    import jax, jax.numpy as jnp
    from unigen_tpu.ops.attention import sdpa_xla
    from unigen_tpu.ops.rope import apply_rotary, rope_multi_axis
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 700, 128))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2500, 128))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 2500, 128))
    out = flash_mod.flash_attention_streaming(q, k, v)
    ref = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def tables(s):
        ids = jnp.stack([jnp.zeros(s), jnp.arange(s) // 8, jnp.arange(s) % 8], -1)
        return rope_multi_axis(ids, (16, 56, 56))

    cos, sin = tables(700)
    kcos, ksin = tables(2500)
    out = flash_mod.flash_attention_streaming_rope(q, k, v, cos, sin, kcos, ksin)
    ref = sdpa_xla(apply_rotary(q, cos, sin), apply_rotary(k, kcos, ksin), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_kv_blocked_backward_matches_xla(flash_mod, monkeypatch):
    """The VMEM-bounded kv-blocked backward (LSE pass + dq/dkv block
    kernels) — the path long-KV shapes take where the full-KV backward
    refuses (skv 2560 at the 512² train step, any 1024² stream). Forced
    here on small shapes via the gate + shrunk block sizes so padding,
    multi-block accumulation, and both rope table kinds are exercised."""
    import jax, jax.numpy as jnp
    from unigen_tpu.ops.attention import sdpa_xla
    from unigen_tpu.ops.rope import apply_rotary, rope_multi_axis
    monkeypatch.setattr(flash_mod, "_bwd_supported", lambda *a: False)
    monkeypatch.setattr(flash_mod, "BQ_BWD_BLK", 128)
    monkeypatch.setattr(flash_mod, "BK_BWD_BLK", 128)
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 200, 128))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 300, 128))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 300, 128))
    g = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 200, 128))

    # plain full-KV entry point -> blocked bwd (gate forced off)
    gp = jax.grad(lambda *a: jnp.sum(flash_mod.flash_attention(*a) * g),
                  (0, 1, 2))(q, k, v)
    gx = jax.grad(lambda *a: jnp.sum(sdpa_xla(*a) * g), (0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    # streaming entry point (always blocked bwd now)
    gp = jax.grad(lambda *a: jnp.sum(
        flash_mod.flash_attention_streaming(*a) * g), (0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    def tables(s):
        ids = jnp.stack([jnp.zeros(s), jnp.arange(s) // 8,
                         jnp.arange(s) % 8], -1)
        return rope_multi_axis(ids, (16, 56, 56))

    cos, sin = tables(200)
    kcos, ksin = tables(300)
    # KV-append style: identity rotation rows on the appended tail
    kcos = jnp.concatenate([kcos[:230], jnp.ones((70, 128))])
    ksin = jnp.concatenate([ksin[:230], jnp.zeros((70, 128))])
    gx = jax.grad(lambda *a: jnp.sum(
        sdpa_xla(apply_rotary(a[0], cos, sin),
                 apply_rotary(a[1], kcos, ksin), a[2]) * g),
        (0, 1, 2))(q, k, v)
    for entry in (flash_mod.flash_attention_rope,
                  flash_mod.flash_attention_streaming_rope):
        gp = jax.grad(lambda *a: jnp.sum(
            entry(*a, cos, sin, kcos, ksin) * g), (0, 1, 2))(q, k, v)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)


def test_flash_backward_kernels_match_xla(flash_mod):
    """Fused dq/dk/dv backward (plain + rope + KV-append identity rows)."""
    import jax, jax.numpy as jnp
    from unigen_tpu.ops.attention import sdpa_xla
    from unigen_tpu.ops.rope import apply_rotary, rope_multi_axis
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 150, 128))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 260, 128))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 260, 128))
    g = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 150, 128))

    gp = jax.grad(lambda *a: jnp.sum(flash_mod.flash_attention(*a) * g),
                  (0, 1, 2))(q, k, v)
    gx = jax.grad(lambda *a: jnp.sum(sdpa_xla(*a) * g), (0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    def tables(s):
        ids = jnp.stack([jnp.zeros(s), jnp.arange(s) // 8, jnp.arange(s) % 8], -1)
        return rope_multi_axis(ids, (16, 56, 56))

    cos, sin = tables(150)
    kcos, ksin = tables(260)
    # KV-append style: identity rotation rows on the appended tail
    kcos = jnp.concatenate([kcos[:220], jnp.ones((40, 128))])
    ksin = jnp.concatenate([ksin[:220], jnp.zeros((40, 128))])
    gp = jax.grad(lambda *a: jnp.sum(
        flash_mod.flash_attention_rope(*a, cos, sin, kcos, ksin) * g),
        (0, 1, 2))(q, k, v)
    gx = jax.grad(lambda *a: jnp.sum(
        sdpa_xla(apply_rotary(a[0], cos, sin),
                 apply_rotary(a[1], kcos, ksin), a[2]) * g), (0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
