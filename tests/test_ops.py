"""Unit tests for core ops: rope, packing, adaln, modulation, attention.

Golden values come from independent numpy re-derivations of the published
algorithms (diffusers semantics the reference relies on), not from the
reference source.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu.layers import adaln
from unigen_tpu.layers.core import init_linear
from unigen_tpu.ops import packing, rope
from unigen_tpu.ops.attention import merge_heads, sdpa_xla, split_heads
from unigen_tpu.ops.modulation import batched_modulated_linear, modulated_linear


# ---------------------------------------------------------------- rope

def _np_rope_1d(pos, dim, theta):
    freqs = 1.0 / theta ** (np.arange(0, dim, 2) / dim)
    ang = pos[:, None] * freqs[None]
    return np.repeat(np.cos(ang), 2, -1), np.repeat(np.sin(ang), 2, -1)


def test_rope_multi_axis_matches_numpy():
    ids = np.stack([np.zeros(12), np.arange(12) // 4, np.arange(12) % 4], -1)
    cos, sin = rope.rope_multi_axis(jnp.asarray(ids), (4, 6, 6), 10000.0)
    parts_c, parts_s = [], []
    for i, d in enumerate((4, 6, 6)):
        c, s = _np_rope_1d(ids[:, i], d, 10000.0)
        parts_c.append(c)
        parts_s.append(s)
    np.testing.assert_allclose(cos, np.concatenate(parts_c, -1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(sin, np.concatenate(parts_s, -1), rtol=1e-5, atol=1e-6)
    assert cos.shape == (12, 16)


def test_apply_rotary_pairwise():
    # rotating (1, 0) pairs by angle t must give (cos t, sin t)
    x = jnp.tile(jnp.array([1.0, 0.0]), (1, 1, 3, 2))  # [1,1,3,4]: two pairs
    t = jnp.array([0.3, 1.1, 2.0])
    cos = jnp.repeat(jnp.cos(t)[:, None], 4, -1)
    sin = jnp.repeat(jnp.sin(t)[:, None], 4, -1)
    out = rope.apply_rotary(x, cos, sin)
    np.testing.assert_allclose(out[0, 0, :, 0], np.cos(t), rtol=1e-6)
    np.testing.assert_allclose(out[0, 0, :, 1], np.sin(t), rtol=1e-6)


def test_rotary_preserves_norm_and_relative_angle():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 3, 8, 16))
    ids = jnp.stack([jnp.zeros(8), jnp.arange(8), jnp.arange(8) * 2], -1)
    cos, sin = rope.rope_multi_axis(ids, (4, 6, 6))
    out = rope.apply_rotary(x, cos, sin)
    np.testing.assert_allclose(jnp.linalg.norm(out, axis=-1),
                               jnp.linalg.norm(x, axis=-1), rtol=1e-5)


# ---------------------------------------------------------------- packing

def test_pack_unpack_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8, 12))
    packed = packing.pack_latents(x)
    assert packed.shape == (2, 4 * 6, 64)
    back = packing.unpack_latents(packed, 8, 12)
    np.testing.assert_array_equal(back, x)


def test_pack_layout_matches_manual():
    # pixel (0,0),(0,1),(1,0),(1,1) of channel c land at token 0 channel c*4+...
    x = jnp.arange(2 * 2 * 4 * 4, dtype=jnp.float32).reshape(2, 2, 4, 4)
    packed = packing.pack_latents(x)
    # token 0 = top-left 2x2 patch, channels ordered (c0 p00 p01 p10 p11, c1 ...)
    expect = [x[0, 0, 0, 0], x[0, 0, 0, 1], x[0, 0, 1, 0], x[0, 0, 1, 1],
              x[0, 1, 0, 0], x[0, 1, 0, 1], x[0, 1, 1, 0], x[0, 1, 1, 1]]
    np.testing.assert_array_equal(packed[0, 0], jnp.array(expect))


def test_latent_image_ids():
    ids = packing.prepare_latent_image_ids(3, 2)
    assert ids.shape == (6, 3)
    np.testing.assert_array_equal(ids[:, 0], np.zeros(6))
    np.testing.assert_array_equal(ids[:, 1], [0, 0, 1, 1, 2, 2])
    np.testing.assert_array_equal(ids[:, 2], [0, 1, 0, 1, 0, 1])
    ids_off = packing.prepare_latent_image_ids(3, 2, offset_w=8)
    np.testing.assert_array_equal(ids_off[:, 2], [8, 9, 8, 9, 8, 9])


def test_patchify_unpatchify_roundtrip():
    """patchify emits conv-im2col layout (c,p,q); unpatchify consumes the SD3
    head layout (p,q,c) — convert between them for a roundtrip."""
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8))
    tokens = packing.patchify(x, 2)
    assert tokens.shape == (2, 16, 16)
    b, s, _ = tokens.shape
    as_pqc = tokens.reshape(b, s, 4, 2, 2).transpose(0, 1, 3, 4, 2).reshape(b, s, 16)
    back = packing.unpatchify(as_pqc, 4, 4, 2, 4)
    np.testing.assert_array_equal(back, x)


def test_patchify_matches_conv_im2col():
    x = jnp.arange(2 * 3 * 4 * 4, dtype=jnp.float32).reshape(2, 3, 4, 4)
    tokens = packing.patchify(x, 2)
    # token 0 = channels-major over the top-left 2x2 patch
    expect = jnp.concatenate([x[0, c, :2, :2].reshape(-1) for c in range(3)])
    np.testing.assert_array_equal(tokens[0, 0], expect)


def test_cropped_pos_embed_center():
    table = jnp.arange(16 * 16 * 2, dtype=jnp.float32).reshape(16 * 16, 2)
    crop = packing.cropped_pos_embed(table, 16, 4, 4)
    t = table.reshape(16, 16, 2)
    np.testing.assert_array_equal(crop.reshape(4, 4, 2), t[6:10, 6:10])


# ---------------------------------------------------------------- adaln

def test_adaln_zero_tokenwise_matches_broadcast():
    """Token-wise temb with identical rows must equal per-sample temb."""
    key = jax.random.PRNGKey(3)
    p = adaln.init_adaln(key, 8, 6)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 8))
    temb = jax.random.normal(jax.random.PRNGKey(5), (2, 8))
    out2d = adaln.adaln_zero(p, x, temb)
    temb3d = jnp.broadcast_to(temb[:, None, :], (2, 5, 8))
    out3d = adaln.adaln_zero(p, x, temb3d)
    for a, b in zip(out2d, out3d):
        a, b = np.asarray(a), np.asarray(b)
        shape = np.broadcast_shapes(a.shape, b.shape)
        np.testing.assert_allclose(np.broadcast_to(a, shape),
                                   np.broadcast_to(b, shape), rtol=2e-5, atol=1e-5)


def test_adaln_continuous_scale_first():
    """AdaLayerNormContinuous chunks (scale, shift) — scale FIRST."""
    p = {"linear": {"w": jnp.zeros((4, 8)), "b": jnp.array([1., 1., 1., 1., 0., 0., 0., 0.])}}
    x = jnp.ones((1, 2, 4)) * jnp.array([1.0, 2.0, 3.0, 4.0])
    temb = jnp.zeros((1, 4))
    out = adaln.adaln_continuous(p, x, temb)
    # scale=1 -> x_norm * 2 + 0
    from unigen_tpu.layers.core import layer_norm
    np.testing.assert_allclose(out, layer_norm(x) * 2.0, rtol=1e-6)


def test_adaln_zero_shift_first():
    p = {"linear": {"w": jnp.zeros((4, 24)),
                    "b": jnp.concatenate([jnp.full((4,), 7.0), jnp.zeros((20,))])}}
    x = jnp.zeros((1, 2, 4))
    out, *_ = adaln.adaln_zero(p, x, jnp.zeros((1, 4)))
    np.testing.assert_allclose(out, jnp.full((1, 2, 4), 7.0))  # shift applied


# ---------------------------------------------------------------- modulation

def test_modulated_linear_matches_reference_math():
    """y[n,o] = sum_i W[o,i] s[n,i] x[n,i] (per-token s)."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 5, 4)).astype(np.float32)
    w_oi = rng.normal(size=(6, 4)).astype(np.float32)   # torch layout [out, in]
    s = rng.normal(size=(3, 5, 4)).astype(np.float32)
    expect = np.einsum("oi,bni,bni->bno", w_oi, s, x)
    got = modulated_linear(jnp.asarray(x), jnp.asarray(w_oi.T), jnp.asarray(s))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_modulated_linear_per_sample_s():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 5, 4)).astype(np.float32)
    w_oi = rng.normal(size=(4, 4)).astype(np.float32)
    s = rng.normal(size=(2, 4)).astype(np.float32)
    expect = np.einsum("oi,bi,bni->bno", w_oi, s, x)
    got = modulated_linear(jnp.asarray(x), jnp.asarray(w_oi.T), jnp.asarray(s))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_batched_modulated_matches_loop():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 7, 4)).astype(np.float32)
    w = rng.normal(size=(3, 4, 6)).astype(np.float32)
    s = rng.normal(size=(3, 7, 4)).astype(np.float32)
    b = rng.normal(size=(3, 6)).astype(np.float32)
    got = batched_modulated_linear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), jnp.asarray(b))
    for e in range(3):
        expect = (x[e] * s[e]) @ w[e] + b[e]
        np.testing.assert_allclose(got[e], expect, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- attention

def test_sdpa_matches_numpy():
    rng = np.random.default_rng(3)
    q = rng.normal(size=(1, 2, 5, 8)).astype(np.float32)
    k = rng.normal(size=(1, 2, 7, 8)).astype(np.float32)
    v = rng.normal(size=(1, 2, 7, 8)).astype(np.float32)
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(8)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    expect = np.einsum("bhqk,bhkd->bhqd", probs, v)
    got = sdpa_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_split_merge_heads_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 5, 12))
    np.testing.assert_array_equal(merge_heads(split_heads(x, 3)), x)
