"""Quantized text-encoder serving (ops/quant.quantize_text_tower).

The reference serves every prompt encoder bf16 (/root/reference/infer.py:
115-149). On one v5e the bf16 T5-XXL (~9.4 GiB) cannot co-reside with the
W4A8 12B transformer; ``quantize_text=`` on the pipeline loaders int8/int4-
quantizes the towers, whose matmuls all route through the quant-dispatching
``layers.core.linear`` (Gemma converted from raw ``@ w`` for this).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu.ops import quant

# reuse the fake flux HF checkpoint for the loader wiring test
from tests.test_from_pretrained import fake_ckpt  # noqa: F401


def _closeness(ref, got):
    ref = np.asarray(ref, np.float32).reshape(-1)
    got = np.asarray(got, np.float32).reshape(-1)
    cos = float(np.dot(ref, got) /
                (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-12))
    rel = float(np.linalg.norm(ref - got) / (np.linalg.norm(ref) + 1e-12))
    return cos, rel


def _assert_quantized(tree, key="w_q"):
    found = []
    jax.tree_util.tree_map_with_path(
        lambda p, x: found.append(p) if key in jax.tree_util.keystr(p) else None,
        tree)
    assert found, f"no {key} leaves — quantize_text_tower did nothing"


@pytest.mark.parametrize("bits,key,tol", [(8, "w_q", 0.05), (4, "w_q4", 0.35)])
def test_t5_quantized_encode_close(bits, key, tol):
    from unigen_tpu.models.t5_text import init_t5_params, t5_encode, tiny_t5_config
    cfg = tiny_t5_config()
    params = init_t5_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_text_tower(params, bits=bits, min_dim=1, donate=False)
    _assert_quantized(qparams, key)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    mask = jnp.ones((2, 16), jnp.int32)
    ref = t5_encode(params, cfg, ids, mask)
    got = t5_encode(qparams, cfg, ids, mask)
    cos, rel = _closeness(ref, got)
    assert cos > 0.99 and rel < tol, (cos, rel)


def test_gemma_quantized_encode_close():
    torch = pytest.importorskip("torch")  # noqa: F841 (bridge test helper)
    from tests.test_gemma_text import _tiny_hf
    from unigen_tpu.io.torch_bridge import load_gemma_text
    from unigen_tpu.models.gemma_text import gemma_encode, tiny_gemma_config
    model = _tiny_hf()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = tiny_gemma_config()
    params = load_gemma_text(sd, cfg.num_layers)
    qparams = quant.quantize_text_tower(params, bits=8, min_dim=1, donate=False)
    _assert_quantized(qparams)
    # Gemma's MLP "gate" is a real matmul and MUST quantize (the default
    # skip list is for UniGen control trees with a router gate)
    assert "w_q" in qparams["layers"][0]["gate"]
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 12), 0, cfg.vocab_size)
    ref = gemma_encode(params, cfg, ids)
    got = gemma_encode(qparams, cfg, ids)
    cos, rel = _closeness(ref, got)
    assert cos > 0.99 and rel < 0.1, (cos, rel)


def test_clip_quantized_encode_close():
    from unigen_tpu.models.clip_text import (clip_encode, init_clip_params,
                                             tiny_clip_config)
    cfg = tiny_clip_config()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_text_tower(params, bits=8, min_dim=1, donate=False)
    _assert_quantized(qparams)
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 8), 0, cfg.vocab_size)
    ids = ids.at[:, -1].set(cfg.eos_token_id)
    ref = clip_encode(params, cfg, ids)
    got = clip_encode(qparams, cfg, ids)
    for r, g in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        cos, rel = _closeness(r, g)
        assert cos > 0.99 and rel < 0.1, (cos, rel)


def test_loader_quantize_text_wiring(fake_ckpt, monkeypatch):  # noqa: F811
    """load_flux_pipeline(quantize_text='w8a8') quantizes the T5/CLIP towers
    (min_dim lowered so the tiny fixture widths are eligible) and the encode
    path serves the quantized leaves."""
    from unigen_tpu.models.t5_text import t5_encode
    from unigen_tpu.pipelines.loading import load_flux_pipeline
    monkeypatch.setattr(quant, "TEXT_QUANT_MIN_DIM", 1)
    pipe_fp = load_flux_pipeline(fake_ckpt, condition_types=["canny"],
                                 dtype=jnp.float32)
    pipe_q = load_flux_pipeline(fake_ckpt, condition_types=["canny"],
                                dtype=jnp.float32, quantize_text="w8a8")
    _assert_quantized(pipe_q.t5_params)
    _assert_quantized(pipe_q.clip_params)
    ids = jax.random.randint(jax.random.PRNGKey(0), (1, 8), 0,
                             pipe_q.t5_cfg.vocab_size)
    mask = jnp.ones((1, 8), jnp.int32)
    ref = t5_encode(pipe_fp.t5_params, pipe_fp.t5_cfg, ids, mask)
    got = t5_encode(pipe_q.t5_params, pipe_q.t5_cfg, ids, mask)
    cos, rel = _closeness(ref, got)
    assert cos > 0.99 and rel < 0.1, (cos, rel)


def test_loader_quantize_text_invalid(fake_ckpt):  # noqa: F811
    from unigen_tpu.pipelines.loading import load_flux_pipeline
    with pytest.raises(ValueError, match="quantize_text"):
        load_flux_pipeline(fake_ckpt, condition_types=["canny"],
                           dtype=jnp.float32, quantize_text="int8")
