"""Gemma-2 encoder golden vs transformers Gemma2Model (the SANA prompt
encoder)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from unigen_tpu.io.torch_bridge import load_gemma_text
from unigen_tpu.models.gemma_text import gemma_encode, tiny_gemma_config


def _tiny_hf():
    from transformers import Gemma2Config, Gemma2Model
    cfg = Gemma2Config(vocab_size=128, hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, head_dim=8,
                       query_pre_attn_scalar=8, sliding_window=16,
                       attn_implementation="eager")
    torch.manual_seed(0)
    return Gemma2Model(cfg).eval()


def test_gemma_encode_matches_transformers():
    model = _tiny_hf()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = tiny_gemma_config()
    params = load_gemma_text(sd, cfg.num_layers)

    ids = np.array([[3, 17, 99, 4, 2, 2], [5, 8, 1, 2, 2, 2]])
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 0, 0, 0]])
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    got = np.asarray(gemma_encode(params, cfg, jnp.asarray(ids),
                                  jnp.asarray(mask)))
    # padded positions are garbage in both; compare the valid prefix
    for b, n in enumerate([4, 3]):
        np.testing.assert_allclose(got[b, :n], ref[b, :n], rtol=2e-4, atol=2e-4)


def test_gemma_sliding_window_masking():
    """Sequences longer than the window still run (even layers mask)."""
    model = _tiny_hf()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = tiny_gemma_config()
    params = load_gemma_text(sd, cfg.num_layers)
    ids = np.arange(40)[None] % 120
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    got = np.asarray(gemma_encode(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)
