"""External golden parity: our JAX CLIP/T5 encoders + torch bridge vs the
REAL HuggingFace transformers implementations (torch CPU), on tiny random
configs. Validates both the model math and the checkpoint name mapping
end-to-end against an independent upstream implementation."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from unigen_tpu.io import torch_bridge as tb
from unigen_tpu.models.clip_text import CLIPTextConfig, clip_encode
from unigen_tpu.models.t5_text import T5Config, t5_encode


def test_clip_text_matches_transformers():
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    hf_cfg = HFConfig(vocab_size=99, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      max_position_embeddings=16, eos_token_id=98,
                      bos_token_id=1, pad_token_id=0)  # eos!=2 avoids HF's legacy argmax-pooling quirk
    torch.manual_seed(0)
    model = CLIPTextModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    cfg = CLIPTextConfig(vocab_size=99, hidden_size=32, intermediate_size=64,
                         num_layers=2, num_heads=4, max_position_embeddings=16,
                         eos_token_id=98)
    params = tb.load_clip_text(sd, cfg.num_layers, dtype=jnp.float32)

    ids = np.array([[1, 5, 6, 7, 98, 0, 0, 0], [1, 9, 98, 0, 0, 0, 0, 0]])
    with torch.no_grad():
        hf_out = model(input_ids=torch.tensor(ids))
    last, _, pooled = clip_encode(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(last),
                               hf_out.last_hidden_state.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled),
                               hf_out.pooler_output.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_t5_encoder_matches_transformers():
    from transformers import T5Config as HFT5Config, T5EncoderModel

    hf_cfg = HFT5Config(vocab_size=99, d_model=32, d_kv=8, d_ff=64,
                        num_layers=2, num_heads=4, relative_attention_num_buckets=8,
                        relative_attention_max_distance=16,
                        feed_forward_proj="gated-gelu", dropout_rate=0.0,
                        is_encoder_decoder=False, use_cache=False)
    torch.manual_seed(0)
    model = T5EncoderModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    cfg = T5Config(vocab_size=99, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_heads=4, relative_attention_num_buckets=8,
                   relative_attention_max_distance=16)
    params = tb.load_t5_encoder(sd, cfg.num_layers, dtype=jnp.float32)

    ids = np.array([[3, 4, 5, 1, 0, 0], [7, 8, 1, 0, 0, 0]])
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        hf_out = model(input_ids=torch.tensor(ids),
                       attention_mask=torch.tensor(mask))
    ours = t5_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    hf = hf_out.last_hidden_state.numpy()
    # compare only unmasked positions (HF zeroes nothing; masked outputs
    # differ only through self-influence which both mask)
    np.testing.assert_allclose(np.asarray(ours)[mask == 1], hf[mask == 1],
                               rtol=3e-4, atol=3e-5)
