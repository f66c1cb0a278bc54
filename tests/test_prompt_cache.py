"""Prompt-embedding LRU cache (pipelines/caching.PromptLRU + the
``prompt_cache_size`` knob): serving repeats the negative prompt and the
condition task name every request; the reference re-runs the full
text-encoder stack each time (beyond parity — no counterpart file)."""

import jax
import jax.numpy as jnp
import numpy as np

from unigen_tpu import config as cfg_lib
from unigen_tpu.pipelines.caching import PromptLRU


def test_lru_hit_miss_eviction():
    calls = []

    def make(v):
        def fn():
            calls.append(v)
            return v
        return fn

    c = PromptLRU(capacity=2)
    assert c.get_or("a", make(1)) == 1
    assert c.get_or("a", make(99)) == 1          # hit: compute not called
    assert calls == [1]
    assert c.get_or("b", make(2)) == 2
    assert c.get_or("c", make(3)) == 3           # evicts "a" (LRU)
    assert c.get_or("a", make(4)) == 4           # miss again
    assert calls == [1, 2, 3, 4]
    assert c.hits == 1 and c.misses == 4
    # "b" was evicted by the re-computed "a" (capacity 2 holds {c, a})
    assert c.get_or("c", make(9)) == 3           # "c" still resident


def test_lru_capacity_zero_is_passthrough():
    c = PromptLRU(capacity=0)
    calls = []
    for _ in range(3):
        c.get_or("k", lambda: calls.append(0))
    assert len(calls) == 3 and c.hits == 0


class _StubTokenizer:
    """Mimics a transformers tokenizer: returns deterministic int ids."""

    def __init__(self, vocab):
        self.vocab = vocab
        self.calls = 0

    def __call__(self, prompts, padding=None, max_length=None,
                 truncation=None, return_tensors=None):
        self.calls += 1
        ids = np.zeros((len(prompts), max_length), np.int32)
        for i, p in enumerate(prompts):
            for j, ch in enumerate(p[:max_length]):
                ids[i, j] = (ord(ch) % (self.vocab - 1)) + 1

        class R:
            input_ids = ids
            attention_mask = (ids != 0).astype(np.int32)
        return R()


def test_flux_pipeline_prompt_cache_end_to_end():
    """Identical prompts hit the cache (tokenizer+encoders not re-run) and
    return the SAME arrays; different prompts and lengths miss."""
    from unigen_tpu.models.clip_text import init_clip_params, tiny_clip_config
    from unigen_tpu.models.t5_text import init_t5_params, tiny_t5_config
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.pipelines.flux import UniGenFluxPipeline

    flux = cfg_lib.tiny_flux_config()
    cfg = cfg_lib.UniGenConfig(family="flux", flux=flux,
                               condition_types=("canny",))
    ccfg = tiny_clip_config(hidden_size=flux.pooled_projection_dim,
                            intermediate_size=2 * flux.pooled_projection_dim)
    tcfg = tiny_t5_config(d_model=flux.joint_attention_dim)
    tok = _StubTokenizer(ccfg.vocab_size)
    tok2 = _StubTokenizer(tcfg.vocab_size)
    pipe = UniGenFluxPipeline(
        cfg=cfg, params=init_unigen_flux_params(jax.random.PRNGKey(0), cfg),
        clip_cfg=ccfg,
        clip_params=init_clip_params(jax.random.PRNGKey(1), ccfg),
        t5_cfg=tcfg, t5_params=init_t5_params(jax.random.PRNGKey(2), tcfg),
        tokenizer=tok, tokenizer_2=tok2, dtype=jnp.float32,
        prompt_cache_size=4)

    e1, p1 = pipe.encode_prompt("a cat", max_sequence_length=16)
    n_tok = tok.calls
    e2, p2 = pipe.encode_prompt("a cat", max_sequence_length=16)
    assert tok.calls == n_tok                    # cache hit: no re-tokenize
    assert e1 is e2 and p1 is p2
    _ = pipe.encode_prompt("a dog", max_sequence_length=16)
    assert tok.calls == n_tok + 1                # miss
    _ = pipe.encode_prompt("a cat", max_sequence_length=32)
    assert tok.calls == n_tok + 2                # length is part of the key

    c1 = pipe.encode_condition_prompt("canny")
    n_tok = tok.calls
    c2 = pipe.encode_condition_prompt("canny")
    assert tok.calls == n_tok and c1 is c2
    # batch form keys on the prompt TUPLE
    _ = pipe.encode_condition_prompt(["canny", "depth"])
    assert tok.calls == n_tok + 1
    assert pipe._prompt_cache.hits >= 2


def test_flux_pipeline_cache_disabled_by_default():
    from unigen_tpu.models.clip_text import init_clip_params, tiny_clip_config
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.pipelines.flux import UniGenFluxPipeline

    flux = cfg_lib.tiny_flux_config()
    cfg = cfg_lib.UniGenConfig(family="flux", flux=flux,
                               condition_types=("canny",))
    ccfg = tiny_clip_config(hidden_size=flux.pooled_projection_dim,
                            intermediate_size=2 * flux.pooled_projection_dim)
    tok = _StubTokenizer(ccfg.vocab_size)
    pipe = UniGenFluxPipeline(
        cfg=cfg, params=init_unigen_flux_params(jax.random.PRNGKey(0), cfg),
        clip_cfg=ccfg,
        clip_params=init_clip_params(jax.random.PRNGKey(1), ccfg),
        tokenizer=tok, dtype=jnp.float32)
    _ = pipe.encode_condition_prompt("canny")
    _ = pipe.encode_condition_prompt("canny")
    assert tok.calls == 2                        # no caching by default
