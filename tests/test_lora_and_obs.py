"""LoRA expert fold-in + observability utilities."""

import logging

import jax
import jax.numpy as jnp
import numpy as np

from unigen_tpu import config as cfg_lib, observability as obs
from unigen_tpu.models import lora


def _tiny_params():
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    flux = cfg_lib.tiny_flux_config()
    cfg = cfg_lib.UniGenConfig(family="flux", flux=flux, condition_types=("canny",))
    return cfg, init_unigen_flux_params(jax.random.PRNGKey(0), cfg)


def test_lora_zero_init_is_identity():
    cfg, params = _tiny_params()
    adapters = lora.init_lora_adapters(
        jax.random.PRNGKey(1), params["control"],
        targets=["attn.to_q", "attn.to_v", "ff.fc1"], rank=2,
        adapter_names=["canny", "depth"])
    folded = lora.fold_adapter(params["control"], adapters, "canny")
    # B is zero-init -> folding changes nothing
    for a, b in zip(jax.tree.leaves(params["control"]), jax.tree.leaves(folded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lora_fold_math_and_switching():
    cfg, params = _tiny_params()
    adapters = lora.init_lora_adapters(
        jax.random.PRNGKey(1), params["control"], targets=["attn.to_q"],
        rank=2, adapter_names=["canny", "depth"])
    # give 'depth' a non-zero delta
    key = next(iter(adapters["depth"]))
    ab = adapters["depth"][key]
    adapters["depth"][key] = {"a": ab["a"],
                              "b": jnp.ones_like(ab["b"]) * 0.1}
    folded = lora.fold_condition_experts(params["control"], adapters, "depth",
                                         scale=2.0)
    w0 = params["control"]["double_blocks"]["attn"]["to_q"]["w"]
    w1 = folded["double_blocks"]["attn"]["to_q"]["w"]
    expect = w0 + 2.0 * jnp.einsum("...ir,...ro->...io", ab["a"],
                                   jnp.ones_like(ab["b"]) * 0.1)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(expect), rtol=1e-5)
    # canny stays identity
    folded_c = lora.fold_condition_experts(params["control"], adapters, "canny")
    np.testing.assert_array_equal(
        np.asarray(folded_c["double_blocks"]["attn"]["to_q"]["w"]),
        np.asarray(w0))


def test_enable_lora_context():
    cfg, params = _tiny_params()
    adapters = lora.init_lora_adapters(jax.random.PRNGKey(1), params["control"],
                                       ["attn.to_q"], 2, ["canny"])
    with lora.enable_lora(params["control"], adapters, ["canny"]) as folded:
        assert folded is not None
    flat = lora.merge_for_export(adapters, "canny")
    assert any(k.endswith(".lora_a") for k in flat)


def test_expert_histogram():
    h = obs.expert_histogram(jnp.array([10, 10, 10, 10]))
    assert h["moe/imbalance"] == 1.0 and h["moe/empty_experts"] == 0
    h = obs.expert_histogram(jnp.array([40, 0, 0, 0]))
    assert h["moe/imbalance"] == 4.0 and h["moe/empty_experts"] == 3


def test_param_report_and_logging(tmp_path):
    logger = obs.setup_logging(str(tmp_path))
    stats = obs.param_report({"w": jnp.ones((10, 10))}, "test")
    assert stats["params"] == 100
    obs.log_step_metrics(logger, 3, {"loss": jnp.asarray(1.5),
                                     "expert_counts": jnp.array([5, 5])})


def test_replica_consistency_single_device():
    x = jnp.ones((4, 4))
    obs.assert_replica_consistency(x)  # single shard -> trivially consistent
