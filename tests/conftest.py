"""Test env: CPU backend with 8 virtual devices (the JAX-native fake cluster).

Must run before jax initialises — pytest imports conftest first.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env presets axon; must override, not setdefault
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import pytest  # noqa: E402

# ---------------------------------------------------------------- two tiers
# The full suite costs ~1 h on this 1-core box (344 tests, round-4 measure);
# the default run excludes the heavy serving/e2e-equivalence tests so
# iteration stays ~15 min (pyproject addopts = -m "not heavy"). Run the FULL
# matrix with:  python -m pytest tests/ -q -m "heavy or not heavy"
# (the CLI -m overrides the addopts default; do this before any snapshot).
# Membership = every test function that cost >=30 s in the measured full run
# (durations sum over call+setup+teardown, parametrized variants pooled) —
# re-measure with --durations=0 when adding slow tests.
_HEAVY = {
    ("test_cli_smoke.py", "test_example_demo"),
    ("test_multiprocess.py", "test_two_process_distributed_trainer"),
    ("test_cli_smoke.py", "test_measure_fidelity_sana_ckpt"),
    ("test_cli_smoke.py", "test_measure_fidelity_sana_hybrid_cache"),
    ("test_cli_smoke.py", "test_measure_fidelity_sana_model_cache"),
    ("test_cli_smoke.py", "test_measure_fidelity_sd3_ckpt"),
    ("test_config_paths.py", "test_consis_module_path"),
    ("test_control_cache.py", "test_adaptive_hybrid_pipeline_modes"),
    ("test_control_cache.py", "test_flux_cfg_cache_refresh_every_step_equals_exact"),
    ("test_control_cache.py", "test_hybrid_equals_model_cache_when_control_off"),
    ("test_control_cache.py", "test_hybrid_matches_manual_composition"),
    ("test_control_cache.py", "test_hybrid_with_true_cfg_and_order1_runs"),
    ("test_control_cache.py", "test_model_cache_with_true_cfg_runs"),
    ("test_control_cache.py", "test_multi_condition_model_cache_runs"),
    ("test_control_cache.py", "test_pipeline_cache_interval_plumbing_identity"),
    ("test_control_cache.py", "test_pipeline_cache_matches_manual_composition"),
    ("test_control_cache.py", "test_pipeline_residual_bits4_hybrid"),
    ("test_control_cache.py", "test_return_residuals_does_not_perturb_pred"),
    ("test_control_cache.py", "test_sana_pipeline_residual_bits8"),
    ("test_control_cache.py", "test_sd3_hybrid_cache_runs"),
    ("test_control_cache.py", "test_sd3_pipeline_residual_bits8"),
    ("test_control_cache.py", "test_sd3_replay_same_state_is_exact"),
    ("test_control_cache.py", "test_sd3_sana_adaptive_hybrid_runs"),
    ("test_control_cache.py", "test_sd3_sana_model_cache_order1_runs"),
    ("test_data_and_train.py", "test_trainer_multi_condition_step"),
    ("test_data_and_train.py", "test_trainer_two_steps"),
    ("test_depth_model.py", "test_depth_anything_matches_transformers"),
    ("test_entry_contract.py", "test_pipeline_true_cfg_and_subject_offset"),
    ("test_from_pretrained.py", "test_validate_real_ckpt_harness"),
    ("test_grad_accum.py", "test_grad_accumulation_updates_at_boundary"),
    ("test_grad_accum.py", "test_remat_policy_equivalence"),
    ("test_grad_accum.py", "test_split_trainable_roundtrip_and_split_train_step"),
    ("test_lora_and_obs.py", "test_pipeline_switching_on_quantized_tree"),
    ("test_lora_training.py", "test_lora_train_step_learns"),
    ("test_lora_training.py",
     "test_lora_trainer_checkpoints_and_exports_reference_format"),
    ("test_lora_training.py", "test_train_cli_lora_end_to_end"),
    ("test_parallel.py", "test_sequence_parallel_train_step"),
    ("test_quant.py", "test_tiny_model_int8_forward_close"),
    ("test_sana_pipeline.py", "test_sana_pipeline_end_to_end_tiny"),
    ("test_serve_cli.py", "test_serve_cli_adaptive_lag_demo_and_validation"),
    ("test_serve_cli.py", "test_serve_cli_end_to_end"),
    ("test_serve_cli.py", "test_serve_cli_multi_resolution"),
    ("test_serve_cli.py", "test_serve_cli_sd3_step_server"),
    ("test_serve_cli.py", "test_serve_cli_step_server_adaptive_demo"),
    ("test_serve_cli.py", "test_serve_cli_step_server_warmup"),
    ("test_serving_steps.py",
     "test_multires_step_server_routes_and_matches_pipeline"),
    ("test_serving_steps.py", "test_sana_step_server_matches_pipeline"),
    ("test_serving_steps.py", "test_step_server_adaptive_matches_pipeline"),
    ("test_serving_steps.py", "test_step_server_hybrid_cache_matches_pipeline"),
    ("test_serving_steps.py", "test_step_server_matches_pipeline"),
    ("test_serving_steps.py", "test_step_server_model_cache_matches_pipeline"),
    ("test_serving_steps.py", "test_step_server_multi_tick_matches_pipeline"),
    ("test_serving_steps.py", "test_step_server_per_request_knobs"),
    ("test_serving_steps.py",
     "test_step_server_quantized_residuals_matches_pipeline"),
    ("test_serving_steps.py", "test_step_server_sd3_matches_pipeline"),
    ("test_serving_steps.py", "test_step_server_sd3_mixed_guidance"),
    ("test_serving_steps.py", "test_step_server_sd3_sharded_matches_pipeline"),
    ("test_serving_steps.py", "test_step_server_sharded_matches_pipeline"),
    ("test_tp_inference.py",
     "test_sharded_pipeline_generate_matches_single_device"),
    ("test_tp_inference.py", "test_sharded_sd3_pipeline_matches_single_device"),
    ("test_trainer_sharded.py",
     "test_trainer_sharded_lora_mode_matches_single_device"),
    ("test_trainer_sharded.py", "test_trainer_sharded_matches_single_device"),
    ("test_unigen_flux.py", "test_bf16_forward_with_f32_scale_schedule"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = (item.path.name, item.name.split("[")[0])
        if key in _HEAVY:
            item.add_marker(pytest.mark.heavy)
    # Default-tier deselection applies ONLY to whole-suite runs: explicit
    # -m/-k win, and targeted file/node-id invocations keep their heavy
    # tests (an earlier filter silently deselected explicitly-named tests —
    # `pytest tests/test_serving_steps.py` ran nothing of the equivalence
    # suite while looking green; same failure mode for -k <heavy-test>).
    if config.getoption("-m") or config.getoption("-k"):
        return
    targeted = any(
        "::" in str(a) or str(a).rstrip("/").endswith(".py")
        for a in config.invocation_params.args)
    if targeted:
        return
    deselected = [it for it in items if it.get_closest_marker("heavy")]
    if deselected:
        config.hook.pytest_deselected(items=deselected)
        items[:] = [it for it in items if not it.get_closest_marker("heavy")]

# The environment force-registers the axon TPU plugin (JAX_PLATFORMS=axon via
# sitecustomize); the env var alone does not stick — set the config directly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/unigen_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
