"""Test configuration: run the whole suite on an 8-device virtual CPU mesh.

Mirrors the reference's strategy of testing distributed logic with localhost
CPU processes (`/root/reference/espnet/test/test_distributed_launch.py`);
for JAX the equivalent is xla_force_host_platform_device_count.

Note: this environment preloads jax with a TPU ('axon') backend via
sitecustomize, so JAX_PLATFORMS in os.environ is not enough — the platform
must be forced through jax.config before the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite compiles many tiny models. The dir
# is topology-namespaced (cpu, 8 devices) — loading an executable cached
# under a different topology hard-aborts the process in XLA's
# deserializer (see utils/runtime.setup)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/agacs_tpu/jax_test/cpu_d8"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()


# ---------------------------------------------------------------------------
# Quick tier: `pytest -m "not slow"` gives a fast green signal (< 5 min);
# the full suite runs everything (~25-30 min on this host). Centralized
# duration-based list (from `--durations` runs) instead of per-file marks so
# the tier stays auditable in one place; tests may also self-mark with
# @pytest.mark.slow.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_SLOW = {
    # file.py::test_name (parameterized ids are matched by original name)
    "test_multiprocess.py::test_two_process_training_parity",
    "test_e2e_recipe.py::test_full_recipe",
    "test_e2e_recipe.py::test_resume",
    "test_e2e_recipe.py::test_int8_trunk_cli_roundtrip",
    "test_e2e_recipe.py::test_orbax_checkpoint_backend",
    "test_task_dispatch.py::test_conformer_train_cli",
    "test_task_dispatch.py::test_transducer_train_and_decode_cli",
    "test_task_dispatch.py::test_dump_attention_cli",
    "test_task_dispatch.py::test_transducer_task_dispatch_and_step",
    "test_trainer.py::test_cast_frozen_params_bf16_training",
    "test_trainer.py::test_train_step_dp_sharded",
    "test_trainer.py::test_grad_accum_matches_big_batch",
    "test_trainer.py::test_estimate_c_trains_under_adapter_preset",
    "test_trainer.py::test_tp_sharding_applies_to_production_dims",
    "test_trainer.py::test_optim_state_shard_full_ft_parity",
    "test_int8_linear.py::test_train_step_int8_accum_grad",
    "test_int8_linear.py::test_train_step_int8_under_remat",
    "test_int8_linear.py::test_train_step_int8_trunk",
    "test_transducer.py::test_transducer_asr_train_smoke",
    "test_transducer.py::test_rnnt_loss_grad_and_fastemit",
    "test_transducer.py::test_transducer_train_step_dp_sharded",
    "test_transducer.py::test_decoder_cell_matches_torch",
    "test_transducer.py::test_greedy_and_beam_recover_overfit_sequence",
    "test_transducer_oracle.py::test_beams_match_reference_1best",
    "test_transducer_oracle.py::test_greedy_matches_reference",
    "test_transducer_oracle.py::test_nsc_maes_match_reference_pool",
    "test_composed_beam.py::test_composition_parity_ctc_lm",
    "test_composed_beam.py::test_composition_parity_attention_only",
    "test_composed_beam.py::test_composition_parity_with_ngram",
    "test_conformer.py::test_interctc",
    "test_conformer.py::test_conformer_batchnorm_train_and_calibrate",
    "test_conformer.py::test_conformer_train_step_dp_sharded",
    "test_conformer.py::test_hybrid_train_step_decreases_loss",
    "test_side_network.py::test_side_network_training_with_freeze",
    "test_side_network.py::test_side_network_forward_shapes",
    "test_decode.py::test_decode_dp_sharded_int8_cross",
    "test_decode.py::test_decode_dp_sharded_kernel_path",
    "test_decode.py::test_beam_with_side_network",
    "test_decode.py::test_beam_with_pe_attention",
    "test_lm.py::test_lm_calc_perplexity_cli",
    "test_lm.py::test_lm_train_cli",
    "test_lm.py::test_lm_overfits_short_corpus",
    "test_transcribe.py::test_temperature_fallback_and_word_timestamps",
    "test_transcribe.py::test_transcribe_long_form",
    "test_cs_steering.py::test_cs_loss_steers_language_pattern_layer2",
    "test_cs_steering.py::test_cs_loss_steers_early_layer_to_zero",
    "test_cs_loss.py::test_lid_ce_forward_trains",
    "test_losses.py::test_asr_nll_matches_manual_ce",
    "test_ngram.py::test_ngram_fusion_changes_beam",
    "test_whisper_model.py::test_unroll_layers_matches_scan",
    "test_trainer_parity.py::test_training_trajectory_matches_reference",
    "test_trainer_parity.py::test_training_trajectory_matches_reference_pe",
    "test_trainer_parity.py::test_training_trajectory_matches_reference_side",
    "test_timing.py::test_find_word_alignment_end_to_end",
    "test_attention_ops.py::test_packed_flash_chunked_grad_parity",
    "test_attention_ops.py::test_packed_flash_spmd_batch_sharding",
    "test_whisper_model.py::test_pe_attention_parity",
    "test_whisper_model.py::test_decoder_only_pe_parity",
    "test_transcribe.py::test_timestamp_rules_hold",
    "test_transcribe.py::test_transcribe_detects_language",
    "test_transducer.py::test_tsd_beam_search_batched",
    "test_transducer.py::test_alsd_beam_search_batched",
    "test_transducer.py::test_greedy_advance_on_emit_reference_semantics",
    "test_transducer.py::test_decoder_step_matches_teacher_forced",
    "test_transducer.py::test_greedy_scan_matches_while_loop",
    "test_decode_kernel_integration.py::test_whisper_step_kernel_matches_xla",
    "test_conformer.py::test_transformer_decoder_cached_step_matches_full",
    "test_side_network.py::test_side_network_cached_decode_matches_full",
    "test_composed_beam.py::test_scan_loop_matches_while",
    "test_flac_ark.py::test_real_clip_greedy_parity_vs_torch_oracle",
    "test_joint_beam.py::test_wider_beam_not_worse",
    "test_joint_beam.py::test_joint_beam_with_ctc_runs_and_scores",
    "test_joint_beam.py::test_attention_only_beam1_is_greedy",
    "test_ngram.py::test_ngram_matches_oracle",
    "test_decode.py::test_decode_dp_sharded_matches_single",
    "test_lm.py::test_lm_loss_and_ppl",
    "test_transducer.py::test_default_beam_lm_fusion",
    "test_conformer.py::test_conformer_encoder_shapes_and_padding_invariance",
    "test_whisper_model.py::test_conv1d_matmul_matches_lax_conv",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = getattr(item, "originalname", None) or item.name
        key = f"{item.fspath.basename}::{name}"
        if key in _SLOW:
            item.add_marker(pytest.mark.slow)


# NOTE (round 5): the round-4 module-scoped jax.clear_caches() fixture —
# a crutch against vm.max_map_count exhaustion when ONE process compiled
# the whole suite's 1500+ executables — is gone. The supported full-suite
# runner is now process-sharded (pytest -n auto --dist loadfile; see
# pytest.ini addopts note), which removes the failure class by
# construction and cuts the wall time with it. The quick tier is small
# enough either way.
