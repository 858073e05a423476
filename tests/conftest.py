"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compilation cache shared by the in-process tests AND the CLI
# subprocesses the chain tests spawn (env inherited): the same training/
# enhancement programs stop recompiling in every subprocess
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "dvae_tpu", "test-jit"))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-registers the TPU plugin and overrides
# JAX_PLATFORMS; pin the config explicitly so tests run on the virtual
# 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pathlib

import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/data/subset")


@pytest.fixture(scope="session")
def subset_dir() -> pathlib.Path:
    if not REFERENCE_DATA.exists():
        pytest.skip("reference subset data not available")
    return REFERENCE_DATA


# ---------------------------------------------------------------------------
# Two-tier suite: `pytest -m "not slow"` is the <5 min inner loop, the full
# run stays the acceptance gate. The ledger below marks every test measured
# >= 15 s in the round-4 full-suite duration audit (pytest --durations=100;
# e2e CLI chains, subprocess boots, heavy parity/equivalence runs), matched
# by prefix so parametrized variants are covered. serving_cli tests are
# always slow (each boots a serve.py subprocess). Re-audit with
# `pytest --durations=50` when adding heavyweight tests.
SLOW_TESTS = (
    "test_scripts.py::test_m2_info_chain",
    "test_scripts.py::test_train_enhance_metrics_chain",
    "test_scripts.py::test_video_vad_predict_chain",
    "test_scripts.py::test_av_fusion_study_smoke",
    "test_scripts.py::test_audio_vad_predict_chain",
    "test_scripts.py::test_bench_profile_once_worker",
    "test_scripts.py::test_parity_harness_smoke",
    "test_scripts.py::test_std_norm_train_enhance_chain",
    "test_train.py::test_device_data_adversarial_and_semisup_match_host",
    "test_train.py::test_device_data_composes_with_mesh",
    "test_train.py::test_device_data_matches_host_fed",
    "test_train.py::test_adversarial_step_norm",
    "test_train.py::test_fit_vae_resume_restores_optimizer_state",
    "test_train.py::test_adversarial_multi_step_matches_sequential",
    "test_train.py::test_lstm_vad_norm_matches_prenormalized_inputs",
    "test_train.py::test_lstm_vad_step_learns_and_masks_padding",
    "test_train.py::test_gather_step_equals_plain_step",
    "test_train.py::test_legacy_aux_coupling_flips_aux_direction",
    "test_train.py::test_multi_step_dispatch_matches_sequential",
    "test_train.py::test_adversarial_step_trains_both_players",
    "test_train.py::test_fit_vae_steps_per_dispatch_with_mesh",
    "test_train.py::test_semisup_step_alpha_sign_controls_classifier",
    "test_train.py::test_adversarial_step_v4_flat_layout",
    "test_serving.py::test_http_stream_client_disconnect_frees_worker",
    "test_torch_bridge.py::test_training_step_parity_with_reference_stack",
    "test_torch_bridge.py::test_enhancer_runs_from_reference_pt_checkpoint",
    "test_torch_bridge.py::test_fixed_z_em_matches_reference_clean_z_nomcem_engine",
    "test_torch_bridge.py::test_adversarial_training_parity_with_reference_dynamics",
    "test_torch_bridge.py::test_export_cli_produces_reference_loadable_pt",
    "test_mcem.py::test_masked_batch_matches_trimmed_runs",
    "test_mcem.py::test_fast_stats_matches_f32_engine",
    "test_mcem.py::test_mcem_conditional_y",
    "test_mcem.py::test_peem_wf_hybrid_engine",
    "test_mcem.py::test_peem_cost_descends_below_pinned_and_is_deterministic",
    "test_parallel.py::test_two_process_training",
    "test_longform.py::test_enhance_wav_cli_chunked",
    "test_pallas_mcem.py::test_run_mcem_kernel_path_interpret",
    "test_video_vad.py::test_video_vad_shapes_and_finiteness",
    "test_stft.py::test_n_stft_frames_boundary_lengths",
    "test_compat_packages.py::test_stft_istft_reference_signature_roundtrip",
    "test_aux.py::test_svi_objectives",
    "test_torch_bridge.py::test_load_from_pt_file_and_family_mismatch",
    "test_train.py::test_data_parallel_step_matches_single_device",
    "test_train.py::test_fit_vae_on_subset",
    "test_train.py::test_multi_step_dispatch_composes_with_mesh",
    "test_train.py::test_fit_vae_steps_per_dispatch",
    "test_train.py::test_freeze_substring_keeps_params_fixed",
    "test_video_vad.py::test_av_vad_uses_both_modalities",
    "test_video_vad.py::test_av_predict_norm_matches_manual",
    "test_mcem.py::test_silent_utterance_in_batch_stays_finite",
    "test_mcem.py::test_mcem_masks_partition_unity_and_cost_decreases",
    "test_mcem.py::test_masked_batch_matches_trimmed_runs_conditional",
    "test_mcem.py::test_pmcem_partition_cost_and_masked_batch",
    "test_longform.py::test_enhance_chunked_real_engine_partition",
    "test_builders.py::test_build_frame_dataset_schema",
)


def pytest_collection_modifyitems(config, items):
    slow = pytest.mark.slow
    for item in items:
        nodeid = item.nodeid.split("tests/")[-1]
        if nodeid.startswith(SLOW_TESTS) or \
                item.get_closest_marker("serving_cli") is not None:
            item.add_marker(slow)


# ---------------------------------------------------------------------------
# Fast-tier invariant guard — implementation in tests/_fast_tier.py (a
# stdlib-only module so test_fast_tier_guard.py's throwaway mini-suite can
# borrow exactly these hooks without paying a JAX startup); re-exported
# here so pytest discovers them as conftest hooks.
from _fast_tier import (  # noqa: E402,F401
    FAST_TIER_MAX_S,
    pytest_runtest_logreport,
    pytest_sessionfinish,
    pytest_terminal_summary,
)
