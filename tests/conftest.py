"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard TPU-less way to test pjit/sharding code paths
(SURVEY.md §4): the XLA host platform is split into 8 virtual devices
before JAX initializes.
"""

import os

# Force CPU for tests even if the environment pre-registers a TPU platform
# (the axon sitecustomize imports jax before conftest runs, so the env var
# alone is not enough — set the config knob too, before any backend use).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)


@pytest.fixture
def key():
    return jax.random.PRNGKey(42)


# ---------------------------------------------------------------------------
# Slow tier (VERDICT r3 item 7). One central list instead of decorators
# scattered over 13 files; entries are (file, bare test name) — a bare name
# marks every parametrization. Measured cutoff: >= 15 s per call on the
# 1-core CI box (full durations table: `pytest -q --durations=0`).
# Dev loop: `pytest -q` (slow deselected by addopts, < 10 min).
# Full battery (CI / judge): `pytest -q -m ''`.
# Deliberately kept fast despite >= 15 s: test_loss_decreases_over_steps
# (the only fast learning-dynamics smoke) and test_data_parallel_8_devices
# (the CLAUDE.md global-batch mesh-equality invariant).
_SLOW = {
    ("test_architectures.py", "test_architecture_one_step"),
    ("test_data.py", "test_mdl_score_accepts_uint8_batches"),
    ("test_data.py", "test_train_step_accepts_uint8_batch"),
    ("test_integration.py", "test_rep_gan_fits_gaussian"),
    ("test_metrics.py", "test_generative_model_metric_end_to_end"),
    ("test_metrics.py", "test_ref_stats_and_intra_fid"),
    ("test_multihost.py", "test_four_process_training_matches_single_process"),
    ("test_multihost.py", "test_two_process_training_matches_single_process"),
    ("test_network.py", "test_conditional_generator"),
    ("test_network.py", "test_nonlocal_block_layer"),
    ("test_network.py", "test_res_block_layer"),
    ("test_network.py", "test_sngan_gradients_flow"),
    ("test_pallas_mmd.py", "test_gradients_match_reference"),
    ("test_parallel.py",
     "test_device_dataset_sharded_same_class_shuffled_vs_replicated"),
    ("test_parallel.py", "test_device_dataset_sharded_same_class_vs_replicated"),
    ("test_parallel.py", "test_device_dataset_sharded_vs_replicated"),
    ("test_parallel.py", "test_mesh_equality_conditional"),
    ("test_parallel.py", "test_mesh_equality_conditional_gp"),
    ("test_parallel.py", "test_mesh_equality_dynamic_imbalanced_scan"),
    ("test_parallel.py", "test_mesh_equality_fsdp_data_axis"),
    ("test_parallel.py", "test_mesh_equality_model_parallel_2d"),
    ("test_parallel.py", "test_mesh_equality_rmb_ds"),
    ("test_parallel.py", "test_mesh_equality_rmb_gp"),
    ("test_tf1_crossval.py", "test_conditional_ops_match_reference"),
    ("test_tf1_crossval.py", "test_full_cifar_architecture_matches_reference"),
    ("test_tf1_crossval.py", "test_loss_gradients_match_reference_code"),
    ("test_tf1_crossval.py", "test_losses_match_reference_code"),
    ("test_tf1_crossval.py", "test_misc_ops_match_reference"),
    ("test_tf1_crossval.py", "test_outputs_match_reference"),
    ("test_tf1_crossval.py", "test_res_and_nonlocal_blocks_match_reference"),
    ("test_tf1_train_step_crossval.py",
     "test_conditional_train_step_matches_reference"),
    ("test_tf1_train_step_crossval.py",
     "test_loss_curve_matches_reference_5_steps"),
    ("test_tf1_train_step_crossval.py",
     "test_mmd_gradient_penalty_matches_reference"),
    ("test_tf1_train_step_crossval.py",
     "test_mmd_gradient_scale_matches_reference"),
    ("test_tf1_train_step_crossval.py", "test_train_step_matches_reference"),
    ("test_tf_graph_jax.py", "test_executor_on_default_backend_subprocess"),
    ("test_train.py", "test_conditional_cifar_architecture_trains"),
    ("test_train.py", "test_conditional_gradient_penalty_trains"),
    ("test_train.py", "test_every_loss_type_trains"),
    ("test_train.py", "test_device_data_step_micro_batches_equals_fused_on_mesh"),
    ("test_train.py", "test_grad_accum_step_equals_fused"),
    ("test_train.py", "test_grad_accum_step_penalty_loss_data_parallel"),
    ("test_train.py", "test_gradient_penalty_loss"),
    ("test_train.py", "test_graft_dryrun_multichip_inprocess"),
    ("test_train.py", "test_graft_dryrun_multichip_subprocess_like_driver"),
    ("test_train.py", "test_imbalanced_update_freezes_params"),
    ("test_train.py", "test_multi_step_equals_sequential"),
    ("test_train.py", "test_sn_only_loss_types"),
    ("test_train.py", "test_stateful_loss_state_evolves_through_scan"),
    ("test_trainer.py", "test_agent_divergence_guard"),
    ("test_trainer.py", "test_agent_multi_step_path"),
    ("test_trainer.py", "test_agent_train_and_resume"),
    ("test_trainer.py", "test_imbalanced_dynamic_fused_runs"),
    ("test_trainer.py", "test_imbalanced_list_fused_matches_single_step"),
    ("test_trainer.py", "test_loss_observability_in_metrics_log"),
    ("test_trainer.py", "test_loss_observability_multi_step_path"),
    ("test_trainer.py", "test_mdl_score_with_random_classifier"),
    ("test_trainer.py", "test_resume_is_bitwise_deterministic"),
    ("test_trainer.py", "test_sigterm_preemption_checkpoints"),
    ("test_trainer.py", "test_train_device_data"),
    ("test_trainer.py", "test_train_device_data_cache_not_stale"),
    ("test_trainer.py", "test_train_device_data_mesh"),
    ("test_trainer.py", "test_train_device_data_same_class_shuffled_resume"),
    ("test_trainer.py", "test_train_device_data_sampling_seed_fixed_across_chunks"),
    ("test_trainer.py", "test_train_device_data_shuffled_epochs_resume_bitwise"),
    ("test_trainer.py", "test_train_multi_with_remainder"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        base = item.name.split("[", 1)[0]
        if (fname, base) in _SLOW:
            item.add_marker(pytest.mark.slow)
