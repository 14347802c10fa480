"""Test configuration.

* Force the CPU backend with 8 virtual devices so mesh/sharding tests run
  without TPU hardware (reference has no distributed tests at all —
  SURVEY.md §4; we go further).
* Enable x64: the reference's pinned loss values (tests/test_losses.py in the
  reference repo) are float64 numbers; reproducing them verbatim is our
  numerical acceptance suite.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# The env var alone is not honored when a TPU PJRT plugin is present;
# force the platform through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.config.jax_enable_x64
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8



# ----------------------------------------------------------------------
# fast tier: tests measured >= ~8 s on the CI box get the `slow` marker so
# `pytest -m "not slow" -n 4` stays a ~1-2 min iteration loop (full suite
# ~6 min with -n 4). Regenerate with `pytest --durations=60` when the suite
# shifts. Explicit @pytest.mark.slow decorators still apply on top.
# ----------------------------------------------------------------------

import pytest as _pytest

_MEASURED_SLOW = {
    "tests/test_analysis.py::test_k_scanner",
    "tests/test_cli.py::test_cli_fit_from_yaml[ml_hetero.yml]",
    "tests/test_cli.py::test_cli_fit_from_yaml[tc.yml]",
    "tests/test_dp.py::test_dp_step_runs_and_updates",
    "tests/test_dp.py::test_dp_trainer_fit",
    "tests/test_fused_ec.py::test_fused_ec_gradients",
    "tests/test_fused_ec.py::test_fused_ec_matches_xla",
    "tests/test_fused_ec.py::test_fused_ec_trains",
    "tests/test_fused_ec.py::test_fused_flat_ec_gradients[fused_flat]",
    "tests/test_fused_ec.py::test_fused_flat_ec_gradients[fused_flat_t]",
    "tests/test_fused_ec.py::test_padding_config_flat_layout",
    "tests/test_fused_graphtcn.py::test_graphtcn_fused_gradients_finite",
    "tests/test_fused_graphtcn.py::test_graphtcn_fused_matches_xla_through_ec_cut",
    "tests/test_halo.py::test_sharded_gradients_match",
    "tests/test_halo_overlap.py::test_overlap_split_matches_single_device[a2a]",
    "tests/test_inference.py::test_inference_cli_end_to_end",
    "tests/test_inference.py::test_predict_condensation_labels_and_padding_invariance",
    "tests/test_ivf_knn.py::test_clustered_latent[pallas-0]",
    "tests/test_ivf_knn.py::test_clustered_latent[pallas-1]",
    "tests/test_ivf_knn.py::test_fast_assign_is_exactness_neutral",
    "tests/test_ivf_knn.py::test_gather_bucket_build_matches_scatter[pallas]",
    "tests/test_ivf_knn.py::test_gather_bucket_build_matches_scatter[xla]",
    "tests/test_ivf_knn.py::test_pallas_probe_matches_xla_probe[duplicates]",
    "tests/test_ivf_knn.py::test_pallas_probe_matches_xla_probe[spill]",
    "tests/test_ivf_knn.py::test_wide_cand_table_no_duplicate_neighbors[pallas]",
    "tests/test_ivf_knn.py::test_wide_cand_table_no_duplicate_neighbors[xla]",
    "tests/test_learning.py::test_condensation_training_improves_tracking",
    "tests/test_mesh2d.py::test_2d_forward_matches_1d",
    "tests/test_mesh2d.py::test_2d_losses_match_per_event_average",
    "tests/test_mesh2d.py::test_2d_trainer_learns",
    "tests/test_ml_pipeline_composition.py::test_ml_to_tc_pipeline",
    "tests/test_models.py::test_modular_tcn_grad_flows",
    "tests/test_models.py::test_point_cloud_tcn",
    "tests/test_models.py::test_resin_remat_matches",
    "tests/test_models.py::test_resin_skip2_with_batchnorm",
    "tests/test_models.py::test_tcn_padding_invariance",
    "tests/test_models.py::test_tcn_variants_forward[<lambda>0]",
    "tests/test_pallas.py::test_interaction_network_pallas_segment_matches",
    "tests/test_postprocessing.py::test_dbscan_hyperparam_scanner",
    "tests/test_pyg_golden.py::test_golden_harness_plumbing",
    "tests/test_restore.py::test_get_model_roundtrip",
    "tests/test_restore.py::test_pretrained_frozen_ec",
    "tests/test_sharded_model.py::test_sharded_body_matches_single_device_tcn",
    "tests/test_sharded_model.py::test_sharded_config_variants_match_single_device[skip2]",
    "tests/test_sharded_model.py::test_sharded_graphtcn_sorted_edges_matches_unsorted",
    "tests/test_sharded_model.py::test_sharded_graphtcn_trainer_learns",
    "tests/test_sharded_model.py::test_sharded_ring_halo_matches_a2a",
    "tests/test_sharded_model.py::test_sharded_tc_trainer_learns",
    "tests/test_sharded_training.py::test_full_sharded_train_step_matches",
    "tests/test_torch_parity.py::test_tcn_activations_match_torch_replica",
    "tests/test_training.py::test_bf16_training",
    "tests/test_training.py::test_tc_training[CondensationLossTiger]",
    "tests/test_training.py::test_trainer_resume_from_checkpoint",
    "tests/test_training.py::test_training_deterministic_with_seed",
    "tests/test_multihost.py::test_two_process_distributed_matches_single_process",
    "tests/test_dp.py::test_dp_matches_mean_of_per_event_losses",
    "tests/test_sharded_model.py::test_sharded_config_variants_match_single_device[feed_ec]",
    "tests/test_sharded_model.py::test_sharded_graphtcn_matches_single_device",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if nodeid in _MEASURED_SLOW:
            item.add_marker(_pytest.mark.slow)
