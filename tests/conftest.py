"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh
(`--xla_force_host_platform_device_count=8`) — the TPU-native answer to
testing multi-node layouts without a physical pod. Must run before jax import.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: tests never run on the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)
import pytest  # noqa: E402

# sitecustomize pre-imports jax._src, which latches JAX_PLATFORMS from the
# ambient env (axon) before this file runs — override via config, not env.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------------------
# Two-tier suite: `pytest -m "not slow"` is the fast tier (<5 min on the
# 1-CPU box); the full suite is unchanged. Slow tests (>~8 s measured,
# mostly e2e loops / big-compile cases) are marked centrally here instead of
# per-file decorators so the tier stays easy to audit and re-tune.
# ---------------------------------------------------------------------------

SLOW_TESTS = {
    "test_device_data.py::test_train_device_data_e2e",
    "test_cond_student.py::test_distill_expressions_learns_code_control",
    "test_cond_student.py::test_fused_kernel_serves_folded_conditioned_student",
    "test_fit.py::test_fit_loop_e2e",
    "test_fit.py::test_fit_step_optimizes_codes_not_model",
    "test_fit.py::test_fit_step_static_shape_across_pyramid_levels",
    "test_convert_checkpoint.py::test_full_checkpoint_roundtrip_render_parity",
    "test_field.py::test_param_count_reference_dims",
    "test_misc.py::test_nan_guard_skips_bad_step",
    "test_occupancy.py::test_frame_fast_budget_clamped_to_ray_count",
    "test_occupancy.py::test_update_occupancy_grid_ema",
    "test_pallas_field.py::test_fused_kernel_matches_xla",
    "test_preprocess.py::test_bisenet_shapes",
    "test_preprocess.py::test_hourglass_shapes_and_light",
    "test_refine.py::test_discriminator_multiscale_features",
    "test_refine_corpus_cli.py::test_refine_corpus_render_and_pairing",
    "test_refine_corpus_cli.py::test_refine_corpus_person_sharding",
    "test_refine.py::test_generator_shapes",
    "test_refine.py::test_instance_feature_encoder",
    "test_refine.py::test_refine_train_step_adversarial_dynamics",
    "test_renderer.py::test_grad_flows_to_pose",
    "test_renderer.py::test_grads_flow_to_all_components",
    "test_renderer.py::test_render_frame_padding",
    "test_renderer_oracle.py::test_two_pass_renderer_matches_torch_oracle",
    "test_run_render_cli.py::test_run_render_artifact_person_mismatch",
    "test_run_render_cli.py::test_run_render_artifact_expression_mismatch",
    "test_run_render_cli.py::test_run_render_avatar_artifact_autofill",
    "test_run_render_cli.py::test_run_render_distill_avatars_morph",
    "test_run_render_cli.py::test_run_render_distill_cond_rig",
    "test_scaling.py::test_render_frame_sharded_scaling_curve",
    "test_scaling.py::test_serve_path_sharded_matches_single",
    "test_scaling.py::test_tensor_parallel_widths",
    "test_scaling.py::test_train_step_scaling_curve",
    "test_serve.py::test_distill_field_arch_still_works",
    "test_serve.py::test_distill_learns_teacher",
    "test_serve.py::test_render_path_serve_matches_per_frame",
    "test_sharding.py::test_data_parallel_render_matches_single",
    "test_sharding.py::test_tensor_parallel_fine_field",
    "test_train.py::test_train_step_decreases_loss",
    "test_train.py::test_train_step_updates_all_components",
    "test_train_loop.py::test_train_loop_e2e",
    "test_train_loop.py::test_train_loop_maintains_occupancy_grid",
    "test_train_loop.py::test_train_loop_resume",
    "test_train_loop.py::test_train_loop_writes_config_snapshot",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: >~8 s tests excluded from the fast tier"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        # node id relative to tests/, parametrized ids match by base name
        base = f"{item.path.name}::{item.originalname or item.name}"
        if base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
