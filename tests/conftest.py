"""Test configuration: force a virtual 8-device CPU mesh.

Must run before the first `import jax` anywhere in the test process, so all
sharding tests see 8 devices without TPU hardware.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax before conftest runs, so the env var
# alone is ignored; the config update is what actually forces CPU.
jax.config.update("jax_platforms", "cpu")

# Allow float64 in tests: parity oracles (reference math is float64 numpy)
# need it.  Production code paths are explicitly float32/bfloat16.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


# ------------------------------------------------------------ test tiers
#
# Default `pytest -q` is the fast pre-commit gate (< 5 min on 1 CPU).
# Long training/e2e tests carry @pytest.mark.slow and are skipped unless
# opted in:   pytest --runslow          (everything)
#             pytest -m slow --runslow  (slow tier only)


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow (long training/e2e)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long training/e2e test, skipped by default "
        "(opt in with --runslow)")


# Central slow-tier list (base test name, any parametrization).  Criteria:
# >20 s on 1 CPU (full-suite --durations run), with faster siblings keeping
# smoke coverage of the same subsystem in the default tier.
SLOW_TESTS = {
    # multi-device GSPMD train steps / scan chunks (compile-heavy on CPU)
    "test_dp_gan_step_matches_single_device",
    "test_tp_gan_step_matches_single_device",
    "test_tp_param_placement_and_step",
    "test_multislice_dcn_gan_step_matches_single_device",
    "test_evaluator_chunk_sharded_matches_single_device",
    "test_gan_chunk_sharded_matches_single_device",
    "test_diffusion_chunk_sharded_matches_single_device",
    "test_set_step_sharded_matches_single_device",
    "test_fused_set_step_sharded_matches_single_device",
    "test_set_chunk_sharded_matches_single_device",
    # host train drivers end-to-end
    "test_driver_end_to_end_and_resume",
    "test_cli_fast_train",
    "test_driver_data_parallel_mesh",
    "test_driver_wgan_mode",
    # device-resident fast trainer
    "test_gan_chunk_runs_and_learns_shapes",
    "test_chunk_matches_stepwise",
    "test_variable_depth_evaluator_and_folding",
    # part segmenter overfit run (tools/partseg_study.py)
    "test_partseg_overfits_tiny_scenes",
    # long GAN/evaluator training-descends cases
    "test_checkpoint_roundtrip",
    "test_checkpoint_roundtrip_orbax",
    "test_orbax_checkpoints_serve_through_engine",
    "test_mode_seeking_regularizer",
    "test_gan_step_runs_and_descends",
    "test_recon_loss_variants_descend",
    "test_gan_step_bf16_mixed_precision",
    "test_set_lr_affects_updates",
    "test_evaluator_learns_separable_toy",
    "test_gan_step_disc_only",
    # distillation: teacher-pair generation + regression loop + full-size
    # engine/checkpoint integration (compile-heavy on CPU)
    "test_distill_learns_teacher_map",
    "test_student_engine_and_checkpoint_family",
    "test_frame_to_grasps_diffusion_student_branch",
    # set-prediction transformer: DETR loop + full-size engine integration
    "test_set_training_learns_fixed_sets",
    "test_fused_device_training_learns",
    "test_set_engine_serves_and_composes",
    # diffusion family training/sampling e2e
    "test_guided_sampling_scale_zero_matches_plain_ddim",
    "test_training_descends_and_sampling_recovers_mode",
    "test_bf16_mixed_precision_training",
    "test_cfg_training_and_sampling",
    "test_multi_object_diffusion_topk",
    "test_sample_refine_rescore_diffusion",
    "test_guided_sampling_raises_evaluator_score",
    # torch-oracle one-step train parity + checkpoint interop roundtrips
    "test_one_gan_step_matches_torch",
    "test_roundtrip_export",
    "test_save_load_roundtrip",
    "test_reference_training_surface",
    "test_export_roundtrip_through_pt_files",
    # misc heavy e2e
    "test_ablation_harness",
    "test_ddim_kernel_matches_scan_sampler",
    "test_step_constants_reproduce_eps",
    "test_pointnet_trainer_learns_toy",
    "test_pointnet_evaluator_forward_and_train",
    "test_chain_kernel_matches_xla_path",
    "test_multi_object_batched",
    "test_realtime_fused_diffusion_family",
    "test_frame_to_grasps_diffusion_end_to_end",
    # round-3 serving additions (multi-program compiles / trained-ckpt IO)
    "test_step_fused_batch_diffusion_guided",
    "test_grasp_service_coalesced_batching",
    "test_grasp_service_hot_reload",
    "test_grasp_service_soak_mixed_workload",
    "test_quantized_evaluator_fidelity_trained",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: opt in with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


# ------------------------------------------------------------ suite hygiene
#
# 257 tests of compiled programs on a 1-CPU host accumulate enough XLA:CPU
# compiler/executable state that the round-4 full-suite runs segfaulted
# inside compilation at ~82% (reproducible, twice).  Dropping the jit caches
# between modules keeps the live-executable footprint bounded; each module
# recompiles its own programs anyway, so the only cost is losing rare
# cross-module cache hits.


@pytest.fixture(autouse=True, scope="module")
def _bounded_compiler_state():
    yield
    import gc
    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def basis():
    """The reference BPS basis (4096×3 float32)."""
    return np.load(os.path.join(REFERENCE, "models", "basis_point_set.npy"))


@pytest.fixture(scope="session")
def real_objects_dir():
    return os.path.join(REFERENCE, "data", "real_objects")


@pytest.fixture(scope="session")
def eval_batch_path():
    return os.path.join(REFERENCE, "data", "eval_batch.pth")
