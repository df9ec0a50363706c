"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (no TPU needed): sharding/collective
tests exercise the same pjit/shard_map code paths the driver validates with
`dryrun_multichip`.

Note: this environment pre-imports jax at interpreter startup (sitecustomize
registers the TPU PJRT plugin), so mutating JAX_PLATFORMS in os.environ here
is too late — the config already captured it.  `jax.config.update` works any
time before first backend use, so we use that; XLA_FLAGS is still read at
backend init, so the host-device-count flag does take effect from here.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Full-precision matmuls on every backend: the engine's numerics (DLT solves,
# normal equations) assume f32 accumulation, and tests verify against that.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, got " + jax.default_backend()
    )
    assert jax.device_count() == 8
    yield


# ---------------------------------------------------------------------------
# Fast tier: `pytest -m "not slow"` runs in ~2-3 min; the full suite is
# ~22 min on the virtual CPU mesh.  Slow entries measured with
# `pytest --durations=50` (anything >= ~5 s lands here); whole modules are
# listed when every test in them is dominated by sharded/jit compile time.
# ---------------------------------------------------------------------------

_SLOW_MODULES = {
    "test_distributed_solve",
    "test_mesh_trajectory",
    "test_multistream",
    "test_multihost",
    "test_spatial_sharding",
    "test_offline_sharded",
    "test_parallel",
    "test_pallas_warp",
    "test_pallas_lk",
    "test_mesh_motion",
    "test_trajectory",
}

_SLOW_TESTS = {
    "test_stabilizer_warps_alpha_with_pixels",
    "test_scene_quality_gate_suppresses_correction",
    "test_trust_drops_on_scene_cut",
    "test_stabilizer_reduces_jitter",
    "test_easu_scale_rational_paths_match_oracle",
    "test_easu_matches_between_remap_and_scale",
    "test_deblocker_smooths_blocky_regions",
    "test_scaling_filter_shapes",
    "test_easu_scale_smooth_gradient",
    "test_easu_dering_bounds",
    "test_tracker_recovers_known_translation",
    "test_tracker_jit_scan",
    "test_tracker_flags_flat_scene",
    "test_snapshot_resume_identical",
    "test_cli_end_to_end",
    "test_stream_stabilizer_delay_and_order",
    "test_homography_with_outliers",
    "test_too_few_points_not_ok",
    "test_undistort_field_straightens_lines",
    "test_lk_flat_region_rejected",
    "test_lk_matches_opencv",
    "test_scaling_resamples_alpha",
    "test_detect_grid_capacity_and_validity",
    "test_fast_detects_square_corners",
    "test_output_trajectory_smoother_and_closer_to_ideal",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        name = item.name.split("[")[0]
        if mod in _SLOW_MODULES or name in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
