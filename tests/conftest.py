"""Test configuration: force CPU platform with an 8-device virtual mesh.

Multi-chip sharding is validated on a virtual CPU mesh; the benchmark driver
separately exercises the real TPU chip.  Set ``SDFEST_TPU_TESTS=1`` to keep
the attached accelerator instead (enables tests/test_tpu_compiled.py, which
is skipped on CPU).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_USE_TPU = os.environ.get("SDFEST_TPU_TESTS", "") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    # the environment's sitecustomize may force the TPU platform; override it
    jax.config.update("jax_platforms", "cpu")
    # enable float64 so numeric-gradient checks are meaningful on CPU
    jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the suite is compile-dominated (~24 min of
# mostly XLA compiles on CPU), and cache keys hash the HLO, so edits
# invalidate exactly the programs they change
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    # the suite's cost is many ~1 s compiles, below the default 1 s
    # persistence threshold — cache everything
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# Tests measured > ~10 s on CPU; the fast CI job (-m "not slow") skips them,
# the nightly job runs everything.  Centralized here (instead of per-file
# decorators) so the split stays auditable in one place.
_SLOW_TESTS = {
    "test_refinement_temporal_coherence_matches",
    "test_sharded_hypothesis_refinement",
    "test_train_init_generated_smoke",
    "test_rendering_evaluation_ablations",
    "test_vae_shapes_with_mug_config",
    "test_hypothesis_batch_refinement",
    "test_vjp_position_matches_finite_difference_render",
    "test_pallas_render_under_vmap_and_grad",
    "test_rendering_evaluation_end_to_end",
    "test_refinement_reduces_loss_and_error",
    "test_pipeline_log_and_playback",
    "test_multi_view_pipeline",
    "test_api_render_pallas_gradients_match_xla",
    "test_init_view_best_multi_view",
    "test_train_vae_smoke",
    "test_pipeline_runs_end_to_end",
    "test_render_is_vmappable",
    "test_point_constraint_loss_path",
    "test_train_init_nocs_smoke",
    "test_prior_orientation_distribution",
    "test_init_trainer_loss_decreases",
    "test_windowed_sampler_coherent_and_scattered",
    "test_pipeline_best_inlier_strategy",
    "test_data_parallel_step_matches_single_device",
    "test_pc_loss_pallas_backend_matches_xla",
    "test_mean_shape_ablation",
    "test_coarse_culling_bound_and_parity",
    "test_two_process_distributed_sweep",
    "test_fused_render_pc_matches_separate_path",
    "test_play_log_modes_and_mesh_export",
    "test_latent_explorer_keyframed_animation",
    "test_pipeline_inline_animation_export",
    "test_multires_refinement_runs_and_logs_full_schedule",
    "test_multires_converges_like_single_phase",
    "test_sharded_refinement_with_multires_schedule",
    "test_strided_camera_rays_and_render_match_strided_full",
    "test_early_stop_freezes_after_plateau",
    "test_early_stop_composes_with_multires",
    "test_multires_multi_view",
    "test_refinement_trajectory_matches_reference_cpu",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_executables_between_modules():
    """Drop compiled executables at module teardown.

    XLA:CPU natively CRASHES (segfault, not an exception) compiling or
    deserializing further scan programs once the process holds many
    compiled executables — the full suite reproducibly dies ~60% in
    (test_pipeline_options) while every affected test passes standalone.
    Clearing jit caches between modules keeps the live-executable count
    bounded; recompiles within a later module are served by the
    persistent on-disk cache at ~1 s each, so the suite stays fast.
    """
    yield
    jax.clear_caches()


@pytest.fixture
def no_persistent_cache():
    """Bypass the persistent compilation cache for one test.

    XLA:CPU's ``deserialize_executable`` SEGFAULTS (not raises) reloading
    certain cached executables when the process already holds many compiled
    programs: the chunked vmapped ``_refine`` programs reproducibly crash
    the FULL suite at the cache-read of ``test_adaptive_refine_batch_*``
    while passing standalone (warm or cold).  The write side crashes too
    (``executable.serialize()`` inside ``put_executable_and_time``), and
    ``jax_raise_persistent_cache_errors`` cannot help — the failure is a
    native crash, not an exception.  Nulling ``jax_compilation_cache_dir``
    is NOT sufficient once the cache object is initialized (``_get_cache``
    memoizes it), so this fixture blocks writes via
    ``persistent_cache_min_compile_time_secs`` (read per call); reads stay
    safe because the poisoned entries are then never persisted.  The
    affected tests always compile fresh (~10 s each).
    """
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_compilation_cache_dir", None)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    try:
        yield
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min
        )


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_sphere_sdf(res: int = 64, radius: float = 0.5) -> np.ndarray:
    """Analytic sphere SDF on the [-1, 1]^3 grid (exact, not truncated)."""
    coords = np.linspace(-1.0, 1.0, res)
    x, y, z = np.meshgrid(coords, coords, coords, indexing="ij")
    return (np.sqrt(x * x + y * y + z * z) - radius).astype(np.float32)


def make_box_sdf(res: int = 64, half_extents=(0.4, 0.3, 0.5)) -> np.ndarray:
    """Analytic axis-aligned box SDF on the [-1, 1]^3 grid."""
    coords = np.linspace(-1.0, 1.0, res)
    x, y, z = np.meshgrid(coords, coords, coords, indexing="ij")
    q = np.stack(
        [np.abs(x) - half_extents[0], np.abs(y) - half_extents[1],
         np.abs(z) - half_extents[2]],
        axis=-1,
    )
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
    inside = np.minimum(np.max(q, axis=-1), 0.0)
    return (outside + inside).astype(np.float32)
