"""Tests for pipeline option paths: priors, point constraints, init_view."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

from sdfest_tpu.pipeline.pipeline import SDFPipeline, _adjust_categorical_posterior

MUG_DIR = "/root/reference/tests/initilization/vae_model"
HAS_REFERENCE = os.path.isdir(MUG_DIR)

pytestmark = pytest.mark.skipif(
    not HAS_REFERENCE, reason="reference mug VAE fixture unavailable"
)


def _config(**overrides):
    with open(os.path.join(MUG_DIR, "mug.yaml")) as f:
        vae_config = yaml.safe_load(f)
    vae_config["model"] = os.path.join(MUG_DIR, "mug.pt")
    config = {
        "camera": {
            "width": 64, "height": 48, "fx": 32, "fy": 32,
            "cx": 32, "cy": 24, "pixel_center": 0.5,
        },
        "vae": vae_config,
        "init": {
            "model": None,
            "normalize_pose": True,
            "backbone_type": "VanillaPointNet",
            "backbone": {"in_size": 3, "mlp_out_sizes": [32, 64],
                         "batchnorm": True},
            "head": {
                "in_size": 64, "mlp_out_sizes": [32], "batchnorm": True,
                "orientation_repr": "discretized",
                "orientation_grid_resolution": 0,
            },
        },
        "threshold": 0.005,
        "max_iterations": 2,
        "depth_weight": 1.0,
        "pc_weight": 3.0,
        "mean_shape": False,
        "init_view": "first",
        "iso_threshold": 0.02,
        "num_input_points": 200,
    }
    config.update(overrides)
    return config


def _scene(pipeline):
    latent = jax.random.normal(jax.random.PRNGKey(5), (1, 8))
    sdf = pipeline._decode(latent)[0, 0]
    depth = pipeline.render(
        sdf, jnp.asarray([0.02, -0.01, -0.45]),
        jnp.asarray([0.0, 0.0, 0.0, 1.0]), jnp.asarray(1.0 / 0.12),
    )
    return depth, depth > 0


def test_adjust_categorical_posterior_math():
    """Mirror of the reference posterior-adjustment test (test_simple_setup)."""
    posterior = jnp.asarray([0.2, 0.3, 0.5])
    prior = jnp.asarray([0.5, 0.25, 0.25])
    train_prior = jnp.asarray([1 / 3, 1 / 3, 1 / 3])
    adjusted = _adjust_categorical_posterior(posterior, prior, train_prior)
    expected = np.array([0.2 * 0.5, 0.3 * 0.25, 0.5 * 0.25]) * 3
    expected /= expected.sum()
    np.testing.assert_allclose(np.asarray(adjusted), expected, rtol=1e-6)
    unchanged = _adjust_categorical_posterior(posterior, None, None)
    np.testing.assert_allclose(np.asarray(unchanged), np.asarray(posterior))


def test_prior_orientation_distribution():
    pipeline = SDFPipeline(_config())
    depth, mask = _scene(pipeline)
    num_cells = 72
    # prior concentrated on cell 5 forces the decoded init orientation there
    prior = jnp.zeros((num_cells,)).at[5].set(1.0)
    position, orientation, scale, latent = pipeline(
        depth, mask, prior_orientation_distribution=prior
    )
    assert bool(jnp.all(jnp.isfinite(orientation)))
    # with a delta prior, the init orientation must be grid cell 5
    expected_q = pipeline._grid_quats[5]
    # (refinement perturbs it; just ensure it ran and stayed normalized)
    np.testing.assert_allclose(float(jnp.linalg.norm(orientation)), 1.0,
                               atol=1e-5)


def test_prior_rejected_for_quaternion_repr():
    config = _config()
    config["init"]["head"] = {
        "in_size": 64, "mlp_out_sizes": [32], "batchnorm": True,
        "orientation_repr": "quaternion",
    }
    pipeline = SDFPipeline(config)
    depth, mask = _scene(pipeline)
    with pytest.raises(ValueError):
        pipeline(depth, mask,
                 prior_orientation_distribution=jnp.ones((72,)) / 72)


def test_point_constraint_loss_path():
    pipeline = SDFPipeline(_config())
    depth, mask = _scene(pipeline)
    source = jnp.asarray([0.0, 1.0, 0.0])
    target = jnp.asarray([0.0, 1.0, 0.0])
    position, orientation, scale, latent = pipeline(
        depth, mask, point_constraint=(source, target, 10.0)
    )
    assert bool(jnp.all(jnp.isfinite(position)))


def test_init_view_best_multi_view():
    pipeline = SDFPipeline(_config(init_view="best"))
    depth, mask = _scene(pipeline)
    depths = jnp.stack([depth, depth])
    masks = jnp.stack([mask, mask])
    position, orientation, scale, latent = pipeline(
        depths, masks,
        camera_positions=jnp.zeros((2, 3)),
        camera_orientations=jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (2, 1)),
    )
    assert bool(jnp.all(jnp.isfinite(position)))


def test_nn_init_best_selects_highest_posterior_view():
    """The traced "best" selection picks the view whose (prior-adjusted)
    posterior has the highest maximum — here forced via a delta prior."""
    pipeline = SDFPipeline(_config(init_view="best"))
    depth, mask = _scene(pipeline)
    depth = jnp.where(mask, depth, 0.0)
    depths = jnp.stack([depth, depth])
    num_cells = pipeline._grid_quats.shape[0]
    prior = jnp.stack([
        jnp.ones((num_cells,)) / num_cells,        # view 0: flat
        jnp.zeros((num_cells,)).at[7].set(1.0),    # view 1: delta at cell 7
    ])
    latent, position, scale, orientation = pipeline._nn_init(
        depths,
        jnp.zeros((2, 3)),
        jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (2, 1)),
        jax.random.PRNGKey(0),
        prior_orientation_distribution=prior,
    )
    # view 1's delta prior makes its posterior max 1.0 > view 0's, so the
    # selected init orientation must be grid cell 7 (identity camera frame)
    np.testing.assert_allclose(
        np.asarray(orientation[0]), np.asarray(pipeline._grid_quats[7]),
        atol=1e-6,
    )


def test_nn_init_no_depth_semantics():
    """"first" checks view 0 only; "best" requires every view non-empty
    (parity with the reference loop, simple_setup.py:780-781)."""
    from sdfest_tpu.pipeline.pipeline import NoDepthError

    pipeline = SDFPipeline(_config())
    depth, mask = _scene(pipeline)
    depth = jnp.where(mask, depth, 0.0)
    empty = jnp.zeros_like(depth)
    cam_p = jnp.zeros((2, 3))
    cam_q = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (2, 1))
    key = jax.random.PRNGKey(0)
    # "first": an empty SECOND view is never consulted
    out = pipeline._nn_init(jnp.stack([depth, empty]), cam_p, cam_q, key)
    assert bool(jnp.all(jnp.isfinite(out[1])))
    # "first": an empty FIRST view raises
    with pytest.raises(NoDepthError):
        pipeline._nn_init(jnp.stack([empty, depth]), cam_p, cam_q, key)
    # "best": any empty view raises
    best = SDFPipeline(_config(init_view="best"))
    with pytest.raises(NoDepthError):
        best._nn_init(jnp.stack([depth, empty]), cam_p, cam_q, key)


def test_mean_shape_ablation():
    pipeline = SDFPipeline(_config(mean_shape=True, max_iterations=1))
    depth, mask = _scene(pipeline)
    position, orientation, scale, latent = pipeline(
        depth, mask, shape_optimization=False
    )
    # with mean_shape and no shape optimization the latent stays ~zero
    np.testing.assert_allclose(np.asarray(latent), 0.0, atol=1e-2)


def test_multires_refinement_runs_and_logs_full_schedule(tmp_path):
    """Coarse-to-fine: coarse phase on the strided sub-observation, fine
    phase at full resolution, concatenated step log."""
    import pickle

    config = _config(
        max_iterations=6, multires_factor=2, multires_iterations=3,
        roi_size=[32, 32], roi_margin=4,
    )
    pipeline = SDFPipeline(config)
    assert pipeline._multires_for() == (2, 3)
    depth, mask = _scene(pipeline)
    # the ROI applies to the fine phase (composition with multires)
    assert pipeline._roi_for(depth[None]) == (32, 32)
    log_path = str(tmp_path / "log.pkl")
    position, orientation, scale, latent = pipeline(
        depth, mask, log_path=log_path
    )
    assert bool(jnp.all(jnp.isfinite(position)))
    np.testing.assert_allclose(float(jnp.linalg.norm(orientation)), 1.0,
                               atol=1e-5)
    with open(log_path, "rb") as f:
        log = pickle.load(f)["log"]
    # both phases land in one log covering the full iteration budget,
    # with the phase boundary recorded for consumers
    assert log["loss"].shape[0] == 6
    assert np.all(np.isfinite(log["loss"]))
    assert log["multires_boundary"] == 3


def test_multires_gating():
    # stride must divide the raster
    config = _config(multires_factor=5, multires_iterations=3)
    assert SDFPipeline(config)._multires_for() is None
    # coarse iterations are clamped below max_iterations
    config = _config(max_iterations=4, multires_factor=2,
                     multires_iterations=99)
    assert SDFPipeline(config)._multires_for() == (2, 3)
    # multires defers to temporal coherence (the warm march has no
    # strided-camera path); _use_temporal_coherence is backend-gated, so
    # force it the way a pallas-backend run would see it
    pipeline = SDFPipeline(_config(multires_factor=2, multires_iterations=3))
    pipeline._use_temporal_coherence = lambda: True
    assert pipeline._multires_for() is None
    # "auto" takes 60% of the budget at coarse
    config = _config(max_iterations=50, multires_factor=2,
                     multires_iterations="auto")
    assert SDFPipeline(config)._multires_for() == (2, 30)
    # disabled by default
    assert SDFPipeline(_config())._multires_for() is None
    # refine_batch rejects schedules with no full-resolution iterations
    pipeline = SDFPipeline(_config(max_iterations=4))
    with pytest.raises(ValueError, match="full-resolution iteration"):
        pipeline.refine_batch(None, None, None, None, None, None,
                              multires=(2, 4))


def test_multires_schedule_config():
    """multires_factor lists resolve to a coarsest-first level schedule."""
    config = _config(max_iterations=50, multires_factor=[4, 2],
                     multires_iterations="auto")
    # auto: 80% of the budget split evenly across the levels (the
    # measured-fastest 20/20/10 shape at 50 iterations)
    assert SDFPipeline(config)._multires_for() == [(4, 20), (2, 20)]
    config = _config(max_iterations=8, multires_factor=[4, 2],
                     multires_iterations=[3, 2])
    assert SDFPipeline(config)._multires_for() == [(4, 3), (2, 2)]
    # a non-dividing stride drops ONLY its level
    config = _config(max_iterations=8, multires_factor=[5, 2],
                     multires_iterations=[3, 2])
    assert SDFPipeline(config)._multires_for() == [(2, 2)]
    # mismatched iteration list / scalar iterations with a schedule /
    # over-budget schedules are config errors, not silent fallbacks
    with pytest.raises(ValueError, match="must match"):
        SDFPipeline(_config(multires_factor=[4, 2],
                            multires_iterations=[3]))._multires_for()
    with pytest.raises(ValueError, match="matching list"):
        SDFPipeline(_config(multires_factor=[4, 2],
                            multires_iterations=3))._multires_for()
    with pytest.raises(ValueError, match="full-resolution"):
        SDFPipeline(_config(max_iterations=5, multires_factor=[4, 2],
                            multires_iterations=[3, 2]))._multires_for()


def test_multires_schedule_end_to_end(tmp_path):
    """A 3-phase [4, 2] schedule runs each level against its exactly
    strided sub-observation and concatenates one full-budget log."""
    import pickle

    config = _config(
        max_iterations=6, multires_factor=[4, 2],
        multires_iterations=[2, 2],
    )
    pipeline = SDFPipeline(config)
    depth, mask = _scene(pipeline)
    log_path = str(tmp_path / "log.pkl")
    position, orientation, scale, latent = pipeline(
        depth, mask, log_path=log_path
    )
    assert bool(jnp.all(jnp.isfinite(position)))
    with open(log_path, "rb") as f:
        log = pickle.load(f)["log"]
    assert log["loss"].shape[0] == 6
    assert np.all(np.isfinite(log["loss"]))
    assert log["multires_boundary"] == 4
    assert log["multires_boundaries"] == [2, 4]


def test_refine_batch_multires_schedule():
    """refine_batch composes the multi-level schedule per hypothesis."""
    config = _config(max_iterations=5, multires_factor=[4, 2],
                     multires_iterations=[2, 1])
    pipeline = SDFPipeline(config)
    states, views = _batch_inputs(pipeline)
    final, best, log = pipeline.refine_batch(
        states, *views, multires=pipeline._multires_for()
    )
    assert log["loss"].shape == (2, 5)
    assert bool(jnp.all(jnp.isfinite(log["loss"])))
    assert bool(jnp.all(jnp.isfinite(final["position"])))


def test_multires_unaligned_strided_raster_requires_roi():
    """A factor whose strided raster is TILE-unaligned (here 4: 80x128 ->
    20x32) is allowed on the pallas backend ONLY via the ROI policy: the
    kernel then renders an aligned window of the strided raster.  Without
    roi_size the coarse phase would silently fall to the XLA march, so
    _multires_for disables it; per call, _coarse_phase skips the phase
    when the observed object fits no aligned window."""
    kwargs = dict(
        max_iterations=4, multires_factor=4, multires_iterations=2,
        renderer_backend="pallas",
        camera={"width": 128, "height": 80, "fx": 64, "fy": 64,
                "cx": 64, "cy": 40, "pixel_center": 0.5},
    )
    assert SDFPipeline(_config(**kwargs))._multires_for() is None
    pipeline = SDFPipeline(_config(roi_size="auto", roi_margin=8, **kwargs))
    assert pipeline._strided_needs_roi(4)
    assert not pipeline._strided_needs_roi(1)
    assert pipeline._multires_for() == (4, 2)
    # per-call: a small object fits an aligned window -> phase viable
    depth = np.zeros((1, 80, 128), np.float32)
    depth[0, 36:44, 60:68] = 0.4
    phase = pipeline._coarse_phase(jnp.asarray(depth), 4)
    assert phase is not None
    assert phase[3] is not None  # the aligned coarse ROI engaged
    # an object filling the frame fits no aligned window -> phase skipped
    big = np.zeros((1, 80, 128), np.float32)
    big[0, 4:76, 4:124] = 0.4
    assert pipeline._coarse_phase(jnp.asarray(big), 4) is None


def test_coarse_roi_composes_exactly():
    """roi_size engages in BOTH phases of a multires schedule and leaves the
    trajectory exactly unchanged: crop renders are exact crops, the depth
    loss is masked to the observed-pixel overlap (all inside the crop), and
    the pc loss is an order-invariant masked mean over the same valid set."""
    kwargs = dict(max_iterations=6, multires_factor=2, multires_iterations=3)
    pipeline_b = SDFPipeline(_config(**kwargs))
    pipeline_f = SDFPipeline(
        _config(roi_size=[32, 32], roi_margin=4, **kwargs)
    )
    depth, mask = _scene(pipeline_b)
    # the coarse phase resolves a stride-scaled ROI of its own
    depth_c = depth[None][:, ::2, ::2]
    assert pipeline_f._roi_for(depth_c, factor=2) == (16, 16)
    assert pipeline_f._roi_for(depth[None]) == (32, 32)
    out_b = pipeline_b(depth, mask)
    out_f = pipeline_f(depth, mask)
    for name, a, b in zip(
        ("position", "orientation", "scale", "latent"), out_b, out_f
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=name
        )


def test_multires_converges_like_single_phase(no_persistent_cache):
    """The strided coarse phase must not hurt final accuracy (same
    optimization problem on a pixel subset).

    Runs in a SUBPROCESS when executed inside the full suite: XLA:CPU
    segfaults (native crash, not an exception) compiling this test's scan
    programs in a process that already holds many compiled executables —
    same crash class the ``no_persistent_cache`` fixture documents, but on
    the *compile* side (``backend_compile_and_load``), so bypassing the
    cache is not enough.  The test passes standalone, warm or cold.
    """
    import subprocess
    import sys as _sys

    if os.environ.get("SDFEST_ISOLATED_TEST", "") != "1":
        result = subprocess.run(
            [
                _sys.executable, "-m", "pytest", "-q", "-x",
                "tests/test_pipeline_options.py::"
                "test_multires_converges_like_single_phase",
            ],
            env=dict(os.environ, SDFEST_ISOLATED_TEST="1"),
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True,
            text=True,
            timeout=1200,
        )
        assert result.returncode == 0, (
            f"isolated run failed:\n{result.stdout[-4000:]}\n"
            f"{result.stderr[-2000:]}"
        )
        return
    true_p = jnp.asarray([0.02, -0.01, -0.45])
    base = _config(max_iterations=12)
    mr = _config(max_iterations=12, multires_factor=2,
                 multires_iterations=6)
    errs = {}
    for name, cfg in (("single", base), ("multires", mr)):
        pipeline = SDFPipeline(cfg)
        depth, mask = _scene(pipeline)
        position, _, _, _ = pipeline(depth, mask)
        errs[name] = float(jnp.linalg.norm(position[0] - true_p))
    # 12 iterations only nudge the estimate; require the multires path to
    # track the single-phase error within a loose band (same problem)
    assert errs["multires"] < max(2.0 * errs["single"], 0.02), errs


def test_early_stop_freezes_after_plateau(tmp_path):
    """early_stop_delta > 0: once the loss plateaus, remaining iterations
    freeze (logged inactive, state constant), result stays finite."""
    import pickle

    config = _config(
        max_iterations=8, early_stop_delta=1.0, early_stop_interval=2
    )
    pipeline = SDFPipeline(config)
    depth, mask = _scene(pipeline)
    log_path = str(tmp_path / "log.pkl")
    position, orientation, scale, latent = pipeline(
        depth, mask, log_path=log_path
    )
    assert bool(jnp.all(jnp.isfinite(position)))
    with open(log_path, "rb") as f:
        log = pickle.load(f)["log"]
    active = log["active"]
    assert active.shape[0] == 8
    # delta=1.0 demands a >=100% relative improvement per interval: the
    # refinement must freeze before exhausting the budget
    assert active.sum() < 8
    # active iterations are a prefix (frozen never resumes)
    assert np.all(np.diff(active) <= 0)
    # frozen rows re-log the last active row
    last_active = int(active.sum()) - 1
    np.testing.assert_array_equal(
        log["position"][last_active], log["position"][-1]
    )
    np.testing.assert_array_equal(log["loss"][last_active], log["loss"][-1])


def test_early_stop_composes_with_multires(tmp_path, no_persistent_cache):
    """Each multires phase runs its own early-stop checkpoint chain.

    ``no_persistent_cache``: the early-stop+multires scan programs hit the
    same XLA:CPU ``deserialize_executable`` segfault as the chunked
    ``_refine`` programs when loaded from the persistent cache in a
    process that already holds many executables (full-suite order); see
    the fixture docstring in conftest.py.
    """
    import pickle

    config = _config(
        max_iterations=6, multires_factor=2, multires_iterations=3,
        early_stop_delta=1.0, early_stop_interval=1,
    )
    pipeline = SDFPipeline(config)
    depth, mask = _scene(pipeline)
    log_path = str(tmp_path / "log.pkl")
    position, _, _, _ = pipeline(depth, mask, log_path=log_path)
    assert bool(jnp.all(jnp.isfinite(position)))
    with open(log_path, "rb") as f:
        log = pickle.load(f)["log"]
    assert log["active"].shape[0] == 6
    # delta=1.0 / interval=1 freezes both phases almost immediately
    assert log["active"].sum() < 6


def _batch_inputs(pipeline, n_hyp=2):
    from sdfest_tpu.ops import pointset

    depth, mask = _scene(pipeline)
    depth = jnp.where(mask, depth, 0.0)
    points, pmask = jax.vmap(
        lambda d: pointset.depth_to_pointcloud_dense(
            d, pipeline.camera, order="tile"
        )
    )(depth[None])
    key = jax.random.PRNGKey(3)
    states = {
        "position": jnp.asarray([0.02, -0.01, -0.45])[None, None]
        + 0.02 * jax.random.normal(key, (n_hyp, 1, 3)),
        "orientation": jnp.tile(
            jnp.asarray([0.0, 0.0, 0.0, 1.0]), (n_hyp, 1, 1)
        ),
        "scale": jnp.full((n_hyp, 1), 0.12),
        "latent": jnp.tile(
            jax.random.normal(jax.random.PRNGKey(5), (1, 8)), (n_hyp, 1, 1)
        ),
    }
    views = (
        depth[None],
        points,
        pmask,
        jnp.zeros((1, 3)),
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]]),
    )
    return states, views


def test_refine_chunked_equals_full(no_persistent_cache):
    """Chaining scan chunks through (state, Adam state, best) reproduces the
    single long scan — the invariant batched early stopping rests on."""
    config = _config(
        max_iterations=7, early_stop_delta=1e-12, early_stop_interval=3
    )
    pipeline = SDFPipeline(config)
    states, views = _batch_inputs(pipeline)
    # delta ~ 0 never trips the plateau predicate: all 7 iterations run,
    # chunked 3+3+1
    final_a, best_a, log_a = pipeline.refine_batch(
        states, *views, adaptive=True
    )
    final_b, best_b, log_b = pipeline.refine_batch(
        states, *views, adaptive=False
    )
    assert log_a["loss"].shape == log_b["loss"].shape == (2, 7)
    for k in final_a:
        np.testing.assert_allclose(
            np.asarray(final_a[k]), np.asarray(final_b[k]), atol=1e-5,
            err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(best_a["inlier_ratio"]),
        np.asarray(best_b["inlier_ratio"]), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(log_a["loss"]), np.asarray(log_b["loss"]), atol=1e-5
    )


def test_adaptive_refine_batch_stops_early(no_persistent_cache):
    """A demanding delta stops launching chunks once every hypothesis
    plateaus — the log covers only the executed iterations."""
    config = _config(
        max_iterations=20, early_stop_delta=1.0, early_stop_interval=2
    )
    pipeline = SDFPipeline(config)
    states, views = _batch_inputs(pipeline)
    final, best, log = pipeline.refine_batch(states, *views, adaptive=True)
    executed = log["loss"].shape[1]
    assert executed < 20 and executed % 2 == 0
    assert bool(jnp.all(jnp.isfinite(final["position"])))
    # the executed prefix matches the non-adaptive trajectory exactly
    _, _, log_full = pipeline.refine_batch(states, *views, adaptive=False)
    np.testing.assert_allclose(
        np.asarray(log["loss"]),
        np.asarray(log_full["loss"][:, :executed]), atol=1e-5,
    )


def test_adaptive_refine_batch_composes_with_multires(no_persistent_cache):
    config = _config(
        max_iterations=6, multires_factor=2, multires_iterations=2,
        early_stop_delta=1e-12, early_stop_interval=2,
    )
    pipeline = SDFPipeline(config)
    states, views = _batch_inputs(pipeline)
    final, best, log = pipeline.refine_batch(
        states, *views, multires=pipeline._multires_for(), adaptive=True
    )
    # coarse 2 + fine 4, none skipped at delta ~ 0
    assert log["loss"].shape == (2, 6)
    assert bool(jnp.all(jnp.isfinite(log["loss"])))


def test_multires_multi_view():
    """Coarse-to-fine strides every view of a multi-view problem."""
    pipeline = SDFPipeline(_config(
        max_iterations=4, multires_factor=2, multires_iterations=2
    ))
    depth, mask = _scene(pipeline)
    depths = jnp.stack([depth, depth])
    masks = jnp.stack([mask, mask])
    position, orientation, scale, latent = pipeline(
        depths, masks,
        camera_positions=jnp.zeros((2, 3)),
        camera_orientations=jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]),
                                     (2, 1)),
    )
    assert bool(jnp.all(jnp.isfinite(position)))
    np.testing.assert_allclose(float(jnp.linalg.norm(orientation)), 1.0,
                               atol=1e-5)


def test_fused_call_matches_legacy_multiphase(tmp_path):
    """The fused single-dispatch path reproduces the legacy per-phase
    path's trajectory on a multires+ROI schedule (same traced programs,
    inlined into one; differences are XLA fusion-order rounding)."""
    import pickle

    logs = {}
    results = {}
    for fused in (False, True):
        config = _config(
            max_iterations=6, multires_factor=2, multires_iterations=3,
            roi_size=[32, 32], roi_margin=4, fused_call=fused,
        )
        pipeline = SDFPipeline(config)
        depth, mask = _scene(pipeline)
        log_path = str(tmp_path / f"log_{fused}.pkl")
        results[fused] = pipeline(depth, mask, log_path=log_path)
        with open(log_path, "rb") as f:
            logs[fused] = pickle.load(f)["log"]
    np.testing.assert_allclose(
        logs[True]["loss"], logs[False]["loss"], rtol=1e-4, atol=1e-6
    )
    assert logs[True]["multires_boundary"] == logs[False]["multires_boundary"]
    for a, b in zip(results[True], results[False]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_fused_call_raises_no_depth():
    from sdfest_tpu.pipeline import NoDepthError

    pipeline = SDFPipeline(_config(fused_call=True))
    depth, mask = _scene(pipeline)
    with pytest.raises(NoDepthError):
        pipeline(depth, jnp.zeros_like(mask))


def test_plan_for_matches_legacy_gating():
    """_plan_for (spans-based) resolves the same ROI/levels the legacy
    per-phase host gating does on the same observation."""
    config = _config(
        max_iterations=6, multires_factor=2, multires_iterations=3,
        roi_size=[32, 32], roi_margin=4,
    )
    pipeline = SDFPipeline(config)
    depth, mask = _scene(pipeline)
    per_view_valid, spans = jax.device_get(
        pipeline._probe(depth[None], mask[None])
    )
    assert bool(per_view_valid[0])
    spans_list = [tuple(int(x) for x in s) for s in spans]
    levels, fine_roi, fine_iters = pipeline._plan_for(spans_list)
    assert fine_roi == pipeline._roi_for(depth[None])
    assert fine_iters == 3
    assert len(levels) == 1 and levels[0][0] == 2 and levels[0][1] == 3
    # spans from the probe equal the host-side bbox
    d = np.asarray(depth > 0)
    ys, xs = np.nonzero(d)
    assert spans_list[0] == (
        ys.max() - ys.min() + 1, xs.max() - xs.min() + 1
    )


def test_reuse_plan_single_dispatch(tmp_path):
    """reuse_plan: the second call skips the probe (cached static plan)
    and produces the same estimate."""
    config = _config(
        max_iterations=6, multires_factor=2, multires_iterations=3,
        roi_size=[32, 32], roi_margin=4, reuse_plan=True,
    )
    pipeline = SDFPipeline(config)
    depth, mask = _scene(pipeline)
    first = pipeline(depth, mask)
    assert getattr(pipeline, "_cached_plan", None) is not None
    # probe must not run again: poison it
    pipeline._probe = None
    second = pipeline(depth, mask)
    for a, b in zip(first, second):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
