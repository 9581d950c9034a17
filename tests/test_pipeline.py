"""End-to-end pipeline tests: mechanics, refinement convergence, mesh.

Closes the reference's biggest test gap (SURVEY.md §4: "SDFPipeline
end-to-end ... not tested").
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

from sdfest_tpu.pipeline import NoDepthError, SDFPipeline

MUG_DIR = "/root/reference/tests/initilization/vae_model"
HAS_REFERENCE = os.path.isdir(MUG_DIR)

pytestmark = pytest.mark.skipif(
    not HAS_REFERENCE, reason="reference mug VAE fixture unavailable"
)


def _pipeline_config(max_iterations=4):
    with open(os.path.join(MUG_DIR, "mug.yaml")) as f:
        vae_config = yaml.safe_load(f)
    vae_config["model"] = os.path.join(MUG_DIR, "mug.pt")
    return {
        "camera": {
            "width": 64,
            "height": 48,
            "fx": 32,
            "fy": 32,
            "cx": 32,
            "cy": 24,
            "pixel_center": 0.5,
        },
        "vae": vae_config,
        "init": {
            "model": None,
            "normalize_pose": True,
            "backbone_type": "VanillaPointNet",
            "backbone": {"in_size": 3, "mlp_out_sizes": [32, 64], "batchnorm": True},
            "head": {
                "in_size": 64,
                "mlp_out_sizes": [32],
                "batchnorm": True,
                "orientation_repr": "discretized",
                "orientation_grid_resolution": 0,
            },
        },
        "threshold": 0.005,
        "max_iterations": max_iterations,
        "depth_weight": 1.0,
        "pc_weight": 3.0,
        "nn_weight": 0.0,
        "mean_shape": False,
        "init_view": "first",
        "iso_threshold": 0.02,
        "far_field": 2.0,
        "num_input_points": 500,
    }


@pytest.fixture(scope="module")
def pipeline():
    return SDFPipeline(_pipeline_config())


@pytest.fixture(scope="module")
def target(pipeline):
    """Ground-truth rendering of a decoded mug."""
    latent = jax.random.normal(jax.random.PRNGKey(5), (1, 8))
    sdf = pipeline._decode(latent)[0, 0]
    position = jnp.asarray([0.02, -0.01, -0.45])
    orientation = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    scale = jnp.asarray(0.12)
    depth = pipeline.render(sdf, position, orientation, 1.0 / scale)
    return {
        "latent": latent,
        "sdf": sdf,
        "position": position,
        "orientation": orientation,
        "scale": scale,
        "depth": depth,
    }


def test_pipeline_runs_end_to_end(pipeline, target):
    depth = target["depth"]
    mask = depth > 0
    assert int(mask.sum()) > 50
    position, orientation, scale, latent = pipeline(depth, mask)
    assert position.shape == (1, 3)
    assert orientation.shape == (1, 4)
    assert scale.shape == (1,)
    assert latent.shape == (1, 8)
    for arr in (position, orientation, scale, latent):
        assert bool(jnp.all(jnp.isfinite(arr)))
    np.testing.assert_allclose(
        float(jnp.linalg.norm(orientation)), 1.0, atol=1e-5
    )


def test_pipeline_raises_no_depth(pipeline, target):
    depth = target["depth"]
    with pytest.raises(NoDepthError):
        pipeline(depth, jnp.zeros_like(depth, dtype=bool))


def test_refinement_reduces_loss_and_error(target):
    """From a perturbed ground-truth state, refinement must converge."""
    pipeline = SDFPipeline(_pipeline_config(max_iterations=40))
    depth = target["depth"]
    from sdfest_tpu.ops import pointset

    points, point_masks = jax.vmap(
        lambda d: pointset.depth_to_pointcloud_dense(d, pipeline.camera)
    )(depth[None])

    state = {
        "position": (target["position"] + jnp.asarray([0.03, -0.02, 0.03]))[None],
        "orientation": jnp.asarray([[0.05, 0.0, 0.0, 1.0]])
        / jnp.sqrt(1.0 + 0.05**2),
        "scale": (target["scale"] * 1.2)[None],
        "latent": target["latent"],
    }
    cam_pos = jnp.zeros((1, 3))
    cam_quat = jnp.asarray([[0.0, 0.0, 0.0, 1.0]])
    final_state, best, log = pipeline._refine(
        state, depth[None], points, point_masks, cam_pos, cam_quat, True
    )
    losses = np.asarray(log["loss"])
    assert losses[-1] < losses[0] * 0.5, f"losses did not decrease: {losses}"
    err0 = float(jnp.linalg.norm(state["position"][0] - target["position"]))
    err1 = float(
        jnp.linalg.norm(final_state["position"][0] - target["position"])
    )
    assert err1 < err0 * 0.5, f"position error {err0} -> {err1}"
    scale_err0 = abs(float(state["scale"][0] - target["scale"]))
    scale_err1 = abs(float(final_state["scale"][0] - target["scale"]))
    assert scale_err1 < scale_err0
    # best tracking picked something at least as good as the start
    assert float(best["inlier_ratio"]) >= float(np.asarray(log["inlier_ratio"])[0])


def test_pipeline_best_inlier_strategy(target):
    config = _pipeline_config()
    config["result_selection_strategy"] = "best_inlier_ratio"
    pipeline = SDFPipeline(config)
    depth = target["depth"]
    position, orientation, scale, latent = pipeline(depth, depth > 0)
    assert bool(jnp.all(jnp.isfinite(position)))


def test_multi_view_pipeline(pipeline, target):
    """Two views with known camera poses run through the same program."""
    sdf = target["sdf"]
    # second camera shifted along x, looking the same direction
    cam_pos = jnp.asarray([[0.0, 0.0, 0.0], [0.05, 0.0, 0.0]])
    cam_quat = jnp.asarray([[0.0, 0.0, 0.0, 1.0], [0.0, 0.0, 0.0, 1.0]])
    from sdfest_tpu.ops import quaternion

    depths = []
    for i in range(2):
        q_w2c = quaternion.invert(cam_quat[i])
        pos_c = quaternion.apply(q_w2c, target["position"] - cam_pos[i])
        quat_c = quaternion.multiply(q_w2c, target["orientation"])
        depths.append(
            pipeline.render(sdf, pos_c, quat_c, 1.0 / target["scale"])
        )
    depths = jnp.stack(depths)
    masks = depths > 0
    position, orientation, scale, latent = pipeline(
        depths, masks, camera_positions=cam_pos, camera_orientations=cam_quat
    )
    assert position.shape == (1, 3)
    assert bool(jnp.all(jnp.isfinite(position)))


def test_generate_mesh(pipeline, target):
    mesh = pipeline.generate_mesh(target["latent"], jnp.asarray([0.12]), True)
    assert mesh is not None
    assert len(mesh.vertices) > 100
    assert len(mesh.faces) > 100
    # mesh extents should be within the (scaled) SDF volume
    assert np.abs(mesh.vertices).max() <= 1.1
    points = mesh.sample_points_uniformly(500)
    assert points.shape == (500, 3)


def test_hypothesis_batch_refinement(target):
    """refine_batch runs N hypotheses through one vmapped program."""
    pipeline = SDFPipeline(_pipeline_config(max_iterations=3))
    depth = target["depth"]
    from sdfest_tpu.ops import pointset

    points, point_masks = jax.vmap(
        lambda d: pointset.depth_to_pointcloud_dense(d, pipeline.camera)
    )(depth[None])
    n = 4
    states = {
        "position": jnp.tile(target["position"][None], (n, 1, 1))
        + 0.01 * jax.random.normal(jax.random.PRNGKey(0), (n, 1, 3)),
        "orientation": jnp.tile(target["orientation"][None], (n, 1, 1)),
        "scale": jnp.tile(target["scale"][None, None], (n, 1)),
        "latent": jnp.tile(target["latent"][None], (n, 1, 1)),
    }
    final_states, best, log = pipeline.refine_batch(
        states,
        depth[None],
        points,
        point_masks,
        jnp.zeros((1, 3)),
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]]),
    )
    assert final_states["position"].shape == (n, 1, 3)
    assert log["loss"].shape == (n, 3)
    assert bool(jnp.all(jnp.isfinite(final_states["position"])))

def test_refinement_temporal_coherence_matches(target):
    """Warm-started refinement (pallas) tracks the cold path's trajectory."""
    results = {}
    for coherent in (False, True):
        config = _pipeline_config(max_iterations=12)
        config["renderer_backend"] = "pallas"  # interpret mode on CPU
        config["temporal_coherence"] = coherent
        config["temporal_refresh_interval"] = 4
        pipeline = SDFPipeline(config)
        assert pipeline._use_temporal_coherence() == coherent
        from sdfest_tpu.ops import pointset

        depth = target["depth"]
        points, point_masks = jax.vmap(
            lambda d: pointset.depth_to_pointcloud_dense(d, pipeline.camera)
        )(depth[None])
        state = {
            "position": (target["position"] + jnp.asarray([0.02, -0.01, 0.02]))[
                None
            ],
            "orientation": jnp.asarray([[0.03, 0.0, 0.0, 1.0]])
            / jnp.sqrt(1.0 + 0.03**2),
            "scale": (target["scale"] * 1.1)[None],
            "latent": target["latent"],
        }
        final_state, _, log = pipeline._refine(
            state,
            depth[None],
            points,
            point_masks,
            jnp.zeros((1, 3)),
            jnp.asarray([[0.0, 0.0, 0.0, 1.0]]),
            True,
        )
        losses = np.asarray(log["loss"])
        assert losses[-1] < losses[0], f"coherent={coherent}: {losses}"
        results[coherent] = final_state

    # warm-started and cold trajectories must agree to stepping noise
    for key in ("position", "scale"):
        np.testing.assert_allclose(
            np.asarray(results[True][key]),
            np.asarray(results[False][key]),
            atol=2e-3,
            err_msg=f"temporal coherence diverged on {key}",
        )



def test_pipeline_roi_matches_full_frame(target):
    """ROI refinement converges like full-frame refinement.

    The ROI render is exactly the crop of the full render
    (tests/test_pallas.py pins that); end-to-end the only semantic
    difference is that estimate pixels OUTSIDE the roi (empty target
    there) leave the depth loss.  With the roi covering the observed
    bbox + margin the refined pose must land in the same place.
    """
    config = _pipeline_config(max_iterations=30)
    full = SDFPipeline(config)
    depth = target["depth"]
    mask = depth > 0
    p_full, q_full, s_full, _ = full(depth, mask)

    config_roi = dict(config, roi_size=[32, 32], roi_margin=2)
    roi_pipe = SDFPipeline(config_roi)
    assert roi_pipe._roi_for(depth[None]) == (32, 32)
    p_roi, q_roi, s_roi, _ = roi_pipe(depth, mask)
    for arr in (p_roi, q_roi, s_roi):
        assert bool(jnp.all(jnp.isfinite(arr)))
    # both runs start identically; they must agree to refinement noise
    assert float(jnp.linalg.norm(p_roi - p_full)) < 5e-3
    assert abs(float(s_roi[0] - s_full[0])) < 5e-3

    # fallback: a roi that cannot cover bbox+margin -> full frame
    config_small = dict(config, roi_size=[16, 16], roi_margin=8)
    small = SDFPipeline(config_small)
    assert small._roi_for(depth[None]) is None


def test_pipeline_roi_auto_menu(target):
    """roi_size: auto picks the smallest fitting 16-aligned crop."""
    config = _pipeline_config(max_iterations=2)
    depth = target["depth"]
    # 64x48 camera -> menu candidates (16, 16) then (32, 24->16)
    pipe = SDFPipeline(dict(config, roi_size="auto", roi_margin=0))
    roi = pipe._roi_for(depth[None])
    assert roi is not None and roi[0] % 16 == 0 and roi[1] % 16 == 0
    # huge margin -> nothing fits -> full frame
    pipe2 = SDFPipeline(dict(config, roi_size="auto", roi_margin=64))
    assert pipe2._roi_for(depth[None]) is None
    # and the auto pipeline runs end-to-end
    p, q, s, _ = pipe(depth, depth > 0)
    assert bool(jnp.all(jnp.isfinite(p)))


def test_roi_pointcloud_lift_matches_full(target):
    """ROI-lifted pc cloud == the corresponding rows of the full lift."""
    from sdfest_tpu.ops import pointset as ps

    pipe = SDFPipeline(_pipeline_config())
    depth = jnp.asarray(target["depth"], jnp.float32)
    full_pts, full_mask = ps.depth_to_pointcloud_dense(depth, pipe.camera)
    off = jnp.asarray([16, 16], jnp.int32)
    crop = jax.lax.dynamic_slice(depth, (off[0], off[1]), (32, 32))
    roi_pts, roi_mask = ps.depth_to_pointcloud_dense(
        crop, pipe.camera, pixel_offset=off
    )
    h, w = depth.shape
    rows = full_pts.reshape(h, w, 3)[16:48, 16:48].reshape(-1, 3)
    mrows = full_mask.reshape(h, w)[16:48, 16:48].reshape(-1)
    np.testing.assert_array_equal(np.asarray(roi_pts), np.asarray(rows))
    np.testing.assert_array_equal(np.asarray(roi_mask), np.asarray(mrows))


def test_pipeline_roi_multi_view(target):
    """Per-view ROI offsets: two views with different object positions."""
    config = _pipeline_config(max_iterations=3)
    pipe = SDFPipeline(dict(config, roi_size=[32, 32], roi_margin=2))
    d0 = target["depth"]
    # second view: same object, camera shifted -> different screen position
    d1 = pipe.render(
        target["sdf"],
        target["position"] + jnp.asarray([0.05, 0.02, 0.0]),
        target["orientation"],
        1.0 / target["scale"],
    )
    depths = jnp.stack([d0, d1])
    masks = depths > 0
    assert int(masks[1].sum()) > 30
    assert pipe._roi_for(depths) == (32, 32)
    p, q, s, _ = pipe(
        depths, masks,
        camera_positions=jnp.zeros((2, 3)),
        camera_orientations=jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]),
                                     (2, 1)),
    )
    assert bool(jnp.all(jnp.isfinite(p))) and bool(jnp.all(jnp.isfinite(q)))
