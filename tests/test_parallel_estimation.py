"""Hypothesis-sharded estimation over the 8-device virtual mesh."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

MUG_DIR = "/root/reference/tests/initilization/vae_model"
HAS_REFERENCE = os.path.isdir(MUG_DIR)

pytestmark = pytest.mark.skipif(
    not HAS_REFERENCE, reason="reference mug VAE fixture unavailable"
)


def test_sharded_hypothesis_refinement():
    from sdfest_tpu.ops import pointset
    from sdfest_tpu.parallel.estimation import (
        make_hypothesis_states,
        sharded_refine_batch,
    )
    from sdfest_tpu.pipeline.pipeline import SDFPipeline

    assert len(jax.devices()) >= 8

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
        "max_iterations": 3,
        "depth_weight": 1.0,
        "pc_weight": 3.0,
        "mean_shape": False,
        "init_view": "first",
        "iso_threshold": 0.02,
        "num_input_points": 200,
    }
    pipeline = SDFPipeline(config)
    latent = jax.random.normal(jax.random.PRNGKey(5), (1, 8))
    sdf = pipeline._decode(latent)[0, 0]
    position = jnp.asarray([0.02, -0.01, -0.45])
    orientation = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    scale = jnp.asarray(0.12)
    depth = pipeline.render(sdf, position, orientation, 1.0 / scale)
    points, pmask = jax.vmap(
        lambda d: pointset.depth_to_pointcloud_dense(d, pipeline.camera)
    )(depth[None])

    states = make_hypothesis_states(
        position[None], orientation[None], scale[None], latent,
        num_hypotheses=8, key=jax.random.PRNGKey(0),
    )
    final_states, best, log = sharded_refine_batch(
        pipeline,
        states,
        depth[None],
        points,
        pmask,
        jnp.zeros((1, 3)),
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]]),
    )
    assert final_states["position"].shape == (8, 1, 3)
    assert log["loss"].shape == (8, 3)
    assert bool(jnp.all(jnp.isfinite(final_states["position"])))
    # hypothesis 0 (unperturbed truth) should have the lowest final loss
    final_losses = np.asarray(log["loss"][:, -1])
    assert np.argmin(final_losses) == 0 or final_losses[0] < np.median(
        final_losses
    )


def test_sharded_refinement_with_multires_schedule():
    """Coarse-to-fine schedule composes with hypothesis sharding."""
    from sdfest_tpu.ops import pointset
    from sdfest_tpu.parallel.estimation import (
        make_hypothesis_states,
        sharded_refine_batch,
    )
    from sdfest_tpu.pipeline.pipeline import SDFPipeline

    assert len(jax.devices()) >= 8

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
        "max_iterations": 4,
        "multires_factor": 2,
        "multires_iterations": 2,
        "depth_weight": 1.0,
        "pc_weight": 3.0,
        "mean_shape": False,
        "init_view": "first",
        "iso_threshold": 0.02,
        "num_input_points": 200,
    }
    pipeline = SDFPipeline(config)
    assert pipeline._multires_for() == (2, 2)
    latent = jax.random.normal(jax.random.PRNGKey(5), (1, 8))
    sdf = pipeline._decode(latent)[0, 0]
    position = jnp.asarray([0.02, -0.01, -0.45])
    orientation = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    scale = jnp.asarray(0.12)
    depth = pipeline.render(sdf, position, orientation, 1.0 / scale)
    points, pmask = jax.vmap(
        lambda d: pointset.depth_to_pointcloud_dense(d, pipeline.camera)
    )(depth[None])
    states = make_hypothesis_states(
        position[None], orientation[None], scale[None], latent,
        num_hypotheses=8, key=jax.random.PRNGKey(0),
    )
    final_states, best, log = sharded_refine_batch(
        pipeline,
        states,
        depth[None],
        points,
        pmask,
        jnp.zeros((1, 3)),
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]]),
        multires=pipeline._multires_for(),
    )
    assert final_states["position"].shape == (8, 1, 3)
    # both phases land in the log (coarse 2 + fine 2 = max_iterations)
    assert log["loss"].shape == (8, 4)
    assert bool(jnp.all(jnp.isfinite(final_states["position"])))
    assert bool(jnp.all(jnp.isfinite(log["loss"])))
