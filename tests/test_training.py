"""Tests for the synthetic data generator, trainers, and DP sharding."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdfest_tpu.datasets.generated import SDFVAEViewDataset
from sdfest_tpu.models.vae import create_vae_from_config
from sdfest_tpu.ops.so3grid import SO3Grid
from sdfest_tpu.ops.so3grid_jax import quat_to_index
from sdfest_tpu.ops import quaternion
from sdfest_tpu.training import InitTrainer, VAETrainer


def tiny_vae_config(res=16):
    return {
        "latent_size": 4,
        "tsdf": False,
        "sdf_size": res,
        "encoder": {
            "layer_infos": [
                {
                    "type": "Conv3d",
                    "args": {
                        "in_channels": 1,
                        "out_channels": 4,
                        "kernel_size": 3,
                        "stride": 2,
                    },
                },
                {"type": "ReLU", "args": {}},
                {"type": "Flatten", "args": {}},
            ]
        },
        "decoder": {
            "fc_layers": [{"out": 16}, {"out": 256}],
            "conv_layers": [
                {
                    "in_size": 4,
                    "in_channels": 4,
                    "out_channels": 1,
                    "kernel_size": 1,
                    "relu": False,
                },
            ],
        },
        "learning_rate": 1e-3,
        "l2_small_weight": 10.0,
        "l2_large_weight": 1.0,
        "l1_small_weight": 0.0,
        "l1_large_weight": 0.0,
        "kld_weight": 1.0,
        "pc_weight": 0.0,
    }


def tiny_init_config(repr="discretized"):
    head = {
        "in_size": 32,
        "mlp_out_sizes": [32],
        "batchnorm": True,
        "orientation_repr": repr,
    }
    if repr == "discretized":
        head["orientation_grid_resolution"] = 0
    return {
        "backbone_type": "VanillaPointNet",
        "backbone": {"in_size": 3, "mlp_out_sizes": [16, 32], "batchnorm": True},
        "head": head,
        "learning_rate": 1e-3,
        "position_weight": 100.0,
        "scale_weight": 100.0,
        "orientation_weight": 1.0,
        "latent_weight": 1.0,
    }


def _dataset(vae_config=None, **overrides):
    vae_config = vae_config or tiny_vae_config()
    vae = create_vae_from_config(vae_config)
    res = vae_config["sdf_size"]
    params = vae.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1, res, res, res)),
        jax.random.PRNGKey(1),
    )["params"]
    config = {
        "width": 32,
        "height": 24,
        "fov_deg": 90,
        "z_min": 0.2,
        "z_max": 0.8,
        "extent_mean": 0.2,
        "extent_std": 0.01,
        "pointcloud": True,
        "normalize_pose": True,
        "render_threshold": 0.01,
        "orientation_repr": "discretized",
        "orientation_grid_resolution": 0,
        "num_points": 64,
    }
    config.update(overrides)
    return SDFVAEViewDataset(config, vae, params), vae, params


def test_quat_to_index_matches_host():
    grid = SO3Grid(1)
    quats = np.asarray(
        quaternion.random_uniform(jax.random.PRNGKey(3), (100,))
    )
    jax_idx = np.asarray(jax.vmap(lambda q: quat_to_index(q, 1))(jnp.asarray(quats)))
    host_idx = np.array([grid.quat_to_index(q) for q in quats])
    np.testing.assert_array_equal(jax_idx, host_idx)


def test_sample_batch_shapes_and_labels():
    dataset, _, _ = _dataset()
    batch = dataset.sample_batch(jax.random.PRNGKey(0), 4)
    assert batch["depth"].shape == (4, 24, 32)
    assert batch["pointset"].shape == (4, 64, 3)
    assert batch["latent_shape"].shape == (4, 4)
    assert batch["position"].shape == (4, 3)
    assert batch["quaternion"].shape == (4, 4)
    assert batch["orientation"].shape == (4,)  # discretized indices
    assert batch["orientation"].dtype == jnp.int32
    assert batch["scale"].shape == (4,)
    # orientation indices are within the grid
    assert int(batch["orientation"].max()) < 72
    # normalized pose: valid pointsets have ~zero centroid
    for i in range(4):
        if bool(batch["valid"][i]):
            centroid = np.asarray(batch["pointset"][i]).mean(axis=0)
            assert np.linalg.norm(centroid) < 0.2


def test_sample_batch_mask_and_blur_augmentations():
    dataset, _, _ = _dataset(
        mask_noise=True,
        mask_noise_min=0.1,
        mask_noise_max=2.0,
        gaussian_noise_probability=1.0,
    )
    batch = dataset.sample_batch(jax.random.PRNGKey(1), 4)
    assert bool(jnp.all(jnp.isfinite(batch["depth"])))
    assert bool(jnp.all(jnp.isfinite(batch["pointset"])))


def test_quaternion_repr_dataset():
    dataset, _, _ = _dataset(orientation_repr="quaternion")
    batch = dataset.sample_batch(jax.random.PRNGKey(0), 2)
    assert batch["orientation"].shape == (2, 4)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(batch["orientation"]), axis=-1), 1.0, atol=1e-5
    )


def test_vae_trainer_loss_decreases():
    config = tiny_vae_config()
    trainer = VAETrainer(config)
    state = trainer.init_state(jax.random.PRNGKey(0))
    res = config["sdf_size"]
    # toy dataset: spheres of varying radius
    c = np.linspace(-1, 1, res)
    x, y, z = np.meshgrid(c, c, c, indexing="ij")
    r = np.sqrt(x * x + y * y + z * z)
    batch = jnp.asarray(
        np.stack([(r - rad).astype(np.float32) for rad in (0.3, 0.5, 0.7, 0.6)])[
            :, None
        ]
    )
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(60):
        key, sub = jax.random.split(key)
        state, metrics = trainer.train_step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.6, losses[::10]


def test_vae_trainer_pc_loss_path():
    config = tiny_vae_config()
    config.update(pc_weight=1.0, pc_render_width=32, pc_render_height=24)
    trainer = VAETrainer(config)
    state = trainer.init_state(jax.random.PRNGKey(0))
    res = config["sdf_size"]
    c = np.linspace(-1, 1, res)
    x, y, z = np.meshgrid(c, c, c, indexing="ij")
    batch = jnp.asarray(
        (np.sqrt(x * x + y * y + z * z) - 0.5).astype(np.float32)
    )[None, None]
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_pc"]))


@pytest.mark.parametrize("repr", ["discretized", "quaternion"])
def test_init_trainer_loss_decreases(repr):
    dataset, _, _ = _dataset(
        orientation_repr=repr,
        **({"orientation_grid_resolution": 0} if repr == "discretized" else {}),
    )
    trainer = InitTrainer(tiny_init_config(repr), latent_size=4)
    state = trainer.init_state(jax.random.PRNGKey(0), num_points=64)
    batch = dataset.sample_batch(jax.random.PRNGKey(0), 8)
    losses = []
    for i in range(25):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::8]
    val = trainer.compute_metrics(state, batch)
    assert np.isfinite(val["geodesic_distance"])


def test_data_parallel_step_matches_single_device():
    from sdfest_tpu.parallel import make_mesh, data_parallel_step

    assert len(jax.devices()) >= 8
    # batchnorm off for the exactness check: with BN, max-pool ties shift
    # with float32 reduction order and the subgradient tie-splitting makes
    # gradients legitimately sharding-sensitive
    config = tiny_init_config()
    config["backbone"]["batchnorm"] = False
    config["head"]["batchnorm"] = False
    trainer = InitTrainer(config, latent_size=4)
    state = trainer.init_state(jax.random.PRNGKey(0), num_points=64)
    dataset, _, _ = _dataset()
    batch = dataset.sample_batch(jax.random.PRNGKey(0), 8)
    batch = {
        k: batch[k]
        for k in ("pointset", "latent_shape", "position", "scale", "orientation")
    }

    def grads_fn(state, batch):
        return jax.grad(trainer._loss, has_aux=True)(
            state["params"], state["batch_stats"], batch
        )

    single_grads, (single_metrics, _) = jax.jit(grads_fn)(state, batch)

    mesh = make_mesh(8)
    dp_grads_fn = data_parallel_step(
        grads_fn, mesh, batch_argnums=(1,), donate_argnums=()
    )
    dp_grads, (dp_metrics, _) = dp_grads_fn(state, batch)
    np.testing.assert_allclose(
        float(dp_metrics["loss"]), float(single_metrics["loss"]), rtol=1e-5
    )
    # gradients agree up to float32 reduction-order noise
    for a, b in zip(
        jax.tree_util.tree_leaves(single_grads),
        jax.tree_util.tree_leaves(dp_grads),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.maximum(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-5)

    # and a DP train step runs end-to-end producing finite params
    dp_step = data_parallel_step(
        trainer.step, mesh, batch_argnums=(1,), donate_argnums=()
    )
    dp_state, dp_metrics2 = dp_step(state, batch)
    assert all(
        bool(jnp.all(jnp.isfinite(leaf)))
        for leaf in jax.tree_util.tree_leaves(dp_state["params"])
    )


def test_shard_map_dp_step_matches_single_device():
    """The shard_map DP wrapper (local-batch tracing; the production DP
    path for the sequentially-vmapped pallas stages) matches the
    single-device step."""
    from sdfest_tpu.parallel import make_mesh, shard_map_data_parallel_step

    assert len(jax.devices()) >= 8
    config = tiny_init_config()
    config["backbone"]["batchnorm"] = False
    config["head"]["batchnorm"] = False
    trainer = InitTrainer(config, latent_size=4)
    state = trainer.init_state(jax.random.PRNGKey(0), num_points=64)
    dataset, _, _ = _dataset()
    batch = dataset.sample_batch(jax.random.PRNGKey(0), 8)
    batch = {
        k: batch[k]
        for k in ("pointset", "latent_shape", "position", "scale", "orientation")
    }
    single_state, single_metrics = jax.jit(trainer.step)(state, batch)
    mesh = make_mesh(8)
    dp_step = shard_map_data_parallel_step(
        trainer.step, mesh, batch_argnums=(1,), donate_argnums=()
    )
    dp_state, dp_metrics = dp_step(state, batch)
    np.testing.assert_allclose(
        float(dp_metrics["loss"]), float(single_metrics["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(single_state["params"]),
        jax.tree_util.tree_leaves(dp_state["params"]),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.maximum(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-5)


def test_shard_map_dp_vae_step_runs():
    """VAE trainer under the shard_map DP wrapper: psum'd sum-losses,
    per-shard key folding, finite update."""
    from sdfest_tpu.parallel import make_mesh, shard_map_data_parallel_step

    assert len(jax.devices()) >= 8
    trainer = VAETrainer(tiny_vae_config())
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (8, 1, 16, 16, 16))
    mesh = make_mesh(8)
    dp_step = shard_map_data_parallel_step(
        trainer.step, mesh, batch_argnums=(1,), donate_argnums=()
    )
    new_state, metrics = dp_step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert all(
        bool(jnp.all(jnp.isfinite(leaf)))
        for leaf in jax.tree_util.tree_leaves(new_state["params"])
    )
