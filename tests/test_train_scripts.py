"""End-to-end training script smoke tests (2-iteration runs).

Mirrors the reference tests/initilization/test_train.py: run the full
training entry points on generated and NOCS data for a couple of
iterations, asserting they produce a saved model + config pair.
"""
import os
import shutil

import numpy as np
import pytest
import yaml

NOCS_FIXTURE = "/root/reference/tests/initilization/nocs_data"
HAS_NOCS = os.path.isdir(NOCS_FIXTURE)


def tiny_vae_config():
    return {
        "latent_size": 4,
        "tsdf": False,
        "sdf_size": 16,
        "model": None,
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
    }


def test_train_vae_smoke(tmp_path):
    from sdfest_tpu.scripts.train_vae import train

    data_dir = tmp_path / "sdfs"
    data_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        np.save(data_dir / f"{i:05}.npy", rng.normal(size=(16, 16, 16)).astype(np.float32))

    config = tiny_vae_config()
    config.update(
        iterations=2,
        batch_size=2,
        learning_rate=1e-3,
        dataset_path=str(data_dir),
        l2_small_weight=10.0,
        l2_large_weight=1.0,
        kld_weight=1.0,
        pc_weight=0.0,
        model_dir=str(tmp_path / "models"),
        log_dir=None,
        checkpoint_iteration=0,
        visualization_iteration=0,
        run_name="test_vae",
    )
    result = train(config)
    assert os.path.isfile(result["model"])
    assert os.path.isfile(result["config"])
    # resume from a checkpoint roundtrip
    from sdfest_tpu.utils import checkpoint as ckpt

    ckpt_path = str(tmp_path / "ck.ckpt")
    ckpt.save_checkpoint(ckpt_path, result["state"], 2, "test_vae")
    state2, meta = ckpt.load_checkpoint(ckpt_path, result["state"])
    assert meta["iteration"] == 2


def _init_config(tmp_path, datasets):
    return {
        "run_name": "test_init",
        "model_dir": str(tmp_path / "models"),
        "log_dir": None,
        "vae": tiny_vae_config(),
        "init": {
            "datasets": datasets,
            "batch_size": 2,
            "iterations": 2,
            "num_points": 64,
            "learning_rate": 1e-3,
            "position_weight": 100.0,
            "scale_weight": 100.0,
            "orientation_weight": 1.0,
            "latent_weight": 1.0,
            "validation_iteration": 0,
            "checkpoint_iteration": 2,
            "backbone_type": "VanillaPointNet",
            "backbone": {"in_size": 3, "mlp_out_sizes": [16, 32], "batchnorm": True},
            "head": {
                "in_size": 32,
                "mlp_out_sizes": [16],
                "batchnorm": True,
                "orientation_repr": "discretized",
                "orientation_grid_resolution": 0,
            },
        },
    }


def test_train_init_generated_smoke(tmp_path):
    from sdfest_tpu.scripts.train_init import Trainer

    datasets = {
        "generated_dataset": {
            "type": "SDFVAEViewDataset",
            "probability": 1.0,
            "config_dict": {
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
            },
        }
    }
    result = Trainer(_init_config(tmp_path, datasets)).run()
    assert os.path.isfile(result["model"])
    assert os.path.isfile(result["config"])


def test_train_init_resume(tmp_path, capsys):
    """resume: true continues from the newest <iteration>.ckpt."""
    from sdfest_tpu.scripts.train_init import Trainer

    datasets = {
        "generated_dataset": {
            "type": "SDFVAEViewDataset",
            "probability": 1.0,
            "config_dict": {
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
            },
        }
    }
    config = _init_config(tmp_path, datasets)
    config["init"]["resume"] = True
    Trainer(config).run()
    assert os.path.isfile(tmp_path / "models" / "2.ckpt")

    config["init"]["iterations"] = 4
    Trainer(config).run()
    out = capsys.readouterr().out
    assert "Resumed from" in out and "at iteration 2" in out
    assert os.path.isfile(tmp_path / "models" / "4.ckpt")


@pytest.mark.skipif(not HAS_NOCS, reason="NOCS fixture unavailable")
def test_train_init_nocs_smoke(tmp_path):
    from sdfest_tpu.scripts.train_init import Trainer

    nocs_root = tmp_path / "nocs"
    shutil.copytree(NOCS_FIXTURE, nocs_root)
    datasets = {
        "camera_train": {
            "type": "NOCSDataset",
            "probability": 1.0,
            "config_dict": {
                "root_dir": str(nocs_root),
                "split": "camera_train",
                "mask_pointcloud": True,
                "normalize_pointcloud": True,
                "scale_convention": "half_max",
                "camera_convention": "opengl",
                "remap_y_axis": "y",
                "remap_x_axis": "-z",
                "orientation_repr": "discretized",
                "orientation_grid_resolution": 0,
            },
        }
    }
    config = _init_config(tmp_path, datasets)
    config["init"]["validation_datasets"] = {
        "camera_val": {
            "type": "NOCSDataset",
            "config_dict": {
                "root_dir": str(nocs_root),
                "split": "camera_val",
                "mask_pointcloud": True,
                "normalize_pointcloud": True,
                "scale_convention": "half_max",
                "camera_convention": "opengl",
                "remap_y_axis": "y",
                "remap_x_axis": "-z",
                "orientation_repr": "discretized",
                "orientation_grid_resolution": 0,
            },
        }
    }
    config["init"]["validation_iteration"] = 2
    result = Trainer(config).run()
    assert os.path.isfile(result["model"])

def test_metrics_logger_tensorboard_sink(tmp_path):
    """MetricsLogger fans out to tensorboard; wandb is optional and guarded."""
    from sdfest_tpu.utils.logging import MetricsLogger, make_logger

    logger = MetricsLogger({"log_dir": str(tmp_path)}, "run")
    assert logger.active
    logger.add_scalar("loss", 1.0, 0)
    logger.close()
    assert any(tmp_path.joinpath("run").iterdir())

    # wandb requested but unavailable -> no sink, no crash
    assert make_logger({"wandb": True}, "run2") is None
    # nothing configured -> None
    assert make_logger({}, "run3") is None


def test_metrics_logger_csv_sink(tmp_path):
    """scalar_csv writes plain step,name,value rows; reopening appends."""
    from sdfest_tpu.utils.logging import make_logger

    path = tmp_path / "curves" / "scalars.csv"
    logger = make_logger({"scalar_csv": str(path)}, "run")
    assert logger is not None and logger.active
    logger.add_scalar("loss", 1.5, 20)
    logger.add_scalar("kld", 0.25, 20)
    logger.close()
    logger = make_logger({"scalar_csv": str(path)}, "run")
    logger.add_scalar("loss", 1.25, 40)
    logger.close()
    lines = path.read_text().strip().splitlines()
    assert lines[0] == "step,name,value"
    assert lines[1:] == ["20,loss,1.5", "20,kld,0.25", "40,loss,1.25"]


def test_train_init_benchmark_steps(tmp_path, capsys):
    from sdfest_tpu.scripts.train_init import Trainer

    datasets = {
        "generated_dataset": {
            "type": "SDFVAEViewDataset",
            "probability": 1.0,
            "config_dict": {
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
            },
        }
    }
    mean = Trainer(_init_config(tmp_path, datasets)).benchmark(steps=2)
    assert mean > 0
    assert "train step:" in capsys.readouterr().out


def test_train_vae_benchmark_steps(tmp_path, capsys):
    from sdfest_tpu.scripts.train_vae import benchmark

    data_dir = tmp_path / "sdfs"
    data_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        np.save(data_dir / f"{i:05}.npy",
                rng.normal(size=(16, 16, 16)).astype(np.float32))
    config = tiny_vae_config()
    config.update(
        batch_size=2, learning_rate=1e-3, dataset_path=str(data_dir),
        l2_small_weight=10.0, l2_large_weight=1.0, kld_weight=1.0,
        pc_weight=0.0,
    )
    assert benchmark(config, steps=2) > 0
    assert "train step:" in capsys.readouterr().out


def test_generated_center_frac_restricts_positions(tmp_path):
    """center_frac < 1 confines object centers to the frame middle."""
    import jax
    import jax.numpy as jnp

    from sdfest_tpu.datasets.generated import SDFVAEViewDataset
    from sdfest_tpu.models.vae import create_vae_from_config
    from sdfest_tpu.utils import weights as weight_utils

    vae_cfg = tiny_vae_config()
    vae = create_vae_from_config(vae_cfg)
    params = weight_utils.load_vae_params(vae_cfg, vae, vae_cfg["sdf_size"])
    cfg = {
        "width": 32, "height": 24, "fov_deg": 90,
        "z_min": 0.5, "z_max": 0.5001,
        "extent_mean": 0.2, "extent_std": 0.0,
        "pointcloud": False, "normalize_pose": False,
        "render_threshold": 0.01, "center_frac": 0.01,
    }
    ds = SDFVAEViewDataset(cfg, vae, params)
    batch = ds.sample_batch(jax.random.PRNGKey(0), 8)
    # x = x_pix / fx * z with |x_pix| <= 0.01 * W/2 = 0.16 px
    assert float(jnp.max(jnp.abs(batch["position"][:, 0]))) < 0.16 / 16 * 0.51
    assert float(jnp.max(jnp.abs(batch["position"][:, 1]))) < 0.16 / 16 * 0.51
    # default (1.0) spreads centers over the full frame
    ds_full = SDFVAEViewDataset({**cfg, "center_frac": 1.0}, vae, params)
    full = ds_full.sample_batch(jax.random.PRNGKey(0), 8)
    assert float(jnp.max(jnp.abs(full["position"][:, 0]))) > 0.05


def test_validation_reports_orientation_ce(tmp_path, capsys):
    """Held-out metrics include cross-entropy for the discretized head."""
    import jax
    import numpy as np

    from sdfest_tpu.training.init_trainer import InitTrainer

    cfg = _init_config(tmp_path, {})["init"]
    trainer = InitTrainer(cfg, latent_size=4)
    state = trainer.init_state(jax.random.PRNGKey(0), num_points=64)
    n_cells = len(trainer.grid_quats)
    batch = {
        "pointset": np.zeros((2, 64, 3), np.float32),
        "latent_shape": np.zeros((2, 4), np.float32),
        "position": np.zeros((2, 3), np.float32),
        "scale": np.zeros((2,), np.float32),
        "quaternion": np.tile(np.array([0, 0, 0, 1], np.float32), (2, 1)),
        "orientation": np.zeros((2,), np.int32),
    }
    metrics = trainer.compute_metrics(state, batch)
    assert "orientation_ce" in metrics
    # an untrained head should sit near chance = ln(n_cells)
    assert abs(metrics["orientation_ce"] - np.log(n_cells)) < 2.0


def test_trim_scalar_csv(tmp_path):
    """Resume drops scalar rows past the checkpoint it restarts from."""
    from sdfest_tpu.scripts.train_init import _trim_scalar_csv

    path = tmp_path / "scalars.csv"
    path.write_text(
        "step,name,value\n10,loss,1.0\n20,loss,0.9\n30,loss,0.8\n"
    )
    _trim_scalar_csv(str(path), 20)
    assert path.read_text() == "step,name,value\n10,loss,1.0\n20,loss,0.9\n"
    # missing file is a no-op
    _trim_scalar_csv(str(tmp_path / "absent.csv"), 20)


def test_train_init_replay_buffer_smoke(tmp_path):
    """Replay-buffer training: ring writes + replay draws + train steps."""
    from sdfest_tpu.scripts.train_init import Trainer

    datasets = {
        "generated_dataset": {
            "type": "SDFVAEViewDataset",
            "probability": 1.0,
            "config_dict": {
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
            },
        }
    }
    config = _init_config(tmp_path, datasets)
    config["init"].update(
        iterations=8,
        steps_per_dispatch=2,
        replay_buffer_size=8,  # multiple of batch_size 2
        replay_train_steps=2,
        replay_train_batch=4,
        checkpoint_iteration=0,
    )
    result = Trainer(config).run()
    assert os.path.isfile(result["model"])


def test_replay_chained_step_mechanics(tmp_path):
    """Ring cursor/filled advance; metrics stack over k * t_train steps."""
    import jax
    import jax.numpy as jnp

    from sdfest_tpu.datasets.generated import SDFVAEViewDataset
    from sdfest_tpu.models.vae import create_vae_from_config
    from sdfest_tpu.training.init_trainer import InitTrainer
    from sdfest_tpu.utils import weights as weight_utils

    vae_cfg = tiny_vae_config()
    vae = create_vae_from_config(vae_cfg)
    params = weight_utils.load_vae_params(vae_cfg, vae, vae_cfg["sdf_size"])
    ds = SDFVAEViewDataset(
        {
            "width": 32, "height": 24, "fov_deg": 90,
            "z_min": 0.2, "z_max": 0.8,
            "extent_mean": 0.2, "extent_std": 0.01,
            "pointcloud": True, "normalize_pose": True,
            "render_threshold": 0.01, "num_points": 64,
            "orientation_repr": "discretized",
            "orientation_grid_resolution": 0,
        },
        vae, params,
    )
    init_cfg = _init_config(tmp_path, {})["init"]
    trainer = InitTrainer(init_cfg, latent_size=4)
    state = trainer.init_state(jax.random.PRNGKey(0), num_points=64)
    buffer = trainer.init_replay_buffer(8, 64, 4)
    step = trainer.make_replay_chained_step(
        ds, gen_batch=2, train_batch=4, t_train=3, k=2
    )
    (state, buffer), metrics = step(state, buffer, jax.random.PRNGKey(1))
    assert metrics["loss"].shape == (6,)  # k=2 units x t_train=3
    assert bool(jnp.all(jnp.isfinite(metrics["loss"])))
    assert int(buffer["filled"]) == 4  # 2 units x gen_batch 2
    assert int(buffer["cursor"]) == 4
    # ring wraps at capacity
    for _ in range(2):
        (state, buffer), _ = step(state, buffer, jax.random.PRNGKey(2))
    assert int(buffer["filled"]) == 8
    assert int(buffer["cursor"]) == 4  # 12 mod 8


def test_train_vae_chained_device_dataset(tmp_path):
    """steps_per_dispatch trains from the device-resident dataset."""
    import numpy as np

    from sdfest_tpu.scripts.train_vae import train

    data_dir = tmp_path / "sdfs"
    data_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        np.save(data_dir / f"{i:05}.npy",
                rng.normal(size=(16, 16, 16)).astype(np.float32))
    config = tiny_vae_config()
    config.update(
        batch_size=2, iterations=4, steps_per_dispatch=2,
        learning_rate=1e-3, dataset_path=str(data_dir),
        l2_small_weight=10.0, l2_large_weight=1.0, kld_weight=1.0,
        pc_weight=0.0, model_dir=str(tmp_path / "models"),
        checkpoint_iteration=0, visualization_iteration=0,
        run_name="test_vae_chained",
    )
    result = train(config)
    assert os.path.isfile(result["model"])
    assert int(result["state"]["iteration"]) == 4


def test_generated_sequential_batch_map_matches_vmap(tmp_path):
    """batch_map: sequential produces the same samples as the vmap path."""
    import jax
    import numpy as np

    from sdfest_tpu.datasets.generated import SDFVAEViewDataset
    from sdfest_tpu.models.vae import create_vae_from_config
    from sdfest_tpu.utils import weights as weight_utils

    vae_cfg = tiny_vae_config()
    vae = create_vae_from_config(vae_cfg)
    params = weight_utils.load_vae_params(vae_cfg, vae, vae_cfg["sdf_size"])
    base = {
        "width": 32, "height": 24, "fov_deg": 90,
        "z_min": 0.2, "z_max": 0.8,
        "extent_mean": 0.2, "extent_std": 0.01,
        "pointcloud": True, "normalize_pose": True,
        "render_threshold": 0.01, "num_points": 64,
    }
    a = SDFVAEViewDataset(base, vae, params).sample_batch(
        jax.random.PRNGKey(0), 3
    )
    b = SDFVAEViewDataset(
        {**base, "batch_map": "sequential"}, vae, params
    ).sample_batch(jax.random.PRNGKey(0), 3)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )
