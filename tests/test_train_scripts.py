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
