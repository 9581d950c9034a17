"""Packaged config-tree tests.

The reference ships three config trees (estimation, initialization, vae).
These tests assert the initialization/vae trees packaged here resolve
through the layered loader with the reference's values
(/root/reference/sdfest/initialization/configs/*.yaml,
/root/reference/sdfest/vae/configs/*.yaml) and that every architecture
variant actually instantiates.
"""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdfest_tpu.utils.config import load_config_from_file

CONFIG_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "sdfest_tpu",
    "configs",
)

ALL_YAMLS = sorted(
    glob.glob(os.path.join(CONFIG_ROOT, "**", "*.yaml"), recursive=True)
)


@pytest.mark.parametrize(
    "path", ALL_YAMLS, ids=[os.path.relpath(p, CONFIG_ROOT) for p in ALL_YAMLS]
)
def test_every_packaged_config_loads(path):
    config = load_config_from_file(path)
    assert isinstance(config, dict)
    assert "config" not in config  # includes fully resolved


def test_init_discretized_mug_matches_reference_values():
    c = load_config_from_file(
        os.path.join(CONFIG_ROOT, "init", "discretized_mug.yaml")
    )
    # training params (reference discretized.yaml)
    assert c["batch_size"] == 32
    assert c["iterations"] == 500000
    assert c["orientation_repr"] == "discretized"
    assert c["orientation_grid_resolution"] == 1
    assert c["orientation_weight"] == 5
    # category overlay (reference discretized_mug.yaml)
    assert c["category_str"] == "mug"
    gen = c["datasets"]["generated_dataset"]["config_dict"]
    assert gen["extent_mean"] == 0.11 and gen["z_min"] == 0.2
    # namespaced includes: vae model + NOCS split files
    assert c["vae"]["latent_size"] == 8
    assert c["vae"]["decoder"]["fc_layers"][-1]["out"] == 8192
    assert c["datasets"]["camera_train"]["config_dict"]["split"] == "camera_train"
    assert (
        c["validation_datasets"]["camera_val"]["config_dict"]["split"]
        == "camera_val"
    )
    # backbone from discretized.yaml
    assert c["backbone"]["dense"] and c["backbone"]["residual"]


def test_init_quaternion_mug_overrides():
    c = load_config_from_file(
        os.path.join(CONFIG_ROOT, "init", "quaternion_mug.yaml")
    )
    assert c["orientation_repr"] == "quaternion"
    assert c["orientation_weight"] == 50
    assert c["vae"]["latent_size"] == 8


VAE_VARIANTS = [
    "decoder_old",
    "decoder_1",
    "decoder_1_relu",
    "decoder_2",
    "decoder_3",
    "big_1_relu",
]


@pytest.mark.parametrize("variant", VAE_VARIANTS)
def test_vae_config_variants_instantiate(variant):
    """Every published architecture variant builds and decodes to 64^3."""
    from sdfest_tpu.models.vae import create_vae_from_config

    base = load_config_from_file(
        os.path.join(CONFIG_ROOT, "vae", "default_network.yaml")
    )
    overlay = load_config_from_file(
        os.path.join(CONFIG_ROOT, "vae", f"{variant}.yaml")
    )
    config = dict(base)
    config.update(overlay)
    vae = create_vae_from_config(config)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, config["latent_size"]))
    params = vae.init(key, jnp.zeros((1, 1, 64, 64, 64)), key)["params"]
    out = vae.apply({"params": params}, z, method=vae.decode)
    assert out.shape == (1, 1, 64, 64, 64)
    assert np.isfinite(np.asarray(out)).all()
    # encoder path (big_1_relu swaps in MaxPool3d/Linear layers)
    mean, log_var = vae.apply(
        {"params": params}, jnp.zeros((1, 1, 64, 64, 64)), method=vae.encode_mean
    )
    assert mean.shape == (1, config["latent_size"])


def test_trainer_accepts_reference_style_flat_config(tmp_path):
    """The init Trainer consumes a reference-layout config: flat training
    keys, ``vae:`` namespace, trainer-level orientation_repr propagated
    into head and dataset configs (reference train.py:56-68)."""
    from sdfest_tpu.scripts.train_init import Trainer

    config = load_config_from_file(
        os.path.join(CONFIG_ROOT, "init", "discretized_mug.yaml")
    )
    # shrink to smoke-test size; drop the NOCS loaders (no dataset on disk)
    config["vae"]["model"] = None
    config["vae"]["model_url"] = None
    config["iterations"] = 2
    config["batch_size"] = 2
    config["num_points"] = 128
    config["checkpoint_iteration"] = 0
    config["validation_iteration"] = 0
    config["datasets"] = {
        "generated_dataset": config["datasets"]["generated_dataset"]
    }
    config["validation_datasets"] = {}
    gen = config["datasets"]["generated_dataset"]["config_dict"]
    gen["width"], gen["height"] = 64, 48
    config["model_dir"] = str(tmp_path / "models")
    config["log_dir"] = None

    trainer = Trainer(config)
    # propagation happened
    head_cfg = trainer.trainer._config["head"] if hasattr(
        trainer.trainer, "_config"
    ) else config["head"]
    assert config["head"]["orientation_repr"] == "discretized"
    assert gen["orientation_repr"] == "discretized"
    assert gen["category_str"] == "mug"
    result = trainer.run()
    assert os.path.isfile(result["model"])


def test_cli_scientific_notation_parses_as_float():
    """"1e-4" (bare exponent, a YAML-1.1 string) must become a float."""
    from sdfest_tpu.utils.config import _parse_value

    assert _parse_value("1e-4") == 1e-4
    assert isinstance(_parse_value("1e-4"), float)
    assert _parse_value("1.0e-4") == 1e-4
    assert _parse_value("5") == 5
    assert _parse_value("hello") == "hello"
    assert _parse_value("[1, 2]") == [1, 2]
