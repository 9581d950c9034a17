"""Model shape/contract tests and torch-golden parity for the VAE.

The parity tests import the reference implementation (read-only, torch CPU)
as a golden oracle and compare against our flax modules with converted
weights, using the real pretrained mug VAE checkpoint shipped in the
reference test fixtures.
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

from sdfest_tpu.models import (
    GeneralizedIterativePointNet,
    IterativePointNet,
    SDFPoseHead,
    SDFPoseNet,
    VanillaPointNet,
    create_pose_net,
    create_vae_from_config,
)

REFERENCE_DIR = "/root/reference"
MUG_DIR = os.path.join(REFERENCE_DIR, "tests", "initilization", "vae_model")
HAS_REFERENCE = os.path.isdir(MUG_DIR)


def test_vanilla_pointnet_shapes():
    net = VanillaPointNet(3, [64, 64, 1024], True)
    x = jnp.zeros((2, 500, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out.shape == (2, 1024)


def test_vanilla_pointnet_dense_residual():
    net = VanillaPointNet(3, [128, 128, 128, 128, 1024], True, dense=True, residual=True)
    x = jnp.ones((2, 100, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    out, updates = net.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert out.shape == (2, 1024)
    assert "batch_stats" in updates


def test_iterative_pointnet_shapes():
    net = IterativePointNet(0, 3, [64, 64, 1024], True)
    x = jnp.zeros((2, 500, 3))
    out = net.apply(net.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == (2, 1024)

    net2 = IterativePointNet(3, 2, [32, 64, 64, 1024], True)
    x2 = jnp.zeros((10, 50, 2))
    out2 = net2.apply(net2.init(jax.random.PRNGKey(0), x2), x2)
    assert out2.shape == (10, 1024)


def test_generalized_iterative_pointnet_shapes():
    net = GeneralizedIterativePointNet([1, 2], 3, [[32, 64], [64, 128]], False)
    x = jnp.zeros((4, 60, 3))
    out = net.apply(net.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == (4, 128)


@pytest.mark.parametrize(
    "repr_kwargs,orient_dim",
    [
        ({"orientation_repr": "quaternion"}, 4),
        (
            {"orientation_repr": "discretized", "orientation_grid_resolution": 0},
            72,
        ),
    ],
)
def test_pose_head_shapes(repr_kwargs, orient_dim):
    head = SDFPoseHead(
        in_size=1024,
        mlp_out_sizes=[512, 256, 128],
        shape_dimension=10,
        batchnorm=True,
        **repr_kwargs,
    )
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 1024))
    latent, pos, scale, orientation = head.apply(
        head.init(jax.random.PRNGKey(0), x), x
    )
    assert latent.shape == (16, 10)
    assert pos.shape == (16, 3)
    assert scale.shape == (16,)
    assert orientation.shape == (16, orient_dim)
    if repr_kwargs["orientation_repr"] == "quaternion":
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(orientation), axis=1), 1.0, atol=1e-5
        )


def _mug_config():
    with open(os.path.join(MUG_DIR, "mug.yaml")) as f:
        return yaml.safe_load(f)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference checkpoint unavailable")
def test_vae_shapes_with_mug_config():
    config = _mug_config()
    vae = create_vae_from_config(config)
    z = jnp.zeros((2, config["latent_size"]))
    variables = vae.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64, 64)), jax.random.PRNGKey(1)
    )
    sdf = vae.apply(variables, z, method=vae.decode)
    assert sdf.shape == (2, 1, 64, 64, 64)
    x = jnp.zeros((2, 1, 64, 64, 64))
    means, log_var = vae.apply(variables, x, method=vae.encode_mean)
    assert means.shape == (2, config["latent_size"])
    assert log_var.shape == (2, config["latent_size"])


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference checkpoint unavailable")
def test_vae_decode_parity_with_torch_golden():
    """Converted mug VAE weights decode to the same SDF as the reference."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_DIR)
    from sdfest.vae.sdf_vae import SDFVAE as TorchSDFVAE

    config = _mug_config()
    torch_vae = TorchSDFVAE(
        sdf_size=64,
        latent_size=config["latent_size"],
        encoder_dict=config["encoder"],
        decoder_dict=config["decoder"],
        device=torch.device("cpu"),
        tsdf=False,
    )
    state = torch.load(os.path.join(MUG_DIR, "mug.pt"), map_location="cpu")
    torch_vae.load_state_dict(state)
    torch_vae.eval()

    rng = np.random.default_rng(0)
    z = rng.normal(size=(2, config["latent_size"])).astype(np.float32)
    with torch.no_grad():
        want = torch_vae.decode(torch.from_numpy(z)).numpy()

    from sdfest_tpu.utils.convert_torch import convert_vae_checkpoint

    vae = create_vae_from_config(config)
    params = convert_vae_checkpoint(os.path.join(MUG_DIR, "mug.pt"), config)
    got = np.asarray(
        vae.apply({"params": params}, jnp.asarray(z), method=vae.decode)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference checkpoint unavailable")
def test_vae_encode_parity_with_torch_golden():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_DIR)
    from sdfest.vae.sdf_vae import SDFVAE as TorchSDFVAE

    config = _mug_config()
    torch_vae = TorchSDFVAE(
        sdf_size=64,
        latent_size=config["latent_size"],
        encoder_dict=config["encoder"],
        decoder_dict=config["decoder"],
        device=torch.device("cpu"),
        tsdf=False,
    )
    state = torch.load(os.path.join(MUG_DIR, "mug.pt"), map_location="cpu")
    torch_vae.load_state_dict(state)
    torch_vae.eval()

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 1, 64, 64, 64)).astype(np.float32) * 0.1
    with torch.no_grad():
        want_means, want_logvar = torch_vae.encoder(torch.from_numpy(x))

    from sdfest_tpu.utils.convert_torch import convert_vae_checkpoint

    vae = create_vae_from_config(config)
    params = convert_vae_checkpoint(os.path.join(MUG_DIR, "mug.pt"), config)
    means, log_var = vae.apply(
        {"params": params}, jnp.asarray(x), method=vae.encode_mean
    )
    np.testing.assert_allclose(
        np.asarray(means), want_means.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(log_var), want_logvar.numpy(), atol=2e-4
    )


def test_create_pose_net_from_config():
    init_config = {
        "backbone_type": "VanillaPointNet",
        "backbone": {
            "in_size": 3,
            "mlp_out_sizes": [128, 128, 128, 128, 1024],
            "batchnorm": True,
            "dense": True,
            "residual": True,
        },
        "head": {
            "in_size": 1024,
            "mlp_out_sizes": [512, 256, 128],
            "batchnorm": True,
            "orientation_repr": "discretized",
            "orientation_grid_resolution": 1,
        },
    }
    net = create_pose_net(init_config, shape_dimension=8)
    x = jnp.zeros((2, 300, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    latent, pos, scale, orientation = net.apply(variables, x)
    assert latent.shape == (2, 8)
    assert pos.shape == (2, 3)
    assert scale.shape == (2,)
    assert orientation.shape == (2, 576)  # 72 * 8 cells at resolution 1
