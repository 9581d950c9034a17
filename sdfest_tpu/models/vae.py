"""Variational autoencoder over voxelized signed distance fields (flax).

Capability parity with /root/reference/sdfest/vae/sdf_vae.py, rebuilt as pure
functional flax modules.  The config schema of the reference is preserved
(encoder ``layer_infos`` with fully-qualified type strings, decoder
``fc_layers``/``conv_layers`` lists), so released hyperparameter files carry
over unchanged; the torch type names are mapped to JAX-native layers and
pretrained torch checkpoints convert one-to-one
(see :mod:`sdfest_tpu.utils.convert_torch`).

Conventions:
- SDF batches have shape ``(N, 1, D, D, D)`` (channel-first, matching the
  reference API); internally computation is channel-last (NDHWC) which is
  the native layout for XLA TPU convolutions.
- ``tsdf`` truncation: inputs are clamped by :func:`prepare_input` only;
  decoder outputs are clamped in the forward pass when ``enforce_tsdf``.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from sdfest_tpu.ops.interpolation import resize_trilinear


def _to_tuple3(v) -> Tuple[int, int, int]:
    if isinstance(v, (list, tuple)):
        return tuple(v)
    return (v, v, v)


class SDFEncoder(nn.Module):
    """Config-driven convolutional encoder producing mean/log-var heads.

    ``layer_infos`` entries are ``{"type": <name>, "args": {...}}`` dicts.
    Supported types (torch names accepted for config compatibility):
    ``Conv3d``, ``ReLU``, ``Flatten``, ``MaxPool3d``, ``Linear``.
    """

    volume_size: int
    latent_size: int
    layer_infos: Sequence[Dict[str, Any]]
    tsdf: Union[bool, float] = False

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        # (N, 1, D, D, D) -> (N, D, D, D, 1)
        out = jnp.moveaxis(x, 1, -1)
        for i, layer_info in enumerate(self.layer_infos):
            type_name = layer_info["type"].split(".")[-1].lower()
            args = layer_info.get("args", {})
            if type_name == "conv3d":
                out = nn.Conv(
                    features=args["out_channels"],
                    kernel_size=_to_tuple3(args.get("kernel_size", 3)),
                    strides=_to_tuple3(args.get("stride", 1)),
                    padding=args.get("padding", 0)
                    if isinstance(args.get("padding", 0), str)
                    else [(p, p) for p in _to_tuple3(args.get("padding", 0))],
                    name=f"features_{i}",
                )(out)
            elif type_name == "relu":
                out = nn.relu(out)
            elif type_name == "flatten":
                # match torch NCDHW flatten ordering for weight-compatible
                # downstream linear layers
                out = jnp.moveaxis(out, -1, 1)
                out = out.reshape(out.shape[0], -1)
            elif type_name == "maxpool3d":
                k = _to_tuple3(args.get("kernel_size", 2))
                s = _to_tuple3(args.get("stride", args.get("kernel_size", 2)))
                out = nn.max_pool(out, window_shape=k, strides=s)
            elif type_name == "linear":
                out = nn.Dense(args["out_features"], name=f"features_{i}")(out)
            else:
                raise ValueError(f"Unsupported encoder layer type {layer_info['type']}")
        means = nn.Dense(self.latent_size, name="linear_means")(out)
        log_vars = nn.Dense(self.latent_size, name="linear_log_var")(out)
        return means, log_vars


class SDFDecoder(nn.Module):
    """FC stack -> reshape -> alternating trilinear-upsample + Conv3d blocks.

    ``fc_layers``: ``[{"out": int}, ...]`` (ReLU after each).
    ``conv_layers``: ``[{"in_size", "in_channels", "out_channels",
    "kernel_size", "relu"}, ...]``; before each conv the volume is resized to
    ``in_size`` when needed; convolutions are unpadded (VALID), matching the
    reference's torch defaults.
    """

    volume_size: int
    latent_size: int
    fc_layers: Sequence[Dict[str, Any]]
    conv_layers: Sequence[Dict[str, Any]]
    tsdf: Union[bool, float] = False

    def setup(self):
        assert self.fc_layers[-1]["out"] == (
            self.conv_layers[0]["in_channels"] * self.conv_layers[0]["in_size"] ** 3
        )
        for i, conv in enumerate(self.conv_layers[:-1]):
            assert conv["out_channels"] == self.conv_layers[i + 1]["in_channels"]
        assert self.conv_layers[-1]["out_channels"] == 1
        self._fcs = [
            nn.Dense(fc["out"], name=f"fc_{i}") for i, fc in enumerate(self.fc_layers)
        ]
        self._convs = [
            nn.Conv(
                features=conv["out_channels"],
                kernel_size=_to_tuple3(conv["kernel_size"]),
                padding="VALID",
                name=f"conv_{i}",
            )
            for i, conv in enumerate(self.conv_layers)
        ]

    def __call__(self, z: jax.Array, enforce_tsdf: bool = False) -> jax.Array:
        out = z
        for fc in self._fcs:
            out = nn.relu(fc(out))
        c0 = self.conv_layers[0]
        out = out.reshape(
            -1, c0["in_channels"], c0["in_size"], c0["in_size"], c0["in_size"]
        )
        out = jnp.moveaxis(out, 1, -1)  # NDHWC
        for info, conv in zip(self.conv_layers, self._convs):
            if out.shape[1] != info["in_size"]:
                out = jnp.moveaxis(
                    resize_trilinear(jnp.moveaxis(out, -1, 1), info["in_size"]), 1, -1
                )
            out = conv(out)
            if info["relu"]:
                out = nn.relu(out)
        out = jnp.moveaxis(out, -1, 1)  # (N, C, D, D, D)
        if out.shape[2] != self.volume_size:
            out = resize_trilinear(out, self.volume_size)
        if self.tsdf is not False and enforce_tsdf:
            out = jnp.clip(out, -self.tsdf, self.tsdf)
        return out


class SDFVAE(nn.Module):
    """VAE over ``(N, 1, D, D, D)`` SDF grids.

    Mirrors the reference API: ``encode`` (reparameterized), ``decode``,
    ``sample``, ``inference`` and the full forward returning
    ``(recon, means, log_var, z)``.  Randomness is explicit via PRNG keys.
    """

    sdf_size: int
    latent_size: int
    encoder: Dict[str, Any]
    decoder: Dict[str, Any]
    tsdf: Union[bool, float] = False

    def setup(self):
        self._encoder = SDFEncoder(
            volume_size=self.sdf_size,
            latent_size=self.latent_size,
            layer_infos=tuple(self.encoder["layer_infos"]),
            tsdf=self.tsdf,
            name="encoder",
        )
        self._decoder = SDFDecoder(
            volume_size=self.sdf_size,
            latent_size=self.latent_size,
            fc_layers=tuple(self.decoder["fc_layers"]),
            conv_layers=tuple(self.decoder["conv_layers"]),
            tsdf=self.tsdf,
            name="decoder",
        )

    def __call__(
        self, x: jax.Array, key: jax.Array, enforce_tsdf: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        z, means, log_var = self.encode(x, key)
        recon_x = self._decoder(z, enforce_tsdf)
        return recon_x, means, log_var, z

    def encode(
        self, x: jax.Array, key: jax.Array
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        means, log_var = self._encoder(x)
        std = jnp.exp(0.5 * log_var)
        eps = jax.random.normal(key, means.shape, dtype=means.dtype)
        z = eps * std + means
        return z, means, log_var

    def encode_mean(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Deterministic encoding, returning (means, log_var)."""
        return self._encoder(x)

    def decode(self, z: jax.Array, enforce_tsdf: bool = False) -> jax.Array:
        """Decode latents ``(N, L)`` to SDFs ``(N, 1, D, D, D)``."""
        return self._decoder(z, enforce_tsdf)

    def sample(self, key: jax.Array, n: int = 1) -> jax.Array:
        return jax.random.normal(key, (n, self.latent_size))

    def inference(
        self, key: jax.Array, n: int = 1, enforce_tsdf: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        z = self.sample(key, n)
        return self._decoder(z, enforce_tsdf), z

    def prepare_input(self, sdfs: jax.Array) -> jax.Array:
        """Truncate SDF inputs to the configured TSDF band (pure)."""
        if self.tsdf is False:
            return sdfs
        return jnp.clip(sdfs, -self.tsdf, self.tsdf)


def create_vae_from_config(config: Dict[str, Any]) -> SDFVAE:
    """Build an :class:`SDFVAE` from a reference-format VAE config dict."""
    from sdfest_tpu.utils.misc import str_to_tsdf

    tsdf = str_to_tsdf(config.get("tsdf", False))
    return SDFVAE(
        sdf_size=config.get("sdf_size", 64),
        latent_size=config["latent_size"],
        encoder=config["encoder"],
        decoder=config["decoder"],
        tsdf=tsdf,
    )
