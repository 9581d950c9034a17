"""Parametrized PointNet backbones (flax).

Capability parity with /root/reference/sdfest/initialization/pointnet.py:
``VanillaPointNet`` (per-point MLP + max-pool, optional batchnorm / dense
global-feature concat / residual), ``IterativePointNet`` and
``GeneralizedIterativePointNet``.  Point sets are dense ``(N, M, C)``
arrays; TPU-friendly since M is static.  Max-pooling over points maps to a
single VPU reduction; the per-point MLPs are batched matmuls on the MXU.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class VanillaPointNet(nn.Module):
    """PointNet without transformation layers (no T-nets).

    Args:
        in_size: Dimension of the input points.
        mlp_out_sizes: Output sizes of each linear layer.
        batchnorm: Whether to use batchnorm (over channels, across all
            points and sets, as in the reference).
        residual: Add previous layer output when shapes match.
        dense: Concatenate the running global max-feature to every point
            between layers.
    """

    in_size: int
    mlp_out_sizes: Sequence[int]
    batchnorm: bool
    residual: bool = False
    dense: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """Forward pass; ``x`` has shape (N, M, C). Returns (N, features).

        The per-point MLP runs on the flattened ``(N*M, C)`` view: XLA then
        emits one large MXU matmul per layer instead of treating the point
        axis as a convolution spatial dimension (the rank-3 form routed
        libtpu's SpatialMajorConvolution fusion in inference mode, which
        both tiles worse and hits a compiler CHECK when fused with the
        point-axis max reduction).
        """
        num_layers = len(self.mlp_out_sizes)
        n, m, _ = x.shape
        out = prev_out = x.reshape(n * m, -1)
        for i, out_size in enumerate(self.mlp_out_sizes):
            out = nn.Dense(out_size, name=f"linear_{i}")(out)
            if self.batchnorm:
                out = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    name=f"bn_{i}",
                )(out)
            out = nn.relu(out)
            if self.dense:
                out_max = jnp.max(out.reshape(n, m, -1), axis=1)
                if i != num_layers - 1:
                    out = jnp.concatenate(
                        [
                            out,
                            jnp.broadcast_to(
                                out_max[:, None, :], (n, m, out.shape[-1])
                            ).reshape(n * m, -1),
                        ],
                        axis=-1,
                    )
            if self.residual:
                if prev_out.shape == out.shape:
                    out = prev_out + out
            prev_out = out
        return jnp.max(out.reshape(n, m, -1), axis=1)


class IterativePointNet(nn.Module):
    """Two PointNets; the second is re-applied to concat(out, input).

    ``num_concat`` repetitions: ``out = PN2(concat(out, x))``.
    """

    num_concat: int
    in_size: int
    mlp_out_sizes: Sequence[int]
    batchnorm: bool

    def setup(self):
        self.pointnet_1 = VanillaPointNet(
            self.in_size, self.mlp_out_sizes, self.batchnorm, name="pointnet_1"
        )
        self.pointnet_2 = VanillaPointNet(
            self.in_size + self.mlp_out_sizes[-1],
            self.mlp_out_sizes,
            self.batchnorm,
            name="pointnet_2",
        )

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out = self.pointnet_1(x, train=train)
        set_size = x.shape[1]
        for _ in range(self.num_concat):
            repeated = jnp.broadcast_to(
                out[:, None, :], (x.shape[0], set_size, out.shape[-1])
            )
            modified_x = jnp.concatenate([repeated, x], axis=2)
            out = self.pointnet_2(modified_x, train=train)
        return out


class GeneralizedIterativePointNet(nn.Module):
    """Sequence of IterativePointNets, input re-concatenated each stage."""

    list_concat: Sequence[int]
    in_size: int
    list_mlp_out_sizes: Sequence[Sequence[int]]
    batchnorm: bool

    def setup(self):
        nets = []
        in_size = self.in_size
        for i, (num_concat, mlp_out_sizes) in enumerate(
            zip(self.list_concat, self.list_mlp_out_sizes)
        ):
            nets.append(
                IterativePointNet(
                    num_concat,
                    in_size,
                    mlp_out_sizes,
                    self.batchnorm,
                    name=f"iterative_pointnet_{i}",
                )
            )
            in_size = mlp_out_sizes[-1] + self.in_size
        self.nets = nets

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        set_size = x.shape[1]
        init_x = x
        out = None
        for net in self.nets:
            out = net(x, train=train)
            repeated = jnp.broadcast_to(
                out[:, None, :], (x.shape[0], set_size, out.shape[-1])
            )
            x = jnp.concatenate([repeated, init_x], axis=2)
        return out
