"""Pose/shape estimation heads and backbone composition (flax).

Capability parity with /root/reference/sdfest/initialization/
sdf_pose_network.py: an MLP head splitting its output into latent shape,
position, scale and orientation, with two orientation representations:
``"quaternion"`` (4 outputs, L2-normalized) and ``"discretized"`` (logits
over an SO(3) Hopf-fibration grid).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sdfest_tpu.models.pointnet import (
    GeneralizedIterativePointNet,
    IterativePointNet,
    VanillaPointNet,
)
from sdfest_tpu.ops.so3grid import SO3Grid


class SDFPoseHead(nn.Module):
    """MLP head mapping a feature vector to (latent, position, scale, orientation).

    Args:
        in_size: Number of input features.
        mlp_out_sizes: Output sizes of each linear layer.
        shape_dimension: Dimension of the latent shape description.
        batchnorm: Whether to use batchnorm.
        orientation_repr: ``"quaternion"`` or ``"discretized"``.
        orientation_grid_resolution: SO(3) grid resolution (discretized only).
    """

    in_size: int
    mlp_out_sizes: Sequence[int]
    shape_dimension: int
    batchnorm: bool
    orientation_repr: str = "quaternion"
    orientation_grid_resolution: Optional[int] = None

    def grid(self) -> Optional[SO3Grid]:
        """The SO(3) grid owned by this head (discretized repr only)."""
        if self.orientation_repr == "discretized":
            return SO3Grid(self.orientation_grid_resolution)
        return None

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """Returns (latent_shape, position, scale, orientation).

        For ``"quaternion"`` the orientation is (N, 4), scalar-last,
        normalized.  For ``"discretized"`` it is raw logits (N, num_cells);
        use softmax / cross-entropy downstream.
        """
        out = x
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

        if self.orientation_repr == "quaternion":
            out = nn.Dense(self.shape_dimension + 8, name="final")(out)
            orientation = out[:, self.shape_dimension + 4 :]
            orientation = orientation / jnp.sqrt(
                jnp.sum(orientation**2, axis=1, keepdims=True)
            )
        elif self.orientation_repr == "discretized":
            num_cells = SO3Grid(self.orientation_grid_resolution).num_cells()
            out = nn.Dense(self.shape_dimension + 4 + num_cells, name="final")(out)
            orientation = out[:, self.shape_dimension + 4 :]
        else:
            raise NotImplementedError(
                f"orientation_repr {self.orientation_repr} is not supported."
            )
        return (
            out[:, : self.shape_dimension],
            out[:, self.shape_dimension : self.shape_dimension + 3],
            out[:, self.shape_dimension + 3],
            orientation,
        )


class SDFPoseNet(nn.Module):
    """Backbone + head composition for single-shot pose/shape estimation."""

    backbone: nn.Module
    head: nn.Module

    def __call__(self, x: jax.Array, train: bool = False):
        out = self.backbone(x, train=train)
        return self.head(out, train=train)


BACKBONE_TYPES = {
    "VanillaPointNet": VanillaPointNet,
    "IterativePointNet": IterativePointNet,
    "GeneralizedIterativePointNet": GeneralizedIterativePointNet,
}


def create_pose_net(init_config: Dict[str, Any], shape_dimension: int) -> SDFPoseNet:
    """Build an :class:`SDFPoseNet` from a reference-format init config.

    Args:
        init_config: Dict with ``backbone_type``, ``backbone``, ``head``
            entries (see reference configs/models/*.yaml).
        shape_dimension: Latent size of the companion VAE.
    """
    backbone_cls = BACKBONE_TYPES[init_config["backbone_type"]]
    backbone = backbone_cls(**init_config["backbone"], name="backbone")
    head = SDFPoseHead(
        shape_dimension=shape_dimension, **init_config["head"], name="head"
    )
    return SDFPoseNet(backbone=backbone, head=head)
