"""Loss functions for render-and-compare estimation, pure JAX.

Capability parity with /root/reference/sdfest/estimation/losses.py, designed
for fixed-shape TPU execution: point sets are dense ``(M, 3)`` arrays with a
validity mask instead of variable-length tensors.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sdfest_tpu.ops import quaternion
from sdfest_tpu.ops.interpolation import sample_sdf_masked


def nn_loss(points_from: jax.Array, points_to: jax.Array) -> jax.Array:
    """Squared distance from each point to its nearest neighbor in the other set.

    Args:
        points_from: First point set, shape ``(N, D)``.
        points_to: Second point set, shape ``(M, D)``.
    Returns:
        Squared NN distances, shape ``(N,)``.
    """
    a = jnp.sum(points_from**2, axis=1)
    b = points_from @ points_to.T
    c = jnp.sum(points_to**2, axis=1)
    d = -2 * b + a[:, None] + c[None, :]
    d = jnp.maximum(d, 0.0)  # clamp numerical negatives
    return jnp.min(d, axis=1)


def pc_loss(
    points: jax.Array,
    position: jax.Array,
    orientation: jax.Array,
    scale: jax.Array,
    sdf: jax.Array,
    point_mask: Optional[jax.Array] = None,
    backend: str = "auto",
) -> jax.Array:
    """Trilinearly interpolated SDF value at observed point positions.

    Differentiable w.r.t. pose, orientation (with normalization gradients),
    scale and the SDF itself; zero outside the SDF volume.  The returned
    distances are metric (scaled by the SDF half-width).

    Args:
        points: Point cloud in the camera frame, shape ``(M, 3)``.
        position: SDF center in the camera frame, shape ``(3,)``.
        orientation: Quaternion (scalar-last) of the SDF, shape ``(4,)``.
        scale: Half-width of the SDF volume (scalar).
        sdf: Voxel grid, shape ``(res, res, res)``.
    Returns:
        Interpolated metric distances, shape ``(M,)``, 0 outside the volume.
    """
    from sdfest_tpu.render import api as render_api

    q = orientation / jnp.linalg.norm(orientation)  # normalization gradients
    obj_points = quaternion.apply(quaternion.invert(q), points - position)
    obj_points = obj_points / scale
    backend = render_api.resolve_backend(backend)
    if backend == "pallas" and sdf.shape[-1] == 64:
        # inside-volume mask computed densely (no gathers), sampling +
        # gradients via the Pallas MXU kernels
        from sdfest_tpu.ops.interpolation import _base_and_frac

        _, _, inside = _base_and_frac(obj_points, sdf.shape[-1])
        mask = inside
        if point_mask is not None:
            mask = jnp.logical_and(mask, point_mask != 0)
        values = render_api.sample_sdf_masked_extrapolating(
            sdf, obj_points, mask, backend="pallas"
        )
    else:
        values, _ = sample_sdf_masked(sdf, obj_points)
        if point_mask is not None:
            values = values * (point_mask != 0).astype(values.dtype)
    return values * scale


def masked_mean_abs(values: jax.Array, point_mask: jax.Array) -> jax.Array:
    """Mean |values| over valid points (the pc-loss reduction)."""
    w = (point_mask != 0).astype(values.dtype)
    return jnp.sum(jnp.abs(values) * w) / jnp.maximum(jnp.sum(w), 1.0)


def masked_pc_loss(
    points: jax.Array,
    point_mask: jax.Array,
    position: jax.Array,
    orientation: jax.Array,
    scale: jax.Array,
    sdf: jax.Array,
) -> jax.Array:
    """Mean absolute pc loss over valid points (jit-friendly dense form).

    Args:
        points: Dense point array ``(M, 3)`` (e.g. lifted full raster).
        point_mask: Validity mask ``(M,)``.
        position / orientation / scale / sdf: As :func:`pc_loss`.
    Returns:
        Scalar mean |SDF| over valid points.
    """
    values = pc_loss(points, position, orientation, scale, sdf, point_mask)
    return masked_mean_abs(values, point_mask)


def depth_l1_loss(
    depth_input: jax.Array, depth_estimate: jax.Array
) -> jax.Array:
    """Masked mean absolute depth error over pixels valid in both images."""
    overlap = (depth_input > 0) & (depth_estimate > 0)
    err = jnp.abs(depth_estimate - depth_input)
    w = overlap.astype(err.dtype)
    return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0)


def point_constraint_loss(
    orientation_q: jax.Array, source: jax.Array, target: jax.Array
) -> jax.Array:
    """Euclidean distance between the rotated source point and the target.

    Args:
        orientation_q: Scalar-last quaternion, shape ``(4,)``.
        source: Point in the object frame, shape ``(3,)``.
        target: Point in the rotated object frame, shape ``(3,)``.
    Returns:
        ``|| R(orientation_q) @ source - target ||_2`` (scalar).
    """
    rotated = quaternion.apply(orientation_q, source)
    return jnp.linalg.norm(rotated - target)


def inlier_ratio(
    depth_input: jax.Array,
    depth_estimate: jax.Array,
    relative_threshold: float = 0.03,
) -> jax.Array:
    """Ratio of valid input pixels whose relative depth error is small."""
    valid = depth_input > 0
    rel_err = jnp.abs(depth_input - depth_estimate) / jnp.where(
        valid, depth_input, 1.0
    )
    inliers = jnp.sum((rel_err < relative_threshold) & valid)
    return inliers / jnp.maximum(jnp.sum(valid), 1)
