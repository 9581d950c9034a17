"""Point-set utilities: depth lifting, normalization, convention changes.

Capability parity with /root/reference/sdfest/initialization/pointset_utils.py,
re-designed for XLA: TPU programs need static shapes, so the jit-compatible
depth lifting returns a dense ``(H*W, 3)`` point array plus a validity mask
instead of a variable-length point list.  Masked reductions (centroid,
subsampling) operate on (points, mask) pairs.  A host-side variable-length
variant is provided for dataset preprocessing code paths.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdfest_tpu.ops import quaternion
from sdfest_tpu.ops.camera import Camera


def normalize_points(points: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Normalize point sets to zero mean along the second-to-last axis.

    Args:
        points: Shape ``(..., M, D)``.
    Returns:
        Tuple of normalized points (same shape) and centroids ``(..., D)``.
    """
    centroids = jnp.mean(points, axis=-2, keepdims=True)
    return points - centroids, jnp.squeeze(centroids, axis=-2)


def normalize_points_masked(
    points: jax.Array, mask: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Zero-mean normalize using only points where ``mask`` is nonzero.

    Masked-out rows are moved with the same centroid (callers should continue
    to carry the mask).

    Args:
        points: Shape ``(..., M, D)``.
        mask: Shape ``(..., M)``; nonzero marks valid points.
    Returns:
        Tuple of normalized points and centroids ``(..., D)``.
    """
    w = mask.astype(points.dtype)[..., None]
    denom = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1.0)
    centroids = jnp.sum(points * w, axis=-2, keepdims=True) / denom
    return points - centroids, jnp.squeeze(centroids, axis=-2)


def depth_to_pointcloud_dense(
    depth_image: jax.Array,
    camera: Camera,
    convention: str = "opengl",
    mask: Optional[jax.Array] = None,
    order: str = "raster",
    pixel_offset: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Lift a depth image to a dense point array with validity mask (jittable).

    Args:
        depth_image: Depth image, shape ``(H, W)``; zero marks missing depth.
        camera: The camera used to lift the points.
        convention: ``"opengl"`` (x right, y up, z back) or ``"opencv"``
            (x right, y down, z forward).
        mask: Optional extra mask; points where ``mask == 0`` are invalidated.
        order: ``"raster"`` (row-major) or ``"tile"`` (16x16-pixel tile-major
            when dims allow; a pure permutation of the rows).  Tile order
            keeps each 256-point block of the array spatially coherent so
            the Pallas sampling kernels stay on their windowed fast path —
            use it for point sets consumed by order-invariant reductions
            (e.g. the pc loss).
        pixel_offset: Optional (2,) [row, col] (may be traced): the image is
            an ROI crop starting at this pixel of ``camera``'s full frame,
            so global pixel coordinates are local + offset.  Lifting an ROI
            crop yields exactly the corresponding rows of the full lift.
    Returns:
        Tuple of points ``(H*W, 3)`` and boolean validity mask ``(H*W,)``.
        Invalid rows contain the lifted coordinates of zero depth (all-zero).
    """
    fx, fy, cx, cy, _ = camera.get_pinhole_camera_parameters(0.0)
    h, w = depth_image.shape
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    if pixel_offset is not None:
        rows = rows + pixel_offset[0].astype(jnp.float32)
        cols = cols + pixel_offset[1].astype(jnp.float32)
    z = depth_image.astype(jnp.float32)
    if convention == "opengl":
        x = (cols - cx) * z / fx
        y = -(rows - cy) * z / fy
        z_out = -z
    elif convention == "opencv":
        x = (cols - cx) * z / fx
        y = (rows - cy) * z / fy
        z_out = z
    else:
        raise ValueError(f"Unsupported camera convention {convention}.")
    valid = depth_image != 0
    if mask is not None:
        valid = jnp.logical_and(valid, mask != 0)
    points = jnp.stack([x, y, z_out], axis=-1)
    if order == "tile":
        from sdfest_tpu.render.pallas_kernel import TILE, _tile_image

        if h % TILE == 0 and w % TILE == 0:
            return (
                _tile_image(points, h, w),
                _tile_image(valid[..., None], h, w).reshape(h * w),
            )
    elif order != "raster":
        raise ValueError(f"Unsupported point order {order}.")
    return points.reshape(h * w, 3), valid.reshape(h * w)


def depth_to_pointcloud(
    depth_image: np.ndarray,
    camera: Camera,
    normalize: bool = False,
    mask: Optional[np.ndarray] = None,
    convention: str = "opengl",
) -> np.ndarray:
    """Host-side variable-length depth lifting (reference-compatible).

    Same semantics as the dense variant but returns only the valid points,
    shape ``(N, 3)``.  Not jittable; intended for dataset preprocessing.
    """
    depth_image = np.asarray(depth_image)
    fx, fy, cx, cy, _ = camera.get_pinhole_camera_parameters(0.0)
    masked = depth_image if mask is None else depth_image * np.asarray(mask)
    rows, cols = np.nonzero(masked)
    z = depth_image[rows, cols].astype(np.float32)
    if convention == "opengl":
        points = np.stack(
            [(cols - cx) * z / fx, -(rows - cy) * z / fy, -z], axis=-1
        )
    elif convention == "opencv":
        points = np.stack(
            [(cols - cx) * z / fx, (rows - cy) * z / fy, z], axis=-1
        )
    else:
        raise ValueError(f"Unsupported camera convention {convention}.")
    if normalize:
        points = points - points.mean(axis=0, keepdims=True)
    return points


def subsample_masked(
    points: jax.Array,
    mask: jax.Array,
    num_points: int,
    key: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Randomly pick ``num_points`` valid points (with replacement if needed).

    Jit-friendly fixed-output-size sampling: invalid rows are never selected
    as long as at least one valid point exists.  Uniform over the valid
    points via inverse-CDF (cumsum of the mask + searchsorted): independent
    draws, i.e. with replacement — at the reference's typical ratios
    (~1k of ~10-30k valid pixels) duplicates are rare, approximating the
    reference's without-replacement ``random.sample``
    (dataset_utils.py:47).

    Implementation note (v5e): ``jax.random.categorical`` over the raster
    materializes a (num_points, M) Gumbel field — 44 ms at M=307k/K=1000;
    Gumbel/uniform-score ``top_k`` runs fast (~2-5 ms) but its sort
    expansion takes MINUTES to compile under vmap+grad.  Inverse-CDF costs
    one cumsum + a vectorized binary search and compiles quickly.

    Args:
        points: Shape ``(M, 3)``.
        mask: Shape ``(M,)`` validity mask.
        num_points: Number of output points.
        key: PRNG key.
    Returns:
        Tuple of sampled points ``(num_points, 3)`` and a boolean scalar
        indicating whether any valid point existed.
    """
    m = points.shape[0]
    cnt = jnp.cumsum(mask.astype(jnp.int32))
    n_valid = cnt[-1]
    any_valid = n_valid > 0
    u = jax.random.uniform(key, (num_points,))
    # target rank in [1, n_valid]; first index whose inclusive count
    # reaches the rank is a valid row
    ranks = jnp.floor(u * n_valid).astype(jnp.int32) + 1
    idx = jnp.clip(jnp.searchsorted(cnt, ranks, side="left"), 0, m - 1)
    return points[idx], any_valid


def change_transform_camera_convention(
    in_transform: jax.Array, in_convention: str, out_convention: str
) -> jax.Array:
    """Change camera convention of a frame-A -> camera ``(...,4,4)`` transform."""
    _check_conventions(in_convention, out_convention)
    if in_convention == out_convention:
        return in_transform
    gl2cv = jnp.diag(jnp.asarray([1.0, -1.0, -1.0, 1.0], dtype=in_transform.dtype))
    return gl2cv @ in_transform


def change_position_camera_convention(
    in_position: jax.Array, in_convention: str, out_convention: str
) -> jax.Array:
    """Change camera convention of positions, shape ``(..., 3)``."""
    _check_conventions(in_convention, out_convention)
    if in_convention == out_convention:
        return in_position
    return in_position * jnp.asarray([1.0, -1.0, -1.0], dtype=in_position.dtype)


def change_orientation_camera_convention(
    in_orientation_q: jax.Array, in_convention: str, out_convention: str
) -> jax.Array:
    """Change camera convention of orientations (quaternions ``(..., 4)``)."""
    _check_conventions(in_convention, out_convention)
    if in_convention == out_convention:
        return in_orientation_q
    gl2cv_q = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=in_orientation_q.dtype)
    return quaternion.multiply(gl2cv_q, in_orientation_q)


def _check_conventions(*conventions: str) -> None:
    for convention in conventions:
        if convention not in ("opengl", "opencv"):
            raise ValueError(f"Camera convention {convention} not supported.")
