"""Trilinear interpolation on voxel grids, pure JAX.

The single most important memory-access primitive of the framework: both the
sphere-tracing renderer and the point-cloud SDF loss evaluate a voxelized SDF
at continuous 3D positions via trilinear interpolation.  Conventions follow
the reference exactly (/root/reference/sdfest/differentiable_renderer/
simple_renderer.py:158-219 and /root/reference/sdfest/estimation/losses.py:
85-135):

- The SDF volume spans ``[-1, 1]^3`` in normalized object space; the volume
  is indexed ``sdf[x, y, z]``.
- Base cell index per axis: ``floor((p + 1) * (res - 1) / 2)``, clamped to
  ``[0, res - 2]``.
- The renderer variant extrapolates outside the volume (offsets computed
  against the clamped cell); the loss variant masks values outside to zero.

Gathers are expressed as flat ``jnp.take`` on the ravelled grid so XLA can
lower them to a single fused gather on TPU.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _base_and_frac(
    points: jax.Array, res: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Compute clamped base cell indices, cell-local fractions, inside-mask.

    Args:
        points: Normalized object-space points, shape ``(..., 3)``.
        res: Grid resolution per axis.
    Returns:
        base: int32 base cell index per axis, shape ``(..., 3)``, in
            ``[0, res-2]``.
        frac: Fractional position within the (clamped) base cell,
            shape ``(..., 3)``.  May lie outside ``[0, 1]`` for points
            outside the volume (extrapolation).
        inside: Boolean mask, true when the unclamped cell was valid,
            shape ``(...,)``.
    """
    grid_size = 2.0 / (res - 1)
    c_unclamped = jnp.floor((points + 1.0) * (res - 1) * 0.5)
    inside = jnp.logical_and(
        jnp.min(c_unclamped, axis=-1) >= 0,
        jnp.max(c_unclamped, axis=-1) <= res - 2,
    )
    base = jnp.clip(c_unclamped, 0, res - 2)
    cell_origin = base * grid_size - 1.0
    frac = (points - cell_origin) / grid_size
    return base.astype(jnp.int32), frac, inside


def _gather_corners(sdf: jax.Array, base: jax.Array) -> jax.Array:
    """Gather the 8 corner values of each base cell.

    Args:
        sdf: Voxel grid, shape ``(res, res, res)``.
        base: int32 base indices, shape ``(..., 3)``.
    Returns:
        Corner values, shape ``(..., 2, 2, 2)`` indexed ``[dx, dy, dz]``.
    """
    res = sdf.shape[-1]
    flat = sdf.reshape(-1)
    i, j, k = base[..., 0], base[..., 1], base[..., 2]
    flat_base = (i * res + j) * res + k
    # offsets for corner (dx, dy, dz): dx*res^2 + dy*res + dz
    offsets = jnp.asarray(
        [
            [[0, 1], [res, res + 1]],
            [[res * res, res * res + 1], [res * res + res, res * res + res + 1]],
        ],
        dtype=jnp.int32,
    )  # shape (2, 2, 2) indexed [dx][dy][dz]
    idx = flat_base[..., None, None, None] + offsets
    return jnp.take(flat, idx, axis=0)


def _lerp_corners(corners: jax.Array, frac: jax.Array) -> jax.Array:
    """Trilinearly combine corner values with per-axis fractions.

    Args:
        corners: Shape ``(..., 2, 2, 2)`` indexed ``[dx, dy, dz]``.
        frac: Shape ``(..., 3)``.
    Returns:
        Interpolated values, shape ``(...,)``.
    """
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    c0 = corners[..., 0, :, :] * (1 - fx)[..., None, None] + corners[
        ..., 1, :, :
    ] * fx[..., None, None]
    c00 = c0[..., 0, :] * (1 - fy)[..., None] + c0[..., 1, :] * fy[..., None]
    return c00[..., 0] * (1 - fz) + c00[..., 1] * fz


def sample_sdf(sdf: jax.Array, points: jax.Array) -> jax.Array:
    """Trilinearly sample an SDF grid, extrapolating outside the volume.

    This is the renderer-side variant: for points outside ``[-1, 1]^3`` the
    base cell is clamped and the interpolation weights extrapolate, matching
    the reference CUDA kernel.

    Args:
        sdf: Voxel grid, shape ``(res, res, res)``.
        points: Normalized object-space query points, shape ``(..., 3)``.
    Returns:
        Interpolated SDF values, shape ``(...,)``.
    """
    base, frac, _ = _base_and_frac(points, sdf.shape[-1])
    return _lerp_corners(_gather_corners(sdf, base), frac)


def sample_sdf_masked(
    sdf: jax.Array, points: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Trilinearly sample an SDF grid, returning zero outside the volume.

    This is the loss-side variant (pc loss): points whose unclamped base cell
    falls outside ``[0, res-2]`` produce value 0 and ``inside=False``.

    Args:
        sdf: Voxel grid, shape ``(res, res, res)``.
        points: Normalized object-space query points, shape ``(..., 3)``.
    Returns:
        Tuple of interpolated values (0 outside) and the inside mask.
    """
    base, frac, inside = _base_and_frac(points, sdf.shape[-1])
    values = _lerp_corners(_gather_corners(sdf, base), frac)
    return jnp.where(inside, values, 0.0), inside


def resize_trilinear(volume: jax.Array, out_size: int) -> jax.Array:
    """Resize the last three axes of a volume with trilinear interpolation.

    Half-pixel-center sampling (equivalent to ``align_corners=False``),
    matching the reference decoder's upsampling
    (/root/reference/sdfest/vae/sdf_vae.py:238-243).

    Args:
        volume: Shape ``(..., D, D, D)``.
        out_size: Target size for each of the last three axes.
    Returns:
        Resized volume, shape ``(..., out_size, out_size, out_size)``.
    """
    out_shape = volume.shape[:-3] + (out_size, out_size, out_size)
    return jax.image.resize(volume, out_shape, method="trilinear")
