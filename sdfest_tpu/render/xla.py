"""Differentiable sphere-tracing depth renderer, pure XLA with analytic VJP.

TPU-native re-design of the reference CUDA renderer
(/root/reference/sdfest/differentiable_renderer/csrc/sdf_renderer_cuda.cu):
instead of one CUDA thread per pixel with divergent trip counts, the whole
pixel raster marches in lock-step as one ``lax.while_loop`` whose carry holds
per-pixel state; the loop exits when every ray has terminated.  The camera is
a compile-time constant, so the raster shape and ray directions fold into the
program.

The backward pass re-derives the reference's hand-written analytic gradients
(sdf_renderer_cuda.cu:300-468) from first principles: at the terminating
point ``x`` of each ray, the depth responds to parameter perturbations as

    depth(params) ~ depth + scale * SDF(R(q/|q|)^T (x - p) * inv_scale) * |d_z|

so the exact VJP of that closed-form local surrogate (including the product
rule through ``scale = 1 / inv_scale`` and the projective normalization of
the quaternion) *is* the reference's analytic gradient.  We obtain it with
``jax.vjp`` of the surrogate, which turns the 8-voxel scatter-add of the
CUDA ``atomicAdd`` loop into a deterministic XLA scatter.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sdfest_tpu.ops import quaternion
from sdfest_tpu.ops.camera import Camera
from sdfest_tpu.ops.interpolation import sample_sdf

Static = Tuple[Camera, float, int]


def pixel_directions(camera: Camera, dtype=jnp.float32) -> jax.Array:
    """Normalized per-pixel ray directions, shape (H, W, 3), OpenGL frame."""
    fx, fy, cx, cy, _ = camera.get_pinhole_camera_parameters(0.5)
    rows = jax.lax.broadcasted_iota(dtype, (camera.height, camera.width), 0)
    cols = jax.lax.broadcasted_iota(dtype, (camera.height, camera.width), 1)
    dx = (cols + 0.5 - cx) / fx
    dy = -(rows + 0.5 - cy) / fy
    dz = -jnp.ones_like(dx)
    d = jnp.stack([dx, dy, dz], axis=-1)
    return d * jax.lax.rsqrt(dx * dx + dy * dy + 1.0)[..., None]


def _obb_intersect(
    dirs: jax.Array, position: jax.Array, quat: jax.Array, scale: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Slab test of all rays (origin 0) against the scaled oriented box.

    ``dirs`` may have any leading shape ``(..., 3)``; returns
    (hit, t_min, t_max) with shape ``(...)``.
    """
    rot = quaternion.to_rotation_matrix(quat)  # columns are the box axes
    axes = rot.T  # (3, 3): axes[i] = rotated e_i
    e = axes @ position  # (3,)
    f = dirs @ axes.T  # (..., 3): per-axis direction components
    parallel = jnp.abs(f) <= 1e-20
    safe_f = jnp.where(parallel, 1.0, f)
    t_1 = (e + scale) / safe_f
    t_2 = (e - scale) / safe_f
    lo = jnp.where(parallel, -jnp.inf, jnp.minimum(t_1, t_2))
    hi = jnp.where(parallel, jnp.inf, jnp.maximum(t_1, t_2))
    t_min = jnp.maximum(jnp.max(lo, axis=-1), -1e-10)
    t_max = jnp.min(hi, axis=-1)
    miss_parallel = jnp.any(parallel & (jnp.abs(e) > scale), axis=-1)
    hit = (~miss_parallel) & (t_min <= t_max) & (t_max >= 0)
    return hit, jnp.maximum(t_min, 0.0), t_max


def _render_forward(
    static: Static,
    sdf: jax.Array,
    position: jax.Array,
    orientation: jax.Array,
    inv_scale: jax.Array,
) -> jax.Array:
    camera, threshold, max_steps = static
    dtype = sdf.dtype
    dirs = pixel_directions(camera, dtype)
    scale = 1.0 / inv_scale
    hit, t_min, t_max = _obb_intersect(dirs, position, orientation, scale)

    rot = quaternion.to_rotation_matrix(orientation)
    origin_o = rot.T @ (-position)
    dirs_o = dirs @ rot  # R^T d per pixel
    dz = dirs[..., 2]

    def cond(carry):
        _, _, active, step = carry
        return jnp.logical_and(jnp.any(active), step < max_steps)

    def body(carry):
        t, depth, active, step = carry
        pts = origin_o + t[..., None] * dirs_o
        dist = sample_sdf(sdf, pts * inv_scale) * scale
        terminated = active & (dist < threshold * t)
        depth = jnp.where(terminated, -t * dz, depth)
        active = active & ~terminated
        t = jnp.where(active, t + dist, t)
        active = active & (t < t_max)
        return t, depth, active, step + 1

    t0 = t_min
    depth0 = jnp.zeros_like(t0)
    active0 = hit & (t0 < t_max)
    _, depth, _, _ = jax.lax.while_loop(cond, body, (t0, depth0, active0, 0))
    return depth


def _depth_surrogate(
    sdf: jax.Array,
    position: jax.Array,
    orientation: jax.Array,
    inv_scale: jax.Array,
    depth: jax.Array,
    dirs: jax.Array,
) -> jax.Array:
    """Local first-order model of depth around the terminating points.

    ``depth`` and ``dirs`` are treated as constants; the value at hit pixels
    is ``scale * SDF((q^-1 (x - p) q)/|q|^2 * inv_scale) * |d_z|`` with
    ``x = t * d`` the terminating world point.  Its exact gradients w.r.t.
    (sdf, position, orientation, inv_scale) reproduce the reference's
    analytic backward kernel, including the quaternion projective
    normalization and the scale product rule.
    """
    dz = dirs[..., 2]
    t = -depth / dz  # positive where depth > 0
    x = t[..., None] * dirs
    o = quaternion.apply(quaternion.invert(orientation), x - position)
    o = o / jnp.sum(orientation * orientation)
    val = sample_sdf(sdf, o * inv_scale) / inv_scale
    return jnp.where(depth > 0, val * jnp.abs(dz), 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _render(static, sdf, position, orientation, inv_scale):
    return _render_forward(static, sdf, position, orientation, inv_scale)


def _render_fwd(static, sdf, position, orientation, inv_scale):
    depth = _render_forward(static, sdf, position, orientation, inv_scale)
    return depth, (sdf, position, orientation, inv_scale, depth)


def _render_bwd(static, residuals, grad_depth):
    camera, _, _ = static
    sdf, position, orientation, inv_scale, depth = residuals
    dirs = pixel_directions(camera, sdf.dtype)
    _, vjp = jax.vjp(
        lambda s, p, q, i: _depth_surrogate(s, p, q, i, depth, dirs),
        sdf,
        position,
        orientation,
        inv_scale,
    )
    return vjp(grad_depth)


_render.defvjp(_render_fwd, _render_bwd)


def render_depth(
    sdf: jax.Array,
    position: jax.Array,
    orientation: jax.Array,
    inv_scale: jax.Array,
    camera: Optional[Camera] = None,
    width: Optional[int] = None,
    height: Optional[int] = None,
    fov_deg: Optional[float] = None,
    threshold: float = 0.0,
    max_steps: int = 500,
) -> jax.Array:
    """Render a depth image of a posed, scaled, voxelized SDF (XLA backend).

    The SDF pose is given in the camera frame under the OpenGL convention
    (camera looks down -z, y up); the rendered raster follows the computer
    vision convention (first row is up).  Differentiable w.r.t. ``sdf``,
    ``position``, ``orientation`` and ``inv_scale`` via the analytic VJP.

    Args:
        sdf: Voxel grid spanning [-1, 1]^3, shape (res, res, res).
        position: SDF origin in the camera frame, shape (3,).
        orientation: Scalar-last unit quaternion, shape (4,).
        inv_scale: Inverse of the SDF half-width (scalar).
        camera: Pinhole camera; alternatively give width+height+fov_deg.
        threshold: Relative termination threshold (``dist < threshold * t``).
        max_steps: Static safety cap on marching iterations.
    Returns:
        Depth image (H, W), positive at hits, 0 at misses.
    """
    if camera is None:
        if None in (width, height, fov_deg):
            raise ValueError("Either camera or width+height+fov_deg required.")
        camera = Camera.from_fov(width, height, fov_deg)
    elif None not in (width, height, fov_deg):
        raise ValueError("Either camera or width+height+fov_deg must be given.")
    static = (camera, float(threshold), int(max_steps))
    return _render(
        static,
        jnp.asarray(sdf),
        jnp.asarray(position),
        jnp.asarray(orientation),
        jnp.asarray(inv_scale),
    )
