"""Renderer/sampler backend dispatch and the differentiable sample op.

Two backends implement identical semantics:

- ``"xla"``: pure-XLA gathers (fast on CPU, correct everywhere — the
  reference implementation and the interpret-mode oracle).
- ``"pallas"``: the Mosaic kernels of :mod:`sdfest_tpu.render.pallas_kernel`
  (the TPU production path; on v5e the XLA gather path is ~2500x slower for
  the forward march).

``resolve_backend("auto")`` picks pallas on TPU, xla elsewhere.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sdfest_tpu.ops import quaternion
from sdfest_tpu.ops.camera import Camera
from sdfest_tpu.ops.interpolation import sample_sdf
from sdfest_tpu.render import xla as xla_backend


_DEFAULT_BACKEND: list = []


def _default_backend() -> str:
    # memoized on success only: a transient accelerator-init failure (the
    # tunneled TPU backend is documented to wedge temporarily) must not pin
    # "xla" for the process lifetime
    if _DEFAULT_BACKEND:
        return _DEFAULT_BACKEND[0]
    try:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    except Exception:
        return "xla"
    _DEFAULT_BACKEND.append(backend)
    return backend


def resolve_backend(backend: str = "auto") -> str:
    """Resolve "auto" to the platform-appropriate backend name."""
    if backend == "auto":
        return _default_backend()
    if backend not in ("xla", "pallas"):
        raise ValueError(f"Unknown renderer backend {backend}")
    return backend


# ---------------------------------------------------------------------------
# differentiable trilinear sampling op (extrapolating semantics + mask)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _sample_op_pallas(sdf, points, mask):
    from sdfest_tpu.render.pallas_kernel import sample_sdf_pallas

    m = mask.astype(jnp.float32)
    # the kernel applies the mask itself (value * m) AND skips fully-masked
    # tiles, so pass it through instead of multiplying afterwards
    return sample_sdf_pallas(sdf, points, m).astype(points.dtype)


def _sample_op_fwd(sdf, points, mask):
    from sdfest_tpu.render.pallas_kernel import sample_sdf_grad_pallas

    m = mask.astype(jnp.float32)
    value, grad = sample_sdf_grad_pallas(sdf, points, m)
    # zero-size sentinel carries the sdf dtype through the residuals
    return value.astype(points.dtype), (
        points, m, grad, sdf.shape[0], jnp.zeros((0,), sdf.dtype)
    )


def _sample_op_bwd(residuals, cot):
    from sdfest_tpu.render.pallas_kernel import scatter_sdf_grad_pallas

    points, m, grad, res, sdf_dtype_sentinel = residuals
    sdf_dtype = sdf_dtype_sentinel.dtype
    cot_masked = cot.astype(jnp.float32) * m
    grad_sdf = scatter_sdf_grad_pallas(points, cot_masked, res=res)
    # the kernel's grad already carries one factor of m; multiplying by
    # cot_masked would square it (wrong for non-binary masks — the xla
    # backend scales point gradients by a single m)
    grad_points = grad * cot.astype(jnp.float32)[:, None]
    # cotangents must match the primal dtypes (callers may run float64)
    return (
        grad_sdf.astype(sdf_dtype),
        grad_points.astype(points.dtype),
        jnp.zeros_like(m),
    )


_sample_op_pallas.defvjp(_sample_op_fwd, _sample_op_bwd)


def sample_sdf_masked_extrapolating(
    sdf: jax.Array,
    points: jax.Array,
    mask: jax.Array,
    backend: str = "auto",
) -> jax.Array:
    """Masked, extrapolating trilinear sampling, differentiable end-to-end.

    Args:
        sdf: (res, res, res) grid.
        points: (N, 3) normalized object-space coordinates.
        mask: (N,) validity; masked rows produce value 0 and no gradients.
        backend: "auto" | "xla" | "pallas".
    Returns:
        (N,) sampled values (0 where masked).
    """
    backend = resolve_backend(backend)
    # the mask selects, it is not differentiated (matching the reference's
    # hard masking semantics); stop_gradient keeps bool-valued mask graphs
    # out of the transpose pass
    mask = jax.lax.stop_gradient(mask).astype(jnp.float32)
    if backend == "pallas":
        return _sample_op_pallas(sdf, points, mask)
    return sample_sdf(sdf, points) * mask.astype(points.dtype)


# ---------------------------------------------------------------------------
# depth rendering with backend dispatch
# ---------------------------------------------------------------------------


def _normalize_roi(roi, roi_offset):
    """Static-int roi tuple + int32 offset array (zeros when unset)."""
    if roi is not None:
        roi = (int(roi[0]), int(roi[1]))
    offset = (
        jnp.zeros((2,), jnp.int32)
        if roi_offset is None
        else jnp.asarray(roi_offset, jnp.int32)
    )
    return roi, offset


def _pallas_capable(sdf, camera, kernel_roi=None) -> bool:
    """Whether the Mosaic kernels support this grid + raster.

    A TILE-aligned ``kernel_roi`` lifts the full-raster alignment
    requirement: the kernel then renders only the ROI crop (its ray
    directions are a dynamic slice of the full camera's planes, which
    exist for any raster size), so e.g. a ``camera.strided(4)`` 160x120
    coarse raster stays on the kernel path as long as the refinement
    window is aligned."""
    from sdfest_tpu.render.pallas_kernel import RES, TILE

    if sdf.shape[-1] != RES:
        return False
    if kernel_roi is not None:
        return True
    return camera.height % TILE == 0 and camera.width % TILE == 0


def _kernel_roi(roi):
    """The ROI the kernel can render directly (TILE-aligned), else None.

    An unaligned ROI does NOT demote the render off the pallas backend —
    the caller renders the full frame with the kernel and crops (correct
    by the pixel-independence of rays; only the crop's raster savings are
    lost, not the ~2500x kernel-vs-XLA march speedup)."""
    from sdfest_tpu.render.pallas_kernel import TILE

    if roi is not None and roi[0] % TILE == 0 and roi[1] % TILE == 0:
        return roi
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _render_pallas(static, sdf, position, orientation, inv_scale,
                   roi_offset):
    from sdfest_tpu.render.pallas_kernel import render_depth_pallas_fwd

    (camera, threshold, max_steps, relaxation, culling, bf16, adaptive,
     roi) = static
    return render_depth_pallas_fwd(
        sdf, position, orientation, inv_scale, camera, threshold, max_steps,
        relaxation, culling, bf16, adaptive=adaptive, roi=roi,
        roi_offset=roi_offset,
    )


def _render_pallas_fwd(static, sdf, position, orientation, inv_scale,
                       roi_offset):
    depth = _render_pallas(static, sdf, position, orientation, inv_scale,
                           roi_offset)
    return depth, (sdf, position, orientation, inv_scale, depth, roi_offset)


def _surrogate_with_op(sdf, position, orientation, inv_scale, depth, dirs):
    """Depth surrogate using the pallas sample op (no XLA gathers).

    Identical math to :func:`sdfest_tpu.render.xla._depth_surrogate`.  The
    per-pixel queries are reordered 16x16-tile-major so each 256-query
    kernel tile covers a spatially coherent pixel block — that keeps the
    sample/scatter kernels on their windowed (4x cheaper) path.
    """
    from sdfest_tpu.render.pallas_kernel import (
        TILE, _tile_image, _untile_image,
    )

    dz = dirs[..., 2]
    t = -depth / dz
    x = t[..., None] * dirs
    o = quaternion.apply(quaternion.invert(orientation), x - position)
    o = o / jnp.sum(orientation * orientation)
    h, w = depth.shape
    obj = o * inv_scale
    if h % TILE == 0 and w % TILE == 0:
        pts = _tile_image(obj, h, w)
        mask = _tile_image((depth > 0)[..., None], h, w).reshape(-1)
        val = _untile_image(
            _sample_op_pallas(sdf, pts, mask), h, w
        ) / inv_scale
    else:
        pts = obj.reshape(-1, 3)
        mask = (depth > 0).reshape(-1)
        val = _sample_op_pallas(sdf, pts, mask).reshape(depth.shape) / inv_scale
    return val * jnp.abs(dz)


def _roi_dirs(camera, dtype, roi, roi_offset):
    """Per-pixel ray directions, optionally a dynamic ROI slice.

    Built from the host-side camera constant (:func:`_camera_ray_planes`),
    not traced jnp ops — recomputing the full-raster direction field every
    backward was the exact camera-constant cost the planes were added to
    eliminate (~0.7 ms/render at 640x480; 1 ulp vs the traced math).
    """
    from sdfest_tpu.render.pallas_kernel import _camera_ray_planes

    dirs = jnp.asarray(_camera_ray_planes(camera)[0], dtype)
    if roi is None:
        return dirs
    zero = jnp.zeros((), roi_offset.dtype)
    return jax.lax.dynamic_slice(
        dirs, (roi_offset[0], roi_offset[1], zero), (roi[0], roi[1], 3)
    )


def _render_pallas_bwd(static, residuals, grad_depth):
    camera, roi = static[0], static[7]
    sdf, position, orientation, inv_scale, depth, roi_offset = residuals
    dirs = _roi_dirs(camera, sdf.dtype, roi, roi_offset)
    _, vjp = jax.vjp(
        lambda s, p, q, i: _surrogate_with_op(s, p, q, i, depth, dirs),
        sdf,
        position,
        orientation,
        inv_scale,
    )
    return vjp(grad_depth) + (jnp.zeros_like(roi_offset),)


_render_pallas.defvjp(_render_pallas_fwd, _render_pallas_bwd)


# ---------------------------------------------------------------------------
# fused render + pc-value op: one backward for the whole refinement loss
# ---------------------------------------------------------------------------


def _pc_object_points(position, orientation, inv_scale, points, point_mask,
                      res):
    """Object-frame pc queries + validity mask (the pc_loss transform).

    Expression-identical to :func:`sdfest_tpu.pipeline.losses.pc_loss` so the
    fused op's pose/scale gradients match the separate path: the quaternion
    is normalized explicitly (normalization gradients included).
    """
    from sdfest_tpu.ops.interpolation import _base_and_frac

    q = orientation / jnp.sqrt(jnp.sum(orientation * orientation))
    obj = quaternion.apply(quaternion.invert(q), points - position)
    obj = obj * inv_scale
    _, _, inside = _base_and_frac(obj, res)
    mask = jnp.logical_and(inside, point_mask != 0)
    return obj, mask


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _render_pc_pallas(static, sdf, position, orientation, inv_scale, points,
                      point_mask, roi_offset):
    from sdfest_tpu.render.pallas_kernel import (
        render_depth_pallas_fwd, sample_sdf_pallas,
    )

    (camera, threshold, max_steps, relaxation, culling, bf16, adaptive,
     roi) = static
    depth = render_depth_pallas_fwd(
        sdf, position, orientation, inv_scale, camera, threshold, max_steps,
        relaxation, culling, bf16, adaptive=adaptive, roi=roi,
        roi_offset=roi_offset,
    )
    obj, mask = _pc_object_points(
        position, orientation, inv_scale, points, point_mask, sdf.shape[0]
    )
    values = sample_sdf_pallas(sdf, obj, mask.astype(jnp.float32))
    return depth, values


def _render_pc_fwd(static, sdf, position, orientation, inv_scale, points,
                   point_mask, roi_offset):
    out = _render_pc_pallas(
        static, sdf, position, orientation, inv_scale, points, point_mask,
        roi_offset,
    )
    depth, _ = out
    return out, (sdf, position, orientation, inv_scale, points, point_mask,
                 depth, roi_offset)


def _render_pc_bwd(static, residuals, cotangents):
    """Joint VJP: ONE sample-grad kernel + ONE scatter for both losses.

    The separate path launches sample_grad + scatter twice (once inside the
    render surrogate VJP, once for the pc custom_vjp) over the SAME sdf; here
    the surrogate queries (raster points at the rendered depth) and the pc
    queries are concatenated into a single query set, so the backward runs
    one sample_grad and one scatter over it.  The whole surrogate is
    computed in 16x16-tile-major space against the trace-time-constant
    tiled direction planes, so only ``depth`` and ``grad_depth`` pay a
    tiling transpose (the raster<->tile copies of the query/value images
    measured ~0.2 ms each in profiler traces); tile order also keeps the
    sample/scatter kernels on their windowed fast path, and the loss
    reductions downstream are order-invariant.
    """
    import numpy as np

    from sdfest_tpu.render.pallas_kernel import _camera_ray_planes, _tile_image

    camera, roi = static[0], static[7]
    (sdf, position, orientation, inv_scale, points, point_mask, depth,
     roi_offset) = residuals
    grad_depth, grad_vals = cotangents
    h, w = depth.shape
    res = sdf.shape[0]
    if roi is None:
        _, dx_np, dy_np, dz_np = _camera_ray_planes(camera)
        dirs_t = jnp.asarray(
            np.concatenate([dx_np, dy_np, dz_np], axis=2).reshape(-1, 3)
        )
    else:
        dirs_t = _tile_image(
            _roi_dirs(camera, jnp.float32, roi, roi_offset), h, w
        ).reshape(-1, 3)
    dz_t = dirs_t[:, 2]
    depth_t = _tile_image(depth[..., None], h, w).reshape(-1)
    grad_depth_t = _tile_image(grad_depth[..., None], h, w).reshape(-1)
    sur_mask = depth_t > 0

    def f(s, p, q, i, pts_in):
        # surrogate depth (identical math to _surrogate_with_op, tile order)
        t = -depth_t / dz_t
        x = t[:, None] * dirs_t
        o = quaternion.apply(quaternion.invert(q), x - p)
        o = o / jnp.sum(q * q)
        sur = o * i
        # pc values (identical math to pc_loss; pts_in is differentiated so
        # callers optimizing over the observed cloud get real gradients,
        # matching the separate render_depth + pc_loss path)
        obj, pc_mask = _pc_object_points(p, q, i, pts_in, point_mask, res)
        pts_all = jnp.concatenate([sur, obj], axis=0)
        mask_all = jnp.concatenate([sur_mask, pc_mask], axis=0)
        vals = _sample_op_pallas(
            s, pts_all, jax.lax.stop_gradient(mask_all).astype(jnp.float32)
        )
        n_sur = h * w
        sur_val = vals[:n_sur] / i * jnp.abs(dz_t)
        return sur_val, vals[n_sur:]

    _, vjp = jax.vjp(f, sdf, position, orientation, inv_scale, points)
    gs, gp, gq, gi, gpts = vjp((grad_depth_t, grad_vals))
    return (gs, gp, gq, gi, gpts,
            jnp.zeros_like(point_mask), jnp.zeros_like(roi_offset))


_render_pc_pallas.defvjp(_render_pc_fwd, _render_pc_bwd)


def render_depth_with_pc_values(
    sdf: jax.Array,
    position: jax.Array,
    orientation: jax.Array,
    scale: jax.Array,
    points: jax.Array,
    point_mask: jax.Array,
    camera: Camera,
    threshold: float = 0.0,
    max_steps: int = 500,
    backend: str = "auto",
    relaxation: float = 1.0,
    culling: bool = True,
    bf16: bool = False,
    adaptive: bool = True,
    roi: Optional[Tuple[int, int]] = None,
    roi_offset: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Render a depth image AND sample the SDF at observed points, fused.

    Returns ``(depth (H, W), pc_values (M,))`` where ``pc_values`` are the
    metric SDF distances of :func:`sdfest_tpu.pipeline.losses.pc_loss`
    (trilinear values at the posed points, x scale, 0 outside the volume or
    mask).  Forward and values match calling :func:`render_depth` +
    ``pc_loss`` separately; the pallas backward is fused (one sample-grad +
    one scatter kernel for both, instead of two of each).  Falls back to the
    separate ops off-TPU or for unsupported shapes.

    ``roi=(Hr, Wr)`` + ``roi_offset`` render only that crop of the frame
    (depth comes back (Hr, Wr)); equal to the same crop of the full-frame
    render by construction (pixel-independent rays), so losses computed on
    matching target crops are exact.  The pc values are unaffected (they
    sample the observed points, not the raster).
    """
    from sdfest_tpu.pipeline import losses

    backend = resolve_backend(backend)
    inv_scale = 1.0 / scale
    roi, roi_offset = _normalize_roi(roi, roi_offset)
    kroi = _kernel_roi(roi)
    if backend == "pallas" and _pallas_capable(sdf, camera, kroi):
        static = (
            camera, float(threshold), int(max_steps), float(relaxation),
            bool(culling), bool(bf16), bool(adaptive), kroi,
        )
        depth, values = _render_pc_pallas(
            static,
            jnp.asarray(sdf),
            jnp.asarray(position),
            jnp.asarray(orientation),
            inv_scale,
            jnp.asarray(points),
            jnp.asarray(point_mask),
            roi_offset,
        )
        if roi is not None and kroi is None:
            # unaligned ROI: the kernel rendered the full frame; crop here
            depth = jax.lax.dynamic_slice(
                depth, (roi_offset[0], roi_offset[1]), roi
            )
        return depth, values * scale
    depth = render_depth(
        sdf, position, orientation, inv_scale, camera=camera,
        threshold=threshold, max_steps=max_steps, backend=backend,
        relaxation=relaxation, culling=culling, bf16=bf16, adaptive=adaptive,
    )
    if roi is not None:
        depth = jax.lax.dynamic_slice(
            depth, (roi_offset[0], roi_offset[1]), roi
        )
    values = losses.pc_loss(
        points, position, orientation, scale, sdf, point_mask,
        backend=backend,
    )
    return depth, values


# ---------------------------------------------------------------------------
# temporal-coherence warm rendering (pallas culling variant only)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _render_pallas_warm(static, sdf, position, orientation, inv_scale,
                        t_init, skip):
    from sdfest_tpu.render.pallas_kernel import render_depth_pallas_fwd

    camera, threshold, max_steps = static
    return render_depth_pallas_fwd(
        sdf, position, orientation, inv_scale, camera, threshold, max_steps,
        t_init=t_init, skip=skip, aux=True,
    )


def _render_pallas_warm_fwd(static, sdf, position, orientation, inv_scale,
                            t_init, skip):
    depth, aux = _render_pallas_warm(
        static, sdf, position, orientation, inv_scale, t_init, skip
    )
    return (depth, aux), (sdf, position, orientation, inv_scale, depth,
                          t_init, skip)


def _render_pallas_warm_bwd(static, residuals, cotangents):
    camera = static[0]
    sdf, position, orientation, inv_scale, depth, t_init, skip = residuals
    grad_depth, _ = cotangents  # corridor aux is non-differentiable
    dirs = _roi_dirs(camera, sdf.dtype, None, None)
    _, vjp = jax.vjp(
        lambda s, p, q, i: _surrogate_with_op(s, p, q, i, depth, dirs),
        sdf,
        position,
        orientation,
        inv_scale,
    )
    return vjp(grad_depth) + (jnp.zeros_like(t_init), jnp.zeros_like(skip))


_render_pallas_warm.defvjp(_render_pallas_warm_fwd, _render_pallas_warm_bwd)


def render_depth_warm(
    sdf: jax.Array,
    position: jax.Array,
    orientation: jax.Array,
    inv_scale: jax.Array,
    t_init: jax.Array,
    skip: jax.Array,
    camera: Camera,
    threshold: float = 0.0,
    max_steps: int = 500,
):
    """Depth render with temporal-coherence warm state; pallas-only.

    Same semantics and analytic VJP as :func:`render_depth` on the pallas
    backend (plain tracing + culling), plus per-ray warm-start/skip inputs
    and corridor aux outputs (see
    :func:`sdfest_tpu.render.pallas_kernel.render_depth_pallas_fwd`).

    Returns:
        (depth (H, W), aux dict).  The aux entries carry no gradients.
    """
    static = (camera, float(threshold), int(max_steps))
    depth, aux = _render_pallas_warm(
        static,
        jnp.asarray(sdf),
        jnp.asarray(position),
        jnp.asarray(orientation),
        jnp.asarray(inv_scale),
        jnp.asarray(t_init),
        jnp.asarray(skip),
    )
    return depth, jax.tree_util.tree_map(jax.lax.stop_gradient, aux)


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
    backend: str = "auto",
    relaxation: float = 1.0,
    culling: bool = True,
    bf16: bool = False,
    adaptive: bool = True,
    roi: Optional[Tuple[int, int]] = None,
    roi_offset: Optional[jax.Array] = None,
) -> jax.Array:
    """Render a depth image of a posed, scaled, voxelized SDF.

    Differentiable w.r.t. sdf, position, orientation and inv_scale via the
    analytic VJP.  See :func:`sdfest_tpu.render.xla.render_depth` for
    conventions; ``backend`` selects the execution strategy.  ``relaxation``
    > 1 enables relaxed sphere tracing on the pallas backend (over-stepping
    with conservative fallback; faster, depth within ~threshold*t of plain
    marching).  ``culling`` enables hierarchical empty-space culling on the
    pallas backend (conservative coarse-grid bound steps in empty space;
    never skips a surface the plain march would hit).  ``adaptive`` enables
    per-ray auto-over-relaxation inside the culling march (graze-band rays
    overstep up to ~1.9x with a certified revert fallback; same stepping-
    noise class as culling).  ``roi=(Hr, Wr)`` + ``roi_offset`` render only
    that crop of the frame (exactly the crop of a full render; on the xla
    backend it IS a crop of the full render).
    """
    backend = resolve_backend(backend)
    if camera is None:
        if None in (width, height, fov_deg):
            raise ValueError("Either camera or width+height+fov_deg required.")
        camera = Camera.from_fov(width, height, fov_deg)
    elif None not in (width, height, fov_deg):
        raise ValueError("Either camera or width+height+fov_deg must be given.")
    roi, roi_offset = _normalize_roi(roi, roi_offset)
    kroi = _kernel_roi(roi)
    if backend == "pallas" and not _pallas_capable(sdf, camera, kroi):
        backend = "xla"  # kernel constraints unmet; use the generic path
    if backend == "pallas":
        static = (
            camera, float(threshold), int(max_steps), float(relaxation),
            bool(culling), bool(bf16), bool(adaptive), kroi,
        )
        depth = _render_pallas(
            static,
            jnp.asarray(sdf),
            jnp.asarray(position),
            jnp.asarray(orientation),
            jnp.asarray(inv_scale),
            roi_offset,
        )
        if roi is not None and kroi is None:
            # unaligned ROI: the kernel rendered the full frame; crop here
            depth = jax.lax.dynamic_slice(
                depth, (roi_offset[0], roi_offset[1]), roi
            )
        return depth
    depth = xla_backend.render_depth(
        sdf,
        position,
        orientation,
        inv_scale,
        camera=camera,
        threshold=threshold,
        max_steps=max_steps,
    )
    if roi is not None:
        depth = jax.lax.dynamic_slice(
            depth, (roi_offset[0], roi_offset[1]), roi
        )
    return depth
