"""Temporal-coherence warm rendering for iterative refinement.

During render-and-compare refinement the scene changes only slightly
between iterations (one optimizer step).  This module implements
conservative reuse of the previous march, shared by
:class:`sdfest_tpu.pipeline.pipeline.SDFPipeline` and ``bench.py``:

- previously-hit rays warm-start at ``t_prev - 1.5 * motion`` where
  ``motion`` (:func:`motion_bound`) conservatively bounds how far any
  surface point can have moved;
- previously-missed rays are skipped entirely while the accumulated motion
  stays below their *corridor clearance* — the 1-Lipschitz lower bound on
  the field along their last full march (minimum inter-sample dip, plus
  entry/tail clearances against OBB interval growth) — so the field
  cannot have reached the hit threshold anywhere along the ray;
- everything else re-marches from the OBB entry, refreshing its corridor.

A lateral surface sweep in front of a warm-started hit is not covered by
the bound; its staleness is capped by a periodic full refresh (pass
``full_refresh=True`` every ``temporal_refresh_interval`` iterations).
The residual error is of the same stepping-noise class as relaxed
tracing (see NOTES.md).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from sdfest_tpu.ops.camera import Camera

WARM_VIEW_KEYS = ("t", "hit", "t0", "v0", "min_dip", "v_last", "t_last",
                  "macc")


def init_warm_views(n_views: int, height: int, width: int) -> Dict[str, jax.Array]:
    """Zero-initialized per-view warm state (forces a full first march)."""
    return {
        k: jnp.zeros((n_views, height, width), jnp.float32)
        for k in WARM_VIEW_KEYS
    }


def motion_bound(
    position: jax.Array,
    orientation: jax.Array,  # normalized quaternion
    scale: jax.Array,
    sdf: jax.Array,
    prev: Dict[str, jax.Array],
) -> jax.Array:
    """Conservative bound on surface displacement between two iterations.

    Any point of the posed surface ``x = p + s R(q) u`` (``|u| <= sqrt(3)``)
    moves by at most ``|dp| + 2 sqrt(3)|ds| + 2 sqrt(3) s |dq|``; a change
    of the (assumed 1-Lipschitz) field itself displaces the zero set by at
    most ``s max|dSDF|``.
    """
    sg = jax.lax.stop_gradient
    position, orientation, scale, sdf = map(
        sg, (position, orientation, scale, sdf)
    )
    dp = jnp.linalg.norm(position - prev["position"])
    # quaternion double cover: q and -q are the same rotation
    dq = jnp.minimum(
        jnp.linalg.norm(orientation - prev["orientation"]),
        jnp.linalg.norm(orientation + prev["orientation"]),
    )
    ds = jnp.abs(scale - prev["scale"])
    dsdf = jnp.max(jnp.abs(sdf - prev["sdf"]))
    s_max = jnp.maximum(scale, prev["scale"])
    sqrt3 = jnp.sqrt(3.0)
    return dp + 2.0 * sqrt3 * ds + 2.0 * sqrt3 * s_max * dq + s_max * dsdf


def warm_render_step(
    sdf: jax.Array,
    position: jax.Array,
    orientation: jax.Array,
    scale: jax.Array,
    view_warm: Dict[str, jax.Array],
    motion: jax.Array,
    full_refresh: jax.Array,
    camera: Camera,
    threshold: float,
    max_steps: int = 500,
):
    """One temporally-coherent render; returns (depth, updated warm state).

    ``view_warm`` follows :func:`init_warm_views` (without the leading view
    axis); ``motion`` is this iteration's :func:`motion_bound`.  Pose is in
    the camera frame; differentiable w.r.t. sdf/pose via the analytic VJP.
    """
    from sdfest_tpu.render.api import render_depth_warm
    from sdfest_tpu.render.xla import _obb_intersect, pixel_directions

    w = view_warm
    dirs = pixel_directions(camera, jnp.float32)
    _, t_min_new, t_max_new = _obb_intersect(
        dirs, position, orientation, scale
    )
    macc_new = w["macc"] + motion
    clearance = jnp.minimum(
        w["min_dip"],
        jnp.minimum(
            w["v0"] - jnp.maximum(w["t0"] - t_min_new, 0.0),
            w["v_last"] - jnp.maximum(t_max_new - w["t_last"], 0.0),
        ),
    )
    can_skip = (
        (w["hit"] == 0.0)
        & (w["v0"] > 0.0)
        & jnp.logical_not(full_refresh)
        & (macc_new + threshold * t_max_new + 1e-4 < clearance)
    )
    warm_start = (w["hit"] > 0.0) & jnp.logical_not(full_refresh)
    t_init = jnp.where(
        warm_start, jnp.maximum(w["t"] - 1.5 * motion - 1e-4, 0.0), -1.0
    )
    skip = can_skip.astype(jnp.float32)
    depth, aux = render_depth_warm(
        sdf,
        position,
        orientation,
        1.0 / scale,
        t_init,
        skip,
        camera=camera,
        threshold=threshold,
        max_steps=max_steps,
    )
    marched = skip <= 0.0
    new_warm = {
        "t": jnp.where(marched, aux["t"], w["t"]),
        "hit": jnp.where(marched, (depth > 0).astype(jnp.float32), w["hit"]),
        "t0": jnp.where(marched, aux["t0"], w["t0"]),
        "v0": jnp.where(marched, aux["v0"], w["v0"]),
        "min_dip": jnp.where(marched, aux["min_dip"], w["min_dip"]),
        "v_last": jnp.where(marched, aux["v_last"], w["v_last"]),
        "t_last": jnp.where(marched, aux["t_last"], w["t_last"]),
        "macc": jnp.where(marched, 0.0, macc_new),
    }
    return depth, new_warm
