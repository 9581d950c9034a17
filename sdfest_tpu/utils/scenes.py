"""Analytic test scenes (voxelized SDFs) for benchmarks and sweeps.

The mug scene is the benchmark headline (BASELINE.md): a thin-walled open
vessel with a handle produces the silhouette-graze marching regime that
dominates real refinement cost — rays passing within ~2*threshold*t of the
surface march many fine steps and defeat empty-space culling.  The sphere is
the easy secondary scene (convex, no graze band beyond the silhouette ring).
"""
from __future__ import annotations

import numpy as np


def make_sphere_sdf(res: int = 64, radius: float = 0.5) -> np.ndarray:
    """Exact sphere SDF on a [-1, 1]^3 grid."""
    c = np.linspace(-1.0, 1.0, res)
    x, y, z = np.meshgrid(c, c, c, indexing="ij")
    return (np.sqrt(x * x + y * y + z * z) - radius).astype(np.float32)


def make_mug_sdf(res: int = 64) -> np.ndarray:
    """Mug-class SDF: hollow cylinder body + torus handle on a [-1, 1]^3 grid.

    Built from standard CSG distance bounds (union = min, subtraction =
    max(a, -b)); the result is a conservative lower bound on distance except
    on the subtraction seam, which a 64^3 voxelization smooths below the
    march threshold.  Thin rim + interior wall produce a heavy graze band.
    """
    c = np.linspace(-1.0, 1.0, res)
    x, y, z = np.meshgrid(c, c, c, indexing="ij")

    def capped_cylinder(px, py, pz, radius, half_h):
        # exact SDF of a z-capped cylinder aligned with y
        d_r = np.sqrt(px * px + pz * pz) - radius
        d_y = np.abs(py) - half_h
        outside = np.sqrt(np.maximum(d_r, 0.0) ** 2 + np.maximum(d_y, 0.0) ** 2)
        inside = np.minimum(np.maximum(d_r, d_y), 0.0)
        return outside + inside

    body = capped_cylinder(x, y, z, 0.52, 0.55)
    cavity = capped_cylinder(x, y - 0.08, z, 0.44, 0.55)
    vessel = np.maximum(body, -cavity)

    # torus handle in the x-y plane, attached at x ~ 0.52
    tx, ty = x - 0.62, y - 0.05
    ring = np.sqrt(tx * tx + ty * ty) - 0.28
    handle = np.sqrt(ring * ring + z * z) - 0.07

    return np.minimum(vessel, handle).astype(np.float32)
