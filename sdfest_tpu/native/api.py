"""Numpy wrappers around the native geometry kernels."""
from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

from sdfest_tpu import native


def available() -> bool:
    """Whether the native library compiled and loaded."""
    return native._load() is not None


def voxelize_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    res: int = 64,
    band_cells: int = 3,
) -> np.ndarray:
    """Voxelize a triangle mesh (already in [-1, 1]^3) into an SDF grid.

    Args:
        vertices: (V, 3) float vertex positions within [-1, 1]^3.
        faces: (F, 3) int vertex indices.
        res: Output resolution per axis.
        band_cells: Half-width of the exact-distance band in cells.
    Returns:
        (res, res, res) float32 signed distance grid (negative inside).
    """
    lib = native._load()
    if lib is None:
        raise RuntimeError("native library unavailable (g++ build failed)")
    v = np.ascontiguousarray(vertices, dtype=np.float64)
    f = np.ascontiguousarray(faces, dtype=np.int32)
    out = np.empty((res, res, res), dtype=np.float32)
    rc = lib.voxelize_mesh(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(len(v)),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(len(f)),
        ctypes.c_int(res),
        ctypes.c_int(band_cells),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"voxelize_mesh failed with code {rc}")
    return out


def marching_tetrahedra(
    grid: np.ndarray, level: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the isosurface of a cubic scalar grid (native kernel).

    Returns (vertices (V, 3) in index space, faces (F, 3)); duplicate
    vertices along shared edges are merged.
    """
    lib = native._load()
    if lib is None:
        raise RuntimeError("native library unavailable (g++ build failed)")
    g = np.ascontiguousarray(grid, dtype=np.float32)
    res = g.shape[0]
    # 6 tets/cell, at most 2 triangles each
    max_tris = (res - 1) ** 3 * 12
    soup = np.empty((max_tris, 9), dtype=np.float32)
    n_tris = lib.marching_tetrahedra(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(res),
        ctypes.c_float(level),
        soup.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(max_tris),
    )
    if n_tris < 0:
        raise RuntimeError("marching_tetrahedra capacity exceeded")
    verts = soup[:n_tris].reshape(-1, 3)
    faces = np.arange(n_tris * 3, dtype=np.int64).reshape(-1, 3)
    # merge duplicate vertices along shared edges
    key = np.round(verts * 1e6).astype(np.int64)
    _, unique_idx, inverse = np.unique(
        key, axis=0, return_index=True, return_inverse=True
    )
    verts = verts[unique_idx]
    faces = inverse[faces]
    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts.astype(np.float64), faces[good]
