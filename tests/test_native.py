"""Tests for the native C++ geometry kernels (voxelizer, marching tets)."""
import numpy as np
import pytest

from sdfest_tpu.native import api as native_api
from sdfest_tpu.ops import marching_cubes as mc
from sdfest_tpu.pipeline.synthetic import Mesh

from conftest import make_sphere_sdf

pytestmark = pytest.mark.skipif(
    not native_api.available(), reason="native toolchain unavailable"
)


def _icosphere(subdiv=3, radius=1.0):
    """Icosahedron-subdivision sphere mesh."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ]
    )
    for _ in range(subdiv):
        new_faces = []
        cache = {}
        verts = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (np.asarray(verts[a]) + np.asarray(verts[b])) / 2.0
                m /= np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(m)
            return cache[key]

        for f in faces:
            a, b, c = int(f[0]), int(f[1]), int(f[2])
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        faces = np.asarray(new_faces)
        verts = np.asarray(verts)
    return verts * radius, faces


def test_voxelize_sphere_matches_analytic():
    verts, faces = _icosphere(3, radius=0.5)
    sdf = native_api.voxelize_mesh(verts, faces, res=64)
    analytic = make_sphere_sdf(64, radius=0.5)
    # near-surface band must be accurate; far field is chamfer-approximate
    band = np.abs(analytic) < 0.1
    err_band = np.abs(sdf[band] - analytic[band])
    assert err_band.max() < 0.02
    # signs correct everywhere except within a voxel of the surface
    margin = np.abs(analytic) > 0.06
    assert (np.sign(sdf[margin]) == np.sign(analytic[margin])).mean() > 0.999
    # far field within chamfer-metric tolerance
    far = np.abs(analytic) > 0.1
    assert np.abs(sdf[far] - analytic[far]).max() < 0.12


def test_native_marching_matches_numpy():
    sdf = make_sphere_sdf(32, radius=0.5)
    v_np, f_np = mc.marching_tetrahedra_np(sdf, 0.0)
    v_nat, f_nat = native_api.marching_tetrahedra(sdf, 0.0)
    # small count differences come from degenerate-triangle handling at
    # cell boundaries; geometry is checked below
    assert abs(len(v_nat) - len(v_np)) < max(len(v_np) // 20, 2)
    assert abs(len(f_nat) - len(f_np)) < max(len(f_np) // 20, 2)
    # every native vertex lies (approximately) on the analytic sphere
    coords = v_nat * (2.0 / 31) - 1.0
    radii = np.linalg.norm(coords, axis=1)
    np.testing.assert_allclose(radii, 0.5, atol=0.03)


def test_mesh_sdf_roundtrip():
    from sdfest_tpu.ops.sdf_utils import mesh_from_sdf, mesh_to_sdf

    verts, faces = _icosphere(3, radius=1.0)
    mesh = Mesh(vertices=verts, faces=faces)
    sdf = mesh_to_sdf(mesh, 64, padding=4)
    assert sdf is not None
    assert sdf.shape == (64, 64, 64)
    assert (sdf < 0).sum() > 1000  # has an interior
    out_mesh = mesh_from_sdf(sdf, level=0.0, complete_mesh=True)
    assert out_mesh is not None
    # extracted surface radius ~ (64 - 8) / 64 of the unit sphere
    radii = np.linalg.norm(out_mesh.vertices, axis=1)
    expected = (64 - 8) / 64
    assert abs(np.median(radii) - expected) < 0.05
