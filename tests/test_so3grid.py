"""Tests for the SO(3) Hopf-fibration grid (mirrors reference test_so3grid.py)."""
import numpy as np
import pytest

from sdfest_tpu.ops.so3grid import SO3Grid
from sdfest_tpu.ops import healpix


def test_num_cells():
    assert SO3Grid(0).num_cells() == 6 * 12
    assert SO3Grid(1).num_cells() == 6 * 12 * 2**3
    assert SO3Grid(2).num_cells() == 6 * 12 * 2**6


def test_hopf_to_quat_conversion():
    quat = SO3Grid.hopf_to_quat(0, 0, 0)
    assert (quat == np.array([0, 0, 0, 1])).all()

    quat = SO3Grid.hopf_to_quat(0.3, 0.4, 0.2)
    np.testing.assert_allclose(
        quat, np.array([0.1464593191, 0.1866245482, 0.06812327794, 0.9690614866])
    )

    # out-of-range Hopf coordinates still land on the x>0 half-sphere
    quat = SO3Grid.hopf_to_quat(0.3, 4, 0.2)
    quat_direct = np.array([-0.06218820609, 0.8541691906, 0.311796094, -0.4114739562])
    np.testing.assert_allclose(quat, -quat_direct)


def test_quat_hopf_conversions():
    quat = np.array([0.3, 0.2, 0.6, 1])
    quat /= np.linalg.norm(quat)
    hopf = SO3Grid.quat_to_hopf(quat)
    np.testing.assert_allclose(SO3Grid.hopf_to_quat(*hopf), quat)

    hopf = (0.3, 0.1, 0.2)
    quat = SO3Grid.hopf_to_quat(*hopf)
    np.testing.assert_allclose(SO3Grid.quat_to_hopf(quat), hopf)


@pytest.mark.parametrize("resol", [0, 1, 2])
def test_index_roundtrips(resol):
    grid = SO3Grid(resol)
    for index in [0, 10, 15, 30, grid.num_cells() - 1]:
        hopf = grid.index_to_hopf(index)
        assert grid.hopf_to_index(*hopf) == index
        quat = grid.index_to_quat(index)
        assert grid.quat_to_index(quat) == index


def test_noisy_mapping():
    grid = SO3Grid(0)
    psi, theta, phi = grid.index_to_hopf(15)
    assert grid.hopf_to_index(psi + 0.11, theta - 0.11, phi + 0.12) == 15


def test_quaternion_table_matches_index_to_quat():
    grid = SO3Grid(1)
    table = grid.quaternions()
    assert table.shape == (grid.num_cells(), 4)
    for index in [0, 7, 100, grid.num_cells() - 1]:
        np.testing.assert_allclose(table[index], grid.index_to_quat(index))
    np.testing.assert_allclose(np.linalg.norm(table, axis=-1), 1.0, atol=1e-12)


@pytest.mark.parametrize("nside", [1, 2, 4, 8])
def test_healpix_roundtrip(nside):
    """pix2ang of every cell center maps back to the same pixel."""
    npix = 12 * nside * nside
    theta, phi = healpix.pix2ang_nest(nside, np.arange(npix))
    back = healpix.ang2pix_nest(nside, theta, phi)
    np.testing.assert_array_equal(back, np.arange(npix))


def test_healpix_area_uniformity():
    """Random points distribute ~uniformly over cells (equal-area property)."""
    rng = np.random.default_rng(0)
    nside = 2
    n = 200000
    z = rng.uniform(-1, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    theta = np.arccos(z)
    pix = healpix.ang2pix_nest(nside, theta, phi)
    counts = np.bincount(pix, minlength=12 * nside * nside)
    expected = n / (12 * nside * nside)
    assert counts.min() > expected * 0.9
    assert counts.max() < expected * 1.1
