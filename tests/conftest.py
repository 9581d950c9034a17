"""Test configuration: force CPU platform with an 8-device virtual mesh.

Multi-chip sharding is validated on a virtual CPU mesh; the benchmark driver
separately exercises the real TPU chip.  Set ``SDFEST_TPU_TESTS=1`` to keep
the attached accelerator instead (enables tests/test_tpu_compiled.py, which
is skipped on CPU).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_USE_TPU = os.environ.get("SDFEST_TPU_TESTS", "") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    # the environment's sitecustomize may force the TPU platform; override it
    jax.config.update("jax_platforms", "cpu")
    # enable float64 so numeric-gradient checks are meaningful on CPU
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_sphere_sdf(res: int = 64, radius: float = 0.5) -> np.ndarray:
    """Analytic sphere SDF on the [-1, 1]^3 grid (exact, not truncated)."""
    coords = np.linspace(-1.0, 1.0, res)
    x, y, z = np.meshgrid(coords, coords, coords, indexing="ij")
    return (np.sqrt(x * x + y * y + z * z) - radius).astype(np.float32)


def make_box_sdf(res: int = 64, half_extents=(0.4, 0.3, 0.5)) -> np.ndarray:
    """Analytic axis-aligned box SDF on the [-1, 1]^3 grid."""
    coords = np.linspace(-1.0, 1.0, res)
    x, y, z = np.meshgrid(coords, coords, coords, indexing="ij")
    q = np.stack(
        [np.abs(x) - half_extents[0], np.abs(y) - half_extents[1],
         np.abs(z) - half_extents[2]],
        axis=-1,
    )
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
    inside = np.minimum(np.max(q, axis=-1), 0.0)
    return (outside + inside).astype(np.float32)
