"""Geometry and grid-sampling core ops (pure JAX unless noted)."""
from sdfest_tpu.ops.camera import Camera  # noqa: F401
from sdfest_tpu.ops import interpolation, pointset, quaternion  # noqa: F401
