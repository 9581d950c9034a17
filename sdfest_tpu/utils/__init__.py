"""Shared utilities: config system, weight loading/conversion."""
from sdfest_tpu.utils import config  # noqa: F401
