"""Differentiable sphere-tracing depth renderer backends.

- :mod:`sdfest_tpu.render.xla` — pure-XLA lock-step marcher with analytic
  custom VJP (works on TPU and CPU; the interpret-mode reference for the
  Pallas kernel).
- :mod:`sdfest_tpu.render.pallas_kernel` — hand-tiled Pallas TPU kernel for
  the forward march (hot path).
- :mod:`sdfest_tpu.render.reference` — numpy golden reference for parity
  tests.
"""
from sdfest_tpu.render.api import (  # noqa: F401
    render_depth,
    render_depth_warm,
    render_depth_with_pc_values,
    resolve_backend,
)
from sdfest_tpu.render.reference import render_depth_np  # noqa: F401
