"""Estimation pipeline: init -> jitted render-and-compare refinement."""
from sdfest_tpu.pipeline.pipeline import NoDepthError, SDFPipeline  # noqa: F401
from sdfest_tpu.pipeline import losses, synthetic  # noqa: F401
