"""TPU-native SDF-based 6-DoF pose, scale, and shape estimation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the SDFEst
reference system (categorical pose + scale + shape estimation from depth images
via analysis-by-synthesis over voxelized signed distance fields):

- ``sdfest_tpu.ops``: geometry core (quaternions, camera models, point sets,
  trilinear grid sampling, SO(3) grids, marching cubes).
- ``sdfest_tpu.render``: differentiable sphere-tracing depth renderer with an
  analytic custom VJP (XLA and Pallas TPU backends, numpy golden reference).
- ``sdfest_tpu.models``: shape VAE over SDF voxel grids and PointNet-based
  single-shot initialization networks (flax).
- ``sdfest_tpu.pipeline``: the end-to-end estimation pipeline (single jitted
  render-and-compare refinement program), losses and metrics.
- ``sdfest_tpu.datasets`` / ``sdfest_tpu.training``: online synthetic data
  generation, NOCS/Redwood dataset loaders, VAE and init-network trainers.
- ``sdfest_tpu.parallel``: device-mesh sharding helpers for data-parallel
  training and hypothesis-parallel estimation.
"""

__version__ = "0.1.0"
