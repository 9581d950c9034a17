"""Device-parallel estimation: shard hypotheses/instances over a mesh.

The estimation-side parallelism story (SURVEY.md §2.9): refinement instances
(hypotheses, frames, dataset samples) are independent, so they shard over a
device mesh with zero cross-device communication — the honest "distributed
backend" for this workload.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sdfest_tpu.parallel.mesh import make_mesh


def sharded_refine_batch(
    pipeline,
    states: Dict[str, jax.Array],
    depth_images: jax.Array,
    points: jax.Array,
    point_masks: jax.Array,
    camera_positions: jax.Array,
    camera_orientations: jax.Array,
    mesh: Optional[Mesh] = None,
    shape_optimization: bool = True,
    roi=None,
    multires=None,
):
    """Run :meth:`SDFPipeline.refine_batch` with hypotheses sharded on a mesh.

    The hypothesis axis of every ``states`` leaf is sharded over the mesh's
    first axis; view inputs are replicated.  The hypothesis count must be a
    multiple of the device count.

    Args:
        pipeline: An :class:`sdfest_tpu.pipeline.SDFPipeline`.
        states: Hypothesis-batched state pytree (leading axis N).
        depth_images / points / point_masks / camera_*: Shared view inputs.
        mesh: Device mesh (defaults to all local devices).
        shape_optimization: Optimize the latent during refinement.
        roi: Optional static (Hr, Wr) depth-loss crop (see
            :meth:`SDFPipeline._refine`); pass
            ``pipeline._roi_for(depth_images)`` for the config policy.
        multires: Optional static (factor, coarse_iters) coarse-to-fine
            schedule (see :meth:`SDFPipeline.refine_batch`); pass
            ``pipeline._multires_for()`` for the config policy.
    Returns:
        (final_states, best, log) with hypothesis-sharded outputs.
    """
    if mesh is None:
        mesh = make_mesh()
    axis = mesh.axis_names[0]
    sharded = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    states = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharded), states
    )
    view_args = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl),
        (depth_images, points, point_masks, camera_positions,
         camera_orientations),
    )
    return pipeline.refine_batch(
        states, *view_args, shape_optimization=shape_optimization, roi=roi,
        multires=multires,
    )


def make_hypothesis_states(
    position: jax.Array,
    orientation: jax.Array,
    scale: jax.Array,
    latent: jax.Array,
    num_hypotheses: int,
    key: jax.Array,
    position_noise: float = 0.02,
    orientation_noise: float = 0.1,
) -> Dict[str, jax.Array]:
    """Expand one initial estimate into N perturbed hypotheses.

    The first hypothesis is the unperturbed estimate; the rest add Gaussian
    position noise and small random rotations — the multi-hypothesis upgrade
    over the reference's single-estimate refinement.
    """
    from sdfest_tpu.ops import quaternion

    n = num_hypotheses
    k1, k2 = jax.random.split(key)
    pos_noise = position_noise * jax.random.normal(k1, (n,) + position.shape)
    quat_noise = quaternion.random_uniform(k2, (n,))
    blend = jnp.concatenate(
        [jnp.zeros((1, 1)), jnp.full((n - 1, 1), orientation_noise)], axis=0
    )
    quats = (1.0 - blend) * jnp.tile(orientation, (n, 1)) + blend * quat_noise
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    pos_noise = pos_noise.at[0].set(0.0)
    return {
        "position": position[None] + pos_noise,
        "orientation": quats[:, None, :]
        if orientation.ndim == 2
        else quats,
        "scale": jnp.tile(scale[None], (n,) + (1,) * scale.ndim),
        "latent": jnp.tile(latent[None], (n,) + (1,) * latent.ndim),
    }
