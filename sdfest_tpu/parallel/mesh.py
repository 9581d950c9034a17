"""Device-mesh sharding helpers (jax.sharding + jit).

The honest parallelism for this model family (SURVEY.md §2.9): data-parallel
training (batch sharded over a ``dp`` axis, parameters replicated, gradient
all-reduce inserted by XLA over ICI) and hypothesis-parallel estimation
(independent refinement instances sharded with no cross-device communication
at all).  TP/PP/SP/EP do not apply to 8-dim-latent VAEs and 1024-unit
PointNets and are intentionally absent.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "dp"
) -> Mesh:
    """Create a 1D device mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))

def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Sharding that splits the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "dp") -> Any:
    """Device-put a pytree of batched arrays with the batch axis sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_step(
    step_fn: Callable,
    mesh: Mesh,
    batch_argnums: Sequence[int] = (1,),
    axis_name: str = "dp",
    donate_argnums: Sequence[int] = (0,),
    static_argnums: Sequence[int] = (),
) -> Callable:
    """Wrap a (state, batch, ...) -> (state, metrics) step for DP execution.

    Batch arguments are sharded over the mesh axis; all other arguments and
    outputs are replicated.  XLA inserts the gradient all-reduce (``psum``
    over ICI) automatically from the sharding constraints — no hand-written
    collectives.
    """
    batch_shard = batch_sharding(mesh, axis_name)
    repl = replicated_sharding(mesh)

    def in_sharding_for(i):
        return batch_shard if i in batch_argnums else repl

    def wrapper_shardings(n_args):
        return tuple(in_sharding_for(i) for i in range(n_args))

    compiled = {}

    def wrapped(*args):
        n = len(args)
        if n not in compiled:
            compiled[n] = jax.jit(
                step_fn,
                in_shardings=wrapper_shardings(n),
                out_shardings=repl,
                donate_argnums=donate_argnums,
                static_argnums=static_argnums,
            )
        return compiled[n](*args)

    return wrapped


def shard_map_data_parallel_step(
    step_fn: Callable,
    mesh: Mesh,
    batch_argnums: Sequence[int] = (1,),
    axis_name: str = "dp",
    donate_argnums: Sequence[int] = (0,),
) -> Callable:
    """Wrap an ``axis_name``-aware step for per-device local-batch execution.

    Unlike :func:`data_parallel_step` (a GSPMD jit over the GLOBAL batch),
    each device here traces ``step_fn`` with its LOCAL batch shard via
    ``jax.shard_map``.  This matters for the pallas compute paths: the
    batched-Mosaic miscompile workaround lowers ``vmap`` of every kernel to
    a sequential ``lax.map`` (see ``_sequential_vmap``), and under GSPMD
    that map runs over the global batch on EVERY device — erasing the DP
    speedup of the render / pc-sampling stages.  Under shard_map each
    device runs ``B / n_devices`` sequential kernel chains.

    ``step_fn(state, batch, ..., axis_name=...)`` must accept the
    ``axis_name`` keyword and reduce its gradients/metrics over it with
    ``psum``/``pmean`` as appropriate for its loss reduction (both trainers
    do); the optimizer update then computes identically on every device, so
    the replicated outputs are exact.
    """
    import functools

    compiled = {}

    def wrapped(*args):
        n = len(args)
        if n not in compiled:
            specs = tuple(
                P(axis_name) if i in batch_argnums else P() for i in range(n)
            )
            fn = jax.shard_map(
                functools.partial(step_fn, axis_name=axis_name),
                mesh=mesh,
                in_specs=specs,
                out_specs=P(),
                check_vma=False,
            )
            compiled[n] = jax.jit(fn, donate_argnums=donate_argnums)
        return compiled[n](*args)

    return wrapped
