"""Multi-host (DCN) helpers for embarrassingly parallel evaluation sweeps.

SURVEY §5.8: the only communication pattern this workload needs across hosts
is work-list sharding — evaluation of independent meshes/frames — so the
"distributed backend" is ``jax.distributed`` process bootstrap + a
deterministic shard of the work list per process + a host-side merge of the
partial results.  No collectives cross DCN; ICI parallelism stays inside
each host (see :mod:`sdfest_tpu.parallel.mesh`).

The reference has no distributed machinery of any kind (SURVEY §2.9); this
is a capability upgrade, not a port.
"""
from __future__ import annotations

import os
import pickle
from typing import List, Optional, Sequence

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bootstrap ``jax.distributed`` for a multi-host sweep.

    Arguments default to the standard JAX environment variables
    (``JAX_COORDINATOR_ADDRESS`` etc. / cloud auto-detection); pass them
    explicitly for manual process grids (e.g. two local CPU processes).
    Safe to call once per process, before any other JAX API touches devices.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_work_list(
    items: Sequence,
    process_id: Optional[int] = None,
    num_processes: Optional[int] = None,
) -> List:
    """This process's deterministic round-robin share of a work list.

    Round-robin (``items[pid::n]``) balances heterogeneous per-item cost
    better than contiguous blocks when cost correlates with list order
    (datasets are usually sorted by category/size).
    """
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return list(items)[pid::n]


def partial_result_path(out_folder: str, run_name: str, process_id: int) -> str:
    """Canonical location of one process's partial evaluation results."""
    return os.path.join(out_folder, f"{run_name}_part{process_id:04d}.pkl")


def save_partial_results(path: str, results) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(results, f)


def merge_partial_results(paths: Sequence[str]) -> List:
    """Concatenate the per-file metric lists from every partial dump.

    Partial dumps are raw per-item metric dicts (NOT aggregated statistics —
    means/variances cannot be merged without the raw samples), so the merged
    list feeds the same statistics computation a single-process run uses.
    """
    merged: List = []
    for path in paths:
        with open(path, "rb") as f:
            merged.extend(pickle.load(f))
    return merged


def barrier(name: str = "sdfest_barrier") -> None:
    """Block until every process reaches this point (DCN sync)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
