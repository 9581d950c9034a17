"""Multi-host (DCN) rendering-evaluation sweep driver.

Shards the mesh list of :mod:`sdfest_tpu.scripts.rendering_evaluation`
across ``jax.distributed`` processes (SURVEY §5.8: evaluation sweeps are
embarrassingly parallel — per-host machinery runs unchanged, no collectives
cross DCN), then merges the per-process raw metrics on process 0 into the
same statistics yaml a single-process run writes.

Usage (per host/process):
  python -m sdfest_tpu.scripts.distributed_evaluation \
      --config estimation/configs/rendering_evaluation.yaml \
      [--coordinator host:port --num_processes N --process_id I]

On cloud TPU pods the coordinator flags can be omitted (auto-detected); for
manual grids (e.g. CPU smoke tests) pass them explicitly.
"""
from __future__ import annotations

import argparse
import glob as _glob
import os
from datetime import datetime

from sdfest_tpu.parallel import distributed as dist
from sdfest_tpu.utils.config import load_config_from_args, save_config_to_file


def run_distributed_category(config: dict, evaluator=None) -> dict:
    """Category-level (REAL275/REDWOOD75) sweep sharded by dataset index.

    Same structure as :func:`run_distributed`: every process scores its
    index shard with :class:`CategoryEvaluator.evaluate_indices`, process 0
    merges the raw record lists and aggregates exactly as a single-process
    run would.
    """
    import pickle

    import jax

    from sdfest_tpu.scripts.category_evaluation import CategoryEvaluator

    pid = jax.process_index()
    nproc = jax.process_count()
    out_folder = config.get("out_folder", "distributed_eval_out")
    run_name = config.get("run_name") or "category_eval"

    if evaluator is None:
        evaluator = CategoryEvaluator(config)
    indices = evaluator.default_indices()
    my_indices = dist.shard_work_list(indices)
    print(f"[process {pid}/{nproc}] evaluating {len(my_indices)} of "
          f"{len(indices)} samples")
    records = evaluator.evaluate_indices(my_indices)

    part = dist.partial_result_path(out_folder, run_name, pid)
    dist.save_partial_results(part, records)
    dist.barrier("sdfest_category_eval_done")
    if pid != 0:
        return records

    merged = []
    for i in range(nproc):
        with open(dist.partial_result_path(out_folder, run_name, i), "rb") as f:
            merged.extend(pickle.load(f))
    results = CategoryEvaluator.aggregate_records(merged)

    os.makedirs(out_folder, exist_ok=True)
    out_path = os.path.join(
        out_folder,
        f"category_eval_{run_name}_"
        f"{datetime.now().strftime('%Y-%m-%d_%H-%M-%S')}_merged.yaml",
    )
    save_config_to_file(out_path, {**config, "results": results})
    print(f"Merged results ({nproc} processes) saved to: {out_path}")
    for p in _glob.glob(os.path.join(out_folder, f"{run_name}_part*.pkl")):
        os.remove(p)
    return results


def run_distributed(config: dict) -> dict:
    """Evaluate this process's shard; process 0 merges and saves. Returns
    the merged statistics on process 0, this process's raw results else."""
    import jax

    from sdfest_tpu.scripts.rendering_evaluation import Evaluator, glob_exts

    if "category_configs" in config:
        return run_distributed_category(config)

    pid = jax.process_index()
    nproc = jax.process_count()
    out_folder = config.get("out_folder", "distributed_eval_out")
    run_name = config.get("run_name", "eval")

    evaluator = Evaluator(config)
    all_files = sorted(glob_exts(config["data_path"], [".obj", ".off"]))
    my_files = dist.shard_work_list(all_files)
    print(f"[process {pid}/{nproc}] evaluating {len(my_files)} of "
          f"{len(all_files)} meshes")

    # {ablation_name or None: {views: [raw metric dicts]}}
    if config.get("ablation_configs"):
        import copy

        from sdfest_tpu.utils.config import load_config

        raw = {}
        for name, overlay in config["ablation_configs"].items():
            sub = load_config(overlay, copy.deepcopy(config))
            raw[name] = evaluator.evaluate_config_raw(sub, files=my_files)
    else:
        raw = {None: evaluator.evaluate_config_raw(config, files=my_files)}

    part = dist.partial_result_path(out_folder, run_name, pid)
    dist.save_partial_results(part, raw)
    dist.barrier("sdfest_eval_done")
    if pid != 0:
        return raw

    # merge: concatenate raw per-file lists across processes, then compute
    # the exact statistics a single-process run would produce
    merged: dict = {}
    for i in range(nproc):
        with open(dist.partial_result_path(out_folder, run_name, i), "rb") as f:
            import pickle

            part_raw = pickle.load(f)
        for name, by_views in part_raw.items():
            dst = merged.setdefault(name, {})
            for views, metrics_list in by_views.items():
                dst.setdefault(views, []).extend(metrics_list)

    stats = {
        name: {
            views: Evaluator._compute_metric_statistics(metrics_list)
            for views, metrics_list in by_views.items()
        }
        for name, by_views in merged.items()
    }
    results = stats[None] if set(stats) == {None} else stats

    os.makedirs(out_folder, exist_ok=True)
    out_path = os.path.join(
        out_folder,
        f"rend_eval_{run_name}_"
        f"{datetime.now().strftime('%Y-%m-%d_%H-%M-%S')}_merged.yaml",
    )
    save_config_to_file(out_path, {**config, "results": results})
    print(f"Merged results ({nproc} processes) saved to: {out_path}")
    for p in _glob.glob(os.path.join(out_folder, f"{run_name}_part*.pkl")):
        os.remove(p)
    return results


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Multi-host rendering-evaluation sweep."
    )
    parser.add_argument("--config", nargs="+", required=False)
    parser.add_argument("--coordinator", default=None,
                        help="coordinator address host:port (omit on cloud)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args, _ = parser.parse_known_args()
    dist.initialize_distributed(
        args.coordinator, args.num_processes, args.process_id
    )
    config = load_config_from_args(parser)
    for k in ("coordinator", "num_processes", "process_id"):
        config.pop(k, None)
    run_distributed(config)


if __name__ == "__main__":
    main()
