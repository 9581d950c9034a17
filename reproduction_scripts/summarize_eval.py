"""Summarize a rendering-evaluation results yaml as a markdown table.

Turns the aggregated statistics written by
``sdfest_tpu.scripts.rendering_evaluation`` (the reference protocol's
mean/var/std aggregation, reference rendering_evaluation.py:143-172) into
the doc-ready tables used by docs/training_demo.md.

    python reproduction_scripts/summarize_eval.py results/rend_eval_*.yaml \
        [--metrics chamfer mean_accuracy mean_completeness position_error orientation_deg]
"""
import argparse

import yaml

CONFIG_KEYS = {
    "camera", "threshold", "iso_threshold", "max_iterations", "depth_weight",
    "pc_weight", "nn_weight", "mean_shape", "init_view", "shape_init",
    "renderer_backend", "relaxation", "coarse_culling", "bf16_march",
    "temporal_coherence", "roi_size", "roi_margin", "multires_factor",
    "multires_iterations", "early_stop", "config", "run_name", "data_path",
    "num_views", "pose_metrics", "ablation_configs", "vae", "init",
    "category", "far_field", "seed", "mesh_scale", "camera_distance",
    "num_points", "metrics", "shape_optimization", "device",
    "result_selection_strategy", "rotational_symmetry_axis", "log_folder",
    "fused_call", "reuse_plan", "visualize_optimization", "out_folder",
}


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("results_yaml")
    parser.add_argument(
        "--metrics", nargs="+",
        default=["chamfer", "mean_accuracy", "mean_completeness",
                 "position_error", "orientation_deg"],
    )
    args = parser.parse_args()
    data = yaml.safe_load(open(args.results_yaml))
    data = data.get("results", data)
    # ablation rows are the non-config top-level dict entries
    rows = {
        k: v for k, v in data.items()
        if k not in CONFIG_KEYS and isinstance(v, dict)
        and all(isinstance(vv, dict) for vv in v.values())
    }
    # a non-ablation run: {views: {metric: stats}}
    if not rows and data:
        rows = {"(base)": data}
    header = ["config", "views"] + args.metrics
    print("| " + " | ".join(header) + " |")
    print("|" + "---|" * len(header))
    for name, per_views in rows.items():
        for views, stats in sorted(per_views.items()):
            cells = [name, str(views)]
            for m in args.metrics:
                s = stats.get(m)
                if s is None:
                    cells.append("—")
                elif m.endswith("_deg"):
                    cells.append(f"{s['mean']:.1f} ± {s['std']:.1f}")
                else:
                    cells.append(f"{s['mean']:.4f} ± {s['std']:.4f}")
            print("| " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
