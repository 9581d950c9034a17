"""Randomized synthetic rendering evaluation + ablation harness.

Capability parity with /root/reference/sdfest/estimation/scripts/
rendering_evaluation.py: for each mesh under ``data_path``, generate N
random views (z-buffer depth renders from uniformly random camera
orientations at fixed distance), run the estimation pipeline, extract the
estimated mesh, sample ground-truth and estimated surfaces, and compute the
config-specified metrics (fully-qualified function names); supports the
ablation-config loop and mean/var/std aggregation, with results written to
YAML.

Usage:
  python -m sdfest_tpu.scripts.rendering_evaluation --config <cfg.yaml> \
      --data_path ./meshes --out_folder ./results
"""
from __future__ import annotations

import argparse
import copy
import glob
import math
import os
import time
from collections import defaultdict
from datetime import datetime
from pydoc import locate
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from sdfest_tpu.ops import quaternion
from sdfest_tpu.ops.camera import Camera
from sdfest_tpu.pipeline import synthetic
from sdfest_tpu.pipeline.pipeline import SDFPipeline
from sdfest_tpu.utils.config import (
    load_config,
    load_config_from_args,
    save_config_to_file,
)

DEFAULT_METRICS = {
    "chamfer": {
        "f": "sdfest_tpu.pipeline.metrics.symmetric_chamfer",
        "kwargs": {},
    },
    "mean_accuracy": {
        "f": "sdfest_tpu.pipeline.metrics.mean_accuracy",
        "kwargs": {},
    },
    "mean_completeness": {
        "f": "sdfest_tpu.pipeline.metrics.mean_completeness",
        "kwargs": {},
    },
}


def glob_exts(path: str, exts: List[str]) -> List[str]:
    """All files under ``path`` (recursive) with one of the extensions."""
    files = []
    for ext in exts:
        files.extend(glob.glob(os.path.join(path, f"**/*{ext}"), recursive=True))
    return files


def _resolve_metric(name: str):
    """Resolve a fully-qualified metric name (reference names translated)."""
    name = name.replace("sdfest.estimation.metrics", "sdfest_tpu.pipeline.metrics")
    fn = locate(name)
    if fn is None:
        raise ValueError(f"Cannot resolve metric function {name}")
    return fn


class Evaluator:
    """Evaluate the SDF pipeline on synthetic renders of mesh datasets."""

    def __init__(self, config: dict) -> None:
        self.base_config = config
        self.cam = Camera(**config["camera"])
        self._rng = np.random.default_rng(config.get("seed", 0))

    def run(self) -> dict:
        """Run the evaluation (with optional ablation grid); returns results."""
        if self.base_config.get("ablation_configs"):
            ablation_results = {}
            for name, ablation_config in self.base_config[
                "ablation_configs"
            ].items():
                print(f"[ablation] {name}", flush=True)
                config = load_config(
                    ablation_config, copy.deepcopy(self.base_config)
                )
                self._rng = np.random.default_rng(config.get("seed", 0))
                ablation_results[name] = self._evaluate_config(config)
            self._save_and_print_results(ablation_results)
            return ablation_results
        results = self._evaluate_config(self.base_config)
        self._save_and_print_results(results)
        return results

    def _evaluate_config(self, config: dict) -> dict:
        raw = self.evaluate_config_raw(config)
        return {
            views: self._compute_metric_statistics(metrics_list)
            for views, metrics_list in raw.items()
        }

    def evaluate_config_raw(self, config: dict, files=None) -> dict:
        """Per-file metric dicts, keyed by view count (no aggregation).

        ``files`` restricts evaluation to a subset of the dataset — the
        multi-host sweep driver passes each process's shard here and merges
        the raw lists before computing statistics.
        """
        results_dict = {}
        self.pipeline = SDFPipeline(config)
        if files is None:
            files = sorted(glob_exts(config["data_path"], [".obj", ".off"]))
        for views in config["num_views"]:
            per_file = []
            for i, path in enumerate(files):
                t0 = time.monotonic()
                per_file.append(self._evaluate_file(path, views, config))
                print(
                    f"  views={views} file {i + 1}/{len(files)} "
                    f"({os.path.basename(path)}) "
                    f"{time.monotonic() - t0:.1f}s",
                    flush=True,
                )
            results_dict[views] = per_file
        return results_dict

    def _save_and_print_results(self, results_dict: Dict) -> None:
        out_folder = self.base_config.get("out_folder")
        if out_folder is None:
            print(results_dict)
            return
        os.makedirs(out_folder, exist_ok=True)
        run_name = self.base_config.get("run_name", "eval")
        filename = (
            f"rend_eval_{run_name}_"
            f"{datetime.now().strftime('%Y-%m-%d_%H-%M-%S')}.yaml"
        )
        out_path = os.path.join(out_folder, filename)
        save_config_to_file(
            out_path, {**self.base_config, "results": results_dict}
        )
        print(f"Results saved to: {out_path}")

    @staticmethod
    def _compute_metric_statistics(metrics_list: List[Dict]) -> Dict:
        """Mean / variance / standard deviation per metric."""
        stats = defaultdict(lambda: {"mean": 0.0, "var": 0.0})
        for metrics in metrics_list:
            for name, val in metrics.items():
                stats[name]["mean"] += val
        for s in stats.values():
            s["mean"] /= len(metrics_list)
        for metrics in metrics_list:
            for name, val in metrics.items():
                stats[name]["var"] += (val - stats[name]["mean"]) ** 2
        for s in stats.values():
            s["var"] /= len(metrics_list)
            s["std"] = math.sqrt(s["var"])
        return dict(stats)

    def _generate_views(self, mesh: synthetic.Mesh, num_views: int) -> Dict:
        """Random views of a world-frame mesh; cameras at fixed distance."""
        views = defaultdict(list)
        distance = self.base_config["camera_distance"]
        mesh.position = np.zeros(3)
        mesh_position = mesh.position.copy()
        mesh_orientation = np.asarray(mesh.orientation, dtype=np.float64)

        while len(views["depth_images"]) < num_views:
            u = self._rng.random(3)
            camera_orientation = np.array(
                [
                    np.sqrt(1 - u[0]) * np.sin(2 * np.pi * u[1]),
                    np.sqrt(1 - u[0]) * np.cos(2 * np.pi * u[1]),
                    np.sqrt(u[0]) * np.sin(2 * np.pi * u[2]),
                    np.sqrt(u[0]) * np.cos(2 * np.pi * u[2]),
                ]
            )  # camera(ogl) -> world
            cam_q = jnp.asarray(camera_orientation)
            camera_position = np.asarray(
                jnp.asarray(mesh_position)
                - quaternion.apply(cam_q, jnp.asarray([0.0, 0.0, -distance]))
            )
            # mesh pose in the (OpenCV-convention) rasterizer camera frame
            cam_cv_q = quaternion.multiply(
                cam_q, jnp.asarray([1.0, 0.0, 0.0, 0.0])
            )
            mesh_orientation_cam = quaternion.multiply(
                quaternion.invert(cam_cv_q), jnp.asarray(mesh_orientation)
            )
            mesh.position = np.array([0.0, 0.0, distance])
            mesh.orientation = np.asarray(mesh_orientation_cam)
            depth = synthetic.draw_depth_geometry(mesh, self.cam)
            if (depth != 0).any():
                views["depth_images"].append(depth.astype(np.float32))
                views["masks"].append(depth != 0)
                views["camera_positions"].append(
                    camera_position.astype(np.float32)
                )
                views["camera_orientations"].append(
                    camera_orientation.astype(np.float32)
                )
            else:
                print("Warning: invalid depth generated, skipping this sample")

        mesh.position = mesh_position
        mesh.orientation = mesh_orientation
        return {k: jnp.asarray(np.stack(v)) for k, v in views.items()}

    def _evaluate_file(self, path: str, num_views: int, config: dict) -> dict:
        gt_mesh = synthetic.Mesh(
            path=path,
            scale=self.base_config["mesh_scale"],
            rel_scale=self.base_config.get("rel_scale", False),
            center=True,
        )
        inputs = self._generate_views(gt_mesh, num_views)
        log_folder = self.base_config.get("log_folder")
        log_path = None
        if log_folder:
            os.makedirs(log_folder, exist_ok=True)
            log_path = os.path.join(
                log_folder,
                datetime.now().strftime("%Y-%m-%d_%H-%M-%S-%f") + ".pkl",
            )

        position, orientation, scale, shape = self.pipeline(
            **inputs,
            log_path=log_path,
            shape_optimization=config.get("shape_optimization", True),
        )
        out_mesh = self.pipeline.generate_mesh(shape, scale, True)
        out_mesh.position = np.asarray(position[0])
        out_mesh.orientation = np.asarray(orientation[0])

        samples = self.base_config.get("samples", 20000)
        seed = self.base_config.get("seed", 0)
        gt_pts = synthetic.Mesh(
            vertices=gt_mesh.get_transformed_vertices(), faces=gt_mesh.faces,
            scale=1.0, rel_scale=True,
        ).sample_points_uniformly(samples, rng=np.random.default_rng(seed))
        out_pts = synthetic.Mesh(
            vertices=out_mesh.get_transformed_vertices(), faces=out_mesh.faces,
            scale=1.0, rel_scale=True,
        ).sample_points_uniformly(samples, rng=np.random.default_rng(seed))

        metrics_config = self.base_config.get("metrics", DEFAULT_METRICS)
        metric_dict = {}
        for metric_name, m in metrics_config.items():
            fn = _resolve_metric(m["f"])
            metric_dict[metric_name] = float(
                fn(gt_pts, out_pts, **m.get("kwargs", {}))
            )
        if config.get("pose_metrics"):
            # pose-space metrics against the known synthetic ground truth
            # (mesh at the world origin in its canonical frame).  With
            # ``rotational_symmetry_axis`` set, the orientation error is
            # additionally reported modulo the symmetry (the NOCS
            # convention for bowl/bottle/can — reference
            # estimation/metrics.py:9-75), which is the only meaningful
            # orientation number for a symmetric category.
            from scipy.spatial.transform import Rotation

            from sdfest_tpu.pipeline import metrics as pose_metrics

            gt_rot = Rotation.from_quat(
                np.asarray(gt_mesh.orientation, dtype=np.float64)
            )
            pred_rot = Rotation.from_quat(
                np.asarray(orientation[0], dtype=np.float64)
            )
            metric_dict["position_error"] = float(
                np.linalg.norm(np.asarray(position[0]))
            )
            metric_dict["orientation_deg"] = pose_metrics.degree_error(
                gt_rot, pred_rot
            )
            axis = config.get("rotational_symmetry_axis")
            if axis is not None:
                metric_dict["orientation_deg_sym"] = (
                    pose_metrics.degree_error(gt_rot, pred_rot, axis)
                )
        return metric_dict


def main() -> None:
    parser = argparse.ArgumentParser(description="Synthetic rendering evaluation.")
    parser.add_argument("--config", nargs="+", required=False)
    config = load_config_from_args(parser)
    Evaluator(config).run()


if __name__ == "__main__":
    main()
