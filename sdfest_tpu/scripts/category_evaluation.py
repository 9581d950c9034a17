"""Category-level pose-and-shape evaluation on REAL275 / REDWOOD75.

In-repo counterpart of the external ``cpas_toolbox`` benchmark the reference
delegates its headline REAL275/REDWOOD75 numbers to
(/root/reference/README.md:80;
/root/reference/reproduction_scripts/reproduce_paper.sh:33-37 — "coming
soon, all code available in icaps_eval branch").  The reference repo itself
ships only the per-category model maps
(/root/reference/sdfest/estimation/configs/real275_evaluation.yaml); this
driver completes the loop so a user can reproduce category-level numbers
without any external toolbox:

For every dataset sample it runs the estimation pipeline registered for the
sample's category, reconstructs the predicted surface mesh, and scores pose
AND shape:

- **correctness grids** (NOCS-style mAP table entries): fraction of samples
  passing :func:`sdfest_tpu.pipeline.metrics.correct_thresh` for every
  combination in the config's position / degree / IoU-3D / f-score
  threshold grids (e.g. IoU25, IoU50, 5deg5cm, 10deg10cm), symmetry-aware
  for the rotation-symmetric NOCS categories (bottle, bowl, can);
- **continuous means**: position error (m), orientation error (deg),
  oriented-box 3D IoU, plus every reconstruction metric from the config
  ``metrics`` map (chamfer, accuracy/completeness, normalized variants —
  the same map the rendering evaluation consumes).

Results are aggregated per category and overall ("all") and written to
YAML.  Failed estimates (no depth inside the mask, empty reconstruction)
count as incorrect with correctness 0, as in the NOCS protocol.

Usage:
  python -m sdfest_tpu.scripts.category_evaluation \
      --config sdfest_tpu/configs/estimation/real275_evaluation.yaml \
      --data_path ./data/nocs --out_folder ./results
"""
from __future__ import annotations

import argparse
import os
from collections import defaultdict
from datetime import datetime
from typing import Dict, Optional

import numpy as np
from scipy.spatial.transform import Rotation

from sdfest_tpu.pipeline import metrics as metrics_module
from sdfest_tpu.pipeline import synthetic
from sdfest_tpu.pipeline.pipeline import NoDepthError, SDFPipeline
from sdfest_tpu.scripts.rendering_evaluation import _resolve_metric
from sdfest_tpu.utils.config import (
    default_search_paths,
    load_config,
    load_config_from_args,
    save_config_to_file,
)

# where the packaged per-category model yamls live ("./models/mug.yaml"
# entries are relative to the evaluation yaml, which ships here).
_ESTIMATION_CONFIG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "configs",
    "estimation",
)

# NOCS convention: bottle / bowl / can are rotation-symmetric about the
# object-frame up axis; after the default remap (remap_y_axis: y) that is
# axis 1.  Overridable via the config's ``symmetry_axes`` map.
DEFAULT_SYMMETRY_AXES = {"bottle": 1, "bowl": 1, "can": 1}

# NOCS-style correctness table: IoU25 / IoU50 plus the deg/cm grid.
DEFAULT_CORRECTNESS = {
    "iou_3d": {"iou_3d_thresholds": [0.25, 0.5]},
    "deg_cm": {
        "degree_thresholds": [5.0, 10.0],
        "position_thresholds": [0.05, 0.10],
    },
}


def _make_dataset(config: dict):
    """Instantiate the dataset named by ``config["dataset"]``.

    The extents-bearing ``full`` scale convention is forced: the IoU-3D
    metrics need ground-truth extents, not a scalar size.
    """
    name = config["dataset"]
    data_path = config["data_path"]
    if name in ("real275", "nocs"):
        from sdfest_tpu.datasets.nocs_dataset import NOCSDataset

        return NOCSDataset(
            {
                "root_dir": data_path,
                "split": config.get("split", "real_test"),
                "camera_convention": "opencv",
                "scale_convention": "full",
                "remap_y_axis": config.get("remap_y_axis", "y"),
                "remap_x_axis": config.get("remap_x_axis", "-z"),
                "mask_pointcloud": True,
            }
        )
    if name == "redwood":
        from sdfest_tpu.datasets.redwood_dataset import AnnotatedRedwoodDataset

        return AnnotatedRedwoodDataset(
            {
                "root_dir": data_path,
                "ann_dir": config["ann_dir"],
                "camera_convention": "opencv",
                "scale_convention": "full",
                "remap_y_axis": config.get("remap_y_axis", "y"),
                "remap_x_axis": config.get("remap_x_axis", "-z"),
            }
        )
    raise ValueError(f"Unsupported dataset {name!r} for category evaluation.")


class CategoryEvaluator:
    """Evaluate per-category pipelines on an annotated RGB-D dataset.

    ``dataset`` and ``pipelines`` are injectable for testing; by default the
    dataset comes from the config and pipelines are built lazily per
    category from the config's ``category_configs`` map (categories without
    an entry are skipped, as in the reference's evaluation configs).
    """

    def __init__(
        self,
        config: dict,
        dataset=None,
        pipelines: Optional[Dict[str, SDFPipeline]] = None,
    ) -> None:
        self.config = config
        self.dataset = dataset if dataset is not None else _make_dataset(config)
        self._pipelines: Dict[str, SDFPipeline] = dict(pipelines or {})
        self._symmetry = {
            **DEFAULT_SYMMETRY_AXES,
            **(config.get("symmetry_axes") or {}),
        }
        self._correctness = config.get("correctness") or DEFAULT_CORRECTNESS
        self._metrics = config.get("metrics", {})
        self._samples = config.get("samples", 20000)
        self._gt_mesh_metric = config.get(
            "gt_mesh_metric", config.get("dataset") == "redwood"
        )

    # -- per-category pipeline ------------------------------------------------
    def _pipeline_for(self, category: str) -> Optional[SDFPipeline]:
        if category in self._pipelines:
            return self._pipelines[category]
        category_configs = self.config.get("category_configs", {})
        if category not in category_configs:
            self._pipelines[category] = None
            return None
        rel = category_configs[category]
        search = default_search_paths(
            self.config.get("config_dir", _ESTIMATION_CONFIG_DIR)
        )
        pipeline_config = load_config(rel, dict(self.config), search_paths=search)
        self._pipelines[category] = SDFPipeline(pipeline_config)
        return self._pipelines[category]

    # -- ground truth ---------------------------------------------------------
    def _gt_mesh(self, sample: dict) -> Optional[synthetic.Mesh]:
        obj_path = sample.get("obj_path")
        if not obj_path:
            return None
        vertices, faces = self.dataset.load_mesh(obj_path)
        if self._gt_mesh_metric:
            mesh = synthetic.Mesh(
                vertices=vertices, faces=faces, scale=1.0, rel_scale=True
            )
        else:
            # normalized CAD model: scale uniformly so the half-max-extent
            # matches the annotated extents (NOCS normalization).
            extents = np.asarray(sample["scale"], np.float64).reshape(-1)
            mesh = synthetic.Mesh(
                vertices=vertices,
                faces=faces,
                scale=float(np.max(extents)) / 2.0,
                rel_scale=False,
            )
        mesh.position = np.asarray(sample["position"], np.float64)
        mesh.orientation = np.asarray(sample["quaternion"], np.float64)
        return mesh

    # -- one sample -----------------------------------------------------------
    def evaluate_sample(self, sample: dict) -> Optional[dict]:
        """Run the category pipeline on one sample; returns the error dict.

        Returns None when the sample's category has no registered pipeline.
        A failed estimate returns ``{"failed": True, ...}`` (scored as
        incorrect with IoU 0 and infinite errors).
        """
        category = sample["category_str"]
        pipeline = self._pipeline_for(category)
        if pipeline is None:
            return None
        sym_axis = self._symmetry.get(category)
        record = {"category": category, "failed": False}
        try:
            position, orientation, scale, latent = pipeline(
                np.asarray(sample["depth"], np.float32),
                np.asarray(sample["mask"]),
            )
            out_mesh = pipeline.generate_mesh(latent, scale, True)
            if out_mesh is None:
                raise ValueError("empty reconstruction")
        except (NoDepthError, ValueError):
            record.update(
                failed=True,
                position_error=float("inf"),
                degree_error=float("inf"),
                iou_3d=0.0,
            )
            return record

        pos_pred = np.asarray(position[0], np.float64)
        rot_pred = Rotation.from_quat(np.asarray(orientation[0], np.float64))
        bbox_min = out_mesh.vertices.min(axis=0)
        bbox_max = out_mesh.vertices.max(axis=0)
        extent_pred = bbox_max - bbox_min
        # The predicted box is the mesh's object-frame bbox: if its center is
        # offset from the origin (marching-cubes meshes rarely center exactly),
        # the box center in camera frame is position + R * center_offset.
        box_center_pred = pos_pred + rot_pred.apply((bbox_min + bbox_max) / 2.0)
        pos_gt = np.asarray(sample["position"], np.float64)
        rot_gt = Rotation.from_quat(np.asarray(sample["quaternion"], np.float64))
        extent_gt = np.asarray(sample["scale"], np.float64).reshape(-1)

        record["position_error"] = float(np.linalg.norm(pos_gt - pos_pred))
        record["degree_error"] = metrics_module.degree_error(
            rot_gt, rot_pred, sym_axis
        )
        record["iou_3d"] = float(
            metrics_module.symmetric_box_iou(
                extent_gt, pos_gt, rot_gt,
                extent_pred, box_center_pred, rot_pred,
                sym_axis,
            )
        )

        gt_mesh = self._gt_mesh(sample)
        if gt_mesh is not None and self._metrics:
            rng_seed = self.config.get("seed", 0)
            out_mesh.position = pos_pred
            out_mesh.orientation = np.asarray(orientation[0], np.float64)
            gt_pts = gt_mesh.sample_points_uniformly(
                self._samples, rng=np.random.default_rng(rng_seed)
            )
            out_pts = out_mesh.sample_points_uniformly(
                self._samples, rng=np.random.default_rng(rng_seed)
            )
            for name, m in self._metrics.items():
                fn = _resolve_metric(m["f"])
                record[name] = float(fn(gt_pts, out_pts, **m.get("kwargs", {})))
        return record

    # -- correctness grids ----------------------------------------------------
    def _correctness_bits(self, record: dict) -> Dict[str, int]:
        """Evaluate every configured threshold combination on one record."""
        bits = {}
        for grid_name, grid in self._correctness.items():
            pos_ts = grid.get("position_thresholds", [None])
            deg_ts = grid.get("degree_thresholds", [None])
            iou_ts = grid.get("iou_3d_thresholds", [None])
            for pos_t in pos_ts:
                for deg_t in deg_ts:
                    for iou_t in iou_ts:
                        ok = not record["failed"]
                        if ok and pos_t is not None:
                            ok = record["position_error"] <= pos_t
                        if ok and deg_t is not None:
                            ok = record["degree_error"] <= deg_t
                        if ok and iou_t is not None:
                            ok = record["iou_3d"] >= iou_t
                        parts = [grid_name]
                        if deg_t is not None:
                            parts.append(f"{deg_t:g}deg")
                        if pos_t is not None:
                            parts.append(f"{100 * pos_t:g}cm")
                        if iou_t is not None:
                            parts.append(f"iou{100 * iou_t:g}")
                        bits["_".join(parts)] = int(ok)
        return bits

    # -- full run -------------------------------------------------------------
    def default_indices(self) -> list:
        indices = list(range(len(self.dataset)))
        num_samples = self.config.get("num_samples")
        if num_samples is not None:
            indices = indices[: int(num_samples)]
        return indices

    def evaluate_indices(self, indices) -> list:
        """Raw scored records for the given dataset indices (no aggregation).

        The multi-host sweep driver passes each process's index shard here
        and merges the record lists before aggregating.
        """
        records = []
        for i in indices:
            sample = self.dataset[i]
            record = self.evaluate_sample(sample)
            if record is None:
                continue
            record["correct"] = self._correctness_bits(record)
            records.append(record)
            print(
                f"[{i}] {record['category']}: "
                f"pos {record['position_error']:.4f} m, "
                f"rot {record['degree_error']:.2f} deg, "
                f"IoU {record['iou_3d']:.3f}"
                + (" (FAILED)" if record["failed"] else "")
            )
        return records

    @classmethod
    def aggregate_records(cls, records) -> dict:
        """Per-category + overall aggregation of raw scored records."""
        per_category = defaultdict(list)
        for record in records:
            per_category[record["category"]].append(record)
        results = {
            cat: cls._aggregate(recs)
            for cat, recs in sorted(per_category.items())
        }
        if records:
            results["all"] = cls._aggregate(records)
        return results

    def run(self) -> dict:
        records = self.evaluate_indices(self.default_indices())
        results = self.aggregate_records(records)
        self._save_results(results)
        return results

    @staticmethod
    def _aggregate(records) -> dict:
        out = {"count": len(records), "failed": sum(r["failed"] for r in records)}
        correctness = defaultdict(list)
        for r in records:
            for name, bit in r["correct"].items():
                correctness[name].append(bit)
        out["correctness"] = {
            name: float(np.mean(bits)) for name, bits in correctness.items()
        }
        # Continuous means average the SUCCESSFUL samples only, so every
        # column averages the same population; failures are reported solely
        # through the ``failed`` count and the correctness fractions (where
        # they count as incorrect, per the NOCS protocol).
        succeeded = [r for r in records if not r["failed"]]
        scalar_names = set()
        for r in succeeded:
            scalar_names.update(
                k
                for k, v in r.items()
                if isinstance(v, float) and np.isfinite(v)
            )
        means = {}
        for name in sorted(scalar_names):
            vals = [
                r[name]
                for r in succeeded
                if isinstance(r.get(name), float) and np.isfinite(r[name])
            ]
            if vals:
                means[name] = float(np.mean(vals))
        out["means"] = means
        return out

    def _save_results(self, results: dict) -> None:
        out_folder = self.config.get("out_folder")
        if not out_folder:
            print(results)
            return
        os.makedirs(out_folder, exist_ok=True)
        run_name = self.config.get("run_name") or "category_eval"
        filename = (
            f"category_eval_{run_name}_"
            f"{datetime.now().strftime('%Y-%m-%d_%H-%M-%S')}.yaml"
        )
        out_path = os.path.join(out_folder, filename)
        save_config_to_file(out_path, {**self.config, "results": results})
        print(f"Results saved to: {out_path}")


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Category-level pose-and-shape evaluation."
    )
    parser.add_argument("--config", nargs="+", required=False)
    config = load_config_from_args(parser)
    CategoryEvaluator(config).run()


if __name__ == "__main__":
    main()
