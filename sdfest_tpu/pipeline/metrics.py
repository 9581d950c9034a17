"""Evaluation metrics for pose and shape estimation (host-side numpy/scipy).

Capability parity with /root/reference/sdfest/estimation/metrics.py.  These
run in the evaluation path (outside the jitted hot loop), so KD-trees and
convex hulls stay on the host as in the reference.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.spatial
from scipy.spatial.transform import Rotation


def correct_thresh(
    position_gt: np.ndarray,
    position_prediction: np.ndarray,
    orientation_gt: Rotation,
    orientation_prediction: Rotation,
    extent_gt: Optional[np.ndarray] = None,
    extent_prediction: Optional[np.ndarray] = None,
    points_gt: Optional[np.ndarray] = None,
    points_prediction: Optional[np.ndarray] = None,
    position_threshold: Optional[float] = None,
    degree_threshold: Optional[float] = None,
    iou_3d_threshold: Optional[float] = None,
    fscore_threshold: Optional[float] = None,
    rotational_symmetry_axis: Optional[int] = None,
) -> int:
    """Classify a pose/shape prediction as correct (1) or incorrect (0).

    A prediction is correct when every *provided* threshold is satisfied:
    position error (meters), orientation error (degrees, optionally ignoring
    rotation about ``rotational_symmetry_axis``), and reconstruction F-score
    at 1cm.  3D IoU follows the reference in being unimplemented.
    """
    if position_threshold is not None:
        if np.linalg.norm(position_gt - position_prediction) > position_threshold:
            return 0
    if degree_threshold is not None:
        rad_threshold = np.deg2rad(degree_threshold)
        if rotational_symmetry_axis is not None:
            axis = np.zeros(3)
            axis[rotational_symmetry_axis] = 1.0
            p1 = orientation_gt.apply(axis)
            p2 = orientation_prediction.apply(axis)
            rad_error = np.arccos(np.clip(p1 @ p2, -1.0, 1.0))
        else:
            rad_error = (orientation_gt * orientation_prediction.inv()).magnitude()
        if rad_error > rad_threshold:
            return 0
    if iou_3d_threshold is not None:
        raise NotImplementedError("3D IoU is not implemented yet.")
    if fscore_threshold is not None:
        fscore = reconstruction_fscore(points_gt, points_prediction, 0.01)
        if fscore < fscore_threshold:
            return 0
    return 1


def mean_accuracy(
    points_gt: np.ndarray,
    points_rec: np.ndarray,
    p_norm: int = 2,
    normalize: bool = False,
) -> float:
    """Mean distance from reconstructed points to closest ground-truth point."""
    d, _ = scipy.spatial.KDTree(points_gt).query(points_rec, p=p_norm)
    return float(np.mean(d) / extent(points_gt)) if normalize else float(np.mean(d))


def mean_completeness(
    points_gt: np.ndarray,
    points_rec: np.ndarray,
    p_norm: int = 2,
    normalize: bool = False,
) -> float:
    """Mean distance from ground-truth points to closest reconstructed point."""
    d, _ = scipy.spatial.KDTree(points_rec).query(points_gt, p=p_norm)
    return float(np.mean(d) / extent(points_gt)) if normalize else float(np.mean(d))


def symmetric_chamfer(
    points_gt: np.ndarray,
    points_rec: np.ndarray,
    p_norm: int = 2,
    normalize: bool = False,
) -> float:
    """Arithmetic mean of accuracy and completeness (symmetric chamfer)."""
    return (
        mean_completeness(points_gt, points_rec, p_norm=p_norm, normalize=normalize)
        + mean_accuracy(points_gt, points_rec, p_norm=p_norm, normalize=normalize)
    ) / 2


def completeness_thresh(
    points_gt: np.ndarray,
    points_rec: np.ndarray,
    threshold: float,
    p_norm: int = 2,
    normalize: bool = False,
) -> float:
    """Ratio of ground-truth points within ``threshold`` of a reconstruction point."""
    d, _ = scipy.spatial.KDTree(points_rec).query(points_gt, p=p_norm)
    if normalize:
        d = d / extent(points_gt)
    return float(np.sum(d < threshold) / points_gt.shape[0])


def accuracy_thresh(
    points_gt: np.ndarray,
    points_rec: np.ndarray,
    threshold: float,
    p_norm: int = 2,
    normalize: bool = False,
) -> float:
    """Ratio of reconstructed points within ``threshold`` of a ground-truth point."""
    d, _ = scipy.spatial.KDTree(points_gt).query(points_rec, p=p_norm)
    if normalize:
        d = d / extent(points_gt)
    return float(np.sum(d < threshold) / points_rec.shape[0])


def reconstruction_fscore(
    points_gt: np.ndarray,
    points_rec: np.ndarray,
    threshold: float,
    p_norm: int = 2,
    normalize: bool = False,
) -> float:
    """Harmonic mean of thresholded accuracy (precision) and completeness (recall)."""
    recall = completeness_thresh(
        points_gt, points_rec, threshold, p_norm=p_norm, normalize=normalize
    )
    precision = accuracy_thresh(
        points_gt, points_rec, threshold, p_norm=p_norm, normalize=normalize
    )
    if recall < 1e-7 or precision < 1e-7:
        return 0.0
    return 2.0 / (1.0 / recall + 1.0 / precision)


def extent(points: np.ndarray) -> float:
    """Largest Euclidean distance between any two points of the set."""
    try:
        hull = scipy.spatial.ConvexHull(points)
        candidates = points[hull.vertices]
    except Exception:
        candidates = points
    return float(
        np.max(scipy.spatial.distance_matrix(candidates, candidates))
    )
