"""Tests for datasets: NOCS preprocessing/loading, utils, metrics.

Mirrors the reference test suite (tests/initilization/test_nocs_dataset.py,
test_nocs_utils.py, test_dataset_utils.py, tests/estimation/test_metrics.py)
using the miniature NOCS fixture tree shipped with the reference.
"""
import os
import shutil

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from sdfest_tpu.datasets import nocs_utils
from sdfest_tpu.datasets.dataset_utils import (
    MultiDataLoader,
    ShuffledLoader,
    collate_samples,
)
from sdfest_tpu.pipeline import metrics

NOCS_FIXTURE = "/root/reference/tests/initilization/nocs_data"
HAS_NOCS = os.path.isdir(NOCS_FIXTURE)


# ---------------------------------------------------------------------------
# nocs_utils
# ---------------------------------------------------------------------------


def test_umeyama_recovers_known_transform(rng):
    source = rng.normal(size=(50, 3))
    rotation = Rotation.from_euler("XYZ", [20, -40, 70], degrees=True)
    scale = 1.7
    translation = np.array([0.3, -0.2, 0.8])
    target = scale * rotation.apply(source) + translation
    scales, rot, trans, transform = nocs_utils.umeyama(source, target)
    np.testing.assert_allclose(scales, scale, rtol=1e-6)
    np.testing.assert_allclose(rot, rotation.as_matrix(), atol=1e-8)
    np.testing.assert_allclose(trans, translation, atol=1e-8)
    hom = np.hstack([source, np.ones((50, 1))])
    np.testing.assert_allclose((transform @ hom.T).T[:, :3], target, atol=1e-8)


def test_ransac_robust_to_outliers(rng):
    source = rng.normal(size=(100, 3))
    rotation = Rotation.from_euler("XYZ", [10, 30, -50], degrees=True)
    scale = 0.8
    translation = np.array([-0.1, 0.4, 0.2])
    target = scale * rotation.apply(source) + translation
    # corrupt 20% of correspondences
    target[::5] += rng.normal(size=target[::5].shape) * 5.0
    position, rot, est_scale, transform = (
        nocs_utils.estimate_similarity_transform(
            source, target, rng=np.random.default_rng(0)
        )
    )
    np.testing.assert_allclose(est_scale, scale, rtol=1e-3)
    np.testing.assert_allclose(rot, rotation.as_matrix(), atol=1e-3)
    np.testing.assert_allclose(position, translation, atol=1e-3)


def test_estimate_similarity_transform_too_few_points():
    out = nocs_utils.estimate_similarity_transform(
        np.zeros((3, 3)), np.zeros((3, 3))
    )
    assert out == (None, None, None, None)


# ---------------------------------------------------------------------------
# dataset_utils
# ---------------------------------------------------------------------------


class _ToyDataset:
    def __init__(self, n, points, value):
        self._n = n
        self._points = points
        self._value = value

    def __len__(self):
        return self._n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return {
            "pointset": rng.normal(size=(self._points + i, 3)).astype(np.float32),
            "label": np.float32(self._value),
        }


def test_collate_subsamples_to_smallest():
    samples = [_ToyDataset(4, 100, 0)[i] for i in range(4)]
    batch = collate_samples(samples, rng=np.random.default_rng(0))
    assert batch["pointset"].shape == (4, 100, 3)
    assert batch["label"].shape == (4,)
    batch_capped = collate_samples(samples, max_points=50,
                                   rng=np.random.default_rng(0))
    assert batch_capped["pointset"].shape == (4, 50, 3)


def test_multi_data_loader_sampling_statistics():
    loader_a = ShuffledLoader(_ToyDataset(16, 10, 0), batch_size=2, seed=1)
    loader_b = ShuffledLoader(_ToyDataset(16, 10, 1), batch_size=2, seed=2)
    multi = MultiDataLoader([loader_a, loader_b], [0.8, 0.2], seed=3)
    counts = [0, 0]
    for _ in range(300):
        batch = next(multi)
        counts[int(batch["label"][0])] += 1
    ratio = counts[0] / sum(counts)
    assert 0.7 < ratio < 0.9


# ---------------------------------------------------------------------------
# metrics (hand-computed expectations, as the reference tests)
# ---------------------------------------------------------------------------


def test_chamfer_and_thresholded_metrics():
    points_gt = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    points_rec = np.array([[0.0, 0.1, 0.0], [1.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    acc = metrics.mean_accuracy(points_gt, points_rec)
    np.testing.assert_allclose(acc, (0.1 + 0.0 + 1.0) / 3)
    comp = metrics.mean_completeness(points_gt, points_rec)
    np.testing.assert_allclose(comp, (0.1 + 0.0) / 2)
    chamfer = metrics.symmetric_chamfer(points_gt, points_rec)
    np.testing.assert_allclose(chamfer, (acc + comp) / 2)
    assert metrics.completeness_thresh(points_gt, points_rec, 0.2) == 1.0
    assert metrics.accuracy_thresh(points_gt, points_rec, 0.2) == 2 / 3
    f = metrics.reconstruction_fscore(points_gt, points_rec, 0.2)
    np.testing.assert_allclose(f, 2 / (1 / 1.0 + 1 / (2 / 3)))


def test_extent():
    points = np.array(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.5, 0.2, 0.0], [1.0, 1.0, 1.0]]
    )
    np.testing.assert_allclose(metrics.extent(points), np.sqrt(3))


def test_correct_thresh_position_and_degree():
    r_id = Rotation.identity()
    r_10 = Rotation.from_euler("x", 10, degrees=True)
    assert metrics.correct_thresh(
        np.zeros(3), np.array([0.04, 0, 0]), r_id, r_10,
        position_threshold=0.05, degree_threshold=15.0,
    ) == 1
    assert metrics.correct_thresh(
        np.zeros(3), np.array([0.06, 0, 0]), r_id, r_10,
        position_threshold=0.05,
    ) == 0
    assert metrics.correct_thresh(
        np.zeros(3), np.zeros(3), r_id, r_10, degree_threshold=5.0
    ) == 0
    # symmetry axis: rotation about x is ignored when axis 0 is symmetric
    assert metrics.correct_thresh(
        np.zeros(3), np.zeros(3), r_id,
        Rotation.from_euler("x", 90, degrees=True),
        degree_threshold=5.0, rotational_symmetry_axis=0,
    ) == 1


# ---------------------------------------------------------------------------
# NOCS dataset (reference fixture tree)
# ---------------------------------------------------------------------------


def _create_datasets(tmp_path, category_str=None):
    from sdfest_tpu.datasets.nocs_dataset import NOCSDataset

    shutil.copytree(NOCS_FIXTURE, tmp_path, dirs_exist_ok=True)
    return tuple(
        NOCSDataset(
            {
                "root_dir": str(tmp_path),
                "split": split,
                "category_str": category_str,
            }
        )
        for split in ["camera_train", "camera_val", "real_train", "real_test"]
    )


@pytest.mark.skipif(not HAS_NOCS, reason="NOCS fixture unavailable")
def test_nocs_preprocessing_counts(tmp_path):
    camera_train, camera_val, real_train, real_test = _create_datasets(tmp_path)
    assert len(os.listdir(tmp_path / "sdfest_pre" / "camera_train")) == 5
    assert len(os.listdir(tmp_path / "sdfest_pre" / "camera_val")) == 3
    assert len(os.listdir(tmp_path / "sdfest_pre" / "real_train")) == 6
    # the fixture omits laptop_air_xin_norm.obj, so the laptop instance is
    # skipped with ObjectError (4 pkls + categories.json; the reference
    # test's own expectation of 6 cannot hold under its skip logic)
    assert len(os.listdir(tmp_path / "sdfest_pre" / "real_test")) == 5
    assert len(camera_train) == 4
    assert len(camera_val) == 2
    assert len(real_train) == 5
    assert len(real_test) == 4


@pytest.mark.skipif(not HAS_NOCS, reason="NOCS fixture unavailable")
def test_nocs_category_filtering(tmp_path):
    camera_train, camera_val, real_train, real_test = _create_datasets(
        tmp_path, category_str="mug"
    )
    assert len(camera_train) == 1
    assert len(camera_val) == 0
    assert len(real_train) == 1
    assert len(real_test) == 1


@pytest.mark.skipif(not HAS_NOCS, reason="NOCS fixture unavailable")
def test_nocs_getitem_conventions(tmp_path):
    from sdfest_tpu.ops import quaternion as quat_ops
    import jax.numpy as jnp
    from sdfest_tpu.ops.so3grid import SO3Grid

    datasets = _create_datasets(tmp_path)
    for dataset in datasets:
        sample = dataset[0]
        assert sample["color"].shape == (480, 640, 3)
        assert sample["depth"].shape == (480, 640)
        assert sample["mask"].shape == (480, 640)
        valid_depth_points = int(np.sum(sample["depth"] != 0))
        assert sample["pointset"].shape == (valid_depth_points, 3)

        dataset._mask_pointcloud = True
        dataset._camera_convention = "opencv"
        sample_cv = dataset[0]
        dataset._camera_convention = "opengl"
        sample_gl = dataset[0]
        assert sample_cv["position"][2] > 0
        assert sample_gl["position"][2] < 0

        dataset._scale_convention = "full"
        full_scale = dataset[0]["scale"]
        dataset._scale_convention = "max"
        max_scale = dataset[0]["scale"]
        dataset._scale_convention = "half_max"
        half_max_scale = dataset[0]["scale"]
        dataset._scale_convention = "diagonal"
        diagonal_scale = dataset[0]["scale"]
        assert full_scale.shape == (3,)
        np.testing.assert_allclose(max_scale, np.max(full_scale), rtol=1e-6)
        np.testing.assert_allclose(half_max_scale, 0.5 * max_scale, rtol=1e-6)
        np.testing.assert_allclose(
            diagonal_scale, np.linalg.norm(full_scale), rtol=1e-6
        )

        # axis remapping consistency
        dataset._scale_convention = "full"
        dataset._remap_y_axis = "y"
        dataset._remap_x_axis = "x"
        scales = dataset[0]["scale"]
        orientation_q = dataset[0]["orientation"]
        dataset._remap_y_axis = "x"
        dataset._remap_x_axis = "-y"
        scales_2 = dataset[0]["scale"]
        orientation_q_2 = dataset[0]["orientation"]
        np.testing.assert_allclose(scales[[1, 0, 2]], scales_2, rtol=1e-6)
        test_point = jnp.asarray([0.1, 0.5, 0.7])
        test_point_2 = jnp.asarray([0.5, -0.1, 0.7])
        cam_point = quat_ops.apply(jnp.asarray(orientation_q), test_point)
        cam_point_2 = quat_ops.apply(jnp.asarray(orientation_q_2), test_point_2)
        np.testing.assert_allclose(
            np.asarray(cam_point), np.asarray(cam_point_2), atol=1e-5
        )

        # orientation representations
        dataset._orientation_repr = "quaternion"
        assert dataset[0]["orientation"].shape == (4,)
        dataset._orientation_repr = "discretized"
        dataset._orientation_grid = SO3Grid(3)
        assert np.ndim(dataset[0]["orientation"]) == 0


@pytest.mark.skipif(not HAS_NOCS, reason="NOCS fixture unavailable")
def test_nocs_gts_and_obj_paths(tmp_path):
    camera_train, camera_val, real_train, real_test = _create_datasets(tmp_path)
    gts_path = real_test._get_gts_path(
        os.path.join(str(tmp_path), "real_test", "scene_1", "0000_color.png")
    )
    assert os.path.isfile(gts_path)
    gts_path = camera_val._get_gts_path(
        os.path.join(str(tmp_path), "val", "00000", "0000_color.png")
    )
    assert os.path.isfile(gts_path)
    assert os.path.isfile(
        camera_train._get_obj_path(
            [0, 0, "02876657", "ab6792cddc7c4c83afbf338b16b43f53"]
        )
    )
    assert os.path.isfile(
        real_test._get_obj_path([0, 0, "bowl_white_small_norm"])
    )


def test_box_iou_3d_exact_and_symmetric():
    """Oriented-box 3D IoU: analytic cases + NOCS symmetry maximization."""
    from scipy.spatial.transform import Rotation

    from sdfest_tpu.pipeline import metrics

    identity = Rotation.identity()
    e = np.array([1.0, 1.0, 1.0])
    assert metrics.box_iou_3d(e, np.zeros(3), identity, e, np.zeros(3),
                              identity) == pytest.approx(1.0)
    # half-extent shift: inter 0.5, union 1.5
    assert metrics.box_iou_3d(
        e, np.zeros(3), identity, e, np.array([0.5, 0, 0]), identity
    ) == pytest.approx(1.0 / 3.0)
    assert metrics.box_iou_3d(
        e, np.zeros(3), identity, e, np.array([2.0, 0, 0]), identity
    ) == 0.0
    # unit cube vs itself rotated 45 deg about z: octagonal prism
    # intersection, volume 2*(sqrt(2)-1) -> IoU = inter / (2 - inter)
    r45 = Rotation.from_euler("z", 45, degrees=True)
    inter = 2.0 * (np.sqrt(2.0) - 1.0)
    assert metrics.box_iou_3d(
        e, np.zeros(3), identity, e, np.zeros(3), r45
    ) == pytest.approx(inter / (2.0 - inter), abs=1e-6)

    # correct_thresh integration: z-symmetric box forgives z-rotations
    elongated = np.array([1.0, 1.0, 2.0])
    assert metrics.correct_thresh(
        np.zeros(3), np.zeros(3), identity,
        Rotation.from_euler("z", 90, degrees=True),
        extent_gt=elongated, extent_prediction=elongated,
        iou_3d_threshold=0.99, rotational_symmetry_axis=2,
    ) == 1
    assert metrics.correct_thresh(
        np.zeros(3), np.zeros(3), identity,
        Rotation.from_euler("x", 90, degrees=True),
        extent_gt=elongated, extent_prediction=elongated,
        iou_3d_threshold=0.9,
    ) == 0


def test_separable_taps_match_conv():
    """Shift-based blur/touched stencils == 2D conv (SAME zero padding)."""
    import jax
    import jax.numpy as jnp
    from sdfest_tpu.datasets.generated import (
        _any_tap,
        _gaussian_kernel,
        _gaussian_kernel_1d,
        _separable_taps,
        _weighted_sum,
    )

    rng = np.random.RandomState(3)
    depth = jnp.asarray(
        np.where(rng.rand(48, 64) > 0.5, rng.rand(48, 64) + 0.5, 0.0).astype(
            np.float32
        )
    )
    k2 = jnp.asarray(_gaussian_kernel(1, 5))
    blur_conv = jax.lax.conv_general_dilated(
        depth[None, None].astype(jnp.float32), k2[None, None], (1, 1), "SAME"
    )[0, 0]
    blur_sep = _separable_taps(depth, _gaussian_kernel_1d(1, 5), _weighted_sum)
    np.testing.assert_allclose(
        np.asarray(blur_sep), np.asarray(blur_conv), atol=1e-5
    )
    invalid = depth == 0
    touched_conv = (
        jax.lax.conv_general_dilated(
            invalid.astype(jnp.float32)[None, None],
            jnp.ones((5, 5), jnp.float32)[None, None],
            (1, 1),
            "SAME",
        )[0, 0]
        > 0
    )
    touched_sep = _separable_taps(invalid, np.ones(5, np.float32), _any_tap)
    assert bool(jnp.all(touched_conv == touched_sep))


def test_affine_warp_mask_close_to_gather_reference():
    """Shift-select warp == direct-gather warp up to rare row rounding."""
    import jax
    import jax.numpy as jnp
    from sdfest_tpu.datasets.generated import _affine_warp_mask

    rng = np.random.RandomState(4)
    # blob-like mask (disk), the realistic case
    yy, xx = np.mgrid[0:96, 0:128]
    mask = jnp.asarray((yy - 48) ** 2 + (xx - 64) ** 2 < 30**2)
    for i in range(5):
        warped = _affine_warp_mask(mask, jax.random.PRNGKey(i))
        # the warp is tiny: overlap with the unwarped mask stays high and
        # area is approximately preserved
        inter = float(jnp.sum(warped & mask))
        area = float(jnp.sum(mask))
        assert inter / area > 0.95
        assert abs(float(jnp.sum(warped)) - area) / area < 0.05


def test_subsample_masked_uniform_and_valid():
    """Inverse-CDF subsampling picks only valid rows, roughly uniformly."""
    import jax
    import jax.numpy as jnp
    from sdfest_tpu.ops.pointset import subsample_masked

    m = 5000
    rng = np.random.RandomState(5)
    points = jnp.asarray(rng.randn(m, 3).astype(np.float32))
    mask = jnp.asarray(rng.rand(m) > 0.7)
    pts, any_valid = subsample_masked(points, mask, 400, jax.random.PRNGKey(0))
    assert bool(any_valid)
    valid_rows = {tuple(r) for r in np.asarray(points[mask])}
    assert all(tuple(r) in valid_rows for r in np.asarray(pts))
    # frequency spread over many draws ~ uniform (loose band)
    counts = np.zeros(m)
    idx_of = {tuple(r): i for i, r in enumerate(np.asarray(points))}
    for i in range(30):
        pts, _ = subsample_masked(points, mask, 400, jax.random.PRNGKey(i))
        for r in np.asarray(pts):
            counts[idx_of[tuple(r)]] += 1
    picked = counts[np.asarray(mask)]
    assert picked.mean() > 0  # every draw valid-only
    # no valid point should dominate: max frequency within ~6x of mean
    assert picked.max() <= 6 * max(picked.mean(), 1)
    # no-valid-points edge: any_valid False
    _, none_valid = subsample_masked(
        points, jnp.zeros(m, bool), 16, jax.random.PRNGKey(1)
    )
    assert not bool(none_valid)


# ---------------------------------------------------------------------------
# AnnotatedRedwoodDataset: GT-mesh z-buffer mask against analytic silhouette
# ---------------------------------------------------------------------------


def _make_redwood_fixture(tmp_path, occlude=False):
    """Tiny Redwood tree: one mug sequence, one cube annotation frame."""
    import json

    from PIL import Image

    from sdfest_tpu.pipeline.synthetic import save_obj

    half = 0.1
    dist = 0.6
    ann_dir = tmp_path / "ann"
    ann_dir.mkdir()
    v = np.array(
        [[x, y, z] for x in (-half, half) for y in (-half, half)
         for z in (-half, half)]
    )
    f = np.array(
        [
            [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
            [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
            [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
        ]
    )
    save_obj(str(ann_dir / "seq1.obj"), v, f)
    with open(ann_dir / "annotations.json", "w") as fh:
        json.dump(
            {
                "seq1": {
                    "category": "mug",
                    "scale": [half, half, half],
                    "mesh": "seq1.obj",
                    "pose_anns": [
                        {
                            "position": [0.0, 0.0, dist],
                            "orientation": [0.0, 0.0, 0.0, 1.0],
                            "rgb_file": "f.png",
                            "depth_file": "f.png",
                        }
                    ],
                }
            },
            fh,
        )
    rgb_dir = tmp_path / "root" / "mug" / "rgbd" / "seq1" / "rgb"
    depth_dir = tmp_path / "root" / "mug" / "rgbd" / "seq1" / "depth"
    rgb_dir.mkdir(parents=True)
    depth_dir.mkdir()
    Image.fromarray(np.zeros((480, 640, 3), np.uint8)).save(rgb_dir / "f.png")
    depth_mm = np.full((480, 640), 550, np.uint16)  # on-surface-ish depth
    if occlude:
        depth_mm[200:280, 200:280] = 300  # clearly in front of the mesh
    Image.fromarray(depth_mm).save(depth_dir / "f.png")
    return tmp_path / "root", ann_dir, half, dist


def test_redwood_mask_matches_analytic_silhouette(tmp_path):
    from sdfest_tpu.datasets.redwood_dataset import AnnotatedRedwoodDataset

    root_dir, ann_dir, half, dist = _make_redwood_fixture(tmp_path)
    ds = AnnotatedRedwoodDataset(
        {"root_dir": str(root_dir), "ann_dir": str(ann_dir)}
    )
    assert len(ds) == 1
    sample = ds[0]
    mask = sample["mask"]
    # head-on cube: silhouette is the front-face projection, a square of
    # half-width fx * half / (dist - half) pixels around the principal point
    fx, cx, cy = 525.0, 319.5, 239.5
    half_px = fx * half / (dist - half)
    expected = np.zeros((480, 640), bool)
    ys, xs = np.mgrid[0:480, 0:640]
    expected[(np.abs(xs - cx) <= half_px) & (np.abs(ys - cy) <= half_px)] = True
    # areas agree within 2% and disagreement is confined to the 2px border
    assert abs(mask.sum() - expected.sum()) / expected.sum() < 0.02
    disagree = mask != expected
    border = (
        (np.abs(np.abs(xs - cx) - half_px) < 2.5)
        | (np.abs(np.abs(ys - cy) - half_px) < 2.5)
    )
    assert not np.any(disagree & ~border)
    # half_max scale convention on [half]*3 extents
    assert np.isclose(sample["scale"], half)


def test_redwood_mask_removes_occluded_pixels(tmp_path):
    from sdfest_tpu.datasets.redwood_dataset import AnnotatedRedwoodDataset

    root_dir, ann_dir, half, dist = _make_redwood_fixture(tmp_path, occlude=True)
    ds = AnnotatedRedwoodDataset(
        {"root_dir": str(root_dir), "ann_dir": str(ann_dir)}
    )
    mask = ds[0]["mask"]
    # occluder strip (depth 0.3 m < mesh front 0.5 m) is excluded ...
    assert not mask[200:280, 200:280].any()
    # ... while unoccluded silhouette pixels survive (silhouette spans
    # columns ~215-424 at the image center row)
    assert mask[239, 300:320].all()
