"""Online synthetic training data: VAE sample -> render -> augment (jitted).

Capability parity with /root/reference/sdfest/initialization/datasets/
generated_dataset.py, re-designed TPU-first: the reference is an
``IterableDataset`` restricted to a single worker because sample generation
needs the GPU renderer (initialization/scripts/train.py:298); here the whole
generator is one jitted, vmapped ``sample_batch(key)`` function (decode,
render, mask/blur augmentations, point lifting all fused into one XLA
program), so data generation runs on-device at batch granularity and shards
trivially over device meshes.

Deviation from the reference: the x-position sampler is symmetric in the
image width (the reference samples ``U(-width/2, height/2)`` pixels,
generated_dataset.py:267, an apparent transcription slip that biases object
positions leftward; we sample ``U(-width/2, width/2)``).
"""
from __future__ import annotations

import functools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sdfest_tpu.ops import pointset, quaternion
from sdfest_tpu.ops.camera import Camera
from sdfest_tpu.ops.so3grid import SO3Grid
from sdfest_tpu.render import render_depth


DEFAULT_CONFIG: Dict[str, Any] = {
    "width": 640,
    "height": 480,
    "fov_deg": 90,
    "render_threshold": 0.004,
    "normalize_pose": None,
    "orientation_repr": "quaternion",
    "orientation_grid_resolution": None,
    "mask_noise": False,
    "mask_noise_min": 0.1,
    "mask_noise_max": 2.0,
    "norm_noise": False,
    "norm_noise_min": -0.2,
    "norm_noise_max": 0.2,
    "scale_to_unit_ball": False,
    "gaussian_noise_probability": 0.0,
    "gaussian_noise_kernel_size": 5,
    "gaussian_noise_kernel_std": 1,
    "num_points": 2500,
    # fraction of the image over which object centers are sampled (1.0 =
    # the reference's full-frame U(-W/2, W/2) x U(-H/2, H/2); <1 keeps the
    # object away from the frame border so close-range recipes don't crop
    # the orientation-bearing geometry out of view)
    "center_frac": 1.0,
    "pointcloud": True,
    "relaxation": 1.0,  # >1: relaxed sphere tracing for generation renders
    "coarse_culling": True,  # hierarchical empty-space culling (pallas)
}


def _gaussian_kernel(std: float, kernel_size: int) -> np.ndarray:
    if kernel_size % 2 != 1:
        raise ValueError("Kernel size should be odd.")
    from scipy.ndimage import gaussian_filter

    impulse = np.zeros((kernel_size, kernel_size))
    impulse[kernel_size // 2, kernel_size // 2] = 1
    return gaussian_filter(impulse, std).astype(np.float32)


def _gaussian_kernel_1d(std: float, kernel_size: int) -> np.ndarray:
    """1D factor of :func:`_gaussian_kernel` (scipy's filter is separable)."""
    if kernel_size % 2 != 1:
        raise ValueError("Kernel size should be odd.")
    from scipy.ndimage import gaussian_filter1d

    impulse = np.zeros(kernel_size)
    impulse[kernel_size // 2] = 1
    return gaussian_filter1d(impulse, std).astype(np.float32)


def _separable_taps(x: jax.Array, weights: np.ndarray, combine) -> jax.Array:
    """Apply a separable 2D stencil via static shifted slices (gather-free).

    Equivalent to a SAME zero-padded 2D convolution with
    ``outer(weights, weights)`` when ``combine`` is weighted-add; the
    correlation direction matches XLA's conv (the Gaussian taps are
    symmetric anyway).  Single-channel (1, 1, H, W) conv_general_dilated
    lowers poorly on TPU; two passes of k static slices are elementwise ops.
    """
    k = len(weights)
    r = k // 2
    h, w = x.shape
    xp = jnp.pad(x, ((r, r), (0, 0)))
    rows = combine(
        [(weights[i], jax.lax.slice(xp, (i, 0), (i + h, w))) for i in range(k)]
    )
    rp = jnp.pad(rows, ((0, 0), (r, r)))
    return combine(
        [(weights[i], jax.lax.slice(rp, (0, i), (h, i + w))) for i in range(k)]
    )


def _weighted_sum(terms):
    out = None
    for w, t in terms:
        out = w * t if out is None else out + w * t
    return out


def _any_tap(terms):
    out = None
    for _, t in terms:
        out = t if out is None else jnp.logical_or(out, t)
    return out


def _affine_warp_mask(mask: jax.Array, key: jax.Array) -> jax.Array:
    """Apply a small random affine transform to a binary mask.

    Matches the reference's ``T.RandomAffine(degrees=(0, 1),
    translate=(0, 0.01), scale=(0.999, 1.001))``: rotation up to 1 degree,
    translation up to 1% of the image size, scale in [0.999, 1.001],
    nearest-neighbor sampling via inverse warping about the image center.
    """
    h, w = mask.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    angle = jax.random.uniform(k1, (), minval=0.0, maxval=1.0) * jnp.pi / 180.0
    tx = jax.random.uniform(k2, (), minval=-0.01, maxval=0.01) * w
    ty = jax.random.uniform(k3, (), minval=-0.01, maxval=0.01) * h
    s = jax.random.uniform(k4, (), minval=0.999, maxval=1.001)
    cos, sin = jnp.cos(angle) * s, jnp.sin(angle) * s
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    # inverse transform (rotate by -angle, unscale, untranslate)
    src_c = (cos * (cols - tx) + sin * (rows - ty)) / (s * s) + cx
    src_r = (-sin * (cols - tx) + cos * (rows - ty)) / (s * s) + cy
    src_ri = jnp.clip(jnp.round(src_r), 0, h - 1).astype(jnp.int32)
    src_ci = jnp.clip(jnp.round(src_c), 0, w - 1).astype(jnp.int32)
    inside = (src_r >= 0) & (src_r <= h - 1) & (src_c >= 0) & (src_c <= w - 1)
    # A per-pixel 2D gather serializes on TPU (~4.6 ms per 640x480 mask);
    # the warp parameters bound the displacement by a few pixels, so fetch
    # via two passes of static shifted slices selected by the per-pixel
    # integer displacement (pure vector ops).  Pass 1 fetches the source
    # ROW at the destination column, pass 2 the source column; relative to
    # the direct gather this evaluates the row index at column c instead
    # of src_c, which differs by at most sin*|src_c - c| <= 0.35 px —
    # an occasional one-pixel rounding difference in a *stochastic mask
    # augmentation* (immaterial; the warp itself is random noise).
    diag = float(np.hypot(cx + 1, cy + 1))
    d_rows = int(np.ceil(0.01746 * diag + 0.01 * h + 0.001 * diag)) + 1
    d_cols = int(np.ceil(0.01746 * diag + 0.01 * w + 0.001 * diag)) + 1
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    d_r = src_ri - rows_i
    d_c = src_ci - cols_i
    mp = jnp.pad(mask, ((d_rows, d_rows), (0, 0)))
    tmp = jnp.zeros_like(mask)
    for dr in range(-d_rows, d_rows + 1):
        shifted = jax.lax.slice(mp, (d_rows + dr, 0), (d_rows + dr + h, w))
        tmp = jnp.where(d_r == dr, shifted, tmp)
    tp = jnp.pad(tmp, ((0, 0), (d_cols, d_cols)))
    warped = jnp.zeros_like(mask)
    for dc in range(-d_cols, d_cols + 1):
        shifted = jax.lax.slice(tp, (0, d_cols + dc), (h, d_cols + dc + w))
        warped = jnp.where(d_c == dc, shifted, warped)
    return jnp.where(inside, warped, False)


class SDFVAEViewDataset:
    """Jitted generator of synthetic pose-estimation training batches.

    Usage::

        dataset = SDFVAEViewDataset(config, vae, vae_params)
        batch = dataset.sample_batch(key, batch_size=32)

    Batch entries: ``depth`` (B, H, W), ``pointset`` (B, N, 3),
    ``pointset_mask`` (B, N) [subsampled valid flags], ``latent_shape``
    (B, L), ``position`` (B, 3), ``orientation`` (B, 4 or B,) depending on
    representation, ``quaternion`` (B, 4), ``scale`` (B,), ``valid`` (B,).
    """

    def __init__(self, config: dict, vae, vae_params) -> None:
        merged = dict(DEFAULT_CONFIG)
        merged.update({k: v for k, v in config.items() if v is not None})
        self.config = merged
        self._vae = vae
        self._vae_params = vae_params
        f = merged["width"] / math.tan(merged["fov_deg"] * math.pi / 180.0 / 2.0) / 2
        self.camera = Camera(
            width=merged["width"],
            height=merged["height"],
            fx=f,
            fy=f,
            cx=merged["width"] / 2,
            cy=merged["height"] / 2,
            pixel_center=0.5,
        )
        self._z_min = merged["z_min"]
        self._z_max = merged["z_max"]
        self._extent_mean = merged["extent_mean"]
        self._extent_std = merged["extent_std"]
        self._orientation_repr = merged["orientation_repr"]
        if self._orientation_repr == "discretized":
            self.grid = SO3Grid(merged["orientation_grid_resolution"])
            # host constant: device-array closures stall jit lowering
            # through the hosted-TPU tunnel (see InitTrainer.grid_quats)
            self._grid_quats = np.asarray(self.grid.quaternions(), np.float32)
        else:
            self.grid = None
        self._kernel = np.asarray(
            _gaussian_kernel(
                merged["gaussian_noise_kernel_std"],
                merged["gaussian_noise_kernel_size"],
            ),
            np.float32,
        )
        self._kernel_1d = _gaussian_kernel_1d(
            merged["gaussian_noise_kernel_std"],
            merged["gaussian_noise_kernel_size"],
        )

    # -- single sample ---------------------------------------------------

    def _sample_one(self, key: jax.Array) -> Dict[str, jax.Array]:
        cfg = self.config
        keys = jax.random.split(key, 12)
        latent = jax.random.normal(
            keys[0], (1, self._vae.latent_size), dtype=jnp.float32
        )
        sdf = self._vae.apply(
            {"params": self._vae_params}, latent, method=self._vae.decode
        )[0, 0]

        z = jax.random.uniform(keys[1], (), minval=self._z_min, maxval=self._z_max, dtype=jnp.float32)
        cf = cfg["center_frac"]
        x_pix = jax.random.uniform(
            keys[2], (), minval=-cf * self.camera.width / 2,
            maxval=cf * self.camera.width / 2, dtype=jnp.float32,
        )
        y_pix = jax.random.uniform(
            keys[3], (), minval=-cf * self.camera.height / 2,
            maxval=cf * self.camera.height / 2, dtype=jnp.float32,
        )
        position = jnp.stack(
            [x_pix / self.camera.fx * z, y_pix / self.camera.fy * z, -z]
        )
        quat = quaternion.random_uniform(keys[4])
        scale = (
            self._extent_mean
            + self._extent_std * jax.random.normal(keys[5], (), dtype=jnp.float32)
        ) / 2.0

        depth = render_depth(
            sdf,
            position,
            quat,
            1.0 / scale,
            camera=self.camera,
            threshold=cfg["render_threshold"],
            relaxation=cfg["relaxation"],
            culling=cfg["coarse_culling"],
        )

        exact_mask = depth != 0
        if cfg["mask_noise"]:
            final_mask = _affine_warp_mask(exact_mask, keys[6])
            fill = jax.random.uniform(
                keys[7],
                (),
                minval=cfg["mask_noise_min"],
                maxval=cfg["mask_noise_max"],
                dtype=jnp.float32,
            )
            depth = jnp.where(exact_mask, depth, fill)
        else:
            final_mask = exact_mask

        if cfg["gaussian_noise_probability"] > 0.0:
            apply_blur = (
                jax.random.uniform(keys[8], ()) < cfg["gaussian_noise_probability"]
            )
            invalid = depth == 0
            blurred = _separable_taps(depth, self._kernel_1d, _weighted_sum)
            touched = _separable_taps(
                invalid, np.ones_like(self._kernel_1d), _any_tap
            )
            depth = jnp.where(apply_blur & ~touched, blurred, depth)

        depth = jnp.where(final_mask, depth, 0.0)

        sample: Dict[str, jax.Array] = {}
        if cfg["pointcloud"]:
            points, valid = pointset.depth_to_pointcloud_dense(depth, self.camera)
            if cfg["normalize_pose"]:
                points, centroid = pointset.normalize_points_masked(points, valid)
                position = position - centroid
                if cfg["norm_noise"]:
                    noise = jax.random.uniform(
                        keys[9],
                        (3,),
                        minval=cfg["norm_noise_min"],
                        maxval=cfg["norm_noise_max"],
                        dtype=jnp.float32,
                    )
                    position = position + noise
                    points = points + noise
                if cfg["scale_to_unit_ball"]:
                    norms = jnp.where(
                        valid, jnp.linalg.norm(points, axis=-1), 0.0
                    )
                    max_distance = jnp.maximum(jnp.max(norms), 1e-9)
                    points = points / max_distance
                    scale = scale / max_distance
            sampled, any_valid = pointset.subsample_masked(
                points, valid, cfg["num_points"], keys[10]
            )
            sample["pointset"] = sampled
        else:
            any_valid = jnp.any(depth != 0)

        sample["depth"] = depth
        sample["latent_shape"] = latent[0]
        sample["position"] = position
        sample["quaternion"] = quat
        sample["orientation"] = self._quat_to_orientation_repr(quat)
        sample["scale"] = scale
        sample["valid"] = any_valid
        return sample

    def _quat_to_orientation_repr(self, quat: jax.Array) -> jax.Array:
        if self._orientation_repr == "quaternion":
            return quat
        elif self._orientation_repr == "discretized":
            from sdfest_tpu.ops.so3grid_jax import quat_to_index

            return quat_to_index(quat, self._resol_static())
        raise NotImplementedError(
            f"Orientation representation {self._orientation_repr} unsupported."
        )

    def _resol_static(self) -> int:
        return self.config["orientation_grid_resolution"]

    # -- batched API -----------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def sample_batch(self, key: jax.Array, batch_size: int) -> Dict[str, jax.Array]:
        """Generate a batch of samples as one fused XLA program.

        Config ``batch_map: sequential`` lowers the batch axis with
        ``lax.map`` (one single-sample program body + a loop) instead of
        ``vmap``: at product raster sizes the vmapped gather-heavy
        subsample made the batch-16 640x480 program's XLA:TPU compile
        exceed 25 minutes through the hosted tunnel (round-4
        docs/training_demo.md §3), while the sequential body compiles
        like the proven single-sample program.  Generation is
        render-bound per SAMPLE, so sequencing costs ~nothing at these
        batch sizes; the default stays ``vmap`` (fastest at small
        rasters).
        """
        keys = jax.random.split(key, batch_size)
        if self.config.get("batch_map") == "sequential":
            return jax.lax.map(self._sample_one, keys)
        return jax.vmap(self._sample_one)(keys)
