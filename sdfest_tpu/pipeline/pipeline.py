"""SDF pose and shape estimation pipeline (init -> jitted refinement).

Capability parity with /root/reference/sdfest/estimation/simple_setup.py,
re-architected TPU-first: where the reference runs a Python loop launching
one CUDA render per view per iteration (simple_setup.py:408-570), here the
entire render-and-compare refinement is a single XLA program — ``lax.scan``
over optimization steps, a scan over views inside the loss, optax Adam with
per-variable learning rates, quaternion renormalization and best-inlier-ratio
tracking inside the loop carry.  The full step log ("flight recorder",
cf. simple_setup.py:598-607) is produced as scan outputs, so observability
survives fusion.

Hypothesis-parallelism (a capability upgrade over the single-estimate
reference) is exposed via :meth:`SDFPipeline.refine_batch` — a ``vmap`` of
the same program over independent initial states, which also shards cleanly
over TPU device meshes (see :mod:`sdfest_tpu.parallel`).
"""
from __future__ import annotations

import functools
import pickle
import time
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sdfest_tpu.models.pose_net import create_pose_net
from sdfest_tpu.models.vae import create_vae_from_config
from sdfest_tpu.ops import pointset, quaternion
from sdfest_tpu.ops.camera import Camera
from sdfest_tpu.ops.so3grid import SO3Grid
from sdfest_tpu.pipeline import losses
from sdfest_tpu.utils import weights as weight_utils


class NoDepthError(ValueError):
    """Raised when no valid depth data remains after preprocessing."""


def _adjust_categorical_posterior(
    posterior: jax.Array,
    prior: Optional[jax.Array],
    train_prior: Optional[jax.Array],
) -> jax.Array:
    """Re-weight a categorical posterior computed under a different prior."""
    if prior is None:
        return posterior
    adjusted = posterior * prior
    if train_prior is not None:
        adjusted = adjusted / train_prior
    return adjusted / jnp.sum(adjusted, axis=-1, keepdims=True)


def _roi_offset_for(depth: jax.Array, roi: Tuple[int, int]) -> jax.Array:
    """Top-left (row, col) of an (Hr, Wr) ROI centered on observed pixels.

    Clamped into the frame; traced-safe (argmax-based bbox).  An all-empty
    view yields offset (0, 0), which is harmless (its depth loss compares
    an empty crop, exactly as the full frame would).
    """
    h, w = depth.shape
    rows = jnp.any(depth > 0, axis=1)
    cols = jnp.any(depth > 0, axis=0)
    rmin = jnp.argmax(rows)
    rmax = h - 1 - jnp.argmax(rows[::-1])
    cmin = jnp.argmax(cols)
    cmax = w - 1 - jnp.argmax(cols[::-1])
    oy = jnp.clip((rmin + rmax + 1 - roi[0]) // 2, 0, h - roi[0])
    ox = jnp.clip((cmin + cmax + 1 - roi[1]) // 2, 0, w - roi[1])
    return jnp.stack([oy, ox]).astype(jnp.int32)


def _normalize_multires(
    multires: Optional[Union[Tuple[int, int], List[Tuple[int, int]]]],
) -> List[Tuple[int, int]]:
    """Multires schedule as a (possibly empty) list of (factor, iters).

    Accepts the historical single-level tuple, a multi-level list
    (coarsest first), or None (no coarse phase).
    """
    if multires is None:
        return []
    if isinstance(multires, tuple) and len(multires) == 2 and not isinstance(
        multires[0], (tuple, list)
    ):
        return [multires]
    return list(multires)


class SDFPipeline:
    """SDF pose, scale and shape estimation from depth images."""

    def __init__(self, config: dict) -> None:
        """Load networks and compile-ready functions from a config dict.

        The config schema matches the reference
        (estimation/configs/default.yaml + models/*.yaml): ``camera``,
        ``init`` (network architecture + weights), ``vae`` (architecture +
        weights), ``threshold``, ``max_iterations``, loss weights,
        ``result_selection_strategy``, ``far_field``, ``init_view``,
        ``mean_shape``.
        """
        self.config = config
        self.init_config = config["init"]
        self.vae_config = config.get("vae", self.init_config.get("vae"))
        self.camera = Camera(**config["camera"])
        self.result_selection_strategy = config.get(
            "result_selection_strategy", "last_iteration"
        )
        self._relative_inlier_threshold = config.get("relative_inlier_threshold", 0.03)
        self._far_field = config.get("far_field", None)
        self._num_input_points = config.get("num_input_points", 2500)
        self.resolution = self.vae_config.get("sdf_size", 64)

        self.vae = create_vae_from_config(self.vae_config)
        self.vae_params = weight_utils.load_vae_params(
            self.vae_config, self.vae, self.resolution
        )

        self.init_network = create_pose_net(
            self.init_config, shape_dimension=self.vae_config["latent_size"]
        )
        self.init_variables = weight_utils.load_init_variables(
            self.init_config, self.init_network, self._num_input_points
        )

        self.orientation_repr = self.init_config["head"]["orientation_repr"]
        if self.orientation_repr == "discretized":
            grid = SO3Grid(self.init_config["head"]["orientation_grid_resolution"])
            self._grid_quats = jnp.asarray(grid.quaternions(), dtype=jnp.float32)
        else:
            self._grid_quats = None

        self.log_data = []

    # ------------------------------------------------------------------
    # jitted building blocks
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0,))
    def _decode(self, latent: jax.Array) -> jax.Array:
        return self._decode_inline(latent)

    def render(
        self,
        sdf: jax.Array,
        position: jax.Array,
        orientation: jax.Array,
        inv_scale: jax.Array,
    ) -> jax.Array:
        """Render a depth image with the pipeline's camera (differentiable)."""
        from sdfest_tpu.render import render_depth

        return render_depth(
            sdf,
            position,
            orientation,
            inv_scale,
            camera=self.camera,
            threshold=self.config["threshold"],
            backend=self.config.get("renderer_backend", "auto"),
            relaxation=self.config.get("relaxation", 1.0),
            culling=self.config.get("coarse_culling", True),
            bf16=self.config.get("bf16_march", False),
            adaptive=self.config.get("adaptive_relaxation", True),
        )

    @functools.partial(jax.jit, static_argnums=(0,))
    def _preprocess_depth(
        self, depth_images: jax.Array, masks: jax.Array
    ) -> jax.Array:
        """Mask depth and cut the far field (pure version of the reference)."""
        depth = jnp.where(masks != 0, depth_images, 0.0)
        if self._far_field is not None:
            depth = jnp.where(depth > self._far_field, 0.0, depth)
        return depth

    @functools.partial(jax.jit, static_argnums=(0,))
    def _nn_init_single(
        self,
        depth_image: jax.Array,
        key: jax.Array,
    ):
        """Single-view initialization network forward pass (jitted).

        Returns (latent, position_cam, scale, orientation_raw, any_valid)
        in the CAMERA frame (the world transform happens in
        :meth:`_nn_init`).  ``orientation_raw`` is the
        representation-specific output (normalized quaternion or logits).
        """
        points, valid = pointset.depth_to_pointcloud_dense(depth_image, self.camera)
        centroid = jnp.zeros(3, dtype=points.dtype)
        if self.init_config.get("normalize_pose", True):
            points, centroid = pointset.normalize_points_masked(points, valid)
        sampled, any_valid = pointset.subsample_masked(
            points, valid, self._num_input_points, key
        )
        latent, position, scale, orientation = self.init_network.apply(
            self.init_variables, sampled[None], train=False
        )
        if self.config.get("mean_shape", False):
            latent = jnp.zeros_like(latent)
        position = position + centroid[None]
        return latent, position, scale, orientation, any_valid

    @functools.partial(jax.jit, static_argnums=(0,))
    def _nn_init_views(
        self,
        depth_images: jax.Array,
        camera_positions: jax.Array,
        camera_orientations: jax.Array,
        key: jax.Array,
        prior_orientation_distribution: Optional[jax.Array] = None,
        training_orientation_distribution: Optional[jax.Array] = None,
    ):
        """Fully traced multi-view initialization: vmap over views + traced
        "first"/"best" selection.

        Replaces the reference's per-view Python loop
        (/root/reference/sdfest/estimation/simple_setup.py:718-842, which also
        calls CPU healpy per view) with ONE XLA program: every view's
        PointNet forward, posterior adjustment, camera->world transform, and
        the argmax selection over per-view posterior maxima are traced, so
        the init path costs a single device round-trip (the validity scalar)
        and batches/shards like the rest of the pipeline.

        Returns ``(latent, position, scale, orientation, ok)`` for the
        selected view; ``ok`` is the strategy-appropriate validity scalar
        ("first": view 0 has valid depth; "best": every view does — matching
        the reference loop, which visits all views and raises on any empty
        one).
        """
        n_views = depth_images.shape[0]
        init_view = self.config.get("init_view", "first")
        keys = jax.random.split(key, n_views)
        # lax.map (sequential scan), NOT vmap: view-batching the per-point
        # MLP produces a rank-3 (V, points, C) program whose point-axis max
        # fusion hits an XLA:TPU compiler CHECK (fusion_util.cc
        # TransformWindow "Loop will not make progress", observed at V=3
        # with dense=True backbones), while the V=1 program compiles on
        # every backbone.  Views number a handful and the forward is ~ms,
        # so sequencing costs nothing and keeps the compiled program the
        # proven single-view shape.
        latent, position, scale, orientation, any_valid = jax.lax.map(
            lambda dk: self._nn_init_single(dk[0], dk[1]),
            (depth_images, keys),
        )
        if self.orientation_repr == "discretized":
            posterior = jax.nn.softmax(orientation, axis=-1)  # (V, 1, C)
            prior = prior_orientation_distribution
            if prior is not None:
                prior = prior[:, None, :]  # align with the (V, 1, C) posterior
            posterior = _adjust_categorical_posterior(
                posterior, prior, training_orientation_distribution
            )
            orientation_camera = self._grid_quats[
                jnp.argmax(posterior, axis=-1)
            ]  # (V, 1, 4)
            maxima = jnp.max(posterior, axis=(-2, -1))  # (V,)
        else:  # quaternion (validated by the caller)
            orientation_camera = orientation
            maxima = jnp.ones((n_views,), orientation.dtype)
        # camera -> world frame, all views at once
        position_world = (
            jax.vmap(quaternion.apply)(camera_orientations, position)
            + camera_positions[:, None, :]
        )
        orientation_world = jax.vmap(quaternion.multiply)(
            camera_orientations[:, None, :], orientation_camera
        )
        if init_view == "first":
            idx = 0
            ok = any_valid[0]
        else:  # "best" (validated by the caller)
            idx = jnp.argmax(maxima)
            ok = jnp.all(any_valid)
        take = lambda x: x[idx]
        return (
            take(latent),
            take(position_world),
            take(scale),
            take(orientation_world),
            ok,
        )

    def _nn_init(
        self,
        depth_images: jax.Array,
        camera_positions: jax.Array,
        camera_orientations: jax.Array,
        key: jax.Array,
        prior_orientation_distribution: Optional[jax.Array] = None,
        training_orientation_distribution: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """Initialization over views with "first"/"best" selection strategy.

        Thin host wrapper over the jitted :meth:`_nn_init_views`: validates
        static options, then performs the ONE blocking sync of the init path
        (the validity scalar -> :class:`NoDepthError`).
        """
        self._validate_init_options(prior_orientation_distribution)
        latent, position, scale, orientation, ok = self._nn_init_views(
            depth_images,
            camera_positions,
            camera_orientations,
            key,
            prior_orientation_distribution,
            training_orientation_distribution,
        )
        if not bool(ok):
            raise NoDepthError
        return latent, position, scale, orientation

    def _validate_init_options(self, prior_orientation_distribution) -> None:
        """Static init-option validation shared by the legacy and fused
        call paths (the reference validates in its setup ctor,
        simple_setup.py:213-260)."""
        if (
            prior_orientation_distribution is not None
            and self.orientation_repr != "discretized"
        ):
            raise ValueError(
                "prior_orientation_distribution only supported for discretized "
                "orientation representation."
            )
        if self.orientation_repr not in ("discretized", "quaternion"):
            raise NotImplementedError(
                f"Orientation representation {self.orientation_repr} unsupported."
            )
        init_view = self.config.get("init_view", "first")
        if init_view == "best":
            if self.orientation_repr != "discretized":
                raise NotImplementedError(
                    '"best" init strategy requires discretized orientations'
                )
        elif init_view != "first":
            raise NotImplementedError(
                'Only "first" and "best" init strategies are supported'
            )

    def _make_optimizer(self) -> optax.GradientTransformation:
        lrs = {
            "position": self.config.get("position_lr", 1e-3),
            "orientation": self.config.get("orientation_lr", 1e-2),
            "scale": self.config.get("scale_lr", 1e-3),
            "latent": self.config.get("latent_lr", 1e-2),
        }
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.multi_transform(
                {k: optax.scale(-v) for k, v in lrs.items()},
                param_labels={k: k for k in lrs},
            ),
        )

    @functools.partial(jax.jit, static_argnums=(0, 7, 9, 10, 11, 12, 15))
    def _refine(
        self,
        state: Dict[str, jax.Array],
        depth_images: jax.Array,  # (V, H, W) (strided when ds_factor > 1)
        points: jax.Array,  # (V, H*W, 3)
        point_masks: jax.Array,  # (V, H*W)
        camera_positions: jax.Array,  # (V, 3)
        camera_orientations: jax.Array,  # (V, 4)
        shape_optimization: bool = True,
        point_constraint: Optional[Tuple[jax.Array, jax.Array, float]] = None,
        roi: Optional[Tuple[int, int]] = None,
        ds_factor: int = 1,
        num_iterations: Optional[int] = None,
        allow_early_stop: bool = True,
        opt_state=None,
        best: Optional[Dict[str, jax.Array]] = None,
        return_full: bool = False,
    ):
        """Jitted iterative refinement: one XLA program for the full loop.

        With ``roi=(Hr, Wr)`` the depth loss renders only a per-view crop
        centered on the observed pixels (the crop of a full render,
        exactly — see :func:`sdfest_tpu.render.render_depth`).  The
        optimization problem is EXACTLY unchanged: the depth L1 and the
        inlier ratio reduce over both-valid / observed pixels, all of
        which lie inside the ROI (``__call__`` falls back to full-frame
        when the observed bbox would not fit), and the pc loss samples
        observed points.  What shrinks is every raster-sized cost around
        the already object-proportional march — OBB prologue, loss and
        cotangent rasters, backward tiling transposes — plus memory.

        With ``ds_factor=f > 1`` the refinement runs against the STRIDED
        sub-observation: ``depth_images``/``points`` must already be the
        ``[::f, ::f]`` slices of the full-frame inputs lifted with
        ``self.camera.strided(f)`` (see :meth:`Camera.strided`: the
        strided camera's rays are mathematically identical to every f-th
        full-camera ray, so this is the same optimization problem
        restricted to a pixel subset — not a blurred approximation).
        Used by the coarse phase of coarse-to-fine refinement
        (``multires_factor``/``multires_iterations`` config keys): active
        march tiles scale with the object's projected area, so a coarse
        iteration costs roughly ``1/f^2`` of a full one while the pose is
        still far from converged.  ``num_iterations`` overrides the
        config ``max_iterations`` (each phase runs its own scan length).

        ``opt_state`` / ``best`` allow chaining scan segments WITHOUT
        resetting Adam or the best-inlier tracker (chunked batched early
        stopping, :meth:`refine_batch`); ``return_full=True`` additionally
        returns the final optimizer state: ``(state, opt_state, best,
        log)``.  Chaining segments this way is bit-identical to one long
        scan (pinned by ``test_refine_chunked_equals_full``).
        """
        # standardize on float32 (the TPU-native compute dtype)
        to_f32 = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32), t
        )
        state, depth_images, points, camera_positions, camera_orientations = map(
            to_f32,
            (state, depth_images, points, camera_positions, camera_orientations),
        )
        optimizer = self._make_optimizer()
        if opt_state is None:
            opt_state = optimizer.init(state)
        depth_weight = self.config.get("depth_weight", 1.0)
        pc_weight = self.config.get("pc_weight", 1.0)
        # nn_weight is accepted for config-schema parity only: the
        # reference's nn loss is dead code (loss_nn = 0 with the computation
        # commented out, simple_setup.py:151-161), so any weight multiplies
        # zero there.  Reject nonzero values instead of silently differing.
        if self.config.get("nn_weight", 0.0) != 0.0:
            raise ValueError(
                "nn_weight != 0 is unsupported: the reference's nn loss is "
                "disabled dead code (loss_nn = 0, simple_setup.py:151-161); "
                "the key exists for config compatibility only."
            )
        max_iterations = (
            num_iterations if num_iterations is not None
            else self.config["max_iterations"]
        )
        use_warm = self._use_temporal_coherence()
        refresh_k = int(self.config.get("temporal_refresh_interval", 8))
        if use_warm and refresh_k < 1:
            raise ValueError(
                f"temporal_refresh_interval must be >= 1, got {refresh_k}"
            )
        n_views = depth_images.shape[0]
        cam = self.camera if ds_factor == 1 else self.camera.strided(ds_factor)
        # zero-sized warm state when disabled (nothing rides the scan carry)
        hw = (cam.height, cam.width) if use_warm else (0, 0)
        if roi is not None and use_warm:
            raise ValueError("roi refinement and temporal_coherence are "
                             "mutually exclusive")
        if ds_factor != 1 and use_warm:
            raise ValueError("multires refinement and temporal_coherence "
                             "are mutually exclusive")
        if roi is not None:
            offsets = jax.vmap(lambda d: _roi_offset_for(d, roi))(
                depth_images
            )
            depth_rois = jax.vmap(
                lambda d, o: jax.lax.dynamic_slice(d, (o[0], o[1]), roi)
            )(depth_images, offsets)
            # re-lift the pc clouds from the crops (ROI-sized query rasters
            # for the fused sample/scatter kernels).  Every VALID point is
            # an observed pixel, and the ROI covers all observed pixels, so
            # the pc loss is exactly unchanged (masked mean over the same
            # valid set).
            points, point_masks = jax.vmap(
                lambda d, o: pointset.depth_to_pointcloud_dense(
                    d, cam, order="tile", pixel_offset=o
                )
            )(depth_rois, offsets)
        else:
            offsets = jnp.zeros((n_views, 2), jnp.int32)
            depth_rois = depth_images

        def view_losses(latent_sdf, position, orientation, scale, view,
                        view_warm, motion, full_refresh):
            depth_input, pts, pts_mask, cam_pos, cam_quat, roi_off = view
            q_w2c = quaternion.invert(cam_quat)
            position_c = quaternion.apply(q_w2c, position - cam_pos)
            orientation_c = quaternion.multiply(q_w2c, orientation)
            if use_warm:
                depth_estimate, view_warm = self._render_warm(
                    latent_sdf, position_c, orientation_c, scale,
                    view_warm, motion, full_refresh,
                )
                loss_pc = losses.masked_pc_loss(
                    pts, pts_mask, position_c, orientation_c, scale,
                    latent_sdf,
                )
            else:
                # fused render + pc sampling: ONE backward (one sample-grad
                # + one scatter kernel) for both loss terms on pallas
                from sdfest_tpu.render import render_depth_with_pc_values

                depth_estimate, pc_values = render_depth_with_pc_values(
                    latent_sdf, position_c, orientation_c, scale,
                    pts, pts_mask,
                    camera=cam,
                    threshold=self.config["threshold"],
                    backend=self.config.get("renderer_backend", "auto"),
                    relaxation=self.config.get("relaxation", 1.0),
                    culling=self.config.get("coarse_culling", True),
                    bf16=self.config.get("bf16_march", False),
                    adaptive=self.config.get("adaptive_relaxation", True),
                    roi=roi,
                    roi_offset=roi_off,
                )
                loss_pc = losses.masked_mean_abs(pc_values, pts_mask)
            loss_depth = losses.depth_l1_loss(depth_input, depth_estimate)
            return loss_depth, loss_pc, depth_estimate, view_warm

        def loss_fn(state, warm, iteration):
            norm_orientation = state["orientation"] / jnp.sqrt(
                jnp.sum(state["orientation"] ** 2)
            )
            latent = state["latent"]
            if not shape_optimization:
                latent = jax.lax.stop_gradient(latent)
            sdf = self._decode_inline(latent)[0, 0]
            if use_warm:
                from sdfest_tpu.render.warm import motion_bound

                motion = motion_bound(
                    state["position"][0], norm_orientation[0],
                    state["scale"][0], sdf, warm["shared"],
                )
                full_refresh = iteration % refresh_k == 0
            else:
                motion = jnp.zeros(())
                full_refresh = jnp.asarray(True)

            def scan_view(carry, view_and_warm):
                loss_depth, loss_pc = carry
                view, view_warm = view_and_warm
                ld, lp, depth_estimate, new_view_warm = view_losses(
                    sdf,
                    state["position"][0],
                    norm_orientation[0],
                    state["scale"][0],
                    view,
                    view_warm,
                    motion,
                    full_refresh,
                )
                return (loss_depth + ld, loss_pc + lp), (
                    depth_estimate, new_view_warm
                )

            (loss_depth, loss_pc), (depth_estimates, new_view_warms) = (
                jax.lax.scan(
                    scan_view,
                    (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
                    (
                        (
                            depth_rois,
                            points,
                            point_masks,
                            camera_positions,
                            camera_orientations,
                            offsets,
                        ),
                        warm["views"],
                    ),
                )
            )
            loss = depth_weight * loss_depth + pc_weight * loss_pc
            if point_constraint is not None:
                source, target, weight = point_constraint
                loss = loss + weight * losses.point_constraint_loss(
                    state["orientation"][0], source, target
                )
            if use_warm:
                new_warm = {
                    "views": new_view_warms,
                    "shared": jax.lax.stop_gradient({
                        "position": state["position"][0],
                        "orientation": norm_orientation[0],
                        "scale": state["scale"][0],
                        "sdf": sdf,
                    }),
                }
            else:
                # warm state is dead when disabled: pass it through instead
                # of copying the decoded sdf into the carry every iteration
                new_warm = warm
            aux = {
                "loss_depth": loss_depth,
                "loss_pc": loss_pc,
                "last_depth_estimate": depth_estimates[-1],
                "warm": jax.lax.stop_gradient(new_warm),
            }
            return loss, aux

        def do_step(state, opt_state, best, warm, iteration):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state, warm, iteration
            )
            warm = aux["warm"]
            updates, opt_state = optimizer.update(grads, opt_state)
            state = optax.apply_updates(state, updates)
            # renormalize the quaternion outside the gradient path
            state = dict(
                state,
                orientation=state["orientation"]
                / jnp.sqrt(jnp.sum(state["orientation"] ** 2)),
            )
            # best-estimate tracking: inlier ratio of the pre-step render vs
            # post-step parameters (matches the reference's update ordering,
            # simple_setup.py:461-470)
            ratio = losses.inlier_ratio(
                depth_rois[-1],
                aux["last_depth_estimate"],
                self._relative_inlier_threshold,
            ).astype(jnp.float32)
            is_better = ratio > best["inlier_ratio"]
            best = {
                "inlier_ratio": jnp.where(is_better, ratio, best["inlier_ratio"]),
                **{
                    k: jnp.where(is_better, state[k], best[k])
                    for k in ("position", "orientation", "scale", "latent")
                },
            }
            log = {
                "loss": loss,
                "loss_depth": aux["loss_depth"],
                "loss_pc": aux["loss_pc"],
                "inlier_ratio": ratio,
                "position": state["position"],
                "orientation": state["orientation"],
                "scale": state["scale"],
                "latent": state["latent"],
            }
            return state, opt_state, best, warm, log

        # early stop (opt-in, ``early_stop_delta`` > 0): every
        # ``early_stop_interval`` iterations, compare the loss against the
        # previous checkpoint; if the relative improvement falls below the
        # delta, FREEZE the remaining iterations — each subsequent scan step
        # takes the cheap cond branch (no render, no backward) and re-logs
        # the last row, so the program keeps its fixed shape and the log its
        # fixed length (``log["active"]`` records which iterations worked).
        # The reference runs a fixed budget; this is the production upgrade
        # for easy instances where 50-150 iterations are 2x more than
        # convergence needs.  UNBATCHED refinement only: under vmap
        # (refine_batch) the per-hypothesis cond lowers to a select that
        # executes BOTH branches, so the freeze would save nothing —
        # batched callers pass allow_early_stop=False.
        early_delta = (
            float(self.config.get("early_stop_delta", 0.0) or 0.0)
            if allow_early_stop else 0.0
        )
        early_interval = int(self.config.get("early_stop_interval", 10))
        if early_delta > 0.0 and early_interval < 1:
            raise ValueError(
                f"early_stop_interval must be >= 1, got {early_interval}"
            )

        if early_delta > 0.0:

            def step(carry, iteration):
                state, opt_state, best, warm, ref_loss, done, last_log = carry
                state, opt_state, best, warm, log = jax.lax.cond(
                    done,
                    lambda s, o, b, w, _: (s, o, b, w, last_log),
                    do_step,
                    state, opt_state, best, warm, iteration,
                )
                log_out = dict(log, active=1.0 - done.astype(jnp.float32))
                is_check = (iteration + 1) % early_interval == 0
                # absolute floor so a zero-loss plateau (perfect fit, or an
                # empty overlap) still counts as converged: with ref == 0
                # the relative test `ref - loss >= delta * |ref|` would
                # read 0 >= 0 as "improved" forever
                improved = (
                    ref_loss - log["loss"]
                ) >= early_delta * jnp.maximum(jnp.abs(ref_loss), 1e-8)
                done = jnp.logical_or(
                    done, jnp.logical_and(is_check, ~improved)
                )
                ref_loss = jnp.where(is_check, log["loss"], ref_loss)
                return (state, opt_state, best, warm, ref_loss, done,
                        log), log_out
        else:

            def step(carry, iteration):
                state, opt_state, best, warm = carry[:4]
                state, opt_state, best, warm, log = do_step(
                    state, opt_state, best, warm, iteration
                )
                log = dict(log, active=jnp.asarray(1.0, jnp.float32))
                return (state, opt_state, best, warm), log

        if best is not None:
            best0 = to_f32(best)
        else:
            best0 = {
                "inlier_ratio": jnp.asarray(-1.0, dtype=jnp.float32),
                **{
                    k: state[k]
                    for k in ("position", "orientation", "scale", "latent")
                },
            }
        from sdfest_tpu.render.warm import init_warm_views

        warm0 = {
            "views": init_warm_views(n_views, *hw),
            "shared": {
                "position": state["position"][0],
                "orientation": state["orientation"][0]
                / jnp.sqrt(jnp.sum(state["orientation"][0] ** 2)),
                "scale": state["scale"][0],
                "sdf": jnp.zeros((self.resolution,) * 3, jnp.float32),
            },
        }
        carry0 = (state, opt_state, best0, warm0)
        if early_delta > 0.0:
            zf = jnp.zeros((), jnp.float32)
            last_log0 = {
                "loss": zf,
                "loss_depth": zf,
                "loss_pc": zf,
                "inlier_ratio": zf,
                "position": state["position"],
                "orientation": state["orientation"],
                "scale": state["scale"],
                "latent": state["latent"],
            }
            carry0 = carry0 + (
                jnp.asarray(1e30, jnp.float32),  # ref_loss: first check wins
                jnp.asarray(False),
                last_log0,
            )
        out_carry, log = jax.lax.scan(
            step, carry0, jnp.arange(max_iterations)
        )
        if return_full:
            return out_carry[0], out_carry[1], out_carry[2], log
        return out_carry[0], out_carry[2], log

    def _roi_for(
        self, depth_images, factor: int = 1
    ) -> Optional[Tuple[int, int]]:
        """Resolve the refinement ROI for these (concrete) inputs.

        Config ``roi_size: [Hr, Wr]`` opts in.  Falls back to full-frame
        (returns None) when the observed bbox of any view plus
        ``roi_margin`` (default 48 px, headroom for the estimate to wander
        during refinement) does not fit the configured ROI, when the ROI
        does not fit the frame, or when temporal coherence is on.  Decided
        host-side on concrete values so the jitted program count stays at
        two variants per config.

        With ``factor > 1`` this resolves the COARSE-phase ROI of a
        multires schedule: ``depth_images`` are the strided observations
        and frame dims, configured ROI size and wander margin all scale by
        ``1/factor`` (the estimate wanders the same metric distance, which
        is ``factor`` x fewer coarse pixels).  Composing both cuts the
        coarse phase's raster-proportional costs the same way the fine
        ROI does — the crop render is still exactly a crop of the strided
        render, so the optimization problem is unchanged.
        """
        d = np.asarray(depth_images > 0)
        spans = []
        for v in range(d.shape[0]):
            ys, xs = np.nonzero(d[v])
            if ys.size == 0:
                continue
            spans.append((ys.max() - ys.min() + 1, xs.max() - xs.min() + 1))
        return self._roi_from_spans(spans, factor)

    def _roi_from_spans(
        self, spans, factor: int = 1
    ) -> Optional[Tuple[int, int]]:
        """ROI policy on precomputed per-view bbox spans ``(sy, sx)``.

        The decision core of :meth:`_roi_for`, shared with the fused
        single-dispatch path (:meth:`_probe` computes the spans on-device
        so the whole call needs only one tiny host read).  ``spans`` holds
        one entry per view WITH observed pixels; empty views never
        constrain the fit (matching :meth:`_roi_for`, which skips them).
        """
        roi_cfg = self.config.get("roi_size")
        if not roi_cfg or self._use_temporal_coherence():
            return None
        h = self.camera.height // factor
        w = self.camera.width // factor
        margin = -(-int(self.config.get("roi_margin", 48)) // factor)
        # ceil to the march tile: a non-16-multiple ROI would silently
        # knock render_depth off the fused pallas path (full-frame render
        # + crop every iteration — slower than no ROI at all)
        align = lambda x: max(16, -(-int(x) // 16) * 16)
        if roi_cfg == "auto":
            # fixed menu of quarter/half-frame crops, smallest fitting one
            # wins — candidates are static, so the compiled program count
            # stays bounded by the menu size
            candidates = [
                (align(h / 4), align(w / 4)),
                (align(h / 2), align(w / 2)),
            ]
        else:
            candidates = [
                (align(roi_cfg[0] / factor), align(roi_cfg[1] / factor))
            ]
        for rh, rw in candidates:
            if rh > h or rw > w:
                continue
            if all(sy + 2 * margin <= rh and sx + 2 * margin <= rw
                   for sy, sx in spans):
                return (rh, rw)
        return None

    def _multires_inputs(self, depth_images: jax.Array, factor: int):
        """Strided coarse-phase inputs for coarse-to-fine refinement.

        Returns ``(depth_coarse, points, point_masks)`` — the exact
        ``[::f, ::f]`` sub-observation lifted with ``camera.strided(f)``
        (shared by ``__call__`` and ``refine_batch``).
        """
        cam_coarse = self.camera.strided(factor)
        depth_coarse = depth_images[:, ::factor, ::factor]
        points_c, point_masks_c = jax.vmap(
            lambda d: pointset.depth_to_pointcloud_dense(
                d, cam_coarse, order="tile"
            )
        )(depth_coarse)
        return depth_coarse, points_c, point_masks_c

    def _multires_for(
        self,
    ) -> Optional[Union[Tuple[int, int], List[Tuple[int, int]]]]:
        """Resolve the coarse-to-fine schedule.

        Config ``multires_factor: f`` (int > 1) + ``multires_iterations: n``
        (int > 0) opt in to a single coarse level — returned as the tuple
        ``(factor, coarse_iters)``.  ``multires_factor`` may also be a LIST
        of strides (coarsest first, e.g. ``[4, 2]``), each level running
        against its own exactly-strided sub-observation before the
        full-resolution finish; then ``multires_iterations`` is a matching
        list or ``auto``, and the schedule is returned as a list of
        ``(factor, iters)`` tuples (measured on v5e-1: the ``[4, 2]``
        auto schedule runs ~1.5x the two-phase production rate at equal
        budget and convergence; NOTES.md round-3).

        ``auto`` split policy: 60% of the budget at the single coarse
        level, or 80% split evenly across a multi-level schedule (the
        bench's 20/20/10 shape at 50 iterations).

        Falls back to single-phase (returns None) — or drops the affected
        level of a multi-level schedule — when the stride does not divide
        the raster, when the strided raster would knock the pallas backend
        off its tiled fast path (H/f or W/f not a multiple of the march
        tile) without an ROI policy to re-align it, when temporal coherence
        is on, or when the camera has skew.  Every level composes with the
        ROI policy: the fine phase uses ``_roi_for(depth)`` and each coarse
        level ``_roi_for(depth_coarse, factor)`` (sizes and margin scaled
        by the stride).
        """
        f_cfg = self.config.get("multires_factor", 1) or 1
        n_cfg = self.config.get("multires_iterations", 0)
        is_schedule = isinstance(f_cfg, (list, tuple))
        factors = [int(f) for f in (f_cfg if is_schedule else [f_cfg])]
        if self._use_temporal_coherence() or self.camera.s != 0.0:
            return None
        max_iterations = int(self.config["max_iterations"])
        if n_cfg == "auto":
            if is_schedule:
                n_levels = max(len(factors), 1)
                iters = [
                    (max_iterations * 4) // (5 * n_levels)
                ] * n_levels
            else:
                # 60% of the budget at coarse: the estimate is far from
                # converged for most of the trajectory, and the remaining
                # 40% at full resolution is ample polish (bench schedule)
                iters = [(max_iterations * 3) // 5]
        elif isinstance(n_cfg, (list, tuple)):
            if not is_schedule or len(n_cfg) != len(factors):
                raise ValueError(
                    "multires_iterations list must match multires_factor "
                    f"({n_cfg} vs {f_cfg})"
                )
            iters = [int(n) for n in n_cfg]
        else:
            if is_schedule:
                raise ValueError(
                    "multires_factor is a schedule; multires_iterations "
                    "must be a matching list or 'auto'"
                )
            iters = [int(n_cfg or 0)]
        if is_schedule and sum(iters) > max_iterations - 1:
            raise ValueError(
                "multires schedule must leave at least one full-resolution "
                f"iteration (sum {sum(iters)} >= {max_iterations})"
            )

        h, w = self.camera.height, self.camera.width
        levels = []
        for factor, n in zip(factors, iters):
            if factor <= 1 or n <= 0:
                continue
            if h % factor or w % factor:
                continue
            if self._strided_needs_roi(factor) and not self.config.get(
                "roi_size"
            ):
                # an unaligned strided raster stays on the kernel path only
                # via a TILE-aligned refinement window; without the ROI
                # policy the level would silently fall to the XLA march
                continue
            levels.append((factor, n))
        if not levels:
            return None
        if not is_schedule:
            # single-level config keeps the historical tuple form; the
            # final phase always runs at full resolution
            factor, n = levels[0]
            n = min(n, max_iterations - 1)
            return (factor, n) if n > 0 else None
        return levels

    def _strided_needs_roi(self, factor: int) -> bool:
        """Whether the ``factor``-strided raster is off the kernel's tiled
        full-frame path (so the coarse phase must render an aligned ROI)."""
        from sdfest_tpu.render import resolve_backend
        from sdfest_tpu.render.pallas_kernel import TILE

        if resolve_backend(
            self.config.get("renderer_backend", "auto")
        ) != "pallas":
            return False
        h, w = self.camera.height, self.camera.width
        return bool((h // factor) % TILE or (w // factor) % TILE)

    def _coarse_phase(self, depth_images: jax.Array, factor: int):
        """Per-call coarse-phase inputs ``(depth, points, masks, roi)``.

        Returns None when the phase is not viable for THESE inputs: the
        strided raster is unaligned (kernel ROI required) and the observed
        object does not fit any aligned ROI candidate — running the coarse
        phase through the XLA fallback march would cost far more than it
        saves, so the caller skips straight to the full-resolution phase.
        """
        depth_coarse, points_c, point_masks_c = self._multires_inputs(
            depth_images, factor
        )
        roi_c = self._roi_for(depth_coarse, factor)
        if roi_c is None and self._strided_needs_roi(factor):
            return None
        return depth_coarse, points_c, point_masks_c, roi_c

    @functools.partial(jax.jit, static_argnums=(0,))
    def _probe(self, depth_images: jax.Array, masks: jax.Array):
        """Tiny pre-flight program for the fused single-dispatch call.

        Returns ``(per_view_valid (V,), spans (V, 2) int32)`` of the
        preprocessed observation: everything the host needs to (a) raise
        :class:`NoDepthError` exactly like the legacy path and (b) resolve
        the static execution plan (ROI sizes, viable multires levels) —
        in ONE small device round trip instead of one per phase.
        """
        depth = self._preprocess_depth(depth_images, masks)
        d = depth > 0
        per_view_valid = jnp.any(d, axis=(1, 2))

        def span(b):  # (V, N) occupancy -> (V,) bbox span
            n = b.shape[1]
            idx = jnp.arange(n)
            mx = jnp.max(jnp.where(b, idx, -1), axis=1)
            mn = jnp.min(jnp.where(b, idx, n), axis=1)
            return jnp.maximum(mx - mn + 1, 0).astype(jnp.int32)

        spans = jnp.stack(
            [span(jnp.any(d, axis=2)), span(jnp.any(d, axis=1))], axis=-1
        )
        return per_view_valid, spans

    def _plan_for(self, spans) -> Tuple:
        """Static execution plan from the probe's bbox spans.

        ``spans``: per-view ``(sy, sx)`` tuples for views with observed
        pixels.  Returns ``(levels, fine_roi, fine_iters)`` with ``levels``
        a tuple of ``(factor, n_iters, roi_or_None)`` — hashable, so it
        keys the fused program's compilation cache.  Mirrors the legacy
        per-phase gating exactly, except the strided span is the analytic
        upper bound ``(s - 1) // f + 1`` (the strided bbox can be one
        pixel tighter depending on alignment; the bound only ever falls
        back to a LARGER crop, never misses the object).
        """
        levels = []
        executed = 0
        for factor, n_iters in _normalize_multires(self._multires_for()):
            spans_c = [
                ((sy - 1) // factor + 1, (sx - 1) // factor + 1)
                for sy, sx in spans
            ]
            roi_c = self._roi_from_spans(spans_c, factor)
            if roi_c is None and self._strided_needs_roi(factor):
                continue
            levels.append((factor, n_iters, roi_c))
            executed += n_iters
        fine_roi = self._roi_from_spans(spans, 1)
        fine_iters = (
            int(self.config["max_iterations"]) - executed if executed
            else None
        )
        return tuple(levels), fine_roi, fine_iters

    @functools.partial(jax.jit, static_argnums=(0, 8, 9))
    def _fused_program(
        self,
        depth_images: jax.Array,
        masks: jax.Array,
        camera_positions: jax.Array,
        camera_orientations: jax.Array,
        key: jax.Array,
        priors,  # (prior_orientation_distribution, training_orientation_distribution)
        point_constraint,
        plan: Tuple,
        shape_optimization: bool,
    ):
        """The WHOLE estimate as one XLA program (fused single-dispatch).

        Preprocess -> init network (all views) -> every refinement phase
        (multires levels, ROI fine finish, early stop) traced back to
        back, so a full :meth:`__call__` costs exactly two dispatches (the
        :meth:`_probe` pre-flight and this) regardless of the schedule —
        on a high-latency link (the reference protocol's per-object wall,
        real_data.py:286-319) the dispatch overhead no longer scales with
        the phase count.  The per-phase building blocks are the SAME
        jitted methods the legacy path runs (jit-of-jit inlines), so the
        trajectory is identical up to XLA fusion-order rounding.
        """
        prior, training_prior = priors
        depth = self._preprocess_depth(depth_images, masks)
        latent, position, scale, orientation, _ = self._nn_init_views(
            depth, camera_positions, camera_orientations, key,
            prior, training_prior,
        )
        state = {
            "position": position,
            "orientation": orientation,
            "scale": scale,
            "latent": latent,
        }
        levels, fine_roi, fine_iters = plan
        coarse_logs = []
        for factor, n_iters, roi_c in levels:
            depth_c, points_c, point_masks_c = self._multires_inputs(
                depth, factor
            )
            state, _, lg = self._refine(
                state, depth_c, points_c, point_masks_c,
                camera_positions, camera_orientations,
                shape_optimization, point_constraint, roi_c, factor,
                n_iters,
            )
            coarse_logs.append(lg)
        n_views = depth.shape[0]
        if fine_roi is None:
            points, point_masks = jax.vmap(
                lambda d: pointset.depth_to_pointcloud_dense(
                    d, self.camera, order="tile"
                )
            )(depth)
        else:
            points = jnp.zeros((n_views, 1, 3), jnp.float32)
            point_masks = jnp.zeros((n_views, 1), jnp.float32)
        state, best, log = self._refine(
            state, depth, points, point_masks,
            camera_positions, camera_orientations,
            shape_optimization, point_constraint, fine_roi, 1, fine_iters,
        )
        if coarse_logs:
            log = {
                k: jnp.concatenate([lg[k] for lg in coarse_logs] + [log[k]])
                for k in log
            }
        return state, best, log, depth

    def _use_temporal_coherence(self) -> bool:
        """Whether refinement renders can use warm-started marching."""
        from sdfest_tpu.render import resolve_backend
        from sdfest_tpu.render.pallas_kernel import RES, TILE

        return bool(
            self.config.get("temporal_coherence", False)
            and resolve_backend(self.config.get("renderer_backend", "auto"))
            == "pallas"
            and self.config.get("relaxation", 1.0) <= 1.0
            and self.config.get("coarse_culling", True)
            and self.resolution == RES
            and self.camera.height % TILE == 0
            and self.camera.width % TILE == 0
        )

    def _render_warm(
        self,
        latent_sdf: jax.Array,
        position_c: jax.Array,
        orientation_c: jax.Array,
        scale: jax.Array,
        view_warm: Dict[str, jax.Array],
        motion: jax.Array,
        full_refresh: jax.Array,
    ):
        """One temporally-coherent refinement render of a view.

        See :mod:`sdfest_tpu.render.warm` for the reuse rules and their
        soundness argument.
        """
        from sdfest_tpu.render.warm import warm_render_step

        return warm_render_step(
            latent_sdf,
            position_c,
            orientation_c,
            scale,
            view_warm,
            motion,
            full_refresh,
            camera=self.camera,
            threshold=self.config["threshold"],
        )

    def _decode_inline(self, latent: jax.Array) -> jax.Array:
        """Decode without the jit wrapper (for use inside traced code)."""
        return self.vae.apply(
            {"params": self.vae_params}, latent, method=self.vae.decode
        )

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def __call__(
        self,
        depth_images: jax.Array,
        masks: jax.Array,
        color_images: Optional[jax.Array] = None,
        visualize: bool = False,
        camera_positions: Optional[jax.Array] = None,
        camera_orientations: Optional[jax.Array] = None,
        log_path: Optional[str] = None,
        animation_path: Optional[str] = None,
        animation_mode: str = "depth",
        shape_optimization: bool = True,
        point_constraint: Optional[Tuple] = None,
        prior_orientation_distribution: Optional[jax.Array] = None,
        training_orientation_distribution: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """Infer pose, scale and latent shape from depth images and masks.

        Args:
            depth_images: Depth along the camera z-axis, shape (V, H, W) or
                (H, W); masked and far-field-cut internally.
            masks: Binary object masks, same shape.
            color_images: Unused (kept for API parity; visualization only).
            camera_positions: (V, 3) world positions of the cameras (0 if None).
            camera_orientations: (V, 4) world orientations (identity if None).
            log_path: Write a pickled step log ("flight recorder") here.
            animation_path: Export an mp4 of the optimization here
                (counterpart of the reference's in-loop frame dumps,
                simple_setup.py:870-975; frames are re-rendered from the
                step log after the fused loop, which the scan program makes
                exact).
            animation_mode: "depth" | "error" | "mesh" frame contents.
            shape_optimization: Optimize the latent shape during refinement.
            point_constraint: Optional (source, target, weight) orientation
                constraint.
            prior_orientation_distribution: Optional (V, C) prior over SO(3)
                grid cells (discretized heads only).
            training_orientation_distribution: (C,) training prior.
            key: PRNG key for point subsampling (deterministic default).
        Returns:
            Tuple (position (1,3), orientation (1,4), scale (1,),
            latent_shape (1, L)) in the world frame.
        """
        start_time = time.time()
        if depth_images.ndim == 2:
            depth_images = depth_images[None]
            masks = masks[None]
            if camera_positions is not None:
                camera_positions = camera_positions[None]
            if camera_orientations is not None:
                camera_orientations = camera_orientations[None]
            if prior_orientation_distribution is not None:
                prior_orientation_distribution = prior_orientation_distribution[None]
        n_views = depth_images.shape[0]
        if camera_positions is None:
            camera_positions = jnp.zeros((n_views, 3))
        if camera_orientations is None:
            camera_orientations = jnp.tile(
                jnp.asarray([0.0, 0.0, 0.0, 1.0]), (n_views, 1)
            )
        if key is None:
            key = jax.random.PRNGKey(0)

        if bool(self.config.get("fused_call", True)):
            # FUSED single-dispatch path (default): one tiny pre-flight
            # program resolves validity + the static plan, then init and
            # every refinement phase run as ONE XLA program — two device
            # round trips per call total, however many phases the
            # schedule has (the legacy path below pays one per phase,
            # which dominates the per-object wall on high-latency links).
            self._validate_init_options(prior_orientation_distribution)
            # reuse_plan: true drops the pre-flight too on tracked
            # sequences (frame-to-frame the plan is stable), reaching ONE
            # dispatch per call.  Documented trade: without the probe an
            # all-empty observation cannot raise NoDepthError up front —
            # the caller owns mask validity (e.g. a detector/tracker).
            plan = None
            if bool(self.config.get("reuse_plan", False)):
                plan = getattr(self, "_cached_plan", None)
            if plan is None:
                per_view_valid, spans_dev = self._probe(
                    jnp.asarray(depth_images, dtype=jnp.float32),
                    jnp.asarray(masks),
                )
                per_view_valid, spans_np = jax.device_get(
                    (per_view_valid, spans_dev)
                )  # the call's ONE blocking host sync
                init_view = self.config.get("init_view", "first")
                ok = (
                    bool(per_view_valid[0]) if init_view == "first"
                    else bool(per_view_valid.all())
                )
                if not ok:
                    raise NoDepthError
                spans = [
                    (int(sy), int(sx))
                    for (sy, sx), v in zip(spans_np, per_view_valid) if v
                ]
                plan = self._plan_for(spans)
                self._cached_plan = plan
            state, best, log, depth_images = self._fused_program(
                jnp.asarray(depth_images, dtype=jnp.float32),
                jnp.asarray(masks),
                camera_positions,
                camera_orientations,
                key,
                (prior_orientation_distribution,
                 training_orientation_distribution),
                point_constraint,
                plan,
                shape_optimization,
            )
            boundaries = []
            executed = 0
            for _, n_iters, _ in plan[0]:
                executed += n_iters
                boundaries.append(executed)
        else:
            depth_images = self._preprocess_depth(
                jnp.asarray(depth_images, dtype=jnp.float32),
                jnp.asarray(masks),
            )
            if not bool(jnp.any(depth_images > 0)):
                raise NoDepthError

            latent, position, scale, orientation = self._nn_init(
                depth_images,
                camera_positions,
                camera_orientations,
                key,
                prior_orientation_distribution,
                training_orientation_distribution,
            )

            # lift all views to dense point clouds once (pc loss inputs).
            # Tile order keeps the Pallas pc-loss sampler on its windowed
            # fast path; the loss is an order-invariant mean.  With an
            # active ROI the refinement re-lifts from the crops and
            # ignores these, so skip the full-raster lift (placeholders
            # keep the _refine signature).
            roi = self._roi_for(depth_images)
            if roi is None:
                points, point_masks = jax.vmap(
                    lambda d: pointset.depth_to_pointcloud_dense(
                        d, self.camera, order="tile"
                    )
                )(depth_images)
            else:
                points = jnp.zeros((n_views, 1, 3), jnp.float32)
                point_masks = jnp.zeros((n_views, 1), jnp.float32)

            state = {
                "position": position,
                "orientation": orientation,
                "scale": scale,
                "latent": latent,
            }
            # coarse-to-fine: run the first iterations against strided
            # sub-observations (identical rays, ~1/f^2 the active march
            # tiles per level), then finish at full resolution.
            # Best-inlier tracking runs over the fine phase only
            # (coarse-raster inlier ratios are not comparable with
            # full-raster ones); each level hands over via the running
            # state.
            coarse_logs = []
            boundaries = []
            executed = 0
            for factor, n_iters in _normalize_multires(self._multires_for()):
                # each coarse level composes with a (stride-scaled) ROI as
                # well: its raster-proportional costs shrink the same way
                # the fine phase's do, and the crop render is still
                # exactly a crop of the strided render
                phase = self._coarse_phase(depth_images, factor)
                if phase is None:
                    # level not viable for THESE inputs (object does not
                    # fit an aligned ROI): its budget folds into the
                    # remaining phases
                    continue
                depth_coarse, points_c, point_masks_c, roi_c = phase
                state, _, lg = self._refine(
                    state,
                    depth_coarse,
                    points_c,
                    point_masks_c,
                    camera_positions,
                    camera_orientations,
                    shape_optimization,
                    point_constraint,
                    roi_c,
                    factor,
                    n_iters,
                )
                coarse_logs.append(lg)
                executed += n_iters
                boundaries.append(executed)
            fine_iters = (
                int(self.config["max_iterations"]) - executed
                if executed else None
            )
            state, best, log = self._refine(
                state,
                depth_images,
                points,
                point_masks,
                camera_positions,
                camera_orientations,
                shape_optimization,
                point_constraint,
                roi,
                1,
                fine_iters,
            )
            if coarse_logs:
                log = {
                    k: jnp.concatenate([lg[k] for lg in coarse_logs] + [log[k]])
                    for k in log
                }

        if log_path is not None or animation_path is not None:
            log_np = {k: np.asarray(v) for k, v in log.items()}
            log_np["timestamp"] = time.time() - start_time
            # preprocessed inputs travel with the log so playback can
            # reproduce error images / input overlays without the dataset
            log_np["depth_input"] = np.asarray(depth_images)
            if executed:
                # iterations before this index ran on strided coarse
                # observations (their losses reduce over fewer pixels);
                # ``multires_boundaries`` gives every level->level handover
                log_np["multires_boundary"] = executed
                log_np["multires_boundaries"] = boundaries
            data = {"config": _plain_config(self.config), "log": log_np}
            if log_path is not None:
                with open(log_path, "wb") as f:
                    pickle.dump(data, f)
            if animation_path is not None:
                from sdfest_tpu.scripts.play_log import export_animation

                export_animation(
                    data, animation_path, mode=animation_mode,
                    pipeline=self,
                )

        if self.result_selection_strategy == "last_iteration":
            chosen = state
        elif self.result_selection_strategy == "best_inlier_ratio":
            chosen = best
        else:
            raise ValueError(
                f"Result selection strategy {self.result_selection_strategy} "
                "is not supported."
            )

        if visualize:
            # visualize the estimate the caller actually receives (under
            # best_inlier_ratio that may differ from the final state)
            self._visualize_optimization(chosen, depth_images, log)
        return (
            chosen["position"],
            chosen["orientation"],
            chosen["scale"],
            chosen["latent"],
        )

    def _visualize_optimization(
        self, state: Dict[str, jax.Array], depth_images: jax.Array, log
    ) -> None:
        """Save a figure of the optimization (headless counterpart of the
        reference's live matplotlib view, simple_setup.py:386-568):
        input depth, final estimated depth, depth error, and the loss /
        inlier-ratio trajectories.

        Written to ``visualization_<timestamp>.png`` in the working
        directory (override with config key ``visualization_path``).
        """
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        sdf = self._decode(state["latent"])[0, 0]
        est = self.render(
            sdf,
            state["position"][0],
            state["orientation"][0],
            1.0 / state["scale"][0],
        )
        inp = np.asarray(depth_images[-1])
        est = np.asarray(est)
        fig, axes = plt.subplots(2, 2, figsize=(10, 8))
        im0 = axes[0, 0].imshow(inp)
        axes[0, 0].set_title("input depth")
        fig.colorbar(im0, ax=axes[0, 0])
        im1 = axes[0, 1].imshow(est)
        axes[0, 1].set_title("estimated depth")
        fig.colorbar(im1, ax=axes[0, 1])
        both = (inp > 0) & (est > 0)
        im2 = axes[1, 0].imshow(np.where(both, np.abs(inp - est), np.nan))
        axes[1, 0].set_title("abs depth error (overlap)")
        fig.colorbar(im2, ax=axes[1, 0])
        axes[1, 1].plot(np.asarray(log["loss"]), label="loss")
        axes[1, 1].plot(np.asarray(log["inlier_ratio"]), label="inlier ratio")
        axes[1, 1].set_xlabel("iteration")
        axes[1, 1].legend()
        axes[1, 1].set_yscale("log")
        fig.tight_layout()
        path = self.config.get(
            "visualization_path", f"visualization_{int(time.time())}.png"
        )
        fig.savefig(path)
        plt.close(fig)

    def refine_batch(
        self,
        states: Dict[str, jax.Array],
        depth_images: jax.Array,
        points: jax.Array,
        point_masks: jax.Array,
        camera_positions: jax.Array,
        camera_orientations: jax.Array,
        shape_optimization: bool = True,
        roi: Optional[Tuple[int, int]] = None,
        multires: Optional[Tuple[int, int]] = None,
        adaptive: bool = False,
    ):
        """Refine a batch of hypotheses in parallel (vmap of the scan program).

        ``states`` leaves carry a leading hypothesis axis; view inputs are
        shared.  Hypotheses are independent, so this maps perfectly onto
        data-parallel TPU meshes with zero cross-device communication.
        ``roi`` as in :meth:`_refine` (pass ``self._roi_for(depth_images)``
        to apply the config policy).  ``multires=(factor, coarse_iters)``
        — or a list of such levels, coarsest first — runs the
        coarse-to-fine schedule per hypothesis (pass
        ``self._multires_for()`` for the config policy; each coarse level
        strides ``depth_images`` internally and composes its own
        stride-scaled ROI per the config policy); the
        returned log concatenates all phases, covering the full
        ``max_iterations`` like :meth:`__call__`.

        The single-instance freeze-cond early stopping is NOT used here:
        under vmap a per-hypothesis ``lax.cond`` lowers to a select that
        executes both branches, so it could only add cost.  Instead,
        ``adaptive=True`` (with ``early_stop_delta`` configured) runs the
        batched early-stop variant: the fine phase executes in scan chunks
        of ``early_stop_interval`` iterations — chained through Adam state
        and the best tracker, so the trajectory is IDENTICAL to the
        unchunked program — with one host sync per chunk; once EVERY
        hypothesis's chunk-over-chunk relative loss improvement falls below
        ``early_stop_delta``, the remaining chunks are skipped entirely
        (real skipped compute, not a select).  The returned log then covers
        only the executed iterations.
        """
        early_delta = float(self.config.get("early_stop_delta", 0.0) or 0.0)
        if adaptive and early_delta > 0.0:
            return self._refine_batch_adaptive(
                states, depth_images, points, point_masks,
                camera_positions, camera_orientations,
                shape_optimization, roi, multires, early_delta,
            )
        states, coarse_logs, executed = self._run_coarse_levels_batched(
            states, depth_images, camera_positions, camera_orientations,
            shape_optimization, multires,
        )
        fine_iters = (
            int(self.config["max_iterations"]) - executed if executed else None
        )
        refine = functools.partial(
            self._refine,
            depth_images=depth_images,
            points=points,
            point_masks=point_masks,
            camera_positions=camera_positions,
            camera_orientations=camera_orientations,
            shape_optimization=shape_optimization,
            roi=roi,
            num_iterations=fine_iters,
            allow_early_stop=False,
        )
        final, best, log = jax.vmap(lambda s: refine(s))(states)
        if coarse_logs:
            log = {
                k: jnp.concatenate(
                    [lg[k] for lg in coarse_logs] + [log[k]], axis=1
                )
                for k in log
            }
        return final, best, log

    def _run_coarse_levels_batched(
        self,
        states: Dict[str, jax.Array],
        depth_images: jax.Array,
        camera_positions: jax.Array,
        camera_orientations: jax.Array,
        shape_optimization: bool,
        multires: Optional[Union[Tuple[int, int], List[Tuple[int, int]]]],
    ):
        """Run the (vmapped) coarse multires levels of a batched refinement.

        Returns ``(states, per-level logs, executed coarse iterations)``;
        levels not viable for these inputs are skipped (their budget folds
        into the remaining phases, as in :meth:`__call__`).
        """
        schedule = _normalize_multires(multires)
        max_iterations = int(self.config["max_iterations"])
        if sum(n for _, n in schedule) >= max_iterations:
            raise ValueError(
                "multires schedule must leave at least one full-resolution "
                f"iteration (got {schedule} for max_iterations="
                f"{max_iterations})"
            )
        coarse_logs = []
        executed = 0
        for factor, n_iters in schedule:
            phase = self._coarse_phase(depth_images, factor)
            if phase is None:
                continue
            depth_coarse, points_c, point_masks_c, roi_c = phase
            refine_coarse = functools.partial(
                self._refine,
                depth_images=depth_coarse,
                points=points_c,
                point_masks=point_masks_c,
                camera_positions=camera_positions,
                camera_orientations=camera_orientations,
                shape_optimization=shape_optimization,
                roi=roi_c,
                ds_factor=factor,
                num_iterations=n_iters,
                allow_early_stop=False,
            )
            states, _, lg = jax.vmap(lambda s: refine_coarse(s))(states)
            coarse_logs.append(lg)
            executed += n_iters
        return states, coarse_logs, executed

    def _refine_batch_adaptive(
        self,
        states: Dict[str, jax.Array],
        depth_images: jax.Array,
        points: jax.Array,
        point_masks: jax.Array,
        camera_positions: jax.Array,
        camera_orientations: jax.Array,
        shape_optimization: bool,
        roi: Optional[Tuple[int, int]],
        multires: Optional[Tuple[int, int]],
        early_delta: float,
    ):
        """Batched early stopping via chunked scans (see :meth:`refine_batch`).

        The coarse multires phase (if any) runs unchunked — the estimate is
        far from converged there by construction.  The fine phase runs in
        ``early_stop_interval``-sized chunks, chaining (state, Adam state,
        best tracker) so the trajectory is bit-identical to the single long
        scan; after each chunk ONE host sync reads the per-hypothesis
        chunk-final losses and stops launching chunks once every hypothesis
        has plateaued (the same relative-improvement predicate as the
        single-instance freeze, ``max(|ref|, 1e-8)`` denominator included).
        """
        interval = int(self.config.get("early_stop_interval", 10))
        if interval < 1:
            raise ValueError(
                f"early_stop_interval must be >= 1, got {interval}"
            )
        if self._use_temporal_coherence():
            # the warm-march state would reset at every chunk boundary,
            # silently degrading reuse and breaking the chunked==unchunked
            # trajectory guarantee
            raise ValueError(
                "adaptive refine_batch and temporal_coherence are mutually "
                "exclusive"
            )
        states, logs, executed = self._run_coarse_levels_batched(
            states, depth_images, camera_positions, camera_orientations,
            shape_optimization, multires,
        )
        fine_iters = int(self.config["max_iterations"]) - executed

        def chunk_fn(s, o, b, n):
            return self._refine(
                s,
                depth_images,
                points,
                point_masks,
                camera_positions,
                camera_orientations,
                shape_optimization,
                None,
                roi,
                1,
                n,
                False,
                opt_state=o,
                best=b,
                return_full=True,
            )

        opt_states = None
        bests = None
        ref_loss = None  # (N,) previous chunk-final losses
        executed = 0
        while executed < fine_iters:
            n = min(interval, fine_iters - executed)
            if opt_states is None:
                states, opt_states, bests, log = jax.vmap(
                    lambda s: chunk_fn(s, None, None, n)
                )(states)
            else:
                states, opt_states, bests, log = jax.vmap(
                    functools.partial(chunk_fn, n=n)
                )(states, opt_states, bests)
            logs.append(log)
            executed += n
            last_loss = log["loss"][:, -1]
            if ref_loss is not None:
                improved = (ref_loss - last_loss) >= early_delta * jnp.maximum(
                    jnp.abs(ref_loss), 1e-8
                )
                if not bool(jnp.any(improved)):  # one host sync per chunk
                    break
            ref_loss = last_loss
        log = {
            k: jnp.concatenate([lg[k] for lg in logs], axis=1) for k in logs[0]
        }
        return states, bests, log

    def generate_depth(
        self,
        position: jax.Array,
        orientation: jax.Array,
        scale: jax.Array,
        latent: jax.Array,
    ) -> jax.Array:
        """Render a depth image of the given estimate."""
        sdf = self._decode(latent)
        return self.render(sdf[0, 0], position, orientation, 1.0 / scale)

    def generate_mesh(
        self, latent: jax.Array, scale: jax.Array, complete_mesh: bool = False
    ):
        """Extract a scaled mesh from the decoded latent (host-side).

        Returns a :class:`sdfest_tpu.pipeline.synthetic.Mesh`.
        """
        from sdfest_tpu.ops import marching_cubes as mc
        from sdfest_tpu.pipeline.synthetic import Mesh

        sdf = np.asarray(self._decode(latent))[0, 0]
        inc = 0
        if complete_mesh:
            inc = 2
            sdf = np.pad(sdf, 1, constant_values=1.0)
        s = 2.0 / (self.resolution - 1)
        vertices, faces = mc.marching_cubes(
            sdf, level=self.config["iso_threshold"], spacing=(s, s, s)
        )
        if vertices is None or len(vertices) == 0:
            return None
        c = s * (self.resolution + inc - 1) / 2.0
        vertices = vertices - np.array([[c, c, c]])
        return Mesh(
            vertices=vertices,
            faces=faces,
            scale=float(np.asarray(scale).reshape(-1)[0]),
            rel_scale=True,
        )


def _plain_config(config: dict) -> dict:
    """Deep-copy a config with arrays converted for pickling."""
    out = {}
    for k, v in config.items():
        if isinstance(v, dict):
            out[k] = _plain_config(v)
        elif isinstance(v, (jnp.ndarray, np.ndarray)):
            out[k] = np.asarray(v)
        else:
            out[k] = v
    return out
