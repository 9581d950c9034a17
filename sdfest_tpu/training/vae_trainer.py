"""Shape-VAE trainer: fully jitted step with the reference loss structure.

Capability parity with /root/reference/sdfest/vae/scripts/train.py, rebuilt
as one fused XLA program per step:

- L1/L2 reconstruction losses split at ``|sdf| < 0.1`` (near/far surface),
  each with its own weight, summed (not averaged), as in the reference
  (train.py:224-229).
- KLD with a warm-up gate (weight 0 for the first 1000 iterations).
- TSDF semantics: input clamping after warm-up; selective output clamping
  where both target and output are outside the band (train.py:208-218).
- Render-based point-cloud consistency loss: render the *input* SDF from a
  random orientation (no grad), lift to points, penalize the squared
  trilinear SDF value of the *reconstruction* at those points
  (train.py:235-269).  The reference loops per sample on the host; here it
  is a vmap inside the same jitted step.

Data parallelism: wrap :meth:`VAETrainer.train_step` with
:func:`sdfest_tpu.parallel.mesh.data_parallel_step`.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from sdfest_tpu.models.vae import create_vae_from_config
from sdfest_tpu.ops import pointset, quaternion
from sdfest_tpu.ops.camera import Camera
from sdfest_tpu.ops.interpolation import sample_sdf_masked
from sdfest_tpu.render import render_depth


class VAETrainer:
    """Trainer for :class:`sdfest_tpu.models.vae.SDFVAE`."""

    WARM_UP_ITERATIONS = 1000

    def __init__(self, config: Dict[str, Any]):
        self.config = config
        self.vae = create_vae_from_config(config)
        self.tsdf = self.vae.tsdf
        self.resolution = self.vae.sdf_size
        w = config.get("pc_render_width", 640)
        h = config.get("pc_render_height", 480)
        f = config.get("pc_render_f", w / 2)
        self.camera = Camera(
            width=w, height=h, fx=f, fy=f, cx=w / 2, cy=h / 2, pixel_center=0.5
        )
        self.optimizer = optax.adam(config.get("learning_rate", 1e-3))

    def init_state(self, key: jax.Array) -> Dict[str, Any]:
        """Initialize parameters, optimizer state and iteration counter."""
        r = self.resolution
        variables = self.vae.init(
            key, jnp.zeros((1, 1, r, r, r)), jax.random.PRNGKey(0)
        )
        params = variables["params"]
        return {
            "params": params,
            "opt_state": self.optimizer.init(params),
            "iteration": jnp.zeros((), jnp.int32),
        }

    def _loss(
        self,
        params,
        batch_sdf: jax.Array,
        key: jax.Array,
        iteration: jax.Array,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        cfg = self.config
        warm = iteration > self.WARM_UP_ITERATIONS
        x = batch_sdf
        if self.tsdf is not False:
            x = jnp.where(warm, jnp.clip(x, -self.tsdf, self.tsdf), x)

        key_encode, key_pc = jax.random.split(key)
        recon, mean, log_var, z = self.vae.apply(
            {"params": params}, x, key_encode
        )

        if self.tsdf is not False:
            both_outside = (jnp.abs(x) >= self.tsdf) & (jnp.abs(recon) >= self.tsdf)
            clamped = jnp.clip(recon, -self.tsdf, self.tsdf)
            recon = jnp.where(warm & both_outside, clamped, recon)

        l1_error = jnp.abs(recon - x)
        l2_error = l1_error**2
        near = jnp.abs(x) < 0.1
        loss_l2_small = jnp.sum(jnp.where(near, l2_error, 0.0))
        loss_l2_large = jnp.sum(jnp.where(near, 0.0, l2_error))
        loss_l1_small = jnp.sum(jnp.where(near, l1_error, 0.0))
        loss_l1_large = jnp.sum(jnp.where(near, 0.0, l1_error))

        pc_weight = cfg.get("pc_weight", 0.0)
        if pc_weight > 0.0:
            loss_pc = self._pc_loss(x, recon, key_pc)
        else:
            loss_pc = jnp.zeros(())

        loss_kld = -0.5 * jnp.sum(1 + log_var - mean**2 - jnp.exp(log_var))
        kld_weight = jnp.where(warm, cfg.get("kld_weight", 1.0), 0.0)

        loss = (
            cfg.get("l2_small_weight", 1.0) * loss_l2_small
            + cfg.get("l2_large_weight", 1.0) * loss_l2_large
            + cfg.get("l1_small_weight", 0.0) * loss_l1_small
            + cfg.get("l1_large_weight", 0.0) * loss_l1_large
            + pc_weight * loss_pc
            + kld_weight * loss_kld
        )
        metrics = {
            "loss": loss,
            "loss_l2_small": loss_l2_small,
            "loss_l2_large": loss_l2_large,
            "loss_l1_small": loss_l1_small,
            "loss_l1_large": loss_l1_large,
            "loss_pc": loss_pc,
            "loss_kld": loss_kld,
        }
        return loss, metrics

    def _pc_loss(
        self, x: jax.Array, recon: jax.Array, key: jax.Array
    ) -> jax.Array:
        """Render-based consistency loss, vmapped over the batch."""

        def per_sample(sdf_in, sdf_recon, k):
            quat = quaternion.random_uniform(k)
            p = jnp.asarray([0.0, 0.0, -5.0])
            depth = render_depth(
                jax.lax.stop_gradient(sdf_in),
                p,
                quat,
                jnp.asarray(1.0),
                camera=self.camera,
                threshold=0.01,
            )
            depth = jax.lax.stop_gradient(depth)
            # tile order keeps the pallas sampler on its windowed fast path
            # (the loss is an order-invariant sum)
            points, valid = pointset.depth_to_pointcloud_dense(
                depth, self.camera, order="tile"
            )
            # unscaled pc loss on the reconstruction (vae train.py:29-125)
            obj_points = quaternion.apply(
                quaternion.invert(quaternion.normalize(quat)), points - p
            )
            from sdfest_tpu.render import api as render_api

            if (
                render_api.resolve_backend("auto") == "pallas"
                and sdf_recon.shape[-1] == 64
            ):
                # XLA gathers serialize on TPU (~80 ns/element: 307k points
                # x batch would dominate the whole step); sample via the
                # Pallas MXU kernels with the inside-volume mask computed
                # densely, exactly as the pipeline pc loss does
                from sdfest_tpu.ops.interpolation import _base_and_frac

                _, _, inside = _base_and_frac(obj_points, sdf_recon.shape[-1])
                mask = jnp.logical_and(inside, valid)
                values = render_api.sample_sdf_masked_extrapolating(
                    sdf_recon, obj_points, mask, backend="pallas"
                )
                return jnp.sum(values**2)
            values, _ = sample_sdf_masked(sdf_recon, obj_points)
            return jnp.sum(jnp.where(valid, values**2, 0.0))

        keys = jax.random.split(key, x.shape[0])
        return jnp.sum(jax.vmap(per_sample)(x[:, 0], recon[:, 0], keys))

    def step(
        self, state: Dict[str, Any], batch_sdf: jax.Array, key: jax.Array,
        axis_name: Optional[str] = None,
    ) -> Tuple[Dict[str, Any], Dict[str, jax.Array]]:
        """One optimizer step (pure; wrap with jit or a DP wrapper).

        With ``axis_name`` (inside :func:`shard_map_data_parallel_step`)
        gradients and metrics are psum'd over the mesh axis — exactly the
        global-batch SUMS, since every loss term reduces the batch by sum
        (reference parity) — and the key is folded per shard so shards
        draw distinct render poses / reparameterization noise.
        """
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        (_, metrics), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state["params"], batch_sdf, key, state["iteration"]
        )
        if axis_name is not None:
            grads = jax.lax.psum(grads, axis_name)
            metrics = jax.lax.psum(metrics, axis_name)
        updates, opt_state = self.optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        return (
            {
                "params": params,
                "opt_state": opt_state,
                "iteration": state["iteration"] + 1,
            },
            metrics,
        )

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def train_step(
        self, state: Dict[str, Any], batch_sdf: jax.Array, key: jax.Array
    ) -> Tuple[Dict[str, Any], Dict[str, jax.Array]]:
        """Jitted single-device :meth:`step`."""
        return self.step(state, batch_sdf, key)

    def make_chained_step(self, data: jax.Array, batch_size: int, k: int):
        """K train steps on a DEVICE-RESIDENT SDF dataset as ONE program.

        The per-step host->device batch upload plus dispatch costs
        ~300 ms through a hosted-TPU tunnel against an ~11 ms device step
        (measured: the round-4 25k-iteration run sustained 3.4 it/s,
        294 ms/step wall).  A procedural-category training set is small
        (1000 x 64^3 f32 = 1 GB), so the whole dataset rides HBM and K
        steps chain inside one jit: batches are uniform random draws
        (with replacement) from the resident array — statistically
        equivalent to the reference's shuffled epochs at these reuse
        counts — and the dispatch cost amortizes to ~1/K.

        ``data``: (N, 1, D, D, D) device array, passed back INTO the
        returned function as an argument — NOT closed over: a
        closure-captured concrete array is inlined into the program as a
        constant, and on a hosted TPU the 1 GB dataset then ships inside
        the remote-compile request (observed: HTTP 413 from the compile
        endpoint).  As an argument it stays a device buffer reference.
        Returns ``fn(state, data, key) -> (state, stacked_metrics)``
        with metrics stacked along a leading (k,) axis, oldest first.
        """
        n = data.shape[0]

        @functools.partial(jax.jit, donate_argnums=(0,))
        def chained(state, data_arg, key):
            def body(st, subkey):
                k_idx, k_step = jax.random.split(subkey)
                idx = jax.random.randint(k_idx, (batch_size,), 0, n)
                return self.step(st, data_arg[idx], k_step)

            return jax.lax.scan(body, state, jax.random.split(key, k))

        return chained
