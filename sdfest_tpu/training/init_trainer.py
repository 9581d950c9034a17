"""Init-network trainer: jitted step with the reference loss structure.

Capability parity with /root/reference/sdfest/initialization/scripts/
train.py (Trainer): MSE losses on latent/position/scale plus a quaternion
loss (``1 - <q1,q2>^2``) or cross-entropy over SO(3) grid cells, each with a
config weight; batchnorm statistics updated through flax mutable
collections; geodesic-distance metrics including argmax decode of the
discretized representation.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sdfest_tpu.models.pose_net import create_pose_net
from sdfest_tpu.ops import quaternion
from sdfest_tpu.ops.so3grid import SO3Grid


class InitTrainer:
    """Trainer for :class:`sdfest_tpu.models.pose_net.SDFPoseNet`."""

    def __init__(self, init_config: Dict[str, Any], latent_size: int):
        self.config = init_config
        self.net = create_pose_net(init_config, shape_dimension=latent_size)
        self.orientation_repr = init_config["head"]["orientation_repr"]
        if self.orientation_repr == "discretized":
            grid = SO3Grid(init_config["head"]["orientation_grid_resolution"])
            # keep as a HOST constant: a device-array closure constant
            # forces a device->host fetch during every jit lowering that
            # captures it, which stalls for minutes through the hosted-TPU
            # tunnel (observed in the round-4 training run)
            self.grid_quats = np.asarray(grid.quaternions(), np.float32)
        else:
            self.grid_quats = None
        self.optimizer = optax.adam(init_config.get("learning_rate", 1e-3))

    def init_state(self, key: jax.Array, num_points: int = 2500) -> Dict[str, Any]:
        in_size = self.config["backbone"].get("in_size", 3)
        variables = self.net.init(key, jnp.zeros((1, num_points, in_size)))
        return {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
            "opt_state": self.optimizer.init(variables["params"]),
            "iteration": jnp.zeros((), jnp.int32),
        }

    def _loss(
        self,
        params,
        batch_stats,
        batch: Dict[str, jax.Array],
    ) -> Tuple[jax.Array, Tuple[Dict[str, jax.Array], Any]]:
        cfg = self.config
        out, updates = self.net.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["pointset"],
            train=True,
            mutable=["batch_stats"],
        )
        latent, position, scale, orientation = out
        loss = jnp.zeros(())
        metrics: Dict[str, jax.Array] = {}
        if "latent_shape" in batch:
            loss_latent = jnp.mean((latent - batch["latent_shape"]) ** 2)
            metrics["loss_latent"] = loss_latent
            loss = loss + cfg.get("latent_weight", 1.0) * loss_latent
        if "position" in batch:
            loss_position = jnp.mean((position - batch["position"]) ** 2)
            metrics["loss_position"] = loss_position
            loss = loss + cfg.get("position_weight", 1.0) * loss_position
        if "scale" in batch:
            loss_scale = jnp.mean((scale - batch["scale"]) ** 2)
            metrics["loss_scale"] = loss_scale
            loss = loss + cfg.get("scale_weight", 1.0) * loss_scale
        if "orientation" in batch:
            if self.orientation_repr == "quaternion":
                loss_orientation = quaternion.simple_quaternion_loss(
                    orientation, batch["orientation"]
                )
            elif self.orientation_repr == "discretized":
                loss_orientation = jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(
                        orientation, batch["orientation"]
                    )
                )
            else:
                raise NotImplementedError(
                    f"Orientation repr {self.orientation_repr} not supported."
                )
            metrics["loss_orientation"] = loss_orientation
            loss = loss + cfg.get("orientation_weight", 1.0) * loss_orientation
        metrics["loss"] = loss
        return loss, (metrics, updates)

    def step(
        self, state: Dict[str, Any], batch: Dict[str, jax.Array],
        axis_name: Optional[str] = None,
    ) -> Tuple[Dict[str, Any], Dict[str, jax.Array]]:
        """One optimizer step (pure; wrap with jit or a DP wrapper).

        With ``axis_name`` (inside :func:`shard_map_data_parallel_step`)
        gradients, metrics and batch-norm statistics are pmean'd over the
        mesh axis — exactly the global-batch means, since every loss term
        is a batch mean and shards are equal-sized.
        """
        grads, (metrics, updates) = jax.grad(self._loss, has_aux=True)(
            state["params"], state["batch_stats"], batch
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
            updates = jax.lax.pmean(updates, axis_name)
        opt_updates, opt_state = self.optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], opt_updates)
        return (
            {
                "params": params,
                "batch_stats": updates.get("batch_stats", state["batch_stats"]),
                "opt_state": opt_state,
                "iteration": state["iteration"] + 1,
            },
            metrics,
        )

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def train_step(
        self, state: Dict[str, Any], batch: Dict[str, jax.Array]
    ) -> Tuple[Dict[str, Any], Dict[str, jax.Array]]:
        """Jitted single-device :meth:`step`."""
        return self.step(state, batch)

    def make_chained_step(self, dataset, batch_size: int, k: int):
        """K on-device-generation + train steps as ONE compiled program.

        On a hosted TPU the per-dispatch wall cost (~300 ms through the
        tunnel) dominates the ~11 ms device step, capping training at
        ~3 it/s no matter the chip.  Scanning K generation+train steps
        inside one jit amortizes the dispatch to ~1/K, restoring
        device-bound throughput.  Only valid for fully on-device data
        (``SDFVAEViewDataset``); host-loader streams can't be traced.

        Returns ``fn(state, key) -> (state, stacked_metrics)`` with
        metrics stacked along a leading (k,) axis, oldest first.
        """

        @functools.partial(jax.jit, donate_argnums=(0,))
        def chained(state, key):
            def body(st, subkey):
                batch = dataset.sample_batch(subkey, batch_size)
                return self.step(st, batch)

            return jax.lax.scan(body, state, jax.random.split(key, k))

        return chained

    # -- replay-buffer training ------------------------------------------
    #
    # The generated stream is RENDER-bound (~450 samples/s on v5e-1: every
    # sample pays a decode + sphere-trace), while the PointNet train step
    # is a few ms — so fresh-stream training caps at ~30 it/s at batch 16
    # and the hard heads (orientation CE over 576 SO(3) cells, latent MSE)
    # starve: the reference simply buys 16M fresh samples
    # (/root/reference/sdfest/initialization/configs/discretized.yaml:
    # 500k iterations x batch 32).  The TPU-first alternative: keep a
    # device-resident ring buffer of generated samples and take T training
    # steps (at a LARGER batch) per generation step, all inside one
    # chained program.  Generation keeps feeding the ring at the render
    # rate; training consumes random replays at the matmul rate.  Sample
    # reuse across epochs is benign (each sample is seen ~T x train_batch
    # / gen_batch times, spread over the run) and the buffer refreshes
    # continuously, so late training never sees a stale distribution.

    def init_replay_buffer(self, capacity: int, num_points: int,
                           latent_size: int) -> Dict[str, Any]:
        """Allocate the device-resident sample ring.

        Pointsets are stored bf16 (the mug spans ~0.1 m, so bf16's ~0.4%
        relative grid is ~0.4 mm — below the sensor/augmentation noise the
        stream already carries); labels stay f32/int32.  A 131k-sample
        ring at 2500 points is ~2 GB — comfortable HBM residency.
        """
        if self.orientation_repr == "discretized":
            orientation = jnp.zeros((capacity,), jnp.int32)
        else:
            orientation = jnp.zeros((capacity, 4), jnp.float32)
        return {
            "pointset": jnp.zeros((capacity, num_points, 3), jnp.bfloat16),
            "latent_shape": jnp.zeros((capacity, latent_size), jnp.float32),
            "position": jnp.zeros((capacity, 3), jnp.float32),
            "scale": jnp.zeros((capacity,), jnp.float32),
            "orientation": orientation,
            "cursor": jnp.zeros((), jnp.int32),
            "filled": jnp.zeros((), jnp.int32),
        }

    def make_replay_chained_step(
        self,
        dataset,
        gen_batch: int,
        train_batch: int,
        t_train: int,
        k: int,
    ):
        """K units of [1 generation step + ``t_train`` replay train steps]
        as ONE compiled program.

        Each unit renders ``gen_batch`` fresh samples into the ring at the
        cursor, then takes ``t_train`` optimizer steps on ``train_batch``
        uniform draws from the filled region.  Returns
        ``fn(state, buffer, key) -> ((state, buffer), stacked_metrics)``
        with metrics stacked over the k * t_train training steps.
        ``capacity`` must be a multiple of ``gen_batch`` (keeps the ring
        write a single dynamic_update_slice, no wrap split).
        """

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def chained(state, buffer, key):
            capacity = buffer["pointset"].shape[0]
            if capacity % gen_batch:
                raise ValueError(
                    f"replay capacity {capacity} must be a multiple of "
                    f"gen_batch {gen_batch}"
                )

            def unit(carry, subkey):
                st, buf = carry
                kgen, ktrain = jax.random.split(subkey)
                fresh = dataset.sample_batch(kgen, gen_batch)
                cur = buf["cursor"]
                write = lambda store, rows: jax.lax.dynamic_update_slice(
                    store,
                    jnp.asarray(rows, store.dtype),
                    (cur,)
                    + (jnp.zeros((), cur.dtype),) * (store.ndim - 1),
                )
                buf = dict(
                    buf,
                    pointset=write(buf["pointset"], fresh["pointset"]),
                    latent_shape=write(
                        buf["latent_shape"], fresh["latent_shape"]
                    ),
                    position=write(buf["position"], fresh["position"]),
                    scale=write(buf["scale"], fresh["scale"]),
                    orientation=write(
                        buf["orientation"], fresh["orientation"]
                    ),
                    cursor=(cur + gen_batch) % capacity,
                    filled=jnp.minimum(
                        buf["filled"] + gen_batch, capacity
                    ),
                )

                def train_once(st_, subkey_):
                    # buffer rows are loop-invariant across the t_train
                    # inner steps (writes happen once per unit, above)
                    idx = jax.random.randint(
                        subkey_, (train_batch,), 0, buf["filled"]
                    )
                    # pointset rows via one-hot matmul, NOT a gather: XLA
                    # gathers serialize on TPU (measured ~20-30 ms for
                    # 64 x 2500 x 3 rows from the 131k ring — dominating
                    # the whole train step), while the equivalent
                    # (B, N) @ (N, P*3) one-hot product is exact row
                    # selection on the MXU at ~1-2 ms.  Small label
                    # fields stay plain gathers.
                    capacity_ = buf["pointset"].shape[0]
                    oh = jax.nn.one_hot(
                        idx, capacity_, dtype=jnp.bfloat16
                    )
                    flat = buf["pointset"].reshape(capacity_, -1)
                    pts = (oh @ flat).reshape(
                        train_batch, flat.shape[1] // 3, 3
                    )
                    batch = {
                        "pointset": jnp.asarray(pts, jnp.float32),
                        "latent_shape": buf["latent_shape"][idx],
                        "position": buf["position"][idx],
                        "scale": buf["scale"][idx],
                        "orientation": buf["orientation"][idx],
                    }
                    return self.step(st_, batch)

                st, metrics = jax.lax.scan(
                    train_once, st, jax.random.split(ktrain, t_train)
                )
                return (st, buf), metrics

            (state, buffer), metrics = jax.lax.scan(
                unit, (state, buffer), jax.random.split(key, k)
            )
            # flatten (k, t_train) -> (k * t_train,) step metrics
            metrics = jax.tree_util.tree_map(
                lambda m: m.reshape((-1,) + m.shape[2:]), metrics
            )
            return (state, buffer), metrics

        return chained

    @functools.partial(jax.jit, static_argnums=(0,))
    def predict(
        self, state: Dict[str, Any], pointsets: jax.Array
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """Inference forward pass (running batchnorm statistics)."""
        return self.net.apply(
            {"params": state["params"], "batch_stats": state["batch_stats"]},
            pointsets,
            train=False,
        )

    @functools.partial(jax.jit, static_argnums=(0,))
    def _metrics_device(
        self, state: Dict[str, Any], batch: Dict[str, jax.Array]
    ) -> Dict[str, jax.Array]:
        """All validation metrics as ONE compiled program.

        Computing them as separate eager ops is pathological on a hosted
        TPU: every distinct small program pays the remote-compile +
        dispatch round trip, turning a validation milestone into minutes
        of latency.  One jitted program -> one compile, one host sync.
        """
        latent, position, scale, orientation = self.net.apply(
            {"params": state["params"], "batch_stats": state["batch_stats"]},
            batch["pointset"],
            train=False,
        )
        metrics = {
            "latent_mse": jnp.mean((latent - batch["latent_shape"]) ** 2),
            "position_mse": jnp.mean((position - batch["position"]) ** 2),
            "scale_mse": jnp.mean((scale - batch["scale"]) ** 2),
            # interpretable single-shot errors (meters / absolute scale):
            # the reference logs only geodesic distance
            # (/root/reference/sdfest/initialization/scripts/train.py:365-375)
            "position_error": jnp.mean(
                jnp.linalg.norm(position - batch["position"], axis=-1)
            ),
            "scale_error": jnp.mean(jnp.abs(scale - batch["scale"])),
        }
        if self.orientation_repr == "quaternion":
            pred_q = orientation
        else:
            # reference decode semantics (initialization/scripts/
            # train.py:344-363): argmax cell -> grid.index_to_quat; the
            # geodesic below then matches its `metric geodesic distance`
            pred_q = jnp.asarray(self.grid_quats)[
                jnp.argmax(orientation, axis=-1)
            ]
            if "orientation" in batch:
                # held-out cross-entropy over the grid cells: the direct
                # counterpart of the training loss (chance = ln n_cells),
                # the cleanest signal that the discretized head learned
                metrics["orientation_ce"] = jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(
                        orientation, batch["orientation"]
                    )
                )
        metrics["geodesic_distance"] = jnp.mean(
            quaternion.geodesic_distance(pred_q, batch["quaternion"])
        )
        return metrics

    def compute_metrics(
        self, state: Dict[str, Any], batch: Dict[str, jax.Array]
    ) -> Dict[str, float]:
        """Validation metrics incl. mean geodesic orientation error."""
        device_metrics = self._metrics_device(
            state,
            {
                k: batch[k]
                for k in (
                    "pointset", "latent_shape", "position", "scale",
                    "quaternion", "orientation",
                )
                if k in batch
            },
        )
        return {k: float(v) for k, v in jax.device_get(device_metrics).items()}
