"""Train the initialization network:
``python -m sdfest_tpu.scripts.train_init --config ...``.

Capability parity with /root/reference/sdfest/initialization/scripts/
train.py (Trainer): builds the frozen VAE and the pose/shape network from
config-selected backbone/head types, mixes on-device synthetic data with
real (NOCS/Redwood) data loaders by probability, computes MSE +
quaternion/cross-entropy losses, logs geodesic-distance metrics, validates
on held-out loaders, checkpoints periodically, and saves final weights +
config together.

TPU-first differences: the synthetic generator is a jitted on-device
``sample_batch`` (no worker-process restriction, cf. reference
train.py:298), real-data batches are collated to a static point count so
the jitted step compiles once, and data-parallel execution over local
devices is automatic.
"""
from __future__ import annotations

import argparse
import os
import time
import zlib
from datetime import datetime
from typing import Dict

import jax
import jax.numpy as jnp

from sdfest_tpu.datasets.dataset_utils import (
    MultiDataLoader,
    ShuffledLoader,
    make_fixed_size_collate,
)
from sdfest_tpu.models.vae import create_vae_from_config
from sdfest_tpu.training.init_trainer import InitTrainer
from sdfest_tpu.utils import checkpoint as ckpt
from sdfest_tpu.utils import weights as weight_utils
from sdfest_tpu.utils.config import load_config_from_args

DATASET_TYPES = ("SDFVAEViewDataset", "NOCSDataset", "AnnotatedRedwoodDataset")


class Trainer:
    """Initialization-network training driver."""

    def __init__(self, config: dict):
        self._config = config
        self._init_config = config.get("init", config)
        self._vae_config = config.get("vae", self._init_config.get("vae"))
        self._batch_size = self._init_config.get("batch_size", 32)
        self._iterations = self._init_config.get("iterations", 1000)
        self._num_points = self._init_config.get("num_points", 2500)
        self._run_name = config.get(
            "run_name",
            f"sdfest_init_{datetime.now().strftime('%Y-%m-%d_%H-%M-%S-%f')}",
        )
        self._model_dir = config.get(
            "model_dir", os.path.join(os.getcwd(), "models", self._run_name)
        )

        # propagate the trainer-level orientation representation into the
        # head and every dataset config, as the reference does
        # (/root/reference/sdfest/initialization/scripts/train.py:56-68)
        orepr = self._init_config.get("orientation_repr")
        if orepr is not None:
            self._init_config.setdefault("head", {})["orientation_repr"] = orepr
            grid_res = self._init_config.get("orientation_grid_resolution")
            if grid_res is not None:
                self._init_config["head"]["orientation_grid_resolution"] = grid_res
        category = self._init_config.get("category_str")
        if orepr is not None or category is not None:
            for groups in ("datasets", "validation_datasets"):
                for spec in self._init_config.get(groups, {}).values():
                    cfg = spec.setdefault("config_dict", {})
                    if orepr is not None:
                        cfg["orientation_repr"] = orepr
                        grid_res = self._init_config.get(
                            "orientation_grid_resolution"
                        )
                        if grid_res is not None:
                            cfg["orientation_grid_resolution"] = grid_res
                    if category is not None:
                        cfg["category_str"] = category

        self._vae = create_vae_from_config(self._vae_config)
        self._vae_params = weight_utils.load_vae_params(
            self._vae_config, self._vae, self._vae_config.get("sdf_size", 64)
        )
        self.trainer = InitTrainer(
            self._init_config, latent_size=self._vae_config["latent_size"]
        )
        self._key = jax.random.PRNGKey(config.get("seed", 0))
        self.state = self.trainer.init_state(self._key, num_points=self._num_points)
        self._generated_datasets: Dict[str, object] = {}

    # -- data --------------------------------------------------------------

    def _create_dataset(self, name: str, spec: dict, seed_offset: int = 0):
        # accept fully-qualified reference-style paths
        # (e.g. sdfest.initialization.datasets.nocs_dataset.NOCSDataset)
        # seed_offset (= the resume iteration) decorrelates a resumed
        # run's data stream from the replaced segment's on EVERY loader
        # type, not just the chained generated stream
        dtype = spec["type"].split(".")[-1]
        cfg = dict(spec.get("config_dict", {}))
        if dtype == "SDFVAEViewDataset":
            from sdfest_tpu.datasets.generated import SDFVAEViewDataset

            cfg.setdefault("num_points", self._num_points)
            dataset = SDFVAEViewDataset(cfg, self._vae, self._vae_params)
            self._generated_datasets[name] = dataset
            # stable per-name seed (NOT Python hash(), which is salted per
            # process and would make the generated data stream — and thus
            # the whole run — irreproducible)
            seed = zlib.crc32(name.encode()) % 2**31
            return _GeneratedLoader(
                dataset, self._batch_size, seed=seed, seed_offset=seed_offset
            )
        if dtype == "NOCSDataset":
            from sdfest_tpu.datasets.nocs_dataset import NOCSDataset

            dataset = NOCSDataset(cfg)
        elif dtype == "AnnotatedRedwoodDataset":
            from sdfest_tpu.datasets.redwood_dataset import AnnotatedRedwoodDataset

            dataset = AnnotatedRedwoodDataset(cfg)
        else:
            raise ValueError(f"Unsupported dataset type {dtype}")
        return ShuffledLoader(
            dataset,
            self._batch_size,
            collate=make_fixed_size_collate(self._num_points),
            seed=seed_offset,
        )

    def _create_multi_data_loader(self, seed_offset: int = 0) -> MultiDataLoader:
        # zero-probability datasets are never sampled — skip construction
        # so configs mixing in disabled real-data loaders (e.g. the
        # generated-only demonstration recipes) run without the NOCS /
        # Redwood directory trees present
        loaders, probabilities = [], []
        for name, spec in self._init_config["datasets"].items():
            p = spec.get("probability", 1.0)
            if p <= 0.0:
                continue
            loaders.append(self._create_dataset(name, spec, seed_offset))
            probabilities.append(p)
        return MultiDataLoader(loaders, probabilities)

    def _create_validation_loaders(self) -> Dict[str, object]:
        # validation_iteration 0 disables validation entirely — skip loader
        # construction for the same reason as zero-probability datasets
        if not self._init_config.get("validation_iteration", 0):
            return {}
        validation = {}
        for name, spec in self._init_config.get("validation_datasets", {}).items():
            # same disable mechanism as training datasets: probability 0
            # (or a null spec) drops the loader so recipes can run without
            # the NOCS/Redwood trees present
            if not spec or spec.get("probability", 1.0) <= 0.0:
                continue
            validation[name] = self._create_dataset(name, spec)
        return validation

    # -- run ---------------------------------------------------------------

    def benchmark(self, steps: int = 30) -> float:
        """Mean seconds per training step (generation + fwd + bwd), chained.

        Counterpart of the reference's informal it/s readout; honest on the
        lazily-executing hosted TPU runtime because the optimizer-state
        chain makes every step a distinct request (short chains under-read:
        use >= 30 steps, see NOTES.md).  Prints and returns the mean.
        """
        data_loader = self._create_multi_data_loader()

        def one(state):
            batch = next(data_loader)
            batch = {
                k: jnp.asarray(v)
                for k, v in batch.items()
                if k in ("pointset", "latent_shape", "position", "scale",
                         "orientation")
            }
            return self.trainer.train_step(state, batch)

        for _ in range(5):  # compile + warm the pipe
            self.state, metrics = one(self.state)
        jax.block_until_ready(metrics["loss"])
        t0 = time.time()
        for _ in range(steps):
            self.state, metrics = one(self.state)
        jax.block_until_ready(metrics["loss"])
        mean = (time.time() - t0) / steps
        print(f"train step: {mean * 1000:.1f} ms "
              f"(batch {self._batch_size}, {steps} chained steps)")
        return mean

    def run(self) -> dict:
        validation_iteration = self._init_config.get("validation_iteration", 0)
        checkpoint_iteration = self._init_config.get("checkpoint_iteration", 0)

        if self._init_config.get("init_weights"):
            self.state, meta = ckpt.load_checkpoint(
                self._init_config["init_weights"], self.state
            )
            print(f"Loaded init weights from {self._init_config['init_weights']}")

        # resume: true -> continue from the latest <iteration>.ckpt in
        # model_dir (reference analogue: train.py's --ckpt flag).  Makes
        # long hosted-TPU runs interruption-safe: a killed run loses at
        # most checkpoint_iteration steps.
        start_iteration = 0
        if self._init_config.get("resume"):
            candidates = []
            if os.path.isdir(self._model_dir):
                for fname in os.listdir(self._model_dir):
                    stem, ext = os.path.splitext(fname)
                    if ext == ".ckpt" and stem.isdigit():
                        candidates.append((int(stem), fname))
            if candidates:
                it, fname = max(candidates)
                path = os.path.join(self._model_dir, fname)
                self.state, meta = ckpt.load_checkpoint(path, self.state)
                start_iteration = int(meta.get("iteration", it))
                print(f"Resumed from {path} at iteration {start_iteration}")
                # the interrupted segment already wrote scalar rows past
                # the checkpoint we restart from; drop them so the csv
                # holds exactly one row per (step, name) and windowed
                # aggregates around milestones stay unbiased
                _trim_scalar_csv(
                    self._config.get("scalar_csv"), start_iteration
                )

        # loaders AFTER resume so every stream (chained, generated-loader,
        # host ShuffledLoader) folds the resume point into its seed and a
        # resumed run does not retrain on the replaced segment's samples
        data_loader = self._create_multi_data_loader(
            seed_offset=start_iteration
        )
        validation_loaders = self._create_validation_loaders()
        from sdfest_tpu.utils.logging import make_logger

        writer = make_logger(self._config, self._run_name)

        # chained dispatches (steps_per_dispatch > 1): only for a single
        # active on-device generated stream — host loaders can't be traced
        # into the scan.  See InitTrainer.make_chained_step for why.
        spd = int(self._init_config.get("steps_per_dispatch", 1) or 1)
        active = [
            name
            for name, spec in self._init_config["datasets"].items()
            if spec.get("probability", 1.0) > 0.0
        ]
        if spd > 1 and (
            len(active) != 1 or active[0] not in self._generated_datasets
        ):
            print(
                "steps_per_dispatch requires a single generated dataset; "
                "falling back to per-step dispatch"
            )
            spd = 1
        # replay-buffer mode (replay_buffer_size > 0): decouple the
        # training rate from the render-bound generation rate — each
        # chained unit renders one fresh gen batch into a device-resident
        # ring and takes replay_train_steps optimizer steps (at
        # replay_train_batch) on uniform draws from it.  See
        # InitTrainer.make_replay_chained_step.  Same eligibility rule as
        # plain chaining (a single on-device generated stream).
        replay_capacity = int(
            self._init_config.get("replay_buffer_size", 0) or 0
        )
        if replay_capacity > 0 and (
            len(active) != 1 or active[0] not in self._generated_datasets
        ):
            print(
                "replay_buffer_size requires a single generated dataset; "
                "falling back to fresh-stream training"
            )
            replay_capacity = 0
        chained = None
        replay_buffer = None
        if replay_capacity > 0:
            dataset = self._generated_datasets[active[0]]
            t_train = int(
                self._init_config.get("replay_train_steps", 10) or 10
            )
            train_batch = int(
                self._init_config.get("replay_train_batch", 64)
                or self._batch_size
            )
            replay_buffer = self.trainer.init_replay_buffer(
                replay_capacity, self._num_points,
                self._vae_config["latent_size"],
            )
            chained = self.trainer.make_replay_chained_step(
                dataset, self._batch_size, train_batch, t_train,
                max(spd, 1),
            )
            steps_per_call = max(spd, 1) * t_train
            chain_key = jax.random.fold_in(
                jax.random.PRNGKey(zlib.crc32(active[0].encode()) % 2**31),
                1 + start_iteration,
            )
        elif spd > 1:
            dataset = self._generated_datasets[active[0]]
            chained = self.trainer.make_chained_step(
                dataset, self._batch_size, spd
            )
            steps_per_call = spd
            # distinct stream from the loader's (fold_in), still seeded;
            # folding in start_iteration keeps a resumed run's data
            # stream disjoint from the segment it replaced
            chain_key = jax.random.fold_in(
                jax.random.PRNGKey(zlib.crc32(active[0].encode()) % 2**31),
                1 + start_iteration,
            )

        if validation_iteration:
            # pay every validation-path compile (held-out stream render +
            # metrics program) upfront and log the pre-training baseline,
            # so the first mid-run validation milestone doesn't stall the
            # training stream for minutes on a hosted TPU
            self._validate(validation_loaders, writer, start_iteration)

        start = time.time()
        iteration = start_iteration
        while iteration < self._iterations:
            if chained is not None and replay_buffer is not None:
                chain_key, sub = jax.random.split(chain_key)
                (self.state, replay_buffer), stacked = chained(
                    self.state, replay_buffer, sub
                )
                got = jax.device_get(stacked)
                chunk = steps_per_call
            elif chained is not None:
                chain_key, sub = jax.random.split(chain_key)
                self.state, stacked = chained(self.state, sub)
                got = jax.device_get(stacked)
                chunk = steps_per_call
            else:
                batch = next(data_loader)
                batch = {
                    k: jnp.asarray(v)
                    for k, v in batch.items()
                    if k in ("pointset", "latent_shape", "position", "scale",
                             "orientation")
                }
                self.state, metrics = self.trainer.train_step(
                    self.state, batch
                )
                got = {k: [float(v)] for k, v in metrics.items()}
                chunk = 1

            for j in range(chunk):
                iteration += 1
                if writer is not None and iteration % 20 == 0:
                    for name, value in got.items():
                        writer.add_scalar(name, float(value[j]), iteration)
                if iteration % 100 == 0 or iteration == self._iterations:
                    print(
                        f"Iteration {iteration}/{self._iterations} "
                        f"loss {float(got['loss'][j]):.4f}"
                    )
                if (
                    validation_iteration
                    and iteration % validation_iteration == 0
                ):
                    self._validate(validation_loaders, writer, iteration)
                if (
                    checkpoint_iteration
                    and iteration % checkpoint_iteration == 0
                ):
                    ckpt.save_checkpoint(
                        os.path.join(self._model_dir, f"{iteration}.ckpt"),
                        self.state,
                        iteration,
                        self._run_name,
                    )
                if iteration >= self._iterations:
                    break

        print(f"Training took {time.time() - start:.1f}s")
        model_path, config_path = ckpt.save_model_and_config(
            self._model_dir,
            self._run_name,
            {
                "params": self.state["params"],
                "batch_stats": self.state["batch_stats"],
            },
            self._init_config,
        )
        print(f"Saved model to {model_path} (config: {config_path})")
        if writer is not None:
            writer.close()
        return {"model": model_path, "config": config_path, "state": self.state}

    def _validate(self, validation_loaders, writer, iteration) -> None:
        # average over validation_batches batches (default 4): a single
        # batch-16 sample is too noisy to support held-out claims about
        # the hard heads (orientation CE / geodesic)
        n_batches = int(self._init_config.get("validation_batches", 4) or 1)
        for name, loader in validation_loaders.items():
            it = iter(loader)
            accum: Dict[str, float] = {}
            for _ in range(n_batches):
                batch = next(it)
                batch = {
                    k: jnp.asarray(v)
                    for k, v in batch.items()
                    if k in ("pointset", "latent_shape", "position", "scale",
                             "orientation", "quaternion")
                }
                if "latent_shape" not in batch:
                    batch["latent_shape"] = jnp.zeros(
                        (batch["pointset"].shape[0],
                         self._vae_config["latent_size"])
                    )
                for metric_name, value in self.trainer.compute_metrics(
                    self.state, batch
                ).items():
                    accum[metric_name] = accum.get(metric_name, 0.0) + value
            metrics = {k: v / n_batches for k, v in accum.items()}
            print(f"Validation [{name}] @ {iteration}: {metrics}")
            if writer is not None:
                for metric_name, value in metrics.items():
                    writer.add_scalar(f"val/{name}/{metric_name}", value, iteration)


def _trim_scalar_csv(path, start_iteration: int) -> None:
    """Drop csv rows past the resume point (they belong to the replaced
    segment of an interrupted run and would duplicate the re-run steps)."""
    if not path or not os.path.isfile(path):
        return
    with open(path) as f:
        header = f.readline()
        kept = [
            line
            for line in f
            if line.strip() and int(line.split(",", 1)[0]) <= start_iteration
        ]
    with open(path, "w") as f:
        f.write(header)
        f.writelines(kept)


class _GeneratedLoader:
    """Adapter: jitted sample generator -> batch iterator interface."""

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 seed_offset: int = 0):
        self._dataset = dataset
        self._batch_size = batch_size
        self._key = jax.random.fold_in(
            jax.random.PRNGKey(seed), seed_offset
        ) if seed_offset else jax.random.PRNGKey(seed)

    def __iter__(self):
        return self

    def __next__(self):
        self._key, subkey = jax.random.split(self._key)
        return self._dataset.sample_batch(subkey, self._batch_size)



def main() -> None:
    parser = argparse.ArgumentParser(description="Train init network.")
    parser.add_argument("--config", nargs="+", required=False)
    parser.add_argument(
        "--benchmark_steps", type=int, default=0,
        help="time N chained training steps and exit (no checkpointing)",
    )
    config = load_config_from_args(parser)
    steps = int(config.pop("benchmark_steps", 0) or 0)
    trainer = Trainer(config)
    if steps:
        trainer.benchmark(steps)
    else:
        trainer.run()


if __name__ == "__main__":
    main()
