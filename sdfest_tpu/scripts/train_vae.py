"""Train the shape VAE: ``python -m sdfest_tpu.scripts.train_vae --config ...``.

Capability parity with /root/reference/sdfest/vae/scripts/train.py: layered
YAML config + CLI overrides, the four-way L1/L2 near/far losses, KLD warm-up
and render-based pc consistency loss (all inside the jitted step of
:class:`sdfest_tpu.training.VAETrainer`), tensorboard scalar logging,
periodic reconstruction visualizations, checkpoint/resume, and a final
model + config pair saved together.  Data parallelism over all local
devices is automatic when more than one device is visible.
"""
from __future__ import annotations

import argparse
import os
import time
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from sdfest_tpu.datasets.sdf_dataset import SDFDataset
from sdfest_tpu.training.vae_trainer import VAETrainer
from sdfest_tpu.utils import checkpoint as ckpt
from sdfest_tpu.utils.config import load_config_from_args


def train(config: dict) -> dict:
    """Run VAE training; returns dict with model/config paths."""
    iterations = config["iterations"]
    batch_size = config["batch_size"]
    run_name = config.get(
        "run_name", f"sdfvae_{datetime.now().strftime('%Y-%m-%d_%H-%M-%S-%f')}"
    )

    dataset = SDFDataset(config["dataset_path"])
    batches = dataset.batches(batch_size, shuffle=True)

    trainer = VAETrainer(config)
    key = jax.random.PRNGKey(config.get("seed", 0))
    state = trainer.init_state(key)

    current_iteration = 0
    if config.get("checkpoint"):
        state, meta = ckpt.load_checkpoint(config["checkpoint"], state)
        current_iteration = meta["iteration"]
        run_name = meta.get("run_name", run_name)
        print(f"Resumed from {config['checkpoint']} at iteration {current_iteration}")

    n_devices = jax.local_device_count()
    chained = None
    if n_devices > 1 and batch_size % n_devices == 0:
        from sdfest_tpu.parallel import (
            make_mesh, shard_map_data_parallel_step,
        )

        mesh = make_mesh()
        # shard_map (not GSPMD jit): each device traces with its LOCAL
        # batch shard, so the sequentially-vmapped pallas render/sampling
        # runs B/n chains per device instead of B (see mesh.py)
        step_fn = shard_map_data_parallel_step(
            trainer.step, mesh, batch_argnums=(1,), donate_argnums=(0,)
        )
        print(f"Data-parallel training over {n_devices} devices.")
    else:
        step_fn = trainer.train_step
        # chained dispatches on a device-resident dataset
        # (steps_per_dispatch > 1): see VAETrainer.make_chained_step.
        # Gated on the dataset actually fitting in device memory.
        spd = int(config.get("steps_per_dispatch", 1) or 1)
        max_mb = float(config.get("device_dataset_max_mb", 2048))
        if spd > 1:
            sample_bytes = 4 * int(np.prod(np.asarray(dataset[0]).shape))
            total_mb = len(dataset) * sample_bytes / 1e6
            if total_mb <= max_mb:
                data_dev = jnp.asarray(
                    np.stack([dataset[i] for i in range(len(dataset))])
                )
                chained = trainer.make_chained_step(
                    data_dev, batch_size, spd
                )
                print(
                    f"Device-resident dataset ({total_mb:.0f} MB), "
                    f"{spd} steps per dispatch."
                )
            else:
                print(
                    f"dataset {total_mb:.0f} MB > device_dataset_max_mb "
                    f"{max_mb:.0f}; falling back to per-step dispatch"
                )

    from sdfest_tpu.utils.logging import make_logger

    writer = make_logger(config, run_name)
    model_dir = config.get("model_dir", os.path.join(os.getcwd(), "models", run_name))
    checkpoint_iteration = config.get("checkpoint_iteration", 10000)
    visualization_iteration = config.get("visualization_iteration", 1000)
    start = time.time()

    while current_iteration < iterations:
        if chained is not None:
            key, subkey = jax.random.split(key)
            state, stacked = chained(state, data_dev, subkey)
            got = jax.device_get(stacked)
            chunk = len(got["loss"])
            batch = None
        else:
            batch = jnp.asarray(next(batches))
            key, subkey = jax.random.split(key)
            state, metrics = step_fn(state, batch, subkey)
            got = {k: [float(v)] for k, v in metrics.items()}
            chunk = 1

        for j in range(chunk):
            current_iteration += 1
            if writer is not None and current_iteration % 20 == 0:
                for name, value in got.items():
                    writer.add_scalar(
                        name, float(value[j]), current_iteration
                    )
            if (
                current_iteration % 100 == 0
                or current_iteration == iterations
            ):
                print(
                    f"Iteration {current_iteration}/{iterations} "
                    f"loss {float(got['loss'][j]):.4f}"
                )
            if (
                visualization_iteration
                and current_iteration % visualization_iteration == 0
            ):
                vis_batch = (
                    batch if batch is not None
                    else jnp.asarray(dataset[0])[None]
                )
                _log_visualizations(
                    writer, trainer, state, vis_batch, key,
                    current_iteration,
                )
            if (
                checkpoint_iteration
                and current_iteration % checkpoint_iteration == 0
            ):
                ckpt.save_checkpoint(
                    os.path.join(model_dir, f"{current_iteration}.ckpt"),
                    state,
                    current_iteration,
                    run_name,
                )
            if current_iteration >= iterations:
                break

    print(f"Training took {time.time() - start:.1f}s")
    model_path, config_path = ckpt.save_model_and_config(
        model_dir, run_name, state["params"], config
    )
    print(f"Saved model to {model_path} (config: {config_path})")
    if writer is not None:
        writer.close()
    return {"model": model_path, "config": config_path, "state": state}


def _log_visualizations(writer, trainer, state, batch, key, iteration):
    """Reconstruction + prior-sample figures (SDF slice grids)."""
    if writer is None:
        return
    try:
        from sdfest_tpu.ops import sdf_vis

        recon, _, _, _ = trainer.vae.apply(
            {"params": state["params"]}, batch[:1], key
        )
        fig = sdf_vis.visualize_sdf_reconstruction(
            np.asarray(batch[0, 0]), np.asarray(recon[0, 0])
        )
        writer.add_figure("reconstruction", fig, iteration)
        samples = trainer.vae.apply(
            {"params": state["params"]}, key, 4, method=trainer.vae.inference
        )[0]
        fig = sdf_vis.visualize_sdf_batch(np.asarray(samples[:, 0]))
        writer.add_figure("samples from prior", fig, iteration)
    except Exception as e:  # visualization must never kill training
        print(f"Visualization failed: {e}")


def benchmark(config: dict, steps: int = 30) -> float:
    """Mean seconds per VAE training step, chained (see train_init)."""
    dataset = SDFDataset(config["dataset_path"])
    batches = dataset.batches(config["batch_size"], shuffle=True)
    trainer = VAETrainer(config)
    key = jax.random.PRNGKey(config.get("seed", 0))
    state = trainer.init_state(key)
    for _ in range(5):
        key, subkey = jax.random.split(key)
        state, metrics = trainer.train_step(
            state, jnp.asarray(next(batches)), subkey
        )
    jax.block_until_ready(metrics["loss"])
    start = time.time()
    for _ in range(steps):
        key, subkey = jax.random.split(key)
        state, metrics = trainer.train_step(
            state, jnp.asarray(next(batches)), subkey
        )
    jax.block_until_ready(metrics["loss"])
    mean = (time.time() - start) / steps
    print(f"train step: {mean * 1000:.1f} ms "
          f"(batch {config['batch_size']}, {steps} chained steps)")
    return mean


def main() -> None:
    parser = argparse.ArgumentParser(description="Train SDF shape VAE.")
    parser.add_argument("--config", nargs="+", required=False)
    parser.add_argument(
        "--benchmark_steps", type=int, default=0,
        help="time N chained training steps and exit (no checkpointing)",
    )
    config = load_config_from_args(parser)
    steps = int(config.pop("benchmark_steps", 0) or 0)
    if steps:
        benchmark(config, steps)
    else:
        train(config)


if __name__ == "__main__":
    main()
