"""Micro-benchmark VAE decode forward / forward+backward latency.

Capability parity with /root/reference/sdfest/vae/scripts/benchmark_vae.py
(1000-iteration timing loops) with honest output-chained device timing.

Usage: python -m sdfest_tpu.scripts.benchmark_vae --config <vae.yaml>
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from sdfest_tpu.models.vae import create_vae_from_config
from sdfest_tpu.utils import weights as weight_utils
from sdfest_tpu.utils.config import load_config_from_args


def benchmark(config: dict, iterations: int = 1000) -> dict:
    """Time decode fwd and fwd+bwd; returns per-call seconds."""
    vae = create_vae_from_config(config)
    res = config.get("sdf_size", 64)
    params = weight_utils.load_vae_params(config, vae, res)
    latent_size = config["latent_size"]
    block = jax.block_until_ready

    decode = jax.jit(
        lambda z: vae.apply({"params": params}, z, method=vae.decode)
    )
    loss_grad = jax.jit(jax.grad(lambda z: jnp.sum(decode(z) ** 2)))

    z0 = jnp.zeros((1, latent_size))

    def timed(step, x0, n):
        x = step(x0)
        block(x)
        t0 = time.perf_counter()
        for _ in range(n):
            x = step(x)
        block(x)
        return (time.perf_counter() - t0) / n

    fwd = timed(lambda z: z + 1e-6 * jnp.sum(decode(z)), z0, iterations)
    fwd_bwd = timed(lambda z: z + 1e-6 * loss_grad(z), z0, iterations)
    results = {
        "decode_forward_s": fwd,
        "decode_forward_backward_s": fwd_bwd,
        "device": str(jax.devices()[0]),
    }
    print(f"Forward pass: {fwd * 1000:.3f} ms")
    print(f"Forward + backward pass: {fwd_bwd * 1000:.3f} ms")
    return results


def main() -> None:
    parser = argparse.ArgumentParser(description="Benchmark VAE latency.")
    parser.add_argument("--config", nargs="+", required=False)
    parser.add_argument("--iterations", type=int, default=1000)
    config = load_config_from_args(parser)
    benchmark(config, config.get("iterations", 1000))


if __name__ == "__main__":
    main()
