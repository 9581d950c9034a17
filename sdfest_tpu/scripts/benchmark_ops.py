"""Micro-benchmarks for the VAE building-block ops.

Capability parity with /root/reference/sdfest/vae/scripts/benchmark.py
(Conv3d / Linear / trilinear-upsample latencies) with honest sweep timing.

Usage: python -m sdfest_tpu.scripts.benchmark_ops [--iters 100]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from sdfest_tpu.ops.interpolation import resize_trilinear


def sweep_time(fn, x0, iters: int) -> float:
    """Mean seconds/call; scans distinct scaled inputs (no request caching)."""

    @jax.jit
    def run(x):
        def step(acc, scale):
            return acc + jnp.sum(fn(x * scale)), None

        out, _ = jax.lax.scan(
            step, 0.0, 1.0 + 1e-4 * jnp.arange(iters, dtype=jnp.float32)
        )
        return out

    r = run(x0)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = run(x0 * 1.0001)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=100)
    args = parser.parse_args()

    import flax.linen as nn

    key = jax.random.PRNGKey(0)
    x3d = jax.random.normal(key, (16, 16, 16, 16, 8))  # NDHWC
    conv = nn.Conv(features=16, kernel_size=(3, 3, 3))
    conv_params = conv.init(key, x3d)
    t = sweep_time(lambda x: conv.apply(conv_params, x), x3d, args.iters)
    print(f"Conv3d 16x16^3 c8->c16 k3: {t * 1000:.3f} ms")

    xlin = jax.random.normal(key, (64, 2048))
    dense = nn.Dense(2048)
    dense_params = dense.init(key, xlin)
    t = sweep_time(lambda x: dense.apply(dense_params, x), xlin, args.iters)
    print(f"Linear 64x2048->2048: {t * 1000:.3f} ms")

    xvol = jax.random.normal(key, (8, 4, 16, 16, 16))  # (N, C, D, D, D)
    t = sweep_time(lambda x: resize_trilinear(x, 32), xvol, args.iters)
    print(f"Trilinear upsample 16->32 (8x4ch): {t * 1000:.3f} ms")

    print(f"device: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
