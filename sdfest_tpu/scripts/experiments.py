"""Renderer render-and-recover experiment CLI.

Capability parity with /root/reference/sdfest/differentiable_renderer/
scripts/experiments.py: render a reference depth image of an SDF, perturb
the pose/scale, then optimize back with Adam through the differentiable
renderer, reporting convergence (and optionally saving a figure).

Usage:
  python -m sdfest_tpu.scripts.experiments --sdf <grid.npy> [--iterations 200]
      [--backend auto] [--out fig.png]

Without ``--sdf`` a synthetic sphere SDF is used.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sdfest_tpu.ops.camera import Camera
from sdfest_tpu.pipeline import losses as L
from sdfest_tpu.render import render_depth


def sphere_sdf(res: int = 64, radius: float = 0.5) -> np.ndarray:
    c = np.linspace(-1.0, 1.0, res)
    x, y, z = np.meshgrid(c, c, c, indexing="ij")
    return (np.sqrt(x * x + y * y + z * z) - radius).astype(np.float32)


def offset_experiment(
    sdf: jnp.ndarray,
    camera: Camera,
    iterations: int = 200,
    backend: str = "auto",
    threshold: float = 0.005,
    seed: int = 0,
) -> dict:
    """Perturb pose/scale and optimize back; returns error trajectory."""
    true_state = {
        "position": jnp.asarray([0.02, -0.01, -0.5]),
        "orientation": jnp.asarray([0.0, 0.0, 0.0, 1.0]),
        "scale": jnp.asarray(0.2),
    }
    render = lambda s: render_depth(
        sdf, s["position"], s["orientation"], 1.0 / s["scale"],
        camera=camera, threshold=threshold, backend=backend,
    )
    target = render(true_state)
    print(f"reference render: {int((target > 0).sum())} hit pixels")

    key = jax.random.PRNGKey(seed)
    state = {
        "position": true_state["position"]
        + 0.04 * jax.random.normal(key, (3,)),
        "orientation": jnp.asarray([0.05, -0.03, 0.02, 1.0]),
        "scale": true_state["scale"] * 1.15,
    }
    state = dict(
        state, orientation=state["orientation"] / jnp.linalg.norm(state["orientation"])
    )
    optimizer = optax.adam(2e-3)

    @jax.jit
    def refine(state):
        opt_state = optimizer.init(state)

        def step(carry, _):
            st, os_ = carry

            def loss(s):
                est = render(s)
                return L.depth_l1_loss(target, est)

            l, g = jax.value_and_grad(loss)(st)
            updates, os_ = optimizer.update(g, os_)
            st = optax.apply_updates(st, updates)
            st = dict(
                st,
                orientation=st["orientation"] / jnp.linalg.norm(st["orientation"]),
            )
            return (st, os_), l

        (st, _), ls = jax.lax.scan(step, (state, opt_state), None, length=iterations)
        return st, ls

    pos_err0 = float(jnp.linalg.norm(state["position"] - true_state["position"]))
    final, losses = refine(state)
    pos_err1 = float(jnp.linalg.norm(final["position"] - true_state["position"]))
    scale_err0 = abs(float(state["scale"] - true_state["scale"]))
    scale_err1 = abs(float(final["scale"] - true_state["scale"]))
    print(f"loss: {float(losses[0]):.5f} -> {float(losses[-1]):.5f}")
    print(f"position error: {pos_err0:.4f} -> {pos_err1:.4f}")
    print(f"scale error: {scale_err0:.4f} -> {scale_err1:.4f}")
    return {
        "losses": np.asarray(losses),
        "target": np.asarray(target),
        "final_render": np.asarray(render(final)),
        "position_error": (pos_err0, pos_err1),
        "scale_error": (scale_err0, scale_err1),
    }


def main() -> None:
    parser = argparse.ArgumentParser(description="Render-and-recover experiment.")
    parser.add_argument("--sdf", default=None, help="path to a .npy SDF grid")
    parser.add_argument("--iterations", type=int, default=200)
    parser.add_argument("--backend", default="auto")
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    sdf = jnp.asarray(
        np.load(args.sdf) if args.sdf else sphere_sdf()
    )
    camera = Camera(
        width=args.width, height=args.height, fx=args.width / 2,
        fy=args.width / 2, cx=args.width / 2, cy=args.height / 2,
        pixel_center=0.5,
    )
    result = offset_experiment(sdf, camera, args.iterations, args.backend)
    if args.out:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(12, 4))
        axes[0].imshow(result["target"])
        axes[0].set_title("reference")
        axes[1].imshow(result["final_render"])
        axes[1].set_title("recovered")
        axes[2].plot(result["losses"])
        axes[2].set_yscale("log")
        axes[2].set_title("loss")
        fig.tight_layout()
        fig.savefig(args.out)
        print(f"Figure saved to {args.out}")


if __name__ == "__main__":
    main()
